#!/usr/bin/env python
"""Precompute BERT class-name embeddings.

Port of the reference tool (``tools/coco_bert_embeddings.py:26-38``):
for each category name, tokenize and average the non-special-token
INPUT embeddings (word-embedding rows, not encoder outputs), then dump
{name: [768 floats]} JSON consumed at dataset registration
(``coco_instances.py:232-254``).

Usage:
    python tools/coco_bert_embeddings.py --vocab path/to/vocab.txt \
        --weights path/to/bert.pth --out coco_nouns_bertemb.json \
        [--dataset coco|lvis]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--weights", default="",
                    help="torch BERT checkpoint with "
                         "embeddings.word_embeddings.weight")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="coco", choices=["coco", "lvis"])
    args = ap.parse_args()

    from locov_tpu.data.tokenization import WordPieceTokenizer
    tok = WordPieceTokenizer.from_vocab_file(args.vocab)

    if args.weights:
        from locov_tpu.utils.checkpoint import load_torch_file
        state = load_torch_file(args.weights)
        key = next(k for k in state if k.endswith(
            "embeddings.word_embeddings.weight"))
        word_emb = np.asarray(state[key], np.float32)
    else:
        print("WARNING: no --weights; using random embeddings "
              "(suitable only for smoke tests)")
        word_emb = np.random.RandomState(0).randn(
            len(tok), 768).astype(np.float32)

    if args.dataset == "coco":
        from locov_tpu.data.datasets.coco import (categories_seen,
                                                  categories_unseen)
        names = sorted({c["name"] for c in categories_seen}
                       | {c["name"] for c in categories_unseen})
        # all 80 COCO names are needed at registration; the splits above
        # cover the 65 OVD classes — extend with the full 80 if the full
        # annotation file is used
    else:
        names = []
        print("For LVIS, pass names via --names-file (synonyms[0] list)")

    out = {}
    for name in names:
        pieces = tok.tokenize(name)
        ids = [tok.vocab.get(p, tok.unk_id) for p in pieces]
        if not ids:
            ids = [tok.unk_id]
        out[name] = np.mean(word_emb[ids], axis=0).tolist()

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"Wrote {len(out)} embeddings to {args.out}")


if __name__ == "__main__":
    main()

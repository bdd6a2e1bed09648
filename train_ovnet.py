#!/usr/bin/env python
"""Training/eval CLI — preserves the reference surface
(/root/reference/train_ovnet.py:96-107):

    python train_ovnet.py --config-file configs/coco_lsm.yaml \
        [--num-gpus N] [--eval-only] [--resume] [KEY VALUE ...]

On TPU there is no per-device process spawn: one process drives the
whole local mesh (multi-host runs pass --num-machines/--machine-rank/
--dist-url to jax.distributed.initialize instead of d2's mp.spawn).
"""
import argparse
import ast
import logging
import os
import sys


def default_argument_parser():
    p = argparse.ArgumentParser(description="locov-tpu training")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-gpus", type=int, default=1,
                   help="accepted for CLI parity; on TPU the local mesh "
                        "always spans all visible chips")
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                   help="'KEY VALUE' config overrides")
    return p


def setup(args):
    from locov_tpu.config import (add_ovr_config,
                                  edit_output_dir_exp_specific, get_cfg)
    cfg = get_cfg()
    add_ovr_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    # literal_eval of CLI opts (reference train_ovnet.py:49-56)
    opts = list(args.opts or [])
    cfg.merge_from_list(opts)
    cfg = edit_output_dir_exp_specific(cfg)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    return cfg


def enable_compile_cache(cfg) -> None:
    """Point jax at a persistent compilation cache per
    cfg.TPU.COMPILE_CACHE_DIR ("auto" = host-keyed default dir, "" =
    off). Must run before the first compile; safe to call repeatedly."""
    target = cfg.TPU.COMPILE_CACHE_DIR
    if not target:
        return
    import jax
    from locov_tpu.utils.misc import compile_cache_dir
    if target == "auto":
        target = compile_cache_dir()
    jax.config.update("jax_compilation_cache_dir", target)


def main(args):
    cfg = setup(args)
    enable_compile_cache(cfg)

    from locov_tpu.data import get_register_dataset
    from locov_tpu.engine.trainer import OVRTrainer
    from locov_tpu.parallel import initialize_distributed

    if args.num_machines > 1:
        initialize_distributed(args.dist_url, args.num_machines,
                               args.machine_rank)

    for name in tuple(cfg.DATASETS.TRAIN) + tuple(cfg.DATASETS.TEST):
        get_register_dataset(name)(name, cfg.DATASETS.ROOT)

    trainer = OVRTrainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        results = trainer.test(cfg)
        if cfg.TEST.EXPECTED_RESULTS:
            verify_results(cfg, results)
        return results
    return trainer.train()


def verify_results(cfg, results) -> bool:
    """d2 verify_results: check TEST.EXPECTED_RESULTS
    [[dataset, metric, expected, tolerance], ...]."""
    ok = True
    for dataset, metric, expected, tol in cfg.TEST.EXPECTED_RESULTS:
        actual = results.get(dataset, {}).get(metric)
        if actual is None or abs(actual - expected) > tol:
            print(f"FAIL: {dataset}/{metric}: {actual} vs "
                  f"{expected}±{tol}")
            ok = False
        else:
            print(f"OK: {dataset}/{metric}: {actual}")
    return ok


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    print("Command Line Args:", args)
    main(args)

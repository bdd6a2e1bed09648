"""Demo tool (tools/demo.py) and the class-embedding JSON convention
(locov_tpu/serving.py:load_class_embeddings).

The embedding matrix row order is load-bearing: the classifier's score
columns are [class_0 .. class_{K-1}, background] (box_predictor.py
"scores: [R, K+1]; (K = background)"), matching dataset registration
(data/datasets/coco.py:219-222) which leaves the LAST row zero. A
bg-FIRST matrix silently mislabels every detection.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_class_embeddings_bg_last(tmp_path):
    from locov_tpu.serving import load_class_embeddings
    path = tmp_path / "emb.json"
    emb = {"zebra": [1.0, 2.0], "apple": [3.0, 4.0]}
    path.write_text(json.dumps(emb))
    names, mtx = load_class_embeddings(str(path))
    assert names == ["apple", "zebra"]  # sorted
    mtx = np.asarray(mtx)
    assert mtx.shape == (3, 2)
    np.testing.assert_array_equal(mtx[0], [3.0, 4.0])
    np.testing.assert_array_equal(mtx[1], [1.0, 2.0])
    np.testing.assert_array_equal(mtx[2], [0.0, 0.0])  # bg LAST


@pytest.mark.slow
def test_demo_cli_end_to_end(tmp_path):
    """demo.py runs on a real JPEG and writes the image + JSON pair.

    Random-init weights legitimately produce zero detections (the
    unnormalized FrozenBN trunk explodes RPN deltas at init — the
    reference always starts from pretrained trunks), so this asserts
    the artifact contract, not detection counts."""
    cv2 = pytest.importorskip("cv2")
    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype("uint8")
    src = str(tmp_path / "in.jpg")
    cv2.imwrite(src, img)
    out = str(tmp_path / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo.py"),
         "--config-file", os.path.join(REPO, "configs", "coco_stt.yaml"),
         "--input", src, "--output", out,
         "--confidence-threshold", "0.0",
         "MODEL.WEIGHTS", "''",
         "INPUT.MIN_SIZE_TEST", "64", "INPUT.MAX_SIZE_TEST", "64",
         "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
         "MODEL.RPN.POST_NMS_TOPK_TEST", "16",
         "TEST.DETECTIONS_PER_IMAGE", "10"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isfile(os.path.join(out, "in.jpg"))
    dets = json.load(open(os.path.join(out, "in.json")))
    assert dets["file"] == src
    for d in dets["detections"]:
        assert set(d) == {"bbox_xyxy", "score", "class_index",
                          "class_name"}

"""CLI surface test: drive train_ovnet.py end-to-end as a subprocess on
the synthetic micro dataset (the reference's user-facing entry point)."""
import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_micro_coco  # noqa: E402

pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_cli"))
    make_micro_coco(root)
    return root


def _write_cfg(root):
    cfg_path = os.path.join(root, "micro_stt.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
MODEL:
  META_ARCHITECTURE: "OvrRCNN"
  ROI_HEADS:
    NUM_CLASSES: 3
    BATCH_SIZE_PER_IMAGE: 16
  ROI_BOX_HEAD:
    EMBEDDING_BASED: True
    EMB_DIM: 16
    CLS_AGNOSTIC_BBOX_REG: True
  RPN:
    PRE_NMS_TOPK_TRAIN: 64
    POST_NMS_TOPK_TRAIN: 32
    PRE_NMS_TOPK_TEST: 64
    POST_NMS_TOPK_TEST: 16
    BATCH_SIZE_PER_IMAGE: 32
DATASETS:
  TRAIN: ("coco_zeroshot_train",)
  TEST: ("coco_zeroshot_val",)
  ROOT: "{root}"
INPUT:
  MIN_SIZE_TRAIN: (64,)
  MAX_SIZE_TRAIN: 96
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 96
SOLVER:
  IMS_PER_BATCH: 8
  MAX_ITER: 2
  CHECKPOINT_PERIOD: 2
  LOG_PERIOD: 1
  WARMUP_ITERS: 1
TEST:
  IMS_PER_BATCH: 8
  EVAL_PERIOD: 0
  DETECTIONS_PER_IMAGE: 8
TPU:
  IMAGE_BUCKETS: ((96, 96),)
  MAX_GT_BOXES: 16
  COMPUTE_DTYPE: "float32"
OUTPUT_DIR: "{root}/cli_output"
DATALOADER:
  NUM_WORKERS: 0
""")
    return cfg_path


@pytest.mark.slow
def test_cli_train_and_eval(micro_root):
    cfg_path = _write_cfg(micro_root)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    # jax.config platform forcing happens via env here; the CLI process
    # must also survive this machine's preset JAX_PLATFORMS=axon, so we
    # drive through a small stub that pins the platform first.
    stub = os.path.join(micro_root, "run_cli.py")
    with open(stub, "w") as f:
        f.write(
            "import jax, sys\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_compilation_cache_dir',"
            " '/tmp/jax_cache')\n"
            "sys.argv = ['train_ovnet.py', '--config-file', "
            f"{cfg_path!r}, 'SEED', '7']\n"
            f"exec(open({os.path.join(REPO, 'train_ovnet.py')!r})"
            ".read())\n")
    out = subprocess.run([sys.executable, stub], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stderr[-3000:]
    outdir = os.path.join(micro_root, "cli_output")
    # OUTPUT_DIR got the experiment-specific suffix
    dirs = [d for d in os.listdir(micro_root) if d.startswith("cli_output")]
    assert dirs, out.stdout[-2000:]
    outdir = os.path.join(micro_root, dirs[0])
    assert os.path.exists(os.path.join(outdir, "config.yaml"))
    assert os.path.exists(os.path.join(outdir, "metrics.json"))
    rows = [json.loads(l) for l in
            open(os.path.join(outdir, "metrics.json"))]
    assert any("total_loss" in r for r in rows)

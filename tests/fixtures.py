"""Shim: the synthetic micro-COCO generator moved into the package
(locov_tpu/data/synthetic.py) so tools/make_synthetic_dataset.py can
offer it as a user-facing zero-data quickstart. Tests keep importing
from here."""
from locov_tpu.data.synthetic import (CLASS_NAMES, make_micro_coco,  # noqa: F401
                                      micro_cfg)

"""locov-tpu: a from-scratch TPU-native (JAX/XLA/Pallas) open-vocabulary
detection framework with the capabilities of lmb-freiburg/locov."""

__version__ = "0.1.0"

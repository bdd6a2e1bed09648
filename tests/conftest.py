"""Test harness config: run everything on a virtual 8-device CPU mesh so
sharding/collective paths are exercised without TPU hardware."""
import os

# NB: this machine pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so a
# plain setdefault would silently leave tests on the real chip — force
# both the env var and the jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The 8 virtual device threads time-slice this box's single core; the
# heavy train-step programs can take >40 s of wall time to reach their
# first pmean, and XLA:CPU's collective rendezvous then CHECK-fails
# ("Expected 8 threads to join ... only 1 arrived") and ABORTS the
# process. Seen as a nondeterministic SIGABRT in the integration
# tests, worse under concurrent load. Raise both collective timeouts.
if "xla_cpu_collective_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()}")
assert len(jax.devices()) == 8

# persistent compilation cache: test shapes are stable across runs, so
# reruns skip XLA compilation entirely. The dir is keyed by the host's
# CPU feature set: this box migrates between hosts with different
# vector extensions, and XLA happily LOADS an AOT result compiled for
# a CPU it can't run on — observed as a mid-suite SIGABRT/SIGILL, not
# a cache miss.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _flags = next((ln for ln in f if ln.startswith("flags")), "")
except OSError:
    _flags = ""
_tag = hashlib.md5(_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

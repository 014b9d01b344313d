import os
import subprocess
import sys

# Kernel/scan tests run on a simulated 8-device CPU mesh; the real-TPU
# paths are exercised by bench.py on hardware, which gates every timing
# row behind an oracle/numpy conformance check (run_conformance_gate:
# CLI byte-equality vs the reference binary on the device backend +
# kernel event-plane equality).  The environment's sitecustomize
# registers the axon TPU backend and pins jax_platforms="axon,cpu";
# point it back at CPU before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oracle_bin():
    path = os.path.join(REPO, ".oracle", "agrep")
    if not os.path.exists(path):
        subprocess.check_call([os.path.join(REPO, "tools",
                                            "build_oracle.sh")])
    return path

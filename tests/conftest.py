"""Test configuration: force CPU JAX with a virtual 8-device mesh and f64."""
import os
import sys

# The machine profile may export JAX_PLATFORMS=axon + PALLAS_AXON_POOL_IPS,
# and a down tunnel hangs backend init ~20 min (CLAUDE.md).  Env scrubbing
# alone is NOT enough here: the jaxtyping pytest plugin imports jax before
# any conftest runs, baking jax_platforms from the profile env — so force
# the already-imported config too.  The pool-IPs value (the axon plugin's
# hijack trigger, checked at backend init) is stashed for the opt-in
# real-TPU test (test_real_tpu.py).
_pool = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if _pool is not None:
    os.environ["CLASSPRO_SAVED_POOL_IPS"] = _pool
os.environ["JAX_PLATFORMS"] = "cpu"
if "jax" in sys.modules:
    sys.modules["jax"].config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"

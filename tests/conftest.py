"""Test config.

- Keeps an 8-device virtual CPU platform available (sharding tests place
  arrays on `jax.devices("cpu")` explicitly) per SURVEY.md §4.
- Numerical parity tests vs the torch reference need accurate f32 matmuls.
  On this image the XLA *CPU* backend computes f32 dots in bf16 by default
  and every accurate mode is pathologically slow, while the TPU runs
  `highest` (6-pass bf16) fast in hardware. So: when an accelerator is
  present we raise the global matmul precision and use tight tolerances;
  on CPU-only machines tolerances widen to bf16 noise levels.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# Honor IMTPU_PLATFORM for tests too (JAX_PLATFORMS is pinned by the TPU
# plugin on this host): IMTPU_PLATFORM=cpu pytest ... runs the suite on the
# virtual CPU devices without touching the TPU (e.g. while a training run
# holds it). Parity tolerances widen automatically via ACCURATE below.
if os.environ.get("IMTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IMTPU_PLATFORM"])

jax.config.update("jax_compilation_cache_dir", "/tmp/imtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

try:
    ACCURATE = any(d.platform != "cpu" for d in jax.devices())
except Exception:  # pragma: no cover
    ACCURATE = False

if ACCURATE:
    jax.config.update("jax_default_matmul_precision", "highest")

# Tolerances for parity-vs-torch tests.
PARITY_TOL = dict(rtol=5e-4, atol=5e-4) if ACCURATE else dict(rtol=5e-2, atol=5e-2)


@pytest.fixture(scope="session")
def parity_tol():
    return PARITY_TOL


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def cpu_devices(n: int = 8):
    devs = jax.devices("cpu")
    assert len(devs) >= n, f"need {n} cpu devices, have {len(devs)}"
    return devs[:n]

"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, so this lives at
the very top of conftest (pytest imports it before any test module).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_compilation_cache", True)
# this image's oneDNN CPU backend may run f32 matmuls through bf16 (AMX);
# force full precision so numeric oracles are deterministic
jax.config.update("jax_default_matmul_precision", "highest")

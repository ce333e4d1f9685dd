"""Test configuration: run everything on a simulated 8-device CPU mesh.

The axon environment pins ``JAX_PLATFORMS=axon`` (a remote-TPU plugin) in the
process environment, so a plain ``os.environ.setdefault`` never takes effect
and every test would run over the single remote TPU tunnel (slow, and the
8-device sharding-equivalence tests can't run at all).  Force the CPU platform
through jax.config instead — and if a backend was already initialised by the
site customisation, reset it (same fallback as ``__graft_entry__.py``).
"""

import os

# Belt and braces: fix the env too, in case jax is not yet imported.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# If the axon plugin already initialised a backend (sitecustomize imports can
# trigger this), drop it so the CPU settings above take effect.
if jax._src.xla_bridge._backends:  # pragma: no cover - env dependent
    import jax.extend.backend as jeb

    jeb.clear_backends()

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)
assert len(jax.devices()) >= 8, (
    f"tests need 8 virtual CPU devices, have {len(jax.devices())}"
)

jax.config.update("jax_enable_compilation_cache", True)
# this image's oneDNN CPU backend may run f32 matmuls through bf16 (AMX);
# force full precision so numeric oracles are deterministic
jax.config.update("jax_default_matmul_precision", "highest")

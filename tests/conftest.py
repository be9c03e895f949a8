"""Force the CPU backend with 8 virtual devices so the whole suite (including
sharding tests) runs without TPU hardware.

NOTE: this machine's JAX install force-registers an 'axon' TPU platform that
overrides the JAX_PLATFORMS env var, so we must also update jax.config after
import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("MOM_TPU_INTERPRET", "1")  # pallas interpreter mode
# mom_tpu disables the JAX compilation cache by default (remote-TPU tunnel
# wedges serving Mosaic programs through it — RESULTS.md round-2 notes).
# That failure mode is TPU-tunnel-specific; for the CPU suite a persistent
# cache cuts repeat-run wall time several-fold on this 1-core machine.
os.environ.setdefault("MOM_TPU_COMPCACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
if os.environ.get("MOM_TPU_COMPCACHE") == "1":
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

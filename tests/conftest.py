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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

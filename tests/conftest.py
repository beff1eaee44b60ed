"""Test configuration: run everything on a fake 8-device CPU mesh.

Must set env vars before jax is imported anywhere (the standard TPU-less
idiom for testing mesh code — see SURVEY.md §4).
"""

import os

# force-override: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel; tests must run on the fake CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The env var alone is NOT enough: the TPU tunnel's sitecustomize calls
# axon.register() at interpreter start, which programmatically sets
# jax_platforms to "axon,cpu" BEFORE this conftest runs — so tests were
# silently running on the real chip. The config update wins as long as no
# backend has initialized yet.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the fake CPU mesh, got " + jax.default_backend())
assert jax.device_count() == 8

jax.config.update("jax_threefry_partitionable", True)

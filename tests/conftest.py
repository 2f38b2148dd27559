"""Test configuration: run JAX on CPU with 8 virtual devices.

The session environment pins ``JAX_PLATFORMS=axon`` (TPU tunnel) and a
sitecustomize pre-imports jax, so plain env-var edits are too late; we
switch the platform through jax.config. Unit tests compare against
numpy at f32 precision (TPU f32 matmuls use bf16 passes) and the
sharding tests need 8 virtual CPU devices (SURVEY.md §4, item 4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU AOT cache entries bake in host CPU features; never persist
# (or load) them from the shared cache dir (see lcpcga_tpu/__init__.py).
os.environ["LCPCGA_NO_COMPILE_CACHE"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: full-codec trained-weight tests (~1h CPU compile); run "
        "explicitly with LCPCGA_HEAVY=1, e.g. once per round before "
        "shipping weights (VERDICT r4 weak #6)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("LCPCGA_HEAVY"):
        return
    skip = pytest.mark.skip(
        reason="heavy trained-codec test; set LCPCGA_HEAVY=1 to run")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)

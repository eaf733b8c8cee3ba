"""Test harness config: run everything on CPU with 8 virtual devices.

Mirrors the reference's CPU-runnable test strategy (tests are hermetic;
asset-gated goldens skip when weights aren't present). Sharding tests use
the 8-device virtual CPU mesh.

NOTE: this environment's TPU plugin (axon) registers itself via
sitecustomize and ignores JAX_PLATFORMS env; the jax.config updates below
are the reliable way to force CPU, and must run before any backend use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import pytest

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "models"


def asset(name: str) -> pathlib.Path:
    return ASSETS / name


def require_assets(*names):
    """Skip unless all model assets exist (reference: GTEST_SKIP pattern)."""
    missing = [n for n in names if not asset(n).exists()]
    if missing:
        pytest.skip(f"model assets not available: {missing}")
    return [asset(n) for n in names]

"""Test configuration: force a virtual 8-device CPU mesh.

Must run before jax is imported anywhere — hence the env mutation at module
import time. Multi-chip sharding tests simulate a pod slice on these
virtual devices (SURVEY.md §4 implication (e))."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard-set: the session env exports axon
# Persistent compile cache: the large-image pipeline jits are identical across
# runs; caching cuts cold pytest wall time from minutes to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
CORPUS = ["lena", "blackbuck", "greenland", "offset_sample"]
REF_INPUT = pathlib.Path("/root/reference/assets/input")


@pytest.fixture(scope="session", params=CORPUS)
def golden(request):
    """Per-image golden fixture dict (see tools/golden_gen)."""
    name = request.param
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden fixture {path} missing")
    data = dict(np.load(path))
    data["name"] = name
    bmp_path = REF_INPUT / f"{name}.bmp"
    data["bmp_path"] = str(bmp_path) if bmp_path.exists() else None
    return data

"""Test configuration: force a virtual 8-device CPU mesh.

The container's sitecustomize registers the tunneled axon TPU backend into
every interpreter and programmatically sets jax_platforms="axon,cpu" —
which both overrides the JAX_PLATFORMS env var AND makes every eager op
dispatch over the (slow, single-chip) tunnel. Tests must run on the local
virtual 8-device CPU mesh (SURVEY.md §4 implication (e)), so this conftest
updates the jax config directly, before any backend initializes.
"""
import os

# XLA:CPU's JIT creates ~2k memory mappings PER COMPILED PROGRAM for the
# big interpret-mode Pallas graphs; a full-suite process crosses the
# kernel's vm.max_map_count (65530 default) after ~25 such programs and
# the next mmap failure surfaces as a SIGSEGV inside
# backend_compile/cache-deserialize (measured: 42k maps after 42 color
# encodes; crash always ~80 tests in, never reproducible solo). Raise
# the limit when we can (container runs as root); xdist workers
# (pytest.ini) additionally split the load across processes.
# Machine-wide kernel setting: opt out with JPEGTPU_NO_SYSCTL=1 when
# running outside the CI container (the suite may then SIGSEGV late —
# raise the sysctl yourself or run fewer tests per process).
if not os.environ.get("JPEGTPU_NO_SYSCTL"):
    try:
        with open("/proc/sys/vm/max_map_count") as _f:
            if int(_f.read()) < 1 << 20:
                with open("/proc/sys/vm/max_map_count", "w") as _g:
                    _g.write(str(1 << 20))
    except (OSError, ValueError):
        pass

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

# JPEGTPU_TPU=1 (the `make tpu-parity` gate) keeps the real TPU backend so
# tests/test_tpu_parity.py can validate the Mosaic lowering on silicon;
# everything else runs on the virtual 8-device CPU mesh.
if not os.environ.get("JPEGTPU_TPU"):
    jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the large-image pipeline jits are identical across
# runs; caching cuts cold pytest wall time significantly. Set via config (not
# env) because the container sitecustomize imports jax before conftest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

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

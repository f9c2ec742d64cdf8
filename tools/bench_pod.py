"""Pod-ready scaling harness: sharded encode over ALL visible chips.

Runs the sharded grayscale and color paths over a 1-D mesh of every
device jax sees and reports aggregate + per-chip MPix/s — one command on
real multi-chip hardware later; runnable today on the single tunneled
chip (n=1 overhead vs the unsharded program is the bench.py
`sharded_overhead_pct` row) or on a virtual CPU mesh:

    python tools/bench_pod.py                    # all real devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_pod.py                # 8-device CPU dryrun

On a multi-host pod, launch one process per host with
jax.distributed-style env (the sharded paths already handle multi-host
gather — jpegtpu/parallel/multihost.py); each host prints the same
aggregate numbers.

Usage: python tools/bench_pod.py [H W reps]
"""
import json
import os
import statistics
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # default the CPU dryrun to an 8-device virtual mesh
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # The container sitecustomize programmatically sets
    # jax_platforms="axon,cpu", overriding the env var — honor the
    # explicit request for the virtual CPU mesh.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import make_image
from jpegtpu import color_pipeline
from jpegtpu.config import EncodeConfig
from jpegtpu.parallel import sharding


def _best(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), statistics.median(ts)


def main():
    h, w, reps = 3024, 4032, 5
    if len(sys.argv) >= 3:
        h, w = int(sys.argv[1]), int(sys.argv[2])
    if len(sys.argv) >= 4:
        reps = int(sys.argv[3])
    mesh = sharding.make_mesh()
    n = mesh.devices.size
    mpix = h * w / 1e6
    out: dict = {"devices": n, "platform": jax.devices()[0].platform,
                 "h": h, "w": w}

    img = make_image(h, w)
    cfg = EncodeConfig()
    data = sharding.encode_grayscale_sharded(img, cfg, mesh)  # warmup
    assert data[:2] == b"\xff\xd8"
    t, t_med = _best(
        lambda: sharding.encode_grayscale_sharded(img, cfg, mesh), reps
    )
    out["gray_sharded_mpix_s"] = round(mpix / t, 2)
    out["gray_sharded_mpix_s_med"] = round(mpix / t_med, 2)
    out["gray_per_chip_mpix_s"] = round(mpix / t / n, 2)

    cimg = make_image(h, w, color=True)
    ccfg = EncodeConfig(subsampling="420")
    data = color_pipeline.encode_color_sharded(cimg, ccfg, mesh)  # warmup
    assert data[:2] == b"\xff\xd8"
    t, t_med = _best(
        lambda: color_pipeline.encode_color_sharded(cimg, ccfg, mesh), reps
    )
    out["color_sharded_mpix_s"] = round(mpix / t, 2)
    out["color_sharded_mpix_s_med"] = round(mpix / t_med, 2)
    out["color_per_chip_mpix_s"] = round(mpix / t / n, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

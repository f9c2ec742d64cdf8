"""Attribute the all-Pallas raw encode path on real TPU (chain-delta,
cumulative prefixes), gray and color: fused transform kernel -> +DC
diff relayouts -> +fused symbolize/pack kernel -> (+MCU merge, color)
-> +raw_to_scan + tree concat (= full body, stuff=False).

Usage: python tools/raw_micro.py [h w reps k]
"""
import statistics
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import make_image
from jpegtpu import color_pipeline as cp, pipeline
from jpegtpu.config import EncodeConfig
from jpegtpu.entropy import device as ed, pallas_pack, treepack
from jpegtpu.ops import pallas_transform as pt


def chain_ms(body, img_dev, reps=7, k=4):
    def chain(n):
        @jax.jit
        def fn(img):
            tot = jnp.float32(0)
            for _ in range(n):
                # serialize: each encode's input depends on the previous
                # result, so XLA cannot overlap encodes inside the chain
                # (same guard as bench._chain_compute_ms)
                pert = (tot.astype(jnp.int32) & 1).astype(img.dtype)
                tot = tot + body(img ^ pert)
            return tot

        return fn

    f1, fk = chain(1), chain(k)
    jax.device_get((f1(img_dev), fk(img_dev)))

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(f(img_dev))
            ts.append(time.perf_counter() - t0)
        # min, not median: the tunnel injects one-sided multi-ms spikes
        # (measured round 5 — a 37 ms dispatch floor with ±2 ms tail),
        # and a chain-delta subtracts two such samples; best-case pairs
        # are the only stable estimator here.
        return min(ts)

    return max((t(fk) - t(f1)) / (k - 1), 1e-9) * 1000


def main():
    h, w = 3024, 4032
    # k=12: the chain-delta divides the tunnel's multi-ms dispatch
    # spread by (k-1); k=4 could not resolve sub-ms stages (round 5)
    reps, k = 7, 12
    if len(sys.argv) >= 3:
        h, w = int(sys.argv[1]), int(sys.argv[2])
    if len(sys.argv) >= 4:
        reps = int(sys.argv[3])
    if len(sys.argv) >= 5:
        k = int(sys.argv[4])
    mpix = h * w / 1e6

    cfg = EncodeConfig()
    ccfg = EncodeConfig(subsampling="420")
    cap = cfg.capacity_words_per_block
    qt = jnp.asarray(cfg.luma_quant.astype(np.float32))

    gph, gpw = -(-h // 8) * 8, -(-w // 8) * 8
    kh, kw = pt.padded_dims_kernel(gph, gpw)
    nbh, nbw, ncg = gph // 8, gpw // 8, kw // pt.TILE_W
    gimg = jnp.asarray(make_image(kh, kw))

    cph, cpw = cp.padded_dims_color(h, w, "420")
    cimg = jnp.asarray(
        np.ascontiguousarray(
            np.moveaxis(make_image(cph, cpw, color=True), -1, 0)
        )
    )

    def su(x):
        return jnp.sum(x, dtype=jnp.float32)

    def g_tx(im):
        return su(pt.transform_plane_raw(im, qt, True))

    def g_dcd(im):
        raw = pt.transform_plane_raw(im, qt, True)
        dc_scan = pt.raw_to_scan(raw[:, :1], nbh, nbw, ncg)[0]
        dcd = ed.dc_differences(dc_scan, 0)
        return su(raw) + su(pt.scan_to_raw(dcd, nbh, nbw, ncg))

    def g_pack(im):
        raw = pt.transform_plane_raw(im, qt, True)
        dc_scan = pt.raw_to_scan(raw[:, :1], nbh, nbw, ncg)[0]
        dcd = ed.dc_differences(dc_scan, 0)
        dcd_raw = pt.scan_to_raw(dcd, nbh, nbw, ncg)
        w_, b_, _ = pallas_pack.encode_blocks_pallas(
            raw, dcd_raw, cap=cap, table=0, raw=True
        )
        return su(w_) + su(b_)

    def g_full(im):
        words, count, _ = pipeline.gray_encode_body(im, cfg, False, cap, False)
        return count.astype(jnp.float32) + su(words)

    def c_full(im):
        words, count, _ = cp.color_encode_body(im, ccfg, cap, False)
        return count.astype(jnp.float32) + su(words)

    rows = [
        ("gray transform", g_tx, gimg),
        ("+dc relayouts", g_dcd, gimg),
        ("+fused pack", g_pack, gimg),
        ("gray full", g_full, gimg),
        ("color full", c_full, cimg),
    ]
    for name, body, im in rows:
        ms = chain_ms(body, im, reps, k)
        print(f"{name:<16}{ms:>9.2f} ms  {mpix / (ms / 1000):>9.1f} MPix/s",
              flush=True)


if __name__ == "__main__":
    main()

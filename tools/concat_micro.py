"""Attribute the across-block concat stage of the raw path on real TPU:
raw_to_scan of the words tensor, then concat_blocks_tree under different
deposit thresholds / radices.

Usage: python tools/concat_micro.py [h w reps k]
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
from jpegtpu import pipeline
from jpegtpu.config import EncodeConfig
from jpegtpu.entropy import device as ed, pallas_pack, treepack
from jpegtpu.ops import pallas_transform as pt


def chain_ms(body, img_dev, reps=7, k=4):
    def chain(n):
        @jax.jit
        def fn(img):
            tot = jnp.float32(0)
            for i in range(n):
                tot = tot + body(img ^ jnp.uint8(i))
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
        return statistics.median(ts)

    return max((t(fk) - t(f1)) / (k - 1), 1e-9) * 1000


def main():
    h, w = 3024, 4032
    reps, k = 7, 4
    if len(sys.argv) >= 3:
        h, w = int(sys.argv[1]), int(sys.argv[2])
    if len(sys.argv) >= 4:
        reps = int(sys.argv[3])
    if len(sys.argv) >= 5:
        k = int(sys.argv[4])
    mpix = h * w / 1e6

    cfg = EncodeConfig()
    cap = cfg.capacity_words_per_block
    qt = jnp.asarray(cfg.luma_quant.astype(np.float32))

    gph, gpw = -(-h // 8) * 8, -(-w // 8) * 8
    kh, kw = pt.padded_dims_kernel(gph, gpw)
    nbh, nbw, ncg = gph // 8, gpw // 8, kw // pt.TILE_W
    gimg = jnp.asarray(make_image(kh, kw))

    def su(x):
        return jnp.sum(x, dtype=jnp.float32)

    def upto_pack(im):
        raw = pt.transform_plane_raw(im, qt, True)
        dc_scan = pt.raw_to_scan(raw[:, :1], nbh, nbw, ncg)[0]
        dcd = ed.dc_differences(dc_scan, 0)
        dcd_raw = pt.scan_to_raw(dcd, nbh, nbw, ncg)
        return pallas_pack.encode_blocks_pallas(
            raw, dcd_raw, cap=cap, table=0, raw=True
        )

    def base(im):
        w_, b_, _ = upto_pack(im)
        return su(w_) + su(b_)

    def relayout(im):
        w_, b_, _ = upto_pack(im)
        w_t = pt.raw_to_scan(w_, nbh, nbw, ncg)
        bits = pt.raw_to_scan(b_[:, None], nbh, nbw, ncg)[0]
        return su(w_t) + su(bits)

    def mk_tree(dep, radix=4):
        def body(im):
            w_, b_, _ = upto_pack(im)
            w_t = pt.raw_to_scan(w_, nbh, nbw, ncg)
            bits = pt.raw_to_scan(b_[:, None], nbh, nbw, ncg)[0]
            words, total = treepack.concat_blocks_tree(
                w_t, bits, radix=radix, deposit_threshold=dep
            )
            return su(words) + total.astype(jnp.float32)

        return body

    rows = [
        ("pack (base)", base),
        ("+words relayout", relayout),
        ("+tree dep=256", mk_tree(256)),
        ("+tree dep=512", mk_tree(512)),
        ("+tree dep=1024", mk_tree(1024)),
        ("+tree dep=3000", mk_tree(3000)),
        ("+tree dep=64", mk_tree(64)),
    ]
    for name, body in rows:
        ms = chain_ms(body, gimg, reps, k)
        print(f"{name:<18}{ms:>9.2f} ms  {mpix / (ms / 1000):>9.1f} MPix/s",
              flush=True)


if __name__ == "__main__":
    main()

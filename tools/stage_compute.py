"""Chain-delta stage attribution of the LEGACY staged-XLA paths
(_gray_levels / _color_block_words) — kept for comparing against the
all-Pallas default bodies, which tools/raw_micro.py and
tools/color_micro.py attribute.

Usage: python tools/stage_compute.py [h w reps]
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
from jpegtpu.entropy import device as ed, treepack


def chain_ms(body, img_dev, reps=5, k=3):
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
    reps = 5
    if len(sys.argv) >= 3:
        h, w = int(sys.argv[1]), int(sys.argv[2])
    if len(sys.argv) >= 4:
        reps = int(sys.argv[3])
    mpix = h * w / 1e6

    cfg = EncodeConfig()
    ccfg = EncodeConfig(subsampling="420")
    gph = -(-h // 8) * 8
    gpw = -(-w // 8) * 8
    cph, cpw = cp.padded_dims_color(h, w, "420")
    gimg = jnp.asarray(make_image(gph, gpw))
    cimg = jnp.asarray(
        np.ascontiguousarray(np.moveaxis(make_image(cph, cpw, color=True), -1, 0))
    )

    basis = cfg.dct_basis()
    qtl = cfg.luma_quant.astype(np.float32)
    qtc = cfg.chroma_quant.astype(np.float32)
    cap = cfg.capacity_words_per_block

    def g_levels(im):
        zz = pipeline._gray_levels(im, cfg, jnp.asarray(basis), jnp.asarray(qtl), False)
        return jnp.sum(zz).astype(jnp.float32)

    def g_words(im):
        zz = pipeline._gray_levels(im, cfg, jnp.asarray(basis), jnp.asarray(qtl), False).astype(jnp.int32)
        dcd = ed.dc_differences(zz[:, 0], 0)
        w_, b_, ov = ed._per_block_words(zz, 0, dcd, cap)
        return jnp.sum(b_).astype(jnp.float32) + jnp.sum(w_).astype(jnp.float32)

    def g_full(im):
        words, count, _ = pipeline.gray_encode_body(im, cfg, False, cap, False)
        # consume the stream too — count alone lets XLA DCE the concat
        return count.astype(jnp.float32) + jnp.sum(words).astype(jnp.float32)

    def c_levels(im):
        zy, zcb, zcr = cp._component_levels(im, ccfg, jnp.asarray(basis), jnp.asarray(qtl), jnp.asarray(qtc))
        return (jnp.sum(zy) + jnp.sum(zcb) + jnp.sum(zcr)).astype(jnp.float32)

    def c_words(im):
        zy, zcb, zcr = cp._component_levels(im, ccfg, jnp.asarray(basis), jnp.asarray(qtl), jnp.asarray(qtc))
        w_, b_, ov = cp._color_block_words(zy, zcb, zcr, cph // 8, cpw // 8, "420", cap)
        return jnp.sum(b_).astype(jnp.float32) + jnp.sum(w_).astype(jnp.float32)

    def c_full(im):
        words, count, _ = cp.color_encode_body(im, ccfg, cap, False)
        return count.astype(jnp.float32) + jnp.sum(words).astype(jnp.float32)

    rows = [
        ("gray levels", g_levels, gimg),
        ("gray +blockpack", g_words, gimg),
        ("gray full", g_full, gimg),
        ("color levels", c_levels, cimg),
        ("color +blockpack", c_words, cimg),
        ("color full", c_full, cimg),
    ]
    for name, body, im in rows:
        ms = chain_ms(body, im, reps)
        print(f"{name:<18}{ms:>9.2f} ms  {mpix / (ms / 1000):>9.1f} MPix/s")


if __name__ == "__main__":
    main()

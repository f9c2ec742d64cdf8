"""Attribute the gray levels stage on real TPU (chain-delta, cumulative
prefixes): f32 convert+level shift -> +col matmul -> +row matmul ->
+quant/round -> full transform_tiled (adds blockify transpose + zigzag
gather) -> +zzt relayout (the encode kernel's coefficient-major prep).

Usage: python tools/levels_micro.py [h w reps k]
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
from jpegtpu import tables
from jpegtpu.config import EncodeConfig
from jpegtpu.ops import fused_transform

TILE = fused_transform.TILE


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
    ph = -(-h // TILE) * TILE
    pw = -(-w // TILE) * TILE
    mpix = h * w / 1e6

    cfg = EncodeConfig()
    qt = jnp.asarray(cfg.luma_quant.astype(np.float32))
    bd = jnp.asarray(fused_transform._blockdiag_basis(True))
    img = jnp.asarray(make_image(ph, pw))
    a, b = ph // TILE, pw // TILE
    g = TILE // 8

    def su(x):
        return jnp.sum(x, dtype=jnp.float32)

    def convert(im):
        x = im.astype(jnp.float32).reshape(a, TILE, b, TILE) - 128.0
        return su(x)

    def col_mm(im):
        x = im.astype(jnp.float32).reshape(a, TILE, b, TILE) - 128.0
        y = jnp.einsum("ij,ajbk->aibk", bd, x,
                       precision=jax.lax.Precision.HIGHEST)
        return su(y)

    def row_mm(im):
        x = im.astype(jnp.float32).reshape(a, TILE, b, TILE) - 128.0
        f = jnp.einsum("ij,ajbk,lk->aibl", bd, x, bd,
                       precision=jax.lax.Precision.HIGHEST)
        return su(f)

    def quant(im):
        x = im.astype(jnp.float32).reshape(a, TILE, b, TILE) - 128.0
        f = jnp.einsum("ij,ajbk,lk->aibl", bd, x, bd,
                       precision=jax.lax.Precision.HIGHEST)
        qtile = jnp.tile(qt, (g, g))
        scaled = f / qtile[None, :, None, :]
        levels = jnp.where(
            scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5)
        ).astype(jnp.int32)
        return su(levels)

    def full(im):
        zz = fused_transform.transform_tiled(im, qt, True)
        return su(zz)

    def full_zzt(im):
        zz = fused_transform.transform_tiled(im, qt, True)
        nb = zz.shape[0]
        gg = -(-nb // 1024)
        zz = jnp.pad(zz, ((0, gg * 1024 - nb), (0, 0)))
        zzt = zz.T.reshape(64, gg, 8, 128).transpose(1, 0, 2, 3)
        return su(zzt)

    rows = [
        ("convert+shift", convert),
        ("+col matmul", col_mm),
        ("+row matmul", row_mm),
        ("+quant/round", quant),
        ("full transform", full),
        ("+zzt relayout", full_zzt),
    ]
    for name, body in rows:
        ms = chain_ms(body, img, reps, k)
        print(f"{name:<16}{ms:>9.2f} ms  {mpix / (ms / 1000):>9.1f} MPix/s",
              flush=True)


if __name__ == "__main__":
    main()

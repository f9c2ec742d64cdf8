"""Attribute _color_block_words sub-stage cost on real TPU (chain-delta).

Rows are cumulative prefixes: Y pallas kernel -> +chroma kernel ->
+Y MCU merges -> +chroma merge -> +merge_two (= full block-words stage).
Inputs are precomputed device-resident zigzag levels; the chain perturbs
them with a data-dependent xor so XLA cannot CSE the copies.
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
from jpegtpu import color_pipeline as cp
from jpegtpu.config import EncodeConfig
from jpegtpu.entropy import device as ed, treepack


def chain_ms(body, args, reps=5, k=3):
    def chain(n):
        @jax.jit
        def fn(*a):
            tot = jnp.float32(0)
            for i in range(n):
                a2 = tuple(x ^ (jnp.int32(i) + tot.astype(jnp.int32) % 2) for x in a)
                tot = tot + body(*a2)
            return tot

        return fn

    f1, fk = chain(1), chain(k)
    jax.device_get((f1(*args), fk(*args)))

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(f(*args))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    return max((t(fk) - t(f1)) / (k - 1), 1e-9) * 1000


def main():
    h, w = 3024, 4032
    cfg = EncodeConfig(subsampling="420")
    cph, cpw = cp.padded_dims_color(h, w, "420")
    nbh, nbw = cph // 8, cpw // 8
    cap = cfg.capacity_words_per_block
    img = make_image(cph, cpw, color=True)
    planar = jnp.asarray(np.ascontiguousarray(np.moveaxis(img, -1, 0)))
    basis = cfg.dct_basis()
    qtl = cfg.luma_quant.astype(np.float32)
    qtc = cfg.chroma_quant.astype(np.float32)

    @jax.jit
    def levels(im):
        return cp._component_levels(
            im, cfg, jnp.asarray(basis), jnp.asarray(qtl), jnp.asarray(qtc)
        )

    zy, zcb, zcr = jax.device_get(levels(planar))
    zy = jnp.asarray(np.asarray(zy, np.int32))
    zcb = jnp.asarray(np.asarray(zcb, np.int32))
    zcr = jnp.asarray(np.asarray(zcr, np.int32))
    print(f"cap={cap} ny={zy.shape[0]} nc={zcb.shape[0]}", flush=True)

    def su(*xs):
        return sum(jnp.sum(x).astype(jnp.float32) for x in xs)

    def prep(zy, zcb, zcr):
        y_scan, ky = cp._y_scan_relayout(zy, nbh, nbw, "420")
        c_scan = jnp.stack([zcb, zcr], axis=1).reshape(-1, 64)
        dcd_y = ed.dc_differences(y_scan[:, 0], 0)
        dcd_c = jnp.stack(
            [ed.dc_differences(zcb[:, 0], 0), ed.dc_differences(zcr[:, 0], 0)],
            axis=1,
        ).reshape(-1)
        return y_scan, c_scan, dcd_y, dcd_c

    def y_kernel(zy, zcb, zcr):
        y_scan, c_scan, dcd_y, dcd_c = prep(zy, zcb, zcr)
        w_y, b_y, ov = ed._per_block_words(y_scan, 0, dcd_y, cap)
        return su(w_y, b_y)

    def both_kernels(zy, zcb, zcr):
        y_scan, c_scan, dcd_y, dcd_c = prep(zy, zcb, zcr)
        w_y, b_y, _ = ed._per_block_words(y_scan, 0, dcd_y, cap)
        w_c, b_c, _ = ed._per_block_words(c_scan, 1, dcd_c, cap)
        return su(w_y, b_y, w_c, b_c)

    def plus_y_merges(zy, zcb, zcr):
        y_scan, c_scan, dcd_y, dcd_c = prep(zy, zcb, zcr)
        w_y, b_y, _ = ed._per_block_words(y_scan, 0, dcd_y, cap)
        w_c, b_c, _ = ed._per_block_words(c_scan, 1, dcd_c, cap)
        w_y, b_y = treepack.merge_adjacent_t(w_y, b_y)
        w_y, b_y = treepack.merge_adjacent_t(w_y, b_y)
        return su(w_y, b_y, w_c, b_c)

    def plus_c_merge(zy, zcb, zcr):
        y_scan, c_scan, dcd_y, dcd_c = prep(zy, zcb, zcr)
        w_y, b_y, _ = ed._per_block_words(y_scan, 0, dcd_y, cap)
        w_c, b_c, _ = ed._per_block_words(c_scan, 1, dcd_c, cap)
        w_y, b_y = treepack.merge_adjacent_t(w_y, b_y)
        w_y, b_y = treepack.merge_adjacent_t(w_y, b_y)
        w_c, b_c = treepack.merge_adjacent_t(w_c, b_c)
        return su(w_y, b_y, w_c, b_c)

    def full(zy, zcb, zcr):
        w_all, b_all, ov = cp._color_block_words(zy, zcb, zcr, nbh, nbw, "420", cap)
        return su(w_all, b_all)

    args = (zy, zcb, zcr)
    for name, body in (
        ("Y kernel", y_kernel),
        ("+chroma kernel", both_kernels),
        ("+Y merges (x2)", plus_y_merges),
        ("+chroma merge", plus_c_merge),
        ("full blockwords", full),
    ):
        print(f"{name:<18}{chain_ms(body, args):>9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

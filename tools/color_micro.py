"""Attribute the all-Pallas color raw body on real TPU, stage by stage
(chain-delta over cumulative prefixes of _color_encode_body_raw).

Usage: python tools/color_micro.py [h w reps k]
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
from jpegtpu.ops import color, pallas_transform as pt
from jpegtpu.entropy import pallas_concat, pallas_pack


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

    cfg = EncodeConfig(subsampling="420")
    cap = cfg.capacity_words_per_block
    cph, cpw = cp.padded_dims_color(h, w, "420")
    img = jnp.asarray(
        np.ascontiguousarray(
            np.moveaxis(make_image(cph, cpw, color=True), -1, 0)
        )
    )

    qtl = jnp.asarray(cfg.luma_quant.astype(np.float32))
    qtc = jnp.asarray(cfg.chroma_quant.astype(np.float32))
    ky = 4

    def su(x):
        return jnp.sum(x, dtype=jnp.float32)

    def planes(im):
        y, cb, cr = color.rgb_planar_to_ycbcr(im)
        cb = color.subsample_420(cb)
        cr = color.subsample_420(cr)
        mh, mw = cb.shape
        kh, kw = pt.padded_dims_kernel(mh, mw)
        yh, yw = y.shape
        if (kh, kw) != (mh, mw):
            cb = jnp.pad(cb, ((0, kh - mh), (0, kw - mw)))
            cr = jnp.pad(cr, ((0, kh - mh), (0, kw - mw)))
        if (2 * kh, 2 * kw) != (yh, yw):
            y = jnp.pad(y, ((0, 2 * kh - yh), (0, 2 * kw - yw)))
        return y, cb, cr, mh, mw, kh, kw

    def s_planes(im):
        y, cb, cr, *_ = planes(im)
        return su(y) + su(cb) + su(cr)

    def transforms(im):
        y, cb, cr, mh, mw, kh, kw = planes(im)
        raw_y = pt.transform_plane_raw(y, qtl, cfg.bitexact)
        raw_c = pt.transform_plane_raw(jnp.concatenate([cb, cr]), qtc,
                                       cfg.bitexact)
        return raw_y, raw_c, mh, mw, kh, kw

    def s_tx(im):
        raw_y, raw_c, *_ = transforms(im)
        return su(raw_y) + su(raw_c)

    def dcs(im):
        from jpegtpu.entropy import device as ed
        raw_y, raw_c, mh, mw, kh, kw = transforms(im)
        ncg = kw // pt.TILE_W
        nmch, nmcw = mh // 8, mw // 8
        nbh_y, nbw_y = 2 * nmch, 2 * nmcw
        dc_y = pt.raw_to_scan(raw_y[:, :1], nbh_y, nbw_y, 2 * ncg)[0]
        d2 = dc_y.reshape(nmch, 2, nmcw, 2).transpose(0, 2, 1, 3).reshape(-1)
        dcd_mcu = ed.dc_differences(d2, 0)
        dcd_nat = (
            dcd_mcu.reshape(nmch, nmcw, 2, 2)
            .transpose(0, 2, 1, 3)
            .reshape(nbh_y * nbw_y)
        )
        dcd_y_raw = pt.scan_to_raw(dcd_nat, nbh_y, nbw_y, 2 * ncg)
        g = raw_c.shape[0] // 2
        raw_c5 = raw_c.reshape(2, g, 64, pt.SUBLANES, pt.LANES)
        dc_c = jnp.stack(
            [pt.raw_to_scan(raw_c5[i, :, :1], nmch, nmcw, ncg)[0]
             for i in range(2)]
        )
        dcd_c = cp._dc_diff_rows(dc_c, 0)
        dcd_c_raw = jnp.stack(
            [pt.scan_to_raw(dcd_c[i], nmch, nmcw, ncg) for i in range(2)]
        ).reshape(2 * g, pt.SUBLANES, pt.LANES)
        return raw_y, raw_c, dcd_y_raw, dcd_c_raw, mh, mw, kh, kw

    def s_dc(im):
        raw_y, raw_c, dy, dc_, *_ = dcs(im)
        return su(raw_y) + su(raw_c) + su(dy) + su(dc_)

    def packs(im):
        raw_y, raw_c, dcd_y_raw, dcd_c_raw, mh, mw, kh, kw = dcs(im)
        w_y, b_y, _ = pallas_pack.encode_blocks_pallas(
            raw_y, dcd_y_raw, cap=cap, table=0, raw=True
        )
        w_c, b_c, _ = pallas_pack.encode_blocks_pallas(
            raw_c, dcd_c_raw, cap=cap, table=1, raw=True
        )
        return w_y, b_y, w_c, b_c, mh, mw, kh, kw

    def s_pack(im):
        w_y, b_y, w_c, b_c, *_ = packs(im)
        return su(w_y) + su(b_y) + su(w_c) + su(b_c)

    def merged_f(im):
        w_y, b_y, w_c, b_c, mh, mw, kh, kw = packs(im)
        ncg = kw // pt.TILE_W
        g = b_c.shape[0] // 2
        merged, mbits = pallas_pack.merge_mcu_natural_pallas(
            w_y, b_y,
            w_c.reshape(2, g, cap, pt.SUBLANES, pt.LANES),
            b_c.reshape(2, g, pt.SUBLANES, pt.LANES),
            nrg_c=kh // pt.TILE_H, ncg_c=ncg, subsampling="420",
        )
        return merged, mbits, mh, mw, kw

    def s_merge(im):
        merged, mbits, *_ = merged_f(im)
        return su(merged) + su(mbits)

    def s_concat(im):
        merged, mbits, mh, mw, kw = merged_f(im)
        ncg = kw // pt.TILE_W
        nmch, nmcw = mh // 8, mw // 8
        words, total = pallas_concat.concat_raw_pallas(
            merged, mbits, nmch, nmcw, ncg
        )
        return su(words) + total.astype(jnp.float32)

    def s_full(im):
        words, count, _ = cp.color_encode_body(im, cfg, cap, False)
        return count.astype(jnp.float32) + su(words)

    rows = [
        ("planes", s_planes),
        ("+transforms", s_tx),
        ("+dc relayout", s_dc),
        ("+packs x2", s_pack),
        ("+MCU merge", s_merge),
        ("+concat", s_concat),
        ("full body", s_full),
    ]
    for name, body in rows:
        ms = chain_ms(body, img, reps, k)
        print(f"{name:<14}{ms:>9.2f} ms  {mpix / (ms / 1000):>9.1f} MPix/s",
              flush=True)


if __name__ == "__main__":
    main()

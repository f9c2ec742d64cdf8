"""Attribute the RAW (all-Pallas) batch bodies on real TPU via
chain-delta: plane transform -> +DC chains -> +pack -> +merge ->
full body (stream concat + tail pad), for gray and color.

Usage: python tools/batch_raw_micro.py [b size reps k] [--color]
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
from jpegtpu import batch
from jpegtpu.config import EncodeConfig
from tools.batch_micro import chain_ms


def main():
    args = [a for a in sys.argv[1:] if a != "--color"]
    color = "--color" in sys.argv
    b, size = (128 if color else 256), 512
    reps, k = 5, 3
    if len(args) >= 2:
        b, size = int(args[0]), int(args[1])
    if len(args) >= 3:
        reps = int(args[2])
    if len(args) >= 4:
        k = int(args[3])
    mpix = b * size * size / 1e6

    cfg = EncodeConfig(subsampling="420") if color else EncodeConfig()
    cap = cfg.capacity_words_per_block
    base = make_image(size, size)
    rng = np.random.default_rng(1)
    imgs = np.stack(
        [np.roll(base, int(rng.integers(0, size)), axis=1) for _ in range(b)]
    )
    if color:
        arr = jnp.asarray(
            np.stack([np.stack([im, im, im]) for im in imgs])
        )  # [b, 3, H, W] planar
    else:
        arr = jnp.asarray(imgs)

    from jpegtpu.entropy import pallas_concat, pallas_pack
    from jpegtpu.ops import pallas_transform as pt

    if not color:
        nb = (size // 8) ** 2

        def plane(x):
            from jpegtpu.ops import color as color_ops

            wsb, r, _ = batch._slot_geom(size // 8)
            bb = x.shape[0]
            rows_pp = -(-size // pt.TILE_H) * (pt.TILE_H // 8)
            p = (
                x.reshape(bb // r, r, size, size)
                .transpose(0, 2, 1, 3)
                .reshape(bb // r * size, r * size)
            )
            return pt.transform_plane_raw(
                p, jnp.asarray(cfg.luma_quant.astype(np.float32)),
                cfg.bitexact,
            )

        def plane_dc(x):
            return batch._gray_batch_plane_raw(x, cfg, False, size, size)[
                :3
            ]

        def pack(x):
            raw, _dcd, dcd_raw, gm = batch._gray_batch_plane_raw(
                x, cfg, False, size, size
            )
            return pallas_pack.encode_blocks_pallas(
                raw, dcd_raw, cap=cap, table=0, raw=True
            )

        def merge(x):
            raw, _dcd, dcd_raw, gm = batch._gray_batch_plane_raw(
                x, cfg, False, size, size
            )
            w_raw, b_raw, _ = pallas_pack.encode_blocks_pallas(
                raw, dcd_raw, cap=cap, table=0, raw=True
            )
            ws = gm["wsb"] if gm["r"] > 1 else pallas_concat.LANES
            return pallas_concat.merge_sublanes_pallas(w_raw, b_raw, ws=ws)

        fn = batch._batch_encode_fn(b, size, size, cfg, False, cap)
        rows = [
            ("plane transform", plane),
            ("+dc chains", plane_dc),
            ("+block pack", pack),
            ("+row merge", merge),
            ("full raw body", lambda x: fn(x)),
        ]
    else:
        ph = pw = size

        def plane_c(x):
            return batch._color_batch_plane_raw(x, cfg, ph, pw)[:4]

        def pack_c(x):
            raw_y, raw_c, dcd_y_raw, dcd_c_raw, _ras, gm = (
                batch._color_batch_plane_raw(x, cfg, ph, pw)
            )
            wy = pallas_pack.encode_blocks_pallas(
                raw_y, dcd_y_raw, cap=cap, table=0, raw=True
            )
            wcb = pallas_pack.encode_blocks_pallas(
                raw_c, dcd_c_raw, cap=cap, table=1, raw=True
            )
            return wy, wcb

        def mcu_merge(x):
            raw_y, raw_c, dcd_y_raw, dcd_c_raw, _ras, gm = (
                batch._color_batch_plane_raw(x, cfg, ph, pw)
            )
            w_y, b_y, _ = pallas_pack.encode_blocks_pallas(
                raw_y, dcd_y_raw, cap=cap, table=0, raw=True
            )
            w_c, b_c, _ = pallas_pack.encode_blocks_pallas(
                raw_c, dcd_c_raw, cap=cap, table=1, raw=True
            )
            gc, kh, ncg_c = gm["gc"], gm["kh"], gm["ncg_c"]
            r = gm["r"]
            bb = x.shape[0]
            return pallas_pack.merge_mcu_natural_pallas(
                w_y, b_y,
                w_c.reshape(2, gc, cap, pt.SUBLANES, pt.LANES),
                b_c.reshape(2, gc, pt.SUBLANES, pt.LANES),
                nrg_c=(bb // r) * kh // pt.TILE_H, ncg_c=ncg_c,
                subsampling=cfg.subsampling,
            )

        fn = batch._batch_color_fn(b, ph, pw, cfg, cap)
        rows = [
            ("plane transforms", plane_c),
            ("+block pack y+c", pack_c),
            ("+mcu merge", mcu_merge),
            ("full raw body", lambda x: fn(x)),
        ]

    for name, body in rows:
        ms = chain_ms(body, arr, reps, k)
        print(f"{name:<17}{ms:>9.2f} ms  {mpix / (ms / 1000):>9.1f} MPix/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Binary-search the color `levels` stage cost on real TPU.

Rows are cumulative prefixes of color_pipeline._component_levels:
conversion → +subsample → +Y transform → +chroma transforms (= full).
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
from jpegtpu.config import EncodeConfig
from jpegtpu.ops import color, fused_transform


def chain_ms(body, img_dev, reps=5, k=3):
    def chain(n):
        @jax.jit
        def fn(img):
            tot = jnp.uint32(0)
            for _ in range(n):
                tot = tot + body(img ^ (tot & 1).astype(img.dtype))
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
    cfg = EncodeConfig(subsampling="420")
    qtl = cfg.luma_quant.astype(np.float32)
    qtc = cfg.chroma_quant.astype(np.float32)
    img = make_image(h, w, color=True)
    planar = jnp.asarray(np.ascontiguousarray(np.moveaxis(img, -1, 0)))

    def su(x):
        return jnp.sum(x.astype(jnp.uint32))

    def conv(im):
        y, cb, cr = color.rgb_planar_to_ycbcr(im)
        return su(y) + su(cb) + su(cr)

    def conv_sub(im):
        y, cb, cr = color.rgb_planar_to_ycbcr(im)
        return su(y) + su(color.subsample_420(cb)) + su(color.subsample_420(cr))

    def tform(chan, qt):
        ch, cw = chan.shape
        th, tw = fused_transform.padded_dims_tile(ch, cw)
        if (th, tw) != (ch, cw):
            chan = jnp.pad(chan, ((0, th - ch), (0, tw - cw)), mode="edge")
        return fused_transform.transform_tiled(
            chan, jnp.asarray(qt), bitexact=cfg.bitexact,
            out_blocks=(ch // 8, cw // 8),
        )

    def conv_sub_y(im):
        y, cb, cr = color.rgb_planar_to_ycbcr(im)
        zy = tform(y, qtl)
        return su(zy) + su(color.subsample_420(cb)) + su(color.subsample_420(cr))

    def full(im):
        y, cb, cr = color.rgb_planar_to_ycbcr(im)
        zy = tform(y, qtl)
        zcb = tform(color.subsample_420(cb), qtc)
        zcr = tform(color.subsample_420(cr), qtc)
        return su(zy) + su(zcb) + su(zcr)

    def y_only(im):
        # gray-equivalent control: transform of one full-res plane
        return su(tform(im[0], qtl))

    for name, body in (
        ("conv", conv),
        ("conv+sub", conv_sub),
        ("conv+sub+Ytf", conv_sub_y),
        ("full levels", full),
        ("Y transform only", y_only),
    ):
        print(f"{name:<18}{chain_ms(body, planar):>9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

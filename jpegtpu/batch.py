"""Batch encode: many images per dispatch.

The reference encodes one image per process run (natural_c main.c). For
production TPU serving the win is batching: thousands of independent
images amortize dispatch and fill the chip. Strategy (SURVEY.md §7.1 step
6): bucket images by padded shape, pad the batch axis to power-of-two
sizes so at most O(log B * shapes) programs ever compile, and vmap the
whole fused encode (transform + entropy) over the batch axis. Each image
gets its own scan: per-image DC chain, per-image byte stream.
"""
from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from .config import EncodeConfig
from .entropy import device as entropy_device
from .io import jfif
from .ops import blocks
from . import pipeline


@functools.lru_cache(maxsize=128)
def _batch_encode_fn(
    bsz: int,
    ph: int,
    pw: int,
    cfg: EncodeConfig,
    is_rgb: bool,
    cap_words_per_block: int,
    stuff: bool,
):
    """vmapped fused encode over a [bsz, ph, pw(, 3)] batch."""
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)
    nb = (ph // 8) * (pw // 8)

    def one(img):
        zz = pipeline._gray_levels(
            img, cfg, jnp.asarray(basis_np), jnp.asarray(qtable_np), is_rgb
        )
        return entropy_device.encode_scan_device(
            zz,
            capacity_words=nb * cap_words_per_block,
            pad_ones=cfg.pad_ones,
            stuff=stuff,
            # Under vmap the sequential-deposit concat's per-image dynamic
            # offsets lower to scatters — force the pure tree instead.
            deposit_threshold=1,
            fused=False,
        )

    return jax.jit(jax.vmap(one))


def _bucket_batch(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=64)
def _batch_color_fn(
    bsz: int, ph: int, pw: int, cfg: EncodeConfig, cap_words_per_block: int
):
    """vmapped fused color encode over a [bsz, ph, pw, 3] batch."""
    from . import color_pipeline as cp

    basis_np = cfg.dct_basis()
    qtl_np = cfg.luma_quant.astype(np.float32)
    qtc_np = cfg.chroma_quant.astype(np.float32)
    gather_idx, table_sel, comp_id = cp._scan_layout(ph, pw, cfg.subsampling)
    nslots = gather_idx.shape[0]

    def one(img):
        zz = cp._color_levels(
            img, cfg, jnp.asarray(basis_np), jnp.asarray(qtl_np),
            jnp.asarray(qtc_np),
        )
        dc_diff = cp._per_component_dc_diff(zz[:, 0], comp_id)
        return entropy_device.encode_scan_device(
            zz,
            table_sel=jnp.asarray(table_sel),
            dc_diff=dc_diff,
            capacity_words=nslots * cap_words_per_block,
            pad_ones=cfg.pad_ones,
            deposit_threshold=1,  # deposit degenerates to scatters under vmap
        )

    return jax.jit(jax.vmap(one))


def encode_color_batch(
    images: list[np.ndarray], config: EncodeConfig | None = None
) -> list[bytes]:
    """Encode a list of RGB uint8 images to color JFIF streams in
    one-or-few device dispatches. Returns files in input order."""
    from . import color_pipeline as cp

    config = config or EncodeConfig(subsampling="420")
    groups = defaultdict(list)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        ph, pw = cp.padded_dims_color(h, w, config.subsampling)
        groups[(ph, pw)].append(i)

    out: list[bytes | None] = [None] * len(images)
    for (ph, pw), idxs in groups.items():
        batch = []
        for i in idxs:
            img = images[i]
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            h, w = img.shape[:2]
            if (ph, pw) != (h, w):
                img = np.pad(img, [(0, ph - h), (0, pw - w), (0, 0)], mode="edge")
            batch.append(img)
        bsz = _bucket_batch(len(batch))
        while len(batch) < bsz:
            batch.append(np.zeros_like(batch[0]))
        arr = jnp.asarray(np.stack(batch))

        for cap in (
            config.capacity_words_per_block,
            entropy_device.MAX_WORDS_PER_BLOCK,
        ):
            fn = _batch_color_fn(bsz, ph, pw, config, cap)
            bufs, counts, overflow = jax.device_get(fn(arr))
            if not overflow[: len(idxs)].any():
                break
        else:
            raise AssertionError("worst-case entropy capacity overflowed (bug)")

        for j, i in enumerate(idxs):
            h, w = images[i].shape[:2]
            seg = bufs[j, : int(counts[j])].tobytes()
            out[i] = jfif.assemble(w, h, config, [seg])
    return out  # type: ignore[return-value]


def encode_grayscale_batch(
    images: list[np.ndarray],
    config: EncodeConfig | None = None,
    mesh=None,
) -> list[bytes]:
    """Encode a list of uint8 images ([H,W] or [H,W,3]) to grayscale JFIF
    streams in one-or-few device dispatches. Returns files in input order.

    mesh: optional 1-D jax.sharding.Mesh — the batch axis shards across
    its devices (data parallelism over images, SURVEY.md §2.4): each chip
    encodes its images independently, no collectives at all."""
    config = config or EncodeConfig()
    host_stuff = config.stuff == "host" and pipeline._native_available()

    # bucket by (padded shape, rgb-ness)
    groups = defaultdict(list)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        ph, pw = blocks.padded_dims(h, w)
        groups[(ph, pw, img.ndim == 3)].append(i)

    out: list[bytes | None] = [None] * len(images)
    for (ph, pw, is_rgb), idxs in groups.items():
        batch = []
        for i in idxs:
            img = images[i]
            h, w = img.shape[:2]
            if (ph, pw) != (h, w):
                pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
                img = np.pad(img, pad, mode="edge")
            batch.append(img)
        bsz = _bucket_batch(len(batch))
        if mesh is not None:
            n_dev = mesh.devices.size
            bsz = -(-bsz // n_dev) * n_dev
        while len(batch) < bsz:
            batch.append(np.zeros_like(batch[0]))
        arr = jnp.asarray(np.stack(batch))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            arr = jax.device_put(
                arr, NamedSharding(mesh, PartitionSpec(axis))
            )

        for cap in (
            config.capacity_words_per_block,
            entropy_device.MAX_WORDS_PER_BLOCK,
        ):
            fn = _batch_encode_fn(
                bsz, ph, pw, config, is_rgb, cap, not host_stuff,
            )
            bufs, counts, overflow = jax.device_get(fn(arr))
            if not overflow[: len(idxs)].any():
                break
        else:
            raise AssertionError("worst-case entropy capacity overflowed (bug)")

        for j, i in enumerate(idxs):
            h, w = images[i].shape[:2]
            if host_stuff:
                from . import native

                total_bits = int(counts[j])
                seg = native.words_to_stuffed(
                    bufs[j, : (total_bits + 31) // 32], total_bits
                )
            else:
                seg = bufs[j, : int(counts[j])].tobytes()
            out[i] = jfif.assemble(w, h, config, [seg])
    return out  # type: ignore[return-value]

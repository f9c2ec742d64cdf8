"""Multi-chip sharded encode: MCU-row shards + restart-marker stitching.

The reference is a single-image, single-core-offload encoder; its only
"distributed" axis is the A72->C7x IPC boundary (SURVEY.md §2.4-2.5). The
TPU-native scale-out replaces that with a jax.sharding.Mesh:

  * The image is sharded by MCU rows (rows of 8x8 blocks) across the mesh
    axis — the "sequence parallel" analog for images (SURVEY.md §5.7).
  * The two serial dependencies of the JPEG scan are broken per shard:
    - the DC predictor resets at each restart marker (T.81 F.1.2.3), so a
      shard == a restart segment and each chip runs an independent chain
      (vs the reference's global lastDC, natural_c rle.c:59-70);
    - the bitstream is byte-aligned per segment, so each chip packs its own
      bytes and the host concatenates segment_0 || RST_0 || segment_1 || …
  * The only cross-chip communication is an all_gather of per-shard byte
    lengths (each chip then knows every segment's offset) — a few bytes
    over ICI, replacing the reference's shared-DDR DTO handoff
    (dsp main.c:471-490).

Everything inside the shard_map is ordinary single-chip pipeline code, so
the multichip path reuses ops/ and entropy/ verbatim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EncodeConfig
from ..entropy import device as entropy_device
from ..io import jfif
from ..ops import blocks
from .. import pipeline


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the 'shard' axis. Within one slice this rides ICI."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("shard",))


def shard_padded_dims(h: int, w: int, n_shards: int) -> tuple[int, int]:
    """Pad dims so width is a block multiple and height splits into
    n_shards equal bands of whole MCU rows."""
    ph = (h + 8 * n_shards - 1) // (8 * n_shards) * (8 * n_shards)
    pw = (w + 7) // 8 * 8
    return ph, pw


@functools.lru_cache(maxsize=32)
def _sharded_encode_fn(
    mesh: Mesh,
    ph: int,
    pw: int,
    cfg: EncodeConfig,
    is_rgb: bool,
    cap_words_per_block: int,
):
    """Build the jitted sharded encode step for a padded shape.

    Returns fn(img) -> (bufs [n, cap], nbytes [n], overflow [n], offsets [n])
    where offsets[i] is segment i's byte offset within the concatenated scan
    (restart markers included) — computed on-device from the all_gather.
    """
    n = mesh.devices.size
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)
    nb_local = (ph // n // 8) * (pw // 8)
    cap = nb_local * cap_words_per_block

    def local_encode(img_local):
        basis = jnp.asarray(basis_np)
        qtable = jnp.asarray(qtable_np)
        zz = pipeline._gray_levels(img_local, cfg, basis, qtable, is_rgb)
        buf, nbytes, overflow = entropy_device.encode_scan_device(
            zz, capacity_words=cap, pad_ones=cfg.pad_ones
        )
        # Cross-shard exchange: every chip learns all segment lengths, so
        # each can compute its own output offset (segment bytes + 2-byte
        # RSTn between segments). ~n*4 bytes over ICI.
        all_len = jax.lax.all_gather(nbytes, "shard")  # [n]
        my = jax.lax.axis_index("shard")
        before = jnp.where(jnp.arange(n) < my, all_len, 0).sum()
        offset = before + 2 * my  # RST markers between prior segments
        return (
            buf[None, :],
            nbytes[None],
            overflow[None],
            offset[None],
        )

    sharded = jax.shard_map(
        local_encode,
        mesh=mesh,
        in_specs=P("shard", None),
        out_specs=(P("shard", None), P("shard"), P("shard"), P("shard")),
        # pallas_call inside shard_map needs vma annotations on out_shape
        # unless varying-mesh-axis checking is off; everything here is
        # fully shard-local so the check adds nothing.
        check_vma=False,
    )
    return jax.jit(sharded)


def encode_grayscale_sharded(
    image: np.ndarray,
    config: EncodeConfig | None = None,
    mesh: Mesh | None = None,
) -> bytes:
    """Multi-chip grayscale encode: returns a standard JFIF stream whose
    scan is n_shards restart segments. Decodes identically to a single-chip
    encode of the same pixels at the same restart interval (verified by
    tests/test_sharding.py)."""
    config = config or EncodeConfig()
    mesh = mesh or make_mesh()
    n = mesh.devices.size
    h, w = image.shape[:2]
    ph, pw = shard_padded_dims(h, w, n)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    is_rgb = image.ndim == 3

    for cap in pipeline.capacity_ladder(config):
        fn = _sharded_encode_fn(mesh, ph, pw, config, is_rgb, cap)
        bufs, nbytes, overflow, _ = jax.device_get(fn(jnp.asarray(image)))
        if not overflow.any():
            break
    else:
        raise AssertionError("worst-case entropy capacity overflowed (bug)")

    mcu_per_shard = (ph // n // 8) * (pw // 8)
    restart_cfg = EncodeConfig(
        quality=config.quality,
        subsampling=config.subsampling,
        restart_interval=mcu_per_shard,
        pad_ones=config.pad_ones,
        bitexact=config.bitexact,
    )
    segments = [bufs[i, : int(nbytes[i])].tobytes() for i in range(n)]
    return jfif.assemble(w, h, restart_cfg, segments)

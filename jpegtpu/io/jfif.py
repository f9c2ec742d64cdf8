"""JFIF/JPEG marker-segment serialization (host side).

Produces the same marker set as the reference writer
(natural_c/src/io/jpeg_handler.c:7-117: APP0/DQT/SOF0/DHT/SOS/EOI) and
extends it with the segments the reference lacks: multi-component frames,
chrominance tables, and DRI/RSTn restart markers (the multi-chip stitching
mechanism, SURVEY.md §5.7).

For grayscale Q50 the header bytes are byte-identical to the reference's
(verified against its struct layout in jpeg_handler.h:17-97). SOF0 carries
the ORIGINAL image dimensions while the entropy stream encodes padded block
content — standard behavior (decoders consume ceil(dim/8) MCUs), matching
natural_c (jpeg_handler.c:226) rather than the DSP client's padded dims.
"""
from __future__ import annotations

import struct
from typing import Sequence

import numpy as np

from .. import tables
from ..config import EncodeConfig

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"


def app0() -> bytes:
    return b"\xff\xe0" + struct.pack(
        ">H5sHBHHBB", 16, b"JFIF\x00", 0x0101, 1, 96, 96, 0, 0
    )


def dqt(table: np.ndarray, table_id: int) -> bytes:
    """One 8-bit quantization table segment. `table` is [8,8] raster order;
    serialized in zigzag order per T.81 (reference jpeg_handler.c:36-50)."""
    zz = table.reshape(64)[tables.ZIGZAG_ORDER].astype(np.uint8)
    return b"\xff\xdb" + struct.pack(">HB", 67, table_id) + zz.tobytes()


def sof0(width: int, height: int, components: Sequence[tuple]) -> bytes:
    """Baseline frame header. `components` = [(id, h_samp, v_samp, qtbl_id)].

    T.81 B.2.2: the X/Y frame fields are 16-bit, so each dimension must
    be in [1, 65535] — validated here with a clear error instead of a
    struct.error deep in serialization."""
    for name, v in (("width", width), ("height", height)):
        if not 1 <= v <= 0xFFFF:
            raise ValueError(
                f"JPEG {name} must be in [1, 65535] (T.81 16-bit SOF "
                f"field), got {v}"
            )
    body = struct.pack(">BHHB", 8, height, width, len(components))
    for cid, h, v, q in components:
        body += struct.pack(">BBB", cid, (h << 4) | v, q)
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def dht(bits: np.ndarray, values: np.ndarray, table_class: int, table_id: int) -> bytes:
    """One Huffman table segment. table_class: 0=DC, 1=AC."""
    body = bytes([(table_class << 4) | table_id]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def dri(interval: int) -> bytes:
    """Define Restart Interval (MCUs between RSTn markers)."""
    return b"\xff\xdd" + struct.pack(">HH", 4, interval)


def rst(n: int) -> bytes:
    """RSTn marker, n in [0, 7] cycling."""
    return bytes([0xFF, 0xD0 + (n & 7)])


def sos(components: Sequence[tuple]) -> bytes:
    """Scan header. `components` = [(id, dc_tbl, ac_tbl)]."""
    body = bytes([len(components)])
    for cid, dc, ac in components:
        body += struct.pack(">BB", cid, (dc << 4) | ac)
    body += struct.pack(">BBB", 0, 63, 0)
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _spec(huffman_specs, key, default_bits, default_values):
    if huffman_specs and key in huffman_specs:
        return huffman_specs[key]
    return default_bits, default_values


def grayscale_headers(
    width: int, height: int, config: EncodeConfig, huffman_specs=None
) -> bytes:
    """All segments up to (and including) SOS for a 1-component scan.

    Byte-parity with the reference's header block at Q50
    (jpeg_handler.c:220-233). huffman_specs: optional per-class
    (bits, values) overrides (2-pass optimal tables)."""
    out = [
        SOI,
        app0(),
        dqt(config.luma_quant, 0),
        sof0(width, height, [(1, 1, 1, 0)]),
        dht(*_spec(huffman_specs, "dc_lum",
                   tables.STD_DC_LUMINANCE_BITS,
                   tables.STD_DC_LUMINANCE_VALUES), 0, 0),
        dht(*_spec(huffman_specs, "ac_lum",
                   tables.STD_AC_LUMINANCE_BITS,
                   tables.STD_AC_LUMINANCE_VALUES), 1, 0),
    ]
    if config.restart_interval:
        out.append(dri(config.restart_interval))
    out.append(sos([(1, 0, 0)]))
    return b"".join(out)


def color_headers(
    width: int, height: int, config: EncodeConfig, huffman_specs=None
) -> bytes:
    """Segments up to SOS for a 3-component YCbCr scan (420/422/444)."""
    ysamp = {"420": (2, 2), "422": (2, 1)}.get(config.subsampling, (1, 1))
    out = [
        SOI,
        app0(),
        dqt(config.luma_quant, 0),
        dqt(config.chroma_quant, 1),
        sof0(
            width,
            height,
            [(1, ysamp[0], ysamp[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)],
        ),
        dht(*_spec(huffman_specs, "dc_lum",
                   tables.STD_DC_LUMINANCE_BITS,
                   tables.STD_DC_LUMINANCE_VALUES), 0, 0),
        dht(*_spec(huffman_specs, "ac_lum",
                   tables.STD_AC_LUMINANCE_BITS,
                   tables.STD_AC_LUMINANCE_VALUES), 1, 0),
        dht(*_spec(huffman_specs, "dc_chrom",
                   tables.STD_DC_CHROMINANCE_BITS,
                   tables.STD_DC_CHROMINANCE_VALUES), 0, 1),
        dht(*_spec(huffman_specs, "ac_chrom",
                   tables.STD_AC_CHROMINANCE_BITS,
                   tables.STD_AC_CHROMINANCE_VALUES), 1, 1),
    ]
    if config.restart_interval:
        out.append(dri(config.restart_interval))
    out.append(sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)]))
    return b"".join(out)


def assemble(
    width: int,
    height: int,
    config: EncodeConfig,
    entropy_segments: Sequence[bytes],
    huffman_specs=None,
) -> bytes:
    """Full JFIF file: headers + RST-delimited entropy segments + EOI.

    With one segment this is the reference's single-scan layout; with many,
    segments are joined by cycling RST0..RST7 markers (requires
    config.restart_interval to be set so the decoder expects them).
    """
    if len(entropy_segments) > 1 and not config.restart_interval:
        raise ValueError("multiple entropy segments require a restart_interval")
    if config.n_components == 1:
        head = grayscale_headers(width, height, config, huffman_specs)
    else:
        head = color_headers(width, height, config, huffman_specs)
    parts = [head]
    for i, seg in enumerate(entropy_segments):
        if i:
            parts.append(rst(i - 1))
        parts.append(bytes(seg))
    parts.append(EOI)
    return b"".join(parts)

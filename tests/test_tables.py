"""Constant tables and canonical Huffman code generation."""
import numpy as np

from jpegtpu import tables


def test_zigzag_order_is_standard():
    # First and last few entries of the T.81 zigzag sequence.
    assert list(tables.ZIGZAG_ORDER[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
    assert list(tables.ZIGZAG_ORDER[-4:]) == [47, 55, 62, 63]
    assert sorted(tables.ZIGZAG_ORDER) == list(range(64))


def test_zigzag_inverse():
    assert np.array_equal(
        tables.ZIGZAG_ORDER[tables.INV_ZIGZAG], np.arange(64)
    )


def test_quality_scaling_q50_identity():
    t = tables.quality_scaled_table(tables.STD_LUMINANCE_QUANT, 50)
    assert np.array_equal(t, tables.STD_LUMINANCE_QUANT)


def test_quality_scaling_monotone_and_clamped():
    q10 = tables.quality_scaled_table(tables.STD_LUMINANCE_QUANT, 10)
    q95 = tables.quality_scaled_table(tables.STD_LUMINANCE_QUANT, 95)
    assert (q10.astype(int) >= q95.astype(int)).all()
    assert q95.min() >= 1
    q100 = tables.quality_scaled_table(tables.STD_LUMINANCE_QUANT, 100)
    assert q100.min() >= 1  # never zero divisor


def test_canonical_dc_codes():
    codes, lengths = tables.canonical_codes(
        tables.STD_DC_LUMINANCE_BITS, tables.STD_DC_LUMINANCE_VALUES
    )
    # Known canonical values for the Annex-K DC luminance table.
    assert lengths[0] == 2 and codes[0] == 0b00
    assert lengths[1] == 3 and codes[1] == 0b010
    assert lengths[11] == 9 and codes[11] == 0b111111110


def test_canonical_ac_codes():
    codes, lengths = tables.canonical_codes(
        tables.STD_AC_LUMINANCE_BITS, tables.STD_AC_LUMINANCE_VALUES
    )
    # EOB (0x00) = 1010, ZRL (0xF0) = 11111111001 per T.81 Table K.5.
    assert lengths[0x00] == 4 and codes[0x00] == 0b1010
    assert lengths[0xF0] == 11 and codes[0xF0] == 0b11111111001
    assert lengths[0x01] == 2 and codes[0x01] == 0b00


def test_codes_are_prefix_free():
    for key, (codes, lengths) in tables.huffman_luts().items():
        used = [(int(codes[s]), int(lengths[s])) for s in range(256) if lengths[s]]
        as_strings = [format(c, f"0{l}b") for c, l in used]
        assert len(set(as_strings)) == len(as_strings), key
        for a in as_strings:
            for b in as_strings:
                if a is not b and len(a) < len(b):
                    assert not b.startswith(a), (key, a, b)


def test_dct_basis_orthonormal():
    t = tables.dct_basis(np.float64)
    assert np.allclose(t @ t.T, np.eye(8), atol=1e-12)


def test_reference_basis_close_to_orthonormal():
    t = tables.dct_basis_reference(np.float64)
    assert np.allclose(t @ t.T, np.eye(8), atol=1e-5)

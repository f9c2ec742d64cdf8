"""Host entropy coder vs reference goldens: RLE symbolization semantics and
bit-for-bit stream equality."""
import numpy as np

from jpegtpu.entropy import host as eh


def test_symbolize_matches_reference_rle(golden):
    zz = golden["zigzag"].astype(np.int32)
    symbols, amps, bits, is_dc, block_of = eh.symbolize(zz)
    assert np.array_equal(symbols, golden["rle_symbols"])
    assert np.array_equal(bits, golden["rle_codebits"])
    # The reference stores the UNMASKED amplitude for negatives
    # (rle.c:24-35: raw val-1 as uint16; masking happens at putBits).
    # Compare masked-to-size values, which is what reaches the stream.
    ref_amp = golden["rle_codes"].astype(np.uint32)
    ref_bits = golden["rle_codebits"].astype(np.uint32)
    mask = (np.uint64(1) << ref_bits.astype(np.uint64)) - np.uint64(1)
    assert np.array_equal(amps, (ref_amp & mask).astype(np.uint32))


def test_stream_bit_exact(golden):
    zz = golden["zigzag"].astype(np.int32)
    seg = eh.encode_scan(zz, pad_ones=False)[0]  # natural_c pads 0s
    assert seg == golden["stream"].tobytes()


def test_magnitude_category():
    v = np.array([0, 1, -1, 2, 3, -3, 4, 7, 8, -8, 255, -255, 1023, -2047])
    expect = np.array([0, 1, 1, 2, 2, 2, 3, 3, 4, 4, 8, 8, 10, 11])
    assert np.array_equal(eh.magnitude_category(v), expect)


def test_amplitude_code_negative():
    # -3 with size 2 -> binary 00; -1 with size 1 -> 0; 5 -> 101.
    v = np.array([-3, -1, 5, -2047])
    sz = eh.magnitude_category(v)
    amp = eh.amplitude_code(v, sz)
    assert amp[0] == 0b00
    assert amp[1] == 0
    assert amp[2] == 0b101
    assert amp[3] == 0  # -2047 is all-zeros in 11 bits


def test_dc_differences_chains_and_segments():
    dc = np.array([5, 7, 4, 9, 9, 1], dtype=np.int32)
    # single chain
    assert list(eh.dc_differences(dc)) == [5, 2, -3, 5, 0, -8]
    # two segments of 3: predictor resets
    seg = np.array([0, 0, 0, 1, 1, 1])
    assert list(eh.dc_differences(dc, segment_ids=seg)) == [5, 2, -3, 9, 0, -8]
    # interleaved components: independent chains
    comp = np.array([0, 1, 0, 1, 0, 1])
    assert list(eh.dc_differences(dc, comp_id=comp)) == [5, 7, -1, 2, 5, -8]


def test_byte_stuffing():
    raw = np.array([0x12, 0xFF, 0x34, 0xFF, 0xFF], dtype=np.uint8)
    assert eh.stuff_bytes(raw) == bytes(
        [0x12, 0xFF, 0x00, 0x34, 0xFF, 0x00, 0xFF, 0x00]
    )


def test_pack_bits_padding():
    # 5 bits of zeros -> pad_ones fills 0b00000111 = 0x07
    vals = np.array([0], dtype=np.uint64)
    lens = np.array([5])
    assert eh.pack_bits(vals, lens, pad_ones=True) == b"\x07"
    assert eh.pack_bits(vals, lens, pad_ones=False) == b"\x00"
    # all-ones flush producing 0xFF must still be stuffed
    vals = np.array([0b11111], dtype=np.uint64)
    assert eh.pack_bits(vals, lens, pad_ones=True) == b"\xff\x00"


def test_zrl_runs():
    # one block: DC=0, 20 zeros, then 1, rest zeros
    zz = np.zeros((1, 64), dtype=np.int32)
    zz[0, 21] = 1
    symbols, amps, bits, is_dc, _ = eh.symbolize(zz)
    # DC(size 0), ZRL, (4<<4 | 1), EOB
    assert list(symbols) == [0x00, 0xF0, 0x41, 0x00]
    assert list(is_dc) == [True, False, False, False]


def test_no_eob_when_last_lane_nonzero():
    zz = np.zeros((1, 64), dtype=np.int32)
    zz[0, 63] = -1
    symbols, *_ = eh.symbolize(zz)
    # DC, 3x ZRL (62 zeros = 3*16 + 14), (14<<4|1); no EOB
    assert list(symbols) == [0x00, 0xF0, 0xF0, 0xF0, 0xE1]


def test_all_zero_block():
    zz = np.zeros((2, 64), dtype=np.int32)
    symbols, *_ = eh.symbolize(zz)
    assert list(symbols) == [0x00, 0x00, 0x00, 0x00]  # DC + EOB per block

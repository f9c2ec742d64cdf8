#!/usr/bin/env python3
"""Generate tests/golden/<image>.npz from the reference encoder.

Runs tools/golden_gen/dump_stages (built against the read-only reference at
/root/reference) on every corpus BMP and packs the per-stage dumps into one
compressed npz per image. These are the bit-parity fixtures for the test
suite (SURVEY.md §4).

The float DCT intermediate is stored only for the first 64 blocks (sanity
probe); the authoritative parity targets are the integer stages.
"""
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF_INPUT = "/root/reference/assets/input"
OUT_DIR = os.path.join(REPO, "tests", "golden")


def read_meta(path):
    meta = {}
    with open(path) as f:
        for line in f:
            k, v = line.split()
            meta[k] = int(v)
    return meta


def main():
    bin_path = os.path.join(HERE, "build", "dump_stages")
    if not os.path.exists(bin_path):
        subprocess.run(["make", "-C", HERE], check=True)
    os.makedirs(OUT_DIR, exist_ok=True)

    for bmp in sorted(os.listdir(REF_INPUT)):
        if not bmp.endswith(".bmp"):
            continue
        name = bmp[:-4]
        tmp = f"/tmp/golden_{name}"
        os.makedirs(tmp, exist_ok=True)
        subprocess.run([bin_path, os.path.join(REF_INPUT, bmp), tmp], check=True)
        meta = read_meta(os.path.join(tmp, "meta.txt"))
        pw, ph = meta["pad_width"], meta["pad_height"]
        nb = meta["total_blocks"]

        def load(fname, dtype):
            return np.fromfile(os.path.join(tmp, fname), dtype=dtype)

        dct = load("dct.f32", np.float32).reshape(ph, pw)
        np.savez_compressed(
            os.path.join(OUT_DIR, f"{name}.npz"),
            orig_width=meta["orig_width"],
            orig_height=meta["orig_height"],
            pad_width=pw,
            pad_height=ph,
            total_blocks=nb,
            y=load("y.u8", np.uint8).reshape(ph, pw),
            centered=load("centered.i8", np.int8).reshape(ph, pw),
            dct_probe=dct[:8, :].copy(),  # first row of blocks only
            quant=load("quant.i16", np.int16).reshape(ph, pw),
            zigzag=load("zigzag.i16", np.int16).reshape(nb, 64),
            rle_symbols=load("rle_symbols.u8", np.uint8),
            rle_codes=load("rle_codes.u16", np.uint16),
            rle_codebits=load("rle_codebits.u8", np.uint8),
            stream=load("stream.u8", np.uint8),
        )
        print(f"wrote tests/golden/{name}.npz")


if __name__ == "__main__":
    sys.exit(main())

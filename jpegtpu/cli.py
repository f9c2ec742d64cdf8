"""Command-line interface.

Mirrors the reference CLIs (natural_c main.c:9-15 `jpeg_compression_app
<in> <out>`; dsp main.c:347-374 `--input_path/--output_path`) and extends
them with the config the reference hardwires (SURVEY.md §5.6): quality,
subsampling, restart interval, entropy backend.

    python -m jpegtpu.cli encode in.bmp out.jpg [--quality 50]
        [--subsampling gray|420|444] [--restart-interval N]
        [--entropy device|host] [--stats]
    python -m jpegtpu.cli analyze orig.bmp compressed.jpg [-o diff.png]
"""
from __future__ import annotations

import argparse
import sys
import time


def _cmd_encode(args) -> int:
    from . import pipeline
    from .config import EncodeConfig

    config = EncodeConfig(
        quality=args.quality,
        subsampling=args.subsampling,
        restart_interval=args.restart_interval,
        entropy=args.entropy,
    )
    t0 = time.perf_counter()
    nbytes = pipeline.encode_file(args.input, args.output, config)
    dt = time.perf_counter() - t0
    if args.stats:
        from .io import bmp

        img = bmp.read(args.input)
        h, w = img.shape[:2]
        print(
            f"{args.input} {w}x{h} -> {args.output} {nbytes} bytes "
            f"({w * h / dt / 1e6:.1f} MPix/s incl. warmup/compile)",
            file=sys.stderr,
        )
    return 0


def _cmd_analyze(args) -> int:
    from .analysis import analyze_pair, format_report

    result = analyze_pair(args.original, args.compressed, diff_path=args.output)
    print(format_report(result))
    return 0


def _cmd_analyze_dir(args) -> int:
    """Batch driver: for each <input_dir>/*.bmp with a matching compressed
    file in <output_dir>, analyze and (optionally) render a difference map
    — the reference's run_analysis.sh:13-34 loop."""
    import glob
    import os

    from .analysis import analyze_pair, format_report

    n = 0
    for bmp_path in sorted(glob.glob(os.path.join(args.input_dir, "*.bmp"))):
        stem = os.path.splitext(os.path.basename(bmp_path))[0]
        comp = None
        for ext in (".jpeg", ".jpg"):
            cand = os.path.join(args.output_dir, stem + ext)
            if os.path.exists(cand):
                comp = cand
                break
        if comp is None:
            continue
        diff = None
        if args.difference_dir:
            os.makedirs(args.difference_dir, exist_ok=True)
            diff = os.path.join(args.difference_dir, stem + ".png")
        print(format_report(analyze_pair(bmp_path, comp, diff_path=diff)))
        print()
        n += 1
    if n == 0:
        print("no matching (input.bmp, output.jpeg) pairs found", file=sys.stderr)
        return 1
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jpegtpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="BMP in, baseline JPEG out")
    enc.add_argument("input")
    enc.add_argument("output")
    enc.add_argument("--quality", type=int, default=50)
    enc.add_argument(
        "--subsampling", choices=["gray", "420", "444"], default="gray"
    )
    enc.add_argument("--restart-interval", type=int, default=0)
    enc.add_argument("--entropy", choices=["device", "host"], default="device")
    enc.add_argument("--stats", action="store_true")
    enc.set_defaults(fn=_cmd_encode)

    ana = sub.add_parser(
        "analyze", help="quality metrics vs original (MSE/PSNR/SSIM/CR/BPP)"
    )
    ana.add_argument("original")
    ana.add_argument("compressed")
    ana.add_argument("-o", "--output", default=None, help="difference-map PNG")
    ana.set_defaults(fn=_cmd_analyze)

    bat = sub.add_parser(
        "analyze-dir",
        help="batch analysis over a corpus (the reference's run_analysis.sh)",
    )
    bat.add_argument("input_dir")
    bat.add_argument("output_dir")
    bat.add_argument("-d", "--difference-dir", default=None)
    bat.set_defaults(fn=_cmd_analyze_dir)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI decoder: VVC (annex-B or MP4) in, frame hashes / raw YUV out.

The framework's `ffmpeg -i x.vvc -f framemd5 -` analog
(fftools parity: framecrc/framemd5 muxers, tests/fate-run.sh:156).
Input container is auto-probed (formats/probe.py); MP4 samples are
converted through the vvcC/mp4toannexb path.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="decode VVC to frame MD5 / yuv")
    p.add_argument("input")
    p.add_argument("--framemd5", action="store_true",
                   help="print one MD5 line per frame (default)")
    p.add_argument("--yuv", help="write raw planar YUV to this path")
    p.add_argument("--strict", action="store_true",
                   help="raise on stream errors instead of containing")
    p.add_argument("--cpu", action="store_true",
                   help="force the XLA CPU backend (the TPU plugin wins "
                        "platform selection over JAX_PLATFORMS env)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..formats import open_input
    from ..models.vvc.decoder import DecoderConfig, VVCDecoder

    data, _info = open_input(args.input)
    dec = VVCDecoder(config=DecoderConfig(
        errors="raise" if args.strict else "contain"))
    yuv = open(args.yuv, "wb") if args.yuv else None
    n = 0
    for frame in dec.decode(data):
        print(f"{n}, {frame.poc}, {frame.width}x{frame.height}, {frame.md5()}")
        if yuv:
            for plane in frame.planes:
                yuv.write(plane.tobytes())
        n += 1
    if yuv:
        yuv.close()
    print(f"decoded {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

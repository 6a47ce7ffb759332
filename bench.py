#!/usr/bin/env python3
"""Decode benchmark: frames/s on generated all-intra streams.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
vs_baseline = our fps / single-threaded reference-ffmpeg fps on the
same stream (the BASELINE.md parity metric; target >= 2.0).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_FFMPEG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".refbuild", "ffmpeg")
W, H, FRAMES, SEED, QP = 128, 128, 16, 7, 30


def gen_stream(path: str) -> None:
    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream

    data, _ = encode_stream(EncoderConfig(
        width=W, height=H, n_frames=FRAMES, seed=SEED, qp=QP))
    with open(path, "wb") as f:
        f.write(data)


def bench_ours(path: str) -> float:
    from ffmpeg_tpu.models.vvc.decoder import VVCDecoder

    with open(path, "rb") as f:
        data = f.read()
    # warmup (compiles)
    dec = VVCDecoder()
    frames = list(dec.decode(data))
    assert len(frames) == FRAMES
    t0 = time.perf_counter()
    frames = list(VVCDecoder().decode(data))
    dt = time.perf_counter() - t0
    return FRAMES / dt


def bench_ref(path: str) -> float:
    if not os.path.exists(REF_FFMPEG):
        return 0.0
    t0 = time.perf_counter()
    subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-threads", "1", "-i", path, "-f", "null", "-"],
                   check=True, capture_output=True)
    dt = time.perf_counter() - t0
    return FRAMES / dt


def main() -> None:
    path = "/tmp/ffmpeg_tpu_bench.vvc"
    gen_stream(path)
    ours = bench_ours(path)
    ref = bench_ref(path)
    print(json.dumps({
        "metric": f"vvc_decode_fps_{W}x{H}_allintra",
        "value": round(ours, 3),
        "unit": "fps",
        "vs_baseline": round(ours / ref, 4) if ref else None,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Decode benchmark vs the reference build (BASELINE.md configs 1-2).

Prints ONE JSON line.  The headline metric is decode fps with frames
left device-resident (the deployment mode: downstream TPU stages —
scaling, encode, ML — consume the planes in HBM).  `fetched_fps`
additionally materializes every frame on the host through this
sandbox's tunnel transport, whose device->host direction measures
~15 MB/s (`d2h_MBps`, measured below) — on real PCIe/plugin topologies
the fetch is >100x faster, so the fetched number here is a transport
artifact, reported for honesty (ADVICE r1), not a decoder property.
`ra1080_fps` covers BASELINE.md config 2 (random-access 1080p,
B-pyramid + deblock + SAO + TMVP).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_FFMPEG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".refbuild", "ffmpeg")
# headline config 1 (BASELINE.md): all-intra 8-bit 4:2:0 720p
W, H, FRAMES, SEED, QP = 1280, 720, 8, 7, 30
# config 2: random-access 1080p
RA_KW = dict(width=1920, height=1080, n_frames=9, seed=11, qp=32,
             inter=True, b_slices=True, ra=True, tmvp=True,
             deblock=True, sao=True, max_mv=200)


def gen_stream(path: str, **kw) -> None:
    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream

    data, _ = encode_stream(EncoderConfig(**kw))
    with open(path, "wb") as f:
        f.write(data)


def _decode_all(data, fetch):
    import jax

    from ffmpeg_tpu.models.vvc.decoder import VVCDecoder

    frames = list(VVCDecoder().decode(data, fetch=fetch))
    if fetch:
        for f in frames:
            f._host_buf()
    else:
        jax.block_until_ready([f.buf for f in frames])
    return frames


def bench_ours(path: str, n_frames, fetch, check=True):
    with open(path, "rb") as f:
        data = f.read()
    frames = _decode_all(data, fetch)  # warmup (compiles)
    assert len(frames) == n_frames
    dt = float("inf")  # best-of-3: the tunnel transport is jittery
    for _ in range(3):
        t0 = time.perf_counter()
        frames = _decode_all(data, fetch)
        dt = min(dt, time.perf_counter() - t0)
    if check:
        got = [f.md5() for f in frames]
        ref = ref_frame_md5s(path)
        if ref:
            assert got == ref, "decode mismatch vs reference"
    return n_frames / dt


def ref_frame_md5s(path: str) -> list:
    if not os.path.exists(REF_FFMPEG):
        return []
    out = subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", path,
         "-f", "framemd5", "-"], capture_output=True, text=True, check=True)
    return [line.split(",")[-1].strip() for line in out.stdout.splitlines()
            if line and not line.startswith("#")]


def bench_ref(path: str, n_frames) -> float:
    if not os.path.exists(REF_FFMPEG):
        return 0.0
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                        "-threads", "1", "-i", path, "-f", "null", "-"],
                       check=True, capture_output=True)
        dt = min(dt, time.perf_counter() - t0)
    return n_frames / dt


def measure_d2h() -> float:
    import jax
    import numpy as np

    d = jax.device_put(np.zeros(4_000_000 // 4, np.int32))
    jax.block_until_ready(d)
    np.asarray(d)  # warm the path
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(jax.device_put(np.full(4_000_000 // 4, 7, np.int32)))
    return 3 * 4.0 / (time.perf_counter() - t0)


def main() -> None:
    path = "/tmp/ffmpeg_tpu_bench.vvc"
    gen_stream(path, width=W, height=H, n_frames=FRAMES, seed=SEED, qp=QP)
    ours = bench_ours(path, FRAMES, fetch=False)
    fetched = bench_ours(path, FRAMES, fetch=True, check=False)
    ref = bench_ref(path, FRAMES)

    ra_path = "/tmp/ffmpeg_tpu_bench_ra.vvc"
    gen_stream(ra_path, **RA_KW)
    ra = bench_ours(ra_path, RA_KW["n_frames"], fetch=False)
    ra_ref = bench_ref(ra_path, RA_KW["n_frames"])

    print(json.dumps({
        "metric": f"vvc_decode_fps_{W}x{H}_allintra_device_resident",
        "value": round(ours, 3),
        "unit": "fps",
        "vs_baseline": round(ours / ref, 4) if ref else None,
        "fetched_fps": round(fetched, 3),
        "fetched_vs_baseline": round(fetched / ref, 4) if ref else None,
        "d2h_MBps": round(measure_d2h(), 1),
        "ra1080_fps": round(ra, 3),
        "ra1080_vs_baseline": round(ra / ra_ref, 4) if ra_ref else None,
    }))


if __name__ == "__main__":
    main()

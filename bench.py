#!/usr/bin/env python3
"""Decode benchmark vs the reference build (BASELINE.md configs 1-3).

Prints ONE JSON line.  The headline metric is decode fps with frames
left device-resident (the deployment mode: downstream TPU stages —
scaling, encode, ML — consume the planes in HBM).  `fetched_fps`
additionally materializes every frame on the host through this
sandbox's tunnel transport, whose device->host direction measures
~15 MB/s (`d2h_MBps`, measured below) — on real PCIe/plugin topologies
the fetch is >100x faster, so the fetched number here is a transport
artifact, reported for honesty (ADVICE r1), not a decoder property.

Engineered to COMPLETE (round-2 postmortem: rc=124, no number):
  * generated bitstreams are cached in .bench_streams/ keyed by
    (encoder-source hash, config) — generation costs ~0 s warm;
  * the persistent XLA compile cache lives in .jax_cache/ inside the
    repo workdir, surviving rounds;
  * an internal wall-clock budget runs the headline config first and
    emits whatever completed if later configs would blow the budget.
"""
import hashlib
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

REF_FFMPEG = os.path.join(ROOT, ".refbuild", "ffmpeg")
STREAM_CACHE = os.path.join(ROOT, ".bench_streams")

# Total wall budget.  The driver kills the bench if it runs too long;
# stay safely below by skipping late configs when the clock runs down.
BUDGET_S = float(os.environ.get("FFMPEG_TPU_BENCH_BUDGET_S", "540"))
T_START = time.perf_counter()

# config 1 (headline, BASELINE.md): all-intra 8-bit 4:2:0 720p
AI_KW = dict(width=1280, height=720, n_frames=8, seed=7, qp=30)
# config 2: random-access 1080p (translational MC, SAO, DPB mgmt)
RA_KW = dict(width=1920, height=1080, n_frames=9, seed=11, qp=32,
             inter=True, b_slices=True, ra=True, tmvp=True,
             deblock=True, sao=True, max_mv=200)
# config 3: full inter toolset 1080p (affine/BDOF/CIIP/GPM/MMVD/ALF/LMCS)
FULL_KW = dict(width=1920, height=1080, n_frames=9, seed=23, qp=32,
               inter=True, b_slices=True, ra=True, tmvp=True,
               deblock=True, sao=True, alf=True, ccalf=True, lmcs=True,
               affine=True, prof=True, bdof=True, ciip=True, gpm=True,
               mmvd=True, bcw=True, amvr=True, mip=True, cclm=True,
               max_mv=200)


def _left() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def _encoder_hash() -> str:
    """Hash of every source file the generator's output depends on, so
    cached streams regenerate exactly when the encoder changes."""
    h = hashlib.sha256()
    dirs = [os.path.join(ROOT, "ffmpeg_tpu", d)
            for d in ("encoder", "cbs", "bitstream")]
    for d in dirs:
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".py"):
                with open(os.path.join(d, fn), "rb") as f:
                    h.update(fn.encode() + b"\0" + f.read())
    return h.hexdigest()[:16]


def gen_stream(name: str, **kw) -> str:
    os.makedirs(STREAM_CACHE, exist_ok=True)
    key = hashlib.sha256(
        (_encoder_hash() + repr(sorted(kw.items()))).encode()).hexdigest()[:16]
    path = os.path.join(STREAM_CACHE, f"{name}-{key}.vvc")
    if not os.path.exists(path):
        from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
        data, _ = encode_stream(EncoderConfig(**kw))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return path


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
    result = {
        "metric": "vvc_decode_fps_1280x720_allintra_device_resident",
        "value": None, "unit": "fps", "vs_baseline": None,
    }
    try:
        # headline config first: its JSON fields are filled before any
        # later config can burn the budget.
        path = gen_stream("ai720", **AI_KW)
        ours = bench_ours(path, AI_KW["n_frames"], fetch=False)
        ref = bench_ref(path, AI_KW["n_frames"])
        result["value"] = round(ours, 3)
        result["vs_baseline"] = round(ours / ref, 4) if ref else None

        if _left() > 30:
            fetched = bench_ours(path, AI_KW["n_frames"], fetch=True,
                                 check=False)
            result["fetched_fps"] = round(fetched, 3)
            result["fetched_vs_baseline"] = (
                round(fetched / ref, 4) if ref else None)
            result["d2h_MBps"] = round(measure_d2h(), 1)

        for name, kw, key in (("ra1080", RA_KW, "ra1080"),
                              ("full1080", FULL_KW, "full1080")):
            if _left() < 120:
                result[f"{key}_skipped"] = "budget"
                continue
            try:
                p = gen_stream(name, **kw)
                fps = bench_ours(p, kw["n_frames"], fetch=False)
                rfps = bench_ref(p, kw["n_frames"])
                result[f"{key}_fps"] = round(fps, 3)
                result[f"{key}_vs_baseline"] = (
                    round(fps / rfps, 4) if rfps else None)
            except Exception as e:  # noqa: BLE001 - isolate per config
                result[f"{key}_error"] = f"{type(e).__name__}: {e}"
    except Exception as e:  # noqa: BLE001 - always emit the line
        result["error"] = f"{type(e).__name__}: {e}"
    result["elapsed_s"] = round(time.perf_counter() - T_START, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Decode benchmark vs the reference build (BASELINE.md configs 1-3).

Prints ONE JSON line.  The headline metric is decode fps with frames
left device-resident (the deployment mode: downstream TPU stages —
scaling, encode, ML — consume the planes in HBM).  All three BASELINE
configs (all-intra 720p, RA 1080p, full-toolset 1080p) are measured
every run, in that order, each emitting its fields before the next
starts so a budget kill never erases a completed number.

Robustness (round-3/4 postmortems):
  * generated bitstreams are cached in .bench_streams/ keyed by
    (encoder-source hash, config);
  * the persistent XLA compile cache lives in .jax_cache/;
  * device->host transfers on this sandbox's tunnel can stall for
    minutes (r4: a 256-byte fetch took >400 s), so every fetch runs
    under a timeout — when the transport is wedged the MD5 verify is
    recorded as skipped rather than hanging the bench;
  * an internal wall budget skips later sections instead of dying.
"""
import hashlib
import json
import os
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
os.environ.setdefault("FFMPEG_TPU_TRACE", "1")

REF_FFMPEG = os.path.join(ROOT, ".refbuild", "ffmpeg")
STREAM_CACHE = os.path.join(ROOT, ".bench_streams")

BUDGET_S = float(os.environ.get("FFMPEG_TPU_BENCH_BUDGET_S", "540"))
T_START = time.perf_counter()

# config 1 (headline, BASELINE.md): all-intra 8-bit 4:2:0 720p
AI_KW = dict(width=1280, height=720, n_frames=16, seed=7, qp=30)
# config 2: random-access 1080p (translational MC, SAO, DPB mgmt)
RA_KW = dict(width=1920, height=1080, n_frames=17, seed=11, qp=32,
             inter=True, b_slices=True, ra=True, tmvp=True,
             deblock=True, sao=True, max_mv=200)
# config 3: full inter toolset 1080p (affine/BDOF/DMVR/CIIP/GPM/MMVD/
# ALF/LMCS — BASELINE.json config 3 names DMVR, so it must be timed;
# SMVD is decode-side only: the generator does not emit it)
FULL_KW = dict(width=1920, height=1080, n_frames=17, seed=23, qp=32,
               inter=True, b_slices=True, ra=True, tmvp=True,
               deblock=True, sao=True, alf=True, ccalf=True, lmcs=True,
               affine=True, prof=True, bdof=True, ciip=True, gpm=True,
               mmvd=True, bcw=True, amvr=True, mip=True, cclm=True,
               dmvr=True, max_mv=200)


def _left() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def gen_stream(name: str, **kw) -> str:
    # cache key = config only, NOT the encoder source hash (r4
    # postmortem: the round's own encoder edits invalidated the cache
    # and stream generation ate the bench budget).  A stream generated
    # by an older encoder is still a valid bitstream for timing, and
    # the MD5 verify checks it against the reference decoder anyway.
    os.makedirs(STREAM_CACHE, exist_ok=True)
    key = hashlib.sha256(repr(sorted(kw.items())).encode()).hexdigest()[:16]
    path = os.path.join(STREAM_CACHE, f"{name}-cfg{key}.vvc")
    if not os.path.exists(path):
        from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
        data, _ = encode_stream(EncoderConfig(**kw))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return path


def fetch_with_timeout(getter, timeout_s):
    """Run a device->host fetch in a daemon thread; None on stall."""
    box = []

    def run():
        try:
            box.append(getter())
        except Exception as e:  # noqa: BLE001
            box.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box or isinstance(box[0], Exception):
        return None
    return box[0]


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


def bench_ours(path: str, n_frames, fetch=False, reps=2):
    with open(path, "rb") as f:
        data = f.read()
    frames = _decode_all(data, fetch)  # warmup (compiles)
    assert len(frames) == n_frames
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        frames = _decode_all(data, fetch)
        dt = min(dt, time.perf_counter() - t0)
    return n_frames / dt, frames


def verify_subprocess(path: str, timeout_s=120):
    """MD5 parity vs the reference build, decoded in a SUBPROCESS.

    A stalled device->host fetch must not poison this process (r4
    postmortem: one stuck fetch thread inside the tunnel client
    degraded every later decode by ~20x), so the verifying decode +
    fetch runs isolated and is killed on timeout."""
    ref = ref_frame_md5s(path)
    if not ref:
        return "no-ref"
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from ffmpeg_tpu.models.vvc.decoder import decode_file; "
        "[print(f.md5()) for f in decode_file(%r)]" % (ROOT, path))
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return "skipped-timeout"
    if out.returncode != 0:
        return f"error: {out.stderr.strip().splitlines()[-1][:120]}" \
            if out.stderr.strip() else "error"
    got = [ln.strip() for ln in out.stdout.splitlines() if ln.strip()]
    return "ok" if got == ref else "MISMATCH"


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
    for _ in range(2):
        t0 = time.perf_counter()
        subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                        "-threads", "1", "-i", path, "-f", "null", "-"],
                       check=True, capture_output=True)
        dt = min(dt, time.perf_counter() - t0)
    return n_frames / dt


def stage_breakdown() -> dict:
    from ffmpeg_tpu.utils import trace

    return {k: v["mean_ms"] for k, v in trace.summary().items()
            if isinstance(v, dict) and "mean_ms" in v}


def main() -> None:
    from ffmpeg_tpu.utils import trace

    result = {
        "metric": "vvc_decode_fps_1280x720_allintra_device_resident",
        "value": None, "unit": "fps", "vs_baseline": None,
    }
    configs = [("ai720", AI_KW, True), ("ra1080", RA_KW, False),
               ("full1080", FULL_KW, False)]
    try:
        # generate (or hit the config-keyed cache for) every stream
        # up front, so generation never competes with timing budget
        for name, kw, _ in configs:
            gen_stream(name, **kw)
        for name, kw, headline in configs:
            if not headline and _left() < 100:
                result[f"{name}_skipped"] = "budget"
                continue
            try:
                path = gen_stream(name, **kw)
                trace.reset()
                print(f"[bench] {name}: decoding ({_left():.0f}s left)",
                      file=sys.stderr, flush=True)
                fps, frames = bench_ours(path, kw["n_frames"])
                print(f"[bench] {name}: {fps:.2f} fps ({_left():.0f}s left)",
                      file=sys.stderr, flush=True)
                rfps = bench_ref(path, kw["n_frames"])
                stages = stage_breakdown()
                vs = round(fps / rfps, 4) if rfps else None
                if headline:
                    result["value"] = round(fps, 3)
                    result["vs_baseline"] = vs
                    result["stages_ms"] = stages
                else:
                    result[f"{name}_fps"] = round(fps, 3)
                    result[f"{name}_vs_baseline"] = vs
                    result[f"{name}_stages_ms"] = stages
                del frames
            except Exception as e:  # noqa: BLE001 - isolate per config
                result[f"{name}_error"] = f"{type(e).__name__}: {e}"

        # MD5 parity, isolated per config AFTER every fps number exists
        for name, kw, _ in configs:
            if _left() < 90:
                result[f"{name}_verify"] = "skipped-budget"
                continue
            result[f"{name}_verify"] = verify_subprocess(
                gen_stream(name, **kw), timeout_s=min(150, _left() - 30))

        # transport-inclusive numbers, only when the tunnel is healthy
        if _left() > 90:
            import jax
            import numpy as np
            probe = fetch_with_timeout(
                lambda: np.asarray(jax.device_put(np.zeros(64, np.int32))),
                10)
            if probe is None:
                result["fetched_skipped"] = "d2h-stall"
            else:
                path = gen_stream("ai720", **AI_KW)
                fps, _ = bench_ours(path, AI_KW["n_frames"], fetch=True,
                                    reps=1)
                result["fetched_fps"] = round(fps, 3)
                t0 = time.perf_counter()
                for _ in range(3):
                    np.asarray(jax.device_put(
                        np.full(4_000_000 // 4, 7, np.int32)))
                result["d2h_MBps"] = round(
                    3 * 4.0 / (time.perf_counter() - t0), 1)
    except Exception as e:  # noqa: BLE001 - always emit the line
        result["error"] = f"{type(e).__name__}: {e}"
    result["elapsed_s"] = round(time.perf_counter() - T_START, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-stage decode profile (VERDICT r3 item 5: the tracing tier).

Decodes a stream synchronously, one frame at a time, attributing wall
time to: host CABAC parse, host input build/pack, device dispatch, and
device execute (block_until_ready).  Also reports the wavefront-chunk
statistics that bound the sequential fraction of the frame program.

Usage: python tools/profile_decode.py <stream.vvc> [n_repeats]
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def profile(path: str, repeats: int = 2) -> dict:
    import jax

    from ffmpeg_tpu.models.vvc.decoder import VVCDecoder
    from ffmpeg_tpu.models.vvc.host import HostDecoder, ColStore
    from ffmpeg_tpu.models.vvc.pipeline import (
        build_host_inputs, prepare_frame, submit_frame)

    with open(path, "rb") as f:
        data = f.read()

    dec = VVCDecoder()
    aus = dec._split_aus(data)
    print(f"{len(aus)} access units", file=sys.stderr)

    stats = {"parse_ms": [], "build_ms": [], "pack_ms": [],
             "dispatch_ms": [], "execute_ms": [],
             "n_chunks_y": [], "n_chunks_c": [], "units_y": [],
             "units_c": [], "n_inter_y": []}

    for rep in range(repeats):
        cs = ColStore()
        hd = HostDecoder(cs)
        dpb = {}
        for i, (is_idr, epoch, au) in enumerate(aus):
            t0 = time.perf_counter()
            fs = hd.decode_au(au, epoch)
            t1 = time.perf_counter()
            if fs is None:
                continue
            if fs.cus is not None and "dmvr" in fs.cus \
                    and np.any(fs.cus["dmvr"]):
                from ffmpeg_tpu.models.vvc.host import dmvr_apply
                from ffmpeg_tpu.ops.dmvr import refine_frame_device
                dmvr_apply(fs, cs, epoch, refine_frame_device(fs, dpb))
            inp = build_host_inputs(fs, fs.ctb_log2)
            t2 = time.perf_counter()
            prepared = prepare_frame(fs)
            t3 = time.perf_counter()
            packed, planes = submit_frame(prepared, fs, dpb)
            t4 = time.perf_counter()
            jax.block_until_ready(packed)
            t5 = time.perf_counter()
            dpb[fs.poc] = planes
            if rep < repeats - 1:
                continue  # warmup reps: compile + cache
            stats["parse_ms"].append((t1 - t0) * 1e3)
            stats["build_ms"].append((t2 - t1) * 1e3)
            stats["pack_ms"].append((t3 - t2) * 1e3)
            stats["dispatch_ms"].append((t4 - t3) * 1e3)
            stats["execute_ms"].append((t5 - t4) * 1e3)
            for tag in ("y", "c"):
                p = inp.get("ctrl", {}).get(tag, {})
                if "n_chunks" in p:
                    stats[f"n_chunks_{tag}"].append(int(p["n_chunks"]))
                    w = p["intra"]["w"]
                    stats[f"units_{tag}"].append(int((w > 0).sum()))
            if "n_inter" in inp.get("ctrl", {}).get("y", {}):
                stats["n_inter_y"].append(int(inp["ctrl"]["y"]["n_inter"]))

    out = {}
    for k, v in stats.items():
        if not v:
            continue
        a = np.asarray(v, np.float64)
        out[k] = {"mean": round(float(a.mean()), 2),
                  "max": round(float(a.max()), 2),
                  "sum": round(float(a.sum()), 1)}
    return out


if __name__ == "__main__":
    path = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    result = profile(path, repeats)
    print(json.dumps(result, indent=1))

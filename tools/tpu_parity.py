#!/usr/bin/env python3
"""On-hardware correctness tier (VERDICT r2 item 3).

Decodes a representative slice of the conformance matrix on the REAL
default backend (the TPU chip when present) through the default decode
path and asserts frame-MD5 parity against the reference ffmpeg build.
Independent of bench.py, so hardware validation never depends on the
benchmark finishing.

Usage:  python tools/tpu_parity.py [--out TPU_PARITY.json]

Streams are cached in .bench_streams/ (same keying as bench.py); the
persistent XLA compile cache in .jax_cache/ makes warm reruns fast.
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (gen_stream / ref_frame_md5s helpers)

# Representative tool coverage: intra core, 10-bit, transforms, the
# in-loop filter chain, RA pyramid + TMVP, the inter toolset waves
# (MMVD/BCW/CIIP/GPM/affine/PROF/BDOF/DMVR/SbTMVP), MIP/CCLM, LMCS+ALF.
CASES = [
    ("intra-core", dict(width=96, height=96, seed=103, qp=45,
                        coeff_density=0.4)),
    ("deblock-unaligned", dict(width=72, height=40, seed=105, qp=24,
                               deblock=True, n_frames=2)),
    ("10bit-sao-full", dict(width=96, height=64, seed=109, qp=32,
                            bit_depth=10, sao=True, deblock=True,
                            inter=True, b_slices=True, n_frames=3)),
    ("lfnst-mts-full", dict(width=128, height=64, seed=1003, qp=28,
                            lfnst=True, mts=True, joint_cbcr=True,
                            cu_qp_delta=True, deblock=True, sao=True)),
    ("dep-quant-tools", dict(width=128, height=64, seed=1303, qp=32,
                             dep_quant=True, mts=True, lfnst=True,
                             cu_qp_delta=True, sao=True, ctu_log2=6,
                             max_bt_size=64)),
    ("ra-tmvp", dict(width=96, height=96, seed=1203, qp=30, inter=True,
                     b_slices=True, ra=True, tmvp=True, n_frames=9,
                     sao=True)),
    ("alf-lmcs-ra", dict(width=96, height=64, seed=1607, qp=30, alf=True,
                         ccalf=True, lmcs=True, inter=True, b_slices=True,
                         ra=True, n_frames=9, deblock=True, sao=True)),
    ("inter-wave1-all", dict(width=96, height=64, seed=1706, qp=30,
                             inter=True, b_slices=True, ra=True, tmvp=True,
                             n_frames=9, mmvd=True, amvr=True, bcw=True,
                             lmcs=True, alf=True, deblock=True, sao=True)),
    ("gpm-ciip-ra", dict(width=96, height=64, seed=1903, qp=28, inter=True,
                         b_slices=True, ra=True, n_frames=9, gpm=True,
                         ciip=True, mmvd=True, bcw=True, amvr=True,
                         lmcs=True, deblock=True)),
    ("affine-prof-ra", dict(width=96, height=64, seed=2303, qp=28,
                            inter=True, b_slices=True, ra=True, n_frames=9,
                            affine=True, prof=True, sbtmvp=True, tmvp=True,
                            bcw=True, lmcs=True, deblock=True, max_mv=120)),
    ("dmvr-bdof-ra", dict(width=96, height=96, seed=2502, qp=28, inter=True,
                          b_slices=True, ra=True, n_frames=9, dmvr=True,
                          bdof=True, tmvp=True, deblock=True, sao=True,
                          max_mv=90)),
    ("mip-cclm-10bit", dict(width=128, height=128, seed=2703, qp=30,
                            cclm=True, mip=True, ctu_log2=6, max_bt_size=64,
                            min_qt_size=16, bit_depth=10)),
    ("dualtree-tools", dict(width=96, height=64, seed=3210, qp=28,
                            dual_tree=True, cclm=True, mip=True, mrl=True,
                            deblock=True, sao=True)),
    ("sbt-ra", dict(width=96, height=64, seed=3410, qp=30, inter=True,
                    b_slices=True, ra=True, n_frames=9, sbt=True, mts=True,
                    deblock=True, sao=True)),
    ("slices-wpp", dict(width=96, height=64, seed=3710, qp=30,
                        tile_cols=(2, 1), tile_rows=(1, 1), n_slices=2,
                        wpp=True, deblock=True, sao=True)),
    ("cra-ltr", dict(width=96, height=64, seed=3610, qp=30, inter=True,
                     b_slices=True, n_frames=8, cra=True, deblock=True)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "TPU_PARITY.json"))
    ap.add_argument("--cases", default=None,
                    help="comma-separated case-name filter")
    args = ap.parse_args()

    import jax

    from ffmpeg_tpu.models.vvc.decoder import decode_file

    backend = jax.default_backend()
    devices = [str(d) for d in jax.devices()]
    results, n_pass = [], 0
    t_total = time.perf_counter()
    for name, kw in CASES:
        if args.cases and name not in args.cases.split(","):
            continue
        entry = {"case": name}
        try:
            path = bench.gen_stream(f"parity-{name}", **kw)
            ref = bench.ref_frame_md5s(path)
            t0 = time.perf_counter()
            ours = [f.md5() for f in decode_file(path)]
            entry["decode_s"] = round(time.perf_counter() - t0, 2)
            entry["frames"] = len(ours)
            if ref and ours == ref:
                entry["status"] = "pass"
                n_pass += 1
            elif not ref:
                entry["status"] = "no-ref"
            else:
                entry["status"] = "MISMATCH"
                entry["first_bad"] = next(
                    i for i, (a, b) in enumerate(zip(ours, ref)) if a != b
                ) if len(ours) == len(ref) else f"len {len(ours)}!={len(ref)}"
        except Exception as e:  # noqa: BLE001 - record, keep going
            entry["status"] = "ERROR"
            entry["error"] = f"{type(e).__name__}: {e}"
        results.append(entry)
        print(f"{entry['case']:20s} {entry['status']}"
              f" ({entry.get('decode_s', '-')}s)", flush=True)

    out = {
        "backend": backend,
        "devices": devices,
        "passed": n_pass,
        "total": len(results),
        "elapsed_s": round(time.perf_counter() - t_total, 1),
        "cases": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{n_pass}/{len(results)} pass on backend={backend}")
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())

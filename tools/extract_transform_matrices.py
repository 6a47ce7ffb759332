#!/usr/bin/env python3
"""Extract normative H.266 constant tables (transform matrices etc.).

The reference keeps most normative data (spec 8.7.4.x matrices, MIP
weights, LFNST kernels, interpolation filter banks, GPM geometry, ALF
class maps) in `vvc_data.c`, and the DCT-II basis as hand-unrolled code
in `vvc_itx_1d.c`.  Both are compiled standalone here (against local
shim headers, nothing copied into the repo) and the constants are read
out through ctypes; DCT-II matrices are recovered by probing the linear
1-D inverse transforms with unit impulses.

All values are normative ITU-T H.266 constants; every conforming codec
uses identical numbers.

Output: ffmpeg_tpu/models/vvc/vvc_tables.npz
"""
from __future__ import annotations

import ctypes
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REF = Path("/root/reference/libavcodec/vvc")
OUT = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "models" / "vvc"


def build_lib(tmp: Path) -> ctypes.CDLL:
    (tmp / "libavutil").mkdir(exist_ok=True)
    (tmp / "libavutil" / "avutil.h").write_text(
        "#pragma once\n"
        "static inline int av_clip(int v, int lo, int hi)"
        "{ return v < lo ? lo : (v > hi ? hi : v); }\n"
        "static inline int av_clip_intp2(int a, int p) {\n"
        "  if (((unsigned)a + (1u << p)) & ~((2u << p) - 1))\n"
        "    return (a >> 31) ^ ((1 << p) - 1);\n"
        "  return a;\n"
        "}\n"
        "static inline int av_log2(unsigned v)"
        "{ int n = 0; while (v >>= 1) n++; return n; }\n")
    (tmp / "libavutil" / "avassert.h").write_text(
        "#pragma once\n#define av_assert0(x) ((void)0)\n")
    lib_path = tmp / "libvvcdata.so"
    subprocess.run(
        ["gcc", "-O1", "-shared", "-fPIC", "-I", str(tmp), "-I", str(REF),
         str(REF / "vvc_data.c"), str(REF / "vvc_itx_1d.c"),
         "-o", str(lib_path)],
        check=True)
    return ctypes.CDLL(str(lib_path))


def sym_array(lib, name: str, shape: tuple, dtype) -> np.ndarray:
    n = int(np.prod(shape))
    ct = {np.int8: ctypes.c_int8, np.uint8: ctypes.c_uint8,
          np.int16: ctypes.c_int16, np.int32: ctypes.c_int32}[dtype]
    buf = (ct * n).in_dll(lib, name)
    return np.array(list(buf), dtype=dtype).reshape(shape)


def probe_matrix(lib, fn_name: str, n: int, n_cols: int | None = None) -> np.ndarray:
    fn = getattr(lib, fn_name)
    fn.argtypes = [ctypes.POINTER(ctypes.c_int), ctypes.c_ssize_t,
                   ctypes.c_size_t]
    n_cols = n if n_cols is None else n_cols
    m = np.zeros((n, n_cols), dtype=np.int64)
    for k in range(n_cols):
        buf = (ctypes.c_int * n)()
        buf[k] = 1
        fn(buf, 1, k + 1)
        m[:, k] = list(buf)
    return m


def main() -> None:
    out = {}
    with tempfile.TemporaryDirectory() as td:
        lib = build_lib(Path(td))
        # inverse transform bases: out = M @ coeffs
        for n in (2, 4, 8, 16, 32, 64):
            out[f"dct2_{n}"] = probe_matrix(lib, f"ff_vvc_inv_dct2_{n}", n)
        for n in (4, 8, 16, 32):
            for kind in ("dst7", "dct8"):
                # inverse basis == transpose of the forward data matrix;
                # cross-check the first <=16 columns by probing (the 1-D
                # kernels only accept nz<=16 — later coeffs are spec-zeroed)
                fwd = sym_array(lib, f"ff_vvc_{kind}_{n}x{n}", (n, n), np.int8)
                inv = fwd.astype(np.int64).T
                nz = min(n, 16)
                probed = probe_matrix(lib, f"ff_vvc_inv_{kind}_{n}", n, nz)
                assert np.array_equal(inv[:, :nz], probed[:, :nz]), (kind, n)
                out[f"{kind}_{n}"] = inv

        # LFNST kernels (spec 8.7.4.3.x)
        out["lfnst_4x4"] = sym_array(lib, "ff_vvc_lfnst_4x4", (4, 2, 16, 16), np.int8)
        out["lfnst_8x8"] = sym_array(lib, "ff_vvc_lfnst_8x8", (4, 2, 16, 48), np.int8)
        out["lfnst_tr_set"] = sym_array(lib, "ff_vvc_lfnst_tr_set_index", (95,), np.uint8)

        # MIP weight matrices, via the accessor (arrays are static)
        get_mip = lib.ff_vvc_get_mip_matrix
        get_mip.restype = ctypes.POINTER(ctypes.c_uint8)
        get_mip.argtypes = [ctypes.c_int, ctypes.c_int]
        for size_id, (n_modes, rows, cols) in enumerate(
                [(16, 16, 4), (8, 16, 8), (6, 64, 7)]):
            mats = np.zeros((n_modes, rows, cols), dtype=np.uint8)
            for m in range(n_modes):
                p = get_mip(size_id, m)
                mats[m] = np.array(p[: rows * cols],
                                   dtype=np.uint8).reshape(rows, cols)
            out[f"mip_{size_id}"] = mats

        # intra 4-tap interpolation filters (fC / fG)
        out["intra_luma_filter"] = sym_array(
            lib, "ff_vvc_intra_luma_filter", (2, 32, 4), np.int8)

        # inter interpolation banks
        out["interp_luma"] = sym_array(
            lib, "ff_vvc_inter_luma_filters", (3, 16, 8), np.int8)
        out["interp_chroma"] = sym_array(
            lib, "ff_vvc_inter_chroma_filters", (3, 32, 4), np.int8)
        out["interp_luma_dmvr"] = sym_array(
            lib, "ff_vvc_inter_luma_dmvr_filters", (16, 2), np.int8)

        # ALF fixed filters & class-to-filter map
        out["alf_fixed"] = sym_array(
            lib, "ff_vvc_alf_fix_filt_coeff", (64, 12), np.int16)
        out["alf_class_to_filt"] = sym_array(
            lib, "ff_vvc_alf_class_to_filt_map", (16, 25), np.uint8)

        # GPM geometry
        out["gpm_angle_idx"] = sym_array(lib, "ff_vvc_gpm_angle_idx", (64,), np.uint8)
        out["gpm_distance_idx"] = sym_array(lib, "ff_vvc_gpm_distance_idx", (64,), np.uint8)
        out["gpm_distance_lut"] = sym_array(lib, "ff_vvc_gpm_distance_lut", (32,), np.int8)
        out["gpm_angle_to_mirror"] = sym_array(lib, "ff_vvc_gpm_angle_to_mirror", (32,), np.uint8)
        out["gpm_angle_to_weights_idx"] = sym_array(
            lib, "ff_vvc_gpm_angle_to_weights_idx", (32,), np.uint8)
        out["gpm_weights"] = sym_array(
            lib, "ff_vvc_gpm_weights", (6, 112 * 112), np.uint8)
        out["gpm_weights_offset_x"] = sym_array(
            lib, "ff_vvc_gpm_weights_offset_x", (64, 4, 4), np.uint8)
        out["gpm_weights_offset_y"] = sym_array(
            lib, "ff_vvc_gpm_weights_offset_y", (64, 4, 4), np.uint8)

        # scaling list bases
        out["scaling_pred_8"] = sym_array(lib, "ff_vvc_scaling_pred_8", (64,), np.uint8)
        out["scaling_pred_16"] = sym_array(lib, "ff_vvc_scaling_pred_16", (64,), np.uint8)
        out["scaling_list0"] = sym_array(lib, "ff_vvc_scaling_list0", (64,), np.int32)

    np.savez_compressed(OUT / "vvc_tables.npz", **out)
    print("wrote", OUT / "vvc_tables.npz", f"({len(out)} tables)")
    print("dct2_4 =\n", out["dct2_4"])


if __name__ == "__main__":
    main()

"""End-to-end conformance: our decoder vs the reference decoder, frame MD5.

The FATE-style harness (SURVEY §4.1): generated conforming streams are
decoded by the reference ffmpeg build (golden) and by ffmpeg_tpu; every
frame hash must match exactly.
"""
import os
import subprocess

import pytest

REF_FFMPEG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "ffmpeg")


def ref_frame_md5s(path: str) -> list[str]:
    out = subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", path,
         "-f", "framemd5", "-"],
        capture_output=True, text=True, check=True)
    assert not out.stderr, out.stderr
    return [line.split(",")[-1].strip() for line in out.stdout.splitlines()
            if line and not line.startswith("#")]


def our_frame_md5s(path: str) -> list[str]:
    from ffmpeg_tpu.models.vvc.decoder import decode_file

    return [f.md5() for f in decode_file(path)]


needs_ref = pytest.mark.skipif(not os.path.exists(REF_FFMPEG),
                               reason="reference ffmpeg not built")


@needs_ref
@pytest.mark.parametrize("cfg_kw", [
    dict(width=64, height=64, seed=101, qp=32),
    dict(width=128, height=64, seed=102, qp=22, n_frames=2),
    dict(width=96, height=96, seed=103, qp=45, coeff_density=0.4),
    dict(width=128, height=96, seed=104, qp=30, deblock=True),
    dict(width=72, height=40, seed=105, qp=24, deblock=True, n_frames=2),
    dict(width=128, height=96, seed=106, qp=28, inter=True, n_frames=4),
    dict(width=96, height=64, seed=107, qp=35, inter=True, deblock=True,
         n_frames=4, max_mv=300),
    dict(width=96, height=64, seed=108, qp=30, inter=True, b_slices=True,
         deblock=True, n_frames=4, max_mv=200),
    dict(width=96, height=64, seed=109, qp=32, bit_depth=10, sao=True,
         deblock=True, inter=True, b_slices=True, n_frames=3),
    dict(width=96, height=96, seed=301, qp=30, mts=True),
    dict(width=96, height=96, seed=302, qp=28, mts_implicit=True),
    dict(width=96, height=64, seed=303, qp=30, mts=True, inter=True,
         b_slices=True, deblock=True, sao=True, n_frames=3),
    dict(width=128, height=128, seed=401, qp=30, ctu_log2=6, max_bt_size=64,
         max_tt_size=64, min_qt_size=16),
    dict(width=192, height=128, seed=402, qp=28, ctu_log2=6, max_bt_size=64,
         max_tt_size=64, inter=True, b_slices=True, deblock=True, sao=True,
         n_frames=3),
    dict(width=96, height=96, seed=601, qp=30, cu_qp_delta=True),
    dict(width=96, height=64, seed=603, qp=28, cu_qp_delta=True, inter=True,
         b_slices=True, deblock=True, n_frames=3),
    dict(width=128, height=64, seed=604, qp=32, cu_qp_delta=True, ctu_log2=6,
         max_bt_size=64, mts=True, sao=True),
    dict(width=96, height=96, seed=701, qp=30, joint_cbcr=True),
    dict(width=96, height=64, seed=702, qp=28, joint_cbcr=True, inter=True,
         b_slices=True, deblock=True, n_frames=3),
    dict(width=128, height=64, seed=703, qp=32, joint_cbcr=True,
         cu_qp_delta=True, mts=True, sao=True, ctu_log2=6, max_bt_size=64),
    dict(width=96, height=96, seed=801, qp=30, transform_skip=True),
    dict(width=64, height=64, seed=802, qp=40, transform_skip=True,
         coeff_density=0.5, max_level=30),
    dict(width=96, height=96, seed=807, qp=28, transform_skip=True,
         joint_cbcr=True, mts=True, deblock=True, inter=True, b_slices=True,
         n_frames=4),
    dict(width=96, height=96, seed=901, qp=30, bdpcm=True),
    dict(width=96, height=64, seed=902, qp=28, bdpcm=True, transform_skip=True,
         deblock=True, inter=True, b_slices=True, n_frames=3),
    dict(width=64, height=64, seed=903, qp=33, bdpcm=True, ts_max_size=16,
         bit_depth=10, sao=True),
    dict(width=96, height=96, seed=1001, qp=30, lfnst=True),
    dict(width=128, height=64, seed=1003, qp=28, lfnst=True, mts=True,
         joint_cbcr=True, cu_qp_delta=True, deblock=True, sao=True),
    dict(width=128, height=128, seed=1005, qp=30, lfnst=True, ctu_log2=6,
         max_bt_size=64, min_qt_size=16),
    dict(width=96, height=64, seed=1101, qp=30, inter=True, b_slices=True,
         ra=True, n_frames=9),
    dict(width=96, height=96, seed=1102, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, deblock=True, sao=True, max_mv=200),
    dict(width=96, height=64, seed=1103, qp=30, inter=True, b_slices=True,
         ra=True, n_frames=13, mts=True, cu_qp_delta=True,
         transform_skip=True, deblock=True),
    dict(width=96, height=64, seed=1202, qp=28, inter=True, b_slices=True,
         tmvp=True, n_frames=4, deblock=True),
    dict(width=96, height=96, seed=1203, qp=30, inter=True, b_slices=True,
         ra=True, tmvp=True, n_frames=9, sao=True),
    dict(width=96, height=96, seed=1301, qp=30, dep_quant=True),
    dict(width=96, height=64, seed=1302, qp=28, dep_quant=True, inter=True,
         b_slices=True, deblock=True, n_frames=3),
    dict(width=128, height=64, seed=1303, qp=32, dep_quant=True, mts=True,
         lfnst=True, cu_qp_delta=True, sao=True, ctu_log2=6, max_bt_size=64),
    dict(width=96, height=96, seed=1304, qp=30, dep_quant=True,
         transform_skip=True, joint_cbcr=True),
    dict(width=96, height=96, seed=1311, qp=30, sign_hiding=True,
         coeff_density=0.4),
    dict(width=96, height=64, seed=1312, qp=28, sign_hiding=True, inter=True,
         b_slices=True, deblock=True, n_frames=3, coeff_density=0.4),
    dict(width=96, height=96, seed=1501, qp=30, lmcs=True),
    dict(width=96, height=96, seed=1504, qp=30, lmcs=True),
    dict(width=96, height=64, seed=1502, qp=28, lmcs=True, inter=True,
         b_slices=True, deblock=True, sao=True, n_frames=4),
    dict(width=96, height=64, seed=1505, qp=30, lmcs=True, inter=True,
         b_slices=True, ra=True, n_frames=9, deblock=True),
    dict(width=96, height=64, seed=1506, qp=32, lmcs=True, bit_depth=10,
         joint_cbcr=True, sao=True),
    dict(width=128, height=64, seed=1507, qp=30, lmcs=True, mts=True,
         lfnst=True, dep_quant=True, cu_qp_delta=True, ctu_log2=6,
         max_bt_size=64),
    dict(width=96, height=96, seed=1601, qp=30, alf=True),
    dict(width=96, height=96, seed=1604, qp=30, alf=True, ccalf=True),
    dict(width=96, height=64, seed=1605, qp=28, alf=True, ccalf=True,
         inter=True, b_slices=True, deblock=True, sao=True, n_frames=4),
    dict(width=128, height=128, seed=1606, qp=30, alf=True, ccalf=True,
         ctu_log2=6, max_bt_size=64, bit_depth=10),
    dict(width=96, height=64, seed=1607, qp=30, alf=True, ccalf=True,
         lmcs=True, inter=True, b_slices=True, ra=True, n_frames=9,
         deblock=True, sao=True),
    dict(width=96, height=64, seed=1701, qp=28, inter=True, n_frames=3,
         mmvd=True),
    dict(width=96, height=64, seed=1702, qp=28, inter=True, b_slices=True,
         n_frames=3, mmvd=True, mmvd_fullpel=True),
    dict(width=96, height=64, seed=1703, qp=28, inter=True, b_slices=True,
         n_frames=3, amvr=True, max_mv=120),
    dict(width=96, height=96, seed=1704, qp=28, inter=True, b_slices=True,
         n_frames=3, bcw=True, min_qt_size=16),
    dict(width=96, height=64, seed=1705, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, mmvd=True, amvr=True, bcw=True, deblock=True,
         sao=True),
    dict(width=96, height=64, seed=1706, qp=30, inter=True, b_slices=True,
         ra=True, tmvp=True, n_frames=9, mmvd=True, amvr=True, bcw=True,
         lmcs=True, alf=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=1801, qp=28, inter=True, n_frames=3,
         ciip=True),
    dict(width=96, height=96, seed=1802, qp=28, inter=True, b_slices=True,
         n_frames=3, ciip=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=1803, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, ciip=True, mmvd=True, amvr=True, bcw=True,
         lmcs=True, deblock=True),
    dict(width=96, height=64, seed=2001, qp=28, inter=True, n_frames=3,
         weighted_pred=True),
    dict(width=96, height=96, seed=2002, qp=28, inter=True, b_slices=True,
         n_frames=3, weighted_pred=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=2003, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, weighted_pred=True, mmvd=True, lmcs=True,
         deblock=True),
    dict(width=96, height=64, seed=2101, qp=28, inter=True, n_frames=3,
         sbtmvp=True),
    dict(width=96, height=96, seed=2105, qp=28, inter=True, b_slices=True,
         n_frames=4, sbtmvp=True, deblock=True, sao=True, max_mv=220),
    dict(width=96, height=64, seed=2106, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, sbtmvp=True, tmvp=True, mmvd=True, amvr=True,
         bcw=True, lmcs=True, deblock=True, max_mv=160),
    dict(width=96, height=64, seed=2201, qp=28, inter=True, n_frames=3,
         affine=True),
    dict(width=96, height=96, seed=2205, qp=28, inter=True, b_slices=True,
         n_frames=4, affine=True, sbtmvp=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=2206, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, affine=True, sbtmvp=True, tmvp=True,
         mmvd=True, amvr=True, bcw=True, lmcs=True, deblock=True,
         max_mv=120),
    dict(width=96, height=64, seed=2208, qp=28, inter=True, b_slices=True,
         n_frames=4, affine=True, weighted_pred=True, deblock=True),
    dict(width=96, height=96, seed=2302, qp=28, inter=True, b_slices=True,
         n_frames=4, affine=True, prof=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=2303, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, affine=True, prof=True, sbtmvp=True,
         tmvp=True, bcw=True, lmcs=True, deblock=True, max_mv=120),
    dict(width=96, height=64, seed=2403, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, bdof=True, mmvd=True, tmvp=True, lmcs=True,
         deblock=True, max_mv=90),
    dict(width=96, height=96, seed=2405, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, bdof=True, affine=True, prof=True,
         sbtmvp=True, deblock=True, sao=True, max_mv=90),
    dict(width=96, height=64, seed=1901, qp=28, inter=True, b_slices=True,
         n_frames=3, gpm=True),
    dict(width=96, height=96, seed=1902, qp=28, inter=True, b_slices=True,
         n_frames=3, gpm=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=1903, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, gpm=True, ciip=True, mmvd=True, bcw=True,
         amvr=True, lmcs=True, deblock=True),
], ids=["64x64", "128x64x2f", "96x96-dense", "deblock", "deblock-unaligned",
        "inter-p", "inter-p-deblock", "inter-b", "10bit-sao-full",
        "mts-explicit", "mts-implicit", "mts-inter-full",
        "ctu64", "ctu64-inter-full",
        "qp-delta", "qp-delta-inter", "qp-delta-ctu64-mts",
        "joint-cbcr", "joint-cbcr-inter", "joint-cbcr-full",
        "transform-skip", "transform-skip-dense", "transform-skip-full",
        "bdpcm", "bdpcm-ts-inter", "bdpcm-10bit",
        "lfnst", "lfnst-full", "lfnst-ctu64",
        "ra-pyramid", "ra-full", "ra-tools",
        "tmvp", "tmvp-ra",
        "dep-quant", "dep-quant-inter", "dep-quant-tools", "dep-quant-ts",
        "sign-hiding", "sign-hiding-inter",
        "lmcs", "lmcs-b", "lmcs-inter", "lmcs-ra", "lmcs-10bit-jcbcr",
        "lmcs-tools",
        "alf", "alf-ccalf", "alf-inter", "alf-ctu64-10bit",
        "alf-lmcs-ra",
        "mmvd", "mmvd-fullpel", "amvr", "bcw", "inter-wave1-ra",
        "inter-wave1-all",
        "ciip", "ciip-deblock", "ciip-tools-ra",
        "wp", "wp-b", "wp-tools-ra",
        "sbtmvp", "sbtmvp-filters", "sbtmvp-tools-ra",
        "affine", "affine-sbtmvp", "affine-tools-ra", "affine-wp",
        "prof", "prof-tools-ra",
        "bdof-ra", "bdof-affine-ra",
        "gpm", "gpm-filters", "gpm-tools-ra"])
def test_frame_md5_parity(tmp_path, cfg_kw):
    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream

    data, _ = encode_stream(EncoderConfig(**cfg_kw))
    path = str(tmp_path / "t.vvc")
    with open(path, "wb") as f:
        f.write(data)
    ref = ref_frame_md5s(path)
    ours = our_frame_md5s(path)
    assert ref == ours

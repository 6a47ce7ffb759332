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



# Core-vs-full matrix: the complete matrix (~120 cases) costs hours on
# the CPU backend because every case traces + compiles its own frame
# programs.  The default run keeps one representative per tool family
# (every feature still exercised, heaviest combinations preferred);
# FFMPEG_TPU_FULL_MATRIX=1 runs everything.
FULL_MATRIX = bool(os.environ.get("FFMPEG_TPU_FULL_MATRIX"))
CORE_IDS = {
    "64x64", "96x96-dense", "deblock-unaligned", "inter-p-deblock",
    "inter-b", "10bit-sao-full", "mts-inter-full", "ctu64-inter-full",
    "qp-delta-ctu64-mts", "joint-cbcr-full", "transform-skip-full",
    "bdpcm-ts-inter", "lfnst-full", "ra-full", "tmvp-ra",
    "dep-quant-tools", "sign-hiding-inter", "lmcs-tools",
    "alf-lmcs-ra", "inter-wave1-all", "ciip-tools-ra", "wp-tools-ra",
    "sbtmvp-tools-ra", "affine-tools-ra", "prof-tools-ra",
    "bdof-affine-ra", "dmvr-bdof-tmvp", "gpm-tools-ra", "mip-lfnst",
    "cclm-lmcs-ra", "mrl-tools-ra", "tiles-tools-ra", "wpp-tools-ra",
    "separate-ph-tools-ra", "dualtree-cclm-mip-mrl",
    "dualtree-ctu64-lfnst", "sbt-tools-ra", "isp-lfnst", "isp-dualtree",
    "isp-inter", "scaling-lfnst-ts", "scaling-inter", "slices-wpp",
    "slices-tools-ra", "cra-rasl", "gdr", "ltr-ra", "crop-ra",
}


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
    dict(width=96, height=64, seed=2501, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, dmvr=True, max_mv=90),
    dict(width=96, height=96, seed=2502, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, dmvr=True, bdof=True, tmvp=True, deblock=True,
         sao=True, max_mv=90),
    dict(width=96, height=64, seed=2503, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, dmvr=True, bdof=True, mmvd=True, lmcs=True,
         affine=True, prof=True, deblock=True, max_mv=90),
    dict(width=96, height=64, seed=1901, qp=28, inter=True, b_slices=True,
         n_frames=3, gpm=True),
    dict(width=96, height=96, seed=1902, qp=28, inter=True, b_slices=True,
         n_frames=3, gpm=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=1903, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, gpm=True, ciip=True, mmvd=True, bcw=True,
         amvr=True, lmcs=True, deblock=True),
    # MIP (matrix-based intra prediction)
    dict(width=96, height=96, seed=2601, qp=30, mip=True),
    dict(width=96, height=64, seed=2602, qp=28, mip=True, lfnst=True),
    dict(width=96, height=64, seed=2603, qp=30, mip=True, mts_implicit=True),
    dict(width=128, height=128, seed=2604, qp=30, mip=True, ctu_log2=6,
         max_bt_size=64, min_qt_size=16, bit_depth=10),
    dict(width=96, height=64, seed=2605, qp=30, mip=True, inter=True,
         b_slices=True, ra=True, n_frames=5, deblock=True, sao=True,
         lmcs=True),
    # CCLM (cross-component linear model)
    dict(width=96, height=96, seed=2701, qp=30, cclm=True),
    dict(width=96, height=64, seed=2702, qp=28, cclm=True,
         cclm_vertical_collocated=False),
    dict(width=128, height=128, seed=2703, qp=30, cclm=True, mip=True,
         ctu_log2=6, max_bt_size=64, min_qt_size=16, bit_depth=10),
    dict(width=96, height=64, seed=2704, qp=30, cclm=True, joint_cbcr=True,
         lfnst=True),
    dict(width=96, height=64, seed=2705, qp=30, cclm=True, inter=True,
         b_slices=True, ra=True, n_frames=5, deblock=True, sao=True,
         lmcs=True),
    # MRL (multi-reference-line intra)
    dict(width=96, height=96, seed=2801, qp=30, mrl=True),
    dict(width=96, height=64, seed=2802, qp=28, mrl=True, mip=True,
         lfnst=True),
    dict(width=128, height=128, seed=2803, qp=30, mrl=True, ctu_log2=6,
         max_bt_size=64, min_qt_size=16, bit_depth=10),
    dict(width=96, height=64, seed=2804, qp=30, mrl=True, cclm=True,
         inter=True, b_slices=True, ra=True, n_frames=5, deblock=True,
         sao=True, lmcs=True),
    # tiles (raster slice covering all tiles; per-tile CABAC entry
    # points + context re-init; availability never crosses tiles)
    dict(width=96, height=96, seed=3001, qp=30, tile_cols=(2, 1),
         tile_rows=(1, 2)),
    dict(width=128, height=96, seed=3002, qp=28, tile_cols=(1, 2, 1),
         tile_rows=(3,), deblock=True, sao=True),
    dict(width=96, height=96, seed=3003, qp=28, tile_cols=(2, 1),
         tile_rows=(2, 1), inter=True, b_slices=True, n_frames=4,
         deblock=True, sao=True, tmvp=True),
    dict(width=96, height=96, seed=3004, qp=28, tile_cols=(1, 2),
         tile_rows=(1, 2), inter=True, b_slices=True, ra=True, n_frames=9,
         mmvd=True, amvr=True, bcw=True, lmcs=True, alf=True, deblock=True,
         sao=True, mip=True, cclm=True),
    # WPP (sps_entropy_coding_sync): per-row CABAC sub-streams with
    # 1-CTU context inheritance; above-right availability clipped.
    # (tiles+WPP excluded: the reference CBS derives NumEntryPoints
    # with tile_y = idx/num_tile_rows, cbs_h266_syntax_template.c:3407)
    dict(width=96, height=96, seed=3101, qp=30, wpp=True),
    dict(width=128, height=96, seed=3102, qp=28, wpp=True, deblock=True,
         sao=True, mip=True, cclm=True),
    dict(width=96, height=96, seed=3103, qp=28, wpp=True, inter=True,
         b_slices=True, n_frames=4, deblock=True, sao=True, tmvp=True),
    dict(width=96, height=96, seed=3104, qp=28, wpp=True, inter=True,
         b_slices=True, ra=True, n_frames=9, mmvd=True, amvr=True,
         bcw=True, lmcs=True, alf=True, deblock=True, sao=True),
    # separate PH NAL (sh_picture_header_in_slice_header_flag == 0)
    dict(width=96, height=96, seed=2901, qp=30, separate_ph=True),
    dict(width=96, height=64, seed=2902, qp=28, separate_ph=True,
         inter=True, b_slices=True, ra=True, n_frames=5, deblock=True,
         sao=True, lmcs=True),
    # dual-tree intra (sps_qtbtt_dual_tree_intra_flag): independent
    # luma/chroma coding trees per CTU in I slices
    dict(width=96, height=64, seed=3201, qp=30, dual_tree=True,
         split_prob=0.75),
    dict(width=128, height=96, seed=3202, qp=28, dual_tree=True,
         cclm=True, mip=True, mrl=True, deblock=True, sao=True),
    dict(width=96, height=96, seed=3203, qp=28, dual_tree=True,
         bdpcm=True, transform_skip=True, dep_quant=True, mts=True),
    dict(width=128, height=128, seed=3204, qp=30, dual_tree=True,
         ctu_log2=6, lfnst=True, joint_cbcr=True),
    dict(width=96, height=64, seed=3205, qp=28, dual_tree=True,
         bit_depth=10, alf=True, ccalf=True, lmcs=True, deblock=True,
         sao=True),
    # SBT (subblock transform): inter CUs, one coded sub-TU with
    # position-derived implicit DST7/DCT8
    dict(width=96, height=64, seed=3401, qp=30, inter=True, b_slices=True,
         n_frames=4, sbt=True, mts=True),
    dict(width=96, height=96, seed=3402, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, sbt=True, mts=True, tmvp=True, deblock=True,
         sao=True),
    dict(width=96, height=64, seed=3403, qp=30, inter=True, n_frames=3,
         sbt=True, deblock=True, sao=True),
    # ISP (intra sub-partitions): 2/4-way 1-D TU splits with chained
    # sub-partition prediction, implicit DST7, 1/2-wide residual TBs
    dict(width=96, height=96, seed=3501, qp=30, isp=True, split_prob=0.8),
    dict(width=96, height=64, seed=3504, qp=30, isp=True, lfnst=True,
         mts_implicit=True),
    dict(width=96, height=64, seed=3506, qp=30, isp=True, dual_tree=True,
         cclm=True, mip=True, mrl=True),
    dict(width=96, height=64, seed=3508, qp=32, isp=True, bit_depth=10,
         deblock=True, sao=True),
    dict(width=96, height=64, seed=3509, qp=30, isp=True, inter=True,
         b_slices=True, n_frames=4, deblock=True),
    # explicit scaling lists (APS dequant matrices, derive_scale_m)
    dict(width=96, height=96, seed=7002, qp=28, scaling_lists=True,
         mts=True, joint_cbcr=True),
    dict(width=96, height=64, seed=7003, qp=30, scaling_lists=True,
         lfnst=True, transform_skip=True),
    dict(width=96, height=64, seed=7005, qp=30, scaling_lists=True,
         inter=True, b_slices=True, n_frames=4, deblock=True),
    # raster multi-slice pictures (PH NAL + per-slice tile ranges)
    dict(width=96, height=64, seed=3701, qp=30, tile_cols=(2, 1),
         tile_rows=(1, 1), n_slices=2, deblock=True, sao=True),
    dict(width=96, height=64, seed=3702, qp=30, tile_cols=(2, 1),
         tile_rows=(1, 1), n_slices=4, wpp=True),
    dict(width=96, height=64, seed=3703, qp=28, tile_cols=(2, 1),
         tile_rows=(1, 1), n_slices=3, inter=True, b_slices=True, ra=True,
         n_frames=9, tmvp=True, deblock=True, sao=True),
    # open-GOP CRA with RASL leading pictures; mid-stream GDR
    dict(width=96, height=64, seed=3601, qp=30, inter=True, b_slices=True,
         n_frames=8, cra=True, deblock=True, sao=True),
    dict(width=96, height=64, seed=3602, qp=30, inter=True, n_frames=7,
         gdr=True, deblock=True),
    # long-term reference pictures (LT entries with POC MSB cycle)
    dict(width=96, height=64, seed=3501, qp=30, inter=True, n_frames=5,
         ltr=True, deblock=True),
    dict(width=96, height=64, seed=3502, qp=28, inter=True, b_slices=True,
         ra=True, n_frames=9, ltr=True, deblock=True, sao=True),
    # conformance-window cropping (output crop; coded size unchanged)
    dict(width=96, height=64, seed=3301, qp=30, conf_window=(0, 2, 0, 4),
         deblock=True, sao=True),
    dict(width=96, height=96, seed=3302, qp=28, conf_window=(0, 4, 0, 2),
         inter=True, b_slices=True, ra=True, n_frames=5, tmvp=True,
         deblock=True, sao=True),
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
        "dmvr", "dmvr-bdof-tmvp", "dmvr-tools-ra",
        "gpm", "gpm-filters", "gpm-tools-ra",
        "mip", "mip-lfnst", "mip-mts-implicit", "mip-ctu64-10bit",
        "mip-lmcs-ra",
        "cclm", "cclm-noncollocated", "cclm-mip-ctu64-10bit",
        "cclm-jcbcr-lfnst", "cclm-lmcs-ra",
        "mrl", "mrl-mip-lfnst", "mrl-ctu64-10bit", "mrl-tools-ra",
        "tiles", "tiles-filters", "tiles-inter", "tiles-tools-ra",
        "wpp", "wpp-intra-tools", "wpp-inter", "wpp-tools-ra",
        "separate-ph", "separate-ph-tools-ra",
        "dualtree", "dualtree-cclm-mip-mrl", "dualtree-ts-tools",
        "dualtree-ctu64-lfnst", "dualtree-10bit-filters",
        "sbt", "sbt-tools-ra", "sbt-p",
        "isp", "isp-lfnst", "isp-dualtree", "isp-10bit-filters",
        "isp-inter",
        "scaling-mts-jcbcr", "scaling-lfnst-ts", "scaling-inter",
        "slices", "slices-wpp", "slices-tools-ra", "cra-rasl", "gdr",
        "ltr-p", "ltr-ra",
        "crop", "crop-ra"])
def test_frame_md5_parity(tmp_path, cfg_kw, request):
    case_id = request.node.callspec.id
    if not FULL_MATRIX and case_id not in CORE_IDS:
        pytest.skip("full-matrix case (FFMPEG_TPU_FULL_MATRIX=1)")
    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream

    data, _ = encode_stream(EncoderConfig(**cfg_kw))
    path = str(tmp_path / "t.vvc")
    with open(path, "wb") as f:
        f.write(data)
    ref = ref_frame_md5s(path)
    ours = our_frame_md5s(path)
    assert ref == ours

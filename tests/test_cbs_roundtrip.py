"""CBS header round-trip tier (the fate/cbs.mak analog, SURVEY §4.2).

Every generated stream is passed through the reference build's
vvc_metadata bitstream filter: a full CBS read of every header
(SPS/PPS/APS/PH/slice header) followed by a re-serialization that must
be BYTE-IDENTICAL to the input.  This proves our header *writer* emits
exactly the syntax the spec's parse recovers — independent of pixel
decode (reference harness: tests/fate/cbs.mak:198-203 over the
conformance suite; BSF: libavcodec/bsf/h266_metadata.c).
"""
import os
import subprocess

import pytest

REF_FFMPEG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "ffmpeg")


def _has_metadata_bsf() -> bool:
    if not os.path.exists(REF_FFMPEG):
        return False
    out = subprocess.run([REF_FFMPEG, "-hide_banner", "-bsfs"],
                         capture_output=True, text=True)
    return "vvc_metadata" in out.stdout


needs_bsf = pytest.mark.skipif(
    not _has_metadata_bsf(),
    reason="reference build lacks the vvc_metadata BSF")


# One stream per header family: baseline, every info-in-PH layout,
# SPS RPLs, rect slices, tiles+WPP entry points, APS-heavy (ALF/LMCS/
# scaling lists), LTR, 10-bit, mono, CTU-128/TB-64.
CASES = {
    "base": dict(width=96, height=64, seed=501, qp=30, deblock=True,
                 sao=True),
    "ra-aps": dict(width=96, height=64, seed=502, qp=30, inter=True,
                   b_slices=True, ra=True, tmvp=True, n_frames=5,
                   deblock=True, sao=True, alf=True, ccalf=True,
                   lmcs=True),
    "rpl-sps": dict(width=96, height=64, seed=503, qp=30, inter=True,
                    n_frames=4, rpl_in_sps=True, deblock=True),
    "rpl-ph": dict(width=96, height=64, seed=504, qp=30, inter=True,
                   b_slices=True, tmvp=True, n_frames=4, rpl_in_ph=True,
                   deblock=True),
    "alf-ph": dict(width=96, height=64, seed=505, qp=30, inter=True,
                   n_frames=3, alf_in_ph=True, alf=True, deblock=True),
    "deblock-params": dict(width=96, height=64, seed=506, qp=30,
                           inter=True, n_frames=3, deblock=True,
                           deblock_override=True),
    "rect-slices": dict(width=128, height=96, seed=507, qp=30,
                        tile_cols=(2, 2), tile_rows=(2, 1),
                        rect_slices=((0, 0, 1, 2), (1, 0, 1, 2))),
    "wpp": dict(width=96, height=96, seed=508, qp=30, wpp=True),
    "scaling": dict(width=96, height=64, seed=509, qp=30,
                    scaling_lists=True),
    "ltr": dict(width=96, height=64, seed=510, qp=30, inter=True,
                n_frames=5, ltr=True),
    "10bit": dict(width=96, height=64, seed=511, qp=32, bit_depth=10,
                  sao=True, deblock=True),
    "mono": dict(width=96, height=64, seed=512, qp=30,
                 chroma_format_idc=0),
    "tb64": dict(width=128, height=128, seed=513, qp=30, ctu_log2=6,
                 tb64=True, min_qt_size=32, max_mtt_depth=0),
    "wraparound": dict(width=96, height=64, seed=514, qp=32,
                       wraparound=True, inter=True, n_frames=3,
                       max_mv=400),
}


@needs_bsf
@pytest.mark.parametrize("name", sorted(CASES))
def test_cbs_roundtrip(tmp_path, name):
    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream

    data, _ = encode_stream(EncoderConfig(**CASES[name]))
    src = tmp_path / "in.vvc"
    src.write_bytes(data)
    dst = tmp_path / "out.bin"
    # -c copy -bsf vvc_metadata -f rawvideo: packets pass through the
    # CBS read->write pair and are dumped verbatim
    out = subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", str(src),
         "-c", "copy", "-bsf:v", "vvc_metadata", "-f", "rawvideo", "-y",
         str(dst)],
        capture_output=True, text=True)
    assert out.returncode == 0 and not out.stderr.strip(), out.stderr
    got = dst.read_bytes()
    # compare NAL payloads, not raw bytes: start-code framing (3- vs
    # 4-byte) is the muxer's choice and both forms are legal; the CBS
    # read->write pair must preserve every header BIT inside each NAL
    from ffmpeg_tpu.bitstream.bits import split_annexb_raw

    nals_in = [(t, raw) for t, _l, _t, raw in split_annexb_raw(data)]
    nals_out = [(t, raw) for t, _l, _t, raw in split_annexb_raw(got)]
    assert len(nals_in) == len(nals_out), (
        f"NAL count changed: {len(nals_in)} -> {len(nals_out)}")
    for i, ((ti, ri), (to, ro)) in enumerate(zip(nals_in, nals_out)):
        assert ti == to and ri == ro, (
            f"NAL {i} (type {ti}) not bit-identical after CBS round-trip")

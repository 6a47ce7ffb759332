"""Container-layer tests: probe, vvcC, MP4 demux/mux, mp4->annexb.

Oracle cross-checks (needs .refbuild/ffmpeg with the mov demuxer):
- our MP4 mux -> reference ffmpeg decode == reference decode of the
  annex-B original (validates vvcC + box layout against mov.c)
- reference `-c copy` MP4 mux -> our demux+decode == annex-B decode
"""
import os
import subprocess

import pytest

from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
from ffmpeg_tpu.formats.isobmff import annexb_to_mp4, read_mp4_vvc
from ffmpeg_tpu.formats.probe import open_input, probe_format
from ffmpeg_tpu.formats.sniff import sniff_sps
from ffmpeg_tpu.formats.vvcc import parse_vvcc, write_vvcc

REF_FFMPEG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "ffmpeg")
needs_ref = pytest.mark.skipif(not os.path.exists(REF_FFMPEG),
                               reason="reference ffmpeg not built")


def _gen(**kw):
    data, _ = encode_stream(EncoderConfig(**kw))
    return data


def _ref_md5s(path):
    out = subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", path,
         "-f", "framemd5", "-"], capture_output=True, text=True, check=True)
    assert not out.stderr, out.stderr
    return [ln.split(",")[-1].strip() for ln in out.stdout.splitlines()
            if ln and not ln.startswith("#")]


def test_probe_and_sniff():
    data = _gen(width=96, height=64, seed=11, qp=30, bit_depth=10)
    assert probe_format(data) == "vvc-annexb"
    mp4 = annexb_to_mp4(data)
    assert probe_format(mp4) == "mp4"
    assert probe_format(b"\x00" * 64) == "unknown"
    from ffmpeg_tpu.bitstream.bits import split_annexb_raw
    sps_raw = next(raw for t, _l, _t2, raw in split_annexb_raw(data)
                   if t == 15)
    s = sniff_sps(sps_raw)
    assert (s["width"], s["height"], s["bit_depth"],
            s["chroma_format_idc"]) == (96, 64, 10, 1)


def test_vvcc_roundtrip():
    data = _gen(width=64, height=64, seed=12, qp=32)
    from ffmpeg_tpu.formats.vvcc import vvcc_from_annexb

    rec, _ = vvcc_from_annexb(data)
    rec2 = parse_vvcc(write_vvcc(rec))
    assert rec2.arrays == rec.arrays
    assert (rec2.max_width, rec2.max_height) == (64, 64)
    assert rec2.nal_length_size == 4


def test_mp4_demux_roundtrip():
    data = _gen(width=96, height=64, seed=13, qp=30, inter=True, n_frames=3)
    mp4 = annexb_to_mp4(data)
    tr = read_mp4_vvc(mp4)
    assert (tr.width, tr.height) == (96, 64)
    assert len(tr.samples) == 3
    annexb, info = open_input(mp4)
    assert info["format"] == "mp4"
    from ffmpeg_tpu.models.vvc.decoder import VVCDecoder

    got = [f.md5() for f in VVCDecoder().decode(annexb)]
    want = [f.md5() for f in VVCDecoder().decode(data)]
    assert got == want


@needs_ref
def test_our_mp4_accepted_by_reference(tmp_path):
    data = _gen(width=96, height=64, seed=14, qp=30, inter=True, n_frames=3)
    raw = tmp_path / "s.vvc"
    raw.write_bytes(data)
    mp4 = tmp_path / "s.mp4"
    mp4.write_bytes(annexb_to_mp4(data))
    assert _ref_md5s(str(mp4)) == _ref_md5s(str(raw))


@needs_ref
def test_reference_mp4_decoded_by_us(tmp_path):
    data = _gen(width=96, height=64, seed=15, qp=30, inter=True, n_frames=3)
    raw = tmp_path / "s.vvc"
    raw.write_bytes(data)
    mp4 = tmp_path / "ref.mp4"
    subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-i", str(raw), "-c", "copy", str(mp4)],
                   check=True, capture_output=True)
    annexb, info = open_input(str(mp4))
    from ffmpeg_tpu.models.vvc.decoder import VVCDecoder

    got = [f.md5() for f in VVCDecoder().decode(annexb)]
    want = [f.md5() for f in VVCDecoder().decode(data)]
    assert got == want

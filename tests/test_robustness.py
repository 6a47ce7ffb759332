"""Stream-robustness tests: error containment, missing-ref gray
synthesis, flush/seek restart, truncated input (VERDICT r1 item 9;
reference behaviours: vvc_refs.c:316-347 gray refs, vvc_thread.c:605
per-frame error containment, vvcdec.c:894 flush)."""
import numpy as np
import pytest

from ffmpeg_tpu.bitstream.bits import split_annexb_raw
from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
from ffmpeg_tpu.models.vvc.decoder import DecoderConfig, VVCDecoder


def _gen(**kw):
    data, _ = encode_stream(EncoderConfig(**kw))
    return data


def test_flush_seek_restart():
    """flush() + refeed from the second IDR == decoding it standalone."""
    d1 = _gen(width=64, height=64, seed=41, qp=32, inter=True, n_frames=3)
    # second "segment": same encoder params, fresh IDR stream
    d2 = _gen(width=64, height=64, seed=43, qp=30, inter=True, n_frames=3)
    dec = VVCDecoder()
    first = [f.md5() for f in dec.decode(d1)]
    assert len(first) == 3
    dec.flush()
    got = [f.md5() for f in dec.decode(d2)]
    want = [f.md5() for f in VVCDecoder().decode(d2)]
    assert got == want


def test_sequential_decodes_no_flush():
    """Back-to-back decode() calls on one session stay correct (epoch
    separation of the TMVP store)."""
    d = _gen(width=64, height=64, seed=47, qp=30, inter=True, b_slices=True,
             tmvp=True, n_frames=3)
    dec = VVCDecoder()
    a = [f.md5() for f in dec.decode(d)]
    b = [f.md5() for f in dec.decode(d)]
    assert a == b == [f.md5() for f in VVCDecoder().decode(d)]


def test_missing_ref_gray_synthesis():
    """Dropping the IDR leaves the P frames without their reference:
    contained mode synthesizes gray and keeps decoding."""
    data = _gen(width=64, height=64, seed=53, qp=30, inter=True, n_frames=3)
    # strip the first slice NAL (the IDR) but keep parameter sets
    out = bytearray()
    dropped = False
    for t, _l, _tid, raw in split_annexb_raw(data):
        if t <= 10 and not dropped:
            dropped = True
            continue
        out += b"\x00\x00\x00\x01" + raw
    frames = list(VVCDecoder().decode(bytes(out)))
    assert len(frames) == 2  # the two P frames decoded against gray
    for f in frames:
        assert f.planes[0].shape == (64, 64)
    # strict mode raises instead
    with pytest.raises(RuntimeError):
        list(VVCDecoder(config=DecoderConfig(errors="raise"))
             .decode(bytes(out)))


def test_truncated_stream_contained():
    """A truncated final AU is dropped with an error log, not a crash."""
    data = _gen(width=64, height=64, seed=59, qp=30, inter=True, n_frames=3)
    cut = data[: int(len(data) * 0.85)]
    frames = list(VVCDecoder().decode(cut))
    assert 1 <= len(frames) <= 3
    full = [f.md5() for f in VVCDecoder().decode(data)]
    assert [f.md5() for f in frames] == full[: len(frames)]


def test_garbage_input_contained():
    rng = np.random.default_rng(0)
    junk = b"\x00\x00\x00\x01" + bytes(rng.integers(0, 255, 400,
                                                    dtype=np.uint8))
    frames = list(VVCDecoder().decode(junk))
    assert frames == []

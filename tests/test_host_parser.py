"""Native parser vs generator intent: every syntax value round-trips.

The generator (ffmpeg_tpu.encoder) writes streams whose conformance is
established against the reference decoder; here the native C++ parser
(ffmpeg_tpu/native) must recover every chosen syntax value exactly.
"""
import numpy as np
import pytest

from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
from ffmpeg_tpu.models.vvc.host import HostDecoder


def _check_stream(cfg: EncoderConfig):
    data, intent = encode_stream(cfg)
    dec = HostDecoder()
    # feed NALs frame by frame is not needed: single AU contains all;
    # but decode_au returns only the last frame, so split per frame
    from ffmpeg_tpu.bitstream.bits import split_annexb, make_nal

    nals = split_annexb(data)
    headers = b"".join(make_nal(t, r) for t, _, _, r in nals if t in (14, 15, 16))
    slices = [make_nal(t, r) for t, _, _, r in nals if t <= 10]
    assert len(slices) == cfg.n_frames

    frames = []
    first = True
    for s in slices:
        au = (headers + s) if first else s
        first = False
        frames.append(dec.decode_au(au))

    for frame, fintent in zip(frames, intent["frames"]):
        assert frame is not None
        assert frame.slice_qp == fintent["slice_qp"]
        cus = fintent["cus"]
        assert len(frame.cus["x0"]) == len(cus)
        for cu_i, cu in enumerate(cus):
            for k in ("x0", "y0", "w", "h", "luma_mode"):
                assert frame.cus[k][cu_i] == cu[k], (frame.poc, cu_i, k)
            x0, y0, w, h = cu["x0"], cu["y0"], cu["w"], cu["h"]
            for key, plane, ss in (("coeff_y", frame.coeff_y, 0),
                                   ("coeff_cb", frame.coeff_cb, 1),
                                   ("coeff_cr", frame.coeff_cr, 1)):
                cw, chh = w >> ss, h >> ss
                cx, cy = x0 >> ss, y0 >> ss
                want = (np.zeros((chh, cw), np.int32) if cu[key] is None
                        else np.asarray(cu[key], np.int32))
                got = plane[cy:cy + chh, cx:cx + cw]
                assert np.array_equal(want, got), (frame.poc, cu_i, key)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_intent_roundtrip(seed):
    _check_stream(EncoderConfig(width=128, height=64, n_frames=2, seed=seed,
                                qp=24 + seed * 7))


def test_intent_roundtrip_dense():
    _check_stream(EncoderConfig(width=64, height=64, n_frames=1, seed=42,
                                coeff_density=0.9, max_level=20000))


def test_intent_roundtrip_sparse_large():
    _check_stream(EncoderConfig(width=256, height=128, n_frames=1, seed=5,
                                coeff_density=0.02, qp=45))

import random

from ffmpeg_tpu.bitstream import BitReader, BitWriter, nal_escape, nal_unescape
from ffmpeg_tpu.bitstream.bits import make_nal, split_annexb


def test_bitwriter_reader_roundtrip():
    rng = random.Random(1234)
    ops = []
    w = BitWriter()
    for _ in range(2000):
        kind = rng.randrange(3)
        if kind == 0:
            n = rng.randrange(1, 25)
            v = rng.randrange(1 << n)
            w.u(n, v)
            ops.append(("u", n, v))
        elif kind == 1:
            v = rng.randrange(100000)
            w.ue(v)
            ops.append(("ue", None, v))
        else:
            v = rng.randrange(-50000, 50000)
            w.se(v)
            ops.append(("se", None, v))
    w.rbsp_trailing_bits()
    r = BitReader(w.to_bytes())
    for kind, n, v in ops:
        got = r.u(n) if kind == "u" else (r.ue() if kind == "ue" else r.se())
        assert got == v, (kind, n, v, got)
    assert r.u(1) == 1


def test_nal_escape_roundtrip():
    rng = random.Random(7)
    for _ in range(200):
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randrange(80)))
        esc = nal_escape(raw)
        assert b"\x00\x00\x00" not in esc[: len(esc)]
        # no 00 00 0x (x<=3) sequence unescaped
        for i in range(len(esc) - 2):
            if esc[i] == 0 and esc[i + 1] == 0:
                assert esc[i + 2] > 3 or esc[i + 2] == 3
        assert nal_unescape(esc) == raw


def test_annexb_split():
    rbsp1 = bytes([0, 0, 2, 42, 17])
    rbsp2 = bytes(range(20))
    stream = make_nal(15, rbsp1) + make_nal(8, rbsp2, tid=0, long_startcode=False)
    nals = split_annexb(stream)
    assert [t for t, *_ in nals] == [15, 8]
    assert nals[0][3] == rbsp1
    assert nals[1][3] == rbsp2

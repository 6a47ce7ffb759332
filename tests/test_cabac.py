import random

from ffmpeg_tpu.bitstream.cabac import CabacDecoder, CabacEncoder, ContextTable


def _random_session(seed, n_ops):
    rng = random.Random(seed)
    qp = rng.randrange(0, 64)
    init_type = rng.randrange(3)
    ops = []
    for _ in range(n_ops):
        k = rng.random()
        if k < 0.55:
            ops.append(("ctx", rng.randrange(378), rng.randrange(2)))
        elif k < 0.9:
            ops.append(("bypass", None, rng.randrange(2)))
        else:
            ops.append(("term0", None, 0))
    ops.append(("term1", None, 1))
    return qp, init_type, ops


def _encode(qp, init_type, ops):
    ctxs = ContextTable()
    ctxs.init_states(qp, init_type)
    enc = CabacEncoder()
    for kind, ctx, b in ops:
        if kind == "ctx":
            enc.encode(ctxs, ctx, b)
        elif kind == "bypass":
            enc.bypass(b)
        elif kind == "term0":
            enc.terminate(0)
        else:
            enc.terminate(1)
    payload, _ = enc.finish()
    return payload


def _decode(payload, qp, init_type, ops):
    ctxs = ContextTable()
    ctxs.init_states(qp, init_type)
    dec = CabacDecoder(payload)
    for kind, ctx, b in ops:
        if kind == "ctx":
            got = dec.decode(ctxs, ctx)
        elif kind == "bypass":
            got = dec.bypass()
        else:
            got = dec.terminate()
        assert got == b, (kind, ctx, b, got)


def test_cabac_roundtrip_small():
    for seed in range(20):
        qp, it, ops = _random_session(seed, 200)
        _decode(_encode(qp, it, ops), qp, it, ops)


def test_cabac_roundtrip_large():
    qp, it, ops = _random_session(999, 20000)
    _decode(_encode(qp, it, ops), qp, it, ops)


def test_cabac_biased_bins():
    # long runs of the same bin exercise renorm/carry paths
    rng = random.Random(5)
    for seed in range(5):
        ops = []
        for _ in range(50):
            ctx = rng.randrange(378)
            b = rng.randrange(2)
            ops += [("ctx", ctx, b)] * rng.randrange(1, 60)
        ops.append(("term1", None, 1))
        _decode(_encode(30, 1, ops), 30, 1, ops)

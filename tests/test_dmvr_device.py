"""Device DMVR refinement vs the host-side reference implementation.

The on-device 25-point SAD search (ops/dmvr.py) must produce exactly
the refined MV planes of models/vvc/dmvr.refine_frame (itself
MD5-parity-proven against reference ffmpeg through the dmvr-bdof
conformance stream).  Randomized A/B over synthetic frames.
"""
import types

import numpy as np
import pytest


def _mk_fs(rng, W=128, H=128, n_cu=6, bd=10, n_refs=2):
    sizes = [8, 16, 32]
    cus = {k: [] for k in ("dmvr", "x0", "y0", "w", "h", "mv_x", "mv_y",
                           "mv1_x", "mv1_y", "ref_idx", "ref_idx1")}
    for _ in range(n_cu):
        w = int(rng.choice(sizes))
        h = int(rng.choice(sizes))
        if w * h < 128:
            h = 16
        x0 = int(rng.integers(0, (W - w) // 8 + 1)) * 8
        y0 = int(rng.integers(0, (H - h) // 8 + 1)) * 8
        cus["dmvr"].append(1)
        cus["x0"].append(x0)
        cus["y0"].append(y0)
        cus["w"].append(w)
        cus["h"].append(h)
        for k in ("mv_x", "mv_y", "mv1_x", "mv1_y"):
            cus[k].append(int(rng.integers(-300, 300)))
        cus["ref_idx"].append(int(rng.integers(0, n_refs)))
        cus["ref_idx1"].append(int(rng.integers(0, n_refs)))
    cus = {k: np.array(v, np.int32) for k, v in cus.items()}
    fs = types.SimpleNamespace(
        cus=cus, width=W, height=H, bit_depth=bd,
        ref_pocs=[list(range(n_refs)), list(range(100, 100 + n_refs))])
    return fs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host(seed):
    import jax.numpy as jnp

    from ffmpeg_tpu.models.vvc.dmvr import refine_frame
    from ffmpeg_tpu.ops.dmvr import refine_frame_device

    rng = np.random.default_rng(seed)
    W = H = 128
    bd = 10
    fs = _mk_fs(rng, W, H, bd=bd)
    maxv = (1 << bd) - 1
    planes = {}
    for poc in fs.ref_pocs[0] + fs.ref_pocs[1]:
        planes[poc] = rng.integers(0, maxv + 1, (H, W)).astype(np.int32)
    host = refine_frame(fs, planes)
    # device DPB planes are padded; pad below/right with garbage to
    # prove the kernel only reads the picture region
    dpb = {poc: [jnp.asarray(np.pad(p, ((0, 32), (0, 32)),
                                    constant_values=9999))]
           for poc, p in planes.items()}
    dev = refine_frame_device(fs, dpb)
    for a, b, name in zip(host, dev,
                          ("rx0", "ry0", "rx1", "ry1", "valid", "nobdof")):
        np.testing.assert_array_equal(a, np.asarray(b), err_msg=name)

"""Multi-chip decode tests on the 8-virtual-device CPU mesh (SURVEY
§4.d: multi-host decode must produce identical MD5s to single-host).

- GOP-wave decode (parallel/gop.py): frames sharded over the 'frame'
  mesh axis with cross-shard reference planes through the DPB pool.
- Tile-sharded SAO (parallel/spatial.py): CTB-row bands over the
  'tile' axis with ppermute halo exchange.
"""
import os
import subprocess

import numpy as np
import pytest

REF_FFMPEG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "ffmpeg")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_FFMPEG),
                               reason="reference ffmpeg not built")


def _ref_md5s(path):
    out = subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", path,
         "-f", "framemd5", "-"], capture_output=True, text=True, check=True)
    assert not out.stderr, out.stderr
    return [line.split(",")[-1].strip() for line in out.stdout.splitlines()
            if line and not line.startswith("#")]


@needs_ref
def test_gop_mesh_md5_parity(tmp_path):
    """8-device GOP-parallel decode == reference == single-device."""
    import jax

    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
    from ffmpeg_tpu.models.vvc.decoder import decode_file
    from ffmpeg_tpu.parallel.gop import decode_gop_mesh
    from ffmpeg_tpu.parallel.mesh import make_mesh

    data, _ = encode_stream(EncoderConfig(
        width=96, height=64, seed=1401, qp=30, inter=True, b_slices=True,
        ra=True, n_frames=7, deblock=True, sao=True))
    path = str(tmp_path / "t.vvc")
    with open(path, "wb") as f:
        f.write(data)

    mesh = make_mesh(frame_axis=len(jax.devices()))
    got = [md5 for _poc, md5, _buf in decode_gop_mesh(data, mesh)]
    assert got == _ref_md5s(path)
    assert got == [f.md5() for f in decode_file(path)]


def test_sao_tiled_equality():
    """Row-band sharded SAO with halo exchange == whole-plane SAO."""
    import jax.numpy as jnp

    from ffmpeg_tpu.ops.sao import sao_plane
    from ffmpeg_tpu.parallel.mesh import make_mesh
    from ffmpeg_tpu.parallel.spatial import sao_plane_tiled

    rng = np.random.default_rng(0)
    ctb, bd = 32, 8
    pic_w, pic_h = 120, 88
    Hp, Wp = 128, 128
    cbh, cbw = 3, 4
    plane = jnp.asarray(rng.integers(0, 256, (Hp, Wp), dtype=np.int32))
    sao_type = jnp.asarray(rng.integers(0, 3, (cbh, cbw), dtype=np.int32))
    band_pos = jnp.asarray(rng.integers(0, 28, (cbh, cbw), dtype=np.int32))
    eo_class = jnp.asarray(rng.integers(0, 4, (cbh, cbw), dtype=np.int32))
    offv = jnp.asarray(rng.integers(-12, 13, (cbh, cbw, 5), dtype=np.int32))

    ref = sao_plane(plane, sao_type, band_pos, offv, eo_class,
                    pic_w, pic_h, ctb=ctb, bit_depth=bd)
    mesh = make_mesh(frame_axis=2)  # (2, 4): tile axis = 4
    got = sao_plane_tiled(plane, sao_type, band_pos, offv, eo_class,
                          pic_w, pic_h, ctb=ctb, bit_depth=bd, mesh=mesh)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_deblock_tiled_equality():
    """Row-band sharded vertical deblock (zero halo) == whole-plane."""
    import jax.numpy as jnp

    from ffmpeg_tpu.ops.deblock import deblock_vertical_luma
    from ffmpeg_tpu.parallel.mesh import make_mesh
    from ffmpeg_tpu.parallel.spatial import deblock_vertical_tiled

    rng = np.random.default_rng(3)
    plane = jnp.asarray(rng.integers(0, 256, (128, 128), dtype=np.int32))
    S, E = 128 // 4, 128 // 4
    bs = jnp.asarray(rng.integers(0, 3, (S, E), dtype=np.int32)).at[:, 0].set(0)
    qp = jnp.asarray(rng.integers(18, 45, (S, E), dtype=np.int32))
    mp = jnp.asarray(rng.choice([1, 3, 7], (S, E)).astype(np.int32))
    mq = jnp.asarray(rng.choice([1, 3, 7], (S, E)).astype(np.int32))
    he = jnp.zeros((S, E), jnp.int32)
    ref = deblock_vertical_luma(plane, bs, qp, mp, mq, he, bit_depth=8,
                                beta_off=2, tc_off=-2)
    mesh = make_mesh(frame_axis=2)
    got = deblock_vertical_tiled(plane, bs, qp, mp, mq, he, bit_depth=8,
                                 beta_off=2, tc_off=-2, mesh=mesh)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_alf_tiled_equality():
    """Row-band sharded ALF luma (CTB-row halo) == whole-plane."""
    import jax.numpy as jnp

    from ffmpeg_tpu.ops.alf import (TRANSPOSE_IDX, alf_classify,
                                    alf_filter_luma)
    from ffmpeg_tpu.parallel.mesh import make_mesh
    from ffmpeg_tpu.parallel.spatial import alf_luma_tiled

    rng = np.random.default_rng(5)
    ctb, bd = 32, 8
    plane = jnp.asarray(rng.integers(0, 256, (128, 128), dtype=np.int32))
    nby = nbx = 128 // ctb
    bank = jnp.asarray(rng.integers(0, 16, (nby, nbx), dtype=np.int32))
    flag = jnp.asarray(rng.integers(0, 2, (nby, nbx), dtype=np.int32))
    bco = jnp.asarray(rng.integers(-32, 33, (16, 25, 12), dtype=np.int32))
    bcl = jnp.asarray(rng.choice([256, 32, 8, 2],
                                 (16, 25, 12)).astype(np.int32))
    cls, tr = alf_classify(plane, ctb, bd)
    cb = (jnp.arange(128 // 4) * 4) // ctb
    bank44 = bank[cb[:, None], cb[None, :]]
    flag44 = flag[cb[:, None], cb[None, :]]
    c12 = jnp.take_along_axis(bco[bank44, cls],
                              jnp.asarray(TRANSPOSE_IDX)[tr], axis=-1)
    k12 = jnp.take_along_axis(bcl[bank44, cls],
                              jnp.asarray(TRANSPOSE_IDX)[tr], axis=-1)
    ref = alf_filter_luma(plane, c12, k12, ctb, flag44 > 0, bd)
    mesh = make_mesh(frame_axis=2)
    got = alf_luma_tiled(plane, bank, flag, bco, bcl, ctb=ctb,
                         bit_depth=bd, mesh=mesh)
    assert (np.asarray(ref) == np.asarray(got)).all()

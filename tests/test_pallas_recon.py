"""Hermetic Pallas recon-kernel test: the decode-order unit kernel
(ops/recon_pallas.py) run in interpret mode on CPU must be bit-exact
vs the reference decoder, same as the batched-XLA fallback path.

On real TPU hardware the same kernel compiles via Mosaic; bench.py and
the driver entry exercise that. Interpret mode checks the kernel's
logic (edge construction, angular one-hot matmuls, PDPC, store masks)
without the hardware."""
import os
import subprocess

import pytest

REF_FFMPEG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "ffmpeg")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_FFMPEG),
                               reason="reference ffmpeg not built")


def _md5s_ref(path):
    out = subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", path,
         "-f", "framemd5", "-"], capture_output=True, text=True, check=True)
    assert not out.stderr, out.stderr
    return [line.split(",")[-1].strip() for line in out.stdout.splitlines()
            if line and not line.startswith("#")]


@needs_ref
@pytest.mark.parametrize("cfg_kw", [
    dict(width=64, height=64, seed=151, qp=30),
    dict(width=96, height=64, seed=152, qp=28, inter=True, b_slices=True,
         deblock=True, sao=True, n_frames=3),
    dict(width=96, height=64, seed=153, qp=28, inter=True, b_slices=True,
         n_frames=3, ciip=True, mmvd=True, bcw=True, lmcs=True),
    dict(width=96, height=64, seed=154, qp=28, inter=True, b_slices=True,
         n_frames=3, sbtmvp=True, deblock=True),
    dict(width=96, height=64, seed=155, qp=28, inter=True, b_slices=True,
         n_frames=3, affine=True, prof=True, deblock=True),
    dict(width=96, height=64, seed=156, qp=28, mrl=True, mip=True,
         cclm=True),
], ids=["intra", "inter-b", "wave1-lmcs", "sbtmvp", "affine",
        "mrl-mip-cclm"])
def test_pallas_interpret_parity(tmp_path, cfg_kw, monkeypatch):
    monkeypatch.setenv("FFMPEG_TPU_PALLAS", "1")
    from ffmpeg_tpu.encoder.encoder import EncoderConfig, encode_stream
    from ffmpeg_tpu.models.vvc import pipeline
    from ffmpeg_tpu.models.vvc.decoder import decode_file

    # the program cache is keyed by _use_pallas(); drop entries built
    # by other tests under the fallback path
    pipeline._PROGRAM_CACHE.clear()
    try:
        data, _ = encode_stream(EncoderConfig(**cfg_kw))
        path = str(tmp_path / "t.vvc")
        with open(path, "wb") as f:
            f.write(data)
        assert _md5s_ref(path) == [f.md5() for f in decode_file(path)]
    finally:
        pipeline._PROGRAM_CACHE.clear()

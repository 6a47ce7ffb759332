"""Top-level VVC decoder: annex-B bytes -> decoded frames.

Mirrors the reference session model (avcodec send/receive,
vvcdec.c:868-891): feed access units, receive frames in output order.
Host parsing is native (libvvc_host), reconstruction runs on the JAX
device (see recon.py).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from .host import HostDecoder
from .recon import reconstruct_frame


@dataclass
class Frame:
    poc: int
    planes: list  # [Y, Cb, Cr] numpy arrays
    width: int
    height: int
    bit_depth: int

    def md5(self) -> str:
        m = hashlib.md5()
        for p in self.planes:
            m.update(np.ascontiguousarray(p).tobytes())
        return m.hexdigest()


class VVCDecoder:
    """Streaming decoder for annex-B VVC (intra + P slices)."""

    def __init__(self) -> None:
        self._host = HostDecoder()
        self._dpb: dict[int, list] = {}  # poc -> [Y, Cb, Cr]

    def decode(self, data: bytes):
        """Decode a buffer holding one or more access units; yields Frames
        in decode order (no reordering needed yet: P-only GOPs)."""
        from ...bitstream.bits import make_nal, split_annexb

        nals = split_annexb(data)
        pending: list[bytes] = []
        for t, layer, tid, rbsp in nals:
            pending.append(make_nal(t, rbsp, layer_id=layer, tid=max(tid, 0)))
            if t <= 10:  # slice NAL closes an AU (v1: one slice per frame)
                is_idr = t in (7, 8)
                fs = self._host.decode_au(b"".join(pending))
                pending = []
                if fs is None:
                    continue
                if is_idr:
                    self._dpb.clear()
                if fs.slice_type != 2:
                    needed = set(fs.ref_pocs[0]) | set(fs.ref_pocs[1])
                    missing = needed - set(self._dpb)
                    if missing:
                        raise RuntimeError(f"missing reference frames {missing}")
                planes = reconstruct_frame(fs, dict(self._dpb))
                self._dpb[fs.poc] = planes
                yield Frame(poc=fs.poc, planes=planes, width=fs.width,
                            height=fs.height, bit_depth=fs.bit_depth)


def decode_file(path: str):
    with open(path, "rb") as f:
        data = f.read()
    dec = VVCDecoder()
    yield from dec.decode(data)

"""Top-level VVC decoder: annex-B bytes -> decoded frames.

Mirrors the reference session model (avcodec send/receive,
vvcdec.c:868-891): feed access units, receive frames in output order.
Host parsing is native (libvvc_host); each frame is one XLA program
dispatch (pipeline.py).

Performance model: every device<->host round-trip costs a full
transport latency, so the decoder
  - keeps the DPB device-resident (padded int32 planes are fed back
    as references without ever touching the host),
  - packs each frame's output into one flat planar-YCbCr buffer on
    device, then fetches a whole group of frames with a single
    stacked transfer (latency amortized over FETCH_BATCH frames),
  - dispatches ahead of the consumer, so device compute of frame n+1
    overlaps the host parse/fetch of earlier frames (the reference
    overlaps stages with its frame/task thread pool, vvc_thread.c;
    here the async XLA dispatch queue plays that role).
"""
from __future__ import annotations

import hashlib

import numpy as np

from .host import HostDecoder
from .pipeline import decode_frame_device

# frames fetched per device->host transfer; also the dispatch-ahead depth
FETCH_BATCH = 8
# device DPB sliding window (pocs kept as references)
DPB_KEEP = 16


class Frame:
    """A decoded frame; `buf` is the planar-YCbCr packed pixel buffer
    (uint8, or uint16 little-endian for >8-bit).  `buf` may still be a
    device array (decode(fetch=False)); it is fetched on first host
    access."""

    def __init__(self, poc, buf, width, height, bit_depth):
        self.poc = poc
        self.buf = buf
        self.width = width
        self.height = height
        self.bit_depth = bit_depth

    def _host_buf(self) -> np.ndarray:
        if not isinstance(self.buf, np.ndarray):
            self.buf = np.asarray(self.buf)
        return self.buf

    @property
    def planes(self) -> list:
        """[Y, Cb, Cr] numpy views into the packed buffer."""
        buf, w, h = self._host_buf(), self.width, self.height
        cs = (w // 2) * (h // 2)
        return [buf[:w * h].reshape(h, w),
                buf[w * h:w * h + cs].reshape(h // 2, w // 2),
                buf[w * h + cs:].reshape(h // 2, w // 2)]

    def tobytes(self) -> bytes:
        return self._host_buf().tobytes()

    def md5(self) -> str:
        # planar YCbCr bytes == the packed buffer, in order
        return hashlib.md5(self.tobytes()).hexdigest()


_stack_jit = None


def _fetch_group(packed_list):
    """One transfer for a group of equal-shape packed frame buffers."""
    global _stack_jit
    if _stack_jit is None:
        import jax
        import jax.numpy as jnp
        _stack_jit = jax.jit(lambda xs: jnp.stack(xs))

    if len(packed_list) == 1:
        arr = packed_list[0]
    else:
        arr = _stack_jit(packed_list)
    if hasattr(arr, "copy_to_host_async"):
        arr.copy_to_host_async()
    buf = np.asarray(arr)
    return [buf] if len(packed_list) == 1 else list(buf)


class VVCDecoder:
    """Streaming decoder for annex-B VVC."""

    def __init__(self) -> None:
        self._host = HostDecoder()
        self._dpb: dict[int, list] = {}  # poc -> [Y, Cb, Cr] device planes

    def decode(self, data: bytes, fetch: bool = True):
        """Decode a buffer holding one or more access units; yields Frames
        in decode order (no reordering needed yet: P-only GOPs).

        With fetch=False, frames are yielded as soon as dispatched with
        device-resident pixel buffers (fetched lazily on access) — the
        `-f null` mode: full decode without the host transfer.
        """
        from ...bitstream.bits import make_nal, split_annexb

        nals = split_annexb(data)
        pending: list[bytes] = []
        window: list = []  # [(Frame, packed)] dispatched, not yet fetched

        def flush():
            if not window:
                return
            bufs = _fetch_group([p for _, p in window])
            for (f, _), b in zip(window, bufs):
                f.buf = b
            out = [f for f, _ in window]
            window.clear()
            return out

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
                packed, planes = decode_frame_device(fs, self._dpb)
                self._dpb[fs.poc] = planes
                while len(self._dpb) > DPB_KEEP:
                    del self._dpb[min(self._dpb)]
                frame = Frame(poc=fs.poc, buf=packed, width=fs.width,
                              height=fs.height, bit_depth=fs.bit_depth)
                if not fetch:
                    yield frame
                    continue
                window.append((frame, packed))
                if len(window) >= FETCH_BATCH:
                    yield from flush()
        if window:
            yield from flush()


def decode_file(path: str):
    with open(path, "rb") as f:
        data = f.read()
    dec = VVCDecoder()
    yield from dec.decode(data)

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
from dataclasses import dataclass

import numpy as np

from ...utils import trace
from ...utils.log import get_logger
from .host import HostDecoder
from .pipeline import submit_frame

log = get_logger("vvc.decoder")

# frames fetched per device->host transfer; also the dispatch-ahead depth
FETCH_BATCH = 8


@dataclass
class DecoderConfig:
    """Runtime decoder options (the AVOption analog; reference uses
    thread_count -> executor width, AV_CODEC_FLAG_LOW_DELAY -> nb_fcs,
    vvcdec.c:937-954)."""
    host_threads: int = 4      # parallel host CABAC parse lanes
    fetch_batch: int = FETCH_BATCH  # frames per device->host transfer
    errors: str = "contain"    # "contain": log + skip bad AUs, synthesize
    #                            gray for missing refs (vvc_refs.c:316);
    #                            "raise": propagate (strict/test mode)


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
        """[Y, Cb, Cr] numpy views into the packed buffer ([Y] for
        4:0:0 monochrome frames)."""
        buf, w, h = self._host_buf(), self.width, self.height
        if buf.size == w * h:  # monochrome
            return [buf.reshape(h, w)]
        cs = (w // 2) * (h // 2)
        return [buf[:w * h].reshape(h, w),
                buf[w * h:w * h + cs].reshape(h // 2, w // 2),
                buf[w * h + cs:].reshape(h // 2, w // 2)]

    def tobytes(self) -> bytes:
        return self._host_buf().tobytes()

    def md5(self) -> str:
        # planar YCbCr bytes == the packed buffer, in order
        return hashlib.md5(self.tobytes()).hexdigest()


def _fetch_group(packed_list):
    """Materialize a group of packed frame buffers on the host.  Each
    buffer's device->host copy was started at dispatch time
    (copy_to_host_async), so these np.asarray calls mostly just wait
    on transfers that already streamed behind the compute."""
    for arr in packed_list:
        if hasattr(arr, "copy_to_host_async"):
            arr.copy_to_host_async()
    with trace.span("fetch"):
        return [np.asarray(arr) for arr in packed_list]


_PARAM_NAL_TYPES = (12, 13, 14, 15, 16, 17, 18)  # OPI/DCI/VPS/SPS/PPS/APS


class VVCDecoder:
    """Streaming decoder for annex-B VVC.

    Host CABAC parsing runs on a thread pool (the native call releases
    the GIL): entropy decode of every access unit is independent once
    its parameter sets are known — the inter-frame dependencies live
    entirely in reconstruction, which is the device's (cheap) side.
    This mirrors the reference's frame-parallel entropy threading
    (vvc_thread.c PARSE stage) without its progress-tracking machinery.
    """

    def __init__(self, host_threads: int | None = None,
                 config: DecoderConfig | None = None) -> None:
        import queue
        from concurrent.futures import ThreadPoolExecutor

        from .host import ColStore

        cfg = config or DecoderConfig()
        if host_threads is not None:
            cfg.host_threads = host_threads
        self.config = cfg
        self._colstore = ColStore()  # session-scoped TMVP exchange
        self._hosts: queue.Queue = queue.Queue()
        for _ in range(cfg.host_threads):
            self._hosts.put(HostDecoder(self._colstore))
        self._exec = ThreadPoolExecutor(max_workers=cfg.host_threads)
        self._parse_ahead = 2 * cfg.host_threads
        self._dpb: dict[int, list] = {}  # poc -> [Y, Cb, Cr] device planes
        self._epoch_base = 0  # monotone across decode() calls (TMVP keys)
        # open-GOP / gradual-recovery output state (decode_recovery_flag
        # + decode_recovery_poc, vvc_ps.c:745-762; suppression rule
        # vvc_refs.c:178): a CRA/GDR that STARTS decoding (after
        # construction or flush) suppresses output of its RASL leading
        # pictures / pre-recovery-point pictures
        self._last_eos = True
        self._no_out_before_rec = False
        self._recovery_poc = None  # GDR recovery point (None = recovered)

    def flush(self) -> None:
        """Drop all inter-frame stream state (avcodec_flush_buffers /
        vvc_decode_flush analog, vvcdec.c:894-907): the DPB and the
        TMVP collocated store.  After a flush, decoding must resume at
        an IRAP (IDR/CRA) access unit — the seek-restart contract."""
        from .host import ColStore

        self._dpb.clear()
        self._colstore = ColStore()
        self._epoch_base = 0
        self._last_eos = True
        self._no_out_before_rec = False
        self._recovery_poc = None
        # re-bind the pooled host parsers to the fresh colstore
        hosts = []
        while not self._hosts.empty():
            hosts.append(self._hosts.get_nowait())
        for _ in hosts:
            self._hosts.put(HostDecoder(self._colstore))

    def _gray_planes(self, fs):
        """Synthesize a mid-gray reference (missing-ref recovery,
        vvc_refs.c:316-347: generate_missing_ref)."""
        import jax.numpy as jnp

        from .pipeline import _padded_plane_shapes

        sy, sc = _padded_plane_shapes(fs.width, fs.height, fs.ctb_log2)
        gray = 1 << (fs.bit_depth - 1)
        if fs.chroma_format_idc == 0:
            return [jnp.full(sy, gray, jnp.int32)]
        return [jnp.full(sy, gray, jnp.int32),
                jnp.full(sc, gray, jnp.int32),
                jnp.full(sc, gray, jnp.int32)]

    def _parse_au(self, au: bytes, epoch: int):
        """Worker-thread frame stage: native CABAC parse (releases the
        GIL) + host input build/pack (pipeline.prepare_frame).  Only
        the reference resolution + dispatch stay on the main thread."""
        from .pipeline import prepare_frame

        hd = self._hosts.get()
        try:
            with trace.span("host_parse"):
                fs = hd.decode_au(au, epoch)
        finally:
            self._hosts.put(hd)
        if fs is None:
            return None
        if fs.cus is not None and "dmvr" in fs.cus \
                and np.any(fs.cus["dmvr"]):
            # DMVR frames: the unit controls depend on the refined MVs,
            # which need reference pixels -- the main thread runs the
            # refinement (dmvr.refine_frame) and prepares afterwards
            return fs, None
        with trace.span("build_pack"):
            return fs, prepare_frame(fs)

    def _split_aus(self, data: bytes):
        """[(nal_type, epoch, au_bytes)] where each AU is self-contained:
        the parameter sets seen so far are prepended, so any worker can
        parse any AU without shared state.  `epoch` counts IDRs so the
        TMVP store can disambiguate restarted POCs under parse-ahead."""
        from ...bitstream.bits import split_annexb_raw

        params: list[bytes] = []
        cur: list[bytes] = []
        cur_slice_type: int | None = None
        cur_has_ph = False
        aus = []
        # epochs are monotone across decode() calls on this session so
        # restarted POCs never alias older TMVP entries
        base = self._epoch_base
        epoch = base - 1

        def close():
            nonlocal cur, cur_slice_type, cur_has_ph, epoch
            if cur_slice_type is not None:
                if cur_slice_type in (7, 8):  # IDR resets POC sequence
                    epoch += 1
                aus.append((cur_slice_type, max(epoch, base),
                            b"".join(params) + b"".join(cur)))
            cur, cur_slice_type, cur_has_ph = [], None, False

        for t, _layer, _tid, raw in split_annexb_raw(data):
            if t in _PARAM_NAL_TYPES:
                params.append(raw)
                continue
            if t == 19:  # PH NAL opens a new AU (multi-slice pictures
                #          carry the picture header in its own NAL —
                #          7.4.8 requires it when a picture has more
                #          than one slice; find_frame_end analog)
                close()
                cur.append(raw)
                cur_has_ph = True
                continue
            cur.append(raw)
            if t <= 10:  # coded slice
                if cur_slice_type is None:
                    cur_slice_type = t
                if not cur_has_ph:
                    # in-slice picture header => exactly one slice/AU
                    close()
        close()
        self._epoch_base = epoch + 1
        return aus

    def decode(self, data: bytes, fetch: bool = True):
        """Decode a buffer holding one or more access units; yields Frames
        in output order (DPB bumping bounded by the reorder depth).

        With fetch=False, frames are yielded as soon as dispatched with
        device-resident pixel buffers (fetched lazily on access) — the
        `-f null` mode: full decode without the host transfer.
        """
        from collections import deque

        aus = self._split_aus(data)
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

        inflight: deque = deque()  # (nal_type, epoch, future), decode order
        next_submit = 0
        # output reordering (DPB bumping): frames leave in POC order,
        # held back by at most sps_dpb_max_num_reorder_pics
        pending_out: list = []
        reorder_depth = 0

        def top_up():
            nonlocal next_submit
            while (next_submit < len(aus)
                   and len(inflight) < self._parse_ahead):
                nal_type, epoch, au = aus[next_submit]
                inflight.append((nal_type, epoch,
                                 self._exec.submit(self._parse_au, au, epoch)))
                next_submit += 1

        def emit(frame):
            if not fetch:
                return [frame]
            window.append((frame, frame.buf))
            if len(window) >= self.config.fetch_batch:
                return flush()
            return []

        def bump(all_of_them=False):
            out = []
            limit = 0 if all_of_them else reorder_depth
            while len(pending_out) > limit:
                pending_out.sort(key=lambda f: f.poc)
                out.extend(emit(pending_out.pop(0)))
            return out

        contain = self.config.errors == "contain"
        top_up()
        first = True
        while inflight:
            nal_type, epoch, fut = inflight.popleft()
            is_idr = nal_type in (7, 8)
            try:
                parsed = fut.result()
            except Exception as e:
                # per-frame error containment (vvc_thread.c:605-617 /
                # vvcdec.c:795-798: a failed frame is dropped, the
                # session keeps decoding)
                if not contain:
                    raise
                log.error("dropping undecodable access unit: %s", e)
                top_up()
                continue
            top_up()
            if parsed is None:
                continue
            fs, prepared = parsed
            if fs.slice_type != 2:
                needed = set(fs.ref_pocs[0]) | set(fs.ref_pocs[1])
                missing = needed - set(self._dpb)
                if missing and not contain:
                    raise RuntimeError(f"missing reference frames {missing}")
                for poc in missing:
                    log.warning("poc %d: missing reference %d, "
                                "synthesizing gray", fs.poc, poc)
                    self._dpb[poc] = self._gray_planes(fs)
            if prepared is None:
                # DMVR: the 25-point SAD search runs on device against
                # the HBM-resident reference planes (ops/dmvr.py); only
                # the per-subblock refinements come back to the host,
                # which publishes the deferred collocated motion and
                # rebuilds the unit controls with the refined MVs
                from ...ops.dmvr import refine_frame_device
                from .host import dmvr_apply
                from .pipeline import prepare_frame

                dmvr_apply(fs, self._colstore, epoch,
                           refine_frame_device(fs, self._dpb))
                prepared = prepare_frame(fs)
            if is_idr:
                if not first:
                    yield from bump(all_of_them=True)
                self._dpb.clear()
            first = False
            reorder_depth = fs.max_num_reorder
            with trace.span("dispatch"):
                packed, planes = submit_frame(prepared, fs, self._dpb)
            if fetch and hasattr(packed, "copy_to_host_async"):
                # start the device->host transfer now so it streams
                # behind later frames' dispatch/compute (the transport
                # is the throughput floor, not the device)
                packed.copy_to_host_async()
            self._dpb[fs.poc] = planes
            # RPS-driven DPB lifetime (spec 8.3.2 / vvc_refs.c:196-294):
            # every picture that any later picture references must be in
            # the current picture's ref pic lists (active or inactive);
            # anything not listed is "unused for reference" and released.
            listed = set(fs.ref_pocs[0]) | set(fs.ref_pocs[1])
            if listed:
                for poc in [p for p in self._dpb
                            if p != fs.poc and p not in listed]:
                    del self._dpb[poc]
            log.debug("decoded poc %d (%dx%d), dpb=%d", fs.poc, fs.width,
                      fs.height, len(self._dpb))
            # recovery-output model (vvc_ps.c:745-762, vvc_refs.c:178):
            # IDR clears it; CRA/GDR only suppress when they start the
            # CLVS (session start / post-flush)
            if is_idr:
                self._no_out_before_rec = False
                self._recovery_poc = None
            elif nal_type in (9, 10):  # CRA / GDR
                self._no_out_before_rec = self._last_eos
                if self._no_out_before_rec and nal_type == 10:
                    self._recovery_poc = fs.poc + fs.recovery_poc_cnt
            self._last_eos = False
            recovered = (self._recovery_poc is None
                         or self._recovery_poc <= fs.poc)
            if recovered:
                self._recovery_poc = None
            suppress = self._no_out_before_rec and (nal_type == 3
                                                    or not recovered)
            if not suppress:
                cl, cr2, ct, cb2 = getattr(fs, "crop", (0, 0, 0, 0))
                pending_out.append(Frame(poc=fs.poc, buf=packed,
                                         width=fs.width - cl - cr2,
                                         height=fs.height - ct - cb2,
                                         bit_depth=fs.bit_depth))
            yield from bump()
        yield from bump(all_of_them=True)
        if window:
            yield from flush()


def decode_file(path: str):
    with open(path, "rb") as f:
        data = f.read()
    dec = VVCDecoder()
    yield from dec.decode(data)

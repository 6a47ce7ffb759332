"""ffmpeg_tpu: TPU-native VVC (H.266) decode framework."""


def _tune_malloc() -> None:
    """Keep large numpy buffers on the heap instead of per-allocation
    mmap.  glibc mmap()s allocations over 128 KB and munmap()s them on
    free, so every frame's syntax tensors (1-40 MB each) are faulted-in
    from zero pages again — measured at 40-80 ms/frame of page-fault
    time at 1080p.  Raising M_MMAP_THRESHOLD (and M_TRIM_THRESHOLD so
    the freed heap is retained) makes malloc recycle warm memory."""
    import ctypes
    import sys

    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 64 * 1024 * 1024)
        libc.mallopt(M_TRIM_THRESHOLD, 128 * 1024 * 1024)
    except Exception:  # noqa: BLE001 - musl etc.: harmless to skip
        pass


_tune_malloc()

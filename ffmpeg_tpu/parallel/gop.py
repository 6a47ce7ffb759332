"""GOP-parallel decode over a device mesh (P1/P6/P8).

The reference decodes frames concurrently in `nb_fcs` frame contexts
with cross-frame progress listeners waking dependent CTU tasks
(vvcdec.c:932-975, vvc_refs.c:492-565).  The TPU inversion: frames are
topologically grouped into *dependency waves* by their reference
lists; each wave decodes as ONE jit program vmapped over the 'frame'
mesh axis.  Reference planes are gathered from a device-resident,
replicated DPB pool indexed by slot id, and storing a wave's decoded
planes back into the pool is the XLA collective (all-gather across the
frame axis) that replaces the reference's progress/listener machinery.

Frame-axis scaling lives here; spatial ('tile') sharding of the filter
stages lives in parallel/spatial.py.
"""
from __future__ import annotations

import numpy as np

POOL_SLOTS = 16  # DPB pool size (reference: VVC_MAX_DPB_SIZE)


def plan_waves(frames):
    """Group decode-order frames into dependency waves: every frame's
    references decode in strictly earlier waves (the static analog of
    the reference's per-CTU cross-frame progress waits)."""
    wave_of: dict[int, int] = {}
    waves: list[list[int]] = []
    for idx, fs in enumerate(frames):
        deps = [p for lx in (0, 1) for p in fs.ref_pocs[lx]]
        w = 0
        for p in deps:
            if p not in wave_of:
                raise RuntimeError(f"missing reference POC {p}")
            w = max(w, wave_of[p] + 1)
        wave_of[fs.poc] = w
        while len(waves) <= w:
            waves.append([])
        waves[w].append(idx)
    return waves


def _allocate_slots(frames, waves):
    """Greedy DPB-slot allocation: a slot stays live until the last
    wave that references its POC has decoded."""
    wave_of = {}
    for w, idxs in enumerate(waves):
        for i in idxs:
            wave_of[frames[i].poc] = w
    last_need = {fs.poc: wave_of[fs.poc] for fs in frames}
    for fs in frames:
        for lx in (0, 1):
            for p in fs.ref_pocs[lx]:
                last_need[p] = max(last_need[p], wave_of[fs.poc])

    slot_of: dict[int, int] = {}
    free = list(range(POOL_SLOTS))
    releases: list[list[int]] = [[] for _ in waves]
    for w, idxs in enumerate(waves):
        for i in idxs:
            poc = frames[i].poc
            if not free:
                raise RuntimeError("DPB pool exhausted (GOP too deep)")
            slot_of[poc] = free.pop(0)
            releases[last_need[poc]].append(slot_of[poc])
        # slots whose last referencing wave just decoded come back
        # (after this wave, so a wave never reuses a slot it reads)
        free.extend(releases[w])
    return slot_of


def decode_gop_mesh(data: bytes, mesh=None):
    """Decode a single-GOP annex-B buffer wave-parallel over `mesh`'s
    'frame' axis; returns decoded frames in POC (display) order as
    (poc, md5, packed_ndarray) tuples.

    Uses the batched-XLA frame program (not the sequential Pallas
    kernel, which is single-stream by construction)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.vvc.decoder import VVCDecoder
    from ..models.vvc import pipeline as PL
    from .mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(frame_axis=len(jax.devices()))
    F = mesh.shape["frame"]

    from ..models.vvc.host import HostDecoder

    dec = VVCDecoder()
    aus = dec._split_aus(data)
    assert all(ep == aus[0][1] for _, ep, _ in aus), (
        "decode_gop_mesh v1 handles a single IRAP period per call")
    hd = HostDecoder(dec._colstore)
    frames = []
    for _is_idr, ep, au in aus:
        fs = hd.decode_au(au, ep)
        if fs is not None:
            frames.append(fs)
    if not frames:
        return []

    W, H = frames[0].width, frames[0].height
    ctb_log2 = frames[0].ctb_log2
    n0 = max(1, max(len(fs.ref_pocs[0]) for fs in frames))
    n1 = max(1, max(len(fs.ref_pocs[1]) for fs in frames))
    nref = n0 + n1
    force_sao = any(fs.sao is not None for fs in frames)
    force_isp = any(getattr(fs, "has_isp", 0) for fs in frames)
    force_tb64 = any(getattr(fs, "has_tb64", 0) for fs in frames)

    def build(fs):
        return PL.build_host_inputs(fs, ctb_log2, ref_slots=(n0, n1),
                                    pallas=False, force_sao=force_sao,
                                    force_isp=force_isp,
                                    force_tb64=force_tb64)

    for fs in frames:
        build(fs)          # settle the capacity ratchet
    inputs = [build(fs) for fs in frames]

    prog = PL.get_frame_program(W, H, ctb_log2, frames[0].bit_depth,
                                pallas=False, isp=force_isp,
                                tb64=force_tb64,
                                dbo=tuple(frames[0].beta_offset),
                                dto=tuple(frames[0].tc_offset))
    leaves0, treedef0 = jax.tree_util.tree_flatten(inputs[0])
    var = prog._variant(leaves0, treedef0)
    _, offs, total, _, run = var
    bufs = []
    for inp in inputs:
        leaves, treedef = jax.tree_util.tree_flatten(inp)
        assert treedef == treedef0, "frame input structure diverged"
        bufs.append(PL._pack_leaves(leaves, total))

    waves = plan_waves(frames)
    slot_of = _allocate_slots(frames, waves)
    zero_slot, scratch = POOL_SLOTS, POOL_SLOTS + 1

    def slot_ids_for(fs):
        ids = []
        for lx, cap in ((0, n0), (1, n1)):
            pocs = fs.ref_pocs[lx]
            ids += [slot_of[p] for p in pocs] + [zero_slot] * (cap - len(pocs))
        return ids

    shape_y, shape_c = PL._padded_plane_shapes(W, H, ctb_log2)
    mid = 1 << (frames[0].bit_depth - 1)
    # DPB pool SHARDED across the frame axis (slot i lives on device
    # i*F/slots): resident HBM per device is pool/F, and a wave's
    # reference reads become XLA cross-shard gathers — the collective
    # replacing the reference's progress/listener machinery
    # (vvc_refs.c:492-565).  Slot count padded to a multiple of F.
    n_slots = ((POOL_SLOTS + 2 + F - 1) // F) * F
    sh_frame = NamedSharding(mesh, P("frame"))
    sh_slot = NamedSharding(mesh, P("frame"))
    sh_rep = NamedSharding(mesh, P())
    pools = [jax.device_put(
        jnp.full((n_slots,) + shp, mid, jnp.int32), sh_slot)
        for shp in (shape_y, shape_c, shape_c)]

    def wave_fn(bufs_w, slot_ids_w, out_slots_w, *pools_w):
        def one(buf, sl):
            refs = [tuple(pools_w[c][sl[k]] for k in range(nref))
                    for c in range(3)]
            return run(buf, refs)

        out = jax.vmap(one)(bufs_w, slot_ids_w)
        new_pools = tuple(pools_w[c].at[out_slots_w].set(out["planes"][c])
                          for c in range(3))
        return out["packed"], new_pools

    wave_jit = jax.jit(
        wave_fn,
        in_shardings=(sh_frame, sh_frame, sh_rep,
                      sh_slot, sh_slot, sh_slot),
        out_shardings=(sh_frame, (sh_slot, sh_slot, sh_slot)))

    results = {}
    with mesh:
        # all waves are dispatched back-to-back: each wave's output
        # fetch stays OFF the dispatch path (jax dispatch is async, so
        # wave k+1's programs queue behind wave k without a host sync;
        # the reference's progress/listener machinery becomes plain
        # device-order execution), and the host drains the packed
        # outputs only after the last wave is in flight.
        fetches = []  # (chunk, packed_device_array)
        for idxs in waves:
            for c0 in range(0, len(idxs), F):
                chunk = idxs[c0:c0 + F]
                pad = chunk + [chunk[-1]] * (F - len(chunk))
                bw = np.stack([bufs[i] for i in pad])
                sw = np.array([slot_ids_for(frames[i]) for i in pad],
                              np.int32)
                ow = np.array(
                    [slot_of[frames[i].poc] for i in chunk]
                    + [scratch] * (F - len(chunk)), np.int32)
                packed, pools = wave_jit(bw, sw, ow, *pools)
                fetches.append((chunk, packed))
        for chunk, packed in fetches:
            host = np.asarray(packed)
            for j, i in enumerate(chunk):
                results[frames[i].poc] = host[j]

    import hashlib
    return [(poc, hashlib.md5(results[poc].tobytes()).hexdigest(),
             results[poc])
            for poc in sorted(results)]


def measure_scaling(data: bytes, device_counts, reps: int = 2):
    """Frames/s vs mesh width for one GOP (VERDICT r3 item 7): decodes
    the same buffer at each frame-axis width, timing warm repetitions,
    and checks MD5 equality across widths.  Returns
    {F: {"fps": .., "efficiency": ..}, "md5_equal": bool}."""
    import time

    import jax

    from .mesh import make_mesh

    out = {}
    md5s = {}
    for F in device_counts:
        if F > len(jax.devices()):
            continue
        mesh = make_mesh(F, frame_axis=F)
        decode_gop_mesh(data, mesh)  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(reps):
            gop = decode_gop_mesh(data, mesh)
        dt = (time.perf_counter() - t0) / reps
        md5s[F] = [m for _, m, _ in gop]
        out[F] = {"fps": round(len(gop) / dt, 3)}
    base = min(out)
    for F in out:
        out[F]["efficiency"] = round(
            out[F]["fps"] / (out[base]["fps"] * F / base), 3)
    ref = next(iter(md5s.values()))
    out["md5_equal"] = all(v == ref for v in md5s.values())
    return out

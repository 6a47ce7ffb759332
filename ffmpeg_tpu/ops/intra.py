"""Intra prediction as JAX int32 ops over reference-sample edges.

Bit-exact mirror of the reference's intra path (spec 8.4.5.2; parity
target `vvc_intra_template.c:450-1015` and `vvc_intra.c:529-714`):
reference-sample gathering with availability substitution, the [1 2 1]
reference filter, planar/DC/horizontal/vertical/angular prediction with
the 4-tap luma interpolation (fC/fG) and 2-tap chroma interpolation,
PDPC, and wide-angle mapping.

All kernels are *generic over block size*: w/h (and log2s) are traced
scalars, outputs are (MAXS, MAXS) blocks masked to the real size.  This
gives a single XLA program per plane type that handles every CU — and
vmaps cleanly for wavefront batching later.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_TABLES = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "vvc", "vvc_tables.npz"))

INTRA_LUMA_FILTER = _TABLES["intra_luma_filter"].astype(np.int32)  # (2,32,4)

INTRA_PLANAR, INTRA_DC, INTRA_HORZ, INTRA_DIAG, INTRA_VERT = 0, 1, 18, 34, 50

# mode classes for lax.switch
MC_PLANAR, MC_DC, MC_VERT, MC_HORZ, MC_ANG_V, MC_ANG_H = range(6)

_ANGLES = [0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29,
           32, 35, 39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512]


# ---------------------------------------------------------------------
# host-side (python int) mode derivations
# ---------------------------------------------------------------------

def wide_angle_map(mode: int, w: int, h: int) -> int:
    """spec 8.4.5.2.7 (parity vvc_intra.c:690-713); ISP off, nw=w nh=h."""
    if w == h or mode == INTRA_PLANAR or mode == INTRA_DC:
        return mode
    wh_ratio = abs((w.bit_length() - 1) - (h.bit_length() - 1))
    mx = 8 + 2 * wh_ratio if wh_ratio > 1 else 8
    mn = 60 - 2 * wh_ratio if wh_ratio > 1 else 60
    if w > h and 2 <= mode < mx:
        return mode + 65
    if h > w and mode <= 66 and mode > mn:
        return mode - 67
    return mode


def intra_pred_angle(mode: int) -> int:
    """spec 8.4.5.2.13 intraPredAngle (parity vvc_intra.c:666-688)."""
    if mode > INTRA_DIAG:
        idx = mode - INTRA_VERT
    elif mode > 0:
        idx = INTRA_HORZ - mode
    else:
        idx = INTRA_HORZ - 2 - mode
    sign = 1
    if idx < 0:
        idx, sign = -idx, -1
    return sign * _ANGLES[idx]


def intra_inv_angle(angle: int) -> int:
    """round(32*512/angle), round-half-away-from-zero."""
    assert angle != 0
    a = abs(angle)
    val = (2 * 16384 + a) // (2 * a)
    return val if angle > 0 else -val


def ref_filter_flag(mode: int) -> bool:
    return mode in (-14, -12, -10, -6, 0, 2, 34, 66, 72, 76, 78, 80)


def nscale(w: int, h: int, mode: int) -> int:
    if mode in (INTRA_PLANAR, INTRA_DC, INTRA_HORZ, INTRA_VERT):
        return (w.bit_length() + h.bit_length() - 4) >> 2
    angle = intra_pred_angle(mode)
    inv = intra_inv_angle(angle)
    side = h if mode >= INTRA_VERT else w
    return min(2, (side.bit_length() - 1) - ((3 * inv - 2).bit_length() - 1) + 8)


def need_pdpc(w: int, h: int, mode: int, ref_idx: int = 0,
              bdpcm: bool = False) -> bool:
    if w >= 4 and h >= 4 and not ref_idx and not bdpcm:
        if mode in (INTRA_PLANAR, INTRA_DC, INTRA_HORZ, INTRA_VERT):
            return True
        if INTRA_HORZ < mode < INTRA_VERT:
            return False
        return nscale(w, h, mode) >= 0
    return False


def classify_mode(mode: int) -> int:
    if mode == INTRA_PLANAR:
        return MC_PLANAR
    if mode == INTRA_DC:
        return MC_DC
    if mode == INTRA_VERT:
        return MC_VERT
    if mode == INTRA_HORZ:
        return MC_HORZ
    return MC_ANG_V if mode >= INTRA_DIAG else MC_ANG_H


# ----------------------------------------------------------------------
# Edge preparation.  Edges are fixed-size int32 vectors with origin OFF:
#   top[OFF + j]  = reference row sample at x0 + j
#   left[OFF + j] = reference col sample at y0 + j
# OFF = 2*MAXS + 8; length 5*MAXS + 16 (covers j in [-(2S+1), 2S] for
# wide-angle reads and negative-angle projections).
# ----------------------------------------------------------------------

def edge_len(maxs: int) -> tuple[int, int]:
    return 5 * maxs + 16, 2 * maxs + 8  # (length, OFF)


def edge_arrays(plane, x0, y0, maxs: int, avail_l, avail_t,
                cand_up_left, mid_val: int, ref_idx=0):
    """Gather + substitute reference samples (parity
    prepare_intra_edge_params, vvc_intra_template.c:467-548).
    ref_idx selects the MRL reference line: edges read row y0-1-r /
    column x0-1-r, and the corner region spans lanes [-1-r, -1]."""
    L, OFF = edge_len(maxs)
    H, W = plane.shape
    r = ref_idx
    # flat 1-D gathers: XLA lowers these to the fast gather path on TPU
    # (2-D advanced indexing does not, and is ~60x slower when vmapped)
    flat = plane.reshape(-1)
    j = jnp.arange(L) - OFF
    joff = jnp.where(j >= 0, jnp.minimum(j, avail_t - 1),
                     jnp.clip(j, -1 - r, -1))

    top_iy = jnp.clip(y0 - 1 - r, 0, H - 1)
    top_raw = flat[top_iy * W + jnp.clip(x0 + joff, 0, W - 1)]
    joff_l = jnp.where(j >= 0, jnp.minimum(j, avail_l - 1),
                       jnp.clip(j, -1 - r, -1))
    left_ix = jnp.clip(x0 - 1 - r, 0, W - 1)
    left_raw = flat[jnp.clip(y0 + joff_l, 0, H - 1) * W + left_ix]

    top0 = flat[top_iy * W + jnp.clip(x0, 0, W - 1)]
    left0 = flat[jnp.clip(y0, 0, H - 1) * W + left_ix]
    fallback = jnp.where(avail_l > 0, left0,
                         jnp.where(avail_t > 0, top0, mid_val))
    top_m1 = jnp.where(cand_up_left > 0,
                       flat[top_iy * W + jnp.clip(x0 - 1, 0, W - 1)],
                       fallback)
    left_m1 = jnp.where(cand_up_left > 0,
                        flat[jnp.clip(y0 - 1, 0, H - 1) * W + left_ix],
                        fallback)

    top = jnp.where(j >= 0,
                    jnp.where(avail_t > 0, top_raw, top_m1),
                    jnp.where(cand_up_left > 0, top_raw, fallback))
    left = jnp.where(j >= 0,
                     jnp.where(avail_l > 0, left_raw, left_m1),
                     jnp.where(cand_up_left > 0, left_raw, fallback))
    return left.astype(jnp.int32), top.astype(jnp.int32)


def ref_filter_121(left, top, OFF: int, left_size, top_size,
                   unfilter_last_one):
    """[1 2 1]/4 reference smoothing (vvc_intra_template.c:450-466)."""
    corner = (left[OFF] + 2 * left[OFF - 1] + top[OFF] + 2) >> 2
    j = jnp.arange(left.shape[0]) - OFF

    def filt(a):
        return (jnp.roll(a, 1) + 2 * a + jnp.roll(a, -1) + 2) >> 2

    nl = left_size - unfilter_last_one
    nt = top_size - unfilter_last_one
    left_o = jnp.where((j >= 0) & (j < nl), filt(left), left)
    top_o = jnp.where((j >= 0) & (j < nt), filt(top), top)
    left_o = left_o.at[OFF - 1].set(corner)
    top_o = top_o.at[OFF - 1].set(corner)
    return left_o, top_o


def project_negative_angle(dst, src, OFF: int, inv_angle, limit, ref_idx=0):
    """Negative-angle projection (vvc_intra_template.c:566-583):
    dst[x-1-r] = src[-1-r + min((x*invAngle + 256) >> 9, limit)],
    x in [-limit, -1)."""
    r = ref_idx
    t = jnp.arange(dst.shape[0]) - OFF
    xx = t + 1 + r
    sidx = OFF - 1 - r + jnp.minimum((xx * inv_angle + 256) >> 9, limit)
    proj = src[jnp.clip(sidx, 0, src.shape[0] - 1)]
    sel = (t >= -limit - 1 - r) & (t <= -2 - r)
    return jnp.where(sel, proj, dst)


# ----------------------------------------------------------------------
# Prediction modes — (maxs, maxs) blocks; valid region (h, w) masked by
# the caller.  w/h/logw/logh are traced scalars.
# ----------------------------------------------------------------------

def pred_planar(top, left, OFF: int, maxs: int, w, h, logw, logh):
    x = jnp.arange(maxs)[None, :]
    y = jnp.arange(maxs)[:, None]
    t = top[OFF + x]
    l = left[OFF + y]
    tr = top[OFF + w]   # top-right
    bl = left[OFF + h]  # bottom-left
    pv = ((h - 1 - y) * t + (y + 1) * bl) << logw
    ph = ((w - 1 - x) * l + (x + 1) * tr) << logh
    return (pv + ph + w * h) >> (logw + logh + 1)


def pred_dc(top, left, OFF: int, maxs: int, w, h):
    i = jnp.arange(maxs)
    sum_t = jnp.sum(jnp.where(i < w, top[OFF + i], 0))
    sum_l = jnp.sum(jnp.where(i < h, left[OFF + i], 0))
    s = jnp.where(w >= h, sum_t, 0) + jnp.where(w <= h, sum_l, 0)
    offset = jnp.maximum(jnp.where(w == h, w << 1, jnp.maximum(w, h)), 1)
    # log2 of a power-of-two (exact in f32 for the sizes involved)
    shift = jnp.int32(jnp.round(jnp.log2(offset.astype(jnp.float32))))
    dc = (s + (offset >> 1)) >> shift
    return jnp.full((maxs, maxs), dc, dtype=jnp.int32)


def pred_v(top, OFF: int, maxs: int):
    return jnp.broadcast_to(top[OFF + jnp.arange(maxs)][None, :],
                            (maxs, maxs)).astype(jnp.int32)


def pred_h(left, OFF: int, maxs: int):
    return jnp.broadcast_to(left[OFF + jnp.arange(maxs)][:, None],
                            (maxs, maxs)).astype(jnp.int32)


def _angular_core(main, OFF: int, maxs: int, angle, filter_flag,
                  is_chroma: bool, clip_max: int, ref_idx=0):
    """For line i (0..maxs-1) produce maxs samples from `main`:
    pos = (i+1+ref_idx)*angle; idx = pos>>5; fact = pos&31 (in the
    line-0 array origin the MRL +ref_idx index shift cancels)."""
    i = jnp.arange(maxs)[:, None]
    x = jnp.arange(maxs)[None, :]
    pos = (i + 1 + ref_idx) * angle
    idx = pos >> 5
    fact = pos & 31

    base = OFF + x + idx
    p = [main[jnp.clip(base + k - 1, 0, main.shape[0] - 1)] for k in range(4)]

    if is_chroma:
        interp = ((32 - fact) * p[1] + fact * p[2] + 16) >> 5
    else:
        ftab = jnp.asarray(INTRA_LUMA_FILTER)
        f = ftab[filter_flag, fact]
        acc = (f[..., 0] * p[0] + f[..., 1] * p[1]
               + f[..., 2] * p[2] + f[..., 3] * p[3] + 32) >> 6
        interp = jnp.clip(acc, 0, clip_max)
    copy = p[1]
    use_copy = (fact == 0) & (is_chroma | (filter_flag == 0))
    return jnp.where(use_copy, copy, interp).astype(jnp.int32)


def pred_angular_v(top, left, OFF: int, maxs: int, w, h, angle, inv_angle,
                   filter_flag, do_pdpc, ns, is_chroma: bool, clip_max: int,
                   ref_idx=0):
    pred = _angular_core(top, OFF, maxs, angle, filter_flag, is_chroma,
                         clip_max, ref_idx)

    def pdpc(pred):
        y = jnp.arange(maxs)[:, None]
        x = jnp.arange(maxs)[None, :]
        inv_sum = 256 + inv_angle * (x + 1)
        lidx = jnp.clip(OFF + y + (inv_sum >> 9), 0, left.shape[0] - 1)
        l = left[lidx]
        wl = 32 >> jnp.minimum((x << 1) >> ns, 31)
        val = jnp.clip(pred + (((l - pred) * wl + 32) >> 6), 0, clip_max)
        lim = jnp.minimum(w, 3 << ns)
        return jnp.where(x < lim, val, pred)

    return jax.lax.cond(do_pdpc > 0, pdpc, lambda p: p, pred)


def pred_angular_h(top, left, OFF: int, maxs: int, w, h, angle, inv_angle,
                   filter_flag, do_pdpc, ns, is_chroma: bool, clip_max: int,
                   ref_idx=0):
    pred = _angular_core(left, OFF, maxs, angle, filter_flag, is_chroma,
                         clip_max, ref_idx).T

    def pdpc(pred):
        y = jnp.arange(maxs)[:, None]
        x = jnp.arange(maxs)[None, :]
        inv_sum = 256 + inv_angle * (y + 1)
        tidx = jnp.clip(OFF + x + (inv_sum >> 9), 0, top.shape[0] - 1)
        t = top[tidx]
        wt = 32 >> jnp.minimum((y * 2) >> ns, 31)
        val = jnp.clip(pred + (((t - pred) * wt + 32) >> 6), 0, clip_max)
        lim = jnp.minimum(h, 3 << ns)
        return jnp.where(y < lim, val, pred)

    return jax.lax.cond(do_pdpc > 0, pdpc, lambda p: p, pred)


def pdpc_hvdc(pred, top, left, OFF: int, maxs: int, logw, logh, mode_class,
              clip_max: int):
    """PDPC for planar/DC/V/H (vvc_intra_template.c:652-683)."""
    scale = (logw + logh - 2) >> 2
    y = jnp.arange(maxs)[:, None]
    x = jnp.arange(maxs)[None, :]
    lv = left[OFF + y + jnp.zeros_like(x)]
    tv = top[OFF + x + jnp.zeros_like(y)]
    corner_l = left[OFF - 1]
    corner_t = top[OFF - 1]
    is_vh = (mode_class == MC_VERT) | (mode_class == MC_HORZ)
    l = jnp.where(is_vh, lv - corner_l + pred, lv)
    t = jnp.where(is_vh, tv - corner_t + pred, tv)
    wl = jnp.where(mode_class == MC_HORZ, 0,
                   32 >> jnp.minimum((x << 1) >> scale, 31))
    wt = jnp.where(mode_class == MC_VERT, 0,
                   32 >> jnp.minimum((y << 1) >> scale, 31))
    out = pred + ((wl * (l - pred) + wt * (t - pred) + 32) >> 6)
    return jnp.clip(out, 0, clip_max)


# ----------------------------------------------------------------------
# MIP — matrix-based intra prediction (spec 8.4.5.2.2; parity pred_mip,
# vvc_intra_template.c:708-825).  One combined matrix bank, padded to
# (30, 64, 8): rows 0..15 = size-id 0 (16x4 used), 16..23 = size-id 1
# (16x8), 24..29 = size-id 2 (64x7).
# ----------------------------------------------------------------------

def _mip_bank() -> np.ndarray:
    bank = np.zeros((30, 64, 8), np.int32)
    m0 = _TABLES["mip_0"].astype(np.int32)   # (16, 16, 4)
    m1 = _TABLES["mip_1"].astype(np.int32)   # (8, 16, 8)
    m2 = _TABLES["mip_2"].astype(np.int32)   # (6, 64, 7)
    bank[0:16, :16, :4] = m0
    bank[16:24, :16, :8] = m1
    bank[24:30, :64, :7] = m2
    return bank


MIP_BANK = _mip_bank()


def _ilog2(v):
    """log2 of a traced power-of-two int (exact in f32 for <= 2^24)."""
    return jnp.int32(jnp.round(jnp.log2(v.astype(jnp.float32))))


def pred_mip(top, left, OFF: int, maxs: int, w, h, mip_id, mip_t, size_id,
             bit_depth: int, clip_max: int):
    """MIP prediction of a (maxs, maxs) block (valid region (h, w)).

    top/left: edge arrays (availability-substituted, unfiltered);
    mip_id: global matrix row; mip_t: transposed flag; size_id: 0..2.
    All of w/h/mip_id/mip_t/size_id are traced scalars.
    """
    bsz = jnp.where(size_id == 0, 2, 4)          # boundarySize
    ps = jnp.where(size_id == 2, 8, 4)           # predSize
    in_size = jnp.where(size_id == 0, 4, jnp.where(size_id == 2, 7, 8))

    jj = jnp.arange(maxs)
    tvals = top[OFF + jj]
    lvals = left[OFF + jj]

    def downsample(vals, n):
        # reduced[i] = (sum of group i + ratio/2) >> log2(ratio)
        ratio = n // bsz
        lg = _ilog2(ratio)
        grp = jj >> lg
        i4 = jnp.arange(4)
        sums = jnp.sum(jnp.where((jj[None, :] < n) & (grp[None, :] ==
                                                      i4[:, None]),
                                 vals[None, :], 0), axis=1)
        return (sums + (ratio >> 1)) >> lg       # (4,)

    red_t = downsample(tvals, w)
    red_l = downsample(lvals, h)

    first = jnp.where(mip_t > 0, red_l, red_t)
    second = jnp.where(mip_t > 0, red_t, red_l)
    i8 = jnp.arange(8)
    r8 = jnp.where(i8 < bsz, first[jnp.clip(i8, 0, 3)],
                   second[jnp.clip(i8 - bsz, 0, 3)])
    temp0 = r8[0]

    # input vector (in-place offsets; vvc_intra_template.c:805-816)
    mid = 1 << (bit_depth - 1)
    v = jnp.where(size_id == 2, r8[jnp.clip(i8 + 1, 0, 7)] - temp0,
                  jnp.where(i8 == 0, mid - temp0, r8 - temp0))
    v = jnp.where(i8 < in_size, v, 0)
    ow = 32 - 32 * jnp.sum(v)

    mat = jnp.asarray(MIP_BANK)[jnp.clip(mip_id, 0, 29)]   # (64, 8)
    predv = ((mat @ v + ow) >> 6) + temp0                  # (64,)
    predv = jnp.clip(predv, 0, clip_max)

    # reduced prediction grid (transposed layout handled here)
    y8 = jnp.arange(8)[:, None]
    x8 = jnp.arange(8)[None, :]
    p8 = predv[jnp.clip(y8 * ps + x8, 0, 63)]
    p8 = jnp.where(mip_t > 0, p8.T, p8)

    # upsampling (mip_upsampling_1d): horizontal over the ps rows that
    # hold predRed, then vertical over all w columns
    uh = w // ps
    uv = h // ps
    lg_h = _ilog2(uh)
    lg_v = _ilog2(uv)

    x = jnp.arange(maxs)[None, :]
    yr = jnp.arange(8)[:, None]
    k = x >> lg_h
    dx = (x & (uh - 1)) + 1
    brow = left[OFF + jnp.clip((yr + 1) * uv - 1, 0, maxs - 1)
                + jnp.zeros_like(x)]
    pa = jnp.where(k == 0, brow,
                   p8[jnp.broadcast_to(yr, (8, maxs)),
                      jnp.clip(jnp.broadcast_to(k - 1, (8, maxs)), 0, 7)])
    pb = p8[jnp.broadcast_to(yr, (8, maxs)),
            jnp.clip(jnp.broadcast_to(k, (8, maxs)), 0, 7)]
    tmp = ((uh - dx) * pa + dx * pb + (uh >> 1)) >> lg_h   # (8, maxs)

    y = jnp.arange(maxs)[:, None]
    ky = y >> lg_v
    dy = (y & (uv - 1)) + 1
    trow = top[OFF + x + jnp.zeros_like(y)]
    ca = jnp.where(ky == 0, trow,
                   tmp[jnp.clip(jnp.broadcast_to(ky - 1, (maxs, maxs)), 0, 7),
                       jnp.broadcast_to(x, (maxs, maxs))])
    cb = tmp[jnp.clip(jnp.broadcast_to(ky, (maxs, maxs)), 0, 7),
             jnp.broadcast_to(x, (maxs, maxs))]
    out = ((uv - dy) * ca + dy * cb + (uv >> 1)) >> lg_v
    return out.astype(jnp.int32)


# ----------------------------------------------------------------------
# CCLM — cross-component linear model (spec 8.4.5.2.14; parity
# intra_cclm_pred, vvc_intra_template.c:29-375).  The luma plane is
# fully reconstructed before chroma recon starts (phase-separated
# pipeline), so the collocated downsample is one whole-plane stencil
# and the boundary picks are small gathers.
# ----------------------------------------------------------------------

CCLM_DIV_SIG = np.array([0, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 1, 1, 0],
                        np.int32)


def cclm_dsy_plane(luma, vc, col_bds=(), row_bds=()):
    """Downsampled collocated luma at chroma resolution (4:2:0), full
    plane (cclm_get_luma_rec_pixels).  Picture-edge clamping at x=0 /
    y=0 reproduces the per-block avail_l/avail_t replication; the
    static interior tile boundaries (col_bds/row_bds, luma samples)
    replicate the same way, since block-level availability never
    crosses a tile.  `vc` is the traced
    sps_chroma_vertical_collocated_flag."""
    lm1 = jnp.concatenate([luma[:, :1], luma[:, :-1]], axis=1)   # x-1
    tm1 = jnp.concatenate([luma[:1, :], luma[:-1, :]], axis=0)   # y-1
    for bx in col_bds:
        lm1 = lm1.at[:, bx].set(luma[:, bx])
    for by in row_bds:
        tm1 = tm1.at[by, :].set(luma[by, :])
    c0 = luma[0::2, 0::2]
    c1 = luma[1::2, 0::2]
    r0 = luma[0::2, 1::2]
    r1 = luma[1::2, 1::2]
    l0 = lm1[0::2, 0::2]
    l1 = lm1[1::2, 0::2]
    t0 = tm1[0::2, 0::2]
    d_vc = (l0 + t0 + 4 * c0 + r0 + c1 + 4) >> 3
    d_6t = (l0 + l1 + 2 * (c0 + c1) + r0 + r1 + 4) >> 3
    return jnp.where(vc > 0, d_vc, d_6t)


def cclm_select_luma(luma, x0, y0, cnt_t, pos, vc, b_ctu, avl, avt):
    """The 4 downsampled boundary luma picks (cclm_select_luma).
    x0/y0: chroma coords; pos: (4,) packed positions (cnt_t top picks
    then left picks); avl/avt: binary luma availability; b_ctu: the
    block starts at a CTU row (line-buffer single-row top filter)."""
    H, W = luma.shape
    flat = luma.reshape(-1)

    def at(yy, xx):
        return flat[jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)]

    i4 = jnp.arange(4)
    is_top = i4 < cnt_t
    lx0, ly0 = 2 * x0, 2 * y0
    # top picks at luma column xa
    xa = lx0 + 2 * pos
    hl = (2 * pos > 0) | (avl > 0)
    lt_r1 = jnp.where(hl, at(ly0 - 1, xa - 1), at(ly0 - 1, xa))
    sel_ctu = (lt_r1 + 2 * at(ly0 - 1, xa) + at(ly0 - 1, xa + 1) + 2) >> 2
    lt_r2 = jnp.where(hl, at(ly0 - 2, xa - 1), at(ly0 - 2, xa))
    sel_vc = (at(ly0 - 3, xa) + lt_r2 + 4 * at(ly0 - 2, xa)
              + at(ly0 - 2, xa + 1) + at(ly0 - 1, xa) + 4) >> 3
    sel_6 = (lt_r2 + lt_r1 + 2 * (at(ly0 - 2, xa) + at(ly0 - 1, xa))
             + at(ly0 - 2, xa + 1) + at(ly0 - 1, xa + 1) + 4) >> 3
    sel_top = jnp.where(b_ctu > 0, sel_ctu,
                        jnp.where(vc > 0, sel_vc, sel_6))
    # left picks at luma row ya, columns lx0-3..lx0-1
    ya = ly0 + 2 * pos
    ht = (2 * pos > 0) | (avt > 0)
    tv = jnp.where(ht, at(ya - 1, lx0 - 2), at(ya, lx0 - 2))
    sel_l_vc = (at(ya, lx0 - 3) + tv + 4 * at(ya, lx0 - 2)
                + at(ya, lx0 - 1) + at(ya + 1, lx0 - 2) + 4) >> 3
    sel_l_6 = (at(ya, lx0 - 3) + at(ya + 1, lx0 - 3)
               + 2 * (at(ya, lx0 - 2) + at(ya + 1, lx0 - 2))
               + at(ya, lx0 - 1) + at(ya + 1, lx0 - 1) + 4) >> 3
    sel_left = jnp.where(vc > 0, sel_l_vc, sel_l_6)
    return jnp.where(is_top, sel_top, sel_left).astype(jnp.int32)


def _cclm_log2(v):
    """floor(log2(v)) for v in [1, 2^12) via compares (branch-free)."""
    acc = jnp.int32(0)
    for k in range(1, 12):
        acc = acc + (v >= (1 << k)).astype(jnp.int32)
    return acc


def cclm_get_params(sel_l, sel_c, n_sel, bit_depth: int):
    """(a, k, b) model parameters for one chroma channel
    (cclm_get_min_max + cclm_get_params).  sel_l/sel_c: (4,) picks
    (already 2-sample-reordered by the caller); n_sel: total picks."""
    mid = 1 << (bit_depth - 1)
    # 4-element min/max network, payload swapped in lockstep
    v = [(sel_l[i], sel_c[i]) for i in range(4)]

    def swap_if(cond, a, b):
        return ((jnp.where(cond, b[0], a[0]), jnp.where(cond, b[1], a[1])),
                (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])))

    mi0, mi1, ma0, ma1 = v[0], v[2], v[1], v[3]
    mi0, mi1 = swap_if(mi0[0] > mi1[0], mi0, mi1)
    ma0, ma1 = swap_if(ma0[0] > ma1[0], ma0, ma1)
    c3 = mi0[0] > ma1[0]
    mi0, ma0 = swap_if(c3, mi0, ma0)
    mi1, ma1 = swap_if(c3, mi1, ma1)
    mi1, ma0 = swap_if(mi1[0] > ma0[0], mi1, ma0)
    max_l = (ma0[0] + ma1[0] + 1) >> 1
    min_l = (mi0[0] + mi1[0] + 1) >> 1
    max_c = (ma0[1] + ma1[1] + 1) >> 1
    min_c = (mi0[1] + mi1[1] + 1) >> 1

    diff = max_l - min_l
    diffc = max_c - min_c
    x = _cclm_log2(jnp.maximum(diff, 1))
    norm_diff = ((diff << 4) >> x) & 15
    x = x + (norm_diff != 0).astype(jnp.int32)
    absc = jnp.abs(diffc)
    y = jnp.where(absc > 0, _cclm_log2(jnp.maximum(absc, 1)) + 1, 0)
    vdiv = jnp.sum(jnp.where(jnp.arange(16) == norm_diff,
                             jnp.asarray(CCLM_DIV_SIG), 0)) | 8
    add = (1 << y) >> 1
    a = (diffc * vdiv + add) >> y
    k = jnp.maximum(1, 3 + x - y)
    sign = jnp.sign(a)
    a = jnp.where((3 + x - y) < 1, sign * 15, a)
    b = min_c - ((a * min_l) >> k)
    # diff == 0 -> flat model; no picks -> mid fill
    a = jnp.where(diff == 0, 0, a)
    k = jnp.where(diff == 0, 0, k)
    b = jnp.where(diff == 0, min_c, b)
    a = jnp.where(n_sel == 0, 0, a)
    k = jnp.where(n_sel == 0, 0, k)
    b = jnp.where(n_sel == 0, mid, b)
    return a, k, b


def cclm_reorder2(sel):
    """cnt==2 pick reorder (cclm_select_samples tail): [s0,s1] ->
    [s1,s0,s1,s0]."""
    return jnp.stack([sel[1], sel[0], sel[1], sel[0]])

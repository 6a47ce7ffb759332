"""DMVR: decoder-side motion vector refinement (spec 8.5.3).

Host-side search mirror of the reference's dmvr_mv_refine
(vvc_inter.c:216-280) + the bilinear interpolation and SAD kernels
(vvc_inter_template.c dmvr*/vvcdsp.c vvc_sad): per 16x16 subblock of a
DMVR CU, build (w+4)x(h+4) 10-bit bilinear predictions for both lists,
scan the 25 integer offsets with 2x-subsampled SAD (mirrored offsets),
then the 3-bit parametric sub-pel division.  Runs on the host because
the refined motion feeds the collocated (TMVP) store that later
frames' CABAC-side derivations read; the sample-level MC itself stays
on device (the refined MVs ship back through the unit controls).
"""
from __future__ import annotations

import numpy as np

BILIN = np.array([[16 - k, k] for k in range(16)], np.int32)


def _bilin_pred(plane, x0, y0, mvx, mvy, w, h, bd):
    """(h+4, w+4) 10-bit bilinear prediction (dmvr/dmvr_h/dmvr_v/
    dmvr_hv, vvc_inter_template.c) with picture-edge clamping."""
    H, W = plane.shape
    mx, my = mvx & 15, mvy & 15
    ox = x0 + (mvx >> 4) - 2
    oy = y0 + (mvy >> 4) - 2
    pw, ph = w + 4, h + 4
    xs = np.clip(ox + np.arange(pw + 1), 0, W - 1)
    ys = np.clip(oy + np.arange(ph + 1), 0, H - 1)
    win = plane[np.ix_(ys, xs)].astype(np.int64)
    s1 = bd - 6
    o1 = 1 << (s1 - 1)
    if mx == 0 and my == 0:
        return win[:ph, :pw] << (10 - bd)
    if my == 0:
        return (BILIN[mx][0] * win[:ph, :pw]
                + BILIN[mx][1] * win[:ph, 1:pw + 1] + o1) >> s1
    if mx == 0:
        return (BILIN[my][0] * win[:ph, :pw]
                + BILIN[my][1] * win[1:ph + 1, :pw] + o1) >> s1
    tmp = (BILIN[mx][0] * win[:, :pw]
           + BILIN[mx][1] * win[:, 1:pw + 1] + o1) >> s1
    return (BILIN[my][0] * tmp[:ph] + BILIN[my][1] * tmp[1:ph + 1] + 8) >> 4


def _sad(t0, t1, dx, dy, w, h):
    """vvc_sad: 2x vertically subsampled, mirrored offsets (dx, dy in
    0..4 around the centre 2)."""
    a = t0[dy:dy + h:2, dx:dx + w]
    b = t1[4 - dy:4 - dy + h:2, 4 - dx:4 - dx + w]
    return int(np.abs(a - b).sum())


def _parametric(s_minus, s_center, s_plus):
    """parametric_mv_refine (vvc_inter.c:185-214): 3-bit restoring
    division of the parabolic offset."""
    denom = ((s_minus + s_plus) - (s_center << 1)) << 3
    if not denom:
        return 0
    if s_minus == s_center:
        return -8
    if s_plus == s_center:
        return 8
    num = (s_minus - s_plus) * 16
    sign = num < 0
    num = abs(num)
    quotient = 0
    for _ in range(3):
        quotient <<= 1
        if num >= denom:
            num -= denom
            quotient += 1
        denom >>= 1
    return -quotient if sign else quotient


def _clip17(v):
    return max(-(1 << 17), min((1 << 17) - 1, int(v)))


def refine_frame(fs, ref_luma):
    """Refine all DMVR CUs of one frame.

    fs: FrameSyntax (cus incl. the dmvr flag + per-CU original motion).
    ref_luma: {poc: (H, W) int32 luma plane} for every reference POC.
    Returns per-4x4 planes (rx0, ry0, rx1, ry1, valid, nobdof) int32.
    """
    pw, ph = fs.width >> 2, fs.height >> 2
    rx0 = np.zeros((ph, pw), np.int32)
    ry0 = np.zeros((ph, pw), np.int32)
    rx1 = np.zeros((ph, pw), np.int32)
    ry1 = np.zeros((ph, pw), np.int32)
    valid = np.zeros((ph, pw), np.int32)
    nobdof = np.zeros((ph, pw), np.int32)
    cus = fs.cus
    bd = fs.bit_depth
    for j in np.nonzero(cus["dmvr"])[0]:
        x0, y0 = int(cus["x0"][j]), int(cus["y0"][j])
        w, h = int(cus["w"][j]), int(cus["h"][j])
        mv = [[int(cus["mv_x"][j]), int(cus["mv_y"][j])],
              [int(cus["mv1_x"][j]), int(cus["mv1_y"][j])]]
        p0 = ref_luma[fs.ref_pocs[0][int(cus["ref_idx"][j])]]
        p1 = ref_luma[fs.ref_pocs[1][int(cus["ref_idx1"][j])]]
        nsx = w >> 4 if w > 16 else 1
        nsy = h >> 4 if h > 16 else 1
        sbw, sbh = w // nsx, h // nsy
        for sy in range(y0, y0 + h, sbh):
            for sx in range(x0, x0 + w, sbw):
                t0 = _bilin_pred(p0, sx, sy, mv[0][0], mv[0][1],
                                 sbw, sbh, bd)
                t1 = _bilin_pred(p1, sx, sy, mv[1][0], mv[1][1],
                                 sbw, sbh, bd)
                min_sad = _sad(t0, t1, 2, 2, sbw, sbh)
                min_sad -= min_sad >> 2
                sad = {(2, 2): min_sad}
                min_dx = min_dy = 2
                dmv = [0, 0]
                if min_sad >= sbw * sbh:
                    for dy in range(5):
                        for dx in range(5):
                            if dx == 2 and dy == 2:
                                continue
                            v = _sad(t0, t1, dx, dy, sbw, sbh)
                            sad[(dy, dx)] = v
                            if v < min_sad:
                                min_sad, min_dx, min_dy = v, dx, dy
                    dmv = [(min_dx - 2) * 16, (min_dy - 2) * 16]
                    if min_dx not in (0, 4) and min_dy not in (0, 4):
                        dmv[0] += _parametric(sad[(min_dy, min_dx - 1)],
                                              sad[(min_dy, min_dx)],
                                              sad[(min_dy, min_dx + 1)])
                        dmv[1] += _parametric(sad[(min_dy - 1, min_dx)],
                                              sad[(min_dy, min_dx)],
                                              sad[(min_dy + 1, min_dx)])
                r0 = (_clip17(mv[0][0] + dmv[0]), _clip17(mv[0][1] + dmv[1]))
                r1 = (_clip17(mv[1][0] - dmv[0]), _clip17(mv[1][1] - dmv[1]))
                cs = (slice(sy >> 2, (sy + sbh) >> 2),
                      slice(sx >> 2, (sx + sbw) >> 2))
                rx0[cs], ry0[cs] = r0
                rx1[cs], ry1[cs] = r1
                valid[cs] = 1
                nobdof[cs] = int(min_sad < 2 * sbw * sbh)
    return rx0, ry0, rx1, ry1, valid, nobdof

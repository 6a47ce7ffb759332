"""Frame reconstruction pipeline: syntax tensors -> decoded planes.

Stage structure (TPU-first, per SURVEY §7):
  1. residual: TUs bucketed by (log2w, log2h); each bucket is a batched
     dequant + inverse-transform matmul pass (MXU), scattered into a
     residual plane.
  2. intra: one jitted sequential pass over CUs in decode order using
     the size-generic masked kernels from ops/intra — a lax.fori_loop
     whose body handles any block geometry, so the whole frame is one
     XLA program (and the body vmaps for wavefront batching later).

Host-side control derivation mirrors the reference's neighbour
availability exactly (vvc_intra.c:591-648) via a reconstructed-sample
bitmap simulation.

Bit-exact vs the reference decode path (vvc_intra.c:432-527).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import intra as I
from ...ops.transform import dequant_itx_batch, dequant_scale_shift
from .host import FrameSyntax

CTRL_KEYS = (
    "x0", "y0", "w", "h", "logw", "logh", "mode_class", "angle", "inv_angle",
    "filter_flag", "smooth", "left_size", "top_size", "unfilter_last_one",
    "do_pdpc", "nscale", "avail_l", "avail_t", "cand_up_left",
    "proj_v", "proj_h", "pf", "m0x", "m0y", "m1x", "m1y",
    "r0slot", "r1slot", "chunk",
    "wden", "w0", "w1", "wo0", "wo1", "hpel", "ciipw",
    "gpm_part", "gpm_tx", "gpm_ty", "gpm_lw", "gpm_lh",
    "hyp0lx", "hyp1lx",
    "w0b", "w1b", "wo0b", "wo1b",
    "corner_src",
    "prof", "pdhx0", "pdhy0", "pdvx0", "pdvy0",
    "pdhx1", "pdhy1", "pdvx1", "pdvy1", "bdof",
    "dmvr", "om0x", "om0y", "om1x", "om1y",
    "mip_id", "mip_t", "mip_sz", "cclm", "cclm_vc",
    "cclm_ct", "cclm_cl", "cclm_p0", "cclm_p1", "cclm_p2", "cclm_p3",
    "mrl")


MC_INTER = 6  # extra mode class: prediction comes from the MC plane
MC_MIP = 7    # matrix-based intra prediction (8.4.5.2.2)
MC_CCLM = 8   # cross-component linear model (8.4.5.2.14)


def predict_units(fs: FrameSyntax, is_chroma: bool) -> list:
  """One (cu_index, x0, y0, w, h, lx0, ly0) per *predict unit*
  (vvc_intra.c:214-241): intra prediction runs per transform block —
  later TBs of a transform-tree-split CU read the reconstructed samples
  of earlier ones — while inter CUs are a single unit."""
  ss = 1 if (is_chroma and fs.chroma_format_idc == 1) else 0
  want_c = 1 if is_chroma else 0
  units = []
  last_inter_cu = -1
  tus, cus = fs.tus, fs.cus
  for j in range(len(tus["x0"])):
    ci = int(tus["cu_index"][j])
    if int(cus["pred_mode"][ci]) == 0:  # MODE_INTER: one unit per CU
      if ci != last_inter_cu:
        last_inter_cu = ci
        lx0, ly0 = int(cus["x0"][ci]), int(cus["y0"][ci])
        units.append((ci, lx0 >> ss, ly0 >> ss, int(cus["w"][ci]) >> ss,
                      int(cus["h"][ci]) >> ss, lx0, ly0))
      continue
    if int(tus["c_idx"][j]) != want_c:
      continue
    x0, y0 = int(tus["x0"][j]), int(tus["y0"][j])
    units.append((ci, x0, y0, int(tus["w"][j]), int(tus["h"][j]),
                  x0 << ss, y0 << ss))
  return units


def derive_cu_controls(fs: FrameSyntax, plane_kind: str, ctb_log2: int) -> dict:
  """Host-side per-predict-unit control arrays for one plane type
  ('y' or 'c'); python mirror of native ctrl::derive (decode.cc)."""
  is_chroma = plane_kind == "c"
  ss = 1 if (is_chroma and fs.chroma_format_idc == 1) else 0
  cus = fs.cus
  units = predict_units(fs, is_chroma)
  n = len(units)
  ctb = 1 << ctb_log2
  pic_w = fs.width >> ss
  pic_h = fs.height >> ss

  out = {k: np.zeros(n, np.int32) for k in CTRL_KEYS}
  # reconstructed-sample bitmap at 2-sample granularity (min block dim)
  g = 2
  recon = np.zeros((pic_h // g, pic_w // g), dtype=bool)

  for i in range(n):
    ci, x0, y0, w, h, lx0, ly0 = units[i]
    if int(cus["pred_mode"][ci]) == 0:  # MODE_INTER
      out["x0"][i] = x0
      out["y0"][i] = y0
      out["w"][i] = w
      out["h"][i] = h
      out["mode_class"][i] = MC_INTER
      out["pf"][i] = cus["pf"][ci]
      out["m0x"][i] = cus["mv_x"][ci]
      out["m0y"][i] = cus["mv_y"][ci]
      out["m1x"][i] = cus["mv1_x"][ci]
      out["m1y"][i] = cus["mv1_y"][ci]
      out["r0slot"][i] = max(0, int(cus["ref_idx"][ci]))
      out["r1slot"][i] = max(0, int(cus["ref_idx1"][ci]))
      recon[y0 // g:(y0 + h) // g, x0 // g:(x0 + w) // g] = True
      continue
    raw_mode = int(cus["chroma_mode"][ci] if is_chroma
                   else cus["luma_mode"][ci])
    bdpcm_key = "bdpcm_c" if is_chroma else "bdpcm_l"
    bdpcm = int(cus[bdpcm_key][ci]) if bdpcm_key in cus else 0
    mode = I.wide_angle_map(raw_mode, w, h)
    mc = I.classify_mode(mode)
    angle = inv = 0
    filter_flag = 0
    pdpc = (not bdpcm) and I.need_pdpc(w, h, mode)
    ns = 0
    if mc in (I.MC_ANG_V, I.MC_ANG_H):
      angle = I.intra_pred_angle(mode)
      inv = I.intra_inv_angle(angle) if angle else 0
      if not is_chroma:
        if I.ref_filter_flag(mode):
          filter_flag = 0
        else:
          min_dist = min(abs(mode - 50), abs(mode - 18))
          thres = [24, 14, 2, 0, 0]
          ntbs = ((w.bit_length() - 1) + (h.bit_length() - 1)) >> 1
          filter_flag = int(min_dist > thres[ntbs - 2])
      if pdpc:
        ns = I.nscale(w, h, mode)
    smooth = int((not is_chroma) and w * h > 32 and I.ref_filter_flag(mode))
    if mc == I.MC_PLANAR:
      left_size, top_size = h + 1 + smooth, w + 1 + smooth
      unfilter_last = 0
      need_l, need_t = h + 1 + smooth, w + 1 + smooth
    elif mc == I.MC_DC:
      left_size, top_size = h, w
      unfilter_last = 1
      need_l, need_t = h, w
    elif mc == I.MC_VERT:
      left_size, top_size = (h if pdpc else 1), w
      unfilter_last = 1
      need_l, need_t = left_size, w
    elif mc == I.MC_HORZ:
      left_size, top_size = h, (w if pdpc else 1)
      unfilter_last = 1
      need_l, need_t = h, top_size
    else:
      left_size, top_size = 2 * h, 2 * w
      unfilter_last = 1
      need_l, need_t = 2 * h, 2 * w

    # --- availability (parity ff_vvc_get_left/top_available) ---
    ctb_rx = lx0 >> ctb_log2
    ctb_ry = ly0 >> ctb_log2
    ctb_left = ctb_rx > 0
    ctb_up = ctb_ry > 0
    end_of_ctb_x = ((lx0 >> ctb_log2) + 1) << ctb_log2
    end_of_ctb_y = ((ly0 >> ctb_log2) + 1) << ctb_log2
    log2_ctb_h = ctb_log2 - ss  # component-domain CTB size
    y0b_c = y0 & ((1 << log2_ctb_h) - 1)
    x0b_c = x0 & ((1 << log2_ctb_h) - 1)

    # top
    if y0b_c == 0:
      avail_t = min(need_t, pic_w - x0) if ctb_up else 0
    else:
      max_x = min(fs.width, end_of_ctb_x) >> ss
      tgt = max(0, min(need_t, max_x - x0))
      run = 0
      ry_ = (y0 - 1) // g
      while run < tgt and recon[ry_, (x0 + run) // g]:
        run += g - ((x0 + run) % g)
      avail_t = min(run, tgt)
    # left
    if x0b_c == 0 and not ctb_left:
      avail_l = 0
    else:
      max_y = min(fs.height, end_of_ctb_y) >> ss
      tgt = max(0, min(need_l, max_y - y0))
      if x0b_c == 0:
        avail_l = tgt
      else:
        run = 0
        cx_ = (x0 - 1) // g
        while run < tgt and recon[(y0 + run) // g, cx_]:
          run += g - ((y0 + run) % g)
        avail_l = min(run, tgt)

    # cand_up_left from LUMA coords (ff_vvc_set_neighbour_available)
    x0b_l = lx0 & (ctb - 1)
    y0b_l = ly0 & (ctb - 1)
    cand_left = ctb_left or x0b_l
    cand_up = ctb_up or y0b_l
    if x0b_l or y0b_l:
      cul = int(bool(cand_left) and bool(cand_up))
    else:
      cul = int(ctb_left and ctb_up)

    recon[y0 // g:(y0 + h) // g, x0 // g:(x0 + w) // g] = True

    vals = dict(
        x0=x0, y0=y0, w=w, h=h, logw=w.bit_length() - 1,
        logh=h.bit_length() - 1, mode_class=mc, angle=angle, inv_angle=inv,
        filter_flag=filter_flag, smooth=smooth, left_size=left_size,
        top_size=top_size, unfilter_last_one=unfilter_last,
        do_pdpc=int(pdpc), nscale=ns, avail_l=avail_l, avail_t=avail_t,
        cand_up_left=cul, proj_v=int(mc == I.MC_ANG_V and angle < 0),
        proj_h=int(mc == I.MC_ANG_H and angle < 0))
    for k, v in vals.items():
      out[k][i] = v
  return out


@functools.partial(jax.jit, static_argnames=("maxs", "is_chroma",
                                             "bit_depth"))
def recon_plane_jit(res_plane, ctrl, inter_pred, *, maxs: int,
                    is_chroma: bool, bit_depth: int):
  """Sequential reconstruction of one plane (intra pred + residual add;
  inter CUs take their prediction from the precomputed MC plane).

  res_plane: (H+maxs, W+maxs) int32 residual plane (padded right/bottom).
  ctrl: dict of (N,) int32 per-CU control arrays.
  inter_pred: same-shape int32 MC prediction plane.
  Returns padded recon plane (caller crops).
  """
  Hp, Wp = res_plane.shape
  maxv = (1 << bit_depth) - 1
  mid = 1 << (bit_depth - 1)
  n = ctrl["x0"].shape[0]
  _, OFF = I.edge_len(maxs)
  plane0 = jnp.full((Hp, Wp), mid, dtype=jnp.int32)

  def body(i, plane):
    x0 = ctrl["x0"][i]
    y0 = ctrl["y0"][i]
    w = ctrl["w"][i]
    h = ctrl["h"][i]
    left, top = I.edge_arrays(plane, x0, y0, maxs, ctrl["avail_l"][i],
                              ctrl["avail_t"][i], ctrl["cand_up_left"][i],
                              mid)

    def do_filter(args):
      l, t = args
      return I.ref_filter_121(l, t, OFF, ctrl["left_size"][i],
                              ctrl["top_size"][i],
                              ctrl["unfilter_last_one"][i])

    left, top = jax.lax.cond(ctrl["smooth"][i] > 0, do_filter,
                             lambda a: a, (left, top))
    top = jax.lax.cond(
        ctrl["proj_v"][i] > 0,
        lambda t: I.project_negative_angle(t, left, OFF,
                                           ctrl["inv_angle"][i], h),
        lambda t: t, top)
    left = jax.lax.cond(
        ctrl["proj_h"][i] > 0,
        lambda l: I.project_negative_angle(l, top, OFF,
                                           ctrl["inv_angle"][i], w),
        lambda l: l, left)

    angle = ctrl["angle"][i]
    inv = ctrl["inv_angle"][i]
    ff = ctrl["filter_flag"][i]
    pdpc = ctrl["do_pdpc"][i]
    ns = ctrl["nscale"][i]
    logw = ctrl["logw"][i]
    logh = ctrl["logh"][i]

    branches = [
        lambda: I.pred_planar(top, left, OFF, maxs, w, h, logw, logh),
        lambda: I.pred_dc(top, left, OFF, maxs, w, h),
        lambda: I.pred_v(top, OFF, maxs),
        lambda: I.pred_h(left, OFF, maxs),
        lambda: I.pred_angular_v(top, left, OFF, maxs, w, h, angle, inv, ff,
                                 pdpc, ns, is_chroma, maxv),
        lambda: I.pred_angular_h(top, left, OFF, maxs, w, h, angle, inv, ff,
                                 pdpc, ns, is_chroma, maxv),
        lambda: jax.lax.dynamic_slice(inter_pred, (y0, x0), (maxs, maxs)),
    ]
    mc = ctrl["mode_class"][i]
    pred = jax.lax.switch(mc, branches)
    pred = jax.lax.cond(
        (pdpc > 0) & (mc < I.MC_ANG_V),
        lambda p: I.pdpc_hvdc(p, top, left, OFF, maxs, logw, logh, mc, maxv),
        lambda p: p, pred)

    res = jax.lax.dynamic_slice(res_plane, (y0, x0), (maxs, maxs))
    old = jax.lax.dynamic_slice(plane, (y0, x0), (maxs, maxs))
    new = jnp.clip(pred + res, 0, maxv)
    yy = jnp.arange(maxs)[:, None]
    xx = jnp.arange(maxs)[None, :]
    blk = jnp.where((yy < h) & (xx < w), new, old).astype(jnp.int32)
    return jax.lax.dynamic_update_slice(plane, blk, (y0, x0))

  return jax.lax.fori_loop(0, n, body, plane0)


def _pad_len(n: int) -> int:
  """Round up to limit the number of shape-specialised XLA programs."""
  p = 16
  while p < n:
    p *= 2
  return p


def _round_up(v: int, m: int) -> int:
  return (v + m - 1) // m * m


def _residual_plane(fs: FrameSyntax, c_idx: int, Hp: int, Wp: int, maxs: int):
  """Bucketed dequant+ITX over this plane's TUs -> padded residual."""
  coeff = (fs.coeff_y, fs.coeff_cb, fs.coeff_cr)[c_idx]
  bd = fs.bit_depth
  sel = np.where((fs.tus["c_idx"] == c_idx) & (fs.tus["coded"] == 1))[0]
  res = jnp.zeros((Hp, Wp), dtype=jnp.int32)
  if len(sel) == 0:
    return res
  x0s = fs.tus["x0"][sel]
  y0s = fs.tus["y0"][sel]
  ws = fs.tus["w"][sel]
  hs = fs.tus["h"][sel]
  qps = fs.tus["qp"][sel]
  for (w, h) in sorted({(int(a), int(b)) for a, b in zip(ws, hs)}):
    idx = np.where((ws == w) & (hs == h))[0]
    lw, lh = w.bit_length() - 1, h.bit_length() - 1
    npad = _pad_len(len(idx))
    # gather blocks (padding = zero blocks scatter-added at the origin)
    blocks = np.zeros((npad, h, w), dtype=np.int32)
    for k, j in enumerate(idx):
      blocks[k] = coeff[y0s[j]:y0s[j] + h, x0s[j]:x0s[j] + w]
    ss_list = [dequant_scale_shift(int(qps[j]), lw, lh, bd) for j in idx]
    scales = np.zeros(npad, np.int32)
    shifts = np.ones(npad, np.int32)
    scales[:len(idx)] = [s for s, _ in ss_list]
    shifts[:len(idx)] = [s for _, s in ss_list]
    out = dequant_itx_batch(jnp.asarray(blocks), jnp.asarray(scales),
                            jnp.asarray(shifts), log2_w=lw, log2_h=lh,
                            bit_depth=bd)
    y0p = np.zeros(npad, np.int32)
    x0p = np.zeros(npad, np.int32)
    y0p[:len(idx)] = y0s[idx]
    x0p[:len(idx)] = x0s[idx]
    yy = (y0p[:, None, None] + np.arange(h)[None, :, None])
    xx = (x0p[:, None, None] + np.arange(w)[None, None, :])
    res = res.at[jnp.asarray(yy), jnp.asarray(xx)].add(out)
  return res


def _inter_pred_plane(fs: FrameSyntax, c_idx: int, Hp: int, Wp: int,
                      refs_by_poc) -> jnp.ndarray:
  """Batched MC over this plane's inter CUs -> padded prediction plane.

  refs_by_poc: dict poc -> [Y, Cb, Cr] numpy planes.
  """
  from ...ops.mc import mc_avg, mc_put_batch, mc_uni_batch

  pred = jnp.zeros((Hp, Wp), dtype=jnp.int32)
  cus = fs.cus
  sel = np.where(cus["pred_mode"] == 0)[0]
  if len(sel) == 0 or not refs_by_poc:
    return pred
  ss = 0 if c_idx == 0 else 1
  x0s = cus["x0"][sel] >> ss
  y0s = cus["y0"][sel] >> ss
  ws = cus["w"][sel] >> ss
  hs = cus["h"][sel] >> ss
  mv = (np.stack([cus["mv_x"][sel], cus["mv_y"][sel]], 1),
        np.stack([cus["mv1_x"][sel], cus["mv1_y"][sel]], 1))
  refi = (cus["ref_idx"][sel], cus["ref_idx1"][sel])
  pf = cus["pf"][sel]

  def ref_plane(lx, ridx):
    poc = fs.ref_pocs[lx][ridx]
    return jnp.asarray(np.asarray(refs_by_poc[poc][c_idx], dtype=np.int32))

  def scatter(pred, xs_n, ys_n, blocks, w, h, n_real):
    npad = blocks.shape[0]
    if npad > n_real:
      mask = np.zeros(npad, bool)
      mask[:n_real] = True
      blocks = blocks * jnp.asarray(mask)[:, None, None]
    yy = ys_n[:, None, None] + np.arange(h)[None, :, None]
    xx = xs_n[:, None, None] + np.arange(w)[None, None, :]
    return pred.at[jnp.asarray(yy), jnp.asarray(xx)].add(blocks)

  for (w, h) in sorted({(int(a), int(b)) for a, b in zip(ws, hs)}):
    size_sel = (ws == w) & (hs == h)
    for kind in ("L0", "L1", "BI"):
      want_pf = {"L0": 1, "L1": 2, "BI": 3}[kind]
      idx = np.where(size_sel & (pf == want_pf))[0]
      if len(idx) == 0:
        continue
      # single ref idx per list for now
      for lx in (0, 1):
        if want_pf & (lx + 1):
          assert np.all(refi[lx][idx] == refi[lx][idx][0])
      npad = _pad_len(len(idx))

      def padded(arr):
        out = np.zeros(npad, np.int32)
        out[:len(idx)] = arr[idx]
        return jnp.asarray(out)

      xs_n = np.zeros(npad, np.int32)
      ys_n = np.zeros(npad, np.int32)
      xs_n[:len(idx)] = x0s[idx]
      ys_n[:len(idx)] = y0s[idx]
      if kind in ("L0", "L1"):
        lx = 0 if kind == "L0" else 1
        ref = ref_plane(lx, int(refi[lx][idx][0]))
        blocks = mc_uni_batch(ref, jnp.asarray(xs_n), jnp.asarray(ys_n),
                              padded(mv[lx][:, 0]), padded(mv[lx][:, 1]),
                              w=w, h=h, is_chroma=c_idx > 0,
                              bit_depth=fs.bit_depth)
      else:
        t = []
        for lx in (0, 1):
          ref = ref_plane(lx, int(refi[lx][idx][0]))
          t.append(mc_put_batch(ref, jnp.asarray(xs_n), jnp.asarray(ys_n),
                                padded(mv[lx][:, 0]), padded(mv[lx][:, 1]),
                                w=w, h=h, is_chroma=c_idx > 0,
                                bit_depth=fs.bit_depth))
        blocks = mc_avg(t[0], t[1], fs.bit_depth)
      pred = scatter(pred, xs_n, ys_n, blocks, w, h, len(idx))
  return pred


def reconstruct_frame(fs: FrameSyntax, refs_by_poc=None) -> list[np.ndarray]:
  """Full frame reconstruction; returns [Y, Cb, Cr] uint8/uint16 planes.

  refs_by_poc: dict poc -> [Y, Cb, Cr] numpy planes (the DPB view).
  """
  assert fs.chroma_format_idc == 1, "4:2:0 only for now"
  bd = fs.bit_depth
  ctb_log2 = 5  # v1 streams use CTU 32
  planes = []
  ctrl_y = derive_cu_controls(fs, "y", ctb_log2)
  ctrl_c = derive_cu_controls(fs, "c", ctb_log2)
  maxs_y = 1 << ctb_log2
  maxs_c = maxs_y >> 1

  padded = []
  for c_idx, (ctrl, maxs) in enumerate(((ctrl_y, maxs_y), (ctrl_c, maxs_c),
                                        (ctrl_c, maxs_c))):
    ss = 0 if c_idx == 0 else 1
    H, W = fs.height >> ss, fs.width >> ss
    # normalise padded dims so XLA programs are shared across stream sizes
    Hp = _round_up(H, 128 >> ss) + maxs
    Wp = _round_up(W, 128 >> ss) + maxs
    res = _residual_plane(fs, c_idx, Hp, Wp, maxs)
    inter_pred = _inter_pred_plane(fs, c_idx, Hp, Wp, refs_by_poc)
    n = len(ctrl["x0"])
    npad = _pad_len(n)
    ctrl_j = {}
    for k, v in ctrl.items():
      vp = np.zeros(npad, np.int32)  # padding CUs have w=h=0: no-ops
      vp[:n] = v
      ctrl_j[k] = jnp.asarray(vp)
    padded.append(recon_plane_jit(res, ctrl_j, inter_pred, maxs=maxs,
                                  is_chroma=c_idx > 0, bit_depth=bd))

  if not fs.deblock_disabled:
    from .deblock_ctrl import deblock_frame
    padded = deblock_frame(fs, padded, ctb_log2, fs.beta_offset,
                           fs.tc_offset)

  if fs.sao is not None and np.any(fs.sao[..., 0:3]):
    from ...ops.sao import sao_plane
    for c_idx in range(3):
      ss = 0 if c_idx == 0 else 1
      padded[c_idx] = sao_plane(
          padded[c_idx],
          jnp.asarray(fs.sao[..., c_idx]),
          jnp.asarray(fs.sao[..., 3 + c_idx]),
          jnp.asarray(fs.sao[..., 9 + 5 * c_idx:9 + 5 * c_idx + 5]),
          jnp.asarray(fs.sao[..., 6 + c_idx]),
          fs.width >> ss, fs.height >> ss,
          ctb=(1 << ctb_log2) >> ss, bit_depth=bd)

  dt = np.uint8 if bd == 8 else np.uint16
  for c_idx, p in enumerate(padded):
    ss = 0 if c_idx == 0 else 1
    H, W = fs.height >> ss, fs.width >> ss
    planes.append(np.asarray(p[:H, :W]).astype(dt))
  return planes

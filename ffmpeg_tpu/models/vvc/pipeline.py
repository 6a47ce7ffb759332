"""Single-program frame decode: one XLA dispatch reconstructs a frame.

The dispatch-latency-bound path (one jit per stage = dozens of host
round trips per frame) is folded into a single compiled program that
takes syntax tensors and reference planes and produces the three
decoded planes:

  coeff planes ──gather──> bucketed dequant+ITX ──scatter──> residual
  ctrl arrays ──> sequential CU loop (intra pred | in-loop MC) ──> recon
  edge grids  ──> deblock V+H ──> SAO ──> planes

Shapes are fixed per stream geometry; per-frame variability (CU count,
bucket occupancy) rides in traced scalars and masks, so every frame of
a stream reuses one compiled executable.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_CONFIGURED = False


def _ensure_compile_cache():
  """Enable the persistent XLA compile cache on TPU backends only:
  this jaxlib's XLA:CPU AOT serialization is unreliable (serialize
  segfaults / deserialize aborts on machine-feature mismatch), so CPU
  runs (tests, virtual meshes) must compile fresh.  Lazy so importing
  the library never initializes a backend."""
  global _CACHE_CONFIGURED
  if _CACHE_CONFIGURED:
    return
  _CACHE_CONFIGURED = True
  try:
    if jax.default_backend() != "tpu":
      return
    cache_dir = os.environ.get(
        "FFMPEG_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
  except Exception:  # noqa: BLE001 - older jax without these knobs
    pass


def _install_atomic_cache_writes():
  """jax's file cache writes entries with a plain write_bytes: a second
  process reading a half-written multi-MB entry aborts the process in
  executable deserialization.  Make writes atomic (tmp + rename) so
  readers only ever see absent or complete entries."""
  try:
    import os

    from jax._src import lru_cache as _lru
  except Exception:  # noqa: BLE001
    return
  if getattr(_lru.LRUCache, "_ffmpeg_tpu_atomic", False):
    return
  orig_put = _lru.LRUCache.put

  def put(self, key, val):
    if self.eviction_enabled:  # locking path: keep jax's behavior
      return orig_put(self, key, val)
    if not key:
      raise ValueError("key cannot be empty")
    cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
    if cache_path.exists():
      return
    tmp = self.path / f"{key}.tmp.{os.getpid()}"
    tmp.write_bytes(val)
    os.replace(str(tmp), str(cache_path))

  _lru.LRUCache.put = put
  _lru.LRUCache._ffmpeg_tpu_atomic = True


_install_atomic_cache_writes()

from ...ops import intra as I
from ...ops.deblock import deblock_vertical_chroma, deblock_vertical_luma
from ...ops.mc import INTERP_CHROMA, INTERP_LUMA
from ...ops.sao import sao_plane
from ...ops.transform import itx_matrix
from .host import FrameSyntax
from .recon import _round_up, derive_cu_controls, CTRL_KEYS, MC_MIP

# fixed TU size buckets per plane kind (w, h); luma min width 8 under the
# mode-type-safe generator, but keep 4-wide for future tools
LUMA_SIZES = [(w, h) for w in (4, 8, 16, 32) for h in (4, 8, 16, 32)]
CHROMA_SIZES = [(w, h) for w in (2, 4, 8, 16, 32) for h in (2, 4, 8, 16, 32)]
# ISP sub-partition TB shapes (1-2 wide/high); only frames that carry
# ISP CUs pay for these extra size classes (program variant keyed on it)
ISP_EXTRA_SIZES = [(1, 16), (1, 32), (2, 8), (2, 16), (2, 32),
                   (8, 2), (16, 2), (32, 2), (16, 1), (32, 1)]
# 64-sample luma TBs (sps_max_luma_transform_size_64_flag): DCT2-only
# with high-frequency zero-out — the coded region is the low
# min(d, 32) x min(d, 32) corner, so 64-dim buckets carry (zh, zw)
# level blocks (ff_vvc_inv_dct2_64 zero-out, vvc_itx_1d.c:375-655)
TB64_EXTRA_SIZES = [(w, 64) for w in (4, 8, 16, 32, 64)] + \
                   [(64, h) for h in (4, 8, 16, 32)]
# ISP sub-partitions of 64-dim CUs (1-2 wide/high x 64)
ISP64_EXTRA_SIZES = [(1, 64), (2, 64), (64, 1), (64, 2)]


def _zo(d):
  """Coded (zero-out) extent of a transform dimension (min(d, 32) for
  the 64-point DCT2; identity below)."""
  return min(d, 32)

MC_CTRL_KEYS = ("pf", "m0x", "m0y", "m1x", "m1y")


_GPM_W_CACHE: dict = {}


def _gpm_weight_plane(part: int, W: int, H: int):
  """Per-CU GPM luma blend weights, sliced from the reference's
  normative tables (pred_gpm_blk, vvc_inter.c:466-496; tables
  vvc_data.c:1998-3486)."""
  key = (part, W, H)
  if key not in _GPM_W_CACHE:
    from ...ops.mc import _TABLES as _T

    aidx = int(_T["gpm_angle_idx"][part])
    wi = int(_T["gpm_angle_to_weights_idx"][aidx])
    mt = int(_T["gpm_angle_to_mirror"][aidx])
    hh, ww = H.bit_length() - 4, W.bit_length() - 4
    ox = int(_T["gpm_weights_offset_x"][part][hh][ww])
    oy = int(_T["gpm_weights_offset_y"][part][hh][ww])
    GW = 112
    wt = _T["gpm_weights"].reshape(6, GW, GW).astype(np.int32)
    y = np.arange(H)[:, None]
    x = np.arange(W)[None, :]
    if mt == 0:
      w = wt[wi][oy + y, ox + x]
    elif mt == 1:
      w = wt[wi][oy + y, GW - 1 - ox - x]
    else:
      w = wt[wi][GW - 1 - oy - y, ox + x]
    _GPM_W_CACHE[key] = np.ascontiguousarray(w)
  return _GPM_W_CACHE[key]


def _gpm_weight_blocks(inter, icap, ss, geom_key, tag, S=32):
  """(gcap, S, S) per-GPM-unit weight tiles + the per-MC-row index."""
  part = inter["gpm_part"]
  sel = np.flatnonzero(part > 0)
  gcap = _ratchet(geom_key, (tag, "gwt"), max(len(sel), 1),
                  max(icap, 1), floor=8)
  gwt = np.zeros((gcap, S, S), np.int32)
  gslot = np.zeros(len(part), np.int32)
  for j, r in enumerate(sel):
    p = int(part[r]) - 1
    W = 1 << int(inter["gpm_lw"][r])
    H = 1 << int(inter["gpm_lh"][r])
    wfull = _gpm_weight_plane(p, W, H)
    tx = int(inter["gpm_tx"][r]) << ss   # luma coords
    ty = int(inter["gpm_ty"][r]) << ss
    h_u = min(S, int(inter["h"][r]))
    w_u = min(S, int(inter["w"][r]))
    ys = ty + (np.arange(h_u) << ss)
    xs = tx + (np.arange(w_u) << ss)
    gwt[j, :h_u, :w_u] = wfull[ys[:, None], xs[None, :]]
    gslot[r] = j
  return gwt, gslot


def _bucket_capacity(W, H, w, h):
  return max(1, (W // w) * (H // h))


# Capacity ratchet: fixed array capacities keyed by stream geometry that
# only ever grow (next power of two covering the demand).  Worst-case
# sizing (every 4x4 a CU) would make the packed input ~50x larger than
# real streams need; ratcheting keeps arrays tight while bounding
# recompiles to O(log n) per geometry.
_CAPS: dict = {}
_CAPS_LOCK = None
_CAPS_LOADED = False
_CAPS_DIRTY = False


def _caps_path():
  import os
  root = os.path.dirname(os.path.dirname(os.path.dirname(
      os.path.dirname(os.path.abspath(__file__)))))
  return os.environ.get("FFMPEG_TPU_RATCHET_PATH",
                        os.path.join(root, ".jax_cache", "ratchet.json"))


def _caps_load_locked():
  """Ratcheted capacities persist across processes: they shape every
  frame program's input signature, so without persistence each fresh
  process ratchets differently and misses the on-disk XLA compile
  cache entirely (measured: 70+ s of recompiles per bench run)."""
  global _CAPS_LOADED
  if _CAPS_LOADED:
    return
  _CAPS_LOADED = True
  import json
  import os
  try:
    with open(_caps_path()) as f:
      for gk, slots in json.load(f).items():
        caps = _CAPS.setdefault(eval(gk), {})  # noqa: S307 - own file
        for sk, cap in slots.items():
          caps[eval(sk)] = max(caps.get(eval(sk), 0), cap)  # noqa: S307
  except (OSError, ValueError, SyntaxError):
    pass


_CAPS_LAST_SAVE = [0.0]
_CAPS_DIRTY_FLAG = [False]


def _caps_flush():
  if _CAPS_DIRTY_FLAG[0] and _CAPS_LOCK is not None:
    with _CAPS_LOCK:
      _CAPS_LAST_SAVE[0] = 0.0
      _caps_save_locked()


def _caps_save_locked():
  import json
  import os
  import time as _time
  if _time.monotonic() - _CAPS_LAST_SAVE[0] < 1.0:
    _CAPS_DIRTY_FLAG[0] = True
    return
  _CAPS_LAST_SAVE[0] = _time.monotonic()
  _CAPS_DIRTY_FLAG[0] = False
  path = _caps_path()
  try:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {repr(gk): {repr(sk): cap for sk, cap in slots.items()}
            for gk, slots in _CAPS.items()}
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
      json.dump(blob, f)
    os.replace(tmp, path)
  except OSError:
    pass


def _ratchet(geom_key, slot, needed, maxcap, floor=64):
  # a violated analytic capacity bound must fail loudly: truncating
  # would silently drop TUs/predict units and corrupt the frame
  assert needed <= maxcap, (
      f"capacity model violated: slot={slot} needed={needed} > {maxcap}")
  global _CAPS_LOCK
  if _CAPS_LOCK is None:
    import atexit
    import threading
    _CAPS_LOCK = threading.Lock()
    atexit.register(_caps_flush)
  with _CAPS_LOCK:
    _caps_load_locked()
    caps = _CAPS.setdefault(geom_key, {})
    cap = caps.get(slot, min(floor, maxcap))
    while cap < needed:
      cap *= 2
    cap = min(cap, maxcap)
    grown = cap > caps.get(slot, -1)
    caps[slot] = max(cap, caps.get(slot, 0))
    if grown:
      _caps_save_locked()
    return caps[slot]




_LFNST_CACHE: dict = {}


def _lfnst_consts(big: bool):
  """Static tables for the inverse LFNST (ilfnst_transform,
  vvc_intra.c:419-480): stacked kernel matrices [8][16][N]
  (set*2 + kernel) and scatter coordinates for the normal and
  transposed output layouts."""
  key = big
  if key not in _LFNST_CACHE:
    from ...encoder.scan import diag_scan
    from ...ops.intra import _TABLES

    mats = _TABLES["lfnst_8x8" if big else "lfnst_4x4"].astype(np.int32)
    mats = mats.reshape(8, 16, mats.shape[-1])  # (set*2+kernel, 16, N)
    sc = diag_scan(4, 4)
    in_x = np.array([p[0] for p in sc], np.int32)
    in_y = np.array([p[1] for p in sc], np.int32)
    oy, ox, ty, tx = [], [], [], []
    if big:
      # rows 0-3: 8 wide; rows 4-7: 4 wide (48 outputs)
      for y in range(8):
        for x in range(8 if y < 4 else 4):
          oy.append(y)
          ox.append(x)
      # transpose layout (vvc_intra.c:441-457): index src by j
      # dst[y][0..3] = src[y + 8*k]; rows 0-3 also cols 4-7 from 32+...
      grid = {}
      for y in range(8):
        for k in range(4):
          grid[(y, k)] = y + 8 * k
        if y < 4:
          for k in range(4):
            grid[(y, 4 + k)] = 32 + y + 4 * k
      # invert: for output j, its (y, x)
      inv = {v: yx for yx, v in grid.items()}
      for j in range(48):
        y, x = inv[j]
        ty.append(y)
        tx.append(x)
    else:
      for y in range(4):
        for x in range(4):
          oy.append(y)
          ox.append(x)
      for j in range(16):
        ty.append(j % 4)
        tx.append(j // 4)
    _LFNST_CACHE[key] = (mats, in_y, in_x,
                         np.array(oy, np.int32), np.array(ox, np.int32),
                         np.array(ty, np.int32), np.array(tx, np.int32))
  return _LFNST_CACHE[key]


def _apply_lfnst(deq, b, w, h, bit_depth):
  """Inverse LFNST on the dequantized coefficients of lfnst TUs
  (wholesale block replace is safe: signaling legality confines the
  parsed coefficients to the gather region)."""
  big = w >= 8 and h >= 8
  mats, in_y, in_x, oy, ox, ty, tx = _lfnst_consts(big)
  # Log2TransformRange is fixed 15 without extended precision
  # (vvc_ps.c:81); the repo rejects the range-extension SPS bits
  del bit_depth
  lim = 1 << 15
  u = deq[:, in_y, in_x]                      # (cap, 16)
  sel = jnp.clip(b["lf_sel"], 0, 7)
  M = jnp.asarray(mats)[sel]                  # (cap, 16, N)
  v = jnp.einsum("ni,nio->no", u, M, preferred_element_type=jnp.int32)
  v = jnp.clip((v + 64) >> 7, -lim, lim - 1)
  blk = jnp.zeros_like(deq)
  norm = blk.at[:, oy, ox].set(v)
  trans = blk.at[:, ty, tx].set(v)
  out = jnp.where(b["lf_tr"][:, None, None] > 0, trans, norm)
  on = (b["lf_sel"] >= 0)[:, None, None]
  return jnp.where(on, out, deq)


# ----------------------------------------------------------------------
# device-side pieces (traced inside the frame program)
# ----------------------------------------------------------------------

def _lmcs_fwd(x, lm, bit_depth):
  """Forward LMCS luma mapping, evaluated piecewise (16 uniform input
  segments) instead of a per-sample LUT gather (lmcs_derive_lut_sample,
  vvc_ps.c:592-598 with pivot1=pivot, pivot2=input_pivot)."""
  shift = bit_depth - 4                 # log2(org_cw)
  idx = x >> shift
  out = jnp.zeros_like(x)
  for i in range(16):
    seg = lm["pivot"][i] + (
        (lm["fwd_scale"][i] * (x - (i << shift)) + (1 << 10)) >> 11)
    out = jnp.where(idx == i, seg, out)
  return jnp.clip(out, 0, (1 << bit_depth) - 1)


def _lmcs_inv(x, lm, bit_depth):
  """Inverse LMCS luma mapping (non-uniform pivots: the bin index is
  the count of passed pivots, mirroring the reference's scan loop at
  vvc_ps.c:656-660).  Requires lmcs_min_bin_idx >= 1 (enforced at
  parse) so the scan index stays within the 16-entry tables."""
  shift = bit_depth - 4
  mb = lm["bins"][0]
  xb = lm["bins"][1]
  idx = jnp.full(x.shape, 0, jnp.int32) + mb
  for j in range(16):
    take = (j >= mb) & (j <= xb)
    idx = idx + jnp.where(take & (x >= lm["pivot"][j + 1]), 1, 0)
  out = jnp.zeros_like(x)
  for i in range(16):
    seg = (i << shift) + (
        (lm["inv_scale"][i] * (x - lm["pivot"][i]) + (1 << 10)) >> 11)
    out = jnp.where(idx == i, seg, out)
  return jnp.clip(out, 0, (1 << bit_depth) - 1)


def _lmcs_vpdu_scales(plane_y, lm, W, H, vsz, bit_depth, tile_bds=((), ())):
  """Per-VPDU chroma residual scale factors from the mapped luma recon
  (lmcs_derive_chroma_scale, vvc_intra_template.c:390-428): average of
  the VPDU's outside-left column and outside-top row (edge-replicated
  to vsz samples within the picture), mapped through the pivot scan.
  Availability is tile-aware (ff_vvc_get_top/left_available): a VPDU
  whose left/top neighbour lies in another tile averages nothing from
  that side.  Returns a flat (nvy*nvx,) int32 scale array."""
  nvx = -(-W // vsz)
  nvy = -(-H // vsz)
  vy = jnp.arange(nvy) * vsz
  vx = jnp.arange(nvx) * vsz
  i = jnp.arange(vsz)
  # left neighbour column x-1, rows y..y+vsz-1 clamped to the picture
  rows = jnp.minimum(vy[:, None] + i[None, :], H - 1)       # (nvy, vsz)
  lcol = plane_y[rows[:, None, :], jnp.maximum(vx - 1, 0)[None, :, None]]
  lsum = jnp.sum(lcol, axis=-1)                             # (nvy, nvx)
  cols = jnp.minimum(vx[:, None] + i[None, :], W - 1)       # (nvx, vsz)
  trow = plane_y[jnp.maximum(vy - 1, 0)[:, None, None], cols[None, :, :]]
  tsum = jnp.sum(trow, axis=-1)
  avail_l = (vx > 0)[None, :]
  avail_t = (vy > 0)[:, None]
  for bx in tile_bds[0]:
    avail_l = avail_l & (vx != bx)[None, :]
  for by in tile_bds[1]:
    avail_t = avail_t & (vy != by)[:, None]
  total = lsum * avail_l + tsum * avail_t
  cnt_log2 = (vsz.bit_length() - 1) + (avail_l & avail_t)
  cnt = (avail_l.astype(jnp.int32) + avail_t) * vsz
  luma = jnp.where(cnt > 0, (total + (cnt >> 1)) >> cnt_log2,
                   1 << (bit_depth - 1))
  mb = lm["bins"][0]
  xb = lm["bins"][1]
  idx = jnp.zeros(luma.shape, jnp.int32) + mb
  for j in range(16):
    take = (j >= mb) & (j <= xb)
    idx = idx + jnp.where(take & (luma >= lm["pivot"][j + 1]), 1, 0)
  idx = jnp.minimum(idx, 15)
  return lm["chroma_scale"][idx.reshape(-1)]


def _bucket_view(b):
    """Named rows of the packed per-bucket scalar matrix (BUCKET_ROWS
    order, filled by vvch_fo_fill_buckets) — free slicing under jit."""
    d = {k: b["mat"][i] for i, k in enumerate(BUCKET_ROWS)}
    d["lv"] = b["lv"]
    d["n"] = b["n"]
    return d


def _bucket_residuals(bm, w, h, bit_depth, is_chroma, chroma_scale=None,
                      sl=None):
    """Dequant + inverse transform for one (w, h) bucket -> (cap, h, w)
    plus the validity mask.  Levels arrive host-gathered per bucket
    (b["lv"]): shipping compact blocks instead of whole coeff planes
    cuts the per-frame host->device transfer ~4x.  chroma_scale, when
    given, is the flat per-VPDU LMCS scale array applied to chroma
    residuals of TBs with more than 4 samples (itransform,
    vvc_intra.c:449-475)."""
    b = _bucket_view(bm)
    n = b["n"]  # traced scalar
    cap = b["x0"].shape[0]
    levels = b["lv"]
    zw, zh = _zo(w), _zo(h)  # coded region (64-point zero-out)
    if sl is not None:
      # explicit scaling lists (derive_scale_m, vvc_intra.c:340-385):
      # per-coefficient m from the TB's Table-38 matrix id, upsampled
      # from the 2/4/8 ScalingMatrixRec by index shifts; DC position
      # overridden by ScalingMatrixDcRec for ids >= 14; -1 = flat 16
      slid = b["slid"]
      mx = max(w, h)
      l2m = 1 if mx == 2 else (2 if mx == 4 else 3)
      log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
      iy = np.minimum((np.arange(zh) << l2m) >> log2h, (1 << l2m) - 1)
      ix = np.minimum((np.arange(zw) << l2m) >> log2w, (1 << l2m) - 1)
      base = sl["rec"][jnp.maximum(slid, 0)]        # (cap, 8, 8)
      m = base[:, iy][:, :, ix]                     # (cap, h, w)
      if mx >= 16:
        dc = sl["dc"][jnp.clip(slid - 14, 0, 13)]
        m = m.at[:, 0, 0].set(jnp.where(slid >= 14, dc, m[:, 0, 0]))
      m = jnp.where(slid[:, None, None] < 0, 16, m)
      scale16 = b["scale"][:, None, None] * m
    else:
      scale16 = (b["scale"] * 16)[:, None, None]
    off = (jnp.int32(1) << b["shift"] >> 1)[:, None, None]
    sh = b["shift"][:, None, None]
    deq = (levels * scale16 + off) >> sh
    deq = jnp.where(levels == 0, 0, jnp.clip(deq, -(1 << 15), (1 << 15) - 1))
    if not is_chroma and w >= 4 and h >= 4:
      deq = _apply_lfnst(deq, b, w, h, bit_depth)
    if w == 1 or h == 1:
      # 1-D TBs (ISP sub-partitions): a single transform pass with
      # shift 6 + range - bd and no intermediate clip (itx_1d,
      # vvcdsp.c:119-138)
      if h == 1:
        if 4 <= w <= 16:
          mh_stack = jnp.asarray(np.stack([itx_matrix("dct2", w),
                                           itx_matrix("dst7", w),
                                           itx_matrix("dct8", w)]))
          mh = mh_stack[b["trh"]]
          out = jnp.einsum("nyk,nxk->nyx", deq, mh,
                           preferred_element_type=jnp.int32)
        else:
          mh = jnp.asarray(itx_matrix("dct2", w)[:, :zw])
          out = jnp.einsum("nyk,xk->nyx", deq, mh,
                           preferred_element_type=jnp.int32)
      else:
        if 4 <= h <= 16:
          mv_stack = jnp.asarray(np.stack([itx_matrix("dct2", h),
                                           itx_matrix("dst7", h),
                                           itx_matrix("dct8", h)]))
          mv = mv_stack[b["trv"]]
          out = jnp.einsum("nyk,nkx->nyx", mv, deq,
                           preferred_element_type=jnp.int32)
        else:
          mv = jnp.asarray(itx_matrix("dct2", h)[:, :zh])
          out = jnp.einsum("yk,nkx->nyx", mv, deq,
                           preferred_element_type=jnp.int32)
      shift1 = 6 + 15 - bit_depth
      out = (out + (1 << (shift1 - 1))) >> shift1
      if (zw, zh) == (w, h):
        out = jnp.where(b["ts"][:, None, None] > 0, deq, out)
      mask = (jnp.arange(cap) < n)[:, None, None]
      return out, mask
    # per-TU transform kind (0=DCT2 1=DST7 2=DCT8, spec 8.7.4 / MTS);
    # DST7/DCT8 exist for 4..32 only — other sizes are always DCT2
    # (64-point is DCT2-only, columns sliced to the coded zh/zw region)
    if 4 <= h <= 32:
      mv_stack = jnp.asarray(np.stack([itx_matrix("dct2", h),
                                       itx_matrix("dst7", h),
                                       itx_matrix("dct8", h)]))
      mv = mv_stack[b["trv"]]  # (cap, h, h)
      tmp = jnp.einsum("nyk,nkx->nyx", mv, deq,
                       preferred_element_type=jnp.int32)
    else:
      mv = jnp.asarray(itx_matrix("dct2", h)[:, :zh])
      tmp = jnp.einsum("yk,nkx->nyx", mv, deq,
                       preferred_element_type=jnp.int32)
    tmp = jnp.clip((tmp + 64) >> 7, -(1 << 15), (1 << 15) - 1)
    if 4 <= w <= 32:
      mh_stack = jnp.asarray(np.stack([itx_matrix("dct2", w),
                                       itx_matrix("dst7", w),
                                       itx_matrix("dct8", w)]))
      mh = mh_stack[b["trh"]]  # (cap, w, w)
      out = jnp.einsum("nyk,nxk->nyx", tmp, mh,
                       preferred_element_type=jnp.int32)
    else:
      mh = jnp.asarray(itx_matrix("dct2", w)[:, :zw])
      out = jnp.einsum("nyk,xk->nyx", tmp, mh,
                       preferred_element_type=jnp.int32)
    shift2 = 5 + 15 - bit_depth
    out = (out + (1 << (shift2 - 1))) >> shift2
    if (zw, zh) == (w, h):
      # transform skip: the dequantized levels ARE the residual
      # (never signalled for 64-point TBs — max_ts_size <= 32)
      out = jnp.where(b["ts"][:, None, None] > 0, deq, out)
    if is_chroma:
      # joint-CbCr derived residual: (r * c_sign) >> shift applied to
      # the post-ITX samples (add_residual_joint, vvcdsp_template.c:48)
      jop = b["jop"][:, None, None]
      sgn = jnp.where((jop == 2) | (jop == 4), -out, out)
      out = jnp.where(jop == 0, out,
                      jnp.where(jop >= 3, sgn >> 1, sgn))
    if is_chroma and chroma_scale is not None and w * h > 4:
      # LMCS chroma residual scaling (lmcs_scale_chroma,
      # vvc_intra_template.c:431-454): after the joint-CbCr sign/shift,
      # matching the reference order for derived components
      # (add_residual_for_joint_coding_chroma, vvc_intra.c:179-182)
      sc = chroma_scale[b["vpdu"]][:, None, None]
      c = jnp.clip(out, -(1 << bit_depth), (1 << bit_depth) - 1)
      mag = (jnp.abs(c) * sc + (1 << 10)) >> 11
      out = jnp.where(c < 0, -mag, mag)
    mask = (jnp.arange(cap) < n)[:, None, None]
    return out, mask


def _residual_from_buckets(buckets, Hp, Wp, bit_depth, sizes, is_chroma,
                           chroma_scale=None, sl=None):
  res = jnp.zeros((Hp, Wp), jnp.int32)
  for (w, h) in sizes:
    b = _bucket_view(buckets[(w, h)])
    out, mask = _bucket_residuals(buckets[(w, h)], w, h, bit_depth,
                                  is_chroma, chroma_scale, sl)
    yy = b["y0"][:, None, None] + jnp.arange(h)[None, :, None]
    xx = b["x0"][:, None, None] + jnp.arange(w)[None, None, :]
    res = res.at[yy, xx].add(out * mask)
  return res


def _residual_blocks_from_buckets(buckets, ncap, bit_depth, sizes,
                                  is_chroma, chroma_scale=None, S=32):
  """Residuals scattered into the per-predict-unit block layout
  (ncap, S, S) consumed by the Pallas recon kernel: every coded TU is
  exactly one unit tile (slot), at unit-local origin (0, 0)."""
  res = jnp.zeros((ncap * S * S,), jnp.int32)
  for (w, h) in sizes:
    b = _bucket_view(buckets[(w, h)])
    out, mask = _bucket_residuals(buckets[(w, h)], w, h, bit_depth,
                                  is_chroma, chroma_scale)
    # invalid rows go out of bounds and are dropped, keeping the live
    # indices unique (slots are 1:1 with coded TUs per plane)
    valid = mask[:, 0, 0] & (b["slot"] >= 0)
    slot = jnp.where(valid, b["slot"], ncap)
    # SbTMVP TUs span several consecutive predict-unit slots (one per
    # 8x8 luma / 4x4 chroma subblock, row-major): redistribute the TU
    # residual to each subblock's slot at its local origin
    sb = jnp.where(b["sbs"] > 0, b["sbs"], S)[:, None, None]
    nx = jnp.maximum(w // sb, 1)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    flat = ((slot[:, None, None] + (yy // sb) * nx + xx // sb) * (S * S)
            + (yy % sb) * S
            + (xx % sb))
    res = res.at[flat.reshape(-1)].add(out.reshape(-1),
                                       mode="drop", unique_indices=True)
  return res.reshape(ncap, S, S)


def _hwrap(xs, W, wrap):
  """Horizontal sample-position clip: reference wraparound (ClipH,
  spec 8.5.6.3.2 / emulated_edge wraparound vvc_inter.c:33-128) when
  wrap > 0, plain edge clamp otherwise."""
  if not wrap:
    return jnp.clip(xs, 0, W - 1)
  xs = jnp.where(xs < 0, xs + wrap, xs)
  xs = jnp.where(xs > W - 1, xs - wrap, xs)
  return jnp.clip(xs, 0, W - 1)


def _mc_block(refs, x0, y0, mvx, mvy, maxs, taps, before, frac_bits,
              bit_depth, slot, hpel=0, win=None, wrap=0):
  """Generic separable MC window for one CU (maxs x maxs), 14-bit out.
  refs: (n_refs, H, W) stacked reference planes; slot selects one.
  win, when given, is a (wx0, wx1, wy0, wy1) sample-clamp window
  (DMVR: reads clamp to the original-MV region, emulated_edge_dmvr)."""
  H, W = refs.shape[1:]
  mask = (1 << frac_bits) - 1
  frac_x = mvx & mask
  frac_y = mvy & mask
  ix = x0 + (mvx >> frac_bits)
  iy = y0 + (mvy >> frac_bits)
  if taps == 4:
    ftab = jnp.asarray(INTERP_CHROMA[0].astype(np.int32))
    hf = ftab[frac_x]
    vf = ftab[frac_y]
  else:
    # bank 1 is the AMVR half-pel alternative filter (hpel_if_idx);
    # bank 2 the affine 6-tap filter (ff_vvc_inter_luma_filters,
    # vvc_data.c:1735; selected via hpel==2 for affine subblock units)
    ftab = jnp.asarray(INTERP_LUMA.astype(np.int32))
    hf = ftab[hpel, frac_x]
    vf = ftab[hpel, frac_y]
  g = maxs + taps - 1
  if win is None:
    xs = _hwrap(ix + jnp.arange(g) - before, W, wrap)
    ys = jnp.clip(iy + jnp.arange(g) - before, 0, H - 1)
  else:
    wx0, wx1, wy0, wy1 = win
    xs = jnp.clip(ix + jnp.arange(g) - before, wx0, wx1)
    ys = jnp.clip(iy + jnp.arange(g) - before, wy0, wy1)
  # flat gather over the stacked ref planes (fast TPU gather path)
  win = refs.reshape(-1)[slot * (H * W) + ys[:, None] * W + xs[None, :]]
  shift1 = bit_depth - 8
  acc = jnp.zeros((g, maxs), jnp.int32)
  for k in range(taps):
    acc = acc + hf[k] * win[:, k:k + maxs]
  tmp = acc >> shift1
  acc = jnp.zeros((maxs, maxs), jnp.int32)
  for k in range(taps):
    acc = acc + vf[k] * tmp[k:k + maxs, :]
  return acc >> 6


# keys consumed by the two batched passes
INTER_KEYS = ("x0", "y0", "w", "h", "pf", "m0x", "m0y", "m1x", "m1y",
              "r0slot", "r1slot", "wden", "w0", "w1", "wo0", "wo1",
              "hpel", "hyp0lx", "hyp1lx",
              "gpm_part", "gpm_tx", "gpm_ty", "gpm_lw", "gpm_lh",
              "w0b", "w1b", "wo0b", "wo1b",
              "prof", "pdhx0", "pdhy0", "pdvx0", "pdvy0",
              "pdhx1", "pdhy1", "pdvx1", "pdvy1", "bdof",
              "dmvr", "om0x", "om0y", "om1x", "om1y")
INTRA_KEYS = ("x0", "y0", "w", "h", "logw", "logh", "mode_class", "angle",
              "inv_angle", "filter_flag", "smooth", "left_size", "top_size",
              "unfilter_last_one", "do_pdpc", "nscale", "avail_l", "avail_t",
              "cand_up_left", "proj_v", "proj_h",
              # CIIP inter-hypothesis motion + blend weight
              "pf", "m0x", "m0y", "m1x", "m1y", "r0slot", "r1slot",
              "wden", "w0", "w1", "wo0", "wo1", "hpel", "ciipw",
              "hyp0lx", "hyp1lx",
              # MIP (8.4.5.2.2)
              "mip_id", "mip_t", "mip_sz",
              # CCLM (8.4.5.2.14)
              "cclm", "cclm_vc", "cclm_ct", "cclm_cl",
              "cclm_p0", "cclm_p1", "cclm_p2", "cclm_p3",
              # MRL (8.4.5.2.5)
              "mrl")

# units per batched group: the device executes groups sequentially and
# the units inside a group as one vmapped batch (host guarantees units
# within an intra chunk are mutually independent; see ctrl::derive)
from .host import CHUNK_CAP  # noqa: E402  (single source of truth)
INTER_CHUNK = 64


def _scatter_blocks(plane, blks, x0, y0, w, h, valid, maxs):
  """Write N disjoint (maxs, maxs) blocks into the plane.  Flat unique
  drop-mode scatter: positions outside each unit's (h, w) mask (and
  invalid units) get an out-of-bounds index and are dropped, so the
  live indices are unique and XLA takes the fast scatter path."""
  Hp, Wp = plane.shape
  d = jnp.arange(maxs)
  mask = ((d[None, :, None] < h[:, None, None])
          & (d[None, None, :] < w[:, None, None])
          & valid[:, None, None])
  flat = ((y0[:, None, None] + d[None, :, None]) * Wp
          + x0[:, None, None] + d[None, None, :])
  flat = jnp.where(mask, flat, Hp * Wp)
  out = plane.reshape(-1).at[flat.reshape(-1)].set(
      blks.reshape(-1), mode="drop", unique_indices=True)
  return out.reshape(Hp, Wp)


def _slice_block(plane, y0, x0, maxs):
  """(maxs, maxs) block read at a traced offset via flat gather (the
  vmapped-dynamic_slice form lowers to a slow gather on TPU)."""
  Wp = plane.shape[1]
  d = jnp.arange(maxs)
  return plane.reshape(-1)[(y0 + d[:, None]) * Wp + x0 + d[None, :]]


def _prof_refine(refs, c, t, lx, bit_depth, wrap=0):
  """PROF (8.5.5.9) on a 4x4 affine subblock unit: pad the 14-bit MC
  block with integer reference samples, 3-tap gradients, then the
  per-sample gradient-dot-dMv refinement (bdof_fetch_samples +
  prof_grad_filter + apply_prof, vvc_inter_template.c:101-208).
  diff_mv is rebuilt from the subblock deltas (vvc_mvs.c:361-380)."""
  on = (c["prof"] >> lx) & 1
  sfx = "1" if lx else "0"
  mvx = c["m1x"] if lx else c["m0x"]
  mvy = c["m1y"] if lx else c["m0y"]
  slot = c["r1slot"] if lx else c["r0slot"]
  H, W = refs.shape[1:]
  ix = c["x0"] + (mvx >> 4) + ((mvx >> 3) & 1) - 1
  iy = c["y0"] + (mvy >> 4) + ((mvy >> 3) & 1) - 1
  xs = _hwrap(ix + jnp.arange(6), W, wrap)
  ys = jnp.clip(iy + jnp.arange(6), 0, H - 1)
  ring = refs.reshape(-1)[slot * (H * W) + ys[:, None] * W + xs[None, :]]
  p = (ring << (14 - bit_depth)).at[1:5, 1:5].set(t[:4, :4])
  gh = (p[1:5, 2:6] >> 6) - (p[1:5, 0:4] >> 6)
  gv = (p[2:6, 1:5] >> 6) - (p[0:4, 1:5] >> 6)
  dhx, dhy = c["pdhx" + sfx], c["pdhy" + sfx]
  dvx, dvy = c["pdvx" + sfx], c["pdvy" + sfx]
  xg = jnp.arange(4)[None, :]
  yg = jnp.arange(4)[:, None]
  rx = xg * (dhx * 4) + yg * (dhy * 4) - 6 * (dhx + dhy)
  ry = xg * (dvx * 4) + yg * (dvy * 4) - 6 * (dvx + dvy)
  dmx = jnp.clip((rx + 128 - (rx >= 0).astype(jnp.int32)) >> 8, -31, 31)
  dmy = jnp.clip((ry + 128 - (ry >= 0).astype(jnp.int32)) >> 8, -31, 31)
  lim = 1 << max(13, bit_depth + 1)
  di = jnp.clip(gh * dmx + gv * dmy, -lim, lim - 1)
  t4 = jnp.where(on > 0, t[:4, :4] + di, t[:4, :4])
  return t.at[:4, :4].set(t4)


def _ilog2(v):
  """floor(log2(v)) for v > 0 (av_log2), exact integer form."""
  b = jnp.int32(0)
  for k in range(1, 21):
    b = b + (v >= (1 << k)).astype(jnp.int32)
  return b


def _bdof_bi(refs, c, t0, t1, bit_depth, maxv, maxs, wins=(None, None),
             wrap=0):
  """BDOF (8.5.6.4/5) for one bi unit (w, h <= 16): integer-ring pad,
  joint gradients, per-4x4 (vx, vy) from 6x6 windows, then the
  per-sample offset (apply_bdof + derive_bdof_vx_vy,
  vvc_inter_template.c:101-128, 256-334)."""
  w, h = c["w"], c["h"]
  H, W = refs.shape[1:]
  d18 = jnp.arange(18)

  def int_ring(mvx, mvy, slot, win):
    ix = c["x0"] + (mvx >> 4) + ((mvx >> 3) & 1) - 1
    iy = c["y0"] + (mvy >> 4) + ((mvy >> 3) & 1) - 1
    if win is None:
      xs = _hwrap(ix + d18, W, wrap)
      ys = jnp.clip(iy + d18, 0, H - 1)
    else:
      wx0, wx1, wy0, wy1 = win
      xs = jnp.clip(ix + d18, wx0, wx1)
      ys = jnp.clip(iy + d18, wy0, wy1)
    return refs.reshape(-1)[slot * (H * W) + ys[:, None] * W
                            + xs[None, :]] << (14 - bit_depth)

  xi = d18[None, :] - 1
  yi = d18[:, None] - 1
  inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
  xc = jnp.clip(xi, 0, w - 1)
  yc = jnp.clip(yi, 0, h - 1)

  def rep(t, stride):  # edge-replicated 18x18 (pad_int16)
    return t.reshape(-1)[(yc * stride + xc).reshape(-1)].reshape(18, 18)

  t0r, t1r = rep(t0, maxs), rep(t1, maxs)
  p0 = jnp.where(inside, t0r,
                 int_ring(c["m0x"], c["m0y"], c["r0slot"], wins[0]))
  p1 = jnp.where(inside, t1r,
                 int_ring(c["m1x"], c["m1y"], c["r1slot"], wins[1]))

  def grad(p):  # 3-tap gradients on the int-ring padded signal
    gh = (p[1:17, 2:18] >> 6) - (p[1:17, 0:16] >> 6)
    gv = (p[2:18, 1:17] >> 6) - (p[0:16, 1:17] >> 6)
    return gh, gv

  gh0, gv0 = grad(p0)
  gh1, gv1 = grad(p1)
  temph = (rep(gh0, 16) + rep(gh1, 16)) >> 1
  tempv = (rep(gv0, 16) + rep(gv1, 16)) >> 1
  diff = (t0r >> 4) - (t1r >> 4)
  off = jnp.zeros((16, 16), jnp.int32)
  for by in range(4):
    for bx in range(4):
      y0b, x0b = by * 4, bx * 4
      wd = diff[y0b:y0b + 6, x0b:x0b + 6]
      wh_ = temph[y0b:y0b + 6, x0b:x0b + 6]
      wv_ = tempv[y0b:y0b + 6, x0b:x0b + 6]
      sgx2 = jnp.sum(jnp.abs(wh_))
      sgy2 = jnp.sum(jnp.abs(wv_))
      sgxgy = jnp.sum(jnp.sign(wv_) * wh_)
      sgxdi = jnp.sum(-jnp.sign(wh_) * wd)
      sgydi = jnp.sum(-jnp.sign(wv_) * wd)
      vx = jnp.where(sgx2 > 0,
                     jnp.clip((sgxdi * 4) >> _ilog2(sgx2), -15, 15), 0)
      vy = jnp.where(sgy2 > 0,
                     jnp.clip(((sgydi * 4) - ((vx * sgxgy) >> 1))
                              >> _ilog2(sgy2), -15, 15), 0)
      bo = (vx * (gh0[y0b:y0b + 4, x0b:x0b + 4]
                  - gh1[y0b:y0b + 4, x0b:x0b + 4])
            + vy * (gv0[y0b:y0b + 4, x0b:x0b + 4]
                    - gv1[y0b:y0b + 4, x0b:x0b + 4]))
      off = off.at[y0b:y0b + 4, x0b:x0b + 4].set(bo)
  shift4 = 15 - bit_depth
  res = jnp.clip((t0[:16, :16] + t1[:16, :16] + (1 << (shift4 - 1)) + off)
                 >> shift4, 0, maxv)
  return jnp.zeros((maxs, maxs), jnp.int32).at[:16, :16].set(res)


def _inter_pred_unit(refs, c, *, maxs, taps, before, frac_bits,
                     bit_depth, maxv, lmcs=None, wb=None, wrap=0):
  """Clipped inter prediction for one unit (vmapped over a batch).
  With lmcs, the clipped luma prediction is forward-mapped into the
  LMCS domain (vvc_inter.c:888-891).  wb, when given, is the unit's
  GPM blend-weight tile (put_gpm, vvc_inter_template.c:78-98)."""
  hp = c.get("hpel", 0) if taps == 8 else 0
  wins = [None, None]
  if "dmvr" in c:
    H, W = refs.shape[1:]
    eb, ea = (3, 4) if taps == 8 else (1, 2)
    on = c["dmvr"] > 0

    def dmvr_win(lx):
      om_x = c["om1x"] if lx else c["om0x"]
      om_y = c["om1y"] if lx else c["om0y"]
      xsb = c["x0"] + (om_x >> frac_bits)
      ysb = c["y0"] + (om_y >> frac_bits)
      wx0 = jnp.clip(xsb - eb, 0, W - 1)
      wx1 = wx0 + jnp.maximum(jnp.minimum(W, xsb + c["w"] + ea) - wx0, 1) - 1
      wy0 = jnp.clip(ysb - eb, 0, H - 1)
      wy1 = wy0 + jnp.maximum(jnp.minimum(H, ysb + c["h"] + ea) - wy0, 1) - 1
      return (jnp.where(on, wx0, 0), jnp.where(on, wx1, W - 1),
              jnp.where(on, wy0, 0), jnp.where(on, wy1, H - 1))

    wins = [dmvr_win(0), dmvr_win(1)]
  t0 = _mc_block(refs, c["x0"], c["y0"], c["m0x"], c["m0y"], maxs, taps,
                 before, frac_bits, bit_depth, c["r0slot"], hp, wins[0],
                 wrap)
  t1 = _mc_block(refs, c["x0"], c["y0"], c["m1x"], c["m1y"], maxs, taps,
                 before, frac_bits, bit_depth, c["r1slot"], hp, wins[1],
                 wrap)
  if taps == 8 and "prof" in c:
    t0 = _prof_refine(refs, c, t0, 0, bit_depth, wrap)
    t1 = _prof_refine(refs, c, t1, 1, bit_depth, wrap)
  # uni: put_uni rounding on the used list; bi: avg
  shift2 = 14 - bit_depth
  off2 = 1 << (shift2 - 1)
  uni = jnp.where(c["pf"] == 1, t0, t1)
  uni = jnp.clip((uni + off2) >> shift2, 0, maxv)
  sh_avg = max(3, 15 - bit_depth)
  bi = jnp.clip((t0 + t1 + (1 << (sh_avg - 1))) >> sh_avg, 0, maxv)
  if taps == 8 and "bdof" in c:
    bi = jnp.where(c["bdof"] > 0,
                   _bdof_bi(refs, c, t0, t1, bit_depth, maxv, maxs,
                            wins, wrap), bi)
  if "wden" in c:
    # explicit uni weighting (put_uni_w, h2656_inter_template.c:60-85)
    wden = c["wden"]
    wd = jnp.maximum(wden, 0)
    shu = wd + 14 - bit_depth
    t_act = jnp.where(c["pf"] == 1, t0, t1)
    uni_w = jnp.clip(((t_act * c["w0"] + (jnp.int32(1) << shu >> 1))
                      >> shu) + (c["wo0"] << (bit_depth - 8)), 0, maxv)
    uni = jnp.where(wden >= 0, uni_w, uni)
  if "wden" in c:
    # weighted bi prediction (w_avg, vvc_inter_template.c:42-58):
    # covers BCW and explicit weighted bipred
    wden = c["wden"]
    # clamp: wden is -1 for default-average units (result unused there,
    # but a negative shift amount must never be formed)
    shw = jnp.maximum(wden, 0) + max(3, 15 - bit_depth)
    offw = (((c["wo0"] + c["wo1"]) << (bit_depth - 8)) + 1) << (shw - 1)
    bi_w = jnp.clip((t0 * c["w0"] + t1 * c["w1"] + offw) >> shw, 0, maxv)
    bi = jnp.where(wden >= 0, bi_w, bi)
  pred = jnp.where(c["pf"] == 3, bi, uni)
  if wb is not None:
    sh_g = max(5, 17 - bit_depth)
    wbm = wb[:maxs, :maxs]
    gp = jnp.clip((t0 * wbm + t1 * (8 - wbm) + (1 << (sh_g - 1))) >> sh_g,
                  0, maxv)
    pred = jnp.where(c["gpm_part"] > 0, gp, pred)
  if lmcs is not None:
    pred = _lmcs_fwd(pred, lmcs, bit_depth)
  return pred


def _inter_unit(res_plane, refs, c, *, maxs, taps, before, frac_bits,
                bit_depth, maxv, lmcs=None, wb=None, wrap=0):
  """Prediction + residual for one inter unit (vmapped over a chunk)."""
  pred = _inter_pred_unit(refs, c, maxs=maxs, taps=taps, before=before,
                          frac_bits=frac_bits, bit_depth=bit_depth,
                          maxv=maxv, lmcs=lmcs, wb=wb, wrap=wrap)
  res = _slice_block(res_plane, c["y0"], c["x0"], maxs)
  return jnp.clip(pred + res, 0, maxv)


def _cclm_unit(c, top, left, cclm, OFF, maxs, bit_depth, maxv):
  """CCLM prediction for one chroma unit (8.4.5.2.14): boundary picks
  from the unit's own edge vectors (chroma) and the reconstructed luma
  plane, min/max model fit, apply to the downsampled collocated luma."""
  luma, dsy, _vc_inp = cclm
  x0, y0 = c["x0"], c["y0"]
  vc = c["cclm_vc"] & 1
  b_ctu = (c["cclm_vc"] >> 1) & 1
  cnt_t, cnt_l = c["cclm_ct"], c["cclm_cl"]
  pos = jnp.stack([c["cclm_p0"], c["cclm_p1"], c["cclm_p2"], c["cclm_p3"]])
  n_sel = cnt_t + cnt_l
  sel_l = I.cclm_select_luma(luma, x0, y0, cnt_t, pos, vc, b_ctu,
                             (c["cclm_vc"] >> 2) & 1,
                             (c["cclm_vc"] >> 3) & 1)
  i4 = jnp.arange(4)
  sel_c = jnp.where(i4 < cnt_t, top[OFF + pos], left[OFF + pos])
  sel_l = jnp.where(n_sel == 2, I.cclm_reorder2(sel_l), sel_l)
  sel_c = jnp.where(n_sel == 2, I.cclm_reorder2(sel_c), sel_c)
  a, k, b = I.cclm_get_params(sel_l, sel_c, n_sel, bit_depth)
  blk = jax.lax.dynamic_slice(dsy, (y0, x0), (maxs, maxs))
  return jnp.clip(((blk * a) >> k) + b, 0, maxv)


def _intra_unit(plane, res_plane, c, *, maxs, is_chroma, bit_depth, maxv,
                mid, OFF, refs=None, lmcs=None, cclm=None, wrap=0):
  """Prediction + residual for one intra unit (vmapped over a chunk);
  reads reconstructed neighbour samples from the current plane."""
  w, h = c["w"], c["h"]
  mrl = c["mrl"] if not is_chroma else 0
  left, top = I.edge_arrays(plane, c["x0"], c["y0"], maxs, c["avail_l"],
                            c["avail_t"], c["cand_up_left"], mid,
                            ref_idx=mrl)

  def do_filter(args):
    l, t = args
    return I.ref_filter_121(l, t, OFF, c["left_size"], c["top_size"],
                            c["unfilter_last_one"])

  left, top = jax.lax.cond(c["smooth"] > 0, do_filter, lambda a: a,
                           (left, top))
  top = jax.lax.cond(
      c["proj_v"] > 0,
      lambda t: I.project_negative_angle(t, left, OFF, c["inv_angle"], h,
                                         ref_idx=mrl),
      lambda t: t, top)
  left = jax.lax.cond(
      c["proj_h"] > 0,
      lambda l: I.project_negative_angle(l, top, OFF, c["inv_angle"], w,
                                         ref_idx=mrl),
      lambda l: l, left)

  angle, inv = c["angle"], c["inv_angle"]
  ff, pdpc, ns = c["filter_flag"], c["do_pdpc"], c["nscale"]
  logw, logh = c["logw"], c["logh"]
  branches = [
      lambda: I.pred_planar(top, left, OFF, maxs, w, h, logw, logh),
      lambda: I.pred_dc(top, left, OFF, maxs, w, h),
      lambda: I.pred_v(top, OFF, maxs),
      lambda: I.pred_h(left, OFF, maxs),
      lambda: I.pred_angular_v(top, left, OFF, maxs, w, h, angle, inv, ff,
                               pdpc, ns, is_chroma, maxv, ref_idx=mrl),
      lambda: I.pred_angular_h(top, left, OFF, maxs, w, h, angle, inv, ff,
                               pdpc, ns, is_chroma, maxv, ref_idx=mrl),
      lambda: jnp.zeros((maxs, maxs), jnp.int32),  # 6 = MC_INTER (unused)
      lambda: I.pred_mip(top, left, OFF, maxs, w, h, c["mip_id"],
                         c["mip_t"], c["mip_sz"], bit_depth, maxv),
  ]
  if cclm is not None:
    branches.append(lambda: _cclm_unit(c, top, left, cclm, OFF, maxs,
                                       bit_depth, maxv))
  mc = c["mode_class"]
  pred = jax.lax.switch(mc, branches)
  pred = jax.lax.cond(
      (pdpc > 0) & (mc < I.MC_ANG_V),
      lambda p: I.pdpc_hvdc(p, top, left, OFF, maxs, logw, logh, mc, maxv),
      lambda p: p, pred)
  if refs is not None:
    # CIIP blend (put_ciip, vvc_inter_template.c:60-76): the inter
    # hypothesis comes from the unit's own motion controls
    mcb = _inter_pred_unit(refs, c, maxs=maxs,
                           taps=4 if is_chroma else 8,
                           before=1 if is_chroma else 3,
                           frac_bits=5 if is_chroma else 4,
                           bit_depth=bit_depth, maxv=maxv,
                           lmcs=lmcs if not is_chroma else None,
                           wrap=wrap)
    cw = c["ciipw"]
    pred = jnp.where(cw > 0, (pred * cw + mcb * (4 - cw) + 2) >> 2, pred)
  res = _slice_block(res_plane, c["y0"], c["x0"], maxs)
  return jnp.clip(pred + res, 0, maxv)


def _recon_plane(res_plane, inter, n_inter, intra, n_chunks, refs, *,
                 maxs_inter, maxs_intra, is_chroma, bit_depth, lmcs=None,
                 cr_weights=False, cclm=None, wrap=0):
  """Batched reconstruction of one plane.

  Replaces the reference's per-CTU RECON/INTER task stages
  (vvc_thread.c:432-463) with two bulk passes: all inter units run as
  vmapped batches (no intra-frame sample deps), then intra units run
  as a sequential loop over wavefront chunks — each chunk a vmapped
  batch of mutually independent units (the TPU form of the CTU
  wavefront, SURVEY §2.5 P2).
  """
  Hp, Wp = res_plane.shape
  maxv = (1 << bit_depth) - 1
  mid = 1 << (bit_depth - 1)
  _, OFF = I.edge_len(maxs_intra)
  plane0 = jnp.full((Hp, Wp), mid, dtype=jnp.int32)
  taps = 4 if is_chroma else 8
  before = 1 if is_chroma else 3
  frac_bits = 5 if is_chroma else 4

  def inter_chunk(s, plane):
    off = s * INTER_CHUNK
    c = {k: jax.lax.dynamic_slice(inter[k], (off,), (INTER_CHUNK,))
         for k in INTER_KEYS}
    if cr_weights:
      for a, b in (("w0", "w0b"), ("w1", "w1b"),
                   ("wo0", "wo0b"), ("wo1", "wo1b")):
        c[a] = jax.lax.dynamic_slice(inter[b], (off,), (INTER_CHUNK,))
    gsl = jax.lax.dynamic_slice(inter["gslot"], (off,), (INTER_CHUNK,))
    wbs = inter["gwt"][gsl]
    blks = jax.vmap(lambda cc, wb1: _inter_unit(
        res_plane, refs, cc, wrap=wrap, maxs=maxs_inter, taps=taps,
        before=before,
        frac_bits=frac_bits, bit_depth=bit_depth, maxv=maxv,
        lmcs=lmcs, wb=wb1))(c, wbs)
    valid = off + jnp.arange(INTER_CHUNK) < n_inter
    return _scatter_blocks(plane, blks, c["x0"], c["y0"], c["w"], c["h"],
                           valid, maxs_inter)

  n_ichunks = (n_inter + INTER_CHUNK - 1) // INTER_CHUNK
  plane = jax.lax.fori_loop(0, n_ichunks, inter_chunk, plane0)

  def intra_chunk(s, plane):
    off = intra["ioff"][s]
    end = intra["iend"][s]
    c = {k: jax.lax.dynamic_slice(intra[k], (off,), (CHUNK_CAP,))
         for k in INTRA_KEYS}
    blks = jax.vmap(lambda cc: _intra_unit(
        plane, res_plane, cc, maxs=maxs_intra, is_chroma=is_chroma,
        bit_depth=bit_depth, maxv=maxv, mid=mid, OFF=OFF,
        refs=refs, lmcs=lmcs, cclm=cclm, wrap=wrap))(c)
    # the slice window is CHUNK_CAP wide but only [off, end) belongs to
    # chunk s; the overlap prefix of chunk s+1 is masked off here and
    # reconstructed (correctly) on the next iteration
    valid = (off + jnp.arange(CHUNK_CAP) < end) & (c["w"] > 0)
    return _scatter_blocks(plane, blks, c["x0"], c["y0"], c["w"], c["h"],
                           valid, maxs_intra)

  return jax.lax.fori_loop(0, n_chunks, intra_chunk, plane)


def _use_pallas() -> bool:
  """Opt-in only.  The sequential decode-order Pallas recon kernel was
  measured (round 2, real chip) at 453 s compile + ~1 s/frame at 64x64
  — orders of magnitude behind the batched-XLA frame program (7 fps at
  720p).  Until the kernel beats the XLA path in an on-TPU A/B, the
  batched-XLA program is the default on every backend.
  FFMPEG_TPU_PALLAS=1 opts in (interpret mode on CPU, Mosaic on TPU);
  FFMPEG_TPU_NO_PALLAS=1 force-disables it."""
  import os
  if os.environ.get("FFMPEG_TPU_NO_PALLAS"):
    return False
  return bool(os.environ.get("FFMPEG_TPU_PALLAS"))


def _build_frame_program(shapes):
  """Returns the jitted frame program for a given stream geometry.

  shapes: dict with W, H, ctb_log2, bit_depth, chroma (bool).
  """
  W, H = shapes["W"], shapes["H"]
  bd = shapes["bit_depth"]
  ctb_log2 = shapes["ctb_log2"]
  use_pallas = shapes["pallas"]
  tile_bds = shapes.get("tile_bds", ((), ()))
  tb64 = shapes.get("tb64", False)
  mono = shapes.get("mono", False)   # 4:0:0: luma plane only
  wrap = shapes.get("wrap", 0)       # horizontal ref wraparound (luma)
  maxs_y = 1 << ctb_log2
  maxs_c = maxs_y >> 1
  # intra predict units are transform blocks: <= 32 normally, <= 64 on
  # sps_max_luma_transform_size_64_flag streams (luma only; 4:2:0
  # chroma TBs stay <= 32).  Inter MC units always tile to <= 32.
  maxs_intra_y = min(64 if tb64 else 32, maxs_y)
  Hp_y = _round_up(H, 128) + maxs_y
  Wp_y = _round_up(W, 128) + maxs_y
  Hp_c = _round_up(H >> 1, 64) + maxs_c
  Wp_c = _round_up(W >> 1, 64) + maxs_c

  def _cropped_refs(refs_in, c_idx):
    ss = 0 if c_idx == 0 else 1
    # refs arrive padded (device-resident DPB planes); crop to pic size
    # [L0 slots..., L1 slots...] per plane, variable count per stream
    return jnp.stack([r[:H >> ss, :W >> ss] for r in refs_in[c_idx]])

  vsz = min(1 << ctb_log2, 64)   # LMCS chroma-scale VPDU size

  def _pred_blocks(inp, refs_in, c_idx, lm):
    """Compacted inter-MC prediction tiles for the Pallas path."""
    S = 32
    if "has_inter" not in inp:
      return jnp.zeros((1, S, S), jnp.int32)
    ct = inp["ctrl"]["y" if c_idx == 0 else "c"]
    refs = _cropped_refs(refs_in, c_idx)
    is_c = c_idx > 0
    cc = {k: ct["inter"][k] for k in INTER_KEYS}
    if c_idx == 2:
      # Cr uses the second weight set of the shared chroma controls
      for a, b in (("w0", "w0b"), ("w1", "w1b"),
                   ("wo0", "wo0b"), ("wo1", "wo1b")):
        cc[a] = ct["inter"][b]
    wb_all = ct["inter"]["gwt"][ct["inter"]["gslot"]]
    return jax.vmap(lambda c1, wb1: _inter_pred_unit(
        refs, c1, maxs=S, taps=4 if is_c else 8,
        before=1 if is_c else 3, frac_bits=5 if is_c else 4,
        bit_depth=bd, maxv=(1 << bd) - 1,
        lmcs=lm if c_idx == 0 else None, wb=wb1))(cc, wb_all)

  def _recon_pallas(inp, refs_in, lm, crs):
    """Whole-frame recon via the Pallas decode-order unit kernel:
    luma first (in the LMCS-mapped domain when enabled), then the
    chroma kernel with LMCS residual scaling from the mapped luma."""
    from ...ops.recon_pallas import recon_plane_pallas

    mid = 1 << (bd - 1)
    ry, rc = inp["recon"]["y"], inp["recon"]["c"]
    has_mip = "has_mip" in inp["recon"]  # static: keys shape the program
    has_mrl = "has_mrl" in inp["recon"]
    res_y = _residual_blocks_from_buckets(
        inp["planes"][0]["buckets"], ry["ctrl"].shape[1], bd,
        LUMA_SIZES, False)
    ky = recon_plane_pallas(ry["ctrl"], ry["n"], ry["ipos"], res_y,
                            _pred_blocks(inp, refs_in, 0, lm),
                            W=W, H=H, nch=1, bit_depth=bd, is_chroma=False,
                            has_mip=has_mip, has_mrl=has_mrl)
    scale = (_lmcs_vpdu_scales(ky[0][:H, :W], lm, W, H, vsz, bd,
                              tile_bds)
             if crs else None)
    ncap_c = rc["ctrl"].shape[1]
    res_c = [_residual_blocks_from_buckets(
        inp["planes"][c]["buckets"], ncap_c, bd, CHROMA_SIZES, True,
        scale) for c in (1, 2)]
    has_cclm = "cclm_vc" in inp  # static: keys shape the program
    sel_luma = dsy = None
    if has_cclm:
      # CCLM reads the (mapped-domain) reconstructed luma: whole-plane
      # collocated downsample + the per-unit boundary luma picks
      vc = inp["cclm_vc"]
      luma_p = ky[0]
      dsy = I.cclm_dsy_plane(luma_p, vc, tile_bds[0], tile_bds[1])
      K = CTRL_KEYS.index
      cm = rc["ctrl"]

      def sel_one(col):
        pos = col[K("cclm_p0"):K("cclm_p3") + 1]
        return I.cclm_select_luma(
            luma_p, col[K("x0")], col[K("y0")], col[K("cclm_ct")], pos,
            col[K("cclm_vc")] & 1, (col[K("cclm_vc")] >> 1) & 1,
            (col[K("cclm_vc")] >> 2) & 1,
            (col[K("cclm_vc")] >> 3) & 1)

      sel_luma = jax.vmap(sel_one, in_axes=1, out_axes=1)(cm)
    kc = recon_plane_pallas(rc["ctrl"], rc["n"], rc["ipos"],
                            jnp.stack(res_c, axis=1),
                            jnp.stack([_pred_blocks(inp, refs_in, c, lm)
                                       for c in (1, 2)], axis=1),
                            W=W >> 1, H=H >> 1, nch=2, bit_depth=bd,
                            is_chroma=True, has_cclm=has_cclm,
                            sel_luma=sel_luma, dsy=dsy)
    luma = _lmcs_inv(ky[0], lm, bd) if lm is not None else ky[0]

    def embed(kp, Hx, Wx, Hp, Wp):
      return jnp.pad(kp[:Hx, :Wx], ((0, Hp - Hx), (0, Wp - Wx)),
                     constant_values=mid)

    return [embed(luma, H, W, Hp_y, Wp_y),
            embed(kc[0], H >> 1, W >> 1, Hp_c, Wp_c),
            embed(kc[1], H >> 1, W >> 1, Hp_c, Wp_c)]

  def _alf_pass(planes, a):
    """deblock -> SAO -> ALF: the last in-loop stage
    (ff_vvc_alf_filter, vvc_filter.c:1254-1320)."""
    from ...ops.alf import (TRANSPOSE_IDX, alf_classify, alf_filter_cc,
                            alf_filter_chroma, alf_filter_luma)

    ctb_sz = 1 << ctb_log2
    ly0 = planes[0][:H, :W]
    cls, tr = alf_classify(ly0, ctb_sz, bd)
    nby, nbx = H // 4, W // 4
    cb_by = (jnp.arange(nby) * 4) >> ctb_log2
    cb_bx = (jnp.arange(nbx) * 4) >> ctb_log2
    ctb_blk = a["ctb"][cb_by[:, None], cb_bx[None, :]]      # (nby,nbx,8)
    bank = ctb_blk[..., 1]
    coeff12 = a["banks_coeff"][bank, cls]                   # (nby,nbx,12)
    clip12 = a["banks_clipv"][bank, cls]
    perm = jnp.asarray(TRANSPOSE_IDX)[tr]
    coeff12 = jnp.take_along_axis(coeff12, perm, axis=-1)
    clip12 = jnp.take_along_axis(clip12, perm, axis=-1)
    ly1 = alf_filter_luma(ly0, coeff12, clip12, ctb_sz,
                          ctb_blk[..., 0] > 0, bd)
    out = [planes[0].at[:H, :W].set(ly1)]
    if mono:
      return out
    Hc, Wc = H >> 1, W >> 1
    yc = jnp.arange(Hc) >> (ctb_log2 - 1)
    xc = jnp.arange(Wc) >> (ctb_log2 - 1)
    for c in (1, 2):
      pc = planes[c][:Hc, :Wc]
      flag = a["ctb"][..., 2 * c][yc[:, None], xc[None, :]]
      alt = a["ctb"][..., 2 * c + 1][yc[:, None], xc[None, :]]
      coeff6 = jnp.zeros((Hc, Wc, 6), jnp.int32)
      clip6 = jnp.zeros((Hc, Wc, 6), jnp.int32)
      for al in range(8):
        sel = (alt == al)[..., None]
        coeff6 = jnp.where(sel, a["chroma_coeff"][al], coeff6)
        clip6 = jnp.where(sel, a["chroma_clipv"][al], clip6)
      pc = alf_filter_chroma(pc, coeff6, clip6, ctb_sz >> 1,
                             flag > 0, bd)
      idc = a["ctb"][..., 5 + c][yc[:, None], xc[None, :]]
      cc7 = jnp.zeros((Hc, Wc, 7), jnp.int32)
      for k in range(5):
        cc7 = jnp.where((idc == k)[..., None], a["cc_coeff"][c - 1, k],
                        cc7)
      pc = alf_filter_cc(pc, ly0, cc7, ctb_sz, idc > 0, bd)
      out.append(planes[c].at[:Hc, :Wc].set(pc))
    return out

  def frame_program(inp, refs_in):
    lm = inp.get("lmcs")
    crs = lm is not None and "chroma_scale" in lm
    if use_pallas:
      planes = _recon_pallas(inp, refs_in, lm, crs)
    else:
      planes = []
      scale = None
      cclm = None
      luma_sizes = (LUMA_SIZES + ISP_EXTRA_SIZES if shapes.get("isp")
                    else LUMA_SIZES)
      if tb64:
        luma_sizes = luma_sizes + TB64_EXTRA_SIZES
        if shapes.get("isp"):
          luma_sizes = luma_sizes + ISP64_EXTRA_SIZES
      plane_geoms = ((maxs_y, Hp_y, Wp_y, luma_sizes),
                     (maxs_c, Hp_c, Wp_c, CHROMA_SIZES),
                     (maxs_c, Hp_c, Wp_c, CHROMA_SIZES))
      for c_idx, (maxs, Hp, Wp, sizes) in enumerate(
          plane_geoms[:1] if mono else plane_geoms):
        p = inp["planes"][c_idx]
        ct = inp["ctrl"]["y" if c_idx == 0 else "c"]
        res = _residual_from_buckets(p["buckets"], Hp, Wp, bd, sizes,
                                     c_idx > 0,
                                     scale if c_idx > 0 else None,
                                     inp.get("sl"))
        refs = _cropped_refs(refs_in, c_idx)
        plane = _recon_plane(res, ct["inter"], ct["n_inter"], ct["intra"],
                             ct["n_chunks"], refs,
                             maxs_inter=min(32, maxs),
                             maxs_intra=(maxs_intra_y if c_idx == 0
                                         else min(32, maxs)),
                             wrap=wrap if c_idx == 0 else wrap >> 1,
                             is_chroma=c_idx > 0, bit_depth=bd,
                             lmcs=lm if c_idx == 0 else None,
                             cr_weights=c_idx == 2, cclm=cclm)
        planes.append(plane)
        if c_idx == 0 and crs:
          scale = _lmcs_vpdu_scales(plane[:H, :W], lm, W, H, vsz, bd,
                                     tile_bds)
        if c_idx == 0 and "cclm_vc" in inp:
          # chroma CCLM reads the (mapped-domain) reconstructed luma:
          # the whole-plane collocated downsample + the plane itself
          vc = inp["cclm_vc"]
          cclm = (plane, I.cclm_dsy_plane(plane, vc, tile_bds[0],
                                          tile_bds[1]), vc)
      if lm is not None:
        # inverse mapping of the whole luma plane before the loop
        # filters (ff_vvc_lmcs_filter, vvc_filter.c:1322-1331)
        planes[0] = _lmcs_inv(planes[0], lm, bd)

    # effective deblock offsets (SH/PH override or PPS), static per
    # program variant (spec 8.8.3.6; slice overrides are uniform per
    # frame in generated streams)
    dbo, dto = shapes.get("dbo", (0, 0, 0)), shapes.get("dto", (0, 0, 0))

    def loopfilters(planes, d):
      out = list(planes)
      out[0] = deblock_vertical_luma(out[0], d["ybs_v"], d["yqp_v"],
                                     d["ymp_v"], d["ymq_v"], d["yhor0"],
                                     bit_depth=bd, beta_off=dbo[0],
                                     tc_off=dto[0])
      out[0] = deblock_vertical_luma(out[0].T, d["ybs_h"], d["yqp_h"],
                                     d["ymp_h"], d["ymq_h"], d["yhor"],
                                     bit_depth=bd, beta_off=dbo[0],
                                     tc_off=dto[0]).T
      for c in () if mono else (1, 2):
        out[c] = deblock_vertical_chroma(out[c], d[f"c{c}bs_v"],
                                         d[f"c{c}qp_v"], d[f"c{c}mp_v"],
                                         d[f"c{c}mq_v"], bit_depth=bd,
                                         beta_off=dbo[c], tc_off=dto[c])
        out[c] = deblock_vertical_chroma(out[c].T, d[f"c{c}bs_h"],
                                         d[f"c{c}qp_h"], d[f"c{c}mp_h"],
                                         d[f"c{c}mq_h"], bit_depth=bd,
                                         beta_off=dbo[c], tc_off=dto[c]).T
      return out

    # filter stages are statically present/absent: disabled filters are
    # omitted from the input tree, so the compiled program never touches
    # them (and the host never ships their grids)
    if "deblock" in inp:
      planes = loopfilters(planes, inp["deblock"])

    if "sao" in inp:
      s = inp["sao"]
      out = []
      for c_idx in range(1 if mono else 3):
        ss = 0 if c_idx == 0 else 1
        out.append(sao_plane(
            planes[c_idx], s["type"][..., c_idx], s["band"][..., c_idx],
            s["offv"][..., c_idx, :], s["eo"][..., c_idx],
            W >> ss, H >> ss, ctb=(1 << ctb_log2) >> ss, bit_depth=bd))
      planes = out
    if "alf" in inp:
      planes = _alf_pass(planes, inp["alf"])

    # Pack the cropped output planes into one flat buffer in planar
    # YCbCr order — the exact byte layout of the rawvideo frame — so
    # the host needs a single device->host fetch per frame.  The
    # conformance window (cl, cr, ct, cb2) crops the OUTPUT only; the
    # DPB planes keep the full coded area (vvcdec.c:666-677 exports
    # cropping the same way).
    cl, cr, ct, cb2 = shapes.get("crop", (0, 0, 0, 0))
    dt = jnp.uint8 if bd == 8 else jnp.uint16
    parts = [planes[0][ct:H - cb2, cl:W - cr].astype(dt).reshape(-1)]
    if not mono:
      parts += [planes[c][ct >> 1:(H - cb2) >> 1,
                          cl >> 1:(W - cr) >> 1].astype(dt).reshape(-1)
                for c in (1, 2)]
    packed = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return {"planes": planes, "packed": packed}

  return frame_program


_PACK_POOL: dict = {}
_PACK_POOL_LOCK = None


def _pack_scratch(total):
  """Rotating pool of pack buffers (uint8, `total` bytes).  A fresh
  18-40 MB allocation per frame costs 40-80 ms of page faults under the
  GIL; reusing warm buffers makes the pack a plain memcpy.  The pool
  depth exceeds the decoder's dispatch-ahead window, so a buffer is
  never rewritten while its host->device copy may still be in
  flight."""
  global _PACK_POOL_LOCK
  if _PACK_POOL_LOCK is None:
    import threading
    _PACK_POOL_LOCK = threading.Lock()
  if jax.default_backend() == "cpu":
    # XLA:CPU device_put may alias host memory zero-copy; a reused
    # buffer would mutate frames still in flight.  CPU runs (tests)
    # allocate fresh.
    return np.empty(total, np.uint8)
  with _PACK_POOL_LOCK:
    ring, idx = _PACK_POOL.setdefault("ring", ([], [0]))
    depth = 12  # > dispatch-ahead window (8) + margin
    def fresh(n):
      # explicit fill pre-faults the pages once at ring-build time;
      # cold first-touch of a 45 MB buffer costs ~450 ms at 1080p
      buf = np.empty(n, np.uint8)
      buf.fill(0)
      return buf

    if len(ring) < depth:
      buf = fresh(total)
      ring.append(buf)
      return buf
    idx[0] = (idx[0] + 1) % depth
    if ring[idx[0]].size < total:
      ring[idx[0]] = fresh(total)
    return ring[idx[0]][:total]


# dtypes allowed in the packed input buffer; the host ships each leaf
# at its natural width (coefficient levels int16, deblock/SAO grids
# int8, GPM weights uint8...) and the device widens to int32 at unpack
# — host->device transport is the throughput floor (measured ~225 MB/s
# on this tunnel), so input bytes ARE frame time.
_PACK_DTYPES = (np.dtype(np.int32), np.dtype(np.int16),
                np.dtype(np.int8), np.dtype(np.uint8))


def _leaf_nbytes(a):
  """Padded byte size of a leaf in the pack buffer (4-byte aligned so
  every leaf's offset stays aligned for its dtype view)."""
  return (a.nbytes + 3) & ~3


def _pack_leaves(leaves, total):
  """Flatten host leaves into one contiguous byte buffer with a single
  C-level copy pass (a per-leaf python assignment loop costs ~50ms per
  frame at ~700 leaves).  Leaves keep their own dtypes (int8/int16/
  int32); the device unpacks with bitcasts."""
  buf = _pack_scratch(total)
  off = 0
  for l in leaves:
    a = np.asarray(l)
    if a.dtype not in _PACK_DTYPES:
      a = a.astype(np.int32)
    dst = buf[off:off + a.nbytes].view(a.dtype)
    if a.ndim == 1 or a.flags.c_contiguous:
      dst[:] = a.reshape(-1)
    else:
      np.copyto(dst.reshape(a.shape), a)
    off += _leaf_nbytes(a)
  assert off == total
  return buf


class PackedProgram:
  """Wraps the frame program so all host-built int32 inputs travel as
  ONE flat buffer per dispatch.

  The naive call ships ~360 small arrays per frame; each is its own
  host->device transfer, and per-transfer overhead on the transport
  dwarfs the program's execution time.  The wrapper records the leaf
  layout (offset, size, shape per leaf, in tree-flatten order) on the
  first call, copies every leaf into one contiguous int32 buffer, and
  the jitted entry unpacks it with static slices — free at run time.
  Reference planes stay out of the buffer: they are device-resident
  DPB planes and must never round-trip through the host.
  """

  def __init__(self, body):
    import threading
    self._body = body
    self._lock = threading.Lock()  # pack() runs on parse worker threads
    self._variants: dict = {}  # leaf-shape signature -> (treedef, offs, total, jit)

  def _variant(self, leaves, treedef):
    sig = tuple((np.shape(leaf), np.asarray(leaf).dtype.str)
                for leaf in leaves)
    with self._lock:
      var = self._variants.get(sig)
      if var is None:
        offs, off = [], 0
        for leaf in leaves:
          a = np.asarray(leaf)
          dt = a.dtype if a.dtype in _PACK_DTYPES else np.dtype(np.int32)
          offs.append((off, a.nbytes if a.dtype in _PACK_DTYPES
                       else a.size * 4, a.shape, dt))
          off += _leaf_nbytes(a if a.dtype in _PACK_DTYPES
                              else a.astype(np.int32))

        def run(buf, refs, offs=offs, treedef=treedef):
          ls = []
          for o, nb, shape, dt in offs:
            seg = jax.lax.slice(buf, (o,), (o + nb,))
            if dt.itemsize > 1:
              seg = jax.lax.bitcast_convert_type(
                  seg.reshape(-1, dt.itemsize), dt)
            elif dt == np.int8:
              seg = jax.lax.bitcast_convert_type(seg, jnp.int8)
            ls.append(seg.astype(jnp.int32).reshape(shape))
          return self._body(jax.tree_util.tree_unflatten(treedef, ls), refs)

        var = (treedef, offs, off, jax.jit(run), run)
        self._variants[sig] = var
    assert treedef == var[0], "frame input structure changed"
    return var

  def pack(self, inp):
    """Heavy host half, safe on a worker thread: flatten + pack into
    one contiguous buffer and start its host->device transfer (the
    jit argument-upload path is ~2x slower than device_put and would
    serialize with execution at dispatch time).  Returns an opaque
    ticket for dispatch()."""
    leaves, treedef = jax.tree_util.tree_flatten(inp)
    var = self._variant(leaves, treedef)
    return var, jax.device_put(_pack_leaves(leaves, var[2]))

  def dispatch(self, ticket, refs):
    """Light dispatch half (main thread): hand the packed buffer and
    the just-resolved reference planes to the jitted program."""
    (_, _, _, jit_fn, _), buf = ticket
    return jit_fn(buf, refs)

  def __call__(self, inp, refs):
    return self.dispatch(self.pack(inp), refs)

  def packed_example(self, inp, refs):
    """(unjitted_fn, (packed_buf, refs)) for external jit/shard harnesses."""
    leaves, treedef = jax.tree_util.tree_flatten(inp)
    _, offs, total, _, run = self._variant(leaves, treedef)
    return run, (_pack_leaves(leaves, total), refs)


_PROGRAM_CACHE: dict = {}


def get_frame_program(W, H, ctb_log2, bit_depth, pallas=None,
                      tile_bds=((), ()), crop=(0, 0, 0, 0), isp=False,
                      tb64=False, dbo=(0, 0, 0), dto=(0, 0, 0),
                      mono=False, wrap=0):
  """tile_bds: interior tile boundary positions in luma samples
  (static; only CCLM's cross-component stencils depend on them).
  crop: conformance-window offsets (l, r, t, b) in luma samples.
  isp: frame carries ISP CUs (extends the luma residual size set).
  tb64: frame carries 64-sample luma TBs (64-size residual classes +
  64-wide intra units)."""
  _ensure_compile_cache()
  if pallas is None:
    pallas = _use_pallas()
  if isp or tb64:
    pallas = False  # the Pallas recon path has no ISP/64 size classes
  dbo, dto = tuple(dbo), tuple(dto)
  if mono or wrap:
    pallas = False  # the Pallas recon kernel lacks these paths
  key = (W, H, ctb_log2, bit_depth, pallas, tile_bds, crop, bool(isp),
         bool(tb64), dbo, dto, bool(mono), int(wrap))
  if key not in _PROGRAM_CACHE:
    _PROGRAM_CACHE[key] = PackedProgram(_build_frame_program(
        dict(W=W, H=H, ctb_log2=ctb_log2, bit_depth=bit_depth,
             pallas=pallas, tile_bds=tile_bds, crop=crop, isp=bool(isp),
             tb64=bool(tb64), dbo=dbo, dto=dto, mono=bool(mono),
             wrap=int(wrap))))
  return _PROGRAM_CACHE[key]


# ----------------------------------------------------------------------
# host-side input assembly
# ----------------------------------------------------------------------

_SCALE_SHIFT_TABLES: dict = {}


_QP_TAB_OFF = 32  # tables cover qp in [-32, 95]


def _scale_shift_tables_ts():
  """Transform-skip dequant: flat scale, bd_shift = 10 (derive_qp /
  derive_scale, vvc_intra.c; rect factor never applies)."""
  key = "ts"
  if key not in _SCALE_SHIFT_TABLES:
    from ...ops.transform import LEVEL_SCALE
    qps = range(-_QP_TAB_OFF, 96)
    sc = np.zeros(len(qps), np.int32)
    sh = np.full(len(qps), 10, np.int32)
    for i, qp in enumerate(qps):
      if qp >= 0:
        sc[i] = int(LEVEL_SCALE[0][qp % 6]) << (qp // 6)
    _SCALE_SHIFT_TABLES[key] = (sc, sh)
  return _SCALE_SHIFT_TABLES[key]


def _scale_shift_tables(lw, lh, bit_depth, dep_quant=False):
  """Vectorized dequant scale/shift lookup over qp (spec 8.7.3);
  index with qp + _QP_TAB_OFF."""
  key = (lw, lh, bit_depth, dep_quant)
  if key not in _SCALE_SHIFT_TABLES:
    from .recon import dequant_scale_shift
    qps = range(-_QP_TAB_OFF, 96)
    sc = np.zeros(len(qps), np.int32)
    sh = np.zeros(len(qps), np.int32)
    for i, qp in enumerate(qps):
      try:
        sc[i], sh[i] = dequant_scale_shift(qp, lw, lh, bit_depth,
                                           dep_quant=dep_quant)
      except ValueError:  # qp//6 < 0: unreachable for parsed Qp' values
        sc[i], sh[i] = 0, 1
    _SCALE_SHIFT_TABLES[key] = (sc, sh)
  return _SCALE_SHIFT_TABLES[key]


# row order of the per-bucket scalar matrix (decode.cc BucketRow)
BUCKET_ROWS = ("x0", "y0", "scale", "shift", "slot", "trh", "trv", "jop",
               "ts", "lf_sel", "lf_tr", "vpdu", "sbs", "slid")

_SCSH_CACHE: dict = {}


def _scsh_blob(sizes, bit_depth, dep_quant):
  """(n_sizes, 4, 128) dequant table blob for the native bucket filler:
  [sc, sh, sc_ts, sh_ts] per size class, indexed by qp_deq + 32."""
  key = (tuple(sizes), bit_depth, dep_quant)
  if key not in _SCSH_CACHE:
    blob = np.empty((len(sizes), 4, 128), np.int32)
    sc_ts, sh_ts = _scale_shift_tables_ts()
    for k, (w, h) in enumerate(sizes):
      sc, sh = _scale_shift_tables(w.bit_length() - 1, h.bit_length() - 1,
                                   bit_depth, dep_quant=dep_quant)
      blob[k, 0], blob[k, 1], blob[k, 2], blob[k, 3] = sc, sh, sc_ts, sh_ts
    _SCSH_CACHE[key] = np.ascontiguousarray(blob)
  return _SCSH_CACHE[key]


def _bucket_inputs(fs: FrameSyntax, c_idx: int, sizes, W, H):
  """Size-bucketed residual batches, filled by the native parser
  (vvch_fo_fill_buckets): one (11, cap) scalar matrix + one (cap, h, w)
  level-block array per size class.  Replaces ~20ms/frame of GIL-bound
  numpy gathers with a single C pass over the TU list."""
  import ctypes

  from .host import _get_lib

  lib = _get_lib()
  ss = 0 if c_idx == 0 else 1
  n_sizes = len(sizes)
  sizes_arr = np.ascontiguousarray(np.array(sizes, np.int32))
  counts = np.zeros(n_sizes, np.int32)
  i32p = ctypes.POINTER(ctypes.c_int32)
  fo = fs.fo.ptr
  lib.vvch_fo_bucket_counts(fo, c_idx, n_sizes,
                            sizes_arr.ctypes.data_as(i32p),
                            counts.ctypes.data_as(i32p))
  caps = np.array(
      [_ratchet((W, H), ("bucket", c_idx, w, h), int(counts[k]),
                _bucket_capacity(W >> ss, H >> ss, w, h), floor=16)
       for k, (w, h) in enumerate(sizes)], np.int32)
  scsh = _scsh_blob(sizes, fs.bit_depth, bool(fs.dep_quant))
  mats = [np.empty((len(BUCKET_ROWS), cap), np.int32) for cap in caps]
  # levels ship int16: coefficient levels are spec-clamped to
  # [-2^15, 2^15-1] (log2TransformRange = 15), exact at half the bytes;
  # 64-dim TBs store only the coded zero-out corner (_zo)
  lvs = [np.empty((cap, _zo(h), _zo(w)), np.int16)
         for cap, (w, h) in zip(caps, sizes)]
  slots = fs.slots_y if c_idx == 0 else fs.slots_c
  has_slots = slots is not None and len(slots)
  rc = lib.vvch_fo_fill_buckets(
      fo, c_idx, n_sizes,
      sizes_arr.ctypes.data_as(i32p), caps.ctypes.data_as(i32p),
      scsh.ctypes.data_as(i32p),
      slots.ctypes.data_as(i32p) if has_slots else None,
      (ctypes.c_void_p * n_sizes)(*[m.ctypes.data for m in mats]),
      (ctypes.c_void_p * n_sizes)(*[l.ctypes.data for l in lvs]))
  assert rc == 0, (
      f"bucket fill failed (plane {c_idx}): capacity model violated or "
      f"coded TU size outside the bucket list {sizes}")
  return {(w, h): {"mat": mats[k], "lv": lvs[k], "n": counts[k:k + 1]}
          for k, (w, h) in enumerate(sizes)}


def _deblock_grids(fs: FrameSyntax, Hp_y, Wp_y, Hp_c, Wp_c, ctb_log2):
  from . import deblock_ctrl as D

  ctb = 1 << ctb_log2
  y_pos_x, y_pos_y, y_w, y_h, y_qp, cbf_y = D._tu_grids_cbf(fs, 0, 4)
  mvf = fs.mvf

  def refpoc(ref_plane, lx):
    outp = np.full_like(ref_plane, -(10 ** 6) - lx)
    for i, poc in enumerate(fs.ref_pocs[lx]):
      outp[ref_plane == i] = poc
    return outp.astype(np.int32)

  motion = {
      # CIIP cells count as intra for boundary strength (the bs-2 rule
      # is "P or Q intra or ciip", vvc_filter.c:537); merge/TMVP
      # readers see the real pred_flag via fs.mvf directly
      "pf": np.where(np.asarray(mvf.get("ciip", 0)) > 0, 0,
                     mvf["pf"]).astype(np.int32),
      "m0x": mvf["mv_x"].astype(np.int32),
      "m0y": mvf["mv_y"].astype(np.int32),
      "p0": refpoc(mvf["ref"], 0),
      "m1x": mvf["mv1_x"].astype(np.int32),
      "m1y": mvf["mv1_y"].astype(np.int32),
      "p1": refpoc(mvf["ref1"], 1),
  }
  motion_t = {k: m.T for k, m in motion.items()}

  def pcmf_plane(want_c, g):
    if "pcmf" not in fs.tus or not np.any(fs.tus["pcmf"]):
      return None
    ss = 0 if want_c == 0 else 1
    gw = (fs.width >> ss) // g
    gh = (fs.height >> ss) // g
    pl = np.zeros((gh, gw), np.int32)
    sel = np.where((fs.tus["c_idx"] == want_c) & (fs.tus["pcmf"] == 1))[0]
    for j in sel:
      x0, y0 = int(fs.tus["x0"][j]), int(fs.tus["y0"][j])
      w, h = int(fs.tus["w"][j]), int(fs.tus["h"][j])
      pl[y0 // g:(y0 + h) // g, x0 // g:(x0 + w) // g] = 1
    return pl

  pcmf_y = pcmf_plane(0, 4)
  pcmf_c = pcmf_plane(1, 2)  # CB records mark the shared chroma plane
  d = {}
  Sv, Ev = Hp_y // 4, Wp_y // 4
  sbg = D._sb_grids(fs)
  d["ybs_v"], d["yqp_v"], d["ymp_v"], d["ymq_v"] = D._luma_edge_params(
      y_pos_x, y_w, y_qp, motion, cbf_y, Sv, Ev, pcmf_y,
      sb=None if sbg is None else sbg["v"])
  d["yhor0"] = np.zeros((Sv, Ev), np.int32)
  Sh, Eh = Wp_y // 4, Hp_y // 4
  d["ybs_h"], d["yqp_h"], d["ymp_h"], d["ymq_h"] = D._luma_edge_params(
      y_pos_y.T, y_h.T, y_qp.T, motion_t, cbf_y.T, Sh, Eh,
      pcmf_y.T if pcmf_y is not None else None,
      sb=None if sbg is None else sbg["h"])
  hor = np.zeros((Sh, Eh), np.int32)
  hor[:, :] = (((np.arange(Eh) * 4) % ctb) == 0)[None, :]
  d["yhor"] = hor
  for c_idx in () if fs.chroma_format_idc == 0 else (1, 2):
    pos_x, pos_y, tw, th, qpc, cbf_c = D._tu_grids_cbf(fs, c_idx, 2)
    Sv, Ev = Hp_c // 2, Wp_c // 8
    (d[f"c{c_idx}bs_v"], d[f"c{c_idx}qp_v"], d[f"c{c_idx}mp_v"],
     d[f"c{c_idx}mq_v"]) = D._chroma_edge_params(pos_x, tw, qpc, motion,
                                                 cbf_c, Sv, Ev,
                                                 pcmf=pcmf_c)
    Sh, Eh = Wp_c // 2, Hp_c // 8
    ctu_cols = ((np.arange(Eh) * 8 * 2) % ctb) == 0
    (d[f"c{c_idx}bs_h"], d[f"c{c_idx}qp_h"], d[f"c{c_idx}mp_h"],
     d[f"c{c_idx}mq_h"]) = D._chroma_edge_params(
         pos_y.T, th.T, qpc.T, motion_t, cbf_c.T, Sh, Eh,
         ctu_edge_cols=ctu_cols,
         pcmf=pcmf_c.T if pcmf_c is not None else None)
  # every grid value is tiny (bs 0-2, max filter lengths <= 7, averaged
  # qp in [-32, 63], CTU-edge flags): ship int8, 1/4 the bytes
  return {k: v.astype(np.int8) for k, v in d.items()}


# control keys that must travel int32: motion vectors are 18-bit
# (1/16-pel) and PROF per-subblock deltas are unbounded cp-mv diffs;
# everything else (coords <= 2^14, modes, flags, sizes, weights) ships
# int16 — half the host->device bytes of the control layouts
_CTRL32_KEYS = frozenset((
    "m0x", "m0y", "m1x", "m1y", "om0x", "om0y", "om1x", "om1y",
    "pdhx0", "pdhy0", "pdvx0", "pdvy0", "pdhx1", "pdhy1", "pdvx1",
    "pdvy1"))


def _ctrl_dtype(key):
  return np.int32 if key in _CTRL32_KEYS else np.int16


_ZERO_PLANE_CACHE: dict = {}


def _zero_plane(shape):
  if shape not in _ZERO_PLANE_CACHE:
    _ZERO_PLANE_CACHE[shape] = np.zeros(shape, np.int32)
  return _ZERO_PLANE_CACHE[shape]


def _layout_ctrl(mat, geom_key, tag):
  """Split one (kNumKeys, n_units) control matrix into the two batched
  layouts the frame program consumes:

    inter: dict of (icap,) arrays, the first n_inter columns real —
      all inter units, any order (no intra-frame sample deps).
    intra: dict of (ccap*CHUNK_CAP,) arrays where chunk k's units
      occupy slots [k*CHUNK_CAP, (k+1)*CHUNK_CAP); underfull chunks
      pad with w=0 (invalid) entries.  The host guarantees every
      sample dependency of a unit lives in a strictly earlier chunk.
  """
  keys = {k: mat[j] for j, k in enumerate(CTRL_KEYS)}
  chunk = keys["chunk"]
  # the MC batch: pure inter units first (the fallback's inter scatter
  # pass covers exactly those), then CIIP units (chunked in the intra
  # pass but needing a prefetched MC block in the Pallas path)
  pure_idx = np.flatnonzero((chunk < 0))
  ciip_idx = np.flatnonzero(keys["ciipw"] > 0)
  inter_idx = np.concatenate([pure_idx, ciip_idx])
  intra_idx = np.flatnonzero(chunk >= 0)
  # worst-case unit counts: every 4x4 a unit
  W, H = geom_key
  unit_cap = max(1, (W // 4) * (H // 4) + (W // 2) * (H // 2) // 16)

  n_inter = len(pure_idx)
  n_mc = len(inter_idx)
  icap = _round_up(_ratchet(geom_key, (tag, "inter"), max(n_mc, 1),
                            unit_cap, floor=INTER_CHUNK), INTER_CHUNK)
  inter = {k: np.zeros(icap, _ctrl_dtype(k)) for k in INTER_KEYS}
  for k in INTER_KEYS:
    inter[k][:n_mc] = keys[k][inter_idx]
  # GPM blend-weight tiles + per-row index into them
  ss = 0 if tag == "y" else 1
  gwt, gslot = _gpm_weight_blocks(inter, icap, ss, geom_key, tag)
  inter["gwt"] = gwt.astype(np.uint8)  # blend weights 0..8
  gs = np.zeros(icap, np.int16)
  gs[:len(gslot)] = gslot
  inter["gslot"] = gs

  # Compacted intra layout: units contiguous in chunk order + a
  # per-chunk offset table.  Chunk s's units live at
  # [ioff[s], ioff[s] + count_s) with count_s <= CHUNK_CAP; the device
  # slices a full CHUNK_CAP window from ioff[s] and masks writes to
  # the chunk's real extent (the overlap prefix of chunk s+1 computes
  # garbage that is never written).  vs the old chunk*CHUNK_CAP slot
  # padding this is ~5-12x fewer bytes on the wire (measured 8.5%
  # slot occupancy at RA 1080p).
  n_iu = len(intra_idx)
  if n_iu:
    c = chunk[intra_idx]
    n_chunks = int(c.max()) + 1
    order = np.argsort(c, kind="stable")
    cs = c[order]
    counts = np.bincount(cs, minlength=n_chunks)
    assert counts.max() <= CHUNK_CAP
    offs = np.zeros(n_chunks + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
  else:
    n_chunks = 0
    order = np.zeros(0, np.int64)
    offs = np.zeros(1, np.int64)
  ccap = _ratchet(geom_key, (tag, "chunks"), max(n_chunks, 1), unit_cap,
                  floor=8)
  ucap = _ratchet(geom_key, (tag, "iunits"), n_iu + CHUNK_CAP,
                  unit_cap + CHUNK_CAP, floor=4 * CHUNK_CAP)
  intra = {k: np.zeros(ucap, _ctrl_dtype(k)) for k in INTRA_KEYS}
  src = intra_idx[order]
  for k in INTRA_KEYS:
    intra[k][:n_iu] = keys[k][src]
  ioff = np.zeros(ccap, np.int32)
  iend = np.zeros(ccap, np.int32)
  ioff[:n_chunks] = offs[:-1]
  iend[:n_chunks] = offs[1:]
  intra["ioff"] = ioff
  intra["iend"] = iend
  return np.int32(n_inter), inter, np.int32(n_chunks), intra


def _pallas_ctrl(mat, geom_key, tag):
  """Decode-order control matrix padded to a ratcheted capacity, plus
  the per-unit index into the compacted inter-MC batch (matching
  _layout_ctrl's inter row order)."""
  n = mat.shape[1]
  W, H = geom_key
  unit_cap = max(1, (W // 4) * (H // 4) + (W // 2) * (H // 2) // 16)
  ncap = _round_up(_ratchet(geom_key, (tag, "pncap"), max(n, 1), unit_cap,
                            floor=128), 128)
  ctrl = np.zeros((mat.shape[0], ncap), np.int32)
  ctrl[:, :n] = mat
  ipos = np.zeros(ncap, np.int32)
  pure_idx = np.flatnonzero(mat[CTRL_KEYS.index("chunk")] < 0)
  ciip_idx = np.flatnonzero(mat[CTRL_KEYS.index("ciipw")] > 0)
  mc_idx = np.concatenate([pure_idx, ciip_idx])
  ipos[mc_idx] = np.arange(len(mc_idx), dtype=np.int32)
  return {"ctrl": ctrl, "ipos": ipos, "n": np.int32(n)}


def _padded_plane_shapes(W, H, ctb_log2):
  maxs_y = 1 << ctb_log2
  Hp_y = _round_up(H, 128) + maxs_y
  Wp_y = _round_up(W, 128) + maxs_y
  Hp_c = _round_up(H >> 1, 64) + (maxs_y >> 1)
  Wp_c = _round_up(W >> 1, 64) + (maxs_y >> 1)
  return (Hp_y, Wp_y), (Hp_c, Wp_c)


def resolve_refs(fs: FrameSyntax, refs_by_poc, ctb_log2=5, ref_slots=None):
  """Reference-plane tuple for the frame program: the light, dispatch-
  time half of input assembly (must run after every referenced frame
  has been *dispatched*, so its device plane handles exist).
  ref_slots overrides the (n_l0, n_l1) slot counts (GOP-batch mode
  needs a uniform reference layout across frames)."""
  shape_y, shape_c = _padded_plane_shapes(fs.width, fs.height, ctb_log2)
  n_comp = 1 if fs.chroma_format_idc == 0 else 3
  n_l0, n_l1 = ref_slots or (max(1, len(fs.ref_pocs[0])),
                             max(1, len(fs.ref_pocs[1])))

  def ref_for(c_idx, lx, k):
    """Padded reference plane: a device-resident DPB plane when
    available (no host round-trip), else cached zeros."""
    shape = shape_y if c_idx == 0 else shape_c
    if k < len(fs.ref_pocs[lx]):
      poc = fs.ref_pocs[lx][k]
      if refs_by_poc and poc in refs_by_poc:
        return refs_by_poc[poc][c_idx]
    return _zero_plane(shape)

  return [tuple(ref_for(c_idx, 0, k) for k in range(n_l0))
          + tuple(ref_for(c_idx, 1, k) for k in range(n_l1))
          for c_idx in range(n_comp)]


def build_host_inputs(fs: FrameSyntax, ctb_log2=5, ref_slots=None,
                      pallas=None, force_sao=False, force_isp=None,
                      force_tb64=None):
  """Heavy host half of input assembly (no device handles touched):
  safe to run ahead of time on a parse worker thread.  ref_slots /
  pallas / force_sao pin the input signature for GOP-batch mode, where
  every frame of a wave must share one program variant."""
  if pallas is None:
    pallas = _use_pallas()
  isp = bool(getattr(fs, "has_isp", 0)) if force_isp is None \
      else bool(force_isp)
  tb64 = bool(getattr(fs, "has_tb64", 0)) if force_tb64 is None \
      else bool(force_tb64)
  if isp or tb64 or getattr(fs, "sl", None) is not None:
    pallas = False
  W, H = fs.width, fs.height
  inp = {"planes": []}
  if getattr(fs, "sl", None) is not None:
    # explicit scaling lists: the active APS's ScalingMatrixRec (8x8
    # grid per id) + ScalingMatrixDcRec, consumed by _bucket_residuals
    inp["sl"] = {"rec": fs.sl["rec"], "dc": fs.sl["dc"]}
  if fs.lmcs is not None:
    # LMCS piecewise-segment tables (device evaluates the mapping
    # arithmetically); chroma_scale is present only when the PH enables
    # chroma residual scaling, so the program structure stays static
    lm = {"pivot": fs.lmcs["pivot"],
          "fwd_scale": fs.lmcs["fwd_scale"],
          "inv_scale": fs.lmcs["inv_scale"],
          "bins": np.array([fs.lmcs["min_bin"], fs.lmcs["max_bin"]],
                           np.int32)}
    if fs.lmcs["crs_flag"]:
      lm["chroma_scale"] = fs.lmcs["chroma_scale"]
    inp["lmcs"] = lm
  n_inter_y, inter_y, n_ch_y, intra_y = _layout_ctrl(fs.ctrl_y, (W, H), "y")
  n_inter_c, inter_c, n_ch_c, intra_c = _layout_ctrl(fs.ctrl_c, (W, H), "c")
  if pallas:
    inp["recon"] = {"y": _pallas_ctrl(fs.ctrl_y, (W, H), "y"),
                    "c": _pallas_ctrl(fs.ctrl_c, (W, H), "c")}
    has_ciip = (fs.ctrl_y is not None and fs.ctrl_y.size and
                fs.ctrl_y[CTRL_KEYS.index("ciipw")].any())
    if n_inter_y or n_inter_c or has_ciip:
      inp["has_inter"] = np.int32(1)
    if (fs.ctrl_y is not None and fs.ctrl_y.size and
        (fs.ctrl_y[CTRL_KEYS.index("mode_class")] == MC_MIP).any()):
      inp["recon"]["has_mip"] = np.int32(1)
    if (fs.ctrl_y is not None and fs.ctrl_y.size and
        (fs.ctrl_y[CTRL_KEYS.index("mrl")] > 0).any()):
      inp["recon"]["has_mrl"] = np.int32(1)
  if (fs.ctrl_c is not None and fs.ctrl_c.size and
      (fs.ctrl_c[CTRL_KEYS.index("cclm")] > 0).any()):
    inp["cclm_vc"] = np.int32(
        fs.ctrl_c[CTRL_KEYS.index("cclm_vc")].max() & 1)

  (Hp_y, Wp_y), (Hp_c, Wp_c) = _padded_plane_shapes(W, H, ctb_log2)

  # reference slots: [L0 entries..., L1 entries...] (>=1 each so the
  # MC gather always has a plane to index); L1 motion indexes slots
  # after the L0 block
  n_l0 = (ref_slots or (max(1, len(fs.ref_pocs[0])),))[0]
  for c in (inter_y, inter_c, intra_y, intra_c):
    # slot = ref_idx + n_l0 * list (GPM hypotheses can sit on either);
    # in-place so the int16 control dtype survives
    c["r0slot"] += (np.int16(n_l0) * c.get("hyp0lx", 0)).astype(np.int16)
    c["r1slot"] += (np.int16(n_l0) * c["hyp1lx"]).astype(np.int16)

  luma_sizes = LUMA_SIZES + ISP_EXTRA_SIZES if isp else list(LUMA_SIZES)
  if tb64:
    luma_sizes = luma_sizes + TB64_EXTRA_SIZES
    if isp:
      luma_sizes = luma_sizes + ISP64_EXTRA_SIZES
  mono = fs.chroma_format_idc == 0
  for c_idx in range(1 if mono else 3):
    sizes = luma_sizes if c_idx == 0 else CHROMA_SIZES
    inp["planes"].append(
        {"buckets": _bucket_inputs(fs, c_idx, sizes, W, H)})
  # control layouts ship ONCE per plane kind (Cb and Cr consume the
  # same chroma controls; duplicating them in the tree would double
  # their share of the host->device transfer)
  if pallas:
    # the Pallas recon path consumes only buckets + (when present)
    # the compacted inter-MC batch; the chunked wavefront layouts
    # would be dead weight on the host->device transfer
    if "has_inter" in inp:
      inp["ctrl"] = {"y": {"inter": inter_y}, "c": {"inter": inter_c}}
  else:
    inp["ctrl"] = {
        "y": {"inter": inter_y, "n_inter": n_inter_y,
              "intra": intra_y, "n_chunks": n_ch_y},
        "c": {"inter": inter_c, "n_inter": n_inter_c,
              "intra": intra_c, "n_chunks": n_ch_c},
    }
  if not fs.deblock_disabled:
    inp["deblock"] = _deblock_grids(fs, Hp_y, Wp_y, Hp_c, Wp_c, ctb_log2)

  if fs.alf is not None:
    a = fs.alf
    # filter banks: 16 fixed sets (vvc_data.c ff_vvc_alf_fix_filt_coeff
    # expanded through class_to_filt_map) + the slice's APS banks;
    # clip indices are converted to clip VALUES here (host knows the
    # bit depth): clip_set[idx] = 1 << (bd - {0,3,5,7}[idx])
    from ...ops.intra import _TABLES

    fixed = _TABLES["alf_fixed"].astype(np.int32)          # (64, 12)
    c2f = _TABLES["alf_class_to_filt"].astype(np.int32)    # (16, 25)
    fixed_banks = fixed[c2f]                               # (16, 25, 12)
    banks_coeff = np.concatenate(
        [fixed_banks, a["luma_coeff"]], axis=0).astype(np.int32)
    clip_off = np.array([0, 3, 5, 7], np.int32)
    bd_ = fs.bit_depth

    def clipv(idx):
      return (1 << (bd_ - clip_off[idx])).astype(np.int32)

    banks_clipv = np.concatenate(
        [np.full((16, 25, 12), 1 << bd_, np.int32),
         clipv(a["luma_clipidx"])], axis=0)
    cc_ext = np.concatenate(
        [np.zeros((2, 1, 7), np.int32), a["cc_coeff"]], axis=1)
    # narrow wire dtypes: ctb fields are flags/indices < 32 (int8),
    # coeffs |c| < 2^7 and clip values <= 1 << bd <= 4096 (int16)
    inp["alf"] = {
        "ctb": a["ctb"].astype(np.int8),
        "banks_coeff": banks_coeff.astype(np.int16),
        "banks_clipv": banks_clipv.astype(np.int16),
        "chroma_coeff": a["chroma_coeff"].astype(np.int16),
        "chroma_clipv": clipv(a["chroma_clipidx"]).astype(np.int16),
        "cc_coeff": cc_ext.astype(np.int16),
    }

  if fs.sao is not None and (force_sao or np.any(fs.sao[..., 0:3])):
    # per-CTB params are all small ints (types 0-2, band pos 0-28,
    # offsets |v| <= 31): int8 on the wire
    sao = fs.sao.astype(np.int8)
    inp["sao"] = {
        "type": sao[..., 0:3],
        "band": sao[..., 3:6],
        "eo": sao[..., 6:9],
        "offv": sao[..., 9:24].reshape(sao.shape[0], sao.shape[1], 3, 5),
    }
  return inp


def build_frame_inputs(fs: FrameSyntax, refs_by_poc, ctb_log2=5):
  return build_host_inputs(fs, ctb_log2), resolve_refs(fs, refs_by_poc,
                                                       ctb_log2)


def prepare_frame(fs: FrameSyntax):
  """Worker-thread half of a frame dispatch: build + pack the host
  inputs.  Returns a ticket for submit_frame()."""
  assert fs.chroma_format_idc in (0, 1), "4:2:0 / 4:0:0 only for now"
  tile_bds = (tuple(v for v in fs.tile_bd[0] if 0 < v < fs.width),
              tuple(v for v in fs.tile_bd[1] if 0 < v < fs.height))
  prog = get_frame_program(fs.width, fs.height, fs.ctb_log2, fs.bit_depth,
                           pallas=(False if getattr(fs, "sl", None)
                                   is not None else None),
                           tile_bds=tile_bds,
                           crop=tuple(getattr(fs, "crop", (0, 0, 0, 0))),
                           isp=bool(getattr(fs, "has_isp", 0)),
                           tb64=bool(getattr(fs, "has_tb64", 0)),
                           dbo=tuple(fs.beta_offset),
                           dto=tuple(fs.tc_offset),
                           mono=fs.chroma_format_idc == 0,
                           wrap=int(getattr(fs, "wrap_off", 0)))
  return prog, prog.pack(build_host_inputs(fs, fs.ctb_log2))


def submit_frame(prepared, fs: FrameSyntax, refs_by_poc=None):
  """Main-thread half: resolve reference planes and dispatch.

  Returns (packed, planes): `packed` is the flat planar-YCbCr output
  buffer (uint8/uint16, one device->host fetch materializes the whole
  frame), `planes` are the padded int32 device planes to keep in the
  DPB and feed back as references without any host round-trip.
  """
  prog, ticket = prepared
  refs = resolve_refs(fs, refs_by_poc, fs.ctb_log2)
  out = prog.dispatch(ticket, refs)
  return out["packed"], out["planes"]


def decode_frame_device(fs: FrameSyntax, refs_by_poc=None):
  """Single-dispatch frame decode, fully asynchronous (see
  prepare_frame/submit_frame for the pipelined two-step form)."""
  return submit_frame(prepare_frame(fs), fs, refs_by_poc)


def decode_frame(fs: FrameSyntax, refs_by_poc=None):
  """Single-dispatch frame decode; returns [Y, Cb, Cr] numpy planes
  ([Y] for 4:0:0), conformance-window cropped."""
  packed, _ = decode_frame_device(fs, refs_by_poc)
  cl, cr, ct, cb = getattr(fs, "crop", (0, 0, 0, 0))
  W, H = fs.width - cl - cr, fs.height - ct - cb
  buf = np.asarray(packed)
  if fs.chroma_format_idc == 0:
    return [buf[:W * H].reshape(H, W)]
  return [buf[:W * H].reshape(H, W),
          buf[W * H:W * H + (W // 2) * (H // 2)].reshape(H // 2, W // 2),
          buf[W * H + (W // 2) * (H // 2):].reshape(H // 2, W // 2)]

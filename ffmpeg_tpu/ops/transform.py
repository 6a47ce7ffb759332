"""Inverse quantization + inverse transforms as batched int32 JAX ops.

Bit-exact mirror of the reference scaling/transform pipeline
(`vvc_intra.c:277-417` dequant, `vvcdsp.c:94-117` itx_2d): integer
arithmetic throughout, including the reference's C int32 wraparound
semantics on the dequant multiply, inter-stage clip to the transform
dynamic range after the vertical pass, and the (7, 5+15-bd) shift pair.

Transforms are plain matmuls on the normative bases (vvc_tables.npz) —
the MXU path on TPU; XLA batches them over all TUs of a size class.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_TABLES = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "vvc", "vvc_tables.npz"))

LEVEL_SCALE = np.array([[40, 45, 51, 57, 64, 72],
                        [57, 64, 72, 80, 90, 102]], dtype=np.int32)


def itx_matrix(kind: str, n: int) -> np.ndarray:
    """Inverse 1-D basis M (out = M @ coeffs), int32."""
    return _TABLES[f"{kind}_{n}"].astype(np.int32)


def dequant_scale_shift(qp: int, log2_w: int, log2_h: int, bit_depth: int,
                        dep_quant: bool = False) -> tuple[int, int]:
    """Per-TB dequant scale and shift (spec 8.7.3, ts=0, flat scale_m=16)."""
    log_sum = log2_w + log2_h
    rect = log_sum & 1
    qp_eff = qp + (1 if dep_quant else 0)
    scale = int(LEVEL_SCALE[rect][qp_eff % 6]) << (qp_eff // 6)
    bd_shift = bit_depth + rect + log_sum // 2 + 10 - 15 + (1 if dep_quant else 0)
    return scale, bd_shift


def _clip_intp2(v: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.clip(v, -(1 << p), (1 << p) - 1)


@functools.partial(jax.jit, static_argnames=("log2_w", "log2_h", "bit_depth",
                                             "trh", "trv"))
def dequant_itx_batch(levels: jnp.ndarray, scales: jnp.ndarray,
                      bd_shifts: jnp.ndarray, *, log2_w: int, log2_h: int,
                      bit_depth: int, trh: str = "dct2", trv: str = "dct2"
                      ) -> jnp.ndarray:
    """levels: (N, h, w) int32 parsed coefficient levels.
    scales/bd_shifts: (N,) int32 per-TB dequant params.
    Returns residual blocks (N, h, w) int32.
    """
    w, h = 1 << log2_w, 1 << log2_h
    assert levels.shape[1:] == (h, w)
    levels = levels.astype(jnp.int32)
    # dequant: (c*scale*16 + off) >> shift, int32 wraparound like the C ref
    scale16 = (scales.astype(jnp.int32) * 16)[:, None, None]
    off = (jnp.int32(1) << bd_shifts.astype(jnp.int32) >> 1)[:, None, None]
    sh = bd_shifts.astype(jnp.int32)[:, None, None]
    deq = (levels * scale16 + off) >> sh
    deq = jnp.where(levels == 0, 0, _clip_intp2(deq, 15))

    mv = jnp.asarray(itx_matrix(trv, h))  # vertical basis (h x h)
    mh = jnp.asarray(itx_matrix(trh, w))  # horizontal basis (w x w)
    # vertical pass over columns: tmp[y][x] = sum_k mv[y][k] * deq[k][x]
    tmp = jnp.einsum("yk,nkx->nyx", mv, deq,
                     preferred_element_type=jnp.int32)
    tmp = _clip_intp2((tmp + 64) >> 7, 15)
    # horizontal pass over rows: out[y][x] = sum_k tmp[y][k] * mh[x][k]
    out = jnp.einsum("nyk,xk->nyx", tmp, mh,
                     preferred_element_type=jnp.int32)
    shift2 = 5 + 15 - bit_depth
    out = (out + (1 << (shift2 - 1))) >> shift2
    return out

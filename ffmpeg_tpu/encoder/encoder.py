"""Stream assembly: SPS/PPS + per-frame slices -> annex-B .vvc file.

Also emits an `intent` structure recording every syntax choice, used by
tests to validate the native parser field-by-field, and by the slow
reference model to compute expected pixels.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from ..bitstream.bits import BitWriter, NAL_IDR_N_LP, make_nal
from ..cbs.h266 import PPS, SPS, PictureHeader, SliceHeader
from .ctu import CuIntent, FrameSyntaxEncoder


@dataclass
class EncoderConfig:
    width: int = 64
    height: int = 64
    ctu_log2: int = 5  # 32x32 CTU
    qp: int = 32
    n_frames: int = 1
    chroma_format_idc: int = 1  # 4:2:0
    bit_depth: int = 8
    seed: int = 0
    max_level: int = 12  # max abs coefficient level
    coeff_density: float = 0.15  # fraction of nonzero coeffs
    deblock: bool = False  # in-loop deblocking (off until stage lands)


def build_sps_pps(cfg: EncoderConfig) -> tuple[SPS, PPS]:
    sps = SPS(
        sps_chroma_format_idc=cfg.chroma_format_idc,
        sps_log2_ctu_size_minus5=cfg.ctu_log2 - 5,
        sps_pic_width_max_in_luma_samples=cfg.width,
        sps_pic_height_max_in_luma_samples=cfg.height,
        sps_bitdepth_minus8=cfg.bit_depth - 8,
        # CU == CTU: min QT size = CTU size, no MTT
        sps_log2_diff_min_qt_min_cb_intra_slice_luma=cfg.ctu_log2 - 2,
        sps_max_mtt_hierarchy_depth_intra_slice_luma=0,
        sps_log2_diff_min_qt_min_cb_inter_slice=cfg.ctu_log2 - 2,
        sps_max_mtt_hierarchy_depth_inter_slice=0,
    )
    pps = PPS(
        pps_pic_width_in_luma_samples=cfg.width,
        pps_pic_height_in_luma_samples=cfg.height,
        pps_init_qp_minus26=cfg.qp - 26,
        # deblocking defaults ON in VVC; disable until the deblock stage
        # exists (configurable once implemented)
        pps_deblocking_filter_control_present_flag=0 if cfg.deblock else 1,
        pps_deblocking_filter_disabled_flag=0 if cfg.deblock else 1,
    )
    return sps, pps


def random_frame_intent(cfg: EncoderConfig, sps: SPS, pps: PPS,
                        rng: np.random.Generator) -> list[list[CuIntent]]:
    """One CuIntent per CTU (CU == CTU), random modes and coefficients."""
    ctu = 1 << cfg.ctu_log2
    ctus = []
    for y0 in range(0, cfg.height, ctu):
        for x0 in range(0, cfg.width, ctu):
            w = min(ctu, cfg.width - x0)
            h = min(ctu, cfg.height - y0)
            assert w == ctu and h == ctu, "partial CTUs need split support"

            def coeffs(cw, ch):
                if rng.random() < 0.15:
                    return None  # uncoded
                mask = rng.random((ch, cw)) < cfg.coeff_density
                mag = rng.integers(1, cfg.max_level + 1, size=(ch, cw))
                sign = rng.choice([-1, 1], size=(ch, cw))
                c = (mask * mag * sign).astype(np.int32)
                if not np.any(c):
                    c[rng.integers(0, ch), rng.integers(0, cw)] = 1
                return c

            cu = CuIntent(
                x0=x0, y0=y0, w=w, h=h,
                luma_mode=int(rng.integers(0, 67)),
                chroma_mode_idx=int(rng.choice([0, 1, 2, 3, 4])),
                coeff_y=coeffs(w, h),
                coeff_cb=coeffs(w // 2, h // 2),
                coeff_cr=coeffs(w // 2, h // 2),
            )
            ctus.append([cu])
    return ctus


def encode_stream(cfg: EncoderConfig):
    """Returns (annexb_bytes, intent_dict)."""
    rng = np.random.default_rng(cfg.seed)
    sps, pps = build_sps_pps(cfg)
    out = bytearray()
    out += sps.to_nal()
    out += pps.to_nal(sps)

    intent = {
        "config": {k: getattr(cfg, k) for k in (
            "width", "height", "ctu_log2", "qp", "n_frames",
            "chroma_format_idc", "bit_depth", "seed")},
        "frames": [],
    }

    for poc in range(cfg.n_frames):
        sh = SliceHeader(nal_unit_type=NAL_IDR_N_LP)
        sh.ph.ph_pic_order_cnt_lsb = poc & 0xFFFF
        ctu_intents = random_frame_intent(cfg, sps, pps, rng)
        fse = FrameSyntaxEncoder(sps, pps, sh)
        n_ctus = len(ctu_intents)
        idx = 0
        for ry in range(fse.ctb_h):
            for rx in range(fse.ctb_w):
                fse.encode_ctu(rx, ry, ctu_intents[idx], idx == n_ctus - 1)
                idx += 1
        payload = fse.finish()

        w = BitWriter()
        sh.write(w, sps, pps)
        assert w.bit_length % 8 == 0
        rbsp = w.to_bytes() + payload + b"\x80"  # rbsp stop bit byte
        out += make_nal(NAL_IDR_N_LP, rbsp)

        intent["frames"].append({
            "poc": poc,
            "slice_qp": fse.slice_qp_y,
            "ctus": [[_cu_to_dict(cu) for cu in cus] for cus in ctu_intents],
        })

    return bytes(out), intent


def _cu_to_dict(cu: CuIntent) -> dict:
    return {
        "x0": cu.x0, "y0": cu.y0, "w": cu.w, "h": cu.h,
        "luma_mode": cu.luma_mode,
        "chroma_mode_idx": cu.chroma_mode_idx,
        "coeff_y": None if cu.coeff_y is None else cu.coeff_y.tolist(),
        "coeff_cb": None if cu.coeff_cb is None else cu.coeff_cb.tolist(),
        "coeff_cr": None if cu.coeff_cr is None else cu.coeff_cr.tolist(),
    }


def main():
    import argparse

    p = argparse.ArgumentParser(description="generate a random legal VVC stream")
    p.add_argument("output", help="output .vvc path")
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--qp", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--intent", help="write intent JSON here")
    args = p.parse_args()

    cfg = EncoderConfig(width=args.width, height=args.height,
                        n_frames=args.frames, qp=args.qp, seed=args.seed)
    data, intent = encode_stream(cfg)
    with open(args.output, "wb") as f:
        f.write(data)
    if args.intent:
        with open(args.intent, "w") as f:
            json.dump(intent, f)
    print(f"wrote {args.output}: {len(data)} bytes, {cfg.n_frames} frame(s)")


if __name__ == "__main__":
    main()

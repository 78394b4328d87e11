"""Measure the normative decoder's transform gain end-to-end.

Injects known quantized levels into otherwise-flat frames, decodes with
dav1d, and measures the pixel response. This pins the exact linear gain of
dequant + inverse transform per tx size (including tx_scale and rect
adjustments) without reimplementing the integer butterflies — the model in
transforms.py is calibrated from these measurements.

Run: python tools/calibrate_gain.py
"""

from __future__ import annotations

import numpy as np

from cavif_tpu.av1 import tables as T
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.speed import SpeedTweaks
from tools.dav1d_probe import probe as dprobe


class InjectingEncoder(FrameEncoder):
    """Replaces the quantizer: injects fixed levels into the first luma txb."""

    inject: dict  # (row, col) -> level

    def _encode_block(self, ctx, tw, r, c, w4, h4):
        # only the real coding pass quantizes (not the collect/skeleton
        # walks) — consume the injection there
        coding = (tw is not None and getattr(ctx, "collect", None) is None
                  and not getattr(ctx, "skeleton", False))
        self._first_block = getattr(self, "_first_block", True)
        inject = self.inject if (self._first_block and coding) else {}
        if coding:
            self._first_block = False
        import numpy as np

        from cavif_tpu.av1 import transforms

        orig_quant = transforms.quantize_block

        def patched(coef, dc_q, ac_q, w, h, bias=None, bit_depth=10):
            lv = np.zeros(coef.shape, dtype=np.int32)
            for (rr, cc), val in inject.items():
                lv[..., rr, cc] = val
            return lv

        transforms.quantize_block = patched
        try:
            super()._encode_block(ctx, tw, r, c, w4, h4)
        finally:
            transforms.quantize_block = orig_quant


def measure(txw, txh, level=64, pos=(0, 0), q=121, depth=8):
    w, h = txw, txh
    y = np.full((h, w, 3), 128, dtype=np.uint16)
    cfg = AV1Config(
        width=w, height=h, bit_depth=depth, quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling="444",
        full_range=True, matrix_coefficients=6,
        # the injection patches the python quantizer: the native block
        # pipeline would bypass it entirely
        ec_backend="python",
    )
    fe = InjectingEncoder(y, cfg)
    fe.leaf_mi = 16
    fe.inject = {pos: level}
    payload = fe.encode()
    ok, logs, desc = dprobe(payload, want_pixels=True)
    if not ok:
        return None, logs
    dec = desc[3][0].astype(np.int64)
    delta = dec - 128
    return delta, None


def main():
    print("DC gain per tx size (pixel response to DC level):")
    for txw, txh in [(32, 32), (64, 64), (64, 32), (32, 64)]:
        qv = T.dc_q(121, 8)
        out, err = measure(txw, txh, level=40, pos=(0, 0))
        if out is None:
            print(f"  {txw}x{txh}: DECODE FAILED {err}")
            continue
        # response should be flat over the tx area
        area = out[:txh, :txw]
        mean = float(area.mean())
        import math
        gain = mean * math.sqrt(txw * txh) / (40 * qv)
        print(f"  {txw}x{txh}: mean delta {mean:.2f} (min {area.min()} max {area.max()}) -> gain {gain:.6f}")
    print("AC(0,1) response for 32x32 (pattern check vs float idct):")
    out, err = measure(32, 32, level=60, pos=(0, 1))
    if out is not None:
        from cavif_tpu.av1.transforms import dct2_matrix

        got = out[:32, :32].astype(float)
        d = dct2_matrix(32)
        expect = np.outer(d[0], d[1])  # unit pattern
        scale = (got * expect).sum() / (expect * expect).sum()
        resid = got - scale * expect
        print(f"  fitted scale {scale:.2f}, residual rms {np.sqrt((resid**2).mean()):.3f}, "
              f"gain {scale/ (60 * T.ac_q(121,8)) * 32:.6f}")
    else:
        print("  AC decode failed", err)


if __name__ == "__main__":
    main()

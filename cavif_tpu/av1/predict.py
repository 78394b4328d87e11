"""AV1 intra prediction (spec 7.11.2), bit-exact integer predictors.

Prediction must match the decoder exactly: the decoder reconstructs as
pred + residual, so any deviation in the encoder's predictor shifts decoded
pixels. Implemented: DC, V, H, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH — the
non-directional set (directional modes land with the angle-delta search).
The sequence header disables intra edge filtering/upsampling, so neighbor
rows/cols are used unfiltered.

All functions are vectorized numpy over a single block; the device path
batches the same arithmetic over many blocks (ops/ kernels).

Reference parity: rav1e's intra prediction stage, selected via
prediction_modes / fine_directional_intra speed knobs (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

from . import tables
from .symbols import (
    DC_PRED,
    H_PRED,
    PAETH_PRED,
    SMOOTH_H,
    SMOOTH_PRED,
    SMOOTH_V,
    V_PRED,
)


def _sm_weights(n: int) -> np.ndarray:
    return tables.get(f"sm_weights_{n}").astype(np.int64)


def predict(
    mode: int,
    above: np.ndarray | None,
    left: np.ndarray | None,
    above_left: int | None,
    w: int,
    h: int,
    bit_depth: int,
) -> np.ndarray:
    """Neighbors: above (w,), left (h,) reconstructed pixels (int arrays) or
    None when unavailable; above_left scalar. Returns (h, w) int32."""
    base = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1
    have_a = above is not None
    have_l = left is not None
    # spec: unavailable edges are synthesized for non-DC modes
    if not have_a and not have_l:
        above_arr = np.full(w, base - 1, dtype=np.int64)
        left_arr = np.full(h, base + 1, dtype=np.int64)
        al = base
    elif not have_a:
        above_arr = np.full(w, int(left[0]), dtype=np.int64)
        left_arr = left.astype(np.int64)
        al = int(left[0])
    elif not have_l:
        above_arr = above.astype(np.int64)
        left_arr = np.full(h, int(above[0]), dtype=np.int64)
        al = int(above[0])
    else:
        above_arr = above.astype(np.int64)
        left_arr = left.astype(np.int64)
        al = int(above_left) if above_left is not None else int(above[0])

    if mode == DC_PRED:
        if have_a and have_l:
            s = int(above_arr.sum() + left_arr.sum())
            avg = (s + ((w + h) >> 1)) // (w + h)
        elif have_a:
            avg = (int(above_arr.sum()) + (w >> 1)) >> (w.bit_length() - 1)
        elif have_l:
            avg = (int(left_arr.sum()) + (h >> 1)) >> (h.bit_length() - 1)
        else:
            avg = base
        return np.full((h, w), avg, dtype=np.int32)

    if mode == V_PRED:
        return np.broadcast_to(above_arr, (h, w)).astype(np.int32)

    if mode == H_PRED:
        return np.broadcast_to(left_arr[:, None], (h, w)).astype(np.int32)

    if mode == PAETH_PRED:
        b = left_arr[:, None] + above_arr[None, :] - al
        pl = np.abs(b - left_arr[:, None])
        pt = np.abs(b - above_arr[None, :])
        ptl = np.abs(b - al)
        out = np.where(
            (pl <= pt) & (pl <= ptl),
            left_arr[:, None],
            np.where(pt <= ptl, above_arr[None, :], al),
        )
        return out.astype(np.int32)

    if mode == SMOOTH_PRED:
        wh = _sm_weights(h)
        ww = _sm_weights(w)
        below = int(left_arr[h - 1])
        right = int(above_arr[w - 1])
        # spec smooth: pred = (w_h[y]*above[x] + (256-w_h[y])*below
        #                     + w_w[x]*left[y] + (256-w_w[x])*right + 256) >> 9
        t = (
            wh[:, None] * above_arr[None, :]
            + (256 - wh[:, None]) * below
            + ww[None, :] * left_arr[:, None]
            + (256 - ww[None, :]) * right
        )
        return ((t + 256) >> 9).astype(np.int32)

    if mode == SMOOTH_V:
        wh = _sm_weights(h)
        below = int(left_arr[h - 1])
        t = wh[:, None] * above_arr[None, :] + (256 - wh[:, None]) * below
        return ((t + 128) >> 8).astype(np.int32)

    if mode == SMOOTH_H:
        ww = _sm_weights(w)
        right = int(above_arr[w - 1])
        t = ww[None, :] * left_arr[:, None] + (256 - ww[None, :]) * right
        return ((t + 128) >> 8).astype(np.int32)

    raise NotImplementedError(f"mode {mode}")


NONDIRECTIONAL_MODES = [
    DC_PRED,
    V_PRED,
    H_PRED,
    SMOOTH_PRED,
    SMOOTH_V,
    SMOOTH_H,
    PAETH_PRED,
]

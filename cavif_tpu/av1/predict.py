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


def predict_all_batch(
    above: np.ndarray,
    left: np.ndarray,
    al: np.ndarray,
    have_a: np.ndarray,
    have_l: np.ndarray,
    w: int,
    h: int,
    bit_depth: int,
) -> np.ndarray:
    """Batched non-directional predictors, (B, 7, h, w) int32 in
    NONDIRECTIONAL_MODES order. Same integer arithmetic as predict();
    availability synthesis is vectorized across the batch.

    above (B, w), left (B, h), al (B,): raw neighbor pixels (contents ignored
    where the corresponding have_* flag is False)."""
    B = above.shape[0]
    base = 1 << (bit_depth - 1)
    above = above.astype(np.int64)
    left = left.astype(np.int64)
    al = al.astype(np.int64)
    ha = have_a[:, None]
    hl = have_l[:, None]
    a0 = above[:, 0:1]
    l0 = left[:, 0:1]
    # availability synthesis (mirrors predict())
    above_s = np.where(ha, above, np.where(hl, l0, base - 1))
    left_s = np.where(hl, left, np.where(ha, a0, base + 1))
    al_s = np.where(
        have_a & have_l,
        al,
        np.where(have_a, above[:, 0], np.where(have_l, left[:, 0], base)),
    )

    out = np.empty((B, 7, h, w), dtype=np.int32)

    # DC: per-availability averaging over the *real* sides
    sum_a = above.sum(axis=1)
    sum_l = left.sum(axis=1)
    avg_both = (sum_a + sum_l + ((w + h) >> 1)) // (w + h)
    avg_a = (sum_a + (w >> 1)) >> (w.bit_length() - 1)
    avg_l = (sum_l + (h >> 1)) >> (h.bit_length() - 1)
    avg = np.where(
        have_a & have_l,
        avg_both,
        np.where(have_a, avg_a, np.where(have_l, avg_l, base)),
    )
    out[:, 0] = avg[:, None, None]

    # V / H
    out[:, 1] = np.broadcast_to(above_s[:, None, :], (B, h, w))
    out[:, 2] = np.broadcast_to(left_s[:, :, None], (B, h, w))

    # SMOOTH family
    wh = _sm_weights(h)[None, :, None]  # (1, h, 1)
    ww = _sm_weights(w)[None, None, :]  # (1, 1, w)
    below = left_s[:, h - 1][:, None, None]
    right = above_s[:, w - 1][:, None, None]
    a2 = above_s[:, None, :]
    l2 = left_s[:, :, None]
    t = wh * a2 + (256 - wh) * below + ww * l2 + (256 - ww) * right
    out[:, 3] = (t + 256) >> 9
    out[:, 4] = (wh * a2 + (256 - wh) * below + 128) >> 8
    out[:, 5] = (ww * l2 + (256 - ww) * right + 128) >> 8

    # PAETH
    alb = al_s[:, None, None]
    b = l2 + a2 - alb
    pl = np.abs(b - l2)
    pt = np.abs(b - a2)
    ptl = np.abs(b - alb)
    out[:, 6] = np.where(
        (pl <= pt) & (pl <= ptl), l2, np.where(pt <= ptl, a2, alb)
    )
    return out

"""Bit-exact batched intra predictors as device kernels.

Pass 2's prediction must match the decoder integer-for-integer (the coded
residual is src minus the DECODER's prediction). This module evaluates all
13 intra modes (+ angle deltas) for a batch of same-shaped blocks from
explicit neighbor vectors, exactly:

- the non-directional family (DC/V/H/SMOOTH/SMOOTH_V/SMOOTH_H/PAETH) as
  integer VPU ops (shifts and integer divides, spec formulas);
- the directional family as ONE constant-matrix product against the
  [al, above_ext, left_ext] vector — every output is a 2-tap integer
  interpolation, so the matmul at HIGHEST precision is exact (weights
  <= 32, neighbors < 2^10), followed by the spec (x + 16) >> 5;
- per-block mode selection by gather over the candidate axis.

Semantics mirror av1/predict.py predict()/predict_directional() WITHOUT
the intra edge filter (the build's default; the host pass 2 takes the
same branch). tests/test_device_predict.py pins bit-exactness against the
scalar host predictors over random neighbors, modes, and deltas.

Together with ops/device_itx.py this completes the per-txb reconstruction
math needed for an on-device pass-2 wavefront (VERDICT round-1 item 4).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..av1 import tables
from .device_pass1 import _dir_cands, _dir_matrix

# candidate order: the 5 non-directional modes computed elementwise, then
# the full directional fan (V/H/diagonals x deltas) from the matrix
NONDIR5 = (0, 9, 10, 11, 12)  # DC, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH


@lru_cache(maxsize=None)
def _cand_index(use_deltas: bool):
    """(mode, delta) -> candidate index in the stacked prediction tensor."""
    idx = {}
    for i, m in enumerate(NONDIR5):
        idx[(m, 0)] = i
    for j, (m, d) in enumerate(_dir_cands(use_deltas)):
        idx[(m, d)] = len(NONDIR5) + j
    return idx


@lru_cache(maxsize=None)
def pred_body(bw: int, bh: int, bit_depth: int, use_deltas: bool):
    """Traceable (unjitted) batched-predictor body — composable inside
    larger device programs (the pass-2 wavefront)."""
    import jax
    import jax.numpy as jnp

    dirs = _dir_cands(use_deltas)
    mdir = _dir_matrix(dirs, bw, bh)  # (E, C_dir*bh*bw) f32 (integer vals)
    sm_h = np.asarray(tables.get(f"sm_weights_{bh}"), np.int32)
    sm_w = np.asarray(tables.get(f"sm_weights_{bw}"), np.int32)
    base = 1 << (bit_depth - 1)
    L = bw + bh

    def run(above_ext, left_ext, al, have_a, have_l, cand):
        """above_ext/left_ext: (B, L) int32 spec-extended neighbors;
        al: (B,) int32; have_a/have_l: (B,) bool; cand: (B,) int32
        candidate index (see _cand_index). Returns (B, bh, bw) int32."""
        B = above_ext.shape[0]
        ha = have_a[:, None]
        hl = have_l[:, None]
        above = above_ext[:, :bw]
        left = left_ext[:, :bh]
        a0 = above[:, 0:1]
        l0 = left[:, 0:1]
        above_s = jnp.where(ha, above, jnp.where(hl, l0, base - 1))
        left_s = jnp.where(hl, left, jnp.where(ha, a0, base + 1))
        al_s = jnp.where(
            have_a & have_l, al,
            jnp.where(have_a, above[:, 0],
                      jnp.where(have_l, left[:, 0], base)),
        )
        sum_a = above.sum(axis=1)
        sum_l = left.sum(axis=1)
        avg_both = (sum_a + sum_l + (L >> 1)) // L
        avg_a = (sum_a + (bw >> 1)) >> (bw.bit_length() - 1)
        avg_l = (sum_l + (bh >> 1)) >> (bh.bit_length() - 1)
        dcv = jnp.where(
            have_a & have_l, avg_both,
            jnp.where(have_a, avg_a, jnp.where(have_l, avg_l, base)),
        )
        shape = (B, bh, bw)
        a2 = above_s[:, None, :]
        l2 = left_s[:, :, None]
        dc = jnp.broadcast_to(dcv[:, None, None], shape)
        wh = jnp.asarray(sm_h)[None, :, None]
        ww = jnp.asarray(sm_w)[None, None, :]
        below = left_s[:, bh - 1][:, None, None]
        right = above_s[:, bw - 1][:, None, None]
        t = wh * a2 + (256 - wh) * below + ww * l2 + (256 - ww) * right
        smooth = (t + 256) >> 9
        smooth_v = (wh * a2 + (256 - wh) * below + 128) >> 8
        smooth_h = (ww * l2 + (256 - ww) * right + 128) >> 8
        alb = al_s[:, None, None]
        b = l2 + a2 - alb
        pl_ = jnp.abs(b - l2)
        pt = jnp.abs(b - a2)
        ptl = jnp.abs(b - alb)
        paeth = jnp.where(
            (pl_ <= pt) & (pl_ <= ptl),
            jnp.broadcast_to(l2, shape),
            jnp.where(pt <= ptl, jnp.broadcast_to(a2, shape),
                      jnp.broadcast_to(alb, shape)),
        )
        nond = jnp.stack(
            [dc, jnp.broadcast_to(smooth, shape),
             jnp.broadcast_to(smooth_v, shape),
             jnp.broadcast_to(smooth_h, shape), paeth], axis=1
        )  # (B, 5, bh, bw)
        # directional fan: exact f32 matmul (2-tap integer interpolations)
        ext = jnp.concatenate(
            [al[:, None], above_ext, left_ext], axis=1
        ).astype(jnp.float32)
        d = jnp.dot(
            ext, jnp.asarray(mdir), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = ((d.astype(jnp.int32) + 16) >> 5).reshape(B, len(dirs), bh, bw)
        # the matrix's availability fallbacks are baked into ext already
        # (callers pass spec-resolved extended neighbors)
        preds = jnp.concatenate([nond, d], axis=1)
        sel = jnp.take_along_axis(
            preds, cand[:, None, None, None], axis=1
        )[:, 0]
        return sel

    return run


@lru_cache(maxsize=None)
def pred_body_select(bw: int, bh: int, bit_depth: int, use_deltas: bool):
    """Selected-candidate twin of pred_body: computes ONLY each lane's
    chosen prediction instead of the full 61-candidate tensor — the
    per-lane directional weights are gathered from the constant matrix
    first and contracted in one small einsum. Bit-exact with pred_body
    (identical integer ops on the selected lane); built for the pass-2
    wavefront scan, whose per-level body cost was dominated by
    materializing and then discarding 60 of 61 candidates."""
    import jax
    import jax.numpy as jnp

    dirs = _dir_cands(use_deltas)
    mdir = _dir_matrix(dirs, bw, bh)  # (E, C_dir*bh*bw)
    E = mdir.shape[0]
    n2 = bh * bw
    # every directional output pixel is a <= 2-tap integer interpolation
    # of the ext vector (weights sum to 32): extract per-(candidate,
    # pixel) tap tables so the scan body does two tiny integer gathers
    # instead of a per-lane (E, n2) weight-matrix gather + matmul —
    # exact (pure int32) and ~20x less HBM traffic per wavefront level
    m3i = mdir.reshape(E, len(dirs), n2).transpose(1, 0, 2)  # (C, E, n2)
    C = len(dirs)
    tb = np.zeros((2, C, n2), np.int32)
    tw = np.zeros((2, C, n2), np.int32)
    for c in range(C):
        col = m3i[c]  # (E, n2)
        for p in range(n2):
            nz = np.nonzero(col[:, p])[0]
            assert len(nz) <= 2, (c, p, nz)
            for t, e in enumerate(nz):
                tb[t, c, p] = e
                tw[t, c, p] = int(col[e, p])
    # packed (C, 4*n2) table: [b0 | b1 | w0 | w1] — ONE gather per level
    # in the scan body instead of four (each gather is a separate XLA
    # kernel whose fixed launch cost dominates the tiny wavefront levels)
    tpack = np.concatenate(
        [tb[0], tb[1], tw[0], tw[1]], axis=1
    ).astype(np.int32)  # (C, 4*n2)
    sm_h = np.asarray(tables.get(f"sm_weights_{bh}"), np.int32)
    sm_w = np.asarray(tables.get(f"sm_weights_{bw}"), np.int32)
    base = 1 << (bit_depth - 1)
    L = bw + bh
    ND = len(NONDIR5)

    def run(above_ext, left_ext, al, have_a, have_l, cand):
        B = above_ext.shape[0]
        ha = have_a[:, None]
        hl = have_l[:, None]
        above = above_ext[:, :bw]
        left = left_ext[:, :bh]
        a0 = above[:, 0:1]
        l0 = left[:, 0:1]
        above_s = jnp.where(ha, above, jnp.where(hl, l0, base - 1))
        left_s = jnp.where(hl, left, jnp.where(ha, a0, base + 1))
        al_s = jnp.where(
            have_a & have_l, al,
            jnp.where(have_a, above[:, 0],
                      jnp.where(have_l, left[:, 0], base)),
        )
        sum_a = above.sum(axis=1)
        sum_l = left.sum(axis=1)
        avg_both = (sum_a + sum_l + (L >> 1)) // L
        avg_a = (sum_a + (bw >> 1)) >> (bw.bit_length() - 1)
        avg_l = (sum_l + (bh >> 1)) >> (bh.bit_length() - 1)
        dcv = jnp.where(
            have_a & have_l, avg_both,
            jnp.where(have_a, avg_a, jnp.where(have_l, avg_l, base)),
        )
        shape = (B, bh, bw)
        a2 = above_s[:, None, :]
        l2 = left_s[:, :, None]
        dc = jnp.broadcast_to(dcv[:, None, None], shape)
        wh = jnp.asarray(sm_h)[None, :, None]
        ww = jnp.asarray(sm_w)[None, None, :]
        below = left_s[:, bh - 1][:, None, None]
        right = above_s[:, bw - 1][:, None, None]
        t = wh * a2 + (256 - wh) * below + ww * l2 + (256 - ww) * right
        smooth = (t + 256) >> 9
        smooth_v = (wh * a2 + (256 - wh) * below + 128) >> 8
        smooth_h = (ww * l2 + (256 - ww) * right + 128) >> 8
        alb = al_s[:, None, None]
        b = l2 + a2 - alb
        pl_ = jnp.abs(b - l2)
        pt = jnp.abs(b - a2)
        ptl = jnp.abs(b - alb)
        paeth = jnp.where(
            (pl_ <= pt) & (pl_ <= ptl),
            jnp.broadcast_to(l2, shape),
            jnp.where(pt <= ptl, jnp.broadcast_to(a2, shape),
                      jnp.broadcast_to(alb, shape)),
        )
        nond = jnp.stack(
            [dc, jnp.broadcast_to(smooth, shape),
             jnp.broadcast_to(smooth_v, shape),
             jnp.broadcast_to(smooth_h, shape), paeth], axis=1
        )  # (B, ND, bh, bw)
        nond_sel = jnp.take_along_axis(
            nond, jnp.clip(cand, 0, ND - 1)[:, None, None, None], axis=1
        )[:, 0]
        # directional: per-lane 2-tap integer interpolation via the packed
        # tap table (exact; weights <= 32 summing to 32). One table
        # gather + one ext-value gather — kernel count, not bytes, sets
        # the per-level cost of the wavefront scan.
        ext = jnp.concatenate([al[:, None], above_ext, left_ext], axis=1)
        cd = jnp.maximum(cand - ND, 0)
        tp = jnp.take(jnp.asarray(tpack), cd, axis=0)  # (B, 4*n2)
        b01 = tp[:, : 2 * n2]
        w0 = tp[:, 2 * n2 : 3 * n2]
        w1 = tp[:, 3 * n2 :]
        v01 = jnp.take_along_axis(ext, b01, axis=1)  # (B, 2*n2)
        v0 = v01[:, :n2]
        v1 = v01[:, n2:]
        d = ((w0 * v0 + w1 * v1 + 16) >> 5).reshape(B, bh, bw)
        return jnp.where((cand >= ND)[:, None, None], d, nond_sel)

    return run


@lru_cache(maxsize=None)
def _pred_kernel(bw: int, bh: int, bit_depth: int, use_deltas: bool):
    import jax

    return jax.jit(pred_body(bw, bh, bit_depth, use_deltas))


def predict_batch_exact(
    modes: np.ndarray,
    deltas: np.ndarray,
    above_ext: np.ndarray,
    left_ext: np.ndarray,
    al: np.ndarray,
    have_a: np.ndarray,
    have_l: np.ndarray,
    bw: int,
    bh: int,
    bit_depth: int,
) -> np.ndarray:
    """Batched bit-exact intra prediction on device. Neighbors follow the
    host search's spec-resolution: above_ext/left_ext length bw+bh with
    the availability fallbacks already applied (base+-1 synthesis when a
    side is missing). Returns (B, bh, bw) int32 predictions."""
    import jax.numpy as jnp

    use_deltas = bool(np.any(np.asarray(deltas) != 0))
    idx = _cand_index(use_deltas)
    cand = np.asarray(
        [idx[(int(m), int(d))] for m, d in zip(modes, deltas)], np.int32
    )
    f = _pred_kernel(bw, bh, bit_depth, use_deltas)
    out = f(
        jnp.asarray(above_ext, jnp.int32),
        jnp.asarray(left_ext, jnp.int32),
        jnp.asarray(al, jnp.int32),
        jnp.asarray(have_a, bool),
        jnp.asarray(have_l, bool),
        jnp.asarray(cand),
    )
    return np.asarray(out)

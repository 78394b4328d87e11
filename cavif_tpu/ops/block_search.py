"""Device-side batched intra mode search over whole planes.

The TPU formulation of the encoder's pass 1 (av1/encoder.py _batch_search):
instead of gathering per-block arrays on host, the full plane batch lives on
device; block extraction is a reshape, neighbor rows/columns are strided
slices (one ppermute-shaped shift along the block grid), the 7
non-directional predictors are branch-free integer ops on the VPU, and the
32x32 forward DCT / reconstruction model are batched matmuls on the MXU.
argmin over the mode axis returns one int8 per block — the only device->host
traffic besides the initial plane upload.

Sharding: the natural mesh layout is (data = image batch, tile = block rows).
All ops are local except the neighbor-row shift, which GSPMD lowers to a
boundary exchange along `tile` — the halo pattern of SURVEY.md §5.7. See
__graft_entry__.dryrun_multichip for the pjit wiring.

Semantics match av1/predict.py predict_all_batch + av1/transforms.py
quantize/gain model (same formulas, f32); the host and device searches agree
on mode choices up to float-tiebreaks (tests/test_block_search.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

from ..av1.transforms import dct2_matrix, get_gain

NONDIRECTIONAL = (0, 1, 2, 9, 10, 11, 12)  # DC,V,H,SMOOTH,SM_V,SM_H,PAETH


@lru_cache(maxsize=None)
def _kernel(n: int, bit_depth: int, mtx_key: int = 0):
    import jax
    import jax.numpy as jnp

    from ..av1 import tables

    sm_w = jnp.asarray(np.asarray(tables.get(f"sm_weights_{n}"), np.int32))
    dct = jnp.asarray(dct2_matrix(n, np.float32))
    gain = np.float32(get_gain(n, n))
    base = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1

    def predict7(above, left, al, have_a, have_l):
        # above/left: (..., n) int32; al/have_*: (...)
        ha = have_a[..., None]
        hl = have_l[..., None]
        a0 = above[..., 0:1]
        l0 = left[..., 0:1]
        above_s = jnp.where(ha, above, jnp.where(hl, l0, base - 1))
        left_s = jnp.where(hl, left, jnp.where(ha, a0, base + 1))
        al_s = jnp.where(
            have_a & have_l,
            al,
            jnp.where(
                have_a, above[..., 0], jnp.where(have_l, left[..., 0], base)
            ),
        )
        sum_a = above.sum(-1)
        sum_l = left.sum(-1)
        log2n = n.bit_length() - 1
        avg_both = (sum_a + sum_l + n) // (2 * n)
        avg_a = (sum_a + (n >> 1)) >> log2n
        avg_l = (sum_l + (n >> 1)) >> log2n
        avg = jnp.where(
            have_a & have_l,
            avg_both,
            jnp.where(have_a, avg_a, jnp.where(have_l, avg_l, base)),
        )
        a2 = above_s[..., None, :]  # (..., 1, n)
        l2 = left_s[..., :, None]  # (..., n, 1)
        shape = above.shape[:-1] + (n, n)
        dc = jnp.broadcast_to(avg[..., None, None], shape)
        v = jnp.broadcast_to(a2, shape)
        h = jnp.broadcast_to(l2, shape)
        wh = sm_w[None, :, None]
        ww = sm_w[None, None, :]
        below = left_s[..., n - 1][..., None, None]
        right = above_s[..., n - 1][..., None, None]
        t = wh * a2 + (256 - wh) * below + ww * l2 + (256 - ww) * right
        smooth = (t + 256) >> 9
        smooth_v = (wh * a2 + (256 - wh) * below + 128) >> 8
        smooth_h = (ww * l2 + (256 - ww) * right + 128) >> 8
        alb = al_s[..., None, None]
        b = l2 + a2 - alb
        pl_ = jnp.abs(b - l2)
        pt = jnp.abs(b - a2)
        ptl = jnp.abs(b - alb)
        paeth = jnp.where(
            (pl_ <= pt) & (pl_ <= ptl), l2, jnp.where(pt <= ptl, a2, alb)
        )
        paeth = jnp.broadcast_to(paeth, shape)
        return jnp.stack(
            [dc, v, h, smooth, smooth_v, smooth_h, paeth], axis=-3
        )  # (..., 7, n, n)

    def search(planes, dc_q, ac_q, lam):
        """planes: (N, H, W) int32; returns best-mode index (N, H/n, W/n)."""
        N, H, W = planes.shape
        nby, nbx = H // n, W // n
        blocks = planes.reshape(N, nby, n, nbx, n).transpose(0, 1, 3, 2, 4)
        # neighbor rows/cols: last row/col of the previous block row/col
        rows = planes[:, n - 1 :: n, :].reshape(N, nby, nbx, n)
        above = jnp.concatenate(
            [jnp.zeros_like(rows[:, :1]), rows[:, :-1]], axis=1
        )
        cols = planes[:, :, n - 1 :: n]  # (N, H, nbx)
        colsb = cols.reshape(N, nby, n, nbx).transpose(0, 1, 3, 2)
        left = jnp.concatenate(
            [jnp.zeros_like(colsb[:, :, :1]), colsb[:, :, :-1]], axis=2
        )
        corn = rows[..., n - 1]  # (N, nby, nbx): bottom-right px of each block
        corn = jnp.concatenate(
            [jnp.zeros_like(corn[:, :1]), corn[:, :-1]], axis=1
        )
        al = jnp.concatenate(
            [jnp.zeros_like(corn[:, :, :1]), corn[:, :, :-1]], axis=2
        )
        by = jnp.arange(nby)[None, :, None]
        bx = jnp.arange(nbx)[None, None, :]
        have_a = jnp.broadcast_to(by > 0, (N, nby, nbx))
        have_l = jnp.broadcast_to(bx > 0, (N, nby, nbx))

        preds = predict7(above, left, al, have_a, have_l)
        res = (blocks[..., None, :, :] - preds).astype(jnp.float32)
        coef = dct @ res @ dct.T
        inv_ac = 1.0 / (ac_q.astype(jnp.float32) * gain)
        inv_dc = 1.0 / (dc_q.astype(jnp.float32) * gain)
        t = coef * inv_ac
        t = t.at[..., 0, 0].set(coef[..., 0, 0] * inv_dc)
        lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + 0.35)  # AC deadzone
        lv = lv.at[..., 0, 0].set(
            jnp.sign(t[..., 0, 0]) * jnp.floor(jnp.abs(t[..., 0, 0]) + 0.5)
        )
        x = lv * (ac_q.astype(jnp.float32) * gain)
        x = x.at[..., 0, 0].set(lv[..., 0, 0] * dc_q.astype(jnp.float32) * gain)
        resid = dct.T @ x @ dct
        rec = jnp.clip(
            preds + jnp.round(resid).astype(jnp.int32), 0, maxv
        )
        err = (blocks[..., None, :, :] - rec).astype(jnp.float32)
        rate = jnp.abs(lv).sum(axis=(-2, -1)) + 2.0 * (lv != 0).sum(
            axis=(-2, -1)
        )
        cost = (err * err).sum(axis=(-2, -1)) + lam * rate
        return jnp.argmin(cost, axis=-1).astype(jnp.int8)

    return jax.jit(search)


def plane_mode_search(
    planes: np.ndarray,
    dc_q: int,
    ac_q: int,
    lam: float,
    bit_depth: int,
    n: int = 32,
):
    """Search best non-directional mode for every aligned n x n block of a
    batch of planes. planes: (N, H, W) with H, W multiples of n. Returns
    (N, H/n, W/n) int8 indices into NONDIRECTIONAL."""
    import jax.numpy as jnp

    f = _kernel(n, bit_depth)
    out = f(
        jnp.asarray(np.ascontiguousarray(planes, np.int32)),
        jnp.asarray(dc_q, jnp.float32),
        jnp.asarray(ac_q, jnp.float32),
        jnp.asarray(lam, jnp.float32),
    )
    return np.asarray(out)

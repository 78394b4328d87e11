"""Pallas TPU kernel for the batched intra mode search.

The fused hot op of the encoder's pass 1 (SURVEY.md §7.4): for every
n x n block of a plane batch, generate all 13 intra predictors, forward-DCT
the residuals, quantize at the frame quantizer, and RD-score — in one
VMEM-resident kernel, so the (13, n, n) predictor/coefficient expansions
never round-trip through HBM (the XLA path materializes them).

Key TPU formulations:
- The 6 directional predictors are a CONSTANT sparse matrix applied to the
  per-block extended-neighbor vector (the AV1 two-tap interpolation
  pred[i,j] = (ext[b]*w0 + ext[b1]*w1 + 16) >> 5 is linear in the
  neighbors), so the whole directional family is one MXU matmul:
  ext (B, 4n+1) @ Mdir (4n+1, 6*n*n). Weights are integers <= 32 and
  neighbors < 2^10, so f32 accumulation is exact.
- The DCT pair coef = D @ res @ D^T runs as two (B*n, n) @ (n, n) MXU
  matmuls with a batched in-VMEM transpose between them; the RD cost
  (sum of squared quantization error + |level| rate) is invariant to the
  final transpose, so it is never undone.
- DC-coefficient special cases (quantizer, rounding bias) are lane masks,
  not scatters.

The neighbor-availability resolution is shared with the XLA backend
(block_search._neighbors), so both backends see identical inputs; mode
choices agree up to f32 quantization-boundary ties, and every disagreement
is a float64-oracle RD near-tie (tests/test_pallas_search.py).

Reference behavior being implemented: rav1e's intra mode RDO as configured
by cavif (/root/reference/ravif/src/av1encoder.rs:649-708); candidate set
and cost model match cavif_tpu/av1/encoder.py _batch_search.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..av1.transforms import AC_BIAS, dct2_matrix, get_gain
from .block_search import CAND_MODES, DIAG_MODES, _neighbors


def _dir_matrix(n: int) -> np.ndarray:
    """Constant matrix turning the per-block extended-neighbor vector
    ext = [al, above_ext(2n), left_ext(2n)] (length 4n+1) into the six
    diagonal predictors: returns (4n+1, 6*n*n) float32 with
    pred = (ext @ M + 16) >> 5 (exact in f32)."""
    from ..av1.predict import _dir_grids

    E = 4 * n + 1
    out = np.zeros((E, 6 * n * n), dtype=np.float64)

    def pos_above(k):  # index into above_ext
        return 1 + k

    def pos_left(k):
        return 1 + 2 * n + k

    for mi, mode in enumerate(DIAG_MODES):
        kind, a1, a2, a3, a4, mask = _dir_grids(mode, n, n)
        M = out[:, mi * n * n : (mi + 1) * n * n].reshape(E, n, n)
        if kind == "above":
            b, w0, b1, w1 = a1, a2, a3, a4
            for i in range(n):
                for j in range(n):
                    if mask[i, j]:
                        M[pos_above(b[i, j]), i, j] += w0[i, j]
                        M[pos_above(b1[i, j]), i, j] += w1[i, j]
                    else:
                        M[pos_above(2 * n - 1), i, j] += 32
        elif kind == "left":
            b, w0, b1, w1 = a1, a2, a3, a4
            for i in range(n):
                for j in range(n):
                    if mask[i, j]:
                        M[pos_left(b[i, j]), i, j] += w0[i, j]
                        M[pos_left(b1[i, j]), i, j] += w1[i, j]
                    else:
                        M[pos_left(2 * n - 1), i, j] += 32
        else:  # zone2: ab = [al] + above_ext, lc = [al] + left_ext
            (b1, wa0, wa1), (b2, wl0, wl1) = a1, a2

            def pos_ab(k):
                return k  # k==0 is al, k>=1 is above_ext[k-1]

            def pos_lc(k):
                return 0 if k == 0 else 2 * n + k

            for i in range(n):
                for j in range(n):
                    if mask[i, j]:
                        M[pos_ab(b1[i, j]), i, j] += wa0[i, j]
                        M[pos_ab(b1[i, j] + 1), i, j] += wa1[i, j]
                    else:
                        M[pos_lc(b2[i, j]), i, j] += wl0[i, j]
                        M[pos_lc(b2[i, j] + 1), i, j] += wl1[i, j]
    return out.astype(np.float32)


@lru_cache(maxsize=None)
def _pallas_kernel(n: int, bit_depth: int, chunk: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..av1 import tables

    sm_w = np.asarray(tables.get(f"sm_weights_{n}"), np.float32)
    dct64 = dct2_matrix(n, np.float64)
    dct_t = np.ascontiguousarray(dct64.T.astype(np.float32))  # (n, n) D^T
    # Kronecker form of the 2D DCT for the flat-lane directional path:
    # vec(D @ R @ D^T) = (D (+) D) vec(R), so coef_flat = res_flat @ kron^T.
    # (Mosaic cannot unfold a (CH, n*n) lane vector into (CH, n, n), so the
    # directional modes never leave flat layout.)
    kron_t = np.ascontiguousarray(
        np.kron(dct64, dct64).T.astype(np.float32)
    )  # (n*n, n*n)
    mdir = _dir_matrix(n)  # (4n+1, 6*n*n)
    gain = float(get_gain(n, n))

    # lane masks for the DC coefficient / first row-col constants
    dc_mask = np.zeros((n, n), np.float32)
    dc_mask[0, 0] = 1.0
    dc_mask_flat = np.zeros((1, n * n), np.float32)
    dc_mask_flat[0, 0] = 1.0

    def kernel(q_ref, blocks_ref, blocksf_ref, above_ref, left_ref,
               scal_ref, ext_ref, dctt_ref, kront_ref, mdir_ref, dcm_ref,
               dcmf_ref, smwr_ref, smwc_ref, out_ref):
        dc_q = q_ref[0, 0]
        ac_q = q_ref[0, 1]
        lam = q_ref[0, 2]
        blocks = blocks_ref[...].astype(jnp.float32)  # (CH, n, n)
        above_s = above_ref[...].astype(jnp.float32)  # (CH, n)
        left_s = left_ref[...].astype(jnp.float32)  # (CH, n)
        al_s = scal_ref[:, 0:1].astype(jnp.float32)  # (CH, 1)
        dc_val = scal_ref[:, 1:2].astype(jnp.float32)  # (CH, 1)
        DT = dctt_ref[...]
        dcm = dcm_ref[...]  # (n, n) 1.0 at [0,0]
        dcmf = dcmf_ref[...]  # (1, n*n) 1.0 at [0,0]

        acf = ac_q * gain
        dcf = dc_q * gain

        def qparams(m):
            inv_scale = (1.0 - m) * (1.0 / acf) + m * (1.0 / dcf)
            scale = (1.0 - m) * acf + m * dcf
            bias = (1.0 - m) * AC_BIAS + m * 0.5
            return inv_scale, scale, bias

        inv_scale, scale, bias = qparams(dcm)
        inv_scale_f, scale_f, bias_f = qparams(dcmf)

        def rd_cost(pred):
            # pred: (CH, n, n) f32 -> (CH, 1) cost
            res = blocks - pred
            tmp = jnp.dot(
                res.reshape(chunk * n, n), DT,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(chunk, n, n)
            tmp_t = jnp.swapaxes(tmp, 1, 2)
            coef = jnp.dot(
                tmp_t.reshape(chunk * n, n), DT,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(chunk, n, n)  # transposed coeffs; cost is invariant
            t = coef * inv_scale
            lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + bias)
            errc = coef - lv * scale
            # two-stage keepdims reductions: every intermediate stays 2D
            # (Mosaic rejects 1D vector layouts)
            acc = (errc * errc + lam * jnp.abs(lv)
                   + (2.0 * lam) * (lv != 0.0).astype(jnp.float32))
            return jnp.sum(jnp.sum(acc, axis=2), axis=1, keepdims=True)

        a2 = above_s[:, None, :]  # (CH, 1, n)
        l2 = left_s[:, :, None]  # (CH, n, 1)
        shape = (chunk, n, n)
        costs = []
        # DC
        costs.append(rd_cost(jnp.broadcast_to(dc_val[:, :, None], shape)))
        # V, H
        costs.append(rd_cost(jnp.broadcast_to(a2, shape)))
        costs.append(rd_cost(jnp.broadcast_to(l2, shape)))
        # SMOOTH / SMOOTH_V / SMOOTH_H — integer weights in f32 are exact
        ww = smwr_ref[...][None, :, :]  # (1, 1, n)
        wh = smwc_ref[...][None, :, :]  # (1, n, 1)
        below = left_s[:, n - 1 : n][:, :, None]  # (CH, 1, 1)
        right = above_s[:, n - 1 : n][:, :, None]
        tsm = wh * a2 + (256.0 - wh) * below + ww * l2 + (256.0 - ww) * right
        costs.append(rd_cost(jnp.floor((tsm + 256.0) * (1.0 / 512.0))))
        tsv = wh * a2 + (256.0 - wh) * below
        costs.append(rd_cost(jnp.floor((tsv + 128.0) * (1.0 / 256.0))))
        tsh = ww * l2 + (256.0 - ww) * right
        costs.append(rd_cost(jnp.floor((tsh + 128.0) * (1.0 / 256.0))))
        # PAETH
        alb = al_s[:, :, None]
        b = l2 + a2 - alb
        pl_ = jnp.abs(b - l2)
        pt = jnp.abs(b - a2)
        ptl = jnp.abs(b - alb)
        paeth = jnp.where(
            (pl_ <= pt) & (pl_ <= ptl), l2 + 0.0 * b,
            jnp.where(pt <= ptl, a2 + 0.0 * b, alb + 0.0 * b),
        )
        costs.append(rd_cost(jnp.broadcast_to(paeth, shape)))
        # 6 directional modes: one MXU matmul for the whole family, then
        # flat-lane RD scoring via the Kronecker DCT (no lane unfolds).
        # At n = 32 the two big constants live in VMEM as bf16 (kron 2MB +
        # Mdir 1.6MB vs 7.2MB at f32, which did not fit) and the matmuls
        # run at the MXU's native bf16 — the same precision trade the XLA
        # fused program makes; pass 2 recomputes chosen modes exactly.
        big = n > 16
        cdt = jnp.bfloat16 if big else jnp.float32
        prec = None if big else jax.lax.Precision.HIGHEST
        ext = ext_ref[...].astype(cdt)  # (CH, 4n+1)
        dall = jnp.dot(
            ext, mdir_ref[...].astype(cdt),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (CH, 6*n*n)
        dall = jnp.floor((dall + 16.0) * (1.0 / 32.0))
        blkf = blocksf_ref[...].astype(jnp.float32)  # (CH, n*n)
        KT = kront_ref[...]
        for mi in range(6):
            resf = blkf - dall[:, mi * n * n : (mi + 1) * n * n]
            coef = jnp.dot(resf.astype(cdt), KT.astype(cdt),
                           preferred_element_type=jnp.float32,
                           precision=prec)
            t = coef * inv_scale_f
            lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + bias_f)
            errc = coef - lv * scale_f
            acc = (errc * errc + lam * jnp.abs(lv)
                   + (2.0 * lam) * (lv != 0.0).astype(jnp.float32))
            costs.append(
                jnp.sum(acc, axis=1, keepdims=True) + lam * 7.0
            )  # + diag rate proxy (A/B-tuned)
        cost = jnp.concatenate(costs, axis=1)  # (CH, 13)
        # pad the mode axis to 16 lanes; argmin runs outside the kernel
        # (dynamic-lane stores of a (CH, 1) argmin column don't lower)
        pad = jnp.full((chunk, 16 - cost.shape[1]), 3.4e38, jnp.float32)
        out_ref[...] = jnp.concatenate([cost, pad], axis=1)

    E = 4 * n + 1

    @jax.jit
    def run(blocks, above_s, left_s, scal, ext, qvec):
        NB = blocks.shape[0]
        grid = (NB // chunk,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 3), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, n * n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, E), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n * n, n * n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((E, 6 * n * n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n * n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((chunk, 16), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NB, 16), jnp.float32),
            interpret=interpret,
        )(qvec, blocks, blocks.reshape(NB, n * n), above_s, left_s, scal,
          ext, jnp.asarray(dct_t),
          jnp.asarray(kron_t, jnp.bfloat16 if n > 16 else jnp.float32),
          jnp.asarray(mdir, jnp.bfloat16 if n > 16 else jnp.float32),
          jnp.asarray(dc_mask), jnp.asarray(dc_mask_flat),
          jnp.asarray(sm_w.reshape(1, n)), jnp.asarray(sm_w.reshape(n, 1)))

    return run


@lru_cache(maxsize=None)
def _prep(n: int, bit_depth: int):
    """jit-compiled neighbor prep: planes -> flattened per-block tensors."""
    import jax
    import jax.numpy as jnp

    def prep(planes):
        N, H, W = planes.shape
        nby, nbx = H // n, W // n
        blocks = planes.reshape(N, nby, n, nbx, n).transpose(0, 1, 3, 2, 4)
        nb = _neighbors(planes, n, bit_depth)
        NB = N * nby * nbx
        ext = jnp.concatenate(
            [nb["al"][..., None], nb["above_ext"], nb["left_ext"]], axis=-1
        )
        scal = jnp.stack([nb["al_s"], nb["dc"]], axis=-1)
        return (
            blocks.reshape(NB, n, n),
            nb["above_s"].reshape(NB, n),
            nb["left_s"].reshape(NB, n),
            scal.reshape(NB, 2),
            ext.reshape(NB, 4 * n + 1),
        )

    return jax.jit(prep)


def plane_mode_search_pallas(
    planes: np.ndarray,
    dc_q: int,
    ac_q: int,
    lam: float,
    bit_depth: int,
    n: int = 16,
    chunk: int = 64,
    interpret: bool = False,
    return_costs: bool = False,
):
    """Pallas-backend twin of block_search.plane_mode_search: best intra
    mode (13 candidates) for every aligned n x n block. planes: (N, H, W),
    H and W multiples of n. Returns (N, H/n, W/n) int8 indices into
    CAND_MODES. `interpret=True` runs the kernel in the Pallas interpreter
    (CPU-testable).

    At n = 32 the kernel stores its two large constants (Kronecker DCT,
    directional matrix) in VMEM as bf16 and runs those matmuls at the
    MXU's native precision (chunk drops to 32 for VMEM headroom); the
    n <= 16 tiers keep exact f32 arithmetic."""
    import jax.numpy as jnp

    if n > 16:
        chunk = min(chunk, 32)

    planes = np.ascontiguousarray(planes, np.int32)
    N, H, W = planes.shape
    nby, nbx = H // n, W // n
    NB = N * nby * nbx
    pad = (-NB) % chunk
    tensors = _prep(n, bit_depth)(jnp.asarray(planes))
    if pad:
        tensors = tuple(
            jnp.concatenate([t, jnp.repeat(t[:1], pad, axis=0)], axis=0)
            for t in tensors
        )
    qvec = jnp.asarray(
        [[float(dc_q), float(ac_q), float(lam)]], jnp.float32
    )
    costs = _pallas_kernel(n, bit_depth, chunk, interpret)(*tensors, qvec)
    cm = np.asarray(costs)[:NB, :13]
    flat = cm.argmin(axis=1)
    modes = flat.reshape(N, nby, nbx).astype(np.int8)
    if return_costs:
        return modes, cm.min(axis=1).reshape(N, nby, nbx).astype(np.float32)
    return modes

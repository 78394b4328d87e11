"""Whole-frame fused device pass-1: the encoder's partition + intra-mode
search as ONE jitted TPU program per frame.

Why one program: the attached chip is reached through a tunnel whose
round-trip latency (~30 ms) and H2D bandwidth (~32 MB/s) dwarf the compute —
a 4x-wider candidate search measured +2 ms on a v5e while a single extra
host<->device exchange costs a tunnel round trip. So the frame goes up ONCE
as uint8 (color conversion runs on device), every search the host cascade
performs (square tiers 4..32 px, both rectangular halves of every square,
the full angle-delta fan of all eight directional modes, joint U+V chroma)
runs brute-force on the MXU, the bottom-up NONE/SPLIT/HORZ/VERT partition
DP folds the costs on device, and the decisions come back DOWN as one packed
int8 buffer (single fetch).

Because compute is free relative to the tunnel, this path searches strictly
MORE than the host cascade: full RD on every candidate (no SAD prefilter),
every angle delta of every directional winner candidate (the host refines
only the per-block winner), chroma searched at every tier and for rect
halves (the host spreads the parent's chroma cost instead). Decisions are
therefore not byte-identical to the host path; quality is pinned >= host by
tests/test_device_search.py.

Reference behavior implemented: rav1e's intra partition/mode RDO as
configured by cavif (/root/reference/ravif/src/av1encoder.rs:649-708,
SpeedSettings partition_range / fine_directional_intra per SURVEY.md §2.2);
cost model matches cavif_tpu/av1/encoder.py _batch_search (same transform-
domain RD with the |level|+2nnz rate proxy and the diag/delta rate nudges).

Sharding: the plane tensors shard over a (data, tile) mesh like
ops/block_search (the per-block neighbor shifts become halo exchanges under
GSPMD); __graft_entry__.dryrun_multichip exercises the multi-device wiring.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_CACHE_SET = [False]


def _ensure_compile_cache() -> None:
    """Persistent XLA compile cache for the fused programs (~20-60 s per
    (shape, model, batch) through the tunnel's remote compiler). Every
    device entry point calls this: the sharded batch path reaches jax
    without going through the encoder's backend probe (which also sets
    it), and without the cache each fresh process recompiles every bucket
    program — measured 0.13 vs ~2.5 MP/s on the 512-mixed-input config."""
    if _CACHE_SET[0]:
        return
    _CACHE_SET[0] = True
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/cavif_tpu/jax"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0
        )
    except Exception:
        pass

from ..av1.transforms import AC_BIAS, dct2_matrix, get_gain


def pallas_flops(key) -> float:
    """Useful (logical, unpadded) flops executed INSIDE the fused pallas
    directional kernels for one _program/_program_batch key — invisible
    to XLA's cost_analysis (custom calls report no flops), so bench.py's
    roofline adds this to the compiled-program count when key[-1] (the
    pallas gate) is True. Per tier: the ext @ MK matmul (2*R*E*cdir*n2)
    plus the segment-sum reduce (R*cdir*n2 adds)."""
    if isinstance(key[3], str):  # single-frame: (H, W, depth, model, P, ...)
        H, W, _, _, P = key[:5]
        min_px, max_px, use_deltas = key[5:8]
        B = 1
    else:  # batch: (B, H, W, depth, model, ...)
        B, H, W, _, model = key[:5]
        P = 3 if model == "ycbcr" else 1
        min_px, max_px, use_deltas = key[5:8]
    if not key[-1]:
        return 0.0
    total = 0.0
    sq = SQ_TIERS + ((64,) if max_px >= 64 else ())
    for (bw, bh) in [(s, s) for s in sq] + list(RECT_SHAPES):
        if max(bw, bh) > 32:
            continue  # TX_64 family keeps the materialized XLA path
        ud = bool(use_deltas) and min(bw, bh) >= 8 and max(bw, bh) < 64
        cdir = len(_dir_cands(ud))
        E = 2 * (bw + bh) + 1
        n2 = bw * bh
        R = B * P * (H // bh) * (W // bw)
        total += 2.0 * R * E * cdir * n2 + R * cdir * n2
        # nondir kernel: 5 DCT dots + the 2 replication dots per tier
        total += 5 * 2.0 * R * n2 * n2 + 2.0 * R * (bw + bh) * n2
    return total


_PALLAS_BAD: set = set()  # program keys whose pallas compile crashed

# Compile-size ceiling for the pallas program (total pixels = B*H*W):
# the remote TPU compiler deterministically crashes (helper subprocess
# exit 1) building the whole-frame program at 33.4 MP (8K, min_px 4 —
# one more live kernel than the largest passing config); 25.6 MP and
# every smaller probe compile fine. Above the cap the XLA formulation
# (which compiles and runs at every size) is used proactively instead
# of paying a ~60 s failed compile per process.
_PALLAS_PX_CAP = int(os.environ.get("CAVIF_TPU_PALLAS_PX", 26_000_000))


def _pass1_pallas_enabled(px: int = 0) -> bool:
    """Fused pallas directional-cost kernel gate: on by default on a
    single real TPU (the tunnel/production config). Off on CPU (pallas
    needs interpret mode there — the hermetic tests and the multichip
    dryrun keep the XLA formulation), under multi-device meshes (GSPMD
    cannot partition the kernel; the sharded batch path's mesh is
    1-device on this attachment), and above the compile-size cap (see
    _PALLAS_PX_CAP). CAVIF_TPU_PASS1_PALLAS=0 forces the XLA path for
    A/B."""
    e = os.environ.get("CAVIF_TPU_PASS1_PALLAS", "1").strip().lower()
    if e in ("0", "off", "false"):
        return False
    if px > _PALLAS_PX_CAP:
        return False
    try:
        import jax

        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:  # pragma: no cover - jax always importable here
        return False

# candidate order: 5 non-directional (elementwise predictors), then the
# directional family (one MXU matmul): V, H, 6 diagonals at delta 0, then
# every (mode, delta != 0) pair when use_deltas
NONDIR5 = (0, 9, 10, 11, 12)  # DC, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH
DIR_MODES = (1, 2, 3, 4, 5, 6, 7, 8)  # V, H, D45, D135, D113, D157, D203, D67
DELTAS = (-3, -2, -1, 1, 2, 3)

SQ_TIERS = (4, 8, 16, 32)  # px; the 64 tier joins when max_px >= 64
RECT_SHAPES = ((8, 4), (4, 8), (16, 8), (8, 16), (32, 16), (16, 32))


def _dir_cands(use_deltas: bool):
    c = [(m, 0) for m in DIR_MODES]
    if use_deltas:
        c += [(m, d) for m in DIR_MODES for d in DELTAS]
    return tuple(c)


def _cand_tables(use_deltas: bool, lam_unit_diag=7.0, lam_unit_delta=6.0):
    """Static per-candidate (mode_id, delta, rate-penalty-in-lambda-units)
    arrays in the concatenated cost order. Penalties mirror the host
    search: +7*lam for the diagonal modes (angle+mode rate proxy,
    encoder.py _batch_search) and +6*lam for a nonzero delta (the host
    refine's acceptance margin, encoder.py _refine_deltas)."""
    dirs = _dir_cands(use_deltas)
    modes = list(NONDIR5) + [m for (m, _) in dirs]
    deltas = [0] * len(NONDIR5) + [d for (_, d) in dirs]
    pen = [0.0] * len(NONDIR5)
    for m, d in dirs:
        p = 0.0
        if m >= 3:  # diagonal family
            p += lam_unit_diag
        if d != 0:
            p += lam_unit_delta
        pen.append(p)
    return (
        np.asarray(modes, np.int8),
        np.asarray(deltas, np.int8),
        np.asarray(pen, np.float32),
    )


@lru_cache(maxsize=None)
def _dir_matrix(cands, bw: int, bh: int) -> np.ndarray:
    """Constant matrix mapping the per-block extended-neighbor vector
    ext = [al, above_ext(bw+bh), left_ext(bw+bh)] (length E = 2(bw+bh)+1)
    to all directional predictors at once:
    preds_flat = floor((ext @ M + 16) / 32), exact in f32 (integer weights
    <= 32, neighbors < 2^10). Pure V/H enter with weight 32.
    Generalizes ops/pallas_search._dir_matrix to rect shapes and deltas."""
    from ..av1.predict import _dir_grids

    L = bw + bh
    E = 2 * L + 1
    out = np.zeros((E, len(cands) * bh * bw), dtype=np.float64)

    def pa(k):  # above_ext[k]
        return 1 + k

    def plft(k):  # left_ext[k]
        return 1 + L + k

    for ci, (mode, delta) in enumerate(cands):
        M = out[:, ci * bh * bw : (ci + 1) * bh * bw].reshape(E, bh, bw)
        kind, a1, a2, a3, a4, mask = _dir_grids(mode, bw, bh, delta)
        if kind == "vh":
            if a1 == 90:  # V: pred[i, j] = above_ext[j]
                for j in range(bw):
                    M[pa(j), :, j] += 32
            else:  # H: pred[i, j] = left_ext[i]
                for i in range(bh):
                    M[plft(i), i, :] += 32
        elif kind == "above":
            b, w0, b1, w1 = a1, a2, a3, a4
            for i in range(bh):
                for j in range(bw):
                    if mask[i, j]:
                        M[pa(b[i, j]), i, j] += w0[i, j]
                        M[pa(b1[i, j]), i, j] += w1[i, j]
                    else:
                        M[pa(L - 1), i, j] += 32
        elif kind == "left":
            b, w0, b1, w1 = a1, a2, a3, a4
            for i in range(bh):
                for j in range(bw):
                    if mask[i, j]:
                        M[plft(b[i, j]), i, j] += w0[i, j]
                        M[plft(b1[i, j]), i, j] += w1[i, j]
                    else:
                        M[plft(L - 1), i, j] += 32
        else:  # zone2: ab = [al] + above_ext, lc = [al] + left_ext
            (b1g, wa0, wa1), (b2g, wl0, wl1) = a1, a2

            def p_ab(k):
                return k  # k == 0 is al; k >= 1 is above_ext[k-1] at index k

            def p_lc(k):
                return 0 if k == 0 else 1 + L + (k - 1)

            for i in range(bh):
                for j in range(bw):
                    if mask[i, j]:
                        M[p_ab(b1g[i, j]), i, j] += wa0[i, j]
                        M[p_ab(b1g[i, j] + 1), i, j] += wa1[i, j]
                    else:
                        M[p_lc(b2g[i, j]), i, j] += wl0[i, j]
                        M[p_lc(b2g[i, j] + 1), i, j] += wl1[i, j]
    return np.ascontiguousarray(out.astype(np.float32))


def _nbrs(planes, bw: int, bh: int, bit_depth: int, tile_px):
    """tile_px entries may be python ints or traced int32 scalars (the
    fused programs pass them dynamically so one compilation serves every
    tile split of a shape bucket)."""
    """Per-block neighbor tensors over the whole (P, H, W) plane stack for
    the aligned (bh, bw) block grid, with spec availability fallbacks AND
    tile-boundary masking (tiles are prediction-independent; a block whose
    above/left row belongs to another tile treats it as unavailable, which
    is exactly the pass-2 walk's rr4/cc4 availability).

    Returns dict with above_s/left_s (resolved (P, nby, nbx, n)), al_s, dc,
    ext (P, nby, nbx, E) — the [al, above_ext, left_ext] vector for the
    directional matmul."""
    import jax.numpy as jnp

    P, H, W = planes.shape
    nby, nbx = H // bh, W // bw
    th, tw = tile_px
    base = 1 << (bit_depth - 1)
    L = bw + bh

    rows = planes[:, bh - 1 :: bh, :]  # (P, nby, W): last row of each brow
    rows_sh = jnp.concatenate(
        [jnp.zeros_like(rows[:, :1]), rows[:, :-1]], axis=1
    )  # row above each block row
    above = rows_sh.reshape(P, nby, nbx, bw)
    cols = planes[:, :, bw - 1 :: bw]  # (P, H, nbx)
    cols_sh = jnp.concatenate(
        [jnp.zeros_like(cols[:, :, :1]), cols[:, :, :-1]], axis=2
    )
    left = cols_sh.reshape(P, nby, bh, nbx).transpose(0, 1, 3, 2)
    corn = rows_sh[:, :, bw - 1 :: bw]  # (P, nby, nbx): px above-right-corner
    al = jnp.concatenate([jnp.zeros_like(corn[:, :, :1]), corn[:, :, :-1]], 2)

    by = jnp.arange(nby)
    bx = jnp.arange(nbx)
    have_a = jnp.broadcast_to(
        (((by * bh) % th) != 0)[None, :, None], (P, nby, nbx)
    )
    have_l = jnp.broadcast_to(
        (((bx * bw) % tw) != 0)[None, None, :], (P, nby, nbx)
    )
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
    # DC per availability (host predict_all_batch semantics, incl. rect)
    sum_a = above.sum(-1)
    sum_l = left.sum(-1)
    avg_both = (sum_a + sum_l + (L >> 1)) // L
    avg_a = (sum_a + (bw >> 1)) >> (bw.bit_length() - 1)
    avg_l = (sum_l + (bh >> 1)) >> (bh.bit_length() - 1)
    dc = jnp.where(
        have_a & have_l,
        avg_both,
        jnp.where(have_a, avg_a, jnp.where(have_l, avg_l, base)),
    )

    # extended neighbors (length L each side): real pixels along the row
    # above / column left, clamped at the plane edge (host pass-1 reads the
    # same padded source rows, replicating past the end)
    xi = jnp.minimum(bx[:, None] * bw + jnp.arange(L)[None, :], W - 1)
    above_ext = rows_sh[:, :, xi]  # (P, nby, nbx, L)
    yi = jnp.minimum(by[:, None] * bh + jnp.arange(L)[None, :], H - 1)
    left_ext = cols_sh[:, yi, :].transpose(0, 1, 3, 2)  # (P, nby, nbx, L)

    both_missing = ~have_a & ~have_l
    only_a = have_a & ~have_l
    only_l = ~have_a & have_l
    above_ext = jnp.where(
        both_missing[..., None],
        base - 1,
        jnp.where(only_l[..., None], left_ext[..., 0:1], above_ext),
    )
    left_ext = jnp.where(
        both_missing[..., None],
        base + 1,
        jnp.where(only_a[..., None], above_ext[..., 0:1], left_ext),
    )
    al_ext = jnp.where(
        both_missing,
        base,
        jnp.where(
            only_a,
            above_ext[..., 0],
            jnp.where(only_l, left_ext[..., 0], al),
        ),
    )
    ext = jnp.concatenate(
        [al_ext[..., None], above_ext, left_ext], axis=-1
    ).astype(jnp.float32)
    return dict(
        above_s=above_s, left_s=left_s, al_s=al_s, dc=dc, ext=ext,
        nby=nby, nbx=nbx,
    )


def _cost_body(bw: int, bh: int, bit_depth: int,
               use_deltas: bool, pallas_on: bool = False):
    """Traceable whole-plane RD cost for one block shape: returns
    fn(planes, dc_q, ac_q, lam) -> (P, nby, nbx, C) f32 costs in the
    static candidate order of _cand_tables(use_deltas).

    TPU formulation: the 2D DCT runs in Kronecker form
    coef_flat = res_flat @ (Dh (x) Dw)^T — one (rows, n2) @ (n2, n2)
    matmul with n2 = bh*bw in the contraction, which keeps the MXU's
    systolic array full where the separable form degenerates into
    batched 4x4..32x32 matmuls (<1% utilization). Matmuls run at the
    default (bf16-input, f32-accumulate) precision: the ~0.4% coefficient
    wobble only perturbs RD rankings at near-ties, and pass 2 recomputes
    every chosen prediction/transform exactly on the host. Measured 6x
    per-shape speedup over highest-precision separable einsums."""
    import jax.numpy as jnp

    from ..av1 import tables

    dirs = _dir_cands(use_deltas)
    mdir = _dir_matrix(dirs, bw, bh)  # (E, C_dir*bh*bw)
    _, _, pen = _cand_tables(use_deltas)
    n2 = bh * bw
    dh = dct2_matrix(bh, np.float64)
    dw = dct2_matrix(bw, np.float64)
    # TX_64-family blocks code only the top-left 32x32 coefficient area
    # (the rest is discarded by the decoder); the host cascade prices the
    # coded area only (_compute_txb cw/ch clamp) — mirror that by slicing
    # the Kronecker transform to the coded columns. Index 0 stays DC.
    cw_c, ch_c = min(bw, 32), min(bh, 32)
    ncoded = cw_c * ch_c
    coded_idx = np.asarray(
        [r * bw + c for r in range(ch_c) for c in range(cw_c)], np.int64
    )
    # vec(Dh @ R @ Dw^T) = (Dh (x) Dw) vec(R)
    kron_f64 = np.kron(dh, dw).T[:, coded_idx]  # (n2, ncoded)
    kron_t = np.ascontiguousarray(kron_f64.astype(np.float32))
    gain = np.float32(get_gain(cw_c, ch_c))
    sm_h = np.asarray(tables.get(f"sm_weights_{bh}"), np.int32)
    sm_w = np.asarray(tables.get(f"sm_weights_{bw}"), np.int32)
    dcm = np.zeros((1, ncoded), np.float32)
    dcm[0, 0] = 1.0
    cdir = len(dirs)
    E = mdir.shape[0]
    # Coefficient-domain directional path (HBM-traffic optimization): with
    # the predictor floor dropped (pred = (ext@M)/32 + 0.5 — a < 1 px
    # perturbation, far below a quant step; pass 2 recomputes the chosen
    # predictor exactly on the host), prediction and DCT fold into ONE
    # constant MK_c = M_c @ KT, so
    #   coef_c = blocks@KT - (ext @ MK_c) / 32 - 0.5 * colsum(KT)
    # and the (P, nb, C, n2) predictor/residual tensors never materialize.
    # The 1 MP program was bandwidth-bound (44.5 GB accessed / 80 ms =
    # 68% of v5e HBM peak); this path removes the two largest per-
    # candidate intermediates. TX_64-family shapes (ncoded != n2) keep
    # the materialized path: their tail distortion term needs the
    # full-area residual energy.
    # TX_64-family coef-domain tail (r05, tried and REVERTED): Parseval
    # gives the discarded-area energy as
    #   tail = ||b||^2 - 2<b,p> + ||p||^2 - sum(coef_coded^2)
    # from three small candidate tensors (U = b@M, the quadratic form
    # over M_c M_c^T, and ext@rowsum(M)) — an exact identity, but
    # numerically CATASTROPHIC: the terms are ~4e9 (||b||^2 for a 64x64
    # 10-bit block) cancelling to a ~1e6 tail, so bf16 matmul error
    # (~4e-3 relative, ~1.6e7 through the ||ext@M||^2 term) and even
    # f32 (~0.8% of candidate costs on a numeric check) swamp the RD
    # margins — the chip-run 64-tier quality test measured -0.7 dB.
    # The materialized residual path computes res at RESIDUAL scale and
    # stays stable; going below its bandwidth needs a fused
    # (pallas) matmul+quant kernel, not algebra.
    if ncoded == n2 and cdir:
        m3 = mdir.astype(np.float64).reshape(E, cdir, n2)
        mk3 = np.einsum("ecj,jk->eck", m3, kron_f64)
        mk_dir = np.ascontiguousarray(
            mk3.reshape(E, cdir * ncoded).astype(np.float32)
        )
        coef_const = (0.5 * kron_f64.sum(axis=0)).astype(np.float32)
    else:
        mk_dir = coef_const = None

    # Fused pallas kernel constants (see _fused_dir_cost): MK padded to
    # (Ep, Cp*n2) and pre-rounded to bf16 (the same RNE rounding XLA's
    # default-precision einsum applies to its f32 inputs), plus the 0/1
    # segment-sum matrix S. TC packs candidates into the lane dim so each
    # grid step works a (TR, TC*n2) tile; K ~ 512 keeps the MXU fed at
    # every tier (n2 = 16 would otherwise leave 7/8 of the lanes idle).
    if mk_dir is not None:
        _TC = max(1, 512 // n2)
        _Cp = ((cdir + _TC - 1) // _TC) * _TC
        _K = _TC * n2
        # E stays unpadded in HBM: Mosaic accepts block dims equal to the
        # full array dims, and padding to a lane multiple would inflate
        # the (rows, E) ext array 4-8x at the small tiers (plus a copy)
        _mkp = np.zeros((E, _Cp * n2), np.float32)
        _mkp[:, : cdir * n2] = mk_dir
        _mk_bf16 = _mkp.astype(np.dtype("bfloat16"))
        _S = np.zeros((_K, _TC), np.float32)
        for _t in range(_TC):
            _S[_t * n2 : (_t + 1) * n2, _t] = 1.0
        # nondir fused-kernel constants (_fused_nd_cost): 0/1 replication
        # matrices mapping the above row / left column onto the row-major
        # (y*bw + x) pixel order, the per-position smooth weights, and the
        # bf16-prerounded DCT (same RNE rounding the XLA einsum applies)
        _arep = np.zeros((bw, n2), np.float32)
        _lrep = np.zeros((bh, n2), np.float32)
        for _y in range(bh):
            for _x in range(bw):
                _arep[_x, _y * bw + _x] = 1.0
                _lrep[_y, _y * bw + _x] = 1.0
        _whv = np.asarray(
            [float(sm_h[y]) for y in range(bh) for _ in range(bw)],
            np.float32)[None, :]
        _wwv = np.asarray(
            [float(sm_w[x]) for _ in range(bh) for x in range(bw)],
            np.float32)[None, :]
        _kt_bf16 = kron_t.astype(np.dtype("bfloat16"))
    else:
        _mk_bf16 = _S = _arep = _lrep = _whv = _wwv = _kt_bf16 = None

    def _fused_nd_cost(ab2, lf2, sc2, blocks2, inv_scale, scale, bias, lam):
        """Nondirectional-family costs (DC, SMOOTH, SMOOTH_V, SMOOTH_H,
        PAETH — the NONDIR5 order) as one pallas kernel per tier: the
        five predictors are built EXACTLY in VMEM from the (rows, bw/bh)
        neighbor tensors (integer replication via 0/1 matmuls at HIGHEST
        precision, then the same f32 expressions and floors the XLA path
        evaluates — bit-identical predictor values), so the
        (rows, 5, n2) predictor/residual/coefficient tensors — the
        pass-1 program's largest remaining HBM materializations after
        the directional fusion (63 MB apiece at 1 MP) — never leave
        VMEM. The DCT sees the same bf16-rounded residuals as the XLA
        einsum; only reduction structure differs (near-tie argmin flips,
        same accepted class as _fused_dir_cost).

        ab2 (R, bw), lf2 (R, bh), sc2 (R, 2) = [al, dc], blocks2 (R, n2)
        — all f32. Returns (R, 5) f32 costs."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        R = ab2.shape[0]
        TR = 512 if n2 <= 256 else 256
        Rp = ((R + TR - 1) // TR) * TR
        if Rp != R:
            ab2 = jnp.pad(ab2, ((0, Rp - R), (0, 0)))
            lf2 = jnp.pad(lf2, ((0, Rp - R), (0, 0)))
            sc2 = jnp.pad(sc2, ((0, Rp - R), (0, 0)))
            blocks2 = jnp.pad(blocks2, ((0, Rp - R), (0, 0)))
        lam2 = jnp.asarray(lam, jnp.float32).reshape(1, 1)
        hi = jax.lax.Precision.HIGHEST

        def kern(lam_ref, ab_ref, lf_ref, sc_ref, bl_ref, ar_ref, lr_ref,
                 wh_ref, ww_ref, kt_ref, inv_ref, scl_ref, bia_ref, o_ref):
            lamv = lam_ref[0, 0]
            ab = ab_ref[:]
            lf = lf_ref[:]
            a2r = jax.lax.dot_general(
                ab, ar_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            l2r = jax.lax.dot_general(
                lf, lr_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            below = lf[:, bh - 1 : bh]
            right = ab[:, bw - 1 : bw]
            al = sc_ref[:, 0:1]
            dcv = sc_ref[:, 1:2]
            wh = wh_ref[:]
            ww = ww_ref[:]
            tsm = (wh * a2r + (256.0 - wh) * below + ww * l2r
                   + (256.0 - ww) * right)
            p1 = jnp.floor((tsm + 256.0) * (1.0 / 512.0))
            p2 = jnp.floor((wh * a2r + (256.0 - wh) * below + 128.0) / 256.0)
            p3 = jnp.floor((ww * l2r + (256.0 - ww) * right + 128.0) / 256.0)
            b = l2r + a2r - al
            pl_ = jnp.abs(b - l2r)
            pt = jnp.abs(b - a2r)
            ptl = jnp.abs(b - al)
            p4 = jnp.where(
                (pl_ <= pt) & (pl_ <= ptl), l2r,
                jnp.where(pt <= ptl, a2r, jnp.broadcast_to(al, b.shape)))
            p0 = jnp.broadcast_to(dcv, b.shape)
            blocks = bl_ref[:]
            rows = []
            for p_c in (p0, p1, p2, p3, p4):
                res = blocks - p_c
                coef = jax.lax.dot_general(
                    res.astype(jnp.bfloat16), kt_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                a = jnp.abs(coef)
                l = jnp.floor(a * inv_ref[:] + bia_ref[:])
                e2 = a - l * scl_ref[:]
                u = e2 * e2 + lamv * (l + 2.0 * (l != 0.0))
                rows.append(u.sum(axis=1))
            o_ref[:] = jnp.stack(rows)

        out = pl.pallas_call(
            kern,
            grid=(Rp // TR,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TR, bw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, bh), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((5, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, Rp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(lam2, ab2, lf2, sc2, blocks2, jnp.asarray(_arep),
          jnp.asarray(_lrep), jnp.asarray(_whv), jnp.asarray(_wwv),
          jnp.asarray(_kt_bf16), inv_scale.reshape(1, n2),
          scale.reshape(1, n2), bias.reshape(1, n2))
        return out[:, :R].T

    def _fused_dir_cost(ext2, bkt2, inv_scale, scale, bias, cc, lam):
        """Directional-family costs as ONE pallas kernel per tier: the
        ext @ MK matmul, the quant chain, and the per-candidate cost
        reduction all happen on a (TR, TC*n2) VMEM tile, so the
        (rows, C*n2) candidate-coefficient tensor — the pass-1 program's
        dominant HBM traffic (written by the XLA matmul, read back by the
        fused reduce; ~1.4 GB per tier at 1 MP) — never touches HBM.

        Numerics vs the XLA path: the matmul sees the same bf16-rounded
        inputs (RNE), the quant chain runs in the |coef| domain (bit-
        identical — abs/negation are exact and floor(|t|+b) == the
        sign-split form), and the segment reduce is a 0/1 matmul at
        HIGHEST precision (exact f32 products, MXU f32 accumulation) —
        only reduction order differs from XLA's tree sum, flipping
        argmins on ~2e-5 of blocks (near-ties only; quality pinned by
        tests/test_device_search.py).

        ext2 (R, E) f32, bkt2 (R, n2) f32; returns (R, cdir) f32."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        R = ext2.shape[0]
        TR = 512
        Rp = ((R + TR - 1) // TR) * TR
        if Rp != R:
            ext2 = jnp.pad(ext2, ((0, Rp - R), (0, 0)))
            bkt2 = jnp.pad(bkt2, ((0, Rp - R), (0, 0)))
        nC = _Cp // _TC
        ccT = jnp.tile(cc, _TC)[None, :]
        invT = jnp.tile(inv_scale.reshape(-1), _TC)[None, :]
        sclT = jnp.tile(scale.reshape(-1), _TC)[None, :]
        biaT = jnp.tile(bias.reshape(-1), _TC)[None, :]
        lam2 = jnp.asarray(lam, jnp.float32).reshape(1, 1)
        TC, K, n2_ = _TC, _K, n2

        def kern(lam_ref, ext_ref, bkt_ref, mk_ref, cc_ref, inv_ref,
                 scl_ref, bia_ref, s_ref, o_ref):
            lamv = lam_ref[0, 0]
            cp = jax.lax.dot_general(
                ext_ref[:].astype(jnp.bfloat16), mk_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bt = jnp.concatenate([bkt_ref[:]] * TC, axis=1)
            a = jnp.abs(bt - (cp * (1.0 / 32.0) + cc_ref[:]))
            l = jnp.floor(a * inv_ref[:] + bia_ref[:])
            e = a - l * scl_ref[:]
            u = e * e + lamv * (l + 2.0 * (l != 0.0))
            o_ref[0] = jax.lax.dot_general(
                s_ref[:], u, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        out = pl.pallas_call(
            kern,
            grid=(Rp // TR, nC),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TR, E), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, n2_), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E, K), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((1, K), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)] * 4
              + [pl.BlockSpec((K, TC), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TC, TR), lambda i, j: (j, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nC, TC, Rp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(lam2, ext2, bkt2, jnp.asarray(_mk_bf16), ccT, invT, sclT,
          biaT, jnp.asarray(_S))
        return out.reshape(_Cp, Rp)[:cdir, :R].T

    def body(planes, dc_q, ac_q, lam, tile_px):
        P, H, W = planes.shape
        # chunk the candidate family so the (P, nblocks, CH, n2) f32
        # expansions stay bounded (~1 GB) at ANY plane size — an 8K frame
        # has 500k+ blocks at the smallest tiers
        nblocks = (H // bh) * (W // bw)
        per_cand = P * nblocks * n2 * 4
        # candidate-chunk budget: bounds the live (P, nblocks, CH, n2)
        # expansion (~1 GB). Small planes hit the cdir cap either way;
        # only HUGE single frames (8K: per_cand ~400 MB at the 8x8 tier)
        # split into many chunk passes — and an isolated A/B on the chip
        # measured the splitting NEUTRAL-to-slightly-better (1 GB 3.93 s
        # vs 4 GB 4.23 s for the whole 8K pass-1; apparent whole-encode
        # gains at bigger budgets were VM-load noise), so the budget
        # stays at 1 GB with the env knob as calibration tooling.
        chunk = max(1, min(cdir, int(os.environ.get(
            "CAVIF_TPU_CHUNK_B", 1 << 30)) // max(per_cand, 1)))
        nb = _nbrs(planes, bw, bh, bit_depth, tile_px)
        nby, nbx = nb["nby"], nb["nbx"]
        blocks_f = (
            planes.reshape(P, nby, bh, nbx, bw)
            .transpose(0, 1, 3, 2, 4)
            .reshape(P, nby, nbx, n2)
            .astype(jnp.float32)
        )
        acf = ac_q * gain
        dcf = dc_q * gain
        m = jnp.asarray(dcm)  # (1, n2), 1.0 at the DC lane
        inv_scale = (1.0 - m) * (1.0 / acf) + m * (1.0 / dcf)
        scale = (1.0 - m) * acf + m * dcf
        bias = (1.0 - m) * AC_BIAS + m * 0.5  # AC deadzone / DC round
        KT = jnp.asarray(kron_t)

        def chain(coef, res_sq=None):
            # coef: (P, nby, nbx, CH, ncoded) -> (P, nby, nbx, CH) costs
            t = coef * inv_scale
            lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + bias)
            errc = coef - lv * scale
            rate = jnp.abs(lv).sum(axis=-1) + 2.0 * (lv != 0.0).sum(axis=-1)
            cost = (errc * errc).sum(axis=-1) + lam * rate
            if res_sq is not None:
                # TX_64-family: coefficients beyond the 32x32 coded area
                # are discarded by the decoder — pure distortion (Parseval:
                # total residual energy minus the coded-area energy), same
                # as the host search's `tail` term (encoder.py)
                cost = cost + (res_sq - (coef * coef).sum(axis=-1))
            return cost

        def rd(preds_flat):
            # preds_flat: (P, nby, nbx, CH, n2) -> (P, nby, nbx, CH)
            res = blocks_f[..., None, :] - preds_flat
            coef = jnp.einsum(
                "...j,jk->...k", res, KT,
                preferred_element_type=jnp.float32,
            )
            return chain(
                coef,
                (res * res).sum(axis=-1) if ncoded != n2 else None,
            )

        if pallas_on and mk_dir is not None:
            # fused nondir kernel (exact predictors in VMEM; see
            # _fused_nd_cost) — the (rows, 5, n2) expansions never
            # materialize
            R0 = P * nby * nbx
            ndc = _fused_nd_cost(
                nb["above_s"].reshape(R0, bw).astype(jnp.float32),
                nb["left_s"].reshape(R0, bh).astype(jnp.float32),
                jnp.stack(
                    [nb["al_s"].reshape(R0), nb["dc"].reshape(R0)], -1
                ).astype(jnp.float32),
                blocks_f.reshape(R0, n2),
                inv_scale, scale, bias, lam,
            )
            costs = [ndc.reshape(P, nby, nbx, 5)]
        else:
            shape = (P, nby, nbx, bh, bw)
            a2 = nb["above_s"][..., None, :].astype(jnp.float32)
            l2 = nb["left_s"][..., :, None].astype(jnp.float32)
            dc = jnp.broadcast_to(
                nb["dc"][..., None, None].astype(jnp.float32), shape
            )
            wh = jnp.asarray(sm_h, jnp.float32)[:, None]  # (bh, 1)
            ww = jnp.asarray(sm_w, jnp.float32)[None, :]  # (1, bw)
            below = nb["left_s"][..., bh - 1][..., None, None].astype(
                jnp.float32)
            right = nb["above_s"][..., bw - 1][..., None, None].astype(
                jnp.float32)
            tsm = (wh * a2 + (256.0 - wh) * below + ww * l2
                   + (256.0 - ww) * right)
            smooth = jnp.floor((tsm + 256.0) * (1.0 / 512.0))
            smooth_v = jnp.floor(
                (wh * a2 + (256.0 - wh) * below + 128.0) / 256.0)
            smooth_h = jnp.floor(
                (ww * l2 + (256.0 - ww) * right + 128.0) / 256.0)
            alb = nb["al_s"][..., None, None].astype(jnp.float32)
            b = l2 + a2 - alb
            pl_ = jnp.abs(b - l2)
            pt = jnp.abs(b - a2)
            ptl = jnp.abs(b - alb)
            paeth = jnp.where(
                (pl_ <= pt) & (pl_ <= ptl),
                l2 + 0.0 * b,
                jnp.where(pt <= ptl, a2 + 0.0 * b, alb + 0.0 * b),
            )
            nd = jnp.stack([
                dc,
                jnp.broadcast_to(smooth, shape),
                jnp.broadcast_to(smooth_v, shape),
                jnp.broadcast_to(smooth_h, shape),
                jnp.broadcast_to(paeth, shape),
            ], axis=3)
            costs = [rd(nd.reshape(P, nby, nbx, 5, n2))]
        # directional family: one MXU matmul per chunk of candidates
        ext = nb["ext"]  # (P, nby, nbx, E) f32
        if mk_dir is not None:
            blocks_kt = jnp.einsum(
                "...j,jk->...k", blocks_f, KT,
                preferred_element_type=jnp.float32,
            )  # (P, nby, nbx, ncoded), candidate-independent
            cc = jnp.asarray(coef_const)
            if pallas_on:
                cd = _fused_dir_cost(
                    ext.reshape(P * nby * nbx, E),
                    blocks_kt.reshape(P * nby * nbx, ncoded),
                    inv_scale, scale, bias, cc, lam,
                )
                costs.append(cd.reshape(P, nby, nbx, cdir))
            else:
                # XLA coefficient-domain path (see preamble): one matmul
                # straight to DCT coefficients per chunk
                MK = jnp.asarray(mk_dir)
                # (bf16 storage for cp was tried and reverted: casting the
                # einsum output to bf16 broke XLA's epilogue fusion — the
                # f32 output, the bf16 copy, AND the upcast all
                # materialized, measuring 43 GB accessed / 82 ms vs f32's
                # 26 GB / 58 ms.)
                for c0 in range(0, cdir, chunk):
                    c1 = min(cdir, c0 + chunk)
                    sl = MK[:, c0 * ncoded : c1 * ncoded]
                    cp = jnp.einsum(
                        "...e,ec->...c", ext, sl,
                        preferred_element_type=jnp.float32,
                    )
                    coef = blocks_kt[..., None, :] - (
                        cp.reshape(P, nby, nbx, c1 - c0, ncoded)
                        * (1.0 / 32.0) + cc
                    )
                    costs.append(chain(coef))
        else:
            M = jnp.asarray(mdir)
            for c0 in range(0, cdir, chunk):
                c1 = min(cdir, c0 + chunk)
                sl = M[:, c0 * n2 : c1 * n2]
                d = jnp.einsum(
                    "...e,ec->...c", ext, sl,
                    preferred_element_type=jnp.float32,
                )
                d = jnp.floor((d + 16.0) * (1.0 / 32.0))
                costs.append(rd(d.reshape(P, nby, nbx, c1 - c0, n2)))
        cost = jnp.concatenate(costs, axis=-1)  # (P, nby, nbx, C)
        return cost + lam * jnp.asarray(pen)[None, None, None, :]

    return body


def _convert(src, model: str, depth: int):
    """On-device plane derivation from the compact upload (uint8 image or
    int16 planes) — exactly the host conversion formulas
    (ops/colorspace.py; reference av1encoder.rs:483-524)."""
    import jax.numpy as jnp

    from . import colorspace

    if model == "ycbcr":
        return colorspace.rgb_to_ycbcr(src, depth=depth).transpose(2, 0, 1)
    if model == "gbr":
        return colorspace.rgb_to_gbr(src, depth=depth).transpose(2, 0, 1)
    if model == "mono":
        x = src.astype(jnp.int32)
        if depth == 10:
            x = (x << 2) | (x >> 6)
        return x[None]
    return src.astype(jnp.int32)  # "planes"


@lru_cache(maxsize=None)
def _program(key):
    """Build + jit the whole-frame pass-1 program for one static config.

    key = (H, W, depth, model, P, min_px, max_px, use_deltas,
           ovh_block, ovh_split, rect_ovh)
    Returns (jitted fn(src, dc_q, ac_q, lam, th, tw) -> packed int8, spec)
    where
    spec is [(tag, (bw, bh), name, (nby, nbx)), ...] describing the packed
    layout for the host unpacker."""
    (H, W, depth, model, P, min_px, max_px, use_deltas,
     ovh_block, ovh_split, rect_ovh) = key[:11]
    # key[11] (when present) carries the pallas-kernel gate decision so
    # flipping CAVIF_TPU_PASS1_PALLAS (or the px cap / a compile-failure
    # fallback) retraces instead of hitting the lru cache
    pal = len(key) > 11 and bool(key[11])
    import jax
    import jax.numpy as jnp

    mode_ids_d, delta_vals_d, _ = _cand_tables(use_deltas)
    mode_ids_0, delta_vals_0, _ = _cand_tables(False)
    sq_tiers = SQ_TIERS + ((64,) if max_px >= 64 else ())
    dp_tiers = [s for s in sq_tiers if s >= min_px]

    shapes = [(s, s) for s in sq_tiers] + list(RECT_SHAPES)
    bodies = {}
    for (bw, bh) in shapes:
        # angle deltas are codeable only for blocks >= 8x8 (use_angle_delta)
        # but the 64 tier skips them: its delta candidates would bake a
        # ~230 MB directional constant into the program for leaves that are
        # overwhelmingly smooth (DC/SMOOTH territory); pass-2 still codes
        # delta 0 legally
        ud = bool(use_deltas) and min(bw, bh) >= 8 and max(bw, bh) < 64
        # chroma below 8 px inherits the 8px square parent's uv choice
        # (the host cascade's chroma-cost-spreading analog); skipping the
        # sub-8px chroma searches also shrinks the packed fetch
        uv = P > 1 and min(bw, bh) >= 8
        bodies[(bw, bh)] = (_cost_body(bw, bh, depth, ud, pal), ud, uv)

    spec = []
    for (bw, bh) in shapes:
        if (bw, bh) == (4, 4):
            # 4px modes are not fetched: D2H through the tunnel runs at
            # ~5 MB/s and the (H/4)^2 grid is the largest one; the host
            # re-searches the few 4px leaves the DP actually picks
            continue
        nby, nbx = H // bh, W // bw
        ud, uv = bodies[(bw, bh)][1:]
        names = ["y_md"] + (["uv_md"] if uv else [])
        for nm in names:
            spec.append(((bw, bh), nm, (nby, nbx)))
    for s in dp_tiers[1:]:
        spec.append(((s, s), "code", (H // s, W // s)))

    def program(src, dc_q, ac_q, lam, th, tw):
        planes = _convert(src, model, depth)
        out8 = []
        totals = {}  # (bw, bh) -> (y_min [+ uv_min] cost grid, has_uv)
        uv_min8 = [None]
        for (bw, bh) in shapes:
            body, ud, uv = bodies[(bw, bh)]
            # mode and delta+3 nibble-packed into one int8 per block
            mi = jnp.asarray(mode_ids_d if ud else mode_ids_0, jnp.int32)
            dv = jnp.asarray(delta_vals_d if ud else delta_vals_0, jnp.int32)
            md = mi | ((dv + 3) << 4)
            emit = (bw, bh) != (4, 4)
            costs = body(planes, dc_q, ac_q, lam, (th, tw))
            y = costs[0]
            if emit:
                out8.append(md[jnp.argmin(y, axis=-1)])
            tot = jnp.min(y, axis=-1)
            if uv:
                uvc = costs[1] + costs[2]  # joint U+V (shared uv mode)
                if emit:
                    out8.append(md[jnp.argmin(uvc, axis=-1)])
                uvm = jnp.min(uvc, axis=-1)
                tot = tot + uvm
                if (bw, bh) == (8, 8):
                    uv_min8[0] = uvm
            totals[(bw, bh)] = (tot, uv)

        # bottom-up partition DP (host _rdo_partition merge semantics:
        # candidate order NONE, SPLIT, HORZ, VERT; ties to the earlier).
        # At the 8px merge the sub-8px children/halves carry luma-only
        # costs: the 8px parent's own chroma cost rides the SPLIT/HORZ/
        # VERT sides (the host's uv-share spreading, summed back up).
        ovb = lam * ovh_block
        ovs = lam * ovh_split
        rovh = lam * (ovh_split + rect_ovh * ovh_block)
        bc = totals[(dp_tiers[0], dp_tiers[0])][0] + ovb
        codes = []
        for s in dp_tiers[1:]:
            nby, nbx = H // s, W // s
            q = bc.reshape(nby, 2, nbx, 2).sum(axis=(1, 3))
            none_c = totals[(s, s)][0] + ovb
            split_c = ovs + q
            if s >= 64:
                # the 64 tier has no rect candidates (the host codes no
                # 64-rect leaves; TX_64X64 NONE vs SPLIT only); its 32px
                # children already carry chroma
                cand = jnp.stack([none_c, split_c])
            else:
                h2 = s // 2
                htot, huv = totals[(s, h2)]
                vtot, _ = totals[(h2, s)]
                horz_c = rovh + htot[0::2] + htot[1::2]
                vert_c = rovh + vtot[:, 0::2] + vtot[:, 1::2]
                if P > 1 and not totals[(h2, h2)][1]:
                    # children below 8px are luma-only: the parent's chroma
                    # cost joins the split side (and rect halves likewise)
                    split_c = split_c + uv_min8[0]
                    horz_c = horz_c + uv_min8[0]
                    vert_c = vert_c + uv_min8[0]
                cand = jnp.stack([none_c, split_c, horz_c, vert_c])
            codes.append(jnp.argmin(cand, axis=0).astype(jnp.int8))
            bc = jnp.min(cand, axis=0)
        out8.extend(codes)
        return jnp.concatenate(
            [g.reshape(-1).astype(jnp.int8) for g in out8]
        )

    return jax.jit(program), spec


_BATCH_JITS: dict = {}  # (program key, mesh fingerprint) -> sharded jit


@lru_cache(maxsize=None)
def _program_batch(key):
    """Batched twin of _program for same-shaped images: one jitted program
    over (B, H, W, 3) uint8 RGB (model="ycbcr", on-device conversion) or
    (B, H, W) uint8 alpha planes (model="mono", Cs400 streams) — the
    whole-batch device pass-1 that shards over a (data = images,
    tile = block rows) mesh. Shares the per-shape cost bodies (their
    leading plane axis carries B*P). Returns (jitted fn, spec) with every
    spec grid carrying a leading B."""
    (B, H, W, depth, model, min_px, max_px, use_deltas,
     ovh_block, ovh_split, rect_ovh) = key[:11]
    pal = len(key) > 11 and bool(key[11])
    import jax
    import jax.numpy as jnp

    from . import colorspace

    P = 3 if model == "ycbcr" else 1
    mode_ids_d, delta_vals_d, _ = _cand_tables(use_deltas)
    mode_ids_0, delta_vals_0, _ = _cand_tables(False)
    sq_tiers = SQ_TIERS + ((64,) if max_px >= 64 else ())
    dp_tiers = [s for s in sq_tiers if s >= min_px]
    shapes = [(s, s) for s in sq_tiers] + list(RECT_SHAPES)
    bodies = {}
    for (bw, bh) in shapes:
        ud = bool(use_deltas) and min(bw, bh) >= 8 and max(bw, bh) < 64
        uv = P > 1 and min(bw, bh) >= 8
        bodies[(bw, bh)] = (_cost_body(bw, bh, depth, ud, pal), ud, uv)

    spec = []
    for (bw, bh) in shapes:
        if (bw, bh) == (4, 4):
            # 4px modes are not fetched: D2H through the tunnel runs at
            # ~5 MB/s and the (H/4)^2 grid is the largest one; the host
            # re-searches the few 4px leaves the DP actually picks
            continue
        nby, nbx = H // bh, W // bw
        ud, uv = bodies[(bw, bh)][1:]
        names = ["y_md"] + (["uv_md"] if uv else [])
        for nm in names:
            spec.append(((bw, bh), nm, (nby, nbx)))
    for s in dp_tiers[1:]:
        spec.append(((s, s), "code", (H // s, W // s)))

    def program(src, dc_q, ac_q, lam, th, tw):
        if model == "ycbcr":
            ycbcr = colorspace.rgb_to_ycbcr(src, depth=depth)  # (B,H,W,3)
            planes = ycbcr.transpose(0, 3, 1, 2).reshape(B * 3, H, W)
        else:  # mono alpha plane batch
            x = src.astype(jnp.int32)
            if depth == 10:
                x = (x << 2) | (x >> 6)
            planes = x.reshape(B, H, W)
        out8 = []
        totals = {}
        uv_min8 = [None]
        for (bw, bh) in shapes:
            body, ud, uv = bodies[(bw, bh)]
            mi = jnp.asarray(mode_ids_d if ud else mode_ids_0, jnp.int32)
            dv = jnp.asarray(delta_vals_d if ud else delta_vals_0, jnp.int32)
            md = mi | ((dv + 3) << 4)
            emit = (bw, bh) != (4, 4)
            costs = body(planes, dc_q, ac_q, lam, (th, tw))
            nby, nbx = costs.shape[1], costs.shape[2]
            c = costs.reshape(B, P, nby, nbx, -1)
            y = c[:, 0]
            if emit:
                out8.append(md[jnp.argmin(y, axis=-1)])
            tot = jnp.min(y, axis=-1)
            if uv:
                uvc = c[:, 1] + c[:, 2]
                if emit:
                    out8.append(md[jnp.argmin(uvc, axis=-1)])
                uvm = jnp.min(uvc, axis=-1)
                tot = tot + uvm
                if (bw, bh) == (8, 8):
                    uv_min8[0] = uvm
            totals[(bw, bh)] = (tot, uv)

        ovb = lam * ovh_block
        ovs = lam * ovh_split
        rovh = lam * (ovh_split + rect_ovh * ovh_block)
        bc = totals[(dp_tiers[0], dp_tiers[0])][0] + ovb
        codes = []
        for s in dp_tiers[1:]:
            nby, nbx = H // s, W // s
            q = bc.reshape(B, nby, 2, nbx, 2).sum(axis=(2, 4))
            none_c = totals[(s, s)][0] + ovb
            split_c = ovs + q
            if s >= 64:
                # no rect candidates at 64 (TX_64X64 NONE vs SPLIT only)
                cand = jnp.stack([none_c, split_c])
                codes.append(jnp.argmin(cand, axis=0).astype(jnp.int8))
                bc = jnp.min(cand, axis=0)
                continue
            h2 = s // 2
            htot, _ = totals[(s, h2)]
            vtot, _ = totals[(h2, s)]
            horz_c = rovh + htot[:, 0::2] + htot[:, 1::2]
            vert_c = rovh + vtot[:, :, 0::2] + vtot[:, :, 1::2]
            if P > 1 and not totals[(h2, h2)][1]:
                split_c = split_c + uv_min8[0]
                horz_c = horz_c + uv_min8[0]
                vert_c = vert_c + uv_min8[0]
            cand = jnp.stack([none_c, split_c, horz_c, vert_c])
            codes.append(jnp.argmin(cand, axis=0).astype(jnp.int8))
            bc = jnp.min(cand, axis=0)
        out8.extend(codes)
        return jnp.concatenate(
            [g.reshape(B, -1).astype(jnp.int8) for g in out8], axis=1
        )

    return jax.jit(program), spec


def run_pass1_batch(
    srcs: np.ndarray,
    *,
    depth: int,
    tile_px: tuple,
    min_px: int,
    max_px: int = 32,
    use_deltas: bool,
    dc_q: int,
    ac_q: int,
    lam: float,
    ovh_block: float = 23.0,
    ovh_split: float = 2.0,
    rect_ovh: float = 4.0,
    model: str = "ycbcr",
    mesh=None,
) -> list:
    """Whole-batch device pass-1 over same-shaped images.
    srcs: (B, H, W, 3) uint8 RGB (model="ycbcr") or (B, H, W) uint8 alpha
    planes (model="mono"), H/W multiples of 64 (padded). With a mesh, the
    batch shards over (data = images, tile = block rows) — GSPMD turns
    the neighbor-row shifts into halo exchanges along `tile` and the
    output gathers back replicated. Returns a list of B per-image grid
    dicts in run_pass1's format."""
    import jax
    import jax.numpy as jnp

    _ensure_compile_cache()
    B, H, W = srcs.shape[:3]
    # pixel budget per program invocation: the per-shape candidate
    # expansions scale with B*H*W and XLA keeps several candidate chunks
    # live at once — a 128-image 512px bucket measured 17.9G of HBM temps
    # on a 16G v5e. Large batches run as fixed-size sub-batches (padded
    # tail), which also reuse ONE compiled program.
    # 4.2M px/invocation measured as the knee on the v5e: bigger batches
    # split the candidate family into more chunk passes (re-reading the
    # candidate-independent tensors each pass — 8.4M px measured 47% more
    # HBM bytes/MP and ~2x lower achieved bandwidth), smaller ones pay
    # per-call round trips
    budget = int(os.environ.get("CAVIF_TPU_BATCH_PX", 4_200_000))
    max_b = max(1, budget // (H * W))
    if mesh is not None:
        dn = mesh.shape.get("data", 1)
        max_b = max(dn, (max_b // dn) * dn)
    if B > max_b:
        out = []
        for i in range(0, B, max_b):
            sub = srcs[i : i + max_b]
            if sub.shape[0] < max_b:  # pad: same compiled program
                reps = np.repeat(sub[-1:], max_b - sub.shape[0], axis=0)
                sub = np.concatenate([sub, reps], axis=0)
            out.extend(
                run_pass1_batch(
                    sub, depth=depth, tile_px=tile_px, min_px=min_px,
                    max_px=max_px, use_deltas=use_deltas, dc_q=dc_q,
                    ac_q=ac_q, lam=lam, ovh_block=ovh_block,
                    ovh_split=ovh_split, rect_ovh=rect_ovh, model=model,
                    mesh=mesh,
                )[: min(max_b, B - i)]
            )
        return out
    # canonicalize the compiled batch size: pad B up to the next power of
    # two (capped at max_b) so each (shape, model) has a bounded set of
    # programs — variable batch sizes otherwise compile a fresh ~20-60 s
    # program per distinct B (padded tail grids are discarded below)
    nb_t = min(max_b, 1 << max(0, B - 1).bit_length())
    if mesh is not None:
        dn = mesh.shape.get("data", 1)
        nb_t = max(dn, (nb_t + dn - 1) // dn * dn)
    if B < nb_t:
        reps = np.repeat(srcs[-1:], nb_t - B, axis=0)
        srcs = np.concatenate([srcs, reps], axis=0)
    nb = srcs.shape[0]
    key = (
        nb, H, W, depth, model, int(min_px), int(max_px),
        bool(use_deltas), float(ovh_block), float(ovh_split),
        float(rect_ovh), _pass1_pallas_enabled(nb * H * W),
    )
    if key in _PALLAS_BAD:
        key = key[:11] + (False,)
    prog, spec = _program_batch(key)
    arr = jnp.asarray(srcs)
    args = (jnp.float32(dc_q), jnp.float32(ac_q), jnp.float32(lam),
            jnp.int32(tile_px[0]), jnp.int32(tile_px[1]))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ins = NamedSharding(
            mesh,
            P("data", "tile", None, None) if model == "ycbcr"
            else P("data", "tile", None),
        )
        mkey = (key, tuple(sorted(mesh.shape.items())),
                tuple(d.id for d in mesh.devices.flat))
        f = _BATCH_JITS.get(mkey)
        if f is None:
            f = jax.jit(
                prog,
                in_shardings=(ins, None, None, None, None, None),
                out_shardings=NamedSharding(mesh, P()),  # replicated (tiny)
            )
            _BATCH_JITS[mkey] = f
        arr = jax.device_put(arr, ins)
        packed = np.asarray(f(arr, *args))
    else:
        packed = np.asarray(prog(arr, *args))
    out = [dict() for _ in range(B)]
    off = 0
    for (shape, name, (nby, nbx)) in spec:
        n = nby * nbx
        for b in range(B):
            out[b][(shape, name)] = packed[b, off : off + n].reshape(nby, nbx)
        off += n
    assert off == packed.shape[1], (off, packed.shape)
    return out


# Optional per-call hooks around the per-frame device round trip
# (upload, program, packed fetch). The hybrid batch scheduler
# (parallel/batch.py) installs an object whose start() acquires a device
# slot and done() releases it, so a slot bounds IN-FLIGHT TUNNEL CALLS
# only (holding it through the encode's host phase starved the chip,
# VERDICT r03 next-1). Scoped through a ContextVar — NOT a module global
# — so two concurrent encode_batch calls in one process each see only
# their own hooks (a global would let them cross-release each other's
# slots), and pipeline._encode_streams copies the context into its
# color/alpha stream threads so an RGBA encode's BOTH device calls stay
# under the installing call's slot bound. done() fires on success or
# failure (run_pass1 brackets the round trip in try/finally).
import contextvars

PASS1_HOOKS: "contextvars.ContextVar" = contextvars.ContextVar(
    "cavif_tpu_pass1_hooks", default=None
)

# last single-frame program key + runtime args run_pass1 used
# (diagnostics: bench.py's MFU entry profiles the exact production
# program WITH the production quantizer/lambda/tile args instead of
# guessing either and silently compiling or mis-timing a second,
# non-production variant on drift)
LAST_KEY = None
LAST_ARGS = None  # (dc_q, ac_q, lam, tile_px)


def run_pass1(
    src: np.ndarray,
    *,
    depth: int,
    model: str,
    num_planes: int,
    tile_px: tuple,
    min_px: int,
    max_px: int = 32,
    use_deltas: bool,
    dc_q: int,
    ac_q: int,
    lam: float,
    ovh_block: float = 15.0,
    ovh_split: float = 2.0,
    rect_ovh: float = 4.0,
) -> dict:
    """Run the fused pass-1 for one frame. src: (H, W, 3) uint8 for
    ycbcr/gbr, (H, W) uint8 for mono, or (P, H, W) int16/int32 planes for
    model="planes"; H, W must be multiples of 64 (the encoder's padded
    dims). Returns {((bw, bh), name): int8 grid} host arrays; grids for
    the DP codes exist for tiers above min_px ("code": 0 NONE, 1 SPLIT,
    2 HORZ, 3 VERT). The totals grid layout indexes [by, bx] of the
    aligned block grid over the padded plane."""
    import jax.numpy as jnp

    _ensure_compile_cache()
    if model == "planes":
        P, H, W = src.shape
    else:
        H, W = src.shape[:2]
        P = num_planes
    key = (
        H, W, depth, model, P,
        int(min_px), int(max_px), bool(use_deltas),
        float(ovh_block), float(ovh_split), float(rect_ovh),
        _pass1_pallas_enabled(H * W),
    )
    if key in _PALLAS_BAD:
        key = key[:11] + (False,)
    global LAST_KEY, LAST_ARGS
    LAST_KEY = key
    LAST_ARGS = (float(dc_q), float(ac_q), float(lam),
                 (int(tile_px[0]), int(tile_px[1])))
    prog, spec = _program(key)
    hooks = PASS1_HOOKS.get()
    if hooks is not None:
        hooks.start()
    try:
        args = (
            jnp.asarray(src),
            jnp.float32(dc_q),
            jnp.float32(ac_q),
            jnp.float32(lam),
            jnp.int32(tile_px[0]),
            jnp.int32(tile_px[1]),
        )
        try:
            packed = np.asarray(prog(*args))
        except Exception as e:
            if not key[-1]:
                raise
            # pallas program failed (observed: the remote TPU compiler
            # crashes on the very largest whole-frame programs) — fall
            # back to the always-compiling XLA formulation and remember
            import sys as _sys

            print(
                "cavif-tpu: pallas pass-1 failed (%s); using the XLA "
                "formulation for this shape" % type(e).__name__,
                file=_sys.stderr,
            )
            _PALLAS_BAD.add(key)
            key = key[:11] + (False,)
            LAST_KEY = key
            prog, spec = _program(key)
            packed = np.asarray(prog(*args))
    finally:
        if hooks is not None:
            hooks.done()
    out = {}
    off = 0
    for (shape, name, (nby, nbx)) in spec:
        n = nby * nbx
        out[(shape, name)] = packed[off : off + n].reshape(nby, nbx)
        off += n
    assert off == packed.size, (off, packed.size)
    return out

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

from ..av1.transforms import AC_BIAS, dct2_matrix, get_gain

# candidate order: single definition site native/op_contract.h
# (first 7 = DC,V,H,SMOOTH,SM_V,SM_H,PAETH; last 6 = D45,D135,D113,
#  D157,D203,D67 at delta 0)
from ..native.contract import CAND_MODES

NONDIRECTIONAL = CAND_MODES[:7]
DIAG_MODES = CAND_MODES[7:]


def _neighbors(planes, n: int, bit_depth: int):
    """Per-block neighbor tensors with availability fallbacks resolved
    (jnp, jit-traceable). planes: (N, H, W) int32.

    Returns a dict of per-block tensors shaped (N, nby, nbx, ...):
      above, left   — raw neighbor row/col (zeros where unavailable)
      above_s/left_s/al_s — fallback-resolved values (spec defaults)
      dc            — the DC predictor value per block
      above_ext/left_ext — (..., 2n) resolved extended neighbors
      al            — resolved above-left
    Shared by the XLA and the Pallas search backends."""
    import jax.numpy as jnp

    N, H, W = planes.shape
    nby, nbx = H // n, W // n
    base = 1 << (bit_depth - 1)
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

    ha = have_a[..., None]
    hl = have_l[..., None]
    a0 = above[..., 0:1]
    l0 = left[..., 0:1]
    above_s = jnp.where(ha, above, jnp.where(hl, l0, base - 1))
    left_s = jnp.where(hl, left, jnp.where(ha, a0, base + 1))
    al_s = jnp.where(
        have_a & have_l,
        al,
        jnp.where(have_a, above[..., 0], jnp.where(have_l, left[..., 0], base)),
    )
    sum_a = above.sum(-1)
    sum_l = left.sum(-1)
    log2n = n.bit_length() - 1
    avg_both = (sum_a + sum_l + n) // (2 * n)
    avg_a = (sum_a + (n >> 1)) >> log2n
    avg_l = (sum_l + (n >> 1)) >> log2n
    dc = jnp.where(
        have_a & have_l,
        avg_both,
        jnp.where(have_a, avg_a, jnp.where(have_l, avg_l, base)),
    )

    # extended neighbors for the diagonal modes (host-search
    # approximation: no above-right/below-left, replicate the edge)
    rows2 = jnp.pad(
        planes[:, n - 1 :: n, :], ((0, 0), (0, 0), (0, n)), mode="edge"
    )
    ae = jnp.stack(
        [rows2[:, :, j * n : j * n + 2 * n] for j in range(nbx)], axis=2
    )  # (N, nby, nbx, 2n)
    above_ext = jnp.concatenate(
        [jnp.zeros_like(ae[:, :1]), ae[:, :-1]], axis=1
    )
    cols2 = jnp.pad(
        planes[:, :, n - 1 :: n], ((0, 0), (0, n), (0, 0)), mode="edge"
    )
    le = jnp.stack(
        [cols2[:, i * n : i * n + 2 * n, :] for i in range(nby)], axis=1
    ).transpose(0, 1, 3, 2)  # (N, nby, nbx, 2n)
    left_ext = jnp.concatenate(
        [jnp.zeros_like(le[:, :, :1]), le[:, :, :-1]], axis=2
    )
    both_missing = ~have_a & ~have_l
    only_a = have_a & ~have_l
    only_l = ~have_a & have_l
    above_ext = jnp.where(
        both_missing[..., None], base - 1,
        jnp.where(only_l[..., None], left_ext[..., 0:1], above_ext),
    )
    left_ext = jnp.where(
        both_missing[..., None], base + 1,
        jnp.where(only_a[..., None], above_ext[..., 0:1], left_ext),
    )
    al_ext = jnp.where(
        both_missing, base,
        jnp.where(only_a, above_ext[..., 0],
                  jnp.where(only_l, left_ext[..., 0], al)),
    )
    return dict(
        above=above, left=left, al=al_ext, have_a=have_a, have_l=have_l,
        above_s=above_s, left_s=left_s, al_s=al_s, dc=dc,
        above_ext=above_ext, left_ext=left_ext,
    )


@lru_cache(maxsize=None)
def _kernel(n: int, bit_depth: int, mtx_key: int = 0):
    import jax

    return jax.jit(_search_body(n, bit_depth))


def _search_body(n: int, bit_depth: int):
    """Builds the traceable whole-plane search for one block size (shared
    by the single-tier jit and the multi-tier partition program)."""
    import jax.numpy as jnp

    from ..av1 import tables

    sm_w = jnp.asarray(np.asarray(tables.get(f"sm_weights_{n}"), np.int32))
    dct = jnp.asarray(dct2_matrix(n, np.float32))
    gain = np.float32(get_gain(n, n))
    base = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1

    def predict7(above_s, left_s, al_s, dc_val):
        # above_s/left_s: (..., n) resolved; al_s/dc_val: (...)
        a2 = above_s[..., None, :]  # (..., 1, n)
        l2 = left_s[..., :, None]  # (..., n, 1)
        shape = above_s.shape[:-1] + (n, n)
        dc = jnp.broadcast_to(dc_val[..., None, None], shape)
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

    from ..av1.predict import _dir_grids

    # directional gather grids as device constants (delta 0)
    dir_grids = []
    for mode in DIAG_MODES:
        kind, a1, a2, a3, a4, mask = _dir_grids(mode, n, n)
        if kind == "zone2":
            b1, wa0, wa1 = a1
            b2, wl0, wl1 = a2
            dir_grids.append(
                ("zone2", jnp.asarray(b1), jnp.asarray(wa0), jnp.asarray(wa1),
                 jnp.asarray(b2), jnp.asarray(wl0), jnp.asarray(wl1),
                 jnp.asarray(mask))
            )
        else:
            dir_grids.append(
                (kind, jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(a3),
                 jnp.asarray(a4), jnp.asarray(mask))
            )

    def predict_dir(above_ext, left_ext, al):
        # above_ext/left_ext: (..., 2n); al: (...)
        outs = []
        ali = al[..., None]
        for g in dir_grids:
            if g[0] == "above":
                _, b, w0, b1, w1, mask = g
                val = (
                    above_ext[..., b] * w0 + above_ext[..., b1] * w1 + 16
                ) >> 5
                outs.append(
                    jnp.where(mask, val, above_ext[..., 2 * n - 1][..., None, None])
                )
            elif g[0] == "left":
                _, b, w0, b1, w1, mask = g
                val = (
                    left_ext[..., b] * w0 + left_ext[..., b1] * w1 + 16
                ) >> 5
                outs.append(
                    jnp.where(mask, val, left_ext[..., 2 * n - 1][..., None, None])
                )
            else:
                _, b1, wa0, wa1, b2, wl0, wl1, mask = g
                ab = jnp.concatenate([ali, above_ext], axis=-1)
                av = (ab[..., b1] * wa0 + ab[..., b1 + 1] * wa1 + 16) >> 5
                lc = jnp.concatenate([ali, left_ext], axis=-1)
                lv_ = (lc[..., b2] * wl0 + lc[..., b2 + 1] * wl1 + 16) >> 5
                outs.append(jnp.where(mask, av, lv_))
        return jnp.stack(outs, axis=-3)  # (..., 6, n, n)

    def search(planes, dc_q, ac_q, lam):
        """planes: (N, H, W) int32; returns best-mode index (N, H/n, W/n)
        into CAND_MODES. Mirrors the host search (13 candidates,
        transform-domain RD; no SAD pruning — the MXU eats all 13)."""
        N, H, W = planes.shape
        nby, nbx = H // n, W // n
        blocks = planes.reshape(N, nby, n, nbx, n).transpose(0, 1, 3, 2, 4)
        nb = _neighbors(planes, n, bit_depth)
        preds7 = predict7(nb["above_s"], nb["left_s"], nb["al_s"], nb["dc"])
        preds6 = predict_dir(nb["above_ext"], nb["left_ext"], nb["al"])
        preds = jnp.concatenate([preds7, preds6], axis=-3)  # (..., 13, n, n)
        res = (blocks[..., None, :, :] - preds).astype(jnp.float32)
        coef = dct @ res @ dct.T
        acf = ac_q.astype(jnp.float32) * gain
        dcf = dc_q.astype(jnp.float32) * gain
        t = coef * (1.0 / acf)
        t = t.at[..., 0, 0].set(coef[..., 0, 0] * (1.0 / dcf))
        lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + AC_BIAS)  # AC deadzone
        lv = lv.at[..., 0, 0].set(
            jnp.sign(t[..., 0, 0]) * jnp.floor(jnp.abs(t[..., 0, 0]) + 0.5)
        )
        deq = lv * acf
        deq = deq.at[..., 0, 0].set(lv[..., 0, 0] * dcf)
        errc = coef - deq
        rate = jnp.abs(lv).sum(axis=(-2, -1)) + 2.0 * (lv != 0).sum(
            axis=(-2, -1)
        )
        cost = (errc * errc).sum(axis=(-2, -1)) + lam * rate
        cost = cost.at[..., 7:].add(lam * 7.0)  # diag rate proxy (A/B-tuned)
        return (
            jnp.argmin(cost, axis=-1).astype(jnp.int8),
            jnp.min(cost, axis=-1).astype(jnp.float32),
        )

    return search


@lru_cache(maxsize=None)
def _partition_body(bit_depth: int, min_n: int = 8, max_n: int = 32,
                    ovh_block: float = 15.0, ovh_split: float = 2.0):
    """The full device pass-1: per-tier 13-mode searches over every aligned
    square at n in [min_n, max_n] plus the bottom-up NONE/SPLIT partition
    DP — one traceable program (the device analog of the native
    bs_partition_tile's square tiers; rect halves and the SAD-pruned
    cascade stay host-side refinements).

    Returns ({n: (modes int8, costs f32)}, {n: codes int8}) where codes
    are 0=NONE 1=SPLIT per aligned square of each tier above min_n."""
    import jax.numpy as jnp

    sizes = []
    n = min_n
    while n <= max_n:
        sizes.append(n)
        n *= 2
    bodies = {n: _search_body(n, bit_depth) for n in sizes}

    def program(planes, dc_q, ac_q, lam):
        tiers = {n: bodies[n](planes, dc_q, ac_q, lam) for n in sizes}
        codes = {}
        bc = tiers[sizes[0]][1] + lam * ovh_block
        for n in sizes[1:]:
            N, nby, nbx = tiers[n][1].shape
            q = bc.reshape(N, nby, 2, nbx, 2).sum(axis=(2, 4))
            split_c = lam * ovh_split + q
            none_c = tiers[n][1] + lam * ovh_block
            codes[n] = (split_c < none_c).astype(jnp.int8)
            bc = jnp.minimum(none_c, split_c)
        return tiers, codes

    return program


@lru_cache(maxsize=None)
def _partition_jit(bit_depth: int, min_n: int, max_n: int):
    """jit-compiled (and cached — a fresh jax.jit per call would recompile
    every invocation) multi-tier partition program."""
    import jax

    return jax.jit(_partition_body(bit_depth, min_n, max_n))


def plane_partition_search(
    planes: np.ndarray,
    dc_q: int,
    ac_q: int,
    lam: float,
    bit_depth: int,
    min_n: int = 8,
    max_n: int = 32,
    mesh=None,
):
    """Run the whole-plane multi-tier search + partition DP on device.
    planes: (N, H, W) int32 with H, W multiples of max_n. With a mesh,
    shards over (data = images, tile = block rows) — the neighbor shifts
    become halo exchanges along `tile` under GSPMD.

    Returns ({n: (modes, costs)}, {n: codes}) as host numpy arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    f = _partition_jit(bit_depth, min_n, max_n)
    arr = np.ascontiguousarray(planes, np.int32)
    if mesh is not None:
        arr = jax.device_put(arr, NamedSharding(mesh, P("data", "tile", None)))
    tiers, codes = f(
        arr, np.float32(dc_q), np.float32(ac_q), np.float32(lam)
    )
    tiers = {n: (np.asarray(m), np.asarray(c)) for n, (m, c) in tiers.items()}
    codes = {n: np.asarray(v) for n, v in codes.items()}
    return tiers, codes


def plane_mode_search(
    planes: np.ndarray,
    dc_q: int,
    ac_q: int,
    lam: float,
    bit_depth: int,
    n: int = 32,
    backend: str = "xla",
):
    """Search the best intra mode (13 candidates) for every aligned n x n
    block of a batch of planes. planes: (N, H, W) with H, W multiples of n.
    Returns (N, H/n, W/n) int8 indices into CAND_MODES.

    backend: "xla" (jnp whole-plane program), "pallas" (fused VMEM kernel,
    ops/pallas_search.py; TPU hardware path needs n <= 16), or "auto"
    (pallas on TPU when n <= 16, else xla)."""
    import jax.numpy as jnp

    if backend == "auto":
        import jax

        backend = (
            "pallas" if jax.default_backend() == "tpu" and n <= 16 else "xla"
        )
    if backend == "pallas":
        from .pallas_search import plane_mode_search_pallas

        return plane_mode_search_pallas(
            planes, dc_q, ac_q, lam, bit_depth, n=n
        )
    f = _kernel(n, bit_depth)
    out, _ = f(
        jnp.asarray(np.ascontiguousarray(planes, np.int32)),
        jnp.asarray(dc_q, jnp.float32),
        jnp.asarray(ac_q, jnp.float32),
        jnp.asarray(lam, jnp.float32),
    )
    return np.asarray(out)


def plane_mode_search_costs(
    planes: np.ndarray,
    dc_q: int,
    ac_q: int,
    lam: float,
    bit_depth: int,
    n: int = 32,
    backend: str = "xla",
):
    """Like plane_mode_search but also returns the winning RD cost per
    block: (modes int8 (N, H/n, W/n), costs f32 (N, H/n, W/n))."""
    import jax.numpy as jnp

    if backend == "pallas":
        from .pallas_search import plane_mode_search_pallas

        return plane_mode_search_pallas(
            planes, dc_q, ac_q, lam, bit_depth, n=n, return_costs=True
        )
    f = _kernel(n, bit_depth)
    modes, costs = f(
        jnp.asarray(np.ascontiguousarray(planes, np.int32)),
        jnp.asarray(dc_q, jnp.float32),
        jnp.asarray(ac_q, jnp.float32),
        jnp.asarray(lam, jnp.float32),
    )
    return np.asarray(modes), np.asarray(costs)

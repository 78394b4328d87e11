"""Pallas mode-search backend: exactness of the constant-matrix
directional predictors and agreement with the XLA backend."""

import numpy as np
import pytest

from cavif_tpu.ops.block_search import DIAG_MODES, _neighbors, plane_mode_search
from cavif_tpu.ops.pallas_search import _dir_matrix, plane_mode_search_pallas


def test_dir_matrix_exact():
    """ext @ Mdir (+16 >> 5) must reproduce the integer directional
    predictors bit-exactly for every diagonal mode."""
    from cavif_tpu.av1.predict import predict_dir_batch

    n = 16
    rng = np.random.default_rng(3)
    B = 5
    above_ext = rng.integers(0, 1024, (B, 2 * n), dtype=np.int64)
    left_ext = rng.integers(0, 1024, (B, 2 * n), dtype=np.int64)
    al = rng.integers(0, 1024, (B,), dtype=np.int64)
    ref = predict_dir_batch(
        list(DIAG_MODES), above_ext, left_ext, al, n, n
    )  # (B, 6, n, n)

    M = _dir_matrix(n).astype(np.float64)  # (4n+1, 6*n*n)
    ext = np.concatenate([al[:, None], above_ext, left_ext], axis=1)
    got = np.floor((ext.astype(np.float64) @ M + 16.0) / 32.0)
    got = got.reshape(B, 6, n, n).astype(np.int64)
    np.testing.assert_array_equal(got, ref)


def _oracle_costs(planes, nb, n, pi, by, bx, dc_q, ac_q, lam):
    """Float64 RD costs of all 13 modes for one block (reference oracle)."""
    from cavif_tpu.av1 import tables
    from cavif_tpu.av1.transforms import dct2_matrix, get_gain

    smw = np.asarray(tables.get(f"sm_weights_{n}"), np.int64)
    D = dct2_matrix(n, np.float64)
    gain = get_gain(n, n)
    M = _dir_matrix(n).astype(np.float64)
    N, H, W = planes.shape
    nby, nbx_ = H // n, W // n
    blk = planes.reshape(N, nby, n, nbx_, n).transpose(0, 1, 3, 2, 4)[
        pi, by, bx
    ].astype(np.int64)
    a = nb["above_s"][pi, by, bx].astype(np.int64)
    l = nb["left_s"][pi, by, bx].astype(np.int64)
    als = int(nb["al_s"][pi, by, bx])
    dcv = int(nb["dc"][pi, by, bx])
    ext = np.concatenate(
        [[nb["al"][pi, by, bx]], nb["above_ext"][pi, by, bx],
         nb["left_ext"][pi, by, bx]]
    ).astype(np.float64)
    wh, ww = smw[:, None], smw[None, :]
    below, right = l[n - 1], a[n - 1]
    b_ = l[:, None] + a[None, :] - als
    pl_, pt = np.abs(b_ - l[:, None]), np.abs(b_ - a[None, :])
    ptl = np.abs(b_ - als)
    preds = [
        np.full((n, n), dcv),
        np.broadcast_to(a[None, :], (n, n)),
        np.broadcast_to(l[:, None], (n, n)),
        (wh * a[None, :] + (256 - wh) * below + ww * l[:, None]
         + (256 - ww) * right + 256) >> 9,
        (wh * a[None, :] + (256 - wh) * below + 128) >> 8,
        (ww * l[:, None] + (256 - ww) * right + 128) >> 8,
        np.where((pl_ <= pt) & (pl_ <= ptl),
                 np.broadcast_to(l[:, None], (n, n)),
                 np.where(pt <= ptl, np.broadcast_to(a[None, :], (n, n)),
                          als)),
    ] + list(np.floor((ext @ M + 16) / 32).reshape(6, n, n))
    acf, dcf = ac_q * gain, dc_q * gain
    bias = np.full((n, n), 0.35)
    bias[0, 0] = 0.5
    costs = []
    for mi, p in enumerate(preds):
        coef = D @ (blk - p).astype(np.float64) @ D.T
        t = coef / acf
        t[0, 0] = coef[0, 0] / dcf
        lv = np.sign(t) * np.floor(np.abs(t) + bias)
        deq = lv * acf
        deq[0, 0] = lv[0, 0] * dcf
        errc = coef - deq
        rate = np.abs(lv).sum() + 2 * np.count_nonzero(lv)
        costs.append((errc * errc).sum() + lam * rate
                     + (lam * 2 if mi >= 7 else 0))
    return np.asarray(costs)


@pytest.mark.parametrize("n", [16, 32])
def test_pallas_matches_xla(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    h = w = 4 * n
    y, x = np.mgrid[0:h, 0:w]
    plane = np.clip(
        ((x * 5 + y * 3) % 1024) + rng.integers(-80, 80, (h, w)), 0, 1023
    ).astype(np.int32)
    planes = np.stack([plane, plane[::-1].copy()])
    dc_q, ac_q, lam = 499, 616, 30.0
    ref = plane_mode_search(planes, dc_q, ac_q, lam, 10, n=n)
    got = plane_mode_search_pallas(
        planes, dc_q, ac_q, lam, 10, n=n, chunk=8, interpret=True
    )
    assert ref.shape == got.shape == (2, 4, 4)
    agree = (ref == got).mean()
    assert agree >= 0.75, (agree, ref, got)
    # disagreements must be RD near-ties: the pallas choice's float64
    # oracle cost stays within 2% of the XLA choice's
    nb = {
        k: np.asarray(v)
        for k, v in _neighbors(jnp.asarray(planes), n, 10).items()
    }
    for pi, by, bx in np.argwhere(ref != got):
        c = _oracle_costs(planes, nb, n, pi, by, bx, dc_q, ac_q, lam)
        r, g = int(ref[pi, by, bx]), int(got[pi, by, bx])
        assert c[g] <= c[r] * 1.02, (pi, by, bx, r, g, c[r], c[g])


def test_pallas_hw_n32():
    """The 32px tier on REAL TPU hardware (bf16 VMEM constants): runs the
    fused kernel on-chip and pins agreement with the XLA lowering up to
    RD near-ties. Skipped on the CPU backend (conftest defaults the suite
    to hermetic CPU; set CAVIF_TPU_TEST_DEVICE=1 to exercise it)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real accelerator")
    from cavif_tpu.ops.block_search import plane_mode_search_costs

    rng = np.random.default_rng(3)
    planes = rng.integers(0, 1024, (2, 256, 256), np.int32)
    pm, pc = plane_mode_search_pallas(
        planes, 499, 616, 30.0, 10, n=32, return_costs=True
    )
    xm, xc = plane_mode_search_costs(planes, 499, 616, 30.0, 10, n=32)
    assert pm.shape == xm.shape == (2, 8, 8)
    assert (pm == xm).mean() >= 0.6  # bf16 near-ties may flip
    rel = np.abs(pc - xc) / (np.abs(xc) + 1.0)
    assert np.median(rel) < 0.02, float(np.median(rel))

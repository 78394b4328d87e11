"""Device (jnp int32) inverse transforms vs the native int64 reference.

The hi/lo-split butterflies in ops/device_itx.py must reproduce
native.inv_txfm_exact bit-for-bit over the conformant level range for
every transform size and DCT/ADST combination — the reconstruction
primitive for on-device pass 2."""

import numpy as np
import pytest

from cavif_tpu.native import inv_txfm_exact
from cavif_tpu.ops.device_itx import inv_txfm_batch

SIZES = [
    (4, 4), (8, 8), (16, 16), (32, 32), (64, 64),
    (8, 4), (4, 8), (16, 8), (8, 16), (32, 16), (16, 32),
]


@pytest.mark.parametrize("txw,txh", SIZES)
def test_inv_txfm_matches_native(txw, txh):
    rng = np.random.default_rng(txw * 100 + txh)
    cw, ch = min(txw, 32), min(txh, 32)
    dc_q, ac_q = 499, 616  # 10-bit Q80-ish
    bd = 10
    cf_max = (1 << (bd + 7)) - 1
    B = 8
    levels = np.zeros((B, ch, cw), np.int32)
    for b in range(B):
        nnz = rng.integers(1, 12)
        ys = rng.integers(0, ch, nnz)
        xs = rng.integers(0, cw, nnz)
        mx = max(1, min(cf_max // ac_q, 300))
        levels[b, ys, xs] = rng.integers(-mx, mx + 1, nnz)
    got = inv_txfm_batch(levels, txw, txh, dc_q, ac_q, bd)
    for b in range(B):
        ref = inv_txfm_exact(levels[b], txw, txh, dc_q, ac_q, bd)
        assert np.array_equal(got[b], ref), (txw, txh, b,
                                             int(np.abs(got[b] - ref).max()))


@pytest.mark.parametrize("va,ha", [(1, 0), (0, 1), (1, 1)])
def test_inv_txfm_adst_matches_native(va, ha):
    rng = np.random.default_rng(7 + va * 2 + ha)
    for (txw, txh) in ((4, 4), (8, 8), (16, 16), (8, 16), (16, 8)):
        B = 6
        levels = rng.integers(-120, 121, (B, txh, txw)).astype(np.int32)
        got = inv_txfm_batch(levels, txw, txh, 499, 616, 10, va, ha)
        for b in range(B):
            ref = inv_txfm_exact(levels[b], txw, txh, 499, 616, 10, va, ha)
            assert np.array_equal(got[b], ref), (txw, txh, va, ha, b)

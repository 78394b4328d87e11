"""Device batched intra predictors vs the scalar host reference.

ops/device_predict.py must match av1/predict.py bit-for-bit: the
non-directional modes against predict_all_batch and the directional fan
(all modes x deltas) against predict_dir_batch, over random neighbors
and availability patterns — the prediction primitive for on-device
pass 2."""

import numpy as np
import pytest

from cavif_tpu.av1.predict import predict_all_batch, predict_dir_batch
from cavif_tpu.ops.device_predict import predict_batch_exact

NONDIR_IDS = [0, 9, 10, 11, 12]
ND_ROW = {0: 0, 9: 3, 10: 4, 11: 5, 12: 6}  # id -> predict_all_batch row


def _neighbors(rng, B, bw, bh, bit_depth=10):
    base = 1 << (bit_depth - 1)
    L = bw + bh
    above = rng.integers(0, 1 << bit_depth, (B, L)).astype(np.int32)
    left = rng.integers(0, 1 << bit_depth, (B, L)).astype(np.int32)
    al = rng.integers(0, 1 << bit_depth, B).astype(np.int32)
    have_a = rng.random(B) < 0.8
    have_l = rng.random(B) < 0.8
    # apply the host search's availability synthesis to the ext arrays
    for i in range(B):
        if not have_a[i] and not have_l[i]:
            above[i] = base - 1
            left[i] = base + 1
            al[i] = base
        elif not have_a[i]:
            above[i] = left[i, 0]
            al[i] = left[i, 0]
        elif not have_l[i]:
            left[i] = above[i, 0]
            al[i] = above[i, 0]
    return above, left, al, have_a, have_l


@pytest.mark.parametrize("bw,bh", [(8, 8), (16, 16), (32, 32), (16, 8)])
def test_nondirectional_exact(bw, bh):
    rng = np.random.default_rng(bw + bh)
    B = 64
    above, left, al, have_a, have_l = _neighbors(rng, B, bw, bh)
    ref7 = predict_all_batch(
        above[:, :bw], left[:, :bh], al, have_a, have_l, bw, bh, 10
    )
    for mid in NONDIR_IDS:
        got = predict_batch_exact(
            np.full(B, mid), np.zeros(B, np.int32), above, left, al,
            have_a, have_l, bw, bh, 10,
        )
        exp = ref7[:, ND_ROW[mid]]
        assert np.array_equal(got, exp), (bw, bh, mid)


@pytest.mark.parametrize("bw,bh", [(8, 8), (16, 16), (16, 8), (8, 16)])
def test_directional_exact(bw, bh):
    rng = np.random.default_rng(100 + bw + bh)
    B = 48
    above, left, al, have_a, have_l = _neighbors(rng, B, bw, bh)
    cands = [(m, d) for m in range(1, 9) for d in (-3, -1, 0, 2, 3)]
    modes = np.asarray([cands[i % len(cands)][0] for i in range(B)])
    deltas = np.asarray([cands[i % len(cands)][1] for i in range(B)])
    got = predict_batch_exact(
        modes, deltas, above, left, al, have_a, have_l, bw, bh, 10
    )
    for i in range(B):
        exp = predict_dir_batch(
            [(int(modes[i]), int(deltas[i]))],
            above[i : i + 1], left[i : i + 1], al[i : i + 1], bw, bh,
        )[0, 0]
        assert np.array_equal(got[i], exp), (bw, bh, int(modes[i]),
                                             int(deltas[i]), i)

"""Deblocking: decoder-exact simulation, level search, recon regressions.

The encoder simulates the decoder's loop filter (spec 7.14) on its
bit-exact reconstruction to search uniform filter levels by real output
error (native of_deblock). For still pictures the filter is output-only
(intra prediction reads unfiltered recon), mirroring rav1e's deblock
stage behind the `fast_deblock` preset knob (SURVEY.md 2.2).

The differential cases also lock in two recon fixes found while
validating: angle deltas must be dropped for blocks < 8x8 (the decoder
never reads them: spec use_angle_delta), and non-directional prediction
neighbor reads must clamp at the tile mi bounds for blocks overhanging a
partial bottom/right superblock.
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.opstream import _native_available
from cavif_tpu.av1.speed import SpeedTweaks

pytestmark = pytest.mark.skipif(
    not _native_available(), reason="no native library"
)


def _img(H, W, seed):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    lum = np.clip(
        300 + 330 * np.sin(x / 17.0) * np.cos(y / 23.0)
        + rng.normal(0, 40, (H, W)),
        0, 1023,
    )
    return np.stack(
        [lum, np.clip(lum * 0.9 + 30, 0, 1023),
         np.clip(lum * 1.1 - 20, 0, 1023)], -1
    ).astype(np.int32)


def _encode(H, W, q, img, threads=2):
    tw = dataclasses.replace(
        SpeedTweaks.from_preset(4, q),
        fast_deblock=False, cdef=False, lrf=False,
    )
    cfg = AV1Config(
        width=W, height=H, bit_depth=10, quantizer=q, tweaks=tw,
        chroma_sampling="444", full_range=True, matrix_coefficients=None,
        threads=threads,
    )
    fe = FrameEncoder(img, cfg)
    return fe, fe.encode()


# (dims, q, seed): q180 forces high filter levels; 101x129 exercises the
# partial-superblock overhang; 96x96/q100 the small-block angle-delta path
CASES = [((192, 256), 140, 1), ((101, 129), 180, 2), ((96, 96), 100, 3)]


@pytest.mark.parametrize("dims,q,seed", CASES)
def test_deblocked_output_matches_dav1d(dims, q, seed):
    import dav1d_probe

    H, W = dims
    fe, b = _encode(H, W, q, _img(H, W, seed))
    ok, logs, pix = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs[-5:]
    ours = fe._filtered_stack
    assert ours is not None
    for pl in range(3):
        dec = np.asarray(pix[3][pl])[:H, :W]
        assert np.array_equal(dec, ours[pl, :H, :W]), (
            f"plane {pl} diverges (levels={fe._lf_levels})"
        )


def test_level_search_picks_nonzero_at_low_quality():
    H, W = 128, 160
    fe, _ = _encode(H, W, 200, _img(H, W, 4))
    assert fe._lf_levels[0] > 0
    # the search metric is a real SSE delta: the filtered frame must be
    # closer to the source than the raw recon
    h, w = H, W
    src = fe._src_stack()[:, :h, :w].astype(np.float64)
    rec = fe._recon_full()[:, :h, :w].astype(np.float64)
    fil = fe._filtered_stack[:, :h, :w].astype(np.float64)
    assert ((fil - src) ** 2).sum() < ((rec - src) ** 2).sum()


def test_libaom_accepts_filtered_stream():
    import aom_probe

    fe, b = _encode(101, 129, 180, _img(101, 129, 2))
    ok, msgs = aom_probe.probe(b)[:2]
    assert ok, msgs

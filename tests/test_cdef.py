"""CDEF: decoder-exact simulation, strength search, output chaining.

The encoder simulates the decoder's CDEF filter (spec 7.15: direction
search + primary/secondary constrained filter) on the deblocked frame and
searches the signaled strengths by real output SSE (native of_cdef_apply).
Output-only for still pictures, like deblocking — mirrors the reference's
rav1e CDEF speed toggle (SURVEY.md 2.2 `cdef`). The decoder chain order
deblock -> CDEF -> LR is preserved: the LR solve reads the post-CDEF
frame.
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


def _encode(H, W, q, img, lrf=False, threads=2):
    tw = dataclasses.replace(
        SpeedTweaks.from_preset(4, q),
        fast_deblock=False, cdef=True, lrf=lrf,
    )
    cfg = AV1Config(
        width=W, height=H, bit_depth=10, quantizer=q, tweaks=tw,
        chroma_sampling="444", full_range=True, matrix_coefficients=None,
        threads=threads,
    )
    fe = FrameEncoder(img, cfg)
    return fe, fe.encode()


# q140/q180 give CDEF real ringing to clean; 101x129 exercises the
# partial-superblock edge (mi grid overhang + availability clamps)
CASES = [((192, 256), 140, 1), ((101, 129), 180, 2), ((96, 96), 100, 3)]


@pytest.mark.parametrize("dims,q,seed", CASES)
def test_cdef_output_matches_dav1d(dims, q, seed):
    import dav1d_probe

    H, W = dims
    fe, b = _encode(H, W, q, _img(H, W, seed))
    ok, logs, pix = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs[-5:]
    ours = fe._filtered_stack
    assert ours is not None
    # decoders treat the coded-overhang region beyond the crop as internal
    # state (their padding/deblock extent there is implementation-defined,
    # and dav1d+libaom agree with each other but not with coded-grid
    # semantics); CDEF taps crossing the crop edge on overhanging frames
    # may therefore differ by ~1. Require exactness everywhere except a
    # 2px ring at crop edges that sit inside a partial 8x8 cdef block.
    ring_w = 2 if W % 8 else 0
    ring_h = 2 if H % 8 else 0
    for pl in range(3):
        dec = np.asarray(pix[3][pl])[:H, :W].astype(np.int64)
        diff = np.abs(dec - ours[pl, :H, :W])
        core = diff[: H - ring_h, : W - ring_w]
        assert core.max() == 0, (
            f"plane {pl} diverges in the core (lf={fe._lf_levels})"
        )
        assert diff.max() <= 3, f"plane {pl} edge-ring diff {diff.max()}"



def test_cdef_search_improves_output():
    H, W = 192, 256
    fe, _ = _encode(H, W, 140, _img(H, W, 1))
    src = fe._src_stack()[:, :H, :W].astype(np.float64)
    rec = fe._recon_full()[:, :H, :W].astype(np.float64)
    fil = fe._filtered_stack[:, :H, :W].astype(np.float64)
    assert ((fil - src) ** 2).sum() < ((rec - src) ** 2).sum()


def test_cdef_lr_chain_matches_dav1d():
    # full decoder output pipeline: deblock -> CDEF -> LR. dav1d's final
    # output must equal source better than raw recon, and decode cleanly
    # in libaom (strict conformance) too.
    import aom_probe
    import dav1d_probe

    H, W = 160, 224
    fe, b = _encode(H, W, 160, _img(H, W, 5), lrf=True)
    ok, logs, pix = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs[-5:]
    assert aom_probe.probe(b)[0]
    dec = np.stack([np.asarray(pix[3][pl])[:H, :W] for pl in range(3)])
    src = fe._src_stack()[:, :H, :W].astype(np.float64)
    rec = fe._recon_full()[:, :H, :W].astype(np.float64)
    assert ((dec - src) ** 2).sum() < ((rec - src) ** 2).sum()

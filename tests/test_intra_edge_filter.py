"""Intra edge filtering/upsampling (spec 7.11.2.9-12): decoder exactness.

The filter smooths the directional predictors' neighbor edges with the
strength tables (including the rounded kernel shift), the zone-2 corner
smoothing, and 2x edge upsampling for small sharp-angle blocks; the
filter type depends on neighbor-block smoothness. Implemented in the
Python pass-2 backend behind AV1Config.intra_edge_filter (the RD search
does not model the filter, so it is off by default: measured neutral on
the A/B corpus)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cavif_tpu.av1 import frame as frame_mod
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.ops.quality import quality_to_quantizer
import cavif_tpu.av1.encoder as em


def _encode(planes, chroma, q_, speed=1, force=None, leaf_px=None,
            backend="python"):
    h, w = planes.shape[:2] if planes.ndim == 3 else planes.shape
    q = quality_to_quantizer(q_)
    cfg = AV1Config(
        width=w, height=h, bit_depth=10, quantizer=q,
        tweaks=SpeedTweaks.from_preset(speed, q), chroma_sampling=chroma,
        full_range=True,
        matrix_coefficients=6 if chroma == "444" else None,
        threads=1, ec_backend=backend, intra_edge_filter=True,
    )
    fe = FrameEncoder(planes, cfg)
    if leaf_px:
        fe.min_leaf_mi = fe.max_leaf_mi = leaf_px // 4
    if force is not None:
        mode, delta = force
        orig = em.FrameEncoder._batch_search

        def forced(self, blocks, origin, luma_only=False):
            out = orig(self, blocks, origin, luma_only)
            return {
                k: (mode, delta, 0, 0, v[4], v[5]) for k, v in out.items()
            }

        fe._batch_search = forced.__get__(fe)
    fe._cdef_apply = lambda: ((), (), 3)
    fe._lr_solve = lambda: False
    o = frame_mod.FrameParams.__init__

    def patched(self, *a, **k):
        o(self, *a, **k)
        self.filter_level = (0, 0, 0, 0)

    frame_mod.FrameParams.__init__ = patched
    try:
        b = fe.encode()
    finally:
        frame_mod.FrameParams.__init__ = o
    return fe, b


def _check(fe, b, h, w, npl, backend="python"):
    import dav1d_probe

    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    rf = fe._recon_full() if backend is None else [
        p.recon for p in fe.planes
    ]
    for pl in range(npl):
        np.testing.assert_array_equal(
            desc[3][pl].astype(np.int64),
            rf[pl][:h, :w].astype(np.int64),
            err_msg=f"plane {pl}",
        )


@pytest.mark.parametrize(
    "mode,delta,leaf,backend",
    [(3, 0, 8, "python"), (5, -3, 8, "python"), (1, 3, 16, "python"),
     (8, 2, 32, "python"), (4, 1, 16, "python"), (7, -2, 8, "python"),
     (3, 0, 8, None), (5, -3, 8, None), (1, 3, 16, None),
     (8, 2, 32, None), (4, 1, 16, None), (7, -2, 8, None)]
)
def test_edge_filter_forced_modes(mode, delta, leaf, backend):
    rng = np.random.default_rng(9)
    h = w = leaf * 2
    lum = np.clip(
        512 + 300 * np.sin(np.arange(w) / 5.0)[None, :]
        + 200 * np.cos(np.arange(h) / 7.0)[:, None]
        + rng.integers(-40, 41, (h, w)), 0, 1023
    ).astype(np.int32)
    fe, b = _encode(lum, "400", 75.0, speed=4, force=(mode, delta),
                    leaf_px=leaf, backend=backend)
    _check(fe, b, h, w, 1, backend)


@pytest.mark.parametrize(
    "seed,h,w,chroma,speed,backend",
    [(1, 128, 128, "400", 1, "python"), (2, 101, 129, "400", 1, "python"),
     (3, 128, 128, "444", 1, "python"), (4, 96, 160, "444", 2, "python"),
     (2, 101, 129, "400", 1, None), (3, 128, 128, "444", 1, None),
     (4, 96, 160, "444", 4, None)],
)
def test_edge_filter_end_to_end(seed, h, w, chroma, speed, backend):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    lum = np.clip(
        512 + 350 * np.sign(np.sin((x + 2 * y) / 9.0))
        + rng.integers(-30, 31, (h, w)), 0, 1023
    )
    if chroma == "444":
        planes = np.stack(
            [lum, np.clip(lum * 0.8 + 80, 0, 1023),
             np.clip(lum * 0.7 + 120, 0, 1023)], axis=-1
        ).astype(np.int32)
        npl = 3
    else:
        planes = lum.astype(np.int32)
        npl = 1
    fe, b = _encode(planes, chroma, 70.0, speed=speed, backend=backend)
    _check(fe, b, h, w, npl, backend)

"""Chroma-from-luma: decoder exactness (dav1d) and end-to-end selection.

Pins: the joint-sign/alpha syntax with the libaom context mapping
(ctx_u = joint - 2, ctx_v = sign_v * 3 + sign_u - 3), the rounded
CflLumaBuf average, Round2Signed(alpha * ac, 6) projection, DCT-derived
chroma tx type, and — critically — the repaired ctx-5 cfl_alpha CDF row
(the libaom binary's in-image row carries a duplicated pair; the corrupt
row produced streams that decode into garbage)."""

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


def _content():
    rng = np.random.default_rng(3)
    h, w = 64, 64
    y, x = np.mgrid[0:h, 0:w]
    luma = np.clip(
        400 + 300 * np.sin(x / 23.0) * np.cos(y / 17.0)
        + rng.integers(-40, 41, (h, w)), 0, 1023
    )
    u = np.clip(512 + (luma - 400) * 0.6 + rng.integers(-10, 11, (h, w)),
                0, 1023)
    v = np.clip(512 - (luma - 400) * 0.4 + rng.integers(-10, 11, (h, w)),
                0, 1023)
    return np.stack([luma, u, v], axis=-1).astype(np.int32)


def _encode_forced(planes, alpha_u, alpha_v, backend):
    orig_try = em.FrameEncoder._cfl_try

    def forced(self, ctx, x0, y0, bw, bh, rr, cc):
        if orig_try(self, ctx, x0, y0, bw, bh, rr, cc) is None:
            return None
        L = (self.planes[0].recon[y0:y0 + bh, x0:x0 + bw]
             .astype(np.int64) << 3)
        shift = (bw * bh).bit_length() - 1
        avg = (int(L.sum()) + (1 << (shift - 1))) >> shift
        ac = L - avg
        txbs = []
        for pl, a in zip((1, 2), (alpha_u, alpha_v)):
            levels, rec, cost = self._compute_txb(
                ctx, pl, x0, y0, bw, bh, rr, cc, False, 0, 0, cfl=(ac, a)
            )
            txbs.append((pl, x0, y0, bw, bh, levels, 0, 0, rec, -1e18))

        def sgn(a):
            return 0 if a == 0 else (1 if a < 0 else 2)

        su, sv = sgn(alpha_u), sgn(alpha_v)
        return (txbs, su * 3 + sv - 1,
                abs(alpha_u) - 1 if su else 0,
                abs(alpha_v) - 1 if sv else 0)

    em.FrameEncoder._cfl_try = forced
    q = quality_to_quantizer(75.0)
    cfg = AV1Config(
        width=64, height=64, bit_depth=10, quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling="444",
        full_range=True, matrix_coefficients=6, threads=1,
        ec_backend=backend,
    )
    fe = FrameEncoder(planes, cfg)
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
        em.FrameEncoder._cfl_try = orig_try
    return b, fe


@pytest.mark.parametrize(
    "au,av,backend",
    [
        (0, 3, "python"), (-5, 0, "python"), (4, -6, "python"),
        (-4, -6, "python"),
        (16, 16, "python"),  # joint 7: ctx-5 alpha CDF (repaired row)
        (16, 16, None),      # same through the native C++ serializer
        (8, -16, None),
    ],
)
def test_cfl_dav1d_exact(au, av, backend):
    import dav1d_probe

    planes = _content()
    b, fe = _encode_forced(planes, au, av, backend)
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    rf = fe._recon_full() if backend is None else [
        p.recon for p in fe.planes
    ]
    for pl in range(3):
        np.testing.assert_array_equal(
            desc[3][pl].astype(np.int64), rf[pl][:64, :64].astype(np.int64),
            err_msg=f"plane {pl}",
        )


def test_cfl_selected_and_gains(monkeypatch):
    """On luma-correlated chroma the encoder picks CfL naturally (both
    backends agree) and the stream decodes in both decoders."""
    import aom_probe
    import dav1d_probe

    # compare the two pipelines under the SHARED static trellis pricing
    # (the adaptive-CDF rates + re-tuned defaults are native-only, r05)
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_ADAPT", "0")
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_UP", "0")
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_CTX", "1.2")

    rng = np.random.default_rng(7)
    h = w = 128
    y, x = np.mgrid[0:h, 0:w]
    luma = np.clip(
        400 + 300 * np.sin(x / 23.0) * np.cos(y / 17.0)
        + rng.integers(-40, 41, (h, w)), 0, 1023
    )
    u = np.clip(512 + (luma - 400) * 0.7, 0, 1023)
    v = np.clip(512 - (luma - 400) * 0.5, 0, 1023)
    planes = np.stack([luma, u, v], axis=-1).astype(np.int32)
    q = quality_to_quantizer(75.0)
    base = None
    for backend in ("python", None):
        cfg = AV1Config(
            width=w, height=h, bit_depth=10, quantizer=q,
            tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling="444",
            full_range=True, matrix_coefficients=6, threads=1,
            ec_backend=backend,
        )
        b = FrameEncoder(planes, cfg).encode()
        assert dav1d_probe.probe(b)[0]
        assert aom_probe.probe(b)[0]
        if backend == "python":
            # CfL engages: without it this content codes measurably larger
            nocfl = em.FrameEncoder._cfl_try
            em.FrameEncoder._cfl_try = lambda self, *a: None
            try:
                b_off = FrameEncoder(planes, cfg).encode()
            finally:
                em.FrameEncoder._cfl_try = nocfl
            assert len(b) < len(b_off), (len(b), len(b_off))
        # both pipelines land within a whisker of each other (their float
        # alpha fits may tie-break differently)
        if base is None:
            base = len(b)
        else:
            assert abs(len(b) - base) < max(64, base // 20)

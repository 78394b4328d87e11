"""Encoder reconstruction must be BIT-EXACT with the decoder (dav1d).

Any model error drifts through intra prediction chains and snowballs on
edge-heavy content; regression for three found bugs: float inverse-transform
model (replaced by the exact integer idct), BlockDecoded top-row reset
(whole previous SB row is decoded), and extension reads clamping at the tile
edge rather than the frame edge."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.av1 import frame as frame_mod


def _drift(plane, q, threads=1, tiles=False):
    import dav1d_probe

    h, w = plane.shape
    cfg = AV1Config(
        width=w, height=h, bit_depth=10, quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=threads,
        ec_backend="python",
    )
    fe = FrameEncoder(plane, cfg)
    if tiles:
        fe._tile_split = lambda: (1, 1)
    # deblock + CDEF + loop restoration are output-only for still frames;
    # disable all three so decoder pixels equal pre-filter reconstruction
    fe._cdef_apply = lambda: ((), (), 3)
    fe._lr_solve = lambda: False
    orig = frame_mod.FrameParams.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        self.filter_level = (0, 0, 0, 0)

    frame_mod.FrameParams.__init__ = patched
    try:
        b = fe.encode()
    finally:
        frame_mod.FrameParams.__init__ = orig
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    dec = desc[3][0].astype(np.int64)
    rec = fe.planes[0].recon[:h, :w].astype(np.int64)
    return int(np.abs(dec - rec).max())


def _stripes(n=256):
    y, x = np.mgrid[0:n, 0:n]
    v = ((((x + y) // 24) % 2) * 560 + 240 + ((x - 2 * y) // 40 % 3) * 80)
    return (v % 1024).astype(np.int32)


def test_recon_exact_single_tile():
    assert _drift(_stripes(), q=121) == 0


def test_recon_exact_multi_tile():
    assert _drift(_stripes(), q=121, tiles=True) == 0


def test_recon_exact_noisy():
    rng = np.random.default_rng(4)
    y, x = np.mgrid[0:192, 0:192]
    plane = np.clip(
        ((x * 5 + y * 3) % 1024) + rng.integers(-60, 60, (192, 192)), 0, 1023
    ).astype(np.int32)
    assert _drift(plane, q=60) == 0


def test_recon_exact_chroma_adst():
    """Chroma blocks with tx <= 16 derive ADST transforms from the uv mode
    (Mode_To_Txfm_Type); reconstruction must stay decoder-bit-exact."""
    import dav1d_probe

    y, x = np.mgrid[0:128, 0:128]
    planes = np.stack(
        [((x * 13 + y * 7 + 100) % 1024),
         ((x * 5 + y * 11 + 300) % 1024),
         ((x * 9 + y * 3 + 500) % 1024)], axis=-1
    ).astype(np.int32)
    cfg = AV1Config(
        width=128, height=128, bit_depth=10, quantizer=60,
        tweaks=SpeedTweaks.from_preset(4, 60), chroma_sampling="444",
        full_range=True, matrix_coefficients=6, threads=1,
        ec_backend="python",
    )
    fe = FrameEncoder(planes, cfg)
    fe.min_leaf_mi = 4
    fe.max_leaf_mi = 4  # force 16x16 -> chroma ADST zone
    fe._cdef_apply = lambda: ((), (), 3)
    fe._lr_solve = lambda: False
    orig = frame_mod.FrameParams.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        self.filter_level = (0, 0, 0, 0)

    frame_mod.FrameParams.__init__ = patched
    try:
        b = fe.encode()
    finally:
        frame_mod.FrameParams.__init__ = orig
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    for pl in range(3):
        dec = desc[3][pl].astype(np.int64)
        rec = fe.planes[pl].recon[:128, :128].astype(np.int64)
        assert int(np.abs(dec - rec).max()) == 0, pl


def test_recon_exact_4x4_partitions():
    """Structured content drives the RDO down to 4x4 leaves (spec: no
    partition syntax below 8x8; tx 4x4); recon must stay decoder-exact and
    the stream must actually contain 4x4 luma blocks."""
    import dav1d_probe

    n = 128
    y, x = np.mgrid[0:n, 0:n]
    plane = np.where((x + y) % 16 < 8, 240, 800)
    plane[(x // 8 + y // 8) % 7 == 0] = 512
    plane = plane.astype(np.int32)
    cfg = AV1Config(
        width=n, height=n, bit_depth=10, quantizer=121,
        tweaks=SpeedTweaks.from_preset(4, 121), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
        ec_backend="python",
    )
    fe = FrameEncoder(plane, cfg)
    fe._cdef_apply = lambda: ((), (), 3)
    fe._lr_solve = lambda: False
    orig = frame_mod.FrameParams.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        self.filter_level = (0, 0, 0, 0)

    frame_mod.FrameParams.__init__ = patched
    try:
        b = fe.encode()
    finally:
        frame_mod.FrameParams.__init__ = orig
    # the walk must have produced 4x4 luma leaves for this content
    tp, ops = fe._tile_skeleton(0, fe.mi_rows, 0, fe.mi_cols)
    from cavif_tpu.av1 import opstream as ops_mod

    arity = {
        ops_mod.OP_CLEAR_LEFT: 0, ops_mod.OP_PARTITION: 4,
        ops_mod.OP_SPLIT_BIN: 5, ops_mod.OP_BLOCK: 10,
        ops_mod.OP_COEFFS: 12, ops_mod.OP_BLOCK_COMPUTE: 8,
        ops_mod.OP_SB_START: 2,
    }
    a = np.asarray(ops)
    i = 0
    n4x4 = 0
    while i < len(a):
        op = int(a[i])
        if op == ops_mod.OP_BLOCK_COMPUTE and a[i + 3] == 1 and a[i + 4] == 1:
            n4x4 += 1
        i += 1 + arity[op]
    assert n4x4 > 0, "content should trigger 4x4 partitions"
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    dec = desc[3][0].astype(np.int64)
    rec = fe.planes[0].recon[:n, :n].astype(np.int64)
    assert int(np.abs(dec - rec).max()) == 0


def test_recon_exact_rect_partitions():
    """HORZ/VERT partitions make rect blocks (8x16/16x32/...) whose
    above-right/below-left neighbor extension supplies only w (resp. h)
    extra pixels — identical for squares, a real bug for rects (found via
    a +-1 DC drift cascading from a D45 16-high half)."""
    import dav1d_probe
    from cavif_tpu.av1.symbols import PARTITION_VERT, PARTITION_NONE
    from cavif_tpu.av1.encoder import PARTITION_SPLIT

    rng = np.random.default_rng(7)
    img = rng.integers(100, 900, (64, 64)).astype(np.int32)
    for mode in (3, 5, 7):  # D45/D113/D203: zones 1/2/3 all hit extensions
        cfg = AV1Config(
            width=64, height=64, bit_depth=10, quantizer=121,
            tweaks=SpeedTweaks.from_preset(4, 121), chroma_sampling="400",
            full_range=True, matrix_coefficients=None, threads=1,
            ec_backend="python",
        )
        fe = FrameEncoder(img, cfg)
        fe._cdef_apply = lambda: ((), (), 3)
        fe._lr_solve = lambda: False

        def rdo(partials, origin, *a):
            part = {(r, c, 8): PARTITION_SPLIT for r in (0, 8) for c in (0, 8)}
            modes = {}
            for r in (0, 4, 8, 12):
                for c in (0, 4, 8, 12):
                    part[(r, c, 4)] = PARTITION_NONE
                    modes[(r, c, 4, 4)] = (0, 0, 0, 0, 0.0, 0.0)
            part[(8, 8, 4)] = PARTITION_VERT
            modes[(8, 8, 2, 4)] = (mode, 0, 0, 0, 0.0, 0.0)
            modes[(8, 10, 2, 4)] = (mode, 0, 0, 0, 0.0, 0.0)
            return part, modes

        fe._rdo_partition = rdo
        orig = frame_mod.FrameParams.__init__

        def patched(self, *a, **k):
            orig(self, *a, **k)
            self.filter_level = (0, 0, 0, 0)

        frame_mod.FrameParams.__init__ = patched
        try:
            b = fe.encode()
        finally:
            frame_mod.FrameParams.__init__ = orig
        ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
        assert ok, logs
        dec = desc[3][0].astype(np.int64)
        rec = fe.planes[0].recon[:64, :64].astype(np.int64)
        assert int(np.abs(dec - rec).max()) == 0, mode


def test_gain_roundtrip_all_sizes():
    """The float forward/quantize model and the dav1d-exact integer
    inverse must agree on the end-to-end gain for EVERY tx size: a flat
    residual quantized at tiny q must reconstruct to itself. (A stale
    calibration once doubled TX_8X4/TX_4X8's gain, silently halving every
    coded 8x4 residual — q~lossless encodes had 256-level errors.)"""
    import ctypes

    from cavif_tpu import native
    from cavif_tpu.av1.transforms import forward_dct2d, quantize_block

    lib = native._load()
    dc_q = ac_q = 9
    for (w, h) in ((4, 4), (8, 4), (4, 8), (8, 8), (16, 8), (8, 16),
                   (16, 16), (32, 16), (16, 32), (32, 32)):
        res = np.full((h, w), -500.0, np.float32)
        coef = forward_dct2d(res[None])[0]
        lv = quantize_block(coef[None], dc_q, ac_q, w, h, bit_depth=10)[0]
        rec = np.zeros((h, w), np.int32)
        rc = lib.tc_inv_txfm(
            np.ascontiguousarray(lv).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)), h, w, w, h,
            dc_q, ac_q, 10, 0, 0,
            rec.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        assert rc == 0
        assert abs(rec.mean() + 500.0) < 3.0, (w, h, rec.mean())

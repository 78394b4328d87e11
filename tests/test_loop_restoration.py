"""Loop restoration (Wiener): syntax legality, decode gain, backends.

The lrf preset knob (SURVEY.md 2.2: low_quality and speed <= 8, true at the
Q80/s4 default) signals RESTORE_WIENER for luma; per-unit taps are solved
by least squares against the reconstruction and coded inside the tile
streams (read_lr at superblock starts, refs reset per tile)."""

import io
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cavif_tpu import Encoder
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.opstream import OpTileWriter, replay_python, _native_available
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.av1.symbols import TileParams


def _noisy(n=320):
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    lum = np.clip(
        120 + 80 * np.sin(x / 41.0) * np.cos(y / 59.0)
        + rng.normal(0, 7, (n, n)),
        0, 255,
    )
    return np.stack([lum, lum * 0.94 + 12, lum * 1.05 - 8], -1).clip(
        0, 255
    ).astype(np.uint8)


def test_lr_stream_decodes_and_gains():
    import dav1d_probe

    img = _noisy()
    enc = Encoder.new().with_quality(70).with_speed(4)
    b = enc.encode_rgb(img).avif_file
    from PIL import Image

    px = np.asarray(Image.open(io.BytesIO(b)).convert("RGB")).astype(float)
    p_lr = 10 * np.log10(255**2 / ((px - img.astype(float)) ** 2).mean())

    orig = FrameEncoder._lr_solve
    FrameEncoder._lr_solve = lambda self: False
    try:
        b2 = enc.encode_rgb(img).avif_file
    finally:
        FrameEncoder._lr_solve = orig
    px2 = np.asarray(Image.open(io.BytesIO(b2)).convert("RGB")).astype(float)
    p_no = 10 * np.log10(255**2 / ((px2 - img.astype(float)) ** 2).mean())
    # the Wiener pass must never hurt, and should help on noisy content
    assert p_lr >= p_no - 0.01, (p_lr, p_no)


@pytest.mark.skipif(not _native_available(), reason="no native library")
def test_lr_unit_serializer_equality():
    """LR unit symbols (use_wiener CDF + subexp tap deltas) must be
    byte-identical between the Python reference writer and the C++
    serializer, across ref-tracking updates."""
    from cavif_tpu.native import encode_tile_native

    p = TileParams(mi_col_start=0, mi_col_end=16, mi_row_start=0,
                   mi_row_end=16, base_q=121, bit_depth=10, num_planes=1)
    tw = OpTileWriter(p)
    tw.clear_left()
    for use, taps in (
        (1, (3, -7, 15, 3, -7, 15)),
        (1, (-5, -23, -17, 10, 8, 46)),
        (0, (0, 0, 0, 0, 0, 0)),
        (1, (10, 8, 46, -5, -23, -17)),
        (1, (0, 0, 0, 1, 2, 3)),
    ):
        tw.write_lr_unit(0, use, taps)
    tw.write_partition(0, 0, 4, 3)
    ops, levels = tw.pack()
    assert replay_python(p, ops, levels) == encode_tile_native(p, ops, levels)


@pytest.mark.skipif(not _native_available(), reason="no native library")
def test_lr_full_encode_backend_equality(monkeypatch):
    import dataclasses

    # the adaptive-CDF trellis (round 5) is native-pipeline-only — pin
    # backend equality under the shared frame-initial pricing
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_ADAPT", "0")
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_UP", "0")
    # the native/python strength defaults split in r05 (0.9 adaptive
    # knee vs 1.2 static knee) — pin one value for the parity check
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_CTX", "1.2")
    img = _noisy(256)[:, :, 0].astype(np.int32) * 4
    outs = {}
    # cdef off: the simulated CDEF can absorb the gain LR would get,
    # and this test needs LR units on the wire for backend equality
    tweaks = dataclasses.replace(
        SpeedTweaks.from_preset(4, 147), cdef=False
    )
    for backend in ("python", "native"):
        cfg = AV1Config(
            width=256, height=256, bit_depth=10, quantizer=147,
            tweaks=tweaks, chroma_sampling="400",
            full_range=True, matrix_coefficients=None, threads=1,
            ec_backend=backend,
            # flat quantizer: adaptive q is native-backend-only, and this
            # test pins byte equality of the two backends
            tune="psnr",
        )
        fe = FrameEncoder(img, cfg)
        outs[backend] = fe.encode()
        assert getattr(fe, "_lr_units", None), backend  # LR actually used
    assert outs["python"] == outs["native"]


def test_lr_strict_decoders():
    import aom_probe
    import dav1d_probe
    from cavif_tpu.container import parse as cparse

    b = Encoder.new().with_quality(60).encode_rgb(_noisy(300)).avif_file
    av1 = cparse.read_avif(b).primary_item
    assert aom_probe.probe(av1)[0]
    assert dav1d_probe.probe(av1)[0]


def test_chroma_wiener_lr():
    """Chroma planes get their own (5-tap) wiener units; streams pass
    both decoder probes and restoration improves decoded PSNR."""
    import io
    import sys
    from pathlib import Path

    import numpy as np
    from PIL import Image

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import aom_probe
    import dav1d_probe

    from cavif_tpu import Encoder
    import cavif_tpu.av1.encoder as enc_mod
    from cavif_tpu.container.parse import read_avif

    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:256, 0:256].astype(np.float64)
    r = np.clip(128 + 100 * np.sin(x / 31.0) + rng.normal(0, 12, x.shape),
                0, 255)
    g = np.clip(128 + 100 * np.cos(y / 37.0) + rng.normal(0, 12, x.shape),
                0, 255)
    b = np.clip(128 + 90 * np.sin((x + y) / 23.0)
                + rng.normal(0, 12, x.shape), 0, 255)
    img = np.dstack([r, g, b]).astype(np.uint8)

    info = {}
    orig = enc_mod.FrameEncoder._lr_solve

    def spy(self):
        rr = orig(self)
        if rr:
            info["types"] = self._lr_types
        return rr

    enc_mod.FrameEncoder._lr_solve = spy
    try:
        res = (
            Encoder.new().with_quality(70).with_speed(4).with_num_threads(1)
            .encode_rgb(img)
        )
    finally:
        enc_mod.FrameEncoder._lr_solve = orig
    assert any(info.get("types", (0, 0, 0))[1:]), info  # chroma LR engaged
    av1 = read_avif(res.avif_file).primary_item
    assert aom_probe.probe(av1)[0]
    assert dav1d_probe.probe(av1)[0]
    dec = np.asarray(
        Image.open(io.BytesIO(res.avif_file)).convert("RGB")
    ).astype(np.float64)
    psnr = 10 * np.log10(255**2 / ((dec - img) ** 2).mean())
    assert psnr > 25, psnr

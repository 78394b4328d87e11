"""Per-superblock adaptive quantization (delta_q) — the psychovisual
tune's bit mover (CAVIF_TPU_TUNE=ssim). The reference encoder has no
still-image adaptive quantization; this capability goes beyond parity, so
it is pinned directly against the decoders: dav1d must reproduce the
encoder's reconstruction bit-exactly (spec read_delta_qindex semantics,
CurrentQIndex threading across superblocks) and libaom must accept the
stream; the native and python entropy coders must agree byte-for-byte on
streams carrying OP_DELTA_Q rows."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cavif_tpu.av1 import frame as frame_mod
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.speed import SpeedTweaks


def _mixed_plane(n=256):
    """Half smooth gradient, half heavy texture: forces a wide qindex
    spread across superblocks."""
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:n, 0:n]
    smooth = (x * 2 + y) % 1024
    noisy = rng.integers(0, 1024, (n, n))
    return np.where(x < n // 2, smooth, noisy).astype(np.int32)


def _encode(plane, q, monkeypatch, tune=True):
    monkeypatch.setenv("CAVIF_TPU_TUNE", "ssim" if tune else "psnr")
    h, w = plane.shape
    cfg = AV1Config(
        width=w, height=h, bit_depth=10, quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
    )
    fe = FrameEncoder(plane, cfg)
    return fe, fe.encode()


def test_aq_maps_spread(monkeypatch):
    # mid-rate base (121): smooth SBs gain bits, texture is left alone
    # (the up side is tapered off below quality ~85 — see _sb_qmaps)
    fe, b = _encode(_mixed_plane(), 121, monkeypatch)
    qidx, qmap, lammap = fe._sb_qmaps()
    assert qidx is not None
    assert qidx.min() < 121 and qidx.max() == 121
    assert ((qidx - 121) % 4 == 0).all()  # delta_q_res grid
    # high-quality base (90): bits move in both directions
    fe, b = _encode(_mixed_plane(), 90, monkeypatch)
    qidx = fe._sb_qmaps()[0]
    assert qidx.min() < 90 < qidx.max()
    assert ((qidx - 90) % 4 == 0).all()
    assert qidx.min() >= 1 and qidx.max() <= 255


def test_aq_decoders_accept(monkeypatch):
    import dav1d_probe
    from tools.aom_probe import probe as aom_probe

    fe, b = _encode(_mixed_plane(), 121, monkeypatch)
    ok, logs, _ = dav1d_probe.probe(b)
    assert ok, logs
    ok, msg, _ = aom_probe(b)
    assert ok, msg


def test_aq_recon_bit_exact(monkeypatch):
    """With the output filters disabled, dav1d's pixels must equal the
    encoder's reconstruction exactly — proving the decoder dequantizes
    every superblock at the qindex the encoder used."""
    import dav1d_probe

    plane = _mixed_plane()
    h, w = plane.shape
    monkeypatch.setenv("CAVIF_TPU_TUNE", "ssim")
    cfg = AV1Config(
        width=w, height=h, bit_depth=10, quantizer=121,
        tweaks=SpeedTweaks.from_preset(4, 121), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
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
    assert fe._sb_qmaps()[0] is not None  # AQ actually engaged
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    dec = desc[3][0].astype(np.int64)
    rec = fe._recon_stack[0][:h, :w].astype(np.int64)
    assert int(np.abs(dec - rec).max()) == 0


def test_aq_ec_backends_agree(monkeypatch):
    """Native vs python range coder on a stream carrying OP_DELTA_Q rows
    (the recorded replay stream of an AQ encode)."""
    from cavif_tpu.av1.opstream import replay_python
    from cavif_tpu.native import encode_tile_native

    fe, b = _encode(_mixed_plane(192), 121, monkeypatch)
    assert fe._bpops_cache, "expected recorded replay streams"
    checked = 0
    for (tp, rops, rlvl) in fe._bpops_cache.values():
        from cavif_tpu.av1.opstream import OP_DELTA_Q

        assert (np.asarray(rops) == OP_DELTA_Q).any()
        nat = encode_tile_native(tp, rops, rlvl)
        py = replay_python(tp, rops, rlvl)
        assert nat == py
        checked += 1
    assert checked >= 1


def test_aq_improves_smooth_region(monkeypatch):
    """The point of AQ: at a similar total size, the smooth half gets
    more bits (higher PSNR) than the flat-lambda encode gives it."""
    import dav1d_probe

    plane = _mixed_plane()
    h, w = plane.shape
    _, b_flat = _encode(plane, 150, monkeypatch, tune=False)
    _, b_aq = _encode(plane, 150, monkeypatch, tune=True)

    def smooth_psnr(b):
        ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
        assert ok, logs
        dec = desc[3][0].astype(np.float64)
        half = plane[:, : w // 2].astype(np.float64)
        err = ((dec[:, : w // 2] - half) ** 2).mean()
        return 10 * np.log10(1023**2 / max(err, 1e-9))

    assert smooth_psnr(b_aq) > smooth_psnr(b_flat)
    assert len(b_aq) < len(b_flat) * 1.25


def test_aq_multi_tile(monkeypatch):
    """Regression: the qmap caches were lazily built inside the tile
    ThreadPool fan-out; a second tile thread could observe the
    in-progress None and encode its tile without delta symbols while the
    frame header said delta_q_present — a desync the decoder rejects.
    Maps are now built eagerly before the fan-out."""
    import io

    import dav1d_probe
    from PIL import Image

    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:512, 0:512].astype(np.float64)
    lum = np.clip(
        120 + 70 * np.sin(x / 53.0) * np.cos(y / 37.0)
        + rng.normal(0, 6, x.shape), 0, 255,
    )
    img = np.dstack(
        [lum, np.clip(lum + 15, 0, 255), np.clip(lum - 20, 0, 255)]
    ).astype(np.uint8)
    monkeypatch.setenv("CAVIF_TPU_TUNE", "ssim")
    from cavif_tpu import Encoder
    from cavif_tpu.container.parse import read_avif

    for _ in range(3):  # races are flaky: a few rounds
        b = Encoder.new().with_quality(70).with_speed(4) \
            .with_num_threads(4).encode_rgb(img).avif_file
        ok, logs, _ = dav1d_probe.probe(read_avif(b).primary_item)
        assert ok, logs
        Image.open(io.BytesIO(b)).convert("RGB")


def test_aq_at_quality100(monkeypatch):
    """quantizer 0 would signal CodedLossless (4x4 WHT coding — not
    implemented); the frame encoder clamps base_q to 1, where delta_q is
    legal again. The q=0 + tune=ssim combination once coded delta symbols
    under a header that could not signal delta_q_present — silent pixel
    corruption. Now: base_q==1, a valid stream, near-lossless pixels."""
    import dav1d_probe

    plane = _mixed_plane(128)
    monkeypatch.setenv("CAVIF_TPU_TUNE", "ssim")
    cfg = AV1Config(
        width=128, height=128, bit_depth=10, quantizer=0,
        tweaks=SpeedTweaks.from_preset(4, 0), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
    )
    fe = FrameEncoder(plane, cfg)
    b = fe.encode()
    assert fe.base_q == 1
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    # near-lossless: decoded pixels must track the source tightly
    # (filters still run; they are output-only smoothing)
    dec = desc[3][0].astype(np.int64)
    assert int(np.abs(dec - plane).max()) <= 64


def test_aq_engages_on_device_path(monkeypatch):
    """tune=ssim no longer forces the host cascade (round-3): the device
    pass-1 searches at the frame base quantizer while pass 2 applies the
    per-SB delta_q. The device-path stream must carry delta_q, decode
    bit-exactly, and land within a small RD envelope of the host path."""
    import io

    from PIL import Image

    from cavif_tpu import Encoder

    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:192, 0:256]
    smooth = (120 + 60 * np.sin(x / 43.0)).astype(np.float64)
    img8 = np.where(
        x < 128, smooth, rng.integers(0, 256, (192, 256))
    ).astype(np.uint8)
    img = np.stack([img8, img8, img8], axis=-1)

    def run(dev):
        monkeypatch.setenv("CAVIF_TPU_DEVICE_SEARCH", dev)
        out = Encoder.new().with_quality(80).with_speed(4).with_tune(
            "ssim"
        ).encode_rgb(img)
        dec = np.asarray(
            Image.open(io.BytesIO(out.avif_file)).convert("RGB")
        ).astype(np.float64)
        err = ((dec - img.astype(np.float64)) ** 2).mean()
        return out, 10 * np.log10(255**2 / max(err, 1e-9))

    host, p_host = run("off")
    dev, p_dev = run("xla")
    # per-SB delta_q present on the device path: base_q alone cannot code
    # this mixed content at one quantizer without the qindex spread that
    # the host AQ stream shows; compare sizes as the cheap proxy and the
    # decoded quality directly
    assert p_dev >= p_host - 0.25
    assert len(dev.avif_file) <= int(len(host.avif_file) * 1.10)

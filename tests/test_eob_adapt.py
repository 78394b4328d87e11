"""Adaptive-CDF EOB-cut rate model (tilecoder eob_adapt_env; VERDICT r05
"adaptive-CDF EOB rate model" candidate).

The cut model prices a tail cut from the trellis's LIVE CDF mirrors:
every dropped position's real coding cost (including the base-0 symbols
of tail zeros, which the static model never priced), the new last
coefficient's base -> base_eob context switch, and the exact
eob_pt/eob_extra position saving. Ships tune-dependent: 0.8 at
tune=psnr (dense-corpus Pareto vs the static model: BD-PSNR
+0.285->+0.291, BD-rate -0.3%->-1.8%, BD-SSIM within noise), 0 at
tune=ssim (accurate pricing cuts more tail; BD-SSIM -0.00078->-0.00096
at scale 1.0 — the tune's headline axis loses). These tests pin the
wiring, not the BD outcome (BASELINE.md records the sweeps).
"""

import numpy as np
import pytest

from cavif_tpu.av1.opstream import _native_available

pytestmark = pytest.mark.skipif(
    not _native_available(), reason="no native library"
)


def _img(seed=11):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:128, 0:128].astype(np.float64)
    lum = np.clip(
        120 + 80 * np.sin(x / 11.0) * np.cos(y / 19.0)
        + rng.normal(0, 22, (128, 128)),
        0, 255,
    )
    img = np.stack([lum, lum * 0.85 + 20, np.clip(lum * 1.15 - 15, 0, 255)],
                   -1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _enc(img, tune, monkeypatch, adapt=None):
    if adapt is None:
        monkeypatch.delenv("CAVIF_TPU_EOB_ADAPT", raising=False)
    else:
        monkeypatch.setenv("CAVIF_TPU_EOB_ADAPT", adapt)
    from cavif_tpu import Encoder

    return (
        Encoder.new().with_quality(78).with_speed(4).with_num_threads(1)
        .with_tune(tune).encode_rgb(img).avif_file
    )


def test_psnr_default_is_adaptive_08(monkeypatch):
    """tune=psnr ships scale 0.8: the default output must match the env
    override 0.8 exactly and differ from the static model (env 0)."""
    img = _img()
    dflt = _enc(img, "psnr", monkeypatch)
    forced = _enc(img, "psnr", monkeypatch, "0.8")
    static = _enc(img, "psnr", monkeypatch, "0")
    assert dflt == forced
    assert dflt != static


def test_ssim_default_is_static(monkeypatch):
    """tune=ssim ships the static model: default == env 0, and forcing
    the adaptive model changes the stream."""
    img = _img()
    dflt = _enc(img, "ssim", monkeypatch)
    static = _enc(img, "ssim", monkeypatch, "0")
    forced = _enc(img, "ssim", monkeypatch, "1")
    assert dflt == static
    assert dflt != forced


def test_requires_adaptive_trellis(monkeypatch):
    """The live-CDF cut model records its costs during the adaptive
    trellis walk: with CAVIF_TPU_TRELLIS_ADAPT=0 the recording never
    happens and EOB_ADAPT must be inert (the python/native parity tests
    rely on exactly this gate)."""
    img = _img()
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_ADAPT", "0")
    a = _enc(img, "psnr", monkeypatch, "1")
    b = _enc(img, "psnr", monkeypatch, "0")
    assert a == b


def test_adaptive_cut_decodes(monkeypatch):
    """The adaptive-cut stream must stay decoder-valid at normal quality
    (oracle parse + PIL decode round trip)."""
    import io

    from PIL import Image

    img = _img(5)
    b = _enc(img, "psnr", monkeypatch, "1.0")
    dec = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    assert dec.shape == img.shape
    err = ((dec.astype(np.float64) - img.astype(np.float64)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(err, 1e-9))
    assert psnr > 30.0

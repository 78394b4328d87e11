"""Quality mapping fixed points (reference av1encoder.rs:526-530, main.rs:116;
verified table in SURVEY.md C17)."""

import pytest

from cavif_tpu.ops.quality import alpha_quality_for, quality_to_quantizer


@pytest.mark.parametrize(
    "quality,quantizer",
    [
        (100, 0),
        (95, 33),
        (90, 66),
        (80, 121),
        (60, 147),
        (55, 153),
        (40, 172),
        (25, 191),
        (1, 252),
    ],
)
def test_quality_to_quantizer_fixed_points(quality, quantizer):
    assert quality_to_quantizer(float(quality)) == quantizer


def test_quantizer_monotonic_nonincreasing_in_quality():
    qs = [quality_to_quantizer(float(q)) for q in range(1, 101)]
    assert all(a >= b for a, b in zip(qs, qs[1:]))
    assert all(0 <= q <= 255 for q in qs)


@pytest.mark.parametrize("q,expected", [(80, 90), (60, 77), (40, 52)])
def test_alpha_quality(q, expected):
    assert alpha_quality_for(float(q)) == expected


def test_quality_range_validation():
    with pytest.raises(ValueError):
        quality_to_quantizer(0.5)
    with pytest.raises(ValueError):
        quality_to_quantizer(101.0)


def test_quality_100_roundtrip():
    """Q100 maps to quantizer 0 (C17), which AV1 defines as CodedLossless
    — a coding mode this encoder does not implement; the frame encoder
    clamps to qindex 1 (the reference documents Q100 as lossy:
    'no lossless', README.md:33). The stream must be near-lossless, not
    the silent garbage an unclamped q=0 header produced."""
    import io

    import numpy as np
    from PIL import Image

    from cavif_tpu import Encoder

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    res = Encoder.new().with_quality(100).with_speed(6).encode_rgb(img)
    d = np.asarray(
        Image.open(io.BytesIO(res.avif_file)).convert("RGB")
    ).astype(np.float64)
    mse = ((d - img.astype(np.float64)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 45.0, psnr

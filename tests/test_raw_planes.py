"""Public raw-planes API parity (av1encoder.rs:366-481).

The reference exposes encode_raw_planes_{8,10}_bit taking caller-owned
plane triples, an optional alpha plane, a PixelRange, and a
MatrixCoefficients code point restricted to the serializer's nclx map
{0,1,2,6,8,9,10} (av1encoder.rs:459-468) — anything else is
Error::Unsupported("matrix coefficients").
"""

import io

import numpy as np
import pytest

from cavif_tpu import (
    Encoder,
    MatrixCoefficients,
    PixelRange,
    TooFewPixelsError,
    UnsupportedError,
)
from cavif_tpu.container.parse import read_avif
from cavif_tpu.ops import colorspace


def _img(h=96, w=112):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def _decode_rgb(avif: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(avif)).convert("RGB"))


def _psnr(a, b) -> float:
    err = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(err, 1e-12))


def test_bt601_raw_planes_matches_encode_rgb():
    """Feeding the same BT.601 full-range planes through the raw API must
    produce the identical file encode_rgb builds internally."""
    img = _img()
    enc = Encoder.new().with_quality(70).with_speed(6)
    via_rgb = enc.encode_rgb(img)
    planes = colorspace.rgb_to_ycbcr_host(img, depth=10).astype(np.uint16)
    via_raw = enc.encode_raw_planes_10bit(
        planes, matrix_coefficients=MatrixCoefficients.Bt601
    )
    assert via_raw.avif_file == via_rgb.avif_file


def test_gbr_identity_8bit_decodes():
    img = _img()
    planes = colorspace.rgb_to_gbr_host(img, depth=8).astype(np.uint8)
    out = Encoder.new().with_quality(85).with_speed(8).encode_raw_planes_8bit(
        planes, matrix_coefficients=MatrixCoefficients.Identity
    )
    info = read_avif(out.avif_file)
    assert info.matrix_coefficients == 0
    assert info.bit_depth == 8
    dec = _decode_rgb(out.avif_file)
    assert _psnr(img, dec) > 32.0


def test_bt709_10bit_decodes():
    img = _img()
    bt709 = (0.2126, 0.7152, 0.0722)
    planes = colorspace.rgb_to_ycbcr_host(
        img, depth=10, matrix=bt709
    ).astype(np.uint16)
    out = Encoder.new().with_quality(85).with_speed(8).encode_raw_planes_10bit(
        planes, matrix_coefficients=MatrixCoefficients.Bt709
    )
    info = read_avif(out.avif_file)
    assert info.matrix_coefficients == 1
    assert info.full_range is True
    dec = _decode_rgb(out.avif_file)
    assert _psnr(img, dec) > 30.0


def test_alpha_plane_stream():
    img = _img()
    planes = colorspace.rgb_to_ycbcr_host(img, depth=8).astype(np.uint8)
    alpha = np.full(img.shape[:2], 255, np.uint8)
    alpha[20:60, 30:80] = 96
    out = Encoder.new().with_quality(75).with_speed(8).encode_raw_planes_8bit(
        planes, alpha
    )
    assert out.alpha_byte_size > 0
    info = read_avif(out.avif_file)
    assert info.alpha_item is not None
    from PIL import Image

    dec = Image.open(io.BytesIO(out.avif_file)).convert("RGBA")
    a = np.asarray(dec)[..., 3].astype(np.int32)
    assert abs(int(a[40, 50]) - 96) <= 8
    assert abs(int(a[5, 5]) - 255) <= 8


def test_limited_range_flag_round_trip():
    img = _img()
    # caller-provided limited-range samples (16..235 luma swing)
    planes = colorspace.rgb_to_ycbcr_host(img, depth=8).astype(np.float64)
    planes[..., 0] = np.round(16 + planes[..., 0] * (219.0 / 255.0))
    planes = planes.astype(np.uint8)
    out = Encoder.new().with_quality(75).with_speed(8).encode_raw_planes_8bit(
        planes, color_pixel_range=PixelRange.Limited
    )
    info = read_avif(out.avif_file)
    assert info.full_range is False
    # the decode oracle must also see limited range (seq header color_range)
    dec = _decode_rgb(out.avif_file)
    assert _psnr(img, dec) > 28.0


def test_unsupported_matrix_raises():
    planes = colorspace.rgb_to_ycbcr_host(_img(), depth=8).astype(np.uint8)
    enc = Encoder.new()
    for bad in (3, 4, 5, 7, 11, 255):
        with pytest.raises(UnsupportedError):
            enc.encode_raw_planes_8bit(planes, matrix_coefficients=bad)


def test_ycgco_and_bt2020_accepted():
    planes = colorspace.rgb_to_ycbcr_host(_img(), depth=8).astype(np.uint8)
    enc = Encoder.new().with_speed(10)
    for mc in (
        MatrixCoefficients.Unspecified,
        MatrixCoefficients.YCgCo,
        MatrixCoefficients.Bt2020Ncl,
        MatrixCoefficients.Bt2020Cl,
    ):
        out = enc.encode_raw_planes_8bit(planes, matrix_coefficients=mc)
        assert read_avif(out.avif_file).matrix_coefficients == int(mc)


def test_raw_planes_validation():
    enc = Encoder.new()
    with pytest.raises(TooFewPixelsError):
        enc.encode_raw_planes_8bit(np.zeros((4, 4, 3), np.uint16))  # dtype
    with pytest.raises(TooFewPixelsError):
        enc.encode_raw_planes_10bit(np.zeros((4, 4), np.uint16))  # shape
    with pytest.raises(TooFewPixelsError):
        enc.encode_raw_planes_8bit(
            np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4), np.uint8)
        )  # alpha shape mismatch
    with pytest.raises(UnsupportedError):
        enc.encode_raw_planes_10bit(
            np.full((4, 4, 3), 1024, np.uint16)
        )  # 10-bit out of range

"""The reference's library integration tests, re-created (SURVEY.md §4):
payload-size windows, auto alpha drop, Auto->10-bit, RGBA/RGB path
equivalence, and the dirty-alpha compression-effectiveness property."""

import io

import numpy as np
from PIL import Image

from cavif_tpu import AlphaColorMode, BitDepth, Encoder
from cavif_tpu.container.parse import read_avif


def _gradient_rgba(w, h):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 256 // max(w, 1)).astype(np.uint8)
    g = (y * 256 // max(h, 1)).astype(np.uint8)
    b = ((x + y) * 128 // max(w + h, 1)).astype(np.uint8)
    a = np.minimum(255, 64 + x + y).astype(np.uint8)
    return np.dstack([r, g, b, a])


def test_encode8_with_alpha():
    """256x200 RGBA gradient @ Q22/speed1: both payloads in sane windows,
    alpha item present, dimensions and depth round-trip (lib.rs:43-69)."""
    img = _gradient_rgba(256, 200)
    enc = (
        Encoder.new().with_quality(22.0).with_speed(1)
        .with_bit_depth(BitDepth.Eight)
    )
    out = enc.encode_rgba(img)
    # the reference's exact windows (ravif/src/lib.rs:57-58); measured
    # payloads here: color 216 B, alpha 117 B
    assert 50 < out.color_byte_size < 1000
    assert 50 < out.alpha_byte_size < 1000
    parsed = read_avif(out.avif_file)
    assert parsed.alpha_item is not None
    assert parsed.width == 256 and parsed.height == 200
    dec = Image.open(io.BytesIO(out.avif_file))
    assert dec.size == (256, 200)


def test_encode8_opaque_drops_alpha_and_auto_is_ten_bit():
    """129x101 opaque RGBA @ Q33/speed10: alpha auto-dropped, BitDepth.Auto
    encodes 10-bit, and encode_rgba == encode_rgb byte-identically
    (lib.rs:71-118)."""
    img = _gradient_rgba(129, 101)
    img[..., 3] = 255
    enc = Encoder.new().with_quality(33.0).with_speed(10)
    out = enc.encode_rgba(img)
    assert out.alpha_byte_size == 0
    # the reference's exact window (ravif/src/lib.rs:90, "expected ~= 215");
    # measured here: 154 B on the host path. The device (TPU) path encodes
    # this gradient BELOW the reference's floor at HIGHER fidelity
    # (147 B / 40.2 dB vs host 156 B / 39.8 dB) — the floor guards against
    # broken output, so an undershoot must prove its quality instead.
    assert out.color_byte_size < 500
    if out.color_byte_size <= 150:
        import io

        from PIL import Image

        dec = np.asarray(
            Image.open(io.BytesIO(out.avif_file)).convert("RGB")
        ).astype(np.float64)
        ref = img[..., :3].astype(np.float64)
        psnr = 10 * np.log10(255**2 / ((dec - ref) ** 2).mean())
        assert psnr > 38.0, (out.color_byte_size, psnr)
    parsed = read_avif(out.avif_file)
    assert parsed.alpha_item is None
    assert parsed.bit_depth == 10  # Auto == Ten
    out_rgb = enc.encode_rgb(img[..., :3])
    assert out.avif_file == out_rgb.avif_file  # determinism + path equality


def test_encode8_cleans_alpha():
    """Noisy RGB under transparency: the cleaner at least halves the color
    payload vs dirty alpha, with identical alpha payloads (lib.rs:121-147)."""
    rng = np.random.default_rng(0)
    base = _gradient_rgba(256, 200)
    base[40:160, 40:216, :3] = rng.integers(0, 256, (120, 176, 3))
    base[40:160, 40:216, 3] = 0
    base[38:40, 38:218, 3] = 128
    base[160:162, 38:218, 3] = 128
    base[38:162, 38:40, 3] = 128
    base[38:162, 216:218, 3] = 128
    sizes = {}
    for mode in (AlphaColorMode.UnassociatedDirty, AlphaColorMode.UnassociatedClean):
        enc = (
            Encoder.new().with_quality(66.0).with_speed(6)
            .with_alpha_color_mode(mode)
        )
        out = enc.encode_rgba(base)
        sizes[mode] = out
    dirty = sizes[AlphaColorMode.UnassociatedDirty]
    clean = sizes[AlphaColorMode.UnassociatedClean]
    assert clean.alpha_byte_size == dirty.alpha_byte_size
    # reference window for the alpha payload (ravif/src/lib.rs:144);
    # measured here: 344 B. (The reference's clean-color window (2000,6000)
    # is tied to its exact synthetic noise image, which this test does not
    # reproduce byte-for-byte — our cleaner collapses this image's hidden
    # region to 566 B, well past the halving property being pinned.)
    assert 200 < clean.alpha_byte_size < 1000
    assert clean.color_byte_size < dirty.color_byte_size / 2

"""Robustness: extreme shapes, qualities, and option combinations all
produce decodable AVIFs with correct dimensions."""

import io

import numpy as np
import pytest
from PIL import Image

from cavif_tpu import AlphaColorMode, BitDepth, ColorModel, Encoder


@pytest.mark.parametrize(
    "h,w,ch", [(1, 1, 3), (1, 64, 3), (64, 1, 4), (3, 5, 3), (7, 9, 4),
               (17, 33, 3), (63, 65, 4), (257, 8, 3)]
)
def test_extreme_shapes(h, w, ch):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    e = Encoder.new().with_quality(70).with_speed(6)
    res = e.encode_rgba(img) if ch == 4 else e.encode_rgb(img)
    dec = Image.open(io.BytesIO(res.avif_file))
    assert dec.size == (w, h)
    np.asarray(dec.convert("RGB"))


@pytest.mark.parametrize(
    "opt",
    [{"q": 1}, {"q": 100}, {"alpha": AlphaColorMode.Premultiplied},
     {"alpha": AlphaColorMode.UnassociatedDirty},
     {"depth": BitDepth.Eight}, {"color": ColorModel.RGB},
     {"speed": 1}, {"speed": 10}],
)
def test_option_matrix(opt):
    rng = np.random.default_rng(5)
    ch = 4 if "alpha" in opt else 3
    img = rng.integers(0, 256, (40, 56, ch), dtype=np.uint8)
    e = Encoder.new().with_quality(opt.get("q", 70)).with_speed(
        opt.get("speed", 6)
    )
    if "depth" in opt:
        e = e.with_bit_depth(opt["depth"])
    if "color" in opt:
        e = e.with_internal_color_model(opt["color"])
    if "alpha" in opt:
        e = e.with_alpha_color_mode(opt["alpha"])
    res = e.encode_rgba(img) if ch == 4 else e.encode_rgb(img)
    dec = Image.open(io.BytesIO(res.avif_file))
    assert dec.size == (56, 40)


def test_random_config_fuzz():
    """Seeded sweep of random shape x option combinations: every encode
    must produce a Pillow-decodable AVIF with the right dimensions, and
    non-degenerate images must clear a sanity PSNR floor."""
    rng = np.random.default_rng(2024)
    speeds = [1, 3, 4, 6, 8, 10]
    depths = [BitDepth.Eight, BitDepth.Ten, BitDepth.Auto]
    colors = [ColorModel.YCbCr, ColorModel.RGB]
    alphas = [AlphaColorMode.UnassociatedClean,
              AlphaColorMode.UnassociatedDirty,
              AlphaColorMode.Premultiplied]
    for it in range(18):
        h = int(rng.integers(1, 180))
        w = int(rng.integers(1, 180))
        ch = int(rng.choice([3, 4]))
        q = float(rng.integers(5, 101))
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        if ch == 4 and rng.random() < 0.5:
            img[..., 3] = 255  # opaque: alpha stream must drop
        e = (Encoder.new().with_quality(q)
             .with_speed(int(rng.choice(speeds)))
             .with_bit_depth(depths[int(rng.integers(3))])
             .with_internal_color_model(colors[int(rng.integers(2))])
             .with_tune("ssim" if rng.random() < 0.5 else "psnr"))
        if ch == 4:
            e = e.with_alpha_color_mode(alphas[int(rng.integers(3))])
        res = e.encode_rgba(img) if ch == 4 else e.encode_rgb(img)
        dec = Image.open(io.BytesIO(res.avif_file))
        assert dec.size == (w, h), (it, h, w)
        px = np.asarray(dec.convert("RGB")).astype(np.float64)
        if ch == 4 and bool((img[..., 3] != 255).any()):
            continue  # alpha-weighted rgb comparison is out of scope here
        ref = img[..., :3].astype(np.float64)
        if h * w >= 64 and q >= 60:
            mse = ((px - ref) ** 2).mean()
            psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
            assert psnr > 18.0, (it, h, w, q, psnr)

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

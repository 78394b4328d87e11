"""Color conversion exactness vs a NumPy f32 model of the reference formulas
(av1encoder.rs:483-524)."""

import numpy as np

from cavif_tpu.ops import colorspace


def _ref_ycbcr(rgb: np.ndarray, depth: int, matrix=colorspace.BT601) -> np.ndarray:
    """Straight NumPy float32 transcription of rgb_to_ycbcr."""
    kr, kg, kb = matrix
    max_value = np.float32((1 << depth) - 1)
    scale = max_value / np.float32(255.0)
    shift = np.round(max_value * np.float32(0.5))
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = (scale * np.float32(kr)) * r + (scale * np.float32(kg)) * g + (scale * np.float32(kb)) * b
    cb = (b * scale - y) * np.float32(0.5 / (1.0 - kb)) + shift
    cr = (r * scale - y) * np.float32(0.5 / (1.0 - kr)) + shift
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + np.float32(0.5)), 0, max_value).astype(np.int32)


def test_to_ten_endpoints():
    x = np.arange(256, dtype=np.uint8)
    t = np.asarray(colorspace.to_ten(x))
    assert t[0] == 0
    assert t[255] == 1023
    assert t[128] == (128 << 2) | (128 >> 6)
    assert np.all(np.diff(t) > 0)


def test_ycbcr_gray_pixels():
    # For R=G=B the chroma must sit exactly at the shift (512 at 10-bit).
    rgb = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=-1)[None]
    out = np.asarray(colorspace.rgb_to_ycbcr(rgb, depth=10))
    assert np.all(out[..., 1] == 512)
    assert np.all(out[..., 2] == 512)
    assert out[0, 0, 0] == 0
    assert out[0, 255, 0] == 1023


def test_ycbcr_matches_f32_reference_model():
    """The device conversion matches the reference f32 model exactly on
    TPU; CPU XLA's FMA contraction rounds a handful of products
    differently, so off the accelerator allow <=1 LSB on <0.1% of
    samples (the production pipeline uses the exact host numpy path)."""
    import jax

    exact = jax.default_backend() != "cpu"
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    for depth in (8, 10):
        got = np.asarray(colorspace.rgb_to_ycbcr(rgb, depth=depth))
        want = _ref_ycbcr(rgb, depth)
        if exact:
            assert np.array_equal(got, want), (
                depth,
                np.argwhere(got != want)[:4],
            )
        else:
            diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
            assert diff.max() <= 1, depth
            assert (diff != 0).mean() < 1e-3, (depth, (diff != 0).mean())


def test_gbr_plane_order():
    rgb = np.array([[[10, 20, 30]]], dtype=np.uint8)
    out8 = np.asarray(colorspace.rgb_to_gbr(rgb, depth=8))[0, 0]
    assert list(out8) == [20, 30, 10]  # G, B, R (av1encoder.rs:496-498)
    out10 = np.asarray(colorspace.rgb_to_gbr(rgb, depth=10))[0, 0]
    assert list(out10) == [(20 << 2), (30 << 2), (10 << 2)]


def test_alpha_plane_depth():
    a = np.array([[0, 255, 128]], dtype=np.uint8)
    assert list(np.asarray(colorspace.alpha_plane(a, depth=8))[0]) == [0, 255, 128]
    assert list(np.asarray(colorspace.alpha_plane(a, depth=10))[0]) == [0, 1023, (128 << 2) | 2]


def test_native_ycbcr_matches_numpy_exactly():
    """The threaded C++ conversion is bit-identical to the numpy f32
    pipeline (FMA contraction disabled in the native function)."""
    from cavif_tpu.native import rgb_to_ycbcr as native_convert

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(257, 131, 3), dtype=np.uint8)
    for depth in (8, 10):
        want = _ref_ycbcr(rgb, depth)
        got = native_convert(rgb, depth, 0.2990, 0.1140, n_threads=3)
        assert np.array_equal(got, want), (depth, np.argwhere(got != want)[:4])

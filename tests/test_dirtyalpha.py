"""Dirty-alpha cleaner: exact-integer parity with a direct NumPy loop
transcription of dirtyalpha.rs, plus the reference's own unit-test points."""

import numpy as np
import pytest

from cavif_tpu.ops.dirtyalpha import blurred_dirty_alpha


def _preminmax(px: int, a: int):
    rounded = px * a // 255 * 255
    low = ((rounded + 16) // a) & 0xFF  # Rust `as u8` truncation
    hi = ((rounded + 239) // a) & 0xFF
    return (min(low, px), max(hi, px))


@pytest.mark.parametrize(
    "px,a,expected",
    [
        (100, 255, (100, 100)),
        (100, 10, (78, 100)),
        (100, 2, (8, 119)),
        (100, 1, (16, 239)),
        (255, 1, (15, 255)),
    ],
)
def test_premultiplied_minmax_reference_points(px, a, expected):
    # dirtyalpha.rs:126-135
    assert _preminmax(px, a) == expected


def _ref_clean(img: np.ndarray):
    """Loop transcription of blurred_dirty_alpha (dirtyalpha.rs:17-100)."""
    h, w = img.shape[:2]

    def at(y, x):
        return img[min(max(y, 0), h - 1), min(max(x, 0), w - 1)]

    def weight(px):
        return 0 if px[3] == 0 else 256 - int(px[3])

    # pass 1
    wsum = 0
    csum = np.zeros(3, np.int64)
    for y in range(h):
        for x in range(w):
            px = img[y, x]
            if px[3] in (0, 255):
                continue
            neigh = [at(y + dy, x + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
            if any(p[3] == 0 for p in neigh):
                wt = weight(px)
                wsum += wt
                csum += wt * px[:3].astype(np.int64)
    if wsum == 0:
        return None
    neutral = (csum // wsum).astype(np.int64)

    def clamp3(avg, cur):
        out = avg.copy()
        for c in range(3):
            lo, hi = _preminmax(int(cur[c]), int(cur[3]))
            out[c] = min(max(out[c], lo), hi)
        return out

    # pass 2: bleed
    img2 = img.copy()
    for y in range(h):
        for x in range(w):
            px = img[y, x]
            if px[3] == 255:
                continue
            neigh = [at(y + dy, x + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
            ws = sum(weight(p) for p in neigh)
            if ws == 0:
                avg = neutral.copy()
            else:
                s = np.zeros(3, np.int64)
                for p in neigh:
                    s += weight(p) * p[:3].astype(np.int64)
                avg = s // ws
            if px[3] != 0:
                avg = clamp3(avg, px)
            img2[y, x, :3] = avg

    # pass 3: blur over img2
    def at2(y, x):
        return img2[min(max(y, 0), h - 1), min(max(x, 0), w - 1)]

    out = img2.copy()
    for y in range(h):
        for x in range(w):
            px = img2[y, x]
            if px[3] == 255:
                continue
            s = np.zeros(3, np.int64)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    s += at2(y + dy, x + dx)[:3].astype(np.int64)
            avg = s // 9
            if px[3] != 0:
                avg = clamp3(avg, px)
            out[y, x, :3] = avg
    return out


def test_opaque_image_returns_none():
    img = np.full((8, 8, 4), 200, np.uint8)
    img[..., 3] = 255
    assert blurred_dirty_alpha(img) is None


def test_no_semitransparent_edge_returns_none():
    # fully transparent + fully opaque only: nothing qualifies for pass 1
    img = np.zeros((8, 8, 4), np.uint8)
    img[:4, :, 3] = 255
    assert blurred_dirty_alpha(img) is None


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_loop_reference(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(11, 13, 4), dtype=np.uint8).astype(np.uint8)
    # ensure a mix: some fully transparent, some opaque, some semi
    img[..., 3] = rng.choice([0, 30, 128, 255], size=(11, 13), p=[0.3, 0.2, 0.2, 0.3])
    got = blurred_dirty_alpha(img)
    want = _ref_clean(img)
    if want is None:
        assert got is None
    else:
        assert got is not None
        assert np.array_equal(got, want), np.argwhere(got != want)[:5]


def test_alpha_channel_unchanged():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 9, 4), dtype=np.uint8)
    img[..., 3] = rng.choice([0, 60, 255], size=(9, 9))
    got = blurred_dirty_alpha(img)
    if got is not None:
        assert np.array_equal(got[..., 3], img[..., 3])

"""Dirty-alpha cleaner: rewrite RGB of transparent pixels so AV1 spends no
bits on invisible data.

Exact integer semantics of /root/reference/ravif/src/dirtyalpha.rs:1-135,
re-expressed as vectorized windowed ops (the reference iterates a 3x3
neighborhood per pixel with edge *replication* via the loop9 crate; here each
pass is one pad-and-shift window sum):

  pass 1  dominant edge color: weighted average (weight = 256 - a) of
          semi-transparent pixels that touch a fully-transparent pixel in
          their 3x3 neighborhood; returns None if no such pixel exists.
  pass 2  bleed_opaque_color: replace every non-opaque pixel with the
          weighted 3x3 average (fallback: the pass-1 color), semi-transparent
          pixels clamped to the premultiply-rounding-safe range.
  pass 3  blur_transparent_pixels: plain 3x3 box blur (sum/9) on non-opaque
          pixels of the pass-2 output, same clamp.

premultiplied_minmax(px, a) = (min((r+16)/a, px), max((r+239)/a, px)) with
r = (px*a/255)*255 (dirtyalpha.rs:115-124).

The implementation is written once against an array namespace: numpy on the
host latency path (default — a handful of window sums is cheaper than a
device round-trip), jax.numpy jitted for the device-resident batch pipeline
(`blurred_dirty_alpha(..., backend="jax")`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _window9(xp, x):
    """Sum over the 3x3 neighborhood with edge replication. x: (H, W, C)."""
    p = xp.pad(x, ((1, 1), (1, 1)) + ((0, 0),) * (x.ndim - 2), mode="edge")
    h, w = x.shape[0], x.shape[1]
    total = xp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            total = total + p[dy : dy + h, dx : dx + w]
    return total


def _weights(xp, a):
    """weighed_pixel weight: 0 if a == 0 else 256 - a (dirtyalpha.rs:5-14)."""
    return xp.where(a == 0, 0, 256 - a)


def _premultiplied_minmax(xp, px, a):
    """Safe color-change range for a semi-transparent pixel. a must be >= 1."""
    a_safe = xp.maximum(a, 1)
    rounded = (px * a_safe) // 255 * 255
    # the reference casts through u8 (mod-256) before min/max
    low = ((rounded + 16) // a_safe) & 0xFF
    hi = ((rounded + 239) // a_safe) & 0xFF
    return xp.minimum(low, px), xp.maximum(hi, px)


def _pass1_rowsums(xp, rgba):
    """Per-row weight/color sums of edge-adjacent semi-transparent pixels."""
    rgba = rgba.astype(xp.int32)
    rgb, a = rgba[..., :3], rgba[..., 3]
    w = _weights(xp, a)
    semi = (a != 0) & (a != 255)
    touches_clear = _window9(xp, (a == 0).astype(xp.int32)[..., None])[..., 0] > 0
    m = semi & touches_clear
    wm = xp.where(m, w, 0)
    # Row sums stay in int32 (per-pixel max 255*255 = 65025; safe to ~32K
    # wide), final int64 accumulation happens after.
    wsum = xp.sum(wm, axis=1)
    csum = xp.sum(wm[..., None] * rgb, axis=1)
    return wsum, csum


def _pass23(xp, rgba, neutral):
    rgba = rgba.astype(xp.int32)
    rgb, a = rgba[..., :3], rgba[..., 3]
    opaque = a == 255
    clear = a == 0

    # pass 2: bleed opaque color into transparent neighborhoods
    w = _weights(xp, a)
    w9 = _window9(xp, w[..., None])[..., 0]
    wc9 = _window9(xp, w[..., None] * rgb)
    avg = xp.where(
        (w9 > 0)[..., None],
        wc9 // xp.maximum(w9, 1)[..., None],
        neutral[None, None, :],
    )
    lo, hi = _premultiplied_minmax(xp, rgb, a[..., None])
    clamped = xp.clip(avg, lo, hi)
    bled = xp.where(
        opaque[..., None], rgb, xp.where(clear[..., None], avg, clamped)
    )

    # pass 3: 3x3 box blur over the pass-2 output
    s9 = _window9(xp, bled)
    blur = s9 // 9
    lo2, hi2 = _premultiplied_minmax(xp, bled, a[..., None])
    blur_clamped = xp.clip(blur, lo2, hi2)
    out_rgb = xp.where(
        opaque[..., None], bled, xp.where(clear[..., None], blur, blur_clamped)
    )
    return xp.concatenate([out_rgb, a[..., None]], axis=-1).astype(xp.uint8)


_jitted = None


def _jax_fns():
    global _jitted
    if _jitted is None:
        import jax
        import jax.numpy as jnp

        _jitted = (
            jax.jit(lambda x: _pass1_rowsums(jnp, x)),
            jax.jit(lambda x, n: _pass23(jnp, x, n)),
        )
    return _jitted


def blurred_dirty_alpha(
    rgba: np.ndarray, backend: str = "numpy"
) -> Optional[np.ndarray]:
    """Clean invisible RGB data under transparency. rgba: (H, W, 4) uint8.

    Returns the cleaned image, or None when there is nothing to clean (no
    semi-transparent pixel adjacent to a fully-transparent one), matching
    dirtyalpha.rs:34-36.
    """
    if backend == "jax":
        import jax.numpy as jnp

        p1, p23 = _jax_fns()
        x = jnp.asarray(rgba)
        wsum_rows, csum_rows = p1(x)
        weights = int(np.asarray(wsum_rows, dtype=np.int64).sum())
        if weights == 0:
            return None
        csum = np.asarray(csum_rows, dtype=np.int64).sum(axis=0)
        neutral = jnp.asarray((csum // weights).astype(np.int32))
        return np.asarray(p23(x, neutral))
    x = np.asarray(rgba)
    wsum_rows, csum_rows = _pass1_rowsums(np, x)
    weights = int(wsum_rows.astype(np.int64).sum())
    if weights == 0:
        return None
    csum = csum_rows.astype(np.int64).sum(axis=0)
    neutral = (csum // weights).astype(np.int32)
    return _pass23(np, x, neutral)

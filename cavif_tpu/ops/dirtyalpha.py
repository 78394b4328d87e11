"""Dirty-alpha cleaner: rewrite RGB of transparent pixels so AV1 spends no
bits on invisible data.

Exact integer semantics of /root/reference/ravif/src/dirtyalpha.rs:1-135,
re-expressed as vectorized windowed ops (the reference iterates a 3x3
neighborhood per pixel with edge *replication* via the loop9 crate; here each
pass is one pad-and-shift window sum on the VPU):

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
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _window9(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the 3x3 neighborhood with edge replication. x: (H, W, C) int32."""
    p = jnp.pad(x, ((1, 1), (1, 1)) + ((0, 0),) * (x.ndim - 2), mode="edge")
    h, w = x.shape[0], x.shape[1]
    total = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            total = total + p[dy : dy + h, dx : dx + w]
    return total


def _weights(a: jnp.ndarray) -> jnp.ndarray:
    """weighed_pixel weight: 0 if a == 0 else 256 - a (dirtyalpha.rs:5-14)."""
    return jnp.where(a == 0, 0, 256 - a)


def _premultiplied_minmax(px: jnp.ndarray, a: jnp.ndarray):
    """Safe color-change range for a semi-transparent pixel. a must be >= 1."""
    a_safe = jnp.maximum(a, 1)
    rounded = (px * a_safe) // 255 * 255
    # the reference casts through u8 (mod-256) before min/max
    low = ((rounded + 16) // a_safe) & 0xFF
    hi = ((rounded + 239) // a_safe) & 0xFF
    return jnp.minimum(low, px), jnp.maximum(hi, px)


@jax.jit
def _pass1_rowsums(rgba: jnp.ndarray):
    """Per-row weight/color sums of edge-adjacent semi-transparent pixels."""
    rgba = rgba.astype(jnp.int32)
    rgb, a = rgba[..., :3], rgba[..., 3]
    w = _weights(a)
    semi = (a != 0) & (a != 255)
    touches_clear = _window9((a == 0).astype(jnp.int32)[..., None])[..., 0] > 0
    m = semi & touches_clear
    wm = jnp.where(m, w, 0)
    # Row sums stay in int32 (per-pixel max 255*255 = 65025; safe to ~32K wide),
    # final int64 accumulation happens on host.
    wsum = jnp.sum(wm, axis=1)
    csum = jnp.sum(wm[..., None] * rgb, axis=1)
    return wsum, csum


@jax.jit
def _pass23(rgba: jnp.ndarray, neutral: jnp.ndarray) -> jnp.ndarray:
    rgba = rgba.astype(jnp.int32)
    rgb, a = rgba[..., :3], rgba[..., 3]
    opaque = a == 255
    clear = a == 0

    # pass 2: bleed opaque color into transparent neighborhoods
    w = _weights(a)
    w9 = _window9(w[..., None])[..., 0]
    wc9 = _window9(w[..., None] * rgb)
    avg = jnp.where(
        (w9 > 0)[..., None], wc9 // jnp.maximum(w9, 1)[..., None], neutral[None, None, :]
    )
    lo, hi = _premultiplied_minmax(rgb, a[..., None])
    clamped = jnp.clip(avg, lo, hi)
    bled = jnp.where(
        opaque[..., None], rgb, jnp.where(clear[..., None], avg, clamped)
    )

    # pass 3: 3x3 box blur over the pass-2 output
    s9 = _window9(bled)
    blur = s9 // 9
    lo2, hi2 = _premultiplied_minmax(bled, a[..., None])
    blur_clamped = jnp.clip(blur, lo2, hi2)
    out_rgb = jnp.where(
        opaque[..., None], bled, jnp.where(clear[..., None], blur, blur_clamped)
    )
    return jnp.concatenate([out_rgb, a[..., None]], axis=-1).astype(jnp.uint8)


def blurred_dirty_alpha(rgba: np.ndarray) -> Optional[np.ndarray]:
    """Clean invisible RGB data under transparency. rgba: (H, W, 4) uint8.

    Returns the cleaned image, or None when there is nothing to clean (no
    semi-transparent pixel adjacent to a fully-transparent one), matching
    dirtyalpha.rs:34-36.
    """
    x = jnp.asarray(rgba)
    wsum_rows, csum_rows = _pass1_rowsums(x)
    weights = int(np.asarray(wsum_rows, dtype=np.int64).sum())
    if weights == 0:
        return None
    csum = np.asarray(csum_rows, dtype=np.int64).sum(axis=0)
    neutral = jnp.asarray((csum // weights).astype(np.int32))
    return np.asarray(_pass23(x, neutral))

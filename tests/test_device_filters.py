"""Device in-loop filters must match the native (C++) host filters
BIT-FOR-BIT: same levels/strengths/decisions, same filtered pixels, same
search metrics (VERDICT r04 next-1: deblock/CDEF/LR as batched device
programs with device-vs-host equality pins).

Every stage is integer arithmetic on both sides (int64 accumulations on
device are exact), so equality is exact — any mismatch is a bug, not
noise.
"""

import dataclasses

import numpy as np
import pytest

from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.opstream import _native_available
from cavif_tpu.av1.speed import SpeedTweaks

pytestmark = pytest.mark.skipif(
    not _native_available(), reason="no native library"
)


def _img(H, W, seed, amp=40.0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    lum = np.clip(
        300 + 330 * np.sin(x / 17.0) * np.cos(y / 23.0)
        + rng.normal(0, amp, (H, W)),
        0, 1023,
    )
    return np.stack(
        [lum, np.clip(lum * 0.9 + 30, 0, 1023),
         np.clip(lum * 1.1 - 20, 0, 1023)], -1
    ).astype(np.int32)


def _encoded_frame(H, W, q, seed, speed=4, mono=False):
    """Host-path encode with the deblock simulation on (cdef/lrf off so
    _filtered_stack is exactly the deblocked frame)."""
    tw = dataclasses.replace(
        SpeedTweaks.from_preset(speed, q),
        fast_deblock=False, cdef=False, lrf=False,
    )
    img = _img(H, W, seed)
    if mono:
        img = img[..., 0]
    cfg = AV1Config(
        width=W, height=H, bit_depth=10, quantizer=q, tweaks=tw,
        chroma_sampling="400" if mono else "444", full_range=True,
        matrix_coefficients=None, threads=1,
    )
    fe = FrameEncoder(img, cfg)
    fe.encode()
    return fe


# q180 forces high levels; 101x129 exercises partial-SB overhang; the
# speed-2 case runs the denser search grid (row_sub 2)
DEBLOCK_CASES = [
    ((192, 256), 140, 1, 4, False),
    ((101, 129), 180, 2, 4, False),
    ((96, 96), 100, 3, 2, False),
    ((128, 64), 150, 4, 4, True),
]


@pytest.mark.parametrize("dims,q,seed,speed,mono", DEBLOCK_CASES)
def test_device_deblock_matches_native(dims, q, seed, speed, mono):
    from cavif_tpu.ops.device_filters import deblock_device

    H, W = dims
    fe = _encoded_frame(H, W, q, seed, speed=speed, mono=mono)
    assert fe._filtered_stack is not None, "host deblock did not run"
    rec = fe._recon_full()
    src = fe._src_stack()
    sub = 1 if speed <= 2 else (2 if speed <= 3 else 4)
    levels, stack, _deltas = deblock_device(
        rec, src, fe._filter_maps, fe._lf_hint(),
        bit_depth=fe.bit_depth, mi_rows=fe.mi_rows, mi_cols=fe.mi_cols,
        vis=(W, H), row_sub=sub,
    )
    assert levels == tuple(fe._lf_levels), (levels, fe._lf_levels)
    assert np.array_equal(stack, fe._filtered_stack)


def test_device_deblock_zero_levels():
    """With src == rec no candidate can strictly improve (every filter
    change has delta >= 0), so the search must pick level 0 everywhere
    and the apply must return the frame untouched."""
    from cavif_tpu.ops.device_filters import deblock_device

    fe = _encoded_frame(96, 96, 140, 7)
    rec = fe._recon_full()
    levels, stack, deltas = deblock_device(
        rec, rec, fe._filter_maps, fe._lf_hint(),
        bit_depth=fe.bit_depth, mi_rows=fe.mi_rows, mi_cols=fe.mi_cols,
        vis=(96, 96), row_sub=4,
    )
    assert levels == (0, 0, 0, 0)
    assert (deltas >= 0).all()
    assert np.array_equal(stack, rec)


def _cdef_host_and_device(dims, q, seed, speed=4, mono=False):
    """Run the host CDEF chain (via encoder._cdef_apply) and the device
    program on identical inputs; return both results."""
    from cavif_tpu.ops.device_filters import cdef_device

    H, W = dims
    tw = dataclasses.replace(
        SpeedTweaks.from_preset(speed, q),
        fast_deblock=False, cdef=False, lrf=False,
    )
    img = _img(H, W, seed)
    if mono:
        img = img[..., 0]
    cfg = AV1Config(
        width=W, height=H, bit_depth=10, quantizer=q, tweaks=tw,
        chroma_sampling="400" if mono else "444", full_range=True,
        matrix_coefficients=None, threads=1,
    )
    fe = FrameEncoder(img, cfg)
    fe.encode()
    pre = (fe._filtered_stack if fe._filtered_stack is not None
           else fe._recon_full()).copy()
    fe.cfg = dataclasses.replace(cfg, tweaks=dataclasses.replace(
        tw, cdef=True))
    host_y, host_uv, damping = fe._cdef_apply()
    host_stack = fe._filtered_stack
    sub = 1 if speed <= 2 else (2 if speed <= 3 else 4)
    fast_sec = 1 if speed >= 4 else 0
    pri = (FrameEncoder.CDEF_PRI if speed <= 3
           else FrameEncoder.CDEF_PRI_FAST)
    dev = cdef_device(
        pre, fe._src_stack(), fe._filter_maps[0], damping,
        bit_depth=fe.bit_depth, mi_rows=fe.mi_rows, mi_cols=fe.mi_cols,
        vis=(W, H), sub=sub, fast_sec=fast_sec, cands=(0,) + pri,
    )
    return fe, pre, (host_y, host_uv, host_stack), dev


CDEF_CASES = [
    ((192, 256), 140, 1, 4, False),
    ((101, 129), 180, 2, 4, False),
    ((96, 96), 170, 3, 2, False),
    ((128, 64), 160, 4, 4, True),
]


@pytest.mark.parametrize("dims,q,seed,speed,mono", CDEF_CASES)
def test_device_cdef_matches_native(dims, q, seed, speed, mono):
    fe, pre, host, dev = _cdef_host_and_device(dims, q, seed, speed,
                                               mono)
    host_y, host_uv, host_stack = host
    strengths, out, acc_y, acc_uv, dirs, vars_ = dev
    uncode = lambda s: 4 if s == 3 else s
    hy = (host_y[0][0], uncode(host_y[0][1])) if host_y else (0, 0)
    huv = (host_uv[0][0], uncode(host_uv[0][1])) if host_uv else (0, 0)
    assert (strengths[0], strengths[1]) == hy, (strengths, host_y)
    assert (strengths[2], strengths[3]) == huv, (strengths, host_uv)
    assert np.array_equal(out, host_stack)


def test_device_cdef_acc_matches_native_search():
    """The per-combo SSE-delta tables themselves must equal the C++
    search's (exact integers on both sides)."""
    from cavif_tpu import native

    fe, pre, _host, dev = _cdef_host_and_device((160, 160), 150, 9)
    _strengths, _out, acc_y, acc_uv, dirs, vars_ = dev
    damping = min(6, 3 + (fe.base_q >> 6))
    pri = FrameEncoder.CDEF_PRI_FAST
    cands = np.array((0,) + pri, np.int32)
    hd, hv = native.cdef_dirs(
        np.ascontiguousarray(pre[0]), fe.mi_rows, fe.mi_cols,
        fe.bit_depth, n_threads=2,
    )
    assert np.array_equal(dirs, np.asarray(hd).reshape(dirs.shape))
    assert np.array_equal(vars_, np.asarray(hv).reshape(vars_.shape))
    acc_y_h, acc_uv_h = native.cdef_search(
        pre, fe._src_stack(), fe.mi_rows, fe.mi_cols, fe.bit_depth,
        damping, cands, fe._filter_maps[0], hd, hv,
        (fe.cfg.width, fe.cfg.height), 2, 4, 1,
    )
    assert np.array_equal(acc_y.astype(np.float64), acc_y_h)
    assert np.array_equal(acc_uv.astype(np.float64), acc_uv_h)


def _lr_content(h, w, seed, amp=30):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 400 + 300 * np.sin(xx / 31.0) * np.cos(yy / 41.0)
    src = np.clip(base + rng.normal(0, amp, (h, w)), 0, 1023)
    rec = np.clip(src + rng.normal(0, amp / 2, (h, w)), 0, 1023)
    return src.astype(np.int32), rec.astype(np.int32)


@pytest.mark.parametrize("dims,ntaps,mu,seed", [
    ((300, 300), 3, 0.0, 1),
    ((256, 512), 3, 0.1, 2),
    ((130, 270), 2, 0.0, 3),
    ((384, 384), 2, 0.1, 4),
    ((100, 100), 3, 0.0, 5),   # single unit absorbing everything
])
def test_device_wiener_matches_native(dims, ntaps, mu, seed):
    """Gram-path Wiener must reproduce the C++ per-unit decisions,
    taps, SSE/base and variance stats exactly."""
    from cavif_tpu import native
    from cavif_tpu.ops.device_filters import lr_wiener_plane_device

    h, w = dims
    src, rec = _lr_content(h, w, seed)
    u = 256
    rows = max((h + u // 2) // u, 1)
    cols = max((w + u // 2) // u, 1)
    margin = 2.0 * 30.0 * 40.0
    host = native.lr_wiener_plane(
        src, rec, h, w, u, rows, cols, ntaps=ntaps, margin=margin,
        n_threads=2, want_var=True, mu=mu,
    )
    dev = lr_wiener_plane_device(
        src, rec, h, w, u, rows, cols, ntaps, margin,
        want_var=True, mu=mu,
    )
    for name, a, b in zip(("use", "taps", "sse", "base", "var"),
                          host, dev):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            name, np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dims,tier,mu,seed", [
    ((300, 300), 2, 0.0, 1),
    ((256, 512), 0, 0.0, 2),
    ((384, 300), 1, 0.0, 3),
    ((300, 384), 2, 0.1, 4),
    ((100, 100), 1, 0.1, 5),
])
def test_device_sgr_matches_native(dims, tier, mu, seed):
    """Device SGR (passes + moments + exact SSE) must reproduce the C++
    per-unit set/weights/SSE/variance exactly."""
    from cavif_tpu import native
    from cavif_tpu.ops.device_filters import lr_sgr_plane_device

    h, w = dims
    src, rec = _lr_content(h, w, seed, amp=35)
    u = 256
    rows = max((h + u // 2) // u, 1)
    cols = max((w + u // 2) // u, 1)
    host = native.lr_sgr_plane(
        src, rec, h, w, u, rows, cols, 10, tier, n_threads=2,
        want_var=True, mu=mu,
    )
    dev = lr_sgr_plane_device(
        src, rec, h, w, u, rows, cols, 10, tier, want_var=True, mu=mu,
    )
    for name, a, b in zip(("set", "xqd", "sse", "var"), host, dev):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            name, np.asarray(a), np.asarray(b))


def test_filter_chain_end_to_end_byte_identity(monkeypatch):
    """Full encode with the fused device filter chain (forced on) must
    produce the same AVIF bytes as the host C++ chain."""
    from dataclasses import replace

    from cavif_tpu import Encoder

    rng = np.random.default_rng(3)
    grad = np.mgrid[0:192, 0:224][0].astype(np.float64) * 1.3
    img = np.clip(
        grad[..., None] + rng.normal(0, 25, (192, 224, 3)) + 80, 0, 255
    ).astype(np.uint8)
    enc = replace(Encoder.new().with_quality(70).with_speed(4),
                  device="off")
    monkeypatch.setenv("CAVIF_TPU_DEVICE_FILTERS", "0")
    a = enc.encode_rgb(img).avif_file
    monkeypatch.setenv("CAVIF_TPU_DEVICE_FILTERS", "1")
    b = enc.encode_rgb(img).avif_file
    assert a == b


def test_filter_chain_tune_ssim_byte_identity(monkeypatch):
    """Same identity under tune=ssim (the psy-LR mu>0 path exercises
    the Gram-based gamma rescale and variance-penalized selection)."""
    from dataclasses import replace

    from cavif_tpu import Encoder

    rng = np.random.default_rng(9)
    img = np.clip(
        rng.normal(128, 40, (160, 160, 3)), 0, 255
    ).astype(np.uint8)
    enc = replace(
        Encoder.new().with_quality(85).with_speed(4).with_tune("ssim"),
        device="off",
    )
    monkeypatch.setenv("CAVIF_TPU_DEVICE_FILTERS", "0")
    a = enc.encode_rgb(img).avif_file
    monkeypatch.setenv("CAVIF_TPU_DEVICE_FILTERS", "1")
    b = enc.encode_rgb(img).avif_file
    assert a == b

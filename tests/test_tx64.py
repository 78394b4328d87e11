"""TX_64X64: 64-point inverse transform + 64x64 NONE leaves.

The 64-point idct is implemented as the generic recursive stage network
(av1/itx.py _idct_generic, native iidct_generic); these tests pin

1. the generic network reproduces the explicit (dav1d-validated) 8/16/32
   butterflies exactly,
2. a residual-coded 64x64 NONE leaf produces a stream both libaom and
   dav1d accept with reconstruction BIT-EXACT to the encoder's (the
   rounding-placement proof for the new 64-lane path),
3. the slow low-quality presets (partition_range up to 64,
   av1encoder.rs:563-570) actually pick 64x64 NONE leaves on smooth
   content and the result decodes.

Reference parity: rav1e partition_range (4, 64) at speed 0-1 low_quality
(/root/reference/ravif/src/av1encoder.rs:563-570).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from cavif_tpu.av1 import itx
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.symbols import PARTITION_NONE


def test_idct_generic_matches_explicit():
    c = itx._cospi()
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        for _ in range(25):
            x = rng.normal(0.0, 300.0, n)
            s = [x[i] for i in itx._reorder(n)]
            a = np.asarray(itx._idct_1d(list(x), n))
            b = np.asarray(itx._idct_generic(s, n, c))
            assert np.allclose(a, b, atol=1e-9), (n, np.abs(a - b).max())


def test_idct64_basis_matches_ideal():
    m = itx.idct_basis(64)
    err = np.abs(m - itx._ideal_idct(64)).max()
    assert err < 5e-3, err


def _filterless(tweaks):
    # recon-vs-decoder comparisons need the output filters off (deblock/
    # CDEF/LR run on the decoder side after reconstruction)
    import dataclasses

    return dataclasses.replace(tweaks, cdef=False, lrf=False)


def _encode_64_leaf(img, q):
    cfg = AV1Config(
        width=64, height=64, bit_depth=10, quantizer=q,
        tweaks=_filterless(SpeedTweaks.from_preset(4, q)),
        chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
        ec_backend="python",
    )
    fe = FrameEncoder(img, cfg)
    fe._lf_hint = lambda: 0
    fe.max_leaf_mi = 16

    def fake_rdo(partials, origin, r0, r1, c0, c1):
        return (
            {(0, 0, 16): PARTITION_NONE},
            {(0, 0, 16, 16): (0, 0, 0, 0, 0.0, 0.0)},
        )

    fe._rdo_partition = fake_rdo
    orig_txb = fe._compute_txb

    def txb(ctx, pl, px, py, txw, txh, rr4, cc4, force_skip, mode,
            delta=0, **kw):
        return orig_txb(ctx, pl, px, py, txw, txh, rr4, cc4, False, mode,
                        delta, **kw)

    fe._compute_txb = txb
    return fe.encode(), fe


def test_tx64_residual_decodes_bit_exact():
    from aom_probe import probe

    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:64, 0:64]
    img = np.clip(
        400 + 30 * np.sin(x / 6.0) + 25 * np.cos(y / 5.0)
        + rng.integers(-40, 40, (64, 64)),
        0, 1023,
    ).astype(np.int32)
    tu, fe = _encode_64_leaf(img, 60)
    ok, err, res = probe(tu, want_pixels=True)
    assert ok, err
    w, h, bd, pixels = res
    assert (w, h, bd) == (64, 64, 10)
    dec = np.asarray(pixels[0], dtype=np.int32)
    recon = (
        fe._filtered_stack[0]
        if fe._filtered_stack is not None
        else fe.planes[0].recon
    )[:64, :64]
    assert np.array_equal(dec, recon), (
        "libaom recon mismatch",
        int(np.abs(dec - recon).max()),
        int((dec != recon).sum()),
    )
    # the leaf must actually have carried residuals (not an all-skip frame)
    assert not np.array_equal(recon, img) and np.abs(recon - img).mean() > 0.1
    try:
        from dav1d_probe import probe as dprobe
    except Exception:  # pragma: no cover
        return
    dok = dprobe(tu, want_pixels=True)
    if isinstance(dok, tuple) and dok[0] and len(dok) > 2 and dok[2]:
        ddec = np.asarray(dok[2][0], dtype=np.int32)
        if ddec.shape == recon.shape:
            assert np.array_equal(ddec, recon), "dav1d recon mismatch"


def test_tx64_native_python_byte_equality(monkeypatch):
    # the adaptive-CDF trellis + RD up-steps are native-pipeline-only
    # (r05): pin backend equality under the shared static pricing
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_ADAPT", "0")
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_UP", "0")
    # the native/python strength defaults split in r05 (0.9 adaptive
    # knee vs 1.2 static knee) — pin one value for the parity check
    monkeypatch.setenv("CAVIF_TPU_TRELLIS_CTX", "1.2")
    # gentle gradient + low-amplitude waves, 4:4:4: 64 leaves win AND carry
    # residuals in luma and chroma (the chroma path exercises the 32x32
    # sub-block txb_skip ctx offset 10 — a 64-block-only context); the
    # native (C++) and python pipelines must produce byte-identical
    # streams and both real decoders must accept them
    import sys as _sys

    from aom_probe import probe
    from dav1d_probe import probe as dprobe

    y, x = np.mgrid[0:128, 0:128]
    lum = np.clip(
        300 + x * 1.7 + y * 1.1 + 25 * np.sin(x / 23.0) * np.cos(y / 31.0),
        0, 1023,
    )
    img = np.stack(
        [lum, np.clip(lum + 40, 0, 1023), np.clip(lum - 60, 0, 1023)],
        axis=-1,
    ).astype(np.int32)
    q = 120
    outs = {}
    n64 = 0
    for backend in ("python", "native"):
        cfg = AV1Config(
            width=128, height=128, bit_depth=10, quantizer=q,
            tweaks=SpeedTweaks.from_preset(1, q), chroma_sampling="444",
            full_range=True, matrix_coefficients=6, threads=1,
            ec_backend=backend,
        )
        fe = FrameEncoder(img, cfg)
        outs[backend] = fe.encode()
        n64 = sum(
            1 for k, v in fe._last_part.items()
            if k[2] == 16 and v == PARTITION_NONE
        )
        ok, err, _ = probe(outs[backend])
        assert ok, (backend, err)
        dok, logs, _ = dprobe(outs[backend])
        assert dok, (backend, logs[-3:])
    assert outs["python"] == outs["native"]
    assert n64 >= 1, "expected 64px NONE leaves on this content"


def test_slow_preset_picks_64_leaves_on_smooth():
    # speed 1 + low quality (quantizer < 153) => partition_range (4, 64)
    from aom_probe import probe

    y, x = np.mgrid[0:128, 0:128]
    smooth = np.clip(300 + x * 2 + y, 0, 1023).astype(np.int32)
    q = 120  # quality ~80 -> low_quality per the inverted flags
    tweaks = SpeedTweaks.from_preset(1, q)
    assert tweaks.partition_range[1] == 64
    cfg = AV1Config(
        width=128, height=128, bit_depth=10, quantizer=q,
        tweaks=_filterless(tweaks), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
        ec_backend="python",
    )
    fe = FrameEncoder(smooth, cfg)
    fe._lf_hint = lambda: 0
    assert fe.max_leaf_mi == 16
    tu = fe.encode()
    ok, err, res = probe(tu, want_pixels=True)
    assert ok, err
    dec = np.asarray(res[3][0], dtype=np.int32)
    # the decoder output includes the loop filters; compare against the
    # encoder's decoder-exact filtered frame when one was signaled
    ref = (
        fe._filtered_stack[0]
        if fe._filtered_stack is not None
        else fe.planes[0].recon
    )
    assert np.array_equal(dec, ref[:128, :128])
    # at least one 64px NONE leaf chosen on this gradient
    part = getattr(fe, "_last_part", None)
    got64 = any(
        k[2] == 16 and v == PARTITION_NONE for k, v in (part or {}).items()
    )
    assert got64, part

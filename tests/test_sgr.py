"""Self-guided restoration: decoder exactness (dav1d), solver sanity,
end-to-end selection.

The filter/syntax constants (Sgr_Params s-values, x_by_xplus1, one_by_x,
sgrproj/switchable restore CDFs, Sgrproj_Xqd_Mid) are validated here by
bit-exact comparison of the predicted filter output against dav1d's
decode of our streams."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cavif_tpu.av1 import frame as frame_mod
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.sgr import apply_sgr, search_unit, solve_unit
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.ops.quality import quality_to_quantizer


def _encode_with_lr(units, w, h, ftype, backend, seed=1):
    """Encode a noisy mono plane with forced LR units (deblock/CDEF off;
    single 64-row LR stripe so apply_sgr is decoder-exact). Returns
    (bitstream, decoder-input recon)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    plane = np.clip(
        400 + 300 * np.sin(x / 17.0) * np.cos(y / 11.0)
        + rng.integers(-60, 61, (h, w)), 0, 1023
    ).astype(np.int32)
    q = quality_to_quantizer(70.0)
    cfg = AV1Config(
        width=w, height=h, bit_depth=10, quantizer=q,
        tweaks=SpeedTweaks.from_preset(2, q), chroma_sampling="400",
        full_range=True, matrix_coefficients=None, threads=1,
        ec_backend=backend,
    )
    fe = FrameEncoder(plane, cfg)
    fe._cdef_apply = lambda: ((), (), 3)

    def fake_solve():
        fe._lr_types = (ftype, 0, 0)
        fe._lr_units = {(0, *k): v for k, v in units.items()}
        return True

    fe._lr_solve = fake_solve
    orig = frame_mod.FrameParams.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        self.filter_level = (0, 0, 0, 0)

    frame_mod.FrameParams.__init__ = patched
    try:
        b = fe.encode()
    finally:
        frame_mod.FrameParams.__init__ = orig
    return b, fe._recon_full()[0][:h, :w].astype(np.int64)


def _dav1d_check(units, w=256, h=48, ftype=3, backend="python"):
    import dav1d_probe

    b, rec = _encode_with_lr(units, w, h, ftype, backend)
    ok, logs, desc = dav1d_probe.probe(b, want_pixels=True)
    assert ok, logs
    dec = desc[3][0].astype(np.int64)
    ucols = max((w + 128) // 256, 1)
    for (ur, uc), (use, taps, st, xqd) in units.items():
        x0 = uc * 256
        x1 = w if uc == ucols - 1 else (uc + 1) * 256
        if use == 2:
            pred = apply_sgr(
                rec.astype(np.int32), 0, h, x0, x1, st, xqd, 10
            )
            np.testing.assert_array_equal(dec[0:h, x0:x1], pred,
                                          err_msg=f"unit {ur},{uc}")
        elif use == 0:
            np.testing.assert_array_equal(dec[0:h, x0:x1], rec[0:h, x0:x1])
    return b


@pytest.mark.parametrize(
    "st,xqd",
    [(0, (10, 40)), (5, (-20, 60)), (10, (0, 20)), (14, (25, 95))],
)
def test_sgr_unit_dav1d_exact(st, xqd):
    """All four Sgr_Params families decode bit-exactly (dual-radius,
    r0-only, r1-only)."""
    _dav1d_check({(0, 0): (2, (0,) * 6, st, xqd)})


def test_sgr_ref_chaining_and_switchable_native():
    """Two-unit subexp reference chaining plus a wiener unit inside a
    RESTORE_SWITCHABLE frame, through the native C++ serializer."""
    units = {
        (0, 0): (1, (3, -5, 10, 1, -7, 20), 0, (0, 0)),
        (0, 1): (2, (0,) * 6, 6, (8, 44)),
    }
    b = _dav1d_check(units, w=384, ftype=1, backend=None)
    # libaom strict conformance too
    import aom_probe

    ok, logs = aom_probe.probe(b)[:2]
    assert ok, logs


def test_sgr_solver_denoises():
    rng = np.random.default_rng(5)
    h = w = 64
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    src = np.clip(400 + 300 * np.sin(x / 19.0) * np.cos(y / 23.0),
                  0, 1023).astype(np.int64)
    frame = np.clip(src + rng.integers(-25, 26, (h, w)),
                    0, 1023).astype(np.int32)
    base = float(((frame.astype(np.int64) - src) ** 2).sum())
    s, xqd, sse = search_unit(src, frame, 0, h, 0, w, 10, True)
    assert sse < 0.4 * base, (s, xqd, sse, base)
    # solve_unit's reported SSE must equal the exact apply
    x0q, x1q, sse2 = solve_unit(src, frame, 0, h, 0, w, s, 10)
    out = apply_sgr(frame, 0, h, 0, w, s, (x0q, x1q), 10)
    d = out.astype(np.int64) - src
    assert float((d * d).sum()) == sse2


def test_sgr_selected_end_to_end():
    """At speed 2 (sgr_complexity_full) on ringing-prone content, the LR
    search picks SGR naturally and the stream decodes in Pillow."""
    import io

    from PIL import Image

    from cavif_tpu import Encoder
    import cavif_tpu.av1.encoder as enc_mod

    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:256, 0:256].astype(np.float64)
    b = np.where((x // 48 + y // 48) % 2 < 1, 210.0, 60.0) + rng.normal(
        0, 8, x.shape
    )
    img = np.stack([np.clip(b, 0, 255)] * 3, -1).astype(np.uint8)

    seen = {}
    orig = enc_mod.FrameEncoder._lr_solve

    def spy(self):
        r = orig(self)
        if r:
            seen.setdefault("kinds", []).extend(
                v[0] for v in self._lr_units.values()
            )
        return r

    enc_mod.FrameEncoder._lr_solve = spy
    try:
        res = (
            Encoder.new().with_quality(70).with_speed(2).with_num_threads(1)
            .encode_rgb(img)
        )
    finally:
        enc_mod.FrameEncoder._lr_solve = orig
    assert 2 in seen.get("kinds", []), seen
    dec = Image.open(io.BytesIO(res.avif_file)).convert("RGB")
    p = np.asarray(dec).astype(np.float64)
    psnr = 10 * np.log10(255**2 / ((p - img) ** 2).mean())
    assert psnr > 28, psnr


def test_native_sgr_search_matches_numpy():
    """The threaded C++ SGR search (native.lr_sgr_plane) must agree with
    the numpy reference (sgr.search_unit) exactly: same selected set, same
    coded xqd, same exact-integer output SSE — both tiers."""
    from cavif_tpu.av1.opstream import _native_available

    if not _native_available():
        pytest.skip("native library unavailable")
    from cavif_tpu.native import lr_sgr_plane

    rng = np.random.default_rng(7)
    for h, w, depth in ((256, 256, 8), (300, 290, 10), (96, 160, 8)):
        maxv = (1 << depth) - 1
        y, x = np.mgrid[0:h, 0:w]
        src = np.clip(
            (np.sin(x / 19.0) * (maxv // 8) + maxv // 2 + y * 0.3), 0, maxv
        ).astype(np.int32)
        rec = np.clip(
            src + rng.normal(0, maxv / 100.0, size=(h, w)).astype(np.int32),
            0, maxv,
        ).astype(np.int32)
        unit = 256
        rows = max(1, (h + unit - 1) // unit)
        cols = max(1, (w + unit - 1) // unit)
        for full in (False, True):
            sets, xqd, sse = lr_sgr_plane(
                src, rec, h, w, unit, rows, cols, depth, full, 2
            )
            for ur in range(rows):
                y0 = ur * unit
                y1 = h if ur == rows - 1 else (ur + 1) * unit
                for uc in range(cols):
                    x0 = uc * unit
                    x1 = w if uc == cols - 1 else (uc + 1) * unit
                    ref = search_unit(src, rec, y0, y1, x0, x1, depth, full)
                    ui = ur * cols + uc
                    assert int(sets[ui]) == ref[0]
                    assert (int(xqd[ui, 0]), int(xqd[ui, 1])) == ref[1]
                    assert float(sse[ui]) == ref[2]

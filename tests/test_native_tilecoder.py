"""Differential test: the C++ tile serializer must be byte-identical to the
Python reference serializer (symbols.TileWriter via opstream.replay_python)
on the same op stream, across plane counts, bit depths, and quantizers."""

import numpy as np
import pytest

from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.opstream import OpTileWriter, replay_python
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.av1.symbols import TileParams


def _ops_for(w, h, cs, bd, q, seed=0):
    rng = np.random.default_rng(seed)
    maxv = (1 << bd) - 1
    nplanes = 1 if cs == "400" else 3
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 3 + y * 5) % (maxv + 1)).astype(np.int32)
    planes = np.stack(
        [
            np.clip(base + rng.integers(-40, 40, size=(h, w)), 0, maxv)
            for _ in range(nplanes)
        ],
        axis=-1,
    )
    if nplanes == 1:
        planes = planes[..., 0]
    cfg = AV1Config(
        width=w, height=h, bit_depth=bd, quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling=cs,
        full_range=True, matrix_coefficients=None if cs == "400" else 6,
    )
    fe = FrameEncoder(np.asarray(planes), cfg)
    tw = fe.tile_writer(0, fe.mi_rows, 0, fe.mi_cols)
    return tw.p, tw.pack()


@pytest.mark.parametrize(
    "w,h,cs,bd,q",
    [
        (64, 64, "400", 10, 121),
        (129, 101, "444", 10, 121),
        (96, 64, "444", 8, 60),
        (200, 120, "400", 8, 180),
        (40, 24, "444", 10, 20),
    ],
)
def test_native_matches_python(w, h, cs, bd, q):
    native = pytest.importorskip("cavif_tpu.native")
    tp, (ops, levels) = _ops_for(w, h, cs, bd, q)
    py = replay_python(tp, ops, levels)
    nat = native.encode_tile_native(tp, ops, levels)
    assert py == nat


def test_native_disable_cdf_update():
    native = pytest.importorskip("cavif_tpu.native")
    tp, (ops, levels) = _ops_for(72, 48, "444", 10, 100)
    tp.disable_cdf_update = True
    py = replay_python(tp, ops, levels)
    nat = native.encode_tile_native(tp, ops, levels)
    assert py == nat


def test_deferred_ec_byte_identity(monkeypatch):
    """Deferred entropy coding (block pipeline with EC off + one replay
    after the LR decision) must produce the same AVIF bytes as the
    in-pipe coder it replaced (CAVIF_TPU_DEFER_EC=0 escape hatch;
    ADVICE r04: pin the identity directly, not just via decode parity)."""
    pytest.importorskip("cavif_tpu.native")
    from cavif_tpu import Encoder

    rng = np.random.default_rng(7)
    grad = (np.mgrid[0:160, 0:144][0] * 3 % 256).astype(np.int32)
    img = np.clip(
        grad[..., None] + rng.integers(-60, 60, (160, 144, 3)), 0, 255
    ).astype(np.uint8)
    from dataclasses import replace
    enc = replace(Encoder.new().with_quality(80).with_speed(4), device="off")
    monkeypatch.setenv("CAVIF_TPU_DEFER_EC", "0")
    a = enc.encode_rgb(img).avif_file
    monkeypatch.setenv("CAVIF_TPU_DEFER_EC", "1")
    b = enc.encode_rgb(img).avif_file
    assert a == b


def test_itx_clamp_tripwire(monkeypatch):
    """inv_txfm_exact omits the spec 7.13.3 intermediate clamps (no-op on
    emitted streams); the CAVIF_TPU_ITX_CLAMP_CHECK tripwire must (a)
    count range escapes on adversarial inputs a clamp WOULD touch, and
    (b) stay zero across a real encode — so any future path driving
    intermediates out of range fails in CI instead of silently diverging
    from real decoders (ADVICE r04)."""
    native = pytest.importorskip("cavif_tpu.native")
    from dataclasses import replace

    from cavif_tpu import Encoder

    monkeypatch.setenv("CAVIF_TPU_ITX_CLAMP_CHECK", "1")
    native.itx_clamp_violations()  # reset counter + re-read env gate
    # adversarial: every coefficient at the dequant conformance bound —
    # the row pass must leave the (bd+8)-bit window
    big = np.full((32, 32), 30000, np.int32)
    native.inv_txfm_exact(big, 32, 32, 8000, 8000, 8)
    assert native.itx_clamp_violations(reset=False) > 0
    native.itx_clamp_violations()
    # a real encode keeps every intermediate in range
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (96, 96, 3)).astype(np.uint8)
    enc = replace(Encoder.new().with_quality(55).with_speed(4),
                  device="off")
    enc.encode_rgb(img)
    assert native.itx_clamp_violations(reset=False) == 0
    monkeypatch.delenv("CAVIF_TPU_ITX_CLAMP_CHECK")
    native.itx_clamp_violations()  # restore the off gate for later tests

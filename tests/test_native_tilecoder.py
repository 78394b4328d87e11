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

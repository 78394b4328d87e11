"""Device (whole-plane JAX) vs host (numpy group) mode-search agreement."""

import numpy as np

from cavif_tpu.av1 import tables
from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.ops.block_search import CAND_MODES
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.ops.block_search import plane_mode_search


def test_plane_search_matches_host():
    rng = np.random.default_rng(9)
    h = w = 128
    y, x = np.mgrid[0:h, 0:w]
    plane = np.clip(
        ((x * 3 + y * 2) % 1024) + rng.integers(-60, 60, (h, w)), 0, 1023
    ).astype(np.int32)
    q = 121
    cfg = AV1Config(
        width=w, height=h, bit_depth=10, quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q), chroma_sampling="400",
        full_range=True, matrix_coefficients=None,
    )
    fe = FrameEncoder(plane, cfg)
    blocks = [
        (r, c, 8, 8) for r in range(0, fe.mi_rows, 8)
        for c in range(0, fe.mi_cols, 8)
    ]
    host_modes = fe._batch_search(blocks, (0, 0))

    dev = plane_mode_search(
        plane[None], fe.dc_q, fe.ac_q, fe._lambda(), 10
    )  # (1, 4, 4)

    agree = total = 0
    for (r, c, _w4, _h4), (ym, *_rest) in host_modes.items():
        by, bx = r // 8, c // 8
        total += 1
        if CAND_MODES[int(dev[0, by, bx])] == ym:
            agree += 1
    # same candidate set and cost formulas; the host adds SAD pruning and
    # availability approximations, so require strong (not exact) agreement
    assert total == 16 and agree >= 11, (agree, total)

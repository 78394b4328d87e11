"""Device pass-2 reconstruction wavefront vs the host sequential walk.

A real FrameEncoder encode (host python backend) with a forced uniform
16px NONE partition provides the skeleton decisions and coded levels;
the device wavefront (ops/device_pass2.py) must reproduce the host's
reconstruction plane bit-for-bit — the sequential predict/inverse/update
chain of pass 2 executed as one jitted device program."""

import dataclasses

import numpy as np

from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import FrameEncoder
from cavif_tpu.av1.opstream import OpTileWriter
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.av1.symbols import PARTITION_NONE
from cavif_tpu.ops.device_pass2 import (
    recon_wavefront_scan,
    recon_wavefront_uniform,
)


def test_wavefront_recon_matches_host():
    rng = np.random.default_rng(9)
    H = W = 128
    y, x = np.mgrid[0:H, 0:W]
    img = np.clip(
        400 + 40 * np.sin(x / 17.0) + 30 * np.cos(y / 23.0)
        + 3 * x - 2 * y + rng.integers(-60, 60, (H, W)),
        0, 1023,
    ).astype(np.int32)
    q = 100
    tw = dataclasses.replace(
        SpeedTweaks.from_preset(4, q), cdef=False, lrf=False
    )
    cfg = AV1Config(
        width=W, height=H, bit_depth=10, quantizer=q, tweaks=tw,
        chroma_sampling="400", full_range=True, matrix_coefficients=None,
        threads=1, ec_backend="python",
    )
    fe = FrameEncoder(img, cfg)
    fe._lf_hint = lambda: 0

    nby, nbx = H // 16, W // 16

    def fake_rdo(partials, origin, r0, r1, c0, c1):
        blocks = [(by * 4, bx * 4, 4, 4) for by in range(nby)
                  for bx in range(nbx)]
        modes = fe._batch_search(blocks, origin)
        part = {(b[0], b[1], 4): PARTITION_NONE for b in blocks}
        return part, modes

    fe._rdo_partition = fake_rdo

    # capture the walk's final per-block decisions + coded levels
    cap = {}
    orig_wc = OpTileWriter.write_coeffs
    orig_wb = OpTileWriter.write_block

    def wc(self, pl, r4, c4, txw, txh, levels, **kw):
        cap[(r4 // 4, c4 // 4)] = dict(
            levels=np.array(levels), va=kw.get("v_adst", 0),
            ha=kw.get("h_adst", 0),
        )
        return orig_wc(self, pl, r4, c4, txw, txh, levels, **kw)

    blk = {}

    def wb(self, rr, cc, w4, h4, y_mode, uv_mode, skip, cfl_allowed, **kw):
        blk[(rr // 4, cc // 4)] = (y_mode, kw.get("y_delta", 0))
        return orig_wb(self, rr, cc, w4, h4, y_mode, uv_mode, skip,
                       cfl_allowed, **kw)

    OpTileWriter.write_coeffs = wc
    OpTileWriter.write_block = wb
    try:
        fe.encode()
    finally:
        OpTileWriter.write_coeffs = orig_wc
        OpTileWriter.write_block = orig_wb

    levels = np.zeros((nby, nbx, 16, 16), np.int32)
    modes = np.zeros((nby, nbx), np.int32)
    deltas = np.zeros((nby, nbx), np.int32)
    va = np.zeros((nby, nbx), np.int8)
    ha = np.zeros((nby, nbx), np.int8)
    for (by, bx), (m, d) in blk.items():
        modes[by, bx] = m
        deltas[by, bx] = d
    for (by, bx), rec in cap.items():
        levels[by, bx] = rec["levels"]
        va[by, bx] = rec["va"]
        ha[by, bx] = rec["ha"]

    got = recon_wavefront_uniform(
        levels, modes, deltas, va, ha, H, W, fe.dc_q, fe.ac_q, 10, 16
    )
    ref = fe.planes[0].recon[:H, :W]
    assert np.array_equal(got, ref), (
        int(np.abs(got - ref).max()), int((got != ref).sum()),
    )
    # the scan-form executor (the scalable one) must agree bit-for-bit
    got2 = recon_wavefront_scan(
        levels, modes, deltas, va, ha, H, W, fe.dc_q, fe.ac_q, 10, 16
    )
    assert np.array_equal(got2, ref), (
        int(np.abs(got2 - ref).max()), int((got2 != ref).sum()),
    )


def test_wavefront_frame_executor_matches_per_plane():
    """The multi-stream frame executor (all planes + all tiles in one
    lax.scan) must be bit-identical to the per-plane scan executor: with
    a (1,1) tile grid directly, and with a (2,2) grid each tile must
    equal an independent per-tile run (tiles are prediction-independent;
    neighbor extensions clamp at the tile edge like the host pass-2)."""
    from cavif_tpu.ops.device_pass2 import (
        recon_wavefront_scan,
        recon_wavefront_scan_frame,
    )

    rng = np.random.default_rng(1)
    H = W = 128
    n = 16
    nby = nbx = H // n
    P = 3
    levels = rng.integers(-4, 5, (P, nby, nbx, n, n)).astype(np.int32)
    modes = rng.integers(0, 13, (P, nby, nbx)).astype(np.int32)
    deltas = np.zeros((P, nby, nbx), np.int32)
    va = rng.integers(0, 2, (P, nby, nbx)).astype(np.int8)
    ha = rng.integers(0, 2, (P, nby, nbx)).astype(np.int8)
    dq, aq = 499, 616
    ref = np.stack([
        recon_wavefront_scan(levels[p], modes[p], deltas[p], va[p], ha[p],
                             H, W, dq, aq, 10, n)
        for p in range(P)
    ])
    got = recon_wavefront_scan_frame(
        levels, modes, deltas, va, ha, H, W, dq, aq, 10, n, tile_grid=(1, 1)
    )
    assert np.array_equal(got, ref)
    got2 = recon_wavefront_scan_frame(
        levels, modes, deltas, va, ha, H, W, dq, aq, 10, n, tile_grid=(2, 2)
    )
    for p in range(P):
        for ty in range(2):
            for tx in range(2):
                b0, b1 = ty * nby // 2, (ty + 1) * nby // 2
                c0, c1 = tx * nbx // 2, (tx + 1) * nbx // 2
                sub = recon_wavefront_scan(
                    levels[p, b0:b1, c0:c1], modes[p, b0:b1, c0:c1],
                    deltas[p, b0:b1, c0:c1], va[p, b0:b1, c0:c1],
                    ha[p, b0:b1, c0:c1], (b1 - b0) * n, (c1 - c0) * n,
                    dq, aq, 10, n,
                )
                assert np.array_equal(
                    got2[p, b0 * n:b1 * n, c0 * n:c1 * n], sub
                ), (p, ty, tx)

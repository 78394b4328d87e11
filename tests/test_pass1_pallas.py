"""Fused pallas directional-cost kernel for the device pass-1 program
(ops/device_pass1._fused_dir_cost).

The kernel computes the same math as the XLA coefficient-domain path —
bf16-rounded matmul inputs, a |coef|-domain quant chain that is bit-
identical to the sign-split form, and an exact-f32 segment reduce — so
the only divergence is reduction order, which may flip argmins on
near-tie blocks (~1e-5 observed at 1 MP). The program-level A/B pins
that bound on the real chip; the hermetic tests pin the gate (pallas
must never engage on the CPU backend — it has no TPU Mosaic there) and
the bench flops accounting helper.
"""

import os

import numpy as np
import pytest


def test_gate_off_on_cpu():
    """The hermetic suite runs on the (8-device) CPU backend: the pallas
    gate must be closed there or every device-path test would die in
    Mosaic lowering."""
    if os.environ.get("CAVIF_TPU_TEST_DEVICE"):
        pytest.skip("device run: gate is open by design")
    from cavif_tpu.ops.device_pass1 import _pass1_pallas_enabled

    assert _pass1_pallas_enabled() is False


def test_gate_env_override(monkeypatch):
    monkeypatch.setenv("CAVIF_TPU_PASS1_PALLAS", "0")
    from cavif_tpu.ops.device_pass1 import _pass1_pallas_enabled

    assert _pass1_pallas_enabled() is False


def test_gate_px_cap():
    """The remote TPU compiler crashes building the pallas program past
    ~26 MP (measured cliff between 25.6 and 33.4 MP); the gate must
    proactively fall back to the XLA formulation above the cap so an 8K
    encode never pays a failed compile (it silently degraded to the
    HOST cascade — 32 s vs 4.5 s — before the cap existed)."""
    from cavif_tpu.ops.device_pass1 import (
        _PALLAS_PX_CAP, _pass1_pallas_enabled)

    assert _pass1_pallas_enabled(px=_PALLAS_PX_CAP + 1) is False
    # 8K RGB (the BASELINE config) is above the cap
    assert 4352 * 7680 > _PALLAS_PX_CAP


def test_pallas_flops_accounting():
    """bench.py adds pallas_flops(key) to XLA's cost analysis; the helper
    must count only pallas-gated keys and scale with the frame area."""
    from cavif_tpu.ops.device_pass1 import pallas_flops

    base = (1024, 1024, 8, "ycbcr", 3, 8, 32, True, 15.0, 2.0, 4.0)
    on = pallas_flops(base + (True,))
    off = pallas_flops(base + (False,))
    assert off == 0.0
    # 1 MP, 10 sub-64 tiers, full delta fan: ~0.19 Tflop of directional
    # matmul (measured missing-from-cost-analysis delta: 0.217 T)
    assert 0.1e12 < on < 0.4e12
    half = pallas_flops((512, 1024, 8, "ycbcr", 3, 8, 32, True,
                         15.0, 2.0, 4.0, True))
    assert abs(on / half - 2.0) < 0.05
    batch = pallas_flops((4, 512, 512, 8, "mono", 8, 32, True,
                          15.0, 2.0, 4.0, True))
    assert batch > 0.0


def test_program_decisions_match_xla():
    """Chip A/B: the full pass-1 program with the pallas kernels must
    reproduce the XLA path's packed decisions except for near-tie
    argmin flips (bounded well under 0.1%)."""
    if not os.environ.get("CAVIF_TPU_TEST_DEVICE"):
        pytest.skip("chip-scoped: run via tools/run_device_tests.sh")
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend")
    from cavif_tpu.ops import device_pass1 as dp

    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:256, 0:256].astype(np.float64)
    img = np.clip(
        128 + 90 * np.sin(x / 13.0) * np.cos(y / 29.0)
        + rng.normal(0, 18, (256, 256)),
        0, 255,
    )
    img = np.stack([img, img * 0.9 + 10, img * 1.1 - 10], -1)
    img = np.clip(img, 0, 255).astype(np.uint8)
    kw = dict(depth=8, model="ycbcr", num_planes=3, tile_px=(256, 256),
              min_px=8, max_px=32, use_deltas=True, dc_q=20, ac_q=25,
              lam=210.0)
    outs = {}
    for flag in ("0", "1"):
        os.environ["CAVIF_TPU_PASS1_PALLAS"] = flag
        try:
            outs[flag] = dp.run_pass1(src=img, **kw)
        finally:
            os.environ.pop("CAVIF_TPU_PASS1_PALLAS", None)
    tot = diff = 0
    for k in outs["0"]:
        a, b = outs["0"][k], outs["1"][k]
        assert a.shape == b.shape
        tot += a.size
        diff += int((a != b).sum())
    assert diff / tot < 1e-3, (diff, tot)

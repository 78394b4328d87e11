"""Attachment probe: the recorded latency measurement that gates the
device pass-2 executor and the fused device filter chain
(VERDICT r04 next-9: the engage/skip decision is a probe, not a
documented one-off)."""

import numpy as np
import pytest

from cavif_tpu.ops import attachment


@pytest.fixture(autouse=True)
def _restore():
    old = attachment._PROBE
    yield
    attachment.set_probe(old)


def test_probe_measures_and_caches():
    attachment.set_probe(None)
    p = attachment.probe()
    assert p["rtt_ms"] >= 0 and "backend" in p
    assert attachment.probe() is p  # cached


@pytest.mark.parametrize("rtt,backend,p2,filt", [
    (0.1, "tpu", True, True),     # direct-attached part
    (1.5, "tpu", False, True),    # fast-ish attachment: filters only
    (25.0, "tpu", False, False),  # tunnel: neither
    (0.1, "cpu", False, False),   # no accelerator: neither
])
def test_engage_decisions(rtt, backend, p2, filt):
    attachment.set_probe({"rtt_ms": rtt, "backend": backend})
    assert attachment.engage_device_pass2() == p2
    assert attachment.engage_device_filters() == filt


def test_device_filters_auto_gate(monkeypatch):
    from cavif_tpu.ops.device_filters import device_filters_enabled

    class FE:
        _device_search = "xla"

    monkeypatch.delenv("CAVIF_TPU_DEVICE_FILTERS", raising=False)
    attachment.set_probe({"rtt_ms": 25.0, "backend": "tpu"})
    assert not device_filters_enabled(FE())
    attachment.set_probe({"rtt_ms": 0.2, "backend": "tpu"})
    assert device_filters_enabled(FE())
    FE._device_search = None
    assert not device_filters_enabled(FE())
    # env force wins both ways
    monkeypatch.setenv("CAVIF_TPU_DEVICE_FILTERS", "1")
    assert device_filters_enabled(FE())
    monkeypatch.setenv("CAVIF_TPU_DEVICE_FILTERS", "0")
    FE._device_search = "xla"
    attachment.set_probe({"rtt_ms": 0.2, "backend": "tpu"})
    assert not device_filters_enabled(FE())

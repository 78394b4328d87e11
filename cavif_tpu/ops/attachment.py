"""Attachment capability probe: measured round-trip latency of the
device attachment, recorded once per process.

Several device subsystems are profitable only below an attachment-
latency threshold: the pass-2 wavefront executor's per-scan-step fixed
cost is the attachment's dispatch overhead (ops/device_pass2.py — host
C++ wins through a tunnel, the device wins direct-attached), and the
fused in-loop filter chain (ops/device_filters.py) adds ~0.4 s of
tunnel-bound wall per frame that a direct-attached part absorbs in
milliseconds. Instead of a documented one-off measurement, the decision
is a RECORDED probe: one trivial jitted round trip timed at first use,
cached for the process, surfaced in bench.py's detail block, and
overridable for tests (VERDICT r04 next-9).
"""

from __future__ import annotations

import time

_PROBE = None


def probe(force: bool = False) -> dict:
    """Measure (once) the attachment's small-op round-trip latency.
    Returns {"rtt_ms": median of 3, "backend": jax backend name}."""
    global _PROBE
    if _PROBE is not None and not force:
        return _PROBE
    import jax

    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = np.zeros(8, np.int32)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    _PROBE = {
        "rtt_ms": round(sorted(ts)[1] * 1e3, 3),
        "backend": jax.default_backend(),
    }
    return _PROBE


def set_probe(value) -> None:
    """Test/deployment override (None re-arms the measurement)."""
    global _PROBE
    _PROBE = value


def direct_attached(threshold_ms: float = 3.0) -> bool:
    """True when the accelerator behaves like a direct attachment:
    a real (non-CPU) backend whose small-op round trip is below
    `threshold_ms`. The tunnel this build developed against measures
    ~25 ms; a PCIe/ICI attachment measures well under 1 ms."""
    p = probe()
    return p["backend"] != "cpu" and p["rtt_ms"] < threshold_ms


def engage_device_pass2() -> bool:
    """Auto-engage decision for the device pass-2 wavefront executor:
    its serial scan pays ~1 attachment dispatch per wavefront level
    (ops/device_pass2.py: 0.54 ms/level floor through the tunnel vs
    ~130 ms/plane for the host C++), so it only wins when the per-step
    cost is hardware loop overhead — i.e. a sub-millisecond
    attachment."""
    return direct_attached(threshold_ms=0.5)


def engage_device_filters() -> bool:
    """Auto-engage decision for the fused device filter chain: two
    round trips plus ~0.1-0.4 s of device-side stencil work per frame.
    Through the tunnel the chain starves the chip that pass-1 needs
    (measured 24-image batch: 2.3 vs 6.2 MP/s); direct-attached the
    same programs cost single-digit milliseconds and free ~65 ms of
    host CPU per MP."""
    return direct_attached(threshold_ms=3.0)

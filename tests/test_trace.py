"""CAVIF_TPU_TRACE per-stage breakdown (aux observability subsystem)."""

import os
import subprocess
import sys


def test_trace_report():
    code = """
import sys
sys.path.insert(0, %r)
import numpy as np
from cavif_tpu import Encoder
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
Encoder.new().with_quality(70).with_speed(6).encode_rgb(img)
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True,
        env={**os.environ, "CAVIF_TPU_TRACE": "1"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "[cavif-tpu trace] rgb 128x128" in out.stderr
    assert "tiles_pass1+2" in out.stderr

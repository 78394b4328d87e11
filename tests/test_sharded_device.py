"""Chip-scoped smoke for the sharded whole-batch path (VERDICT r03 next-5).

encode_batch_sharded's mixed-shape + alpha handling is pinned hermetically
by tests/test_multihost.py; this file drives the SAME path against the real
accelerator so the per-round chip artifact (TESTS_TPU_r<N>.txt, written by
tools/run_device_tests.sh) covers the batched device programs — including
the mono (Cs400) alpha-stream program — and not just the per-image path.
"""

import io
import os

import numpy as np
import pytest

from PIL import Image


def test_sharded_batch_mixed_alpha_on_device():
    if not os.environ.get("CAVIF_TPU_TEST_DEVICE"):
        pytest.skip("chip-scoped: run via tools/run_device_tests.sh")

    from cavif_tpu import Encoder
    from cavif_tpu.container.parse import read_avif
    from cavif_tpu.parallel.batch import encode_batch_sharded

    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 256, (128, 192, 3), np.uint8),
        rng.integers(0, 256, (96, 128, 3), np.uint8),
    ]
    rgba = rng.integers(0, 256, (128, 192, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[30:90, 40:150, 3] = rng.integers(0, 255, (60, 110), np.uint8)
    imgs.append(rgba)

    enc = Encoder.new().with_quality(70).with_speed(4)
    out = encode_batch_sharded(imgs, enc)
    assert len(out) == 3
    for data, img in zip(out, imgs):
        assert data[4:12] == b"ftypavif", data[:16]
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert dec.shape[:2] == img.shape[:2]
    assert read_avif(out[2]).alpha_item, "alpha stream missing"
    assert read_avif(out[1]).width == 128


def test_sharded_device_determinism(monkeypatch):
    """Two sharded runs on the REAL chip must produce byte-identical
    AVIFs (stealing disabled: the host-steal path is timing-dependent
    by design) — the device-path determinism leg the multi-host
    scale-out claim rests on (VERDICT r04 next-8; a true 2-process chip
    run is not possible against one tunnel-attached part, so the
    determinism pin runs in-process and test_multihost pins the
    2-process mesh equality on the CPU collective backend)."""
    if not os.environ.get("CAVIF_TPU_TEST_DEVICE"):
        pytest.skip("chip-scoped: run via tools/run_device_tests.sh")

    from cavif_tpu import Encoder
    from cavif_tpu.parallel.batch import encode_batch_sharded

    monkeypatch.setenv("CAVIF_TPU_SHARDED_STEAL", "0")
    rng = np.random.default_rng(17)
    imgs = [
        rng.integers(0, 256, (128, 192, 3), np.uint8)
        for _ in range(6)
    ]
    rgba = rng.integers(0, 256, (96, 128, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[20:60, 30:100, 3] = rng.integers(0, 255, (40, 70), np.uint8)
    imgs.append(rgba)
    enc = Encoder.new().with_quality(75).with_speed(4)
    a = encode_batch_sharded(imgs, enc)
    b = encode_batch_sharded(imgs, enc)
    assert all(x == y for x, y in zip(a, b)), "sharded run not deterministic"

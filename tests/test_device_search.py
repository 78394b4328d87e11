"""Device (XLA whole-plane) pass-1 inside the real encoder.

CAVIF_TPU_DEVICE_SEARCH routes the always-searched partition tiers
through ops/block_search as one device program per tile; cascade tiers,
rect halves, and edge slivers stay on the host path and the results
merge. Quality must match the host path closely (same candidate set and
cost model; the device path searches all 13 modes without the SAD
prefilter and skips angle-delta refinement)."""

import io
import os

import numpy as np
from PIL import Image


def _encode(img, env):
    import subprocess
    import sys

    # separate process: the env toggle is read at FrameEncoder init and
    # jax platform must be CPU for the test runner
    code = """
import os, sys, io
import numpy as np
sys.path.insert(0, %r)
from PIL import Image
from cavif_tpu import Encoder
img = np.load(sys.argv[1])["img"]
res = Encoder.new().with_quality(70).with_speed(4).with_num_threads(1).encode_rgb(img)
sys.stdout.buffer.write(res.avif_file)
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, img=img)
        out = subprocess.run(
            [sys.executable, "-c", code, f.name],
            capture_output=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
                 "CAVIF_TPU_DEVICE_SEARCH_MARK": "1", **env},
        )
    assert out.returncode == 0, out.stderr[-800:]
    # the engagement marker proves the env toggle actually routed pass 1
    # through the device path (a dead dispatch once made this test vacuous)
    engaged = b"[device-search]" in out.stderr
    assert engaged == bool(env.get("CAVIF_TPU_DEVICE_SEARCH")), out.stderr[-800:]
    return out.stdout


def test_device_search_matches_host_quality():
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:256, 0:256].astype(np.float64)
    lum = np.clip(
        120 + 70 * np.sin(x / 53.0) * np.cos(y / 37.0)
        + rng.normal(0, 6, x.shape), 0, 255
    )
    img = np.dstack(
        [lum, np.clip(lum + 15, 0, 255), np.clip(lum - 20, 0, 255)]
    ).astype(np.uint8)

    host = _encode(img, {"CAVIF_TPU_DEVICE_SEARCH": ""})
    dev = _encode(img, {"CAVIF_TPU_DEVICE_SEARCH": "xla"})

    def psnr(b):
        d = np.asarray(
            Image.open(io.BytesIO(b)).convert("RGB")
        ).astype(np.float64)
        return 10 * np.log10(255**2 / ((d - img) ** 2).mean())

    ph, pd = psnr(host), psnr(dev)
    assert pd > ph - 0.1, (ph, pd)
    assert len(dev) < len(host) * 1.05, (len(host), len(dev))


def test_device_64_tier_matches_host_quality():
    """The 64px tier (TX_64X64 NONE leaves, partition_range (4, 64) at
    speed 0-1 low quality) runs in the device program since round 3: the
    device stream must decode and land within a tight RD envelope of the
    host cascade. Chip-scoped: the 64-tier program's XLA CPU compile takes
    tens of minutes, so this runs only on the real accelerator
    (tools/run_device_tests.sh)."""
    import pytest

    if not os.environ.get("CAVIF_TPU_TEST_DEVICE"):
        pytest.skip("needs the real accelerator (CPU compile is ~30 min)")

    import subprocess
    import sys
    import tempfile

    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:256, 0:256].astype(np.float64)
    lum = np.clip(
        120 + 70 * np.sin(x / 53.0) * np.cos(y / 37.0)
        + rng.normal(0, 6, x.shape), 0, 255
    )
    img = np.dstack(
        [lum, np.clip(lum + 15, 0, 255), np.clip(lum - 20, 0, 255)]
    ).astype(np.uint8)

    code = """
import os, sys, io
import numpy as np
sys.path.insert(0, %r)
from cavif_tpu import Encoder
img = np.load(sys.argv[1])["img"]
res = Encoder.new().with_quality(80).with_speed(1).with_num_threads(1).encode_rgb(img)
sys.stdout.buffer.write(res.avif_file)
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(dev):
        with tempfile.NamedTemporaryFile(suffix=".npz") as f:
            np.savez(f.name, img=img)
            out = subprocess.run(
                [sys.executable, "-c", code, f.name],
                capture_output=True,
                env={**os.environ, "CAVIF_TPU_DEVICE_SEARCH": dev},
            )
        assert out.returncode == 0, out.stderr[-800:]
        return out.stdout

    host = run("off")
    dev = run("xla")

    def quality(data):
        dec = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB")
        ).astype(np.float64)
        err = ((dec - img.astype(np.float64)) ** 2).mean()
        return 10 * np.log10(255**2 / max(err, 1e-9))

    assert quality(dev) >= quality(host) - 0.05
    assert len(dev) <= int(len(host) * 1.03)

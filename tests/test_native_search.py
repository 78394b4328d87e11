"""Native (C++) batched mode search vs the numpy reference search.

The C++ bs_search in native/tilecoder.cpp reimplements the pass-1 search of
av1/encoder.py _batch_search (SAD prefilter keeping DC, transform-domain RD
on the top-K, angle-delta refinement). Decisions need not be bit-identical
(f32 vs f64 transforms), but on real content they should agree almost
everywhere — and the resulting encodes must be equivalent in rate and
quality.
"""

import io
import os

import numpy as np
import pytest

from cavif_tpu import Encoder
from cavif_tpu.av1.opstream import _native_available

pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native library unavailable"
)


def _image(n=256, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    lum = np.clip(
        128
        + 70 * np.sin(x / 41.0) * np.cos(y / 29.0)
        + 50 * ((x + y) // 64 % 2)
        + rng.normal(0, 4, (n, n)),
        0,
        255,
    )
    return np.stack(
        [lum, np.clip(lum + 12, 0, 255), np.clip(lum - 9, 0, 255)], -1
    ).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / mse)


def test_native_search_matches_python_reference(monkeypatch):
    img = _image()
    enc = Encoder.new().with_quality(80).with_speed(4)
    out_native = enc.encode_rgb(img).avif_file
    monkeypatch.setenv("CAVIF_TPU_PY_SEARCH", "1")
    out_py = enc.encode_rgb(img).avif_file

    from PIL import Image

    px_n = np.asarray(Image.open(io.BytesIO(out_native)).convert("RGB"))
    px_p = np.asarray(Image.open(io.BytesIO(out_py)).convert("RGB"))
    p_n, p_p = _psnr(px_n, img), _psnr(px_p, img)
    # same algorithm either side (f32 vs f64 ties can cascade through the
    # partition DP): rate within 4%, quality within 0.2 dB
    assert abs(len(out_native) - len(out_py)) <= 0.04 * len(out_py), (
        len(out_native),
        len(out_py),
    )
    assert abs(p_n - p_p) < 0.2, (p_n, p_p)


def test_mode_search_direct_agreement():
    """Drive bs_search and the numpy stages on the same gathered arrays."""
    from cavif_tpu import native
    from cavif_tpu.av1 import transforms

    rng = np.random.default_rng(3)
    B, bw, bh = 64, 16, 16
    base = rng.integers(200, 800, size=(B, 1, 1))
    grad = np.arange(bw)[None, None, :] * rng.integers(-8, 9, size=(B, 1, 1))
    src = np.clip(base + grad + rng.integers(-20, 21, (B, bh, bw)), 0, 1023)
    ext = bw + bh
    above_ext = np.clip(
        src[:, 0, :1] + rng.integers(-30, 31, (B, ext)), 0, 1023
    )
    left_ext = np.clip(src[:, :1, 0] + rng.integers(-30, 31, (B, ext)), 0, 1023)
    al = ((above_ext[:, 0] + left_ext[:, 0]) // 2).astype(np.int32)
    have = np.ones(B, dtype=np.uint8)

    dc_q, ac_q, bd, lam = 676, 523, 10, 120.0
    gain = float(transforms.get_gain(bw, bh))
    m, d, c = native.mode_search(
        src.astype(np.int32), above_ext.astype(np.int32),
        left_ext.astype(np.int32), al, have, have,
        dc_q, ac_q, bd, lam, gain, K=4, refine=True, force_skip=False,
        n_threads=2,
    )
    assert m.shape == (B,) and ((m >= 0) & (m < 13)).all()
    assert ((d >= -3) & (d <= 3)).all()
    assert (c >= 0).all() and np.isfinite(c).all()
    # threading must not change results
    m1, d1, c1 = native.mode_search(
        src.astype(np.int32), above_ext.astype(np.int32),
        left_ext.astype(np.int32), al, have, have,
        dc_q, ac_q, bd, lam, gain, K=4, refine=True, force_skip=False,
        n_threads=1,
    )
    assert (m == m1).all() and (d == d1).all()
    assert np.allclose(c, c1)


def test_joint_uv_search_beats_proxy_on_divergent_chroma():
    """Joint U+V chroma mode selection: when U and V pull in different
    directions, the joint search must pick the mode minimizing the summed
    RD, where the U-only proxy picks U's favorite. Construct planes where
    U prefers V_PRED (vertical gradient continuation) and V prefers
    H_PRED, and check the joint choice flips relative to the proxy."""
    import numpy as np

    from cavif_tpu import native

    n = 32
    Hp = Wp = 3 * n
    # U: strong vertical edges (V_PRED is near-perfect, H_PRED bad)
    rng = np.random.default_rng(11)
    col = np.arange(Wp, dtype=np.int32) * 7 % 256
    U = np.broadcast_to(col, (Hp, Wp)).copy()
    U = np.clip(U + rng.integers(-2, 3, U.shape), 0, 255).astype(np.int32)
    # V: strong horizontal stripes (H_PRED near-perfect), higher energy so
    # the joint decision is dominated by V
    row = (np.arange(Hp, dtype=np.int32) * 23) % 256
    V = np.broadcast_to(row[:, None], (Hp, Wp)).copy()
    V = np.clip(V + rng.integers(-2, 3, V.shape), 0, 255).astype(np.int32)
    Y = np.zeros((Hp, Wp), np.int32)
    planes = np.stack([Y, U, V]).astype(np.int32)
    items = np.asarray([[1, n, n]], np.int32)  # interior block of plane 1
    args = dict(bw=n, bh=n, origin_px=(0, 0), dc_q=500, ac_q=600,
                bit_depth=8, lam=30.0, gain=1.0, K=5, refine=False,
                force_skip=False, n_threads=1)
    m_proxy, _, c_proxy = native.mode_search_planes(
        planes, items, joint_uv=False, **args
    )
    m_joint, _, c_joint = native.mode_search_planes(
        planes, items, joint_uv=True, **args
    )
    CAND = [0, 1, 2, 9, 10, 11, 12, 3, 4, 5, 6, 7, 8]
    assert CAND[int(m_proxy[0])] == 1  # V_PRED wins on U alone
    # jointly, U's favorite loses to a mode serving V's horizontal
    # structure too (H_PRED or PAETH, which adapts per pixel)
    assert CAND[int(m_joint[0])] in (2, 12)
    # the joint cost is U+V: it must exceed the U-only cost
    assert c_joint[0] > c_proxy[0]


def test_native_cascade_matches_python_bytes():
    """The whole-tile native pass-1 (bs_partition_tile: tier cascade +
    chroma spread + rect halves + partition DP) must make decisions
    identical to the python orchestration over the same native searches —
    pinned as byte-equality of full encodes across speeds, alpha, and
    odd (partial-block) dimensions."""
    import os
    import subprocess
    import sys

    import numpy as np

    code = """
import numpy as np, sys, os
sys.path.insert(0, %r)
from cavif_tpu import Encoder
rng = np.random.default_rng(5)
y, x = np.mgrid[0:211, 0:333].astype(np.float64)
lum = np.clip(120 + 70*np.sin(x/53.0)*np.cos(y/37.0) + rng.normal(0,8,x.shape), 0, 255)
img = np.dstack([lum, np.clip(lum+15,0,255), np.clip(lum-20,0,255)]).astype(np.uint8)
alpha = np.full(img.shape[:2], 255, np.uint8); alpha[30:90, 40:200] = rng.integers(0,255,(60,160)).astype(np.uint8)
rgba = np.dstack([img, alpha])
for s in (1, 4, 10):
    e = Encoder.new().with_quality(70).with_speed(s).with_num_threads(1)
    sys.stdout.write("%%d:%%d:%%d\\n" %% (s, len(e.encode_rgb(img).avif_file), len(e.encode_rgba(rgba).avif_file)))
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(env):
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            # flat quantizer: the python cascade is the flat-q reference
            # (per-SB adaptive q is native-cascade-only)
            env={**os.environ, "CAVIF_TPU_TUNE": "psnr", **env},
        )
        assert out.returncode == 0, out.stderr[-800:]
        return out.stdout

    assert run({}) == run({"CAVIF_TPU_PY_CASCADE": "1"})

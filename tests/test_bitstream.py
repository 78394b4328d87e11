"""End-to-end AV1 bitstream validation against real decoders (dav1d/libaom
via Pillow's AVIF plugin) — the golden oracle for the whole encode stack:
range coder, default CDF tables, context derivations, headers, and muxing
all have to be right for these to pass.

Mirrors the reference's integration-test strategy (gradient-synthesized
images, decode oracle; /root/reference/ravif/src/lib.rs:43-147)."""

import io

import numpy as np
import pytest
from PIL import Image

from cavif_tpu.av1.config import AV1Config
from cavif_tpu.av1.encoder import encode_planes
from cavif_tpu.av1.speed import SpeedTweaks
from cavif_tpu.container.mux import serialize_avif


def _cfg(w, h, q=121, depth=8, chroma="444"):
    return AV1Config(
        width=w,
        height=h,
        bit_depth=depth,
        quantizer=q,
        tweaks=SpeedTweaks.from_preset(4, q),
        chroma_sampling=chroma,
        full_range=True,
        matrix_coefficients=6 if chroma == "444" else None,
    )


def _decode(av1_payload, w, h, depth=8, mono=False):
    avif = serialize_avif(
        color=av1_payload,
        alpha=None,
        width=w,
        height=h,
        depth=depth,
        matrix_coefficients=6,
        premultiplied_alpha=False,
        exif=None,
    )
    img = Image.open(io.BytesIO(avif))
    img.load()
    return np.asarray(img.convert("RGB"))


def _encode_ycbcr(ycbcr, **kw):
    h, w = ycbcr.shape[:2]
    return encode_planes(ycbcr, _cfg(w, h, **kw))


def test_gray_frame_all_skip():
    """Uniform mid-gray: every block predicts exactly, whole frame skips."""
    y = np.full((64, 64, 3), 128, dtype=np.uint16)
    payload = _encode_ycbcr(y)
    px = _decode(payload, 64, 64)
    assert px.shape == (64, 64, 3)
    assert np.all(px == 128), (px.min(), px.max(), px[0, 0])


def test_flat_color_residual():
    """Non-gray flat color: first block needs a DC residual, rest skip."""
    y = np.zeros((64, 64, 3), dtype=np.uint16)
    y[..., 0] = 180  # luma
    y[..., 1] = 100  # cb
    y[..., 2] = 200  # cr
    payload = _encode_ycbcr(y)
    px = _decode(payload, 64, 64)
    # a flat YCbCr input must decode to a flat (per-channel) RGB image
    assert px.shape == (64, 64, 3)
    for ch in range(3):
        assert px[..., ch].std() < 3, (ch, px[..., ch].std())


def test_gradient_roundtrip_psnr():
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.zeros((h, w, 3), dtype=np.uint16)
    y[..., 0] = (xx * 255 // w).astype(np.uint16)
    y[..., 1] = 128
    y[..., 2] = 128
    payload = _encode_ycbcr(y)
    px = _decode(payload, w, h)
    # gray input (cb=cr=128) -> R=G=B=luma; compare luma ramp
    got = px[..., 1].astype(np.int32)
    want = y[..., 0].astype(np.int32)
    mse = ((got - want) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 30, psnr


def test_odd_dimensions():
    """129x85: partial superblocks exercise HORZ/VERT/implied-split edges."""
    h, w = 85, 129
    rng = np.random.default_rng(1)
    y = np.zeros((h, w, 3), dtype=np.uint16)
    y[..., 0] = np.linspace(40, 200, w, dtype=np.uint16)[None, :]
    y[..., 1] = 128
    y[..., 2] = 128
    payload = _encode_ycbcr(y)
    px = _decode(payload, w, h)
    assert px.shape == (h, w, 3)


def test_monochrome_alpha_stream():
    h, w = 64, 64
    a = np.full((h, w), 255, dtype=np.uint16)
    payload = encode_planes(a, _cfg(w, h, q=66, chroma="400"))
    # mono stream: decode via a gray AVIF (mux as color for oracle purposes
    # is invalid); just verify OBU structure parses
    from cavif_tpu.av1.obu import parse_sequence_header_info

    info = parse_sequence_header_info(payload)
    assert info.monochrome and info.max_width == w


def test_overhang_block_context_clamp():
    """32x32 NONE leaves overhanging the frame bottom (mi%16 in 5..7) must
    clamp entropy-context writes to the frame edge like real decoders do;
    regression for a libaom 'Failed to decode tile data' desync (the stream
    only desyncs when two adjacent overhanging blocks both carry residual)."""
    import numpy as np

    y, x = np.mgrid[0:600, 0:64]
    plane = ((x + 384) * 3 + y * 5).astype(np.int32) % 1024
    payload = _encode_ycbcr(plane[..., None], q=121, depth=10, chroma="400")
    dec = _decode(payload, 64, 600, depth=10, mono=True)
    assert dec is not None


def test_wide_frame_tile_minimums():
    """Frames wider than 4096 px must split tiles regardless of the
    thread heuristic (spec tile_info minimums); previously a >4096-px
    single-threaded encode tripped the frame-header assertion."""
    import io

    import numpy as np
    from PIL import Image

    from cavif_tpu import Encoder

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 4160, 3), dtype=np.uint8)
    res = Encoder.new().with_quality(60).with_speed(8).with_num_threads(1)\
        .encode_rgb(img)
    dec = Image.open(io.BytesIO(res.avif_file))
    assert dec.size == (4160, 64)

"""Ingest: decode + normalization semantics (reference load_rgba,
src/main.rs:254-278), including ICC profile application — the reference
converts embedded profiles to sRGB through lcms2 (load_image's
lcms2-static feature); our PIL ingest must do the same."""

import io
import struct

import numpy as np
from PIL import Image

from cavif_tpu.ops.ingest import load_rgba


def _icc_linear_srgb() -> bytes:
    """Minimal matrix-shaper RGB ICC v2 profile: sRGB primaries (D50),
    LINEAR tone curves."""
    def xyz_tag(x, y, z):
        return b"XYZ " + b"\0" * 4 + struct.pack(
            ">iii", round(x * 65536), round(y * 65536), round(z * 65536))
    def curv_gamma(g):
        return b"curv" + b"\0" * 4 + struct.pack(">I", 1) + struct.pack(
            ">H", round(g * 256))
    def desc(text):
        t = text.encode()
        return (b"desc" + b"\0" * 4 + struct.pack(">I", len(t) + 1) + t +
                b"\0" + b"\0" * 78)
    tags = [
        (b"desc", desc("linear sRGB test")),
        (b"wtpt", xyz_tag(0.9642, 1.0, 0.8249)),
        (b"rXYZ", xyz_tag(0.4360, 0.2225, 0.0139)),
        (b"gXYZ", xyz_tag(0.3851, 0.7169, 0.0971)),
        (b"bXYZ", xyz_tag(0.1431, 0.0606, 0.7139)),
        (b"rTRC", curv_gamma(1.0)),
        (b"gTRC", curv_gamma(1.0)),
        (b"bTRC", curv_gamma(1.0)),
    ]
    table = b""
    data = b""
    off = 128 + 4 + 12 * len(tags)
    for sig, payload in tags:
        pad = (-len(payload)) % 4
        table += sig + struct.pack(">II", off, len(payload))
        data += payload + b"\0" * pad
        off += len(payload) + pad
    size = off
    header = struct.pack(
        ">I4sI4s4s4s12s4s", size, b"lcms", 0x02100000, b"mntr", b"RGB ",
        b"XYZ ", b"\0" * 12, b"acsp")
    header += b"\0" * (44 - len(header))
    header += struct.pack(">III", 0, 0, 0)  # platform-ish padding
    header = header[:64] + struct.pack(">I", 0) + struct.pack(
        ">iii", round(0.9642 * 65536), 65536, round(0.8249 * 65536))
    header += b"\0" * (128 - len(header))
    return header + struct.pack(">I", len(tags)) + table + data



def test_icc_profile_applied():
    """A linear-gamma sRGB-primaries profile must brighten midtones: the
    sRGB encoding of linear 64/255 is 137."""
    img = np.full((16, 16, 3), 64, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG",
                              icc_profile=_icc_linear_srgb())
    out = load_rgba(buf.getvalue())
    assert abs(int(out[0, 0, 0]) - 137) <= 1, out[0, 0]
    assert (out[..., 3] == 255).all()


def test_icc_srgb_identity():
    """An actual sRGB profile is a no-op on the pixel values."""
    from PIL import ImageCms

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = io.BytesIO()
    prof = ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB"))
    Image.fromarray(img).save(buf, format="PNG", icc_profile=prof.tobytes())
    out = load_rgba(buf.getvalue())
    assert np.abs(out[..., :3].astype(int) - img.astype(int)).max() <= 1


def test_corrupt_icc_ignored():
    """Garbage profiles fall back to ignoring the tag (load_image's
    lenient behavior), not an error."""
    img = np.full((8, 8, 3), 77, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG", icc_profile=b"not an icc")
    out = load_rgba(buf.getvalue())
    assert (out[..., :3] == 77).all()


def test_gray_16bit_and_palette():
    """16-bit gray takes the high byte and fans out; palette PNGs expand."""
    g16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1021)
    buf = io.BytesIO()
    Image.fromarray(g16, mode="I;16").save(buf, format="PNG")
    out = load_rgba(buf.getvalue())
    assert (out[..., 0] == (g16 >> 8).astype(np.uint8)).all()
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 2] == out[..., 0]).all()

    pal = Image.fromarray(
        np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
    ).convert("P", palette=Image.ADAPTIVE)
    buf = io.BytesIO()
    pal.save(buf, format="PNG")
    out = load_rgba(buf.getvalue())
    assert out.shape == (8, 8, 4) and (out[..., 3] == 255).all()


def test_icc_gray_profile_applied():
    """Gray images transform FROM their gray profile (converting to RGB
    first made lcms reject the transform and silently skip it)."""
    img = np.full((16, 16), 64, np.uint8)
    gray_icc = _icc_linear_gray()
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="PNG",
                                        icc_profile=gray_icc)
    out = load_rgba(buf.getvalue())
    assert abs(int(out[0, 0, 0]) - 137) <= 1, out[0, 0]


def _icc_linear_gray() -> bytes:
    """Minimal gray ICC v2 profile with a LINEAR tone curve."""
    def xyz_tag(x, y, z):
        return b"XYZ " + b"\0" * 4 + struct.pack(
            ">iii", round(x * 65536), round(y * 65536), round(z * 65536))
    def curv_gamma(g):
        return b"curv" + b"\0" * 4 + struct.pack(">I", 1) + struct.pack(
            ">H", round(g * 256))
    def desc(text):
        t = text.encode()
        return (b"desc" + b"\0" * 4 + struct.pack(">I", len(t) + 1) + t +
                b"\0" + b"\0" * 78)
    tags = [
        (b"desc", desc("linear gray test")),
        (b"wtpt", xyz_tag(0.9642, 1.0, 0.8249)),
        (b"kTRC", curv_gamma(1.0)),
    ]
    table = b""
    data = b""
    off = 128 + 4 + 12 * len(tags)
    for sig, payload in tags:
        pad = (-len(payload)) % 4
        table += sig + struct.pack(">II", off, len(payload))
        data += payload + b"\0" * pad
        off += len(payload) + pad
    header = struct.pack(
        ">I4sI4s4s4s12s4s", off, b"lcms", 0x02100000, b"mntr", b"GRAY",
        b"XYZ ", b"\0" * 12, b"acsp")
    header += b"\0" * (64 - len(header)) + struct.pack(">I", 0)
    header += struct.pack(
        ">iii", round(0.9642 * 65536), 65536, round(0.8249 * 65536))
    header += b"\0" * (128 - len(header))
    return header + struct.pack(">I", len(tags)) + table + data

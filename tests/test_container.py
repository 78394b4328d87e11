"""Container tests: mux/parse roundtrip, magic bytes, and a real-decoder
oracle (re-mux a Pillow/libavif-encoded AV1 payload through our muxer and
let Pillow decode the result)."""

import io

import numpy as np
import pytest

from cavif_tpu.av1.obu import (
    OBU_SEQUENCE_HEADER,
    iter_obus,
    parse_sequence_header,
    wrap_obu,
    write_sequence_header,
)
from cavif_tpu.container.mux import serialize_avif
from cavif_tpu.container.parse import read_avif


def _fake_payload(width, height, monochrome, depth=10):
    seq = write_sequence_header(
        width=width,
        height=height,
        seq_profile=0 if monochrome else 1,
        bit_depth=depth,
        monochrome=monochrome,
        color_primaries=None if monochrome else 1,
        transfer_characteristics=None if monochrome else 13,
        matrix_coefficients=None if monochrome else 6,
    )
    return wrap_obu(OBU_SEQUENCE_HEADER, seq) + b"\x00" * 32


def test_magic_bytes():
    # tests/stdio.rs:23 -- output must contain "ftypavif" at bytes 4..12
    avif = serialize_avif(_fake_payload(64, 48, False), None, 64, 48, 10)
    assert avif[4:12] == b"ftypavif"


def test_mux_parse_roundtrip_color_only():
    color = _fake_payload(129, 101, False)
    avif = serialize_avif(color, None, 129, 101, 10, matrix_coefficients=6)
    info = read_avif(avif)
    assert info.primary_item == color
    assert info.alpha_item is None
    assert (info.width, info.height) == (129, 101)
    assert info.bit_depth == 10
    assert info.still_picture is True
    assert info.matrix_coefficients == 6
    assert info.premultiplied_alpha is False


def test_mux_parse_roundtrip_with_alpha_and_exif():
    color = _fake_payload(64, 64, False, depth=8)
    alpha = _fake_payload(64, 64, True, depth=8)
    exif = b"II*\x00test-exif"
    avif = serialize_avif(
        color, alpha, 64, 64, 8, matrix_coefficients=0, premultiplied_alpha=True, exif=exif
    )
    info = read_avif(avif)
    assert info.primary_item == color
    assert info.alpha_item == alpha
    assert info.bit_depth == 8
    assert info.matrix_coefficients == 0
    assert info.premultiplied_alpha is True
    assert info.exif == exif


def test_sequence_header_roundtrip():
    payload = write_sequence_header(
        width=511,
        height=300,
        seq_profile=1,
        bit_depth=10,
        monochrome=False,
        color_primaries=1,
        transfer_characteristics=13,
        matrix_coefficients=6,
    )
    info = parse_sequence_header(payload)
    assert (info.max_width, info.max_height) == (511, 300)
    assert info.seq_profile == 1
    assert info.bit_depth == 10
    assert info.still_picture and info.reduced_still_picture_header
    assert info.matrix_coefficients == 6
    assert info.color_range_full
    assert (info.subsampling_x, info.subsampling_y) == (0, 0)


def _pillow_avif_bytes(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb, "RGB").save(buf, format="AVIF", quality=60)
    return buf.getvalue()


def test_remux_real_payload_pillow_oracle():
    """Extract the AV1 item from a libavif-encoded file, re-mux it with our
    muxer, and require Pillow (libavif/dav1d) to decode the result to the
    same pixels. Validates the muxer against a real decoder independently of
    our own AV1 encoder."""
    from PIL import Image

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    original = _pillow_avif_bytes(rgb)
    info = read_avif(original)
    assert info.primary_item[:1] != b""
    # foreign stream sanity: our OBU parser must walk it
    types = [t for t, _ in iter_obus(info.primary_item)]
    assert OBU_SEQUENCE_HEADER in types

    remuxed = serialize_avif(
        info.primary_item,
        None,
        info.width,
        info.height,
        info.bit_depth,
        matrix_coefficients=info.matrix_coefficients or 6,
    )
    decoded_orig = np.asarray(Image.open(io.BytesIO(original)).convert("RGB"))
    decoded_remux = np.asarray(Image.open(io.BytesIO(remuxed)).convert("RGB"))
    assert np.array_equal(decoded_orig, decoded_remux)

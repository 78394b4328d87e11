"""Decode an AV1 temporal unit with libaom's decoder via ctypes.

libaom validates more conformance requirements than dav1d and reports them
through aom_codec_error_detail() — the best diagnostics available for a
rejected stream.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

_lib = ctypes.CDLL("/lib/x86_64-linux-gnu/libaom.so.3")

_lib.aom_codec_error_detail.restype = ctypes.c_char_p
_lib.aom_codec_error.restype = ctypes.c_char_p
_lib.aom_codec_get_frame.restype = ctypes.c_void_p


def _iface():
    return ctypes.c_void_p.in_dll(_lib, "aom_codec_av1_dx_algo")


def probe(payload: bytes, want_pixels: bool = False) -> Tuple[bool, str, Optional[tuple]]:
    ctx = (ctypes.c_uint8 * 256)()
    iface = ctypes.addressof(ctypes.c_void_p.in_dll(_lib, "aom_codec_av1_dx_algo"))
    rc = -1
    for ver in range(1, 40):
        rc = _lib.aom_codec_dec_init_ver(
            ctypes.byref(ctx), ctypes.c_void_p(iface), None, 0, ver
        )
        if rc == 0:
            break
    if rc != 0:
        return False, f"init failed rc={rc}", None
    try:
        buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
        rc = _lib.aom_codec_decode(
            ctypes.byref(ctx), buf, ctypes.c_size_t(len(payload)), None
        )
        err = _lib.aom_codec_error_detail(ctypes.byref(ctx))
        detail = err.decode() if err else ""
        if rc != 0:
            base = _lib.aom_codec_error(ctypes.byref(ctx))
            return False, f"{base.decode() if base else rc}: {detail}", None
        it = ctypes.c_void_p()
        img = _lib.aom_codec_get_frame(ctypes.byref(ctx), ctypes.byref(it))
        if not img:
            return False, f"no frame: {detail}", None

        # aom_image_t: fmt, cs, range, w, h, bit_depth, d_w, d_h, ...
        class Img(ctypes.Structure):
            _fields_ = [
                ("fmt", ctypes.c_int),
                ("cp", ctypes.c_int),
                ("tc", ctypes.c_int),
                ("mc", ctypes.c_int),
                ("monochrome", ctypes.c_int),
                ("csp", ctypes.c_int),
                ("range", ctypes.c_int),
                ("w", ctypes.c_uint),
                ("h", ctypes.c_uint),
                ("bit_depth", ctypes.c_uint),
                ("d_w", ctypes.c_uint),
                ("d_h", ctypes.c_uint),
            ]

        im = ctypes.cast(ctypes.c_void_p(img), ctypes.POINTER(Img)).contents
        pixels = None
        if want_pixels:
            import numpy as np

            class ImgFull(ctypes.Structure):
                # aom_image_t: planes/stride are [3]-sized (aom_image.h)
                _fields_ = Img._fields_ + [
                    ("r_w", ctypes.c_uint),
                    ("r_h", ctypes.c_uint),
                    ("x_chroma_shift", ctypes.c_uint),
                    ("y_chroma_shift", ctypes.c_uint),
                    ("planes", ctypes.c_void_p * 3),
                    ("stride", ctypes.c_int * 3),
                ]

            imf = ctypes.cast(
                ctypes.c_void_p(img), ctypes.POINTER(ImgFull)
            ).contents
            npl = 1 if imf.monochrome else 3
            pixels = []
            hb = imf.fmt & 0x800  # AOM_IMG_FMT_HIGHBITDEPTH
            for pl in range(npl):
                w_ = imf.d_w >> (imf.x_chroma_shift if pl else 0)
                h_ = imf.d_h >> (imf.y_chroma_shift if pl else 0)
                st = imf.stride[pl]
                n = st * h_
                raw = (ctypes.c_uint8 * n).from_address(imf.planes[pl])
                arr = np.frombuffer(bytes(raw), dtype=np.uint8)
                if hb:
                    arr = arr.view(np.uint16).reshape(h_, st // 2)[:, :w_]
                else:
                    arr = arr.reshape(h_, st)[:, :w_]
                pixels.append(arr.astype(np.int32))
        return True, detail, (im.d_w, im.d_h, im.bit_depth, pixels)
    finally:
        _lib.aom_codec_destroy(ctypes.byref(ctx))


if __name__ == "__main__":
    import sys

    ok, msg, desc = probe(open(sys.argv[1], "rb").read())
    print("ok:", ok, "|", msg, "|", desc)

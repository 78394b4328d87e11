"""Decode an AV1 temporal unit with libdav1d via ctypes, capturing the
decoder's diagnostic log — pinpoints which stage of our bitstream a real
decoder rejects (header parse vs tile data vs reference errors).

Usage: from tools.dav1d_probe import probe; ok, logs, pix = probe(payload)
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import List, Optional, Tuple

_lib = ctypes.CDLL("libdav1d.so.6", use_errno=True)

_LOGCB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p)


class _Data(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("sz", ctypes.c_size_t),
        ("ref", ctypes.c_void_p),
        ("m_seq_hdr", ctypes.c_void_p),
        ("m_frame_hdr", ctypes.c_void_p),
        ("m_user_data", ctypes.c_uint8 * 64),  # Dav1dDataProps (oversized)
    ]


def probe(payload: bytes, want_pixels: bool = False):
    """Returns (ok, log_messages, picture_desc)."""
    logs: List[str] = []

    @_LOGCB
    def _logcb(cookie, fmt, ap):
        try:
            logs.append(fmt.decode("utf-8", "replace").strip())
        except Exception:
            pass

    settings = (ctypes.c_uint8 * 512)()
    _lib.dav1d_default_settings(ctypes.byref(settings))
    # Dav1dSettings layout (dav1d 1.x): 6 ints, allocator(3 ptrs), logger(2 ptrs)
    logger_off = 48
    cookie_p = ctypes.cast(ctypes.byref(settings, logger_off), ctypes.POINTER(ctypes.c_void_p))
    cookie_p[0] = None
    cb_p = ctypes.cast(ctypes.byref(settings, logger_off + 8), ctypes.POINTER(ctypes.c_void_p))
    cb_p[0] = ctypes.cast(_logcb, ctypes.c_void_p)

    ctx = ctypes.c_void_p()
    rc = _lib.dav1d_open(ctypes.byref(ctx), ctypes.byref(settings))
    if rc != 0:
        return False, [f"dav1d_open failed {rc}"], None

    try:
        buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
        data = (ctypes.c_uint8 * 256)()  # Dav1dData oversized
        rc = _lib.dav1d_data_wrap(
            ctypes.byref(data),
            buf,
            ctypes.c_size_t(len(payload)),
            ctypes.cast(_FREECB, ctypes.c_void_p),
            None,
        )
        if rc != 0:
            return False, [f"data_wrap failed {rc}"], None
        pic = (ctypes.c_uint8 * 1024)()
        rc = -11
        for _ in range(32):
            sz_p = ctypes.cast(
                ctypes.byref(data, 8), ctypes.POINTER(ctypes.c_size_t)
            )
            if sz_p[0] > 0:
                src = _lib.dav1d_send_data(ctx, ctypes.byref(data))
                if src != 0 and src != -11:
                    return False, logs + [f"send_data rc={src}"], None
            rc = _lib.dav1d_get_picture(ctx, ctypes.byref(pic))
            if rc == 0:
                break
            if rc != -11:
                return False, logs + [f"get_picture rc={rc}"], None
        if rc != 0:
            return False, logs + [f"get_picture rc={rc} after drain"], None
        desc = None
        if want_pixels:
            # Dav1dPicture: Dav1dSequenceHeader*, Dav1dFrameHeader*,
            # Dav1dPictureParameters {w,h,layout,bpc}, data[3], stride[2]...
            class Pic(ctypes.Structure):
                _fields_ = [
                    ("seq_hdr", ctypes.c_void_p),
                    ("frame_hdr", ctypes.c_void_p),
                    ("data", ctypes.c_void_p * 3),
                    ("stride", ctypes.c_ssize_t * 2),
                    ("w", ctypes.c_int),
                    ("h", ctypes.c_int),
                    ("layout", ctypes.c_int),
                    ("bpc", ctypes.c_int),
                ]

            p = ctypes.cast(pic, ctypes.POINTER(Pic)).contents
            import numpy as np

            ys = p.stride[0]
            h, w = p.h, p.w
            n = 1 if p.bpc == 8 else 2
            planes = []
            strides = [ys, p.stride[1], p.stride[1]]
            for i in range(3):
                if not p.data[i]:
                    break
                s = strides[i]
                raw = ctypes.string_at(p.data[i], s * h)
                arr = np.frombuffer(raw, dtype=np.uint8 if n == 1 else np.uint16)
                arr = arr.reshape(h, s // n)[:, :w]
                planes.append(arr.copy())
            desc = (w, h, p.bpc, planes)
        _lib.dav1d_picture_unref(ctypes.byref(pic))
        return True, logs, desc
    finally:
        _lib.dav1d_close(ctypes.byref(ctx))


_FREE = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p)


@_FREE
def _FREECB(ptr, cookie):
    pass


if __name__ == "__main__":
    import sys

    payload = open(sys.argv[1], "rb").read()
    ok, logs, _ = probe(payload)
    print("ok:", ok)
    for line in logs:
        print("dav1d:", line)

"""Call libaom's internal od_ec encoder directly (byte-level oracle).

The daala entropy encoder functions are static inside libaom.so; their
binary offsets were located by disassembly (see build log). We call them via
ctypes function pointers at base+offset to obtain the exact canonical byte
stream libaom would emit for a symbol sequence — the ground truth our
RangeEncoder must reproduce (libaom's decoder enforces the canonical
termination).

Offsets are specific to /lib/x86_64-linux-gnu/libaom.so.3 in this image and
are revalidated at import by checking od_ec_enc_reset's state writes.
"""

from __future__ import annotations

import ctypes

_LIB = ctypes.CDLL("/lib/x86_64-linux-gnu/libaom.so.3")

# base = runtime address of an exported data symbol minus its vaddr
_DX_VADDR = 0x54ED80
_base = ctypes.addressof(ctypes.c_void_p.in_dll(_LIB, "aom_codec_av1_dx_algo")) - _DX_VADDR

_OFF_INIT = 0x3F050  # od_ec_enc_init(enc, uint32 size)
_OFF_RESET = 0x3F030
_OFF_ENCODE = 0x3F1B0  # od_ec_encode_cdf_q15(enc, int s, const u16 *icdf, int nsyms)
_OFF_BOOL = 0x3F0F0  # od_ec_encode_bool_q15(enc, int val, unsigned f)
_OFF_DONE = 0x3F460  # u8 *od_ec_enc_done(enc, u32 *nbytes)

_init = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_uint32)(_base + _OFF_INIT)
_encode = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int
)(_base + _OFF_ENCODE)
_bool = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int, ctypes.c_uint)(
    _base + _OFF_BOOL
)
_done = ctypes.CFUNCTYPE(
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)
)(_base + _OFF_DONE)


class AomEncoder:
    """Thin wrapper over libaom's od_ec_enc (for differential testing)."""

    def __init__(self, capacity: int = 1 << 20):
        self._enc = (ctypes.c_uint8 * 64)()
        _init(ctypes.byref(self._enc), capacity)

    def encode_symbol(self, s: int, icdf) -> None:
        n = len(icdf)
        arr = (ctypes.c_uint16 * n)(*[int(x) for x in icdf])
        assert arr[n - 1] == 0
        _encode(ctypes.byref(self._enc), s, arr, n)

    def encode_literal(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            _bool(ctypes.byref(self._enc), (value >> i) & 1, 16384)

    def done(self) -> bytes:
        nb = ctypes.c_uint32()
        ptr = _done(ctypes.byref(self._enc), ctypes.byref(nb))
        return ctypes.string_at(ptr, nb.value)


def canonical_encode(trace) -> bytes:
    """trace: iterable of (symbol, nsym, icdf_row) like tile_replay traces."""
    enc = AomEncoder()
    for item in trace:
        s, n, snap = item[0], item[1], item[2]
        enc.encode_symbol(s, list(snap[:n]))
    return enc.done()

"""AV1 multi-symbol entropy coder (daala EC / bool coder of the AV1 spec).

This is the host-side reference implementation: an encoder producing bits the
AV1 spec's symbol decoder (spec 8.2.2-8.2.6) accepts, and a mirror decoder
used for round-trip tests. CDFs use libaom's "inverted" layout: an N-symbol
CDF is an array of N uint16 where icdf[s] = 32768 - P(X <= s)*32768, strictly
decreasing with icdf[N-1] == 0. An optional extra slot icdf[N] is the
adaptation counter.

The reference delegates this to rav1e's EC; in the TPU-native design the
device emits (cdf_id, symbol) streams per tile and this coder (Python here, a
C++ port for the production path) serializes each tile independently — AV1
tiles are entropy-independent, so tile-level parallelism is exact.
Ref parity: rav1e's od_ec, exercised via /root/reference/ravif/src/
av1encoder.rs:748-771 (Context::receive_packet).
"""

from __future__ import annotations

from typing import Sequence

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
PROB_TOP = 1 << 15


def _interval(rng: int, icdf_s: int, n_minus_1_minus_s: int) -> int:
    """The spec's subinterval endpoint: ((rng>>8)*(icdf>>6)>>1) + 4*(N-1-s)."""
    return (((rng >> 8) * (icdf_s >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + (
        EC_MIN_PROB * n_minus_1_minus_s
    )


class RangeEncoder:
    """Arithmetic encoder matching the AV1 symbol decoder.

    Maintains the coding interval [low, low+rng) in the *stream-value* domain
    (the decoder complements bits on read, so bytes are emitted directly from
    `low`). `low` is held as out_bytes || pending where `pending` carries
    `pending_bits` bits; carries propagate into out_bytes.
    """

    def __init__(self) -> None:
        self.out = bytearray()
        self.pending = 0  # top of the interval's low end not yet byte-flushed
        self.pending_bits = 15  # decoder pre-reads 15 bits
        self.rng = PROB_TOP
        self.nbits_total = 15

    # -- core interval update ------------------------------------------------

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0:
            if self.out[i] == 0xFF:
                self.out[i] = 0
                i -= 1
            else:
                self.out[i] += 1
                return
        # Carry out of the first byte: cannot happen for a correctly seeded
        # stream (low + rng <= 2^total_bits by the interval invariant).
        raise AssertionError("range encoder carry out of stream")

    def _add_low(self, delta: int) -> None:
        self.pending += delta
        if self.pending >> self.pending_bits:
            self.pending &= (1 << self.pending_bits) - 1
            self._carry()

    def _renorm(self) -> None:
        d = 16 - self.rng.bit_length()
        if d:
            self.rng <<= d
            self.pending <<= d
            self.pending_bits += d
            self.nbits_total += d
        while self.pending_bits >= 40:
            shift = self.pending_bits - 8
            self.out.append((self.pending >> shift) & 0xFF)
            self.pending &= (1 << shift) - 1
            self.pending_bits -= 8

    def encode_symbol(self, s: int, icdf: Sequence[int]) -> None:
        n = len(icdf)
        r = self.rng
        v = _interval(r, icdf[s], n - 1 - s)
        u = r if s == 0 else _interval(r, icdf[s - 1], n - s)
        self._add_low(r - u)
        self.rng = u - v
        self._renorm()

    def encode_literal(self, value: int, bits: int) -> None:
        """Equiprobable bits, MSB first (spec L(n): bool with p=1/2)."""
        for i in range(bits - 1, -1, -1):
            self.encode_symbol((value >> i) & 1, _LITERAL_ICDF)

    # -- finalization --------------------------------------------------------

    def done(self) -> bytes:
        # Choose the value in [low, low+rng) with the most trailing zeros;
        # trailing zeros match the decoder's past-the-end bit convention
        # (missing stream bits read as 0).
        low = int.from_bytes(bytes(self.out), "big")
        low = (low << self.pending_bits) | self.pending
        total = 8 * len(self.out) + self.pending_bits
        high = low + self.rng  # exclusive
        # largest k with a multiple of 2^k in [low, high)
        k = 0
        while k < total:
            m = ((low + ((1 << (k + 1)) - 1)) >> (k + 1)) << (k + 1)
            if m >= high:
                break
            k += 1
        value = ((low + ((1 << k) - 1)) >> k) << k
        assert low <= value < high
        nbytes = (total + 7) >> 3
        value <<= nbytes * 8 - total
        data = value.to_bytes(nbytes, "big")
        # Trailing zero bytes are implicit (decoder pads with zero bits) but
        # keep at least one byte so the tile payload is non-empty.
        data = data.rstrip(b"\x00") or b"\x00"
        return data

    def tell_bits(self) -> int:
        return self.nbits_total


_LITERAL_ICDF = (PROB_TOP >> 1, 0)


class RangeDecoder:
    """Mirror of the spec's symbol decoder (8.2.2-8.2.6), bitwise renorm."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0
        self.rng = PROB_TOP
        val = 0
        for _ in range(15):
            val = (val << 1) | self._read_bit()
        self.val = ((1 << 15) - 1) ^ val  # complement domain

    def _read_bit(self) -> int:
        p = self.bitpos
        self.bitpos += 1
        if (p >> 3) >= len(self.data):
            return 0
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def decode_symbol(self, icdf: Sequence[int]) -> int:
        n = len(icdf)
        s = -1
        cur = self.rng
        prev = cur
        while True:
            s += 1
            prev = cur
            cur = _interval(self.rng, icdf[s], n - 1 - s)
            if self.val >= cur:
                break
        self.rng = prev - cur
        self.val -= cur
        while self.rng < PROB_TOP:
            self.rng <<= 1
            self.val = (self.val << 1) | (1 - self._read_bit())
        return s

    def decode_literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.decode_symbol(_LITERAL_ICDF)
        return v


def update_cdf(cdf: list[int], val: int, nsymbs: int) -> None:
    """In-place adaptive CDF update (spec 8.2.6 update_cdf), icdf domain.

    `cdf` has nsymbs+1 entries; the last is the adaptation counter.
    """
    count = cdf[nsymbs]
    rate = 3 + (count > 15) + (count > 31) + min(nsymbs.bit_length() - 1, 2)
    tmp = PROB_TOP
    for i in range(nsymbs - 1):
        if i == val:
            tmp = 0
        if tmp < cdf[i]:
            cdf[i] -= (cdf[i] - tmp) >> rate
        else:
            cdf[i] += (tmp - cdf[i]) >> rate
    cdf[nsymbs] = count + (count < 32)

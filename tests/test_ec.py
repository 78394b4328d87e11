"""Round-trip tests for the AV1 range coder (cavif_tpu.av1.ec).

The decoder mirrors the AV1 spec symbol-decoding process; agreement between
encoder and decoder over random CDFs/symbol streams is the correctness gate
before real bitstreams are validated against dav1d (test_bitstream.py).
"""

import random

import pytest

from cavif_tpu.av1.ec import PROB_TOP, RangeDecoder, RangeEncoder, update_cdf


def _random_icdf(rng: random.Random, n: int) -> list[int]:
    """Random strictly-decreasing inverted CDF with >=512/32768 per symbol."""
    weights = [rng.random() + 1e-3 for _ in range(n)]
    total = sum(weights)
    spare = PROB_TOP - 512 * n
    probs = [512 + int(spare * w / total) for w in weights]
    probs[0] += PROB_TOP - sum(probs)
    icdf = []
    acc = PROB_TOP
    for p in probs[:-1]:
        acc -= p
        icdf.append(acc)
    icdf.append(0)
    return icdf


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_random_static(seed):
    rng = random.Random(seed)
    ncdf = 12
    cdfs = [_random_icdf(rng, rng.randint(2, 16)) for _ in range(ncdf)]
    stream = []
    for _ in range(rng.randint(1, 4000)):
        which = rng.randrange(ncdf)
        sym = rng.randrange(len(cdfs[which]))
        stream.append((which, sym))

    enc = RangeEncoder()
    for which, sym in stream:
        enc.encode_symbol(sym, cdfs[which])
    data = enc.done()

    dec = RangeDecoder(data)
    for which, sym in stream:
        assert dec.decode_symbol(cdfs[which]) == sym


@pytest.mark.parametrize("seed", range(4))
def test_roundtrip_adaptive(seed):
    """Both sides run update_cdf after each symbol (disable_cdf_update=0)."""
    rng = random.Random(100 + seed)
    ncdf = 6
    base = [_random_icdf(rng, rng.randint(2, 13)) + [0] for _ in range(ncdf)]
    stream = [
        (w := rng.randrange(ncdf), rng.randrange(len(base[w]) - 1))
        for _ in range(2000)
    ]

    enc_cdfs = [list(c) for c in base]
    enc = RangeEncoder()
    for which, sym in stream:
        n = len(enc_cdfs[which]) - 1
        enc.encode_symbol(sym, enc_cdfs[which][:n])
        update_cdf(enc_cdfs[which], sym, n)
    data = enc.done()

    dec_cdfs = [list(c) for c in base]
    dec = RangeDecoder(data)
    for which, sym in stream:
        n = len(dec_cdfs[which]) - 1
        assert dec.decode_symbol(dec_cdfs[which][:n]) == sym
        update_cdf(dec_cdfs[which], sym, n)


def test_literals():
    rng = random.Random(7)
    vals = [(rng.randrange(1 << b), b) for b in rng.choices(range(1, 17), k=500)]
    enc = RangeEncoder()
    for v, b in vals:
        enc.encode_literal(v, b)
    data = enc.done()
    dec = RangeDecoder(data)
    for v, b in vals:
        assert dec.decode_literal(b) == v


def test_mixed_and_tiny():
    # single symbol stream; empty-ish payload edge
    icdf = [20000, 10000, 0]
    for sym in range(3):
        enc = RangeEncoder()
        enc.encode_symbol(sym, icdf)
        data = enc.done()
        dec = RangeDecoder(data)
        assert dec.decode_symbol(icdf) == sym


def test_compression_sanity():
    """Highly skewed CDF must compress far below 1 bit/symbol."""
    icdf = [512, 0]  # P(symbol 0) ~ 63/64
    enc = RangeEncoder()
    n = 10000
    for _ in range(n):
        enc.encode_symbol(0, icdf)
    data = enc.done()
    assert len(data) * 8 < n * 0.2
    dec = RangeDecoder(data)
    for _ in range(n):
        assert dec.decode_symbol(icdf) == 0


def test_byte_parity_with_libaom_oracle():
    """Our encoder must be byte-identical to libaom's od_ec encoder —
    libaom's decoder enforces the canonical termination, so this is a
    conformance requirement, not cosmetics."""
    import pytest

    try:
        from tools.aom_ec_oracle import AomEncoder
    except Exception:
        pytest.skip("libaom oracle unavailable")
    rng = random.Random(42)
    for _ in range(50):
        ncdf = rng.randint(1, 6)
        cdfs = [_random_icdf(rng, rng.randint(2, 14)) for _ in range(ncdf)]
        seq = [
            (i := rng.randrange(ncdf), rng.randrange(len(cdfs[i])))
            for _ in range(rng.randint(1, 300))
        ]
        enc = RangeEncoder()
        oracle = AomEncoder()
        for w, s in seq:
            enc.encode_symbol(s, cdfs[w])
            oracle.encode_symbol(s, cdfs[w])
        assert enc.done() == oracle.done()

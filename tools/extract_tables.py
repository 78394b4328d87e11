"""Extract AV1 spec constant tables from the system libaom (.rodata).

The AV1 specification fixes ~25k constants every conforming codec must use:
default symbol CDFs, quantizer lookup tables, coefficient scan orders,
coefficient-context offset maps, and transform cosine tables. The reference
(cavif-rs) inherits them via rav1e; here they are recovered from the system's
/lib/x86_64-linux-gnu/libaom.so.3 read-only data by structural signature
(CDF rows are strictly-decreasing u16 sequences terminated by the spec's
zero entries; quant tables are monotone 256-entry i16 ramps with known
endpoints; scans are permutations of 0..N-1; cospi arrays are cosine ramps).

Offsets below were located by the signature scan documented in the build
log; every table is re-verified structurally at extraction time and the
whole set is validated behaviorally by decoding our encoder's output with
dav1d/libaom (tests/test_bitstream.py).

Run:  python tools/extract_tables.py   (writes cavif_tpu/av1/data/tables.npz)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

LIBAOM = "/lib/x86_64-linux-gnu/libaom.so.3"
RO_OFF, RO_SIZE = 0x42D000, 0xB56A0  # .rodata section (readelf -S)

OUT = Path(__file__).resolve().parent.parent / "cavif_tpu" / "av1" / "data" / "tables.npz"


def check_cdf_rows(arr: np.ndarray, nsym_fn) -> None:
    """arr: (..., W) u16. nsym_fn(index_tuple)->n symbols; verifies each row is
    a valid inverted CDF: n-1 strictly decreasing positive values then zeros."""
    flat = arr.reshape(-1, arr.shape[-1])
    for i, row in enumerate(flat):
        n = nsym_fn(i) if callable(nsym_fn) else nsym_fn
        body = row[: n - 1].astype(np.int64)
        assert np.all(body > 0) and np.all(body < 32768), (i, row)
        assert np.all(body[:-1] > body[1:]) or n <= 2, (i, row)
        assert np.all(row[n - 1 :][: max(0, arr.shape[-1] - n)] >= 0)


def main() -> None:
    data = Path(LIBAOM).read_bytes()
    ro16 = np.frombuffer(data[RO_OFF : RO_OFF + RO_SIZE], dtype="<u2")
    ro32 = np.frombuffer(data[RO_OFF : RO_OFF + RO_SIZE], dtype="<i4")
    ro8 = np.frombuffer(data[RO_OFF : RO_OFF + RO_SIZE], dtype=np.uint8)

    t: dict[str, np.ndarray] = {}

    def u16(off, shape):
        n = int(np.prod(shape))
        return ro16[off : off + n].reshape(shape).astype(np.uint16)

    # ---- coefficient-coding CDFs (token_cdfs.h layout) --------------------
    # dims: [q_ctx=4][tx_size_ctx=5][plane_type=2][...]
    t["base_eob_cdf"] = u16(26160, (4, 5, 2, 4, 4))        # CDF_SIZE(3)
    t["base_cdf"] = u16(26800, (4, 5, 2, 42, 5))           # CDF_SIZE(4)
    t["br_cdf"] = u16(35200, (4, 5, 2, 21, 5))             # CDF_SIZE(4)
    eob_offs = {1024: 39408, 512: 39600, 256: 39776, 128: 39936, 64: 40080,
                32: 40208, 16: 40320}
    for sz, off in eob_offs.items():
        nsym = {16: 5, 32: 6, 64: 7, 128: 8, 256: 9, 512: 10, 1024: 11}[sz]
        t[f"eob_pt_{sz}_cdf"] = u16(off, (4, 2, 2, nsym + 1))
    t["eob_extra_cdf"] = u16(40416, (4, 5, 2, 9, 3))       # CDF_SIZE(2)
    t["txb_skip_cdf"] = u16(41504, (4, 5, 13, 3))          # CDF_SIZE(2)
    t["dc_sign_cdf"] = u16(42288, (4, 2, 3, 3))            # CDF_SIZE(2)

    # structural validation
    check_cdf_rows(t["base_cdf"], 4)
    check_cdf_rows(t["br_cdf"], 4)
    check_cdf_rows(t["base_eob_cdf"], 3)
    # spot anchors (libaom token_cdfs.h values)
    assert list(t["base_cdf"][0, 0, 0, 0, :3]) == [28734, 23838, 20041]
    assert list(t["txb_skip_cdf"][0, 0, 0, :1]) == [919]

    # ---- mode CDFs (entropymode.c layout) ---------------------------------
    t["partition_cdf"] = u16(46544, (20, 11))  # 4 ctx x bsl{8,16,32,64,128}
    t["uv_mode_cdf"] = np.stack(
        [u16(46768, (13, 15)), u16(46963, (13, 15))]
    )  # [cfl_allowed][intra_mode][CDF_SIZE(14)] (13 syms when cfl not allowed)
    t["kf_y_mode_cdf"] = u16(47168, (5, 5, 14))  # [above_ctx][left_ctx]
    t["palette_y_size_cdf"] = u16(47552, (7, 8))
    t["palette_uv_size_cdf"] = u16(47608, (7, 8))
    t["angle_delta_cdf"] = u16(47664, (8, 8))    # [dir_mode][CDF_SIZE(7)]
    # angle rows peak at symbol 3 (delta 0); anchor row 0 value
    assert int(t["angle_delta_cdf"][0, 0]) == 30588
    t["tx_size_cdf"] = u16(48616, (4, 3, 4))     # [cat][ctx]; cat0 has 2 syms
    # intra tx-type CDFs (entropymode.c default_intra_ext_tx_cdf sets 1-2;
    # set 0 is DCT-only/uncoded): [set][tx_size_sqr][intra_mode][CDF_SIZE(16)]
    # set 1 = EXT_TX_SET_DTT4_IDTX_1DDCT (7 syms), set 2 = DTT4_IDTX (5 syms)
    t["intra_ext_tx_cdf"] = u16(44772, (2, 4, 13, 17))
    t["delta_q_cdf"] = u16(48664, (5,))
    t["skip_cdf"] = np.array(
        [[1097, 0, 0], [16253, 0, 0], [28192, 0, 0]], dtype=np.uint16
    )  # values at ro16[48576..]; counter slots normalized to 0
    t["cfl_sign_cdf"] = np.append(ro16[48680:48688], 0).astype(np.uint16)
    # cfl_alpha: rows 0-4 are clean 17-entry rows at 48688; the binary's
    # row-5 image carries a duplicated (355, 248) pair (linker artifact) —
    # drop it to recover the true 15-body row (validated bit-exact against
    # dav1d for ctx-5 symbols in tests/test_cfl.py)
    cfl_a = u16(48688, (6, 17)).copy()
    r5 = list(ro16[48688 + 5 * 17 : 48688 + 5 * 17 + 19])
    del r5[11:13]
    cfl_a[5] = np.asarray(r5, np.uint16)
    t["cfl_alpha_cdf"] = cfl_a

    check_cdf_rows(t["kf_y_mode_cdf"], 13)
    assert list(t["intra_ext_tx_cdf"][0, 0, 0, :2]) == [31233, 24733]
    assert list(t["intra_ext_tx_cdf"][1, 0, 0, :2]) == [26214, 19661]
    check_cdf_rows(t["angle_delta_cdf"], 7)
    assert list(t["skip_cdf"][:, 0]) == [1097, 16253, 28192]
    assert list(t["delta_q_cdf"][:3]) == [4608, 648, 91]
    part_nsym = lambda i: 4 if i < 4 else (10 if i < 16 else 8)
    check_cdf_rows(t["partition_cdf"], part_nsym)

    # ---- quantizer lookups (quant_common.c) -------------------------------
    # directional-prediction slope table (reconintra.c dr_intra_derivative):
    # uint16[90], indexed by angle, nonzero only at the coded angles
    t["dr_intra_derivative"] = u16(154944, (90,))
    t["ac_q_12"] = u16(151088, (256,)).astype(np.int32)
    t["ac_q_10"] = u16(151344, (256,)).astype(np.int32)
    t["ac_q_8"] = u16(151600, (256,)).astype(np.int32)
    t["dc_q_12"] = u16(151856, (256,)).astype(np.int32)
    t["dc_q_10"] = u16(152112, (256,)).astype(np.int32)
    t["dc_q_8"] = u16(152368, (256,)).astype(np.int32)
    assert t["ac_q_8"][0] == 4 and t["ac_q_8"][255] == 1828
    assert t["dc_q_8"][255] == 1336 and t["dc_q_10"][255] == 5347

    # ---- scan orders (scan.c): forward "diag" scans; key = (w, h) ---------
    scans = {
        (4, 4): (180840, 16), (8, 8): (178632, 64), (16, 16): (174408, 256),
        (32, 32): (170824, 1024),
        (4, 8): (180776, 32), (8, 4): (180680, 32),
        (8, 16): (178376, 128), (16, 8): (178248, 128),
        (16, 32): (177224, 512), (32, 16): (176712, 512),
        (4, 16): (180552, 64), (16, 4): (180488, 64),
        (8, 32): (179976, 256), (32, 8): (179720, 256),
    }
    for (w, h), (off, n) in scans.items():
        s = ro16[off : off + n].astype(np.int32)
        assert sorted(s.tolist()) == list(range(n)), (w, h)
        t[f"scan_{w}x{h}"] = s

    # ---- coeff-base context offset maps (uint8, per tx dims (w,h)) --------
    B = 363800  # byte offset of the nz_map_ctx_offset blob (8 pad zeros lead)
    nz = {
        (32, 8): 8, (8, 32): 264, (16, 4): 520, (4, 16): 584,
        (32, 32, "wide64x32"): 648, (32, 32, "tall32x64"): 1672,
        (32, 16): 2696, (16, 32): 3208, (16, 8): 3720, (8, 16): 3848,
        (8, 4): 3976, (32, 32): 4008, (16, 16): 5032, (8, 8): 5288,
        (4, 4): 5352,
    }
    for key, off in nz.items():
        if len(key) == 3:
            w, h, name = key
            t[f"nz_off_{name}"] = ro8[B + off : B + off + w * h].reshape(h, w).copy()
        else:
            w, h = key
            t[f"nz_off_{w}x{h}"] = ro8[B + off : B + off + w * h].reshape(h, w).copy()
    # 4x8 is absent from the blob; generate from the tall rule verified on
    # 4x16/8x32/16x32: row<2 -> 11 (origin 0), else band(row+col) with
    # band 2..3 -> 6, >=4 -> 21.
    tall48 = np.zeros((8, 4), dtype=np.uint8)
    for r in range(8):
        for c in range(4):
            if r == 0 and c == 0:
                v = 0
            elif r < 2:
                v = 11
            else:
                v = 6 if (r + c) <= 3 else 21
            tall48[r, c] = v
    t["nz_off_4x8"] = tall48
    assert np.array_equal(
        t["nz_off_4x16"][:4], np.array([[0,11,11,11],[11,11,11,11],[6,6,21,21],[6,21,21,21]], dtype=np.uint8)
    )
    t["nz_off_1d"] = np.array([26, 31] + [36] * 30, dtype=np.uint8)

    # ---- transform cosine tables (av1_cospi_arr_data[7][64], bits 10..16) -
    base32 = 11704
    cospi = ro32[base32 : base32 + 7 * 64].reshape(7, 64).copy()
    for i, bit in enumerate(range(10, 17)):
        assert cospi[i][0] == 1 << bit, (i, cospi[i][0])
    t["cospi"] = cospi
    # sinpi (ADST4): find [x,1321*s,2482*s,3344*s,3803*s] runs
    sin12 = np.array([0, 1321, 2482, 3344, 3803], dtype=np.int64)
    found = None
    for i in range(len(ro32) - 40):
        if ro32[i] == 0 and ro32[i + 1] > 0:
            blk = ro32[i : i + 35].astype(np.int64)
            if blk[1] == 330 or blk[1] == 1321:
                found = i
                break
    if found is not None:
        t["sinpi"] = ro32[found : found + 7 * 5].reshape(7, 5).copy()

    # ---- smooth-prediction weights (sm_weight_arrays, sizes 4..64) --------
    smoff = data.find(bytes([255, 149, 85, 64]))
    assert smoff > 0
    sm = np.frombuffer(data[smoff : smoff + 4 + 8 + 16 + 32 + 64], dtype=np.uint8)
    t["sm_weights_4"] = sm[0:4].copy()
    t["sm_weights_8"] = sm[4:12].copy()
    t["sm_weights_16"] = sm[12:28].copy()
    t["sm_weights_32"] = sm[28:60].copy()
    t["sm_weights_64"] = sm[60:124].copy()
    assert t["sm_weights_8"][1] == 197 and t["sm_weights_64"][-1] == 4

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **t)
    print(f"wrote {OUT} with {len(t)} tables:")
    for k in sorted(t):
        print(f"  {k}: {t[k].shape} {t[k].dtype}")


if __name__ == "__main__":
    sys.exit(main())

"""Symbol-level AV1 intra tile replayer/decoder.

Decodes a tile's symbol stream (partition / intra modes / coefficients) with
the same spec tables and context logic the encoder uses, recording a full
(symbol, cdf_state) trace. Used to:
- replay libaom-encoded tiles as ground truth for our tables/contexts;
- re-encode a recorded trace through our RangeEncoder and byte-compare
  against the original (pinpoints EC divergence);
- debug our own streams.

Assumes: reduced still picture, 4:4:4 or mono, TX largest, no filter_intra
unless enabled, no intrabc/palette/segmentation/cdef/lr.
"""

from __future__ import annotations

import numpy as np

from cavif_tpu.av1 import tables as T
from cavif_tpu.av1.ec import RangeDecoder, RangeEncoder, update_cdf
from cavif_tpu.av1.symbols import q_ctx, txsize_ctx, _SKIP_CONTEXTS

INTRA = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]


class Replayer:
    def __init__(self, tile: bytes, mi_cols: int, mi_rows: int, base_q: int,
                 num_planes: int = 3, enable_filter_intra: bool = False,
                 tx_mode_select: bool = False, verbose: bool = True,
                 disable_cdf_update: bool = False):
        self.dec = RangeDecoder(tile)
        self.tile = tile
        self.mi_cols, self.mi_rows = mi_cols, mi_rows
        self.qc = q_ctx(base_q)
        self.np_ = num_planes
        self.efi = enable_filter_intra
        self.txsel = tx_mode_select
        self.verbose = verbose
        self.upd = not disable_cdf_update
        self.store = {}
        self.trace = []  # (symbol, nsym, cdf_snapshot, label)
        w4 = mi_cols + 32
        h4 = mi_rows + 32
        self.above_part = np.zeros(w4, dtype=np.uint8)
        self.left_part = np.zeros(h4, dtype=np.uint8)
        self.ymodes = {}
        self.skips = {}
        self.above_ctx = [np.zeros(w4, dtype=np.uint8) for _ in range(3)]
        self.left_ctx = [np.zeros(h4, dtype=np.uint8) for _ in range(3)]

    def log(self, *a):
        if self.verbose:
            print(" ", *a)

    def rd(self, key, n, default_row, label):
        row = self.store.get(key)
        if row is None:
            row = list(default_row) + [0]
            self.store[key] = row
        snap = tuple(row)
        s = self.dec.decode_symbol(row[:n])
        if self.upd:
            update_cdf(row, s, n)
        self.trace.append((s, n, snap, label))
        self.log(f"{label}: {s}")
        return s

    def literal(self, bits, label):
        v = self.dec.decode_literal(bits)
        for i in range(bits - 1, -1, -1):
            self.trace.append(((v >> i) & 1, 2, ((1 << 14), 0, 0), f"L:{label}"))
        self.log(f"L {label}({bits}): {v}")
        return v

    # -- syntax -------------------------------------------------------------

    def run(self):
        for r in range(0, self.mi_rows, 16):
            self.left_part[:] = 0
            for pl in range(3):
                self.left_ctx[pl][:] = 0
            for c in range(0, self.mi_cols, 16):
                self.partition(r, c, 4)
        return self.dec.bitpos

    def partition(self, r, c, bsl):
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        n4 = 1 << bsl
        half = n4 >> 1
        has_rows = (r + half) < self.mi_rows
        has_cols = (c + half) < self.mi_cols
        if bsl > 0 and has_rows and has_cols:
            ctx = ((int(self.left_part[r]) >> (bsl - 1)) & 1) * 2 + (
                (int(self.above_part[c]) >> (bsl - 1)) & 1
            )
            nsym = 4 if bsl == 1 else (8 if bsl == 5 else 10)
            p = self.rd(("part", bsl, ctx), nsym, T.partition_cdf(bsl - 1, ctx),
                        f"part@{r},{c} b{bsl} ctx{ctx}")
        elif bsl == 0:
            p = 0
        elif not has_rows and not has_cols:
            p = 3
        else:
            # split_or_horz / split_or_vert via gathered binary cdf
            ctx = ((int(self.left_part[r]) >> (bsl - 1)) & 1) * 2 + (
                (int(self.above_part[c]) >> (bsl - 1)) & 1
            )
            nsym = 4 if bsl == 1 else (8 if bsl == 5 else 10)
            key = ("part", bsl, ctx)
            row = self.store.get(key)
            if row is None:
                row = list(T.partition_cdf(bsl - 1, ctx)) + [0]
                self.store[key] = row
            from cavif_tpu.av1.symbols import gather_split_binary as _gather_split_binary

            icdf = _gather_split_binary(row[:nsym], nsym, horz=has_cols, bsl=bsl)
            s = self.dec.decode_symbol(icdf)
            self.trace.append((s, 2, icdf, "split_bin"))
            self.log(f"split_bin@{r},{c}: {s}")
            if has_cols:
                p = 3 if s else 1  # SPLIT or HORZ
            else:
                p = 3 if s else 2
        if p == 0:
            self.block(r, c, n4, n4)
        elif p == 1:
            self.block(r, c, n4, half)
            if (r + half) < self.mi_rows:
                self.block(r + half, c, n4, half)
        elif p == 2:
            self.block(r, c, half, n4)
            if (c + half) < self.mi_cols:
                self.block(r, c + half, half, n4)
        elif p == 3:
            for dr, dc in ((0, 0), (0, half), (half, 0), (half, half)):
                self.partition(r + dr, c + dc, bsl - 1)
        else:
            raise NotImplementedError(f"partition {p}")

    def block(self, r, c, w4, h4):
        sa = self.skips.get((r - 1, c), 0) if r > 0 else 0
        sl = self.skips.get((r, c - 1), 0) if c > 0 else 0
        sk = self.rd(("skip", sa + sl), 2, T.skip_cdf(sa + sl),
                     f"skip@{r},{c} ctx{sa+sl}")
        am = INTRA[self.ymodes.get((r - 1, c), 0)] if r > 0 else 0
        lm = INTRA[self.ymodes.get((r, c - 1), 0)] if c > 0 else 0
        ym = self.rd(("kfy", am, lm), 13, T.kf_y_mode_cdf(am, lm),
                     f"y@{r},{c} ctx({am},{lm})")
        if 1 <= ym <= 8 and min(w4, h4) >= 2:
            self.rd(("angle", ym - 1), 7, T.angle_delta_cdf(ym - 1), "angle_y")
        uv = -1
        if self.np_ > 1:
            cfl = max(w4, h4) * 4 <= 32
            uv = self.rd(("uv", cfl, ym), 14 if cfl else 13,
                         T.uv_mode_cdf(cfl, ym), f"uv@{r},{c}")
            if uv == 13 and cfl:
                raise NotImplementedError("CFL")
            if 1 <= uv <= 8 and min(w4, h4) >= 2:
                self.rd(("angle", uv - 1), 7, T.angle_delta_cdf(uv - 1), "angle_uv")
        if (self.efi and ym == 0 and max(w4, h4) * 4 <= 32):
            raise NotImplementedError("filter_intra cdf")
        for i in range(w4):
            for j in range(h4):
                self.ymodes[(r + j, c + i)] = ym
                self.skips[(r + j, c + i)] = sk
        wl = w4.bit_length() - 1
        hl = h4.bit_length() - 1
        self.above_part[c : c + w4] = (0x1F << wl) & 0x1F
        self.left_part[r : r + h4] = (0x1F << hl) & 0x1F
        if sk:
            for pl in range(self.np_):
                self.above_ctx[pl][c : c + w4] = 0
                self.left_ctx[pl][r : r + h4] = 0
            return
        # residual: 64x64 chunks; planes y,u,v; tx = largest
        bw, bh = w4 * 4, h4 * 4
        for pl in range(self.np_):
            txw = min(bw, 64) if pl == 0 else min(bw, 32)
            txh = min(bh, 64) if pl == 0 else min(bh, 32)
            for ty in range(0, bh, txh):
                for tx in range(0, bw, txw):
                    px, py = c * 4 + tx, r * 4 + ty
                    if px >= self.mi_cols * 4 or py >= self.mi_rows * 4:
                        continue
                    self.coeffs(pl, py // 4, px // 4, txw, txh,
                                tx_eq_block=(txw == bw and txh == bh))

    def coeffs(self, plane, r4, c4, txw, txh, tx_eq_block):
        ptype = 1 if plane else 0
        cw, ch = min(txw, 32), min(txh, 32)
        w4, h4 = txw >> 2, txh >> 2
        tctx = txsize_ctx(txw, txh)
        if plane == 0:
            if tx_eq_block:
                sctx = 0
            else:
                above = max((int(self.above_ctx[0][c4 + i]) & 63 for i in range(w4)), default=0)
                left = max((int(self.left_ctx[0][r4 + i]) & 63 for i in range(h4)), default=0)
                sctx = _SKIP_CONTEXTS[min(above, 4)][min(left, 4)]
        else:
            a_nz = any(self.above_ctx[plane][c4 + i] for i in range(w4))
            l_nz = any(self.left_ctx[plane][r4 + i] for i in range(h4))
            # chroma base offset 10 when the plane block exceeds the tx
            sctx = (7 if tx_eq_block else 10) + int(a_nz) + int(l_nz)
        az = self.rd(("txbskip", tctx, sctx), 2,
                     T.txb_skip_cdf(self.qc, tctx, sctx),
                     f"txb_skip p{plane} ctx{sctx}")
        if az:
            self.above_ctx[plane][c4 : c4 + w4] = 0
            self.left_ctx[plane][r4 : r4 + h4] = 0
            return
        if max(txw, txh) < 32:
            raise NotImplementedError("tx_type signaling")
        area = cw * ch
        ept = self.rd(("eobpt", area, ptype), {16:5,32:6,64:7,128:8,256:9,512:10,1024:11}[area],
                      T.eob_pt_cdf(area, self.qc, ptype, 0), "eob_pt") + 1
        if ept < 3:
            eob = ept
        else:
            base = (1 << (ept - 2)) + 1
            msb = self.rd(("eobex", tctx, ptype, ept - 3), 2,
                          T.eob_extra_cdf(self.qc, tctx, ptype, ept - 3), "eob_extra")
            off = msb << (ept - 3)
            for i in range(ept - 4, -1, -1):
                off |= self.literal(1, "eob_bit") << i
            eob = base + off
        self.log(f"eob={eob}")
        scan = T.scan(cw, ch)
        nzoff = T.nz_off(cw, ch)
        pad = np.zeros((ch + 2, cw + 2), dtype=np.int32)
        levels = np.zeros((ch, cw), dtype=np.int64)
        for si in range(eob - 1, -1, -1):
            pos = int(scan[si])
            row, col = pos // cw, pos % cw
            if si == eob - 1:
                if si == 0:
                    ectx = 0
                elif si <= area // 8:
                    ectx = 1
                elif si <= area // 4:
                    ectx = 2
                else:
                    ectx = 3
                lv = self.rd(("beob", tctx, ptype, ectx), 3,
                             T.base_eob_cdf(self.qc, tctx, ptype, ectx),
                             f"base_eob ctx{ectx}") + 1
            else:
                mag = (min(int(pad[row, col + 1]), 3) + min(int(pad[row + 1, col]), 3)
                       + min(int(pad[row + 1, col + 1]), 3) + min(int(pad[row, col + 2]), 3)
                       + min(int(pad[row + 2, col]), 3))
                mctx = min((mag + 1) >> 1, 4)
                bctx = 0 if pos == 0 else mctx + int(nzoff[row, col])
                lv = self.rd(("base", tctx, ptype, bctx), 4,
                             T.base_cdf(self.qc, tctx, ptype, bctx),
                             f"base pos{pos} ctx{bctx}")
            if lv > 2:
                magb = (min(int(pad[row, col + 1]), 15) + min(int(pad[row + 1, col]), 15)
                        + min(int(pad[row + 1, col + 1]), 15))
                bmag = min((magb + 1) >> 1, 6)
                if pos == 0:
                    brctx = bmag
                elif row < 2 and col < 2:
                    brctx = bmag + 7
                else:
                    brctx = bmag + 14
                brt = min(tctx, 3)
                for _ in range(4):
                    s = self.rd(("br", brt, ptype, brctx), 4,
                                T.br_cdf(self.qc, brt, ptype, brctx),
                                f"br ctx{brctx}")
                    lv += s
                    if s < 3:
                        break
            pad[row, col] = min(lv, 127)
            levels[row, col] = lv
        # signs + golomb
        cul = 0
        dc_cat = 0
        for si in range(eob):
            pos = int(scan[si])
            row, col = pos // cw, pos % cw
            lv = int(levels[row, col])
            if lv:
                if si == 0:
                    s = 0
                    for i in range(w4):
                        cat = int(self.above_ctx[plane][c4 + i]) >> 6
                        s += 1 if cat == 2 else (-1 if cat == 1 else 0)
                    for i in range(h4):
                        cat = int(self.left_ctx[plane][r4 + i]) >> 6
                        s += 1 if cat == 2 else (-1 if cat == 1 else 0)
                    dctx = 2 if s > 0 else (1 if s < 0 else 0)
                    sign = self.rd(("dcs", ptype, dctx), 2,
                                   T.dc_sign_cdf(self.qc, ptype, dctx), "dc_sign")
                    dc_cat = 1 if sign else 2
                else:
                    self.literal(1, "sign")
            if lv > 14:
                length = 0
                while True:
                    b = self.literal(1, "gol_pre")
                    length += 1
                    if b:
                        break
                x = 1
                for _ in range(length - 1):
                    x = (x << 1) | self.literal(1, "gol_bit")
                lv = x - 1 + 15
                levels[row, col] = lv
            cul += lv
        cul = min(63, cul)
        packed = cul | (dc_cat << 6)
        self.above_ctx[plane][c4 : c4 + w4] = packed
        self.left_ctx[plane][r4 : r4 + h4] = packed


def reencode_trace(trace):
    """Re-encode a recorded trace with our RangeEncoder (using the exact cdf
    snapshots from the trace, so adaptation state matches)."""
    enc = RangeEncoder()
    for s, n, snap, label in trace:
        enc.encode_symbol(s, snap[:n])
    return enc.done()

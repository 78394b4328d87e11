"""Prototype: fused Pallas matmul+quant+reduce for the pass-1 directional
cost (the r05 roofline candidate — see ops/device_pass1.py _cost_body).

XLA formulation materializes cp = ext @ MK (rows x C*n2 f32) to HBM
(written by the matmul, read by the fused quant+reduce); this kernel keeps
each (TR, TC*n2) tile in VMEM and emits only the (rows, C) costs.

Usage: python tools/pallas_proto.py [tier]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cavif_tpu.ops.device_pass1 import (
    _dir_cands, _dir_matrix, _cand_tables)
from cavif_tpu.av1.transforms import AC_BIAS, dct2_matrix, get_gain


def build(b, R, TR, TC, seed=0):
    rng = np.random.default_rng(seed)
    dirs = _dir_cands(True)
    m = _dir_matrix(dirs, b, b)           # (E, C*n2)
    E, n2, C = m.shape[0], b * b, len(dirs)
    dh = dct2_matrix(b, np.float64)
    kron = np.kron(dh, dh).T              # (n2, n2)
    m3 = m.astype(np.float64).reshape(E, C, n2)
    MK = np.einsum("ecj,jk->eck", m3, kron).reshape(E, C * n2).astype(np.float32)
    cc = (0.5 * kron.sum(axis=0)).astype(np.float32)
    gain = np.float32(get_gain(b, b))
    # realistic inputs
    ext = rng.integers(0, 1024, (R, E)).astype(np.float32)
    blocks = rng.integers(0, 1024, (R, n2)).astype(np.float32)
    bkt = blocks @ kron.astype(np.float32)
    dc_q, ac_q, lam = np.float32(20.0), np.float32(25.0), np.float32(210.0)
    msk = np.zeros(n2, np.float32); msk[0] = 1.0
    acf, dcf = ac_q * gain, dc_q * gain
    inv_scale = (1 - msk) / acf + msk / dcf
    scale = (1 - msk) * acf + msk * dcf
    bias = (1 - msk) * AC_BIAS + msk * 0.5
    return dict(MK=MK, cc=cc, ext=ext, bkt=bkt, lam=lam, n2=n2, C=C, E=E,
                inv_scale=inv_scale.astype(np.float32),
                scale=scale.astype(np.float32), bias=bias.astype(np.float32))


def xla_ref(d):
    MK, cc = jnp.asarray(d["MK"]), jnp.asarray(d["cc"])
    invs, scl, bia = (jnp.asarray(d[k]) for k in ("inv_scale", "scale", "bias"))
    n2, C = d["n2"], d["C"]
    lam = jnp.float32(d["lam"])

    @jax.jit
    def f(ext, bkt):
        cp = jnp.einsum("re,ec->rc", ext, MK,
                        preferred_element_type=jnp.float32)
        R = ext.shape[0]
        coef = bkt[:, None, :] - (cp.reshape(R, C, n2) * (1.0 / 32.0) + cc)
        t = coef * invs
        lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + bia)
        errc = coef - lv * scl
        rate = jnp.abs(lv).sum(-1) + 2.0 * (lv != 0.0).sum(-1)
        return (errc * errc).sum(-1) + lam * rate
    return f


def pallas_fused(d, TR, TC, reduce_mode="matmul"):
    n2, C, E = d["n2"], d["C"], d["E"]
    Cp = ((C + TC - 1) // TC) * TC
    K = TC * n2
    Ep = ((E + 127) // 128) * 128
    MKp = np.zeros((Ep, Cp * n2), np.float32)
    MKp[:E, :C * n2] = d["MK"]
    ccT = np.tile(d["cc"], TC)[None, :]
    invT = np.tile(d["inv_scale"], TC)[None, :]
    sclT = np.tile(d["scale"], TC)[None, :]
    biaT = np.tile(d["bias"], TC)[None, :]
    S = np.zeros((K, TC), np.float32)
    for t in range(TC):
        S[t * n2:(t + 1) * n2, t] = 1.0
    lam = d["lam"]

    def kern(ext_ref, bkt_ref, mk_ref, cc_ref, inv_ref, scl_ref, bia_ref,
             s_ref, o_ref):
        cp = jax.lax.dot_general(
            ext_ref[:].astype(jnp.bfloat16), mk_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bt = jnp.concatenate([bkt_ref[:]] * TC, axis=1)
        coef = bt - (cp * (1.0 / 32.0) + cc_ref[:])
        t = coef * inv_ref[:]
        lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + bia_ref[:])
        errc = coef - lv * scl_ref[:]
        u = errc * errc + lam * (jnp.abs(lv) + 2.0 * (lv != 0.0))
        if reduce_mode == "matmul":
            # (TC, TR) = S^T @ u^T, exact f32 products (S is 0/1)
            o_ref[0] = jax.lax.dot_general(
                s_ref[:], u, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            for t0 in range(TC):
                o_ref[0, t0] = u[:, t0 * n2:(t0 + 1) * n2].sum(axis=1)

    nC = Cp // TC
    MKj = jnp.asarray(MKp)
    consts = [jnp.asarray(x) for x in (ccT, invT, sclT, biaT, S)]

    @jax.jit
    def f(ext, bkt):
        R = ext.shape[0]
        Rp = ((R + TR - 1) // TR) * TR
        extp = jnp.zeros((Rp, Ep), jnp.float32).at[:R, :E].set(ext)
        bktp = jnp.zeros((Rp, n2), jnp.float32).at[:R].set(bkt)
        out = pl.pallas_call(
            kern,
            grid=(Rp // TR, nC),
            in_specs=[
                pl.BlockSpec((TR, Ep), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, n2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ep, K), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((1, K), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)] * 4
              + [pl.BlockSpec((K, TC), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TC, TR), lambda i, j: (j, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nC, TC, Rp), jnp.float32),
        )(extp, bktp, MKj, *consts)
        return out.reshape(Cp, Rp)[:C, :R].T
    return f


def bench(f, ext, bkt, n=10):
    r = f(ext, bkt); r.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        r = f(ext, bkt)
    r.block_until_ready()
    return (time.time() - t0) / n, r


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # 1 MP, 3 planes
    R = 3 * (1024 // b) ** 2
    TC = {4: 32, 8: 8, 16: 2, 32: 1}[b]
    d = build(b, R, 512, TC)
    ext, bkt = jnp.asarray(d["ext"]), jnp.asarray(d["bkt"])
    fx = xla_ref(d)
    tx, rx = bench(fx, ext, bkt)
    print(f"tier {b}: R={R} C={d['C']} n2={d['n2']} E={d['E']}")
    print(f"  xla   {tx*1e3:7.2f} ms")
    for TR in (256, 512):
        for mode in ("matmul", "loop"):
            try:
                fp = pallas_fused(d, TR, TC, mode)
                tp, rp = bench(fp, ext, bkt)
                diff = np.abs(np.asarray(rp) - np.asarray(rx))
                rel = diff / np.maximum(np.abs(np.asarray(rx)), 1.0)
                am_x = np.asarray(rx).argmin(1)
                am_p = np.asarray(rp).argmin(1)
                flips = (am_x != am_p).mean()
                print(f"  pallas TR={TR} {mode:6s} {tp*1e3:7.2f} ms  "
                      f"maxrel {rel.max():.2e}  argmin flips {flips:.4%}")
            except Exception as e:
                print(f"  pallas TR={TR} {mode}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()

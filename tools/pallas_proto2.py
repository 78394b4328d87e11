"""Ablation harness for the fused pass-1 pallas kernel bottleneck."""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pallas_proto import build


def make(d, TR, TC, variant):
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
        if variant == "mm_only":
            o_ref[0] = jax.lax.dot_general(
                s_ref[:], cp, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        bt = jnp.concatenate([bkt_ref[:]] * TC, axis=1)
        coef = bt - (cp * (1.0 / 32.0) + cc_ref[:])
        if variant == "no_quant":
            u = coef * coef
        else:
            t = coef * inv_ref[:]
            if variant == "no_sign":
                lv = jnp.floor(jnp.abs(t) + bia_ref[:])
            else:
                lv = jnp.sign(t) * jnp.floor(jnp.abs(t) + bia_ref[:])
            errc = coef - lv * scl_ref[:]
            u = errc * errc + lam * (jnp.abs(lv) + 2.0 * (lv != 0.0))
        prec = (jax.lax.Precision.DEFAULT if variant == "red_bf16"
                else jax.lax.Precision.HIGHEST)
        o_ref[0] = jax.lax.dot_general(
            s_ref[:], u, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    nC = Cp // TC
    MKj = jnp.asarray(MKp)
    consts = [jnp.asarray(x) for x in (ccT, invT, sclT, biaT, S)]

    R = d["ext"].shape[0]
    Rp = ((R + TR - 1) // TR) * TR
    extp = jnp.zeros((Rp, Ep), jnp.float32).at[:R, :E].set(d["ext"])
    bktp = jnp.zeros((Rp, n2), jnp.float32).at[:R].set(d["bkt"])
    extp.block_until_ready()

    @jax.jit
    def f(ext, bkt):
        return pl.pallas_call(
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
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(ext, bkt, MKj, *consts)
    return f, extp, bktp


def bench(f, a, b, n=20):
    r = f(a, b); r.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        r = f(a, b)
    r.block_until_ready()
    return (time.time() - t0) / n


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = 3 * (1024 // b) ** 2
    d = build(b, R, 0, 0)
    print(f"tier {b}: R={R}")
    for TR, TC in [(256, 8), (256, 56), (512, 56), (1024, 8), (128, 56)]:
        for variant in ("full", "mm_only", "no_quant", "red_bf16"):
            try:
                f, extp, bktp = make(d, TR, TC, variant)
                t = bench(f, extp, bktp)
                print(f"  TR={TR:4d} TC={TC:2d} {variant:9s} {t*1e3:7.2f} ms")
            except Exception as e:
                print(f"  TR={TR:4d} TC={TC:2d} {variant:9s} FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

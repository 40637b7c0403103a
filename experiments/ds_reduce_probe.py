"""Probe: where do the tall compensated (n, k) reductions spend time?

Hypothesis: rank-2 (n, k) f32 arrays with k << 128 are physically
lane-padded to 128 on TPU (tiled (8, 128) layout in HBM), so every
stream of a (10M, 4) block actually moves ~5 GB, and the XLA two_sum
tree (strided 0::2/1::2 levels + concats) multiplies that. A Pallas
bundle reading compact data once should run at memory speed.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_002_432  # ~10M, divisible by 4096 and 32
K = 4


def timed(fn, *args, chain=20):
    z = fn(*args)
    zf = z[0] if isinstance(z, tuple) else z
    float(jnp.asarray(zf).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(chain):
        z = fn(*args)
    zf = z[0] if isinstance(z, tuple) else z
    float(jnp.asarray(zf).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / chain


def main(stages):
    rng = np.random.default_rng(0)

    if "layout" in stages:
        xn = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        xw = jnp.asarray(rng.standard_normal((N // 32, 128)), jnp.float32)

        @jax.jit
        def ew(x):
            return x * jnp.float32(1.0000001) + jnp.float32(1e-9)

        tn = timed(ew, xn)
        tw = timed(ew, xw)
        print(json.dumps({"name": "elementwise_rw",
                          "narrow_Nx4_ms": tn * 1e3,
                          "wide_128_ms": tw * 1e3,
                          "ratio": tn / tw}), flush=True)

        @jax.jit
        def red(x):
            return jnp.sum(x, axis=0)

        tn = timed(red, xn)
        tw = timed(red, xw)
        print(json.dumps({"name": "plain_sum",
                          "narrow_Nx4_ms": tn * 1e3,
                          "wide_128_ms": tw * 1e3}), flush=True)

    if "dot2" in stages:
        from fortran_davidson_tpu.utils import ds as dsm
        xn = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        yn = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)

        @jax.jit
        def dot2(x, y):
            r = dsm.dot_cols_ds(x, y)
            return r.hi

        t = timed(dot2, xn, yn, chain=5)
        print(json.dumps({"name": "dot_cols_ds_Nx4", "ms": t * 1e3}),
              flush=True)

        @jax.jit
        def sumsq(x):
            return dsm.col_sumsq_ds(x).hi

        t = timed(sumsq, xn, chain=5)
        print(json.dumps({"name": "col_sumsq_ds_Nx4", "ms": t * 1e3}),
              flush=True)

    if "refined" in stages:
        from fortran_davidson_tpu.core import refine
        from fortran_davidson_tpu.models.generators import \
            surrogate_hamiltonian
        op = surrogate_hamiltonian(N, dtype=jnp.float32)
        A_off = op.offdiag()
        diag = op.diagonal().astype(jnp.float32)
        X = jnp.asarray(rng.standard_normal((N, K)) / np.sqrt(N),
                        jnp.float32)

        @jax.jit
        def rp(X):
            r = refine.refined_pairs(A_off, diag, X)
            return r.evals

        t = timed(rp, X, chain=5)
        print(json.dumps({"name": "refined_pairs_Nx4", "ms": t * 1e3}),
              flush=True)

        @jax.jit
        def offapply(X):
            return A_off.matmat(X)

        t = timed(offapply, X, chain=5)
        print(json.dumps({"name": "A_off_matmat_Nx4", "ms": t * 1e3}),
              flush=True)




def cascade_variants():
    """Prototype replacements for tall_sum_ds / dot_cols_ds."""
    from fortran_davidson_tpu.utils import ds as dsm

    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)

    def folded_cascade(x2, lo2, B):
        """Sequential compensated slab cascade on a full-lane (n2, L)
        pair: acc <- two_sum(acc, slab), lo += e. Returns (B, L) DS."""
        n2, L = x2.shape
        nslab = n2 // B

        def body(i, carry):
            hi, lo = carry
            xs = jax.lax.dynamic_slice(x2, (i * B, 0), (B, L))
            ls = jax.lax.dynamic_slice(lo2, (i * B, 0), (B, L))
            s, e = dsm.two_sum(hi, xs)
            return s, lo + ls + e

        hi0 = jnp.zeros((B, L), x2.dtype)
        hi, lo = jax.lax.fori_loop(0, nslab, body, (hi0, hi0))
        # tail
        rem = n2 - nslab * B
        if rem:
            s, e = dsm.two_sum(
                hi.at[:rem].get(), x2[nslab * B:])
            hi = hi.at[:rem].set(s)
            lo = lo.at[:rem].add(lo2[nslab * B:] + e)
        return hi, lo

    def dot_b(X, Y, B=8192):
        n, k = X.shape
        g = 128 // k
        n2 = n // g
        p, e = dsm.two_prod(X, Y)
        x2 = p.reshape(n2, g * k)
        lo2 = e.reshape(n2, g * k)
        hi, lo = folded_cascade(x2, lo2, B)
        out = dsm.ds_sum_tree(hi.reshape(B * g, k), axis=0,
                              lo=lo.reshape(B * g, k))
        return out

    def dot_c(X, Y, B=8192 * 32):
        # narrow: no reshape, slab loop directly on (n, k)
        n, k = X.shape
        nslab = n // B

        def body(i, carry):
            hi, lo = carry
            xs = jax.lax.dynamic_slice(X, (i * B, 0), (B, k))
            ys = jax.lax.dynamic_slice(Y, (i * B, 0), (B, k))
            p, e = dsm.two_prod(xs, ys)
            s, e2 = dsm.two_sum(hi, p)
            return s, lo + e + e2

        hi0 = jnp.zeros((B, k), X.dtype)
        hi, lo = jax.lax.fori_loop(0, nslab, body, (hi0, hi0))
        return dsm.tall_sum_ds(hi, lo=lo)

    def dot_d(X, Y, B=8192):
        # fused: reshape inputs (not products), two_prod inside loop
        n, k = X.shape
        g = 128 // k
        n2 = n // g
        L = g * k
        x2 = X.reshape(n2, L)
        y2 = Y.reshape(n2, L)
        nslab = n2 // B

        def body(i, carry):
            hi, lo = carry
            xs = jax.lax.dynamic_slice(x2, (i * B, 0), (B, L))
            ys = jax.lax.dynamic_slice(y2, (i * B, 0), (B, L))
            p, e = dsm.two_prod(xs, ys)
            s, e2 = dsm.two_sum(hi, p)
            return s, lo + e + e2

        hi0 = jnp.zeros((B, L), X.dtype)
        hi, lo = jax.lax.fori_loop(0, nslab, body, (hi0, hi0))
        return dsm.ds_sum_tree(hi.reshape(B * g, k), axis=0,
                               lo=lo.reshape(B * g, k))

    ref = jax.jit(lambda x, y: dsm.dot_cols_ds(x, y).hi)
    jb = jax.jit(lambda x, y: dot_b(x, y).hi)
    jc = jax.jit(lambda x, y: dot_c(x, y).hi)
    jd = jax.jit(lambda x, y: dot_d(x, y).hi)

    va = np.asarray(ref(X, Y))
    for name, fn in [("b_reshape_prod", jb), ("c_narrow", jc),
                     ("d_fused_reshape", jd)]:
        try:
            v = np.asarray(fn(X, Y))
            t = timed(fn, X, Y, chain=10)
            print(json.dumps({"name": f"dot_{name}", "ms": t * 1e3,
                              "max_reldiff_vs_ref": float(
                                  np.max(np.abs(v - va) /
                                         np.maximum(np.abs(va), 1e-30)))}),
                  flush=True)
        except Exception as e2:
            print(json.dumps({"name": f"dot_{name}",
                              "error": str(e2)[:200]}), flush=True)

    @jax.jit
    def reshape_only(x):
        return x.reshape(N // 32, 128) + jnp.float32(0)

    t = timed(reshape_only, X, chain=10)
    print(json.dumps({"name": "reshape_cost", "ms": t * 1e3}), flush=True)


def main2(stages):
    main([s for s in stages if s != "cascade"])
    if "cascade" in stages:
        cascade_variants()


if __name__ == "__main__":
    main2(sys.argv[1:] or ["layout", "dot2", "refined"])

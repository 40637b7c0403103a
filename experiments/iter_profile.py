"""Per-component timing of one refined lowest-k Davidson iteration at the
north-star shape (n=10M, k=4, m_max=40) on the real chip.

Each piece is timed as its own jitted chain (scalar-carried fori_loop
where the op is small; ping-pong where it streams) because the tunnel's
block_until_ready is unreliable — see CLAUDE.md.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_384
M = 40
K = 4
CHAIN = 20


def timed(fn, *args, chain=CHAIN):
    z = fn(*args)
    float(jnp.asarray(z).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(chain):
        z = fn(*args)
    float(jnp.asarray(z).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / chain


def main(stages):
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((N, M)) / np.sqrt(N), jnp.float32)
    AV = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    Wk = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

    out = {}

    if "gram" in stages:
        from fortran_davidson_tpu.utils.ds import gram_ds

        @jax.jit
        def g(V, AV):
            r = gram_ds(V, AV)
            return r.hi[0, 0]

        out["gram_ds_V_AV_ms"] = timed(g, V, AV) * 1e3

    if "ritz" in stages:
        @jax.jit
        def prod(V, Wk):
            return (V @ Wk)[0, 0]

        out["V_at_Wk_ms"] = timed(prod, V, Wk) * 1e3

    if "eigh" in stages:
        H = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
        H = H + H.T + 10.0 * jnp.eye(M, dtype=jnp.float32)

        @jax.jit
        def eig_chain(H):
            def body(_, h):
                w, W = jnp.linalg.eigh(h)
                return h + 1e-12 * w[0] * (W @ W.T)
            return jax.lax.fori_loop(0, 50, body, H)[0, 0]

        out["eigh_40_ms"] = timed(eig_chain, H, chain=3) / 50 * 1e3

    if "refine_ritz" in stages:
        from fortran_davidson_tpu.core import refine
        from fortran_davidson_tpu.utils.ds import DS
        H = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
        H = H + H.T + 10.0 * jnp.eye(M, dtype=jnp.float32)

        @jax.jit
        def rr_chain(H):
            def body(_, h):
                w, W = jnp.linalg.eigh(h)
                Wr = refine.refine_ritz(DS(h, h * 1e-8), w, W, K)
                return h + 1e-12 * Wr[0, 0] * jnp.eye(M, dtype=h.dtype)
            return jax.lax.fori_loop(0, 50, body, H)[0, 0]

        t_all = timed(rr_chain, H, chain=3) / 50 * 1e3
        out["eigh_plus_refine_ritz_ms"] = t_all

    if "ortho" in stages:
        from fortran_davidson_tpu.core import orthogonal
        corr = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        mask = jnp.ones((K,), jnp.float32)

        @jax.jit
        def ob(V, corr):
            Q, alive = orthogonal.orthonormalize_block(
                V, corr, mask, n_reorth=2, method="cholqr2", precise=True)
            return Q[0, 0]

        out["orthonormalize_block_ms"] = timed(ob, V, corr) * 1e3

    if "corr" in stages:
        from fortran_davidson_tpu.core import correction as corr_mod
        R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        X = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        w = jnp.arange(1.0, K + 1.0, dtype=jnp.float32)
        diag = jnp.arange(1.0, N + 1.0, dtype=jnp.float32)
        mask = jnp.ones((K,), jnp.float32)

        @jax.jit
        def dp(R):
            c = corr_mod.dpr_correction(R, w, diag, jnp.ones_like(diag),
                                        mask)
            return c[0, 0]

        out["dpr_correction_ms"] = timed(dp, R) * 1e3

    if "update" in stages:
        @jax.jit
        def upd(V, Q):
            V2 = jax.lax.dynamic_update_slice(V, Q, (0, 8))
            return V2[0, 0]

        Q = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        out["dus_write_ms"] = timed(upd, V, Q) * 1e3

    if "chunked" in stages:
        # Chunked-carry layout components (round 3: the default refined
        # engine at scale) — where do the remaining ~75 ms/iter go?
        from fortran_davidson_tpu.models.generators import (
            surrogate_hamiltonian)
        from fortran_davidson_tpu.utils.ds import _chunk, gram_ds_pre
        c = _chunk(N, None)
        Vc = V.reshape(N // c, c, M)
        AVc = AV.reshape(N // c, c, M)

        @jax.jit
        def gpre(Vc, AVc):
            return gram_ds_pre(Vc, AVc).hi[0, 0]

        out["gram_ds_pre_ms"] = timed(gpre, Vc, AVc) * 1e3

        @jax.jit
        def tdot(Vc, Wk):
            y = jnp.einsum("rcm,mk->rck", Vc, Wk,
                           preferred_element_type=jnp.float32)
            return y[0, 0, 0]

        out["einsum_ritz_ms"] = timed(tdot, Vc, Wk) * 1e3

        Qc = jnp.asarray(
            np.random.default_rng(1).standard_normal((N // c, c, K)),
            jnp.float32)

        @jax.jit
        def updc(Vc, Qc):
            z0 = jnp.zeros((), jnp.int32)
            return jax.lax.dynamic_update_slice(
                Vc, Qc, (z0, z0, jnp.asarray(8, jnp.int32)))[0, 0, 0]

        out["dus_chunked_ms"] = timed(updc, Vc, Qc) * 1e3

        op = surrogate_hamiltonian(N, dtype=jnp.float32)
        Xk = jnp.asarray(
            np.random.default_rng(2).standard_normal((N, K)), jnp.float32)

        @jax.jit
        def apply_op(Xk):
            return op.matmat(Xk)[0, 0]

        out["op_matmat_k_ms"] = timed(apply_op, Xk) * 1e3

        from fortran_davidson_tpu.core import refine
        Rk = jnp.asarray(
            np.random.default_rng(4).standard_normal((N, K)), jnp.float32)

        @jax.jit
        def resid(Vc, AVc, Wk):
            x = jnp.einsum("rcm,mk->rck", Vc, Wk,
                           preferred_element_type=jnp.float32)
            ax = jnp.einsum("rcm,mk->rck", AVc, Wk,
                            preferred_element_type=jnp.float32)
            lam = jnp.arange(1.0, K + 1.0, dtype=jnp.float32)
            r = ax - x * lam[None, None, :]
            return r[0, 0, 0]

        out["residual_assembly_ms"] = timed(resid, Vc, AVc, Wk) * 1e3

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["gram", "ritz", "eigh", "refine_ritz", "ortho",
                          "corr", "update"])

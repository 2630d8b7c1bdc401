"""Right-env absorption + E_cand construction: variant study on chip.

The round-4 scan attribution (results/r4_scan_phases2.jsonl) put the
search scan's cost at rowenv 1.14 ms/site (per-branch traced-tensor
contraction) and E_cand table gathers 0.55 ms/site. Both shapes are
small, so the costs are structural (batched tiny matmuls / computed-
index scalar gathers), and tnax pins jax_default_matmul_precision =
'highest' (6-pass bf16 emulation) which multiplies every GEMM by ~6.
This probe measures, in-scan at the flagship shape:

rowenv variants:
  gather      baseline (per-branch gather + batched small einsums)
  onehot      (rr x onehot(u)) @ G  — one big GEMM, 16x FLOPs
  twogemm     T = rr (x) AT over b (one GEMM), new_all = T (x) Wt over
              (d,r) for ALL q (one GEMM), then gather q=u_m — 1.34 GMAC
  *_high      same with precision=HIGH (3-pass bf16 emulation)
  *_bf16      precision=DEFAULT (single-pass bf16; accuracy floor probe)

E_cand variants:
  ecand_gather   baseline: 4 computed-index gathers at C=8192
  ecand_dense    dense (M, Np) increment table via one-hot GEMMs + ONE
                 flat gather by the top-k index vector
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

M, Np, D, LH, LV = 1024, 256, 32, 16, 16
NX = 16
C = 8192
STEPS = 256


def absorb_gather(AT, Wt, u, rr, prec):
    Wu = jnp.moveaxis(Wt[:, :, :, u], -1, 0)
    T = jnp.einsum("adb,mbr->madr", AT, rr, precision=prec)
    return jnp.einsum("madr,mldr->mal", T, Wu, precision=prec)


def absorb_onehot(AT, Wt, u, rr, prec):
    U = jax.nn.one_hot(u, LV, dtype=rr.dtype)
    G = jnp.einsum("adb,ldrq->brqal", AT, Wt, precision=prec)
    X = (rr[:, :, :, None] * U[:, None, None, :]).reshape(M, D * LH * LV)
    return jnp.matmul(X, G.reshape(D * LH * LV, D * LH),
                      precision=prec).reshape(M, D, LH)


def absorb_twogemm(AT, Wt, u, rr, prec):
    # T[m,r,a,d] = sum_b rr[m,b,r] AT[a,d,b]  -- (m*r, b) @ (b, a*d)
    T = jnp.einsum("mbr,adb->mrad", rr, AT, precision=prec)
    # new_all[m,a,l,q] = sum_{d,r} T[m,r,a,d] Wt[l,d,r,q]
    new_all = jnp.einsum("mrad,ldrq->malq", T, Wt, precision=prec)
    return jnp.take_along_axis(
        new_all, u[:, None, None, None], axis=3)[..., 0]


def mk_scan(absorb, prec):
    @jax.jit
    def scan(AT_row, Wt_row, uidx):
        def step(rr, _):
            new = absorb(AT_row, Wt_row, uidx, rr, prec)
            scale = jnp.max(jnp.abs(new), axis=(1, 2), keepdims=True)
            return new / jnp.where(scale > 0, scale, 1.0), None
        rr0 = jnp.zeros((M, D, LH), AT_row.dtype).at[:, 0, 0].set(1.0)
        rr, _ = lax.scan(step, rr0, None, length=STEPS)
        return rr
    return scan


@jax.jit
def scan_ecand_gather(Eng, vind, src, indc, Es_t, Esl_t, Esu_t):
    def step(carry, nx):
        E = Eng + carry
        E_cand = E[src] + Es_t[indc] + Esl_t[indc, vind[src, nx]] \
            + Esu_t[indc, vind[src, nx + 1]]
        return E_cand[0] * 1e-9, None
    nxs = jnp.tile(jnp.arange(NX, dtype=jnp.int32), STEPS // NX)
    carry, _ = lax.scan(step, jnp.float32(0.0), nxs)
    return carry


@jax.jit
def scan_ecand_dense(Eng, lidx, uidx, idx_c, Es_t, Esl_t, Esu_t):
    """Einc[m,p] = Eng[m] + Es[p] + Esl[p,lidx_m] + Esu[p,uidx_m] built
    densely (two (M,lh)@(lh,Np) GEMMs), then ONE flat gather at idx_c."""
    Ul = jax.nn.one_hot(lidx, LH, dtype=Es_t.dtype)
    Uu = jax.nn.one_hot(uidx, LV, dtype=Es_t.dtype)

    def step(carry, _):
        Einc = Eng[:, None] + Es_t[None, :] + carry \
            + jnp.matmul(Ul, Esl_t.T) + jnp.matmul(Uu, Esu_t.T)
        E_cand = Einc.reshape(M * Np)[idx_c]
        return E_cand[0] * 1e-9, None
    carry, _ = lax.scan(step, jnp.float32(0.0), None, length=STEPS)
    return carry


def timed(name, fn, *args):
    np.asarray(fn(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    print(json.dumps({"variant": name,
                      "per_site_ms": round(best / STEPS * 1e3, 4),
                      "scan_s": round(best, 4)}), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    r = np.random.default_rng(0)
    f32 = np.float32
    AT = jnp.asarray(r.normal(size=(D, LV, D)).astype(f32) / D)
    Wt = jnp.asarray(r.normal(size=(LH, LV, LH, LV)).astype(f32))
    u = jnp.asarray(r.integers(0, LV, size=M), jnp.int32)

    P = lax.Precision
    for name, absorb, prec in [
            ("gather", absorb_gather, P.HIGHEST),
            ("gather_high", absorb_gather, P.HIGH),
            ("onehot", absorb_onehot, P.HIGHEST),
            ("onehot_high", absorb_onehot, P.HIGH),
            ("onehot_bf16", absorb_onehot, P.DEFAULT),
            ("twogemm", absorb_twogemm, P.HIGHEST),
            ("twogemm_high", absorb_twogemm, P.HIGH),
            ("twogemm_bf16", absorb_twogemm, P.DEFAULT)]:
        timed(name, mk_scan(absorb, prec), AT, Wt, u)

    # numerical drift of the variants vs the f32 'highest' gather form
    rr = jnp.asarray(r.normal(size=(M, D, LH)).astype(f32))
    ref = np.asarray(absorb_gather(AT, Wt, u, rr, P.HIGHEST))
    for name, absorb, prec in [
            ("onehot_highest", absorb_onehot, P.HIGHEST),
            ("twogemm_highest", absorb_twogemm, P.HIGHEST),
            ("twogemm_high", absorb_twogemm, P.HIGH),
            ("gather_high", absorb_gather, P.HIGH)]:
        out = np.asarray(absorb(AT, Wt, u, rr, prec))
        rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
        print(json.dumps({"drift": name, "rel_err": float(rel)}),
              flush=True)

    Eng = jnp.asarray(r.normal(size=M).astype(f32))
    vind = jnp.asarray(r.integers(0, LH, size=(M, NX + 1)), jnp.int32)
    src = jnp.asarray(r.integers(0, M, size=C), jnp.int32)
    indc = jnp.asarray(r.integers(0, Np, size=C), jnp.int32)
    Es_t = jnp.asarray(r.normal(size=Np).astype(f32))
    Esl_t = jnp.asarray(r.normal(size=(Np, LH)).astype(f32))
    Esu_t = jnp.asarray(r.normal(size=(Np, LV)).astype(f32))
    timed("ecand_gather", scan_ecand_gather, Eng, vind, src, indc,
          Es_t, Esl_t, Esu_t)
    lidx = jnp.asarray(r.integers(0, LH, size=M), jnp.int32)
    uidx = jnp.asarray(r.integers(0, LV, size=M), jnp.int32)
    idx_c = jnp.asarray(r.integers(0, M * Np, size=C), jnp.int32)
    timed("ecand_dense", scan_ecand_dense, Eng, lidx, uidx, idx_c,
          Es_t, Esl_t, Esu_t)


if __name__ == "__main__":
    main()

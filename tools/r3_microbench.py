"""Microbenchmark of the search-scan per-site ops at the flagship L2048
operating point (M=1024, Np=256, D=32, lv=lh=16, C=8192).

Each op runs R times inside ONE jitted lax.fori_loop (device-side
iteration; the loop carry forces sequential execution) so per-dispatch
overhead is excluded — this isolates the on-device cost shares that the
phase split cannot see. One JSON line per op: amortized microseconds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax import lax

M, Np, D, LV, LH, C = 1024, 256, 32, 16, 16, 8192
R = 50


def timed(name, body, *args):
    """Run body R times device-side, return amortized seconds."""

    @jax.jit
    def prog(*args):
        def it(i, carry):
            out = body(*args, carry)
            return out
        return lax.fori_loop(0, R, it, jnp.zeros((), jnp.float32))

    prog(*args)                      # compile
    t0 = time.time()
    np.asarray(prog(*args))          # host pull = sync
    dt = (time.time() - t0) / R
    print(json.dumps({"op": name, "us": round(dt * 1e6, 1)}), flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    probf = jax.random.uniform(key, (M * Np,), jnp.float32)
    probf2d = probf.reshape(M, Np)
    vind = jax.random.randint(key, (C, 17), 0, 16, jnp.int32)
    Eng = jax.random.uniform(key, (C,), jnp.float32)
    RL = jax.random.uniform(key, (M, D), jnp.float32)
    AT = jax.random.uniform(key, (D, D * LV), jnp.float32)
    T2 = jax.random.uniform(key, (M, D, LV), jnp.float32)
    rhoR = jax.random.uniform(key, (D, LV, D), jnp.float32)

    timed("top_k_262144_k8193",
          lambda p, c: lax.top_k(p + c, min(C + 1, M * Np))[0][0], probf)
    timed("top_k_262144_k1025",
          lambda p, c: lax.top_k(p + c, M + 1)[0][0], probf)
    timed("per_branch_top_k_Np",
          lambda p, c: lax.top_k(p + c, Np)[0][0, 0], probf2d)
    timed("sort_262144",
          lambda p, c: jnp.sort(p + c)[0], probf)
    timed("threshold_count+cumsum",
          lambda p, c: (jnp.cumsum((p + c > 0.5).astype(jnp.int32))[-1]
                        ).astype(jnp.float32), probf)

    from tnax import parallel as par
    keys_in = jnp.concatenate([vind, jnp.zeros((C, 1), jnp.int32)], axis=1)

    def merge_sort_body(v, c):
        keys = par.pack_keys(v + c.astype(jnp.int32), 4)
        perm = jnp.lexsort(tuple(reversed(keys)))
        return perm[0].astype(jnp.float32)

    timed("merge_lexsort_C8192", merge_sort_body, keys_in)

    def segment_body(e, c):
        seg = jnp.clip(jnp.arange(C, dtype=jnp.int32) // 3, 0, C - 1)
        mn = jax.ops.segment_min(e + c, seg, num_segments=C)
        return mn[0]

    timed("segment_min_C8192", segment_body, Eng)

    timed("marginal_matmul_RLAT",
          lambda a, b, c: (a @ (b + c)).ravel()[0], RL, AT)

    def t2_contract(t2, rr, c):
        return jnp.einsum("mdv,dvk->mk", t2 + c, rr).ravel()[0]

    timed("T2_rhoR_einsum", t2_contract, T2, rhoR)


if __name__ == "__main__":
    main()

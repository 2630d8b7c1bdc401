"""Round-3 measurement session 3:

1. Direct (single-dispatch) lax.top_k timings at scan shapes — the
   fori-loop microbench claimed 12.7 s/call at k=8193 over 262144, which
   contradicts the measured 0.9 s full scan; resolve the artifact.
2. J124 C16 wave-mode throughput: 16 instances at group=8 (two batches
   per wave), production D=48/M=4096.
3. C16 select A/B: one warm batch with select='compact'.
4. Droplet L1152 + L2048 fused fleet batches (for revalidation planning).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel

DROP = ("/root/reference/instances/Chimera_droplet_instances/"
        "chimera%d_spinglass_power/%03d.txt")


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))),
                          1 / 75)


def stage_topk():
    import jax
    import jax.numpy as jnp
    from jax import lax
    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, (262144,), jnp.float32)
    out = {}
    for k in (1025, 8193, 32769):
        f = jax.jit(lambda x: lax.top_k(x, k)[0])
        np.asarray(f(p))                    # compile
        t0 = time.time()
        for _ in range(5):
            np.asarray(f(p))
        out["k%d" % k] = round((time.time() - t0) / 5 * 1e3, 2)
    # and inside a small scan (the production context)
    def scanned(x):
        def step(c, xi):
            v, i = lax.top_k(xi + c, 8193)
            return c + v[0], v[0]
        return lax.scan(step, jnp.float32(0), x)[1]
    xs = jax.random.uniform(key, (16, 262144), jnp.float32)
    g = jax.jit(scanned)
    np.asarray(g(xs))
    t0 = time.time()
    for _ in range(3):
        np.asarray(g(xs))
    out["k8193_in_scan16_ms_per_step"] = round(
        (time.time() - t0) / 3 / 16 * 1e3, 2)
    print(json.dumps(dict(stage="topk_direct_ms", **out)), flush=True)


def stage_j124_wave():
    import conformance
    t0 = time.time()
    res = conformance.run_j124_batched(16, 16, 48, 4096, True, group=8)
    n_ok = sum(r["ok"] for r in res)
    print(json.dumps(dict(stage="j124_C16_wave", ok=n_ok, n=len(res),
                          total_s=round(time.time() - t0, 2))), flush=True)


def stage_c16_compact():
    J124 = "/root/reference/instances/Chimera_J124/C=16_J124/%03d.txt"
    ts = []
    for ids in ((1, 2, 3, 4, 5, 6, 7, 8), (9, 10, 11, 12, 13, 14, 15, 16)):
        solvers = []
        for k in ids:
            J = tnax.Jij_f2p(tnax.load_Jij(J124 % k))
            solvers.append(tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8,
                                       J=J, beta=0.75))
        t0 = time.time()
        parallel.multi_flagship_search_gs(solvers, M=4096,
                                          relative_P_cutoff=1e-8, Dmax=48,
                                          select="compact")
        ts.append(round(time.time() - t0, 2))
    print(json.dumps(dict(stage="c16_compact_batch8", batch_s=ts)),
          flush=True)


def stage_droplet_large():
    for L, ids in ((1152, range(1, 9)), (2048, range(1, 9))):
        Nx = Ny = {1152: 12, 2048: 16}[L]
        ts = []
        for rep in range(2):
            solvers = [tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=8,
                                   J=load(L, i + 8 * rep), beta=3)
                       for i in ids]
            t0 = time.time()
            parallel.multi_flagship_search_gs(
                solvers, M=1024, relative_P_cutoff=1e-8, Dmax=32)
            ts.append(round(time.time() - t0, 2))
        print(json.dumps(dict(stage="fleet8_L%d" % L, batch_s=ts)),
              flush=True)


if __name__ == "__main__":
    stages = os.environ.get(
        "R3M3_STAGES", "topk,j124,compact,droplet").split(",")
    if "topk" in stages:
        stage_topk()
    if "j124" in stages:
        stage_j124_wave()
    if "compact" in stages:
        stage_c16_compact()
    if "droplet" in stages:
        stage_droplet_large()

"""On-chip A/B of the radix-threshold selection vs lax.top_k.

1. In-scan microbench at the flagship shape (262144 candidates,
   k=8193): a lax.scan of 256 selection steps (the per-site pattern),
   one dispatch, host-sync timed — the measurement style the round-3
   microbenches validated (fori_loop timings are artifacts).
2. The full fused flagship at L2048 with select='radix' vs 'topk'
   (bit-identical results guaranteed by tests/test_selectk.py).
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
from functools import partial

import tnax
from tnax import parallel, selectk

N, K, STEPS = 262144, 8193, 256


@partial(jax.jit, static_argnames=("mode",))
def scan_select(probf, mode):
    def step(carry, _):
        p = probf + carry
        if mode == "radix":
            vals, idx = selectk.top_k_radix(p, K)
        else:
            vals, idx = lax.top_k(p, K)
        return vals[0] * 1e-9, (vals[0], idx[0])
    carry, outs = lax.scan(step, jnp.float32(0.0), None, length=STEPS)
    return carry


def micro():
    rng = np.random.default_rng(0)
    probf = jnp.asarray(rng.normal(size=N).astype(np.float32) - 30.0)
    for mode in ("topk", "radix", "topk", "radix"):
        np.asarray(scan_select(probf, mode))      # compile+run
        t0 = time.time()
        np.asarray(scan_select(probf, mode))
        dt = time.time() - t0
        print(json.dumps({"cfg": f"scan256 {mode}",
                          "per_site_ms": round(dt / STEPS * 1e3, 3),
                          "total_s": round(dt, 3)}), flush=True)


def flagship(select):
    J = tnax.load_Jij(
        "/root/reference/instances/Chimera_droplet_instances/"
        "chimera2048_spinglass_power/001.txt")
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
    ts = []
    for _ in range(3):
        ins._gauges = None
        t0 = time.time()
        r = parallel.flagship_search_gs(ins, M=1024,
                                        relative_P_cutoff=1e-8,
                                        Dmax=32, select=select)
        ts.append(time.time() - t0)
    ins.states = np.asarray(r["states"])[None, :][:, ins.order]
    E = float(tnax.energy_Jij(J, ins.binary_states())[0])
    print(json.dumps({"cfg": f"L2048 select={select}",
                      "times": [round(t, 3) for t in ts],
                      "warm_s": round(min(ts[1:]), 3),
                      "energy_ok": bool(abs(E + 3336.77333333) < 1e-4)}),
          flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    micro()
    for select in ("topk", "radix"):
        flagship(select)


if __name__ == "__main__":
    main()

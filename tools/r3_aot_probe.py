"""Round-3 cold-start probe (VERDICT task 6): where does a fresh process
spend its time, and does jax.export/AOT serialization help?

Phases measured in THIS fresh process:
  t_import     import jax + tnax
  t_first_op   first trivial device op (tunnel/device init)
  t_tiny_jit   compile of a trivial jitted fn (remote-compile round trip)
  t_export_rt  jax.export round-trip of the flagship marginal kernel:
               serialize, deserialize, call (does the deserialized call
               still pay a remote compile?)
  t_flagship   full flagship cold run (precondition+boundary+search)

Run twice back-to-back (fresh process each) to separate service-warmth
effects from in-process caching.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t0 = time.time()
import numpy as np
import jax
import jax.numpy as jnp
import tnax
from tnax import parallel
t_import = time.time() - t0

t0 = time.time()
np.asarray(jnp.zeros((4,)) + 1)
t_first_op = time.time() - t0

t0 = time.time()
f = jax.jit(lambda x: (x @ x).sum())
np.asarray(f(jnp.ones((64, 64))))
t_tiny_jit = time.time() - t0

# jax.export round trip of the marginal kernel at flagship shapes
import __graft_entry__ as g
fn, args = g.entry()
t0 = time.time()
from jax import export as jexport
exp = jexport.export(jax.jit(fn))(*args)
blob = exp.serialize()
t_export = time.time() - t0
t0 = time.time()
reloaded = jexport.deserialize(blob)
out = reloaded.call(*args)
np.asarray(out[0])
t_deser_call = time.time() - t0
t0 = time.time()
np.asarray(reloaded.call(*args)[0])
t_deser_call2 = time.time() - t0
t0 = time.time()
np.asarray(jax.jit(fn)(*args)[0])
t_jit_direct = time.time() - t0

t0 = time.time()
J = tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(
    "/root/reference/instances/Chimera_droplet_instances/"
    "chimera2048_spinglass_power/001.txt")), 1 / 75)
ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
ins.precondition(mode="balancing")
ctx = ins._context()
res = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8,
                                Dmax=32)
t_flagship = time.time() - t0

import json
print(json.dumps(dict(
    t_import=round(t_import, 2), t_first_op=round(t_first_op, 2),
    t_tiny_jit=round(t_tiny_jit, 2), t_export=round(t_export, 2),
    t_deser_call=round(t_deser_call, 2),
    t_deser_call2=round(t_deser_call2, 2),
    t_jit_direct=round(t_jit_direct, 2),
    t_flagship_cold=round(t_flagship, 2),
    blob_bytes=len(blob))), flush=True)

import numpy as np
import tnax
import jax, jax.numpy as jnp
from tnax.search import ContractionContext
from tnax import bmps

print('backend:', jax.default_backend(), flush=True)
J = tnax.load_Jij('/root/reference/instances/Chimera_droplet_instances/chimera512_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1/75)
ins = tnax.Solver(mode='Ising', Nx=8, Ny=8, Nc=8, J=J, beta=3)
gz = np.load('/root/repo/diag_gauges.npz')
ctx = ContractionContext(ins.problem, 3.0, gauges={k: gz[k] for k in gz.files})
ref = jnp.asarray(np.load('/root/repo/diag_rhoT_cpu32.npz')['rhoT'], ctx.dtype)

def stats(name, x):
    x = np.asarray(x)
    print(f'{name}: max|.|={np.abs(x).max():.3e} n_nan={np.isnan(x).sum()} '
          f'n_inf={np.isinf(x).sum()}', flush=True)

ny = 6
start = bmps.MPS(A=ref[ny+1], lognorm=jnp.zeros((), ctx.dtype))
W = ctx.Wt[ny]
stats('input A', start.A); stats('W', W)
rc, _ = bmps.canonize_right(start)
stats('canonize_right A', rc.A)
z, disc = bmps.zipup_apply(rc, W, 64, conj=True, tol=1e-16/10)
stats('zipup A', z.A); print('zipup lognorm', float(z.lognorm), 'disc', float(disc), flush=True)
t, disc2 = bmps.canonize_right(z, compress=True, cap=32, tol=1e-16)
t = bmps.slice_bond(t, 32)
stats('truncated A', t.A)
v, overlap = bmps.variational_implicit(t, rc.A, W, conj=True, tol=32*1.2e-7, max_sweeps=20)
stats('variational A', v.A); print('overlap diag', float(overlap), flush=True)
num = bmps.mps_dot(ref[ny], v.A)
d1 = bmps.mps_dot(ref[ny], ref[ny]); d2 = bmps.mps_dot(v.A, v.A)
print('dot(ref,out)=%.6e dot(ref,ref)=%.6e dot(out,out)=%.6e' %
      (float(num), float(d1), float(d2)), flush=True)

import time
import tnax, jax
from tnax import parallel
print('backend:', jax.default_backend(), flush=True)
J = tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij('/root/reference/instances/Chimera_droplet_instances/chimera2048_spinglass_power/004.txt')), 1/75)
ins = tnax.Solver(mode='Ising', Nx=16, Ny=16, Nc=8, J=J, beta=3)
ins.precondition(mode='balancing')
ctx = ins._context()
t0=time.time()
r = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8, Dmax=48)
E = parallel.exact_energies(ctx, r['states'][None, :])[0]
print(f'device D=48 rot0: E={E:.6f} (oracle -3430.133333) {time.time()-t0:.1f}s', flush=True)

import time
import tnax, jax
from tnax import parallel
print('backend:', jax.default_backend(), flush=True)
J = tnax.load_Jij('/root/reference/instances/Chimera_droplet_instances/chimera2048_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1/75)
ins = tnax.Solver(mode='Ising', Nx=16, Ny=16, Nc=8, J=J, beta=3)
ins.precondition(mode='balancing')
for fused in (True, False):
    ctx = ins._context()
    for it in range(2):
        ctx.rhoT = None
        t0 = time.time()
        r = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8, Dmax=32, fused=fused)
        E = parallel.exact_energies(ctx, r['states'][None, :])[0]
        print(f'fused={fused} it{it}: {time.time()-t0:.1f}s E={E:.6f} (ref -3336.773333)', flush=True)

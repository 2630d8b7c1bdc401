import time, numpy as np
import tnax, jax
print('backend:', jax.default_backend(), flush=True)
J = tnax.load_Jij('/root/reference/instances/Chimera_droplet_instances/chimera512_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1/75)
for it in range(2):
    ins = tnax.Solver(mode='Ising', Nx=8, Ny=8, Nc=8, J=J, beta=3)
    ins.add_noise(amplitude=1e-7)
    ins.precondition(mode='balancing')
    t0 = time.time()
    ins.search_low_energy_spectrum(excitations_encoding=2, M=1024, relative_P_cutoff=1e-8, Dmax=32, max_dEng=1.0)
    t1 = time.time()
    ins.decode_low_energy_states(max_dEng=1.0)
    errs = np.max(np.abs(tnax.energy_Jij(J, ins.binary_states()) - ins.energy))
    print(f'it{it}: search={t1-t0:.1f}s nstates={len(ins.energy)} err={errs:.2e}', flush=True)
# host GS path timing too
ins = tnax.Solver(mode='Ising', Nx=8, Ny=8, Nc=8, J=J, beta=3)
ins.precondition(mode='balancing')
t0=time.time(); E = ins.search_ground_state(M=1024, relative_P_cutoff=1e-8, Dmax=32)
print('host GS L512: %.1fs E=%.4f' % (time.time()-t0, E[0]), flush=True)

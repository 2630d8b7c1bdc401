import time
import tnax, jax
print('backend:', jax.default_backend(), flush=True)
J = tnax.Jij_f2p(tnax.load_Jij('/root/reference/instances/Chimera_J124/C=16_J124/001.txt'))
best, deg = 1e9, 0
for rot in range(4):
    ins = tnax.Solver(mode='Ising', Nx=16, Ny=16, Nc=8, J=J, beta=0.75)
    if rot: ins.rotate_graph(rot=rot)
    ins.precondition(mode='balancing')
    t0 = time.time()
    E = ins.search_ground_state(M=4096, relative_P_cutoff=1e-8, Dmax=8)
    print(f'rot {rot}: E={E[0]} deg={ins.degeneracy} {time.time()-t0:.1f}s', flush=True)
    if E[0] < best - 1e-9: best, deg = E[0], ins.degeneracy
    elif abs(E[0]-best) < 1e-9: deg = max(deg, ins.degeneracy)
print(f'tnax C16#1 D=8 M=4096: E={best} deg={deg}', flush=True)
with open('/root/reference/instances/Chimera_J124/C=16_J124/results_C16_J124.txt') as f:
    for line in f:
        if line.split() and line.split()[0] == '1':
            print('oracle:', line.strip(), flush=True)
            break

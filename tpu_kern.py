import numpy as np
import tnax  # config
import jax, jax.numpy as jnp
print('backend:', jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
m, n = 1024, 512
U0, _ = np.linalg.qr(rng.standard_normal((m, n)))
V0, _ = np.linalg.qr(rng.standard_normal((n, n)))
for decay in [3, 8, 12]:
    s = np.logspace(0, -decay, n)
    A = (U0 * s) @ V0.T
    A32 = jnp.asarray(A, jnp.float32)
    U, S, Vh = jnp.linalg.svd(A32, full_matrices=False)
    U, S, Vh = map(np.asarray, (U, S, Vh))
    recon = np.linalg.norm((U * S) @ Vh - A) / np.linalg.norm(A)
    svalerr = np.max(np.abs(S - s) / np.maximum(s, 1e-12))[()]
    # leading-64 subspace alignment
    P = U[:, :64]
    align = np.linalg.norm(P.T @ U0[:, :64], 2)
    orthU = np.linalg.norm(U.T @ U - np.eye(n))
    Q, R = jnp.linalg.qr(A32)
    Q, R = np.asarray(Q), np.asarray(R)
    qr_recon = np.linalg.norm(Q @ R - A) / np.linalg.norm(A)
    qr_orth = np.linalg.norm(Q.T @ Q - np.eye(n))
    print(f'decay=1e-{decay}: svd recon={recon:.2e} maxsvalrel={svalerr:.2e} '
          f'orthU={orthU:.2e} align64={align:.6f} | qr recon={qr_recon:.2e} '
          f'orth={qr_orth:.2e}', flush=True)

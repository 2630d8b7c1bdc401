"""Global configuration for tnax.

tnax is a TPU-native reimplementation of the capabilities of marekrams/tnac4o
(reference: /root/reference). The reference is float64 NumPy throughout; on TPU
the native compute dtype is float32 (float64 matmul is emulated and slow, and
f64 QR/SVD is unsupported). tnax therefore splits precision concerns:

- *Energies* are always accumulated in float64 on the host (exact bookkeeping;
  reference: tnac4o/tnac4o.py:478 `_update_Eng`). Beam decisions that depend on
  energy ties (degeneracy counting at ``min_dEng``) are thus bit-stable.
- *Probabilities / tensor contractions* run in a configurable dtype:
  float64 on CPU (parity with the reference) and float32 on TPU by default.
  Any positive rescaling of environments cancels in the normalized conditional
  marginals, so f32 only perturbs which borderline branches survive the beam —
  the final energies remain exact.

Environment knobs (read once, before the first jax backend query):
  TNAX_PLATFORM   force a jax platform (e.g. "cpu"); this must go through
                  jax.config because the environment may pin JAX_PLATFORMS
                  to an accelerator plugin.
  TNAX_X64        "1"/"0" force-enable/disable float64 mode
                  (default: enabled on CPU, disabled on TPU).
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False
_X64 = False


def ensure_precision() -> None:
    """Apply platform + precision configuration (idempotent)."""
    global _INITIALIZED, _X64
    if _INITIALIZED:
        return
    platform = os.environ.get("TNAX_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no device available
        backend = "cpu"
    env = os.environ.get("TNAX_X64")
    if env is not None:
        _X64 = env not in ("0", "false", "False")
    else:
        _X64 = backend == "cpu"
    if _X64:
        jax.config.update("jax_enable_x64", True)
    else:
        # TPU matmuls default to bfloat16 inputs; the contraction path needs
        # full f32 mantissas (conditional probabilities are ratios spanning
        # many orders of magnitude). 3-pass f32 on the MXU is still fast.
        jax.config.update("jax_default_matmul_precision", "highest")
    if backend != "cpu" and os.environ.get("TNAX_COMPILE_CACHE", "1") != "0":
        # Persist compiled programs across processes. Measured behavior on
        # the tunneled 'axon' TPU backend (round 2): the cache DOES write
        # entries, but a fresh process's wall-clock "cold" time is
        # dominated by backend/tunnel initialization and remote-compile
        # service load (a trivial elementwise program showed 0.38 s
        # XLA compile inside a 95 s first dispatch; the same program in a
        # second process still paid ~90 s). Cold-start budgeting should
        # therefore batch all validations into one long-lived process;
        # in-process jit caching is what actually amortizes.
        cache_dir = os.environ.get("TNAX_COMPILE_CACHE_DIR",
                                   os.path.expanduser("~/.tnax_jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _INITIALIZED = True


def compute_dtype():
    """dtype used for tensor-network contractions (probability path)."""
    import jax.numpy as jnp

    ensure_precision()
    return jnp.float64 if _X64 else jnp.float32

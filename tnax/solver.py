"""Solver facade mirroring the reference public API.

``tnax.Solver`` (alias ``tnax.tnac4o``) exposes the same constructor and
methods as the reference class (reference `tnac4o/tnac4o.py:78-233`):
``search_ground_state``, ``gibbs_sampling``, ``search_low_energy_spectrum``,
``decode_low_energy_states``, ``precondition``, ``rotate_graph``,
``add_noise``, ``binary_states``, ``save`` / module-level ``load``, and the
result attributes (energy, probability, degeneracy, states,
discarded_probability, negative_probability, ...). A user of the reference
can switch imports and keep their scripts.
"""

from __future__ import annotations

import logging

import numpy as np

from . import search as _search
from . import config as _config
from .problems import IsingProblem, RMFProblem

logger = logging.getLogger("tnax")


class Solver:
    """Heuristic tensor-network solver for quasi-2D Ising / RMF problems.

    Args mirror the reference (`tnac4o/tnac4o.py:145-198`):
      mode: 'Ising' or 'RMF'.
      Nx, Ny, Nc: lattice shape (Nc spins per block, Ising only).
      beta: inverse temperature of the Gibbs PEPS.
      J: couplings — [[i, j, Jij], ...] for Ising, factor dict for RMF.
    """

    def __init__(self, mode="Ising", Nx=4, Ny=4, Nc=8, beta=1, J=None):
        _config.ensure_precision()
        self.mode = mode
        self.beta = beta
        self.Nx_model, self.Ny_model = Nx, Ny
        self.Nc = Nc if mode == "Ising" else 1
        self.L = Nx * Ny * self.Nc
        self.logger = logger
        self.rotation = 0
        self.order = np.arange(Nx * Ny)
        self.order_i = np.arange(Nx * Ny)
        self.energy = np.zeros(0)
        self.probability = np.zeros(0)
        self.degeneracy = 0
        self.states = np.zeros((0, Nx * Ny), dtype=np.int32)
        self.discarded_probability = 0.0
        self.negative_probability = 0.0
        # negativeness over branches within the cutoff window only — the
        # raw flag above keeps reference parity (tnac4o.py:131-137) but in
        # f32 saturates for tail branches below the compressed boundary's
        # noise floor; on the largest f32 workloads a within-window branch
        # can clamp too, so a saturated core flag means "cross-check in
        # f64" (tools/negp_probe.py), not "results are wrong"
        self.negative_probability_core = 0.0
        self.merge_overflow = 0
        self.count_max = 0
        self.problem = None
        self._gauges = None

        if J is not None:
            if mode == "Ising":
                self.problem = IsingProblem(Nx=Nx, Ny=Ny, Nc=Nc, J=J)
                self.J = self.problem.J
                self.J0 = self.problem.J.copy()
                self.ind0 = [[self.problem.ind[ny][nx] for nx in range(Nx)]
                             for ny in range(Ny)]
            elif mode == "RMF":
                self.problem = RMFProblem(Nx=Nx, Ny=Ny, J=J)
                self.J = self.problem.J
                self.ind0 = []
            else:
                raise ValueError(f"unknown mode {mode!r}")

    # -- geometry -----------------------------------------------------------
    @property
    def Nx(self):
        return self.problem.Nx if self.problem else self.Nx_model

    @property
    def Ny(self):
        return self.problem.Ny if self.problem else self.Ny_model

    def rotate_graph(self, rot=1):
        """Cumulative 90-degree rotations (reference
        `tnac4o/tnac4o.py:290-340`)."""
        for _ in range(rot):
            self.rotation = (self.rotation + 1) % 4
            order_i = self.problem.rotate()
            self.order = order_i[self.order]
        self.order_i[self.order] = np.arange(self.Nx * self.Ny)
        if self.mode == "Ising":
            self.J = self.problem.J
        self._gauges = None  # reference resets gauges via _divide_couplings

    def add_noise(self, amplitude=1e-7, rng=None):
        """Small random noise on couplings to lift accidental degeneracies
        (reference `tnac4o/tnac4o.py:917-941`). ``rng=None`` draws from
        the global legacy NumPy RNG exactly like the reference, so
        ``np.random.seed(s)`` makes the noise reproducible."""
        self.logger.info("Adding noise with amplitude %.2e", amplitude)
        self.problem.add_noise(amplitude, rng=rng)
        if self.mode == "Ising":
            self.J = self.problem.J
            self._gauges = None

    # -- contraction context ------------------------------------------------
    def _context(self):
        if self.problem is None:
            raise ValueError(
                "no couplings: construct the solver with J=... before "
                "searching/sampling (reference tnac4o.py:174)")
        ctx = _search.ContractionContext(self.problem, self.beta,
                                         gauges=self._gauges)
        self._gauges = ctx.gauges
        return ctx

    # -- solvers ------------------------------------------------------------
    def precondition(self, mode="balancing", steps=2, beta_cond=None,
                     Dmax_cond=None, max_scale=1024,
                     graduate_truncation=False, tolS=1e-16, tolV=1e-10,
                     max_sweeps=20, directions=("ud",), path=None):
        """Balancing preconditioner (reference `tnac4o/tnac4o.py:342-379`).

        ``max_sweeps`` is a speed knob on the D=8 ladder builds: 1 saves
        ~0.4 s per L2048 search but costs ~1-2 extra first-pass oracle
        misses per 100 droplet instances (measured round 2,
        results/droplet_L2048_ms1.jsonl — the escalation ladder still
        recovers them); 0 (zip-up only) measurably degrades the gauges
        (chimera-2048 instance 4 then misses at every rotation). The
        default keeps the reference's fully converged compression, the
        configuration behind the 900/900 conformance record.

        ``directions`` may include 'ud' and/or 'lr'; the reference runs only
        'ud' (its 'lr' call is commented out, `tnac4o/tnac4o.py:374-377`).
        ``path`` selects the 'ud' sweep implementation: 'device' (one jitted
        program over all interfaces — default on accelerators) or 'host'
        (NumPy sweeps, default on CPU); 'lr' always runs on host.
        """
        import jax as _jax
        from . import precondition as _pre
        if mode != "balancing":
            raise ValueError("only mode='balancing' is implemented")
        if path is None:
            path = "host" if _jax.default_backend() == "cpu" else "device"
        if not beta_cond:
            beta_cond = [self.beta * 2.0 ** (nn - steps) for nn in range(steps)]
        if not Dmax_cond:
            Dmax_cond = [8] * len(beta_cond)
        if self._gauges is None:
            from . import engine as _engine
            grid = _engine.pad_grid(self.problem)
            self._gauges = _engine.identity_gauges(grid)
        overlaps = []
        if path == "device" and tuple(directions) == ("ud",) \
                and len(set(Dmax_cond)) == 1:
            # the whole beta ladder as ONE device program (no host round
            # trips between rungs)
            self.logger.info("Preconditioning ladder (device): betas %s",
                             [round(b, 3) for b in beta_cond])
            self._gauges = _pre.precondition_ladder_device(
                self.problem, beta_cond, self._gauges, Dmax=Dmax_cond[0],
                graduate_truncation=graduate_truncation, tolS=tolS,
                tolV=tolV, max_sweeps=max_sweeps, max_scale=max_scale,
                overlaps_out=overlaps)
            self.overlaps_ud = np.vstack(overlaps) if overlaps else \
                np.empty((0, max(self.Ny - 1, 0)))
            return
        ud = _pre.balance_ud_device if path == "device" else _pre.balance_ud
        sweeps = {"ud": ud, "lr": _pre.balance_lr}
        for beta, D in zip(beta_cond, Dmax_cond):
            self.logger.info("Preconditioning with beta = %.2f", beta)
            for direction in directions:
                kw = dict(Dmax=D, graduate_truncation=graduate_truncation,
                          tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
                          max_scale=max_scale)
                if direction == "ud":
                    kw["overlaps_out"] = overlaps
                self._gauges = sweeps[direction](
                    self.problem, beta, self._gauges, **kw)
        # worst-case mixed overlaps per interface, one row pair per sweep
        # (reference `overlaps_ud`, tnac4o/tnac4o.py:1917)
        self.overlaps_ud = np.vstack(overlaps) if overlaps else \
            np.empty((0, max(self.Ny - 1, 0)))

    def search_ground_state(self, M=2 ** 10, relative_P_cutoff=1e-6,
                            min_dEng=1e-12, graduate_truncation=True,
                            Dmax=32, tolS=1e-16, tolV=1e-10, max_sweeps=20,
                            path="host"):
        """Branch-and-bound most-probable-state search (reference
        `tnac4o/tnac4o.py:381-551`). Returns the lowest energy found.

        path='host' (default) keeps the reference's exact float64 beam
        bookkeeping; path='device' runs the fully device-resident
        throughput search (`tnax.parallel.device_search_gs`) — the reported
        energy is recomputed exactly on the host, but degeneracy counting
        ties break at the compute dtype's precision (f32 on TPU)."""
        ctx = self._context()
        if path == "device":
            from . import parallel as _par
            r = _par.device_search_gs(
                ctx, M=M, relative_P_cutoff=relative_P_cutoff,
                min_dEng=min_dEng, Dmax=Dmax, tolS=tolS, tolV=tolV,
                max_sweeps=max_sweeps,
                graduate_truncation=graduate_truncation)
            states = r["states"][None, :]
            self.energy = _par.exact_energies(ctx, states)
            self.probability = np.array([r["prob"]])
            self.degeneracy = r["degeneracy"]
            self.states = states[:, self.order]
            self.discarded_probability = r["discarded_probability"]
            self.negative_probability = r["negative_probability"]
            self.negative_probability_core = r["negative_probability_core"]
            self.merge_overflow = r["merge_overflow"]
            self.count_max = r["count_max"]
            return self.energy
        res = _search.search_ground_state(
            ctx, M=M, relative_P_cutoff=relative_P_cutoff, min_dEng=min_dEng,
            Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
            graduate_truncation=graduate_truncation)
        self.energy = res.energy
        self.probability = res.probability
        self.degeneracy = res.degeneracy
        self.states = res.states[:, self.order]
        self.discarded_probability = res.discarded_probability
        self.negative_probability = res.negative_probability
        self.negative_probability_core = res.negative_probability_core
        self.count_max = res.count_max
        return self.energy

    def gibbs_sampling(self, M=2 ** 10, graduate_truncation=True, Dmax=32,
                       tolS=1e-15, tolV=1e-10, max_sweeps=20, seed=None,
                       path="host"):
        """Sample M configurations from the Gibbs distribution (reference
        `tnac4o/tnac4o.py:553-650`). Returns sampled energies.

        ``seed`` (new vs the reference, which uses the global NumPy RNG)
        makes sampling reproducible. path='device' draws on-device with
        `jax.random` (throughput mode; energies still exact float64)."""
        from . import sample as _sample
        import numpy as _np
        ctx = self._context()
        if path == "device":
            from . import parallel as _par
            r = _par.device_sample(ctx, M=M, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                   max_sweeps=max_sweeps,
                                   graduate_truncation=graduate_truncation,
                                   seed=seed or 0)
            self.energy = r["energy"]
            self.probability = _np.zeros(1)
            self.degeneracy = 0
            self.states = r["states"][:, self.order]
            self.discarded_probability = 0
            self.negative_probability = r["negative_probability"]
            return self.energy
        res = _sample.gibbs_sampling(
            ctx, M=M, Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
            graduate_truncation=graduate_truncation,
            rng=_np.random.default_rng(seed) if seed is not None else None)
        self.energy = res.energy
        self.probability = np.zeros(1)
        self.degeneracy = 0
        self.states = res.states[:, self.order]
        self.discarded_probability = 0
        self.negative_probability = res.negative_probability
        return self.energy

    def search_low_energy_spectrum(self, excitations_encoding=1, M=2 ** 10,
                                   relative_P_cutoff=1e-6, max_dEng=0.0,
                                   lim_hd=0, min_dEng=1e-12,
                                   graduate_truncation=True, Dmax=32,
                                   tolS=1e-16, tolV=1e-10, max_sweeps=20,
                                   path="host", cand_factor=8,
                                   auto_grow=True, zipup_rsvd=None):
        """Low-energy spectrum search recording droplet structure (reference
        `tnac4o/tnac4o.py:652-725`).

        path='host' keeps the reference's exact beam bookkeeping with
        per-site device calls; path='device' runs each lattice row as one
        device program emitting decision records that the host replays
        (throughput mode — branch selection resolves at the compute dtype's
        precision; recorded droplet energies stay exact float64;
        ``cand_factor`` bounds the per-site merge candidate set at
        cand_factor*M). If the post-cutoff candidate count ever exceeds the
        cap (dropping deep-tail droplet records), ``auto_grow=True``
        re-runs the search once with a cap sized from the measured maximum
        so the recorded droplet tree is complete — reference semantics
        merge the full post-cutoff set (`tnac4o/tnac4o.py:481-526`).
        ``self.merge_overflow`` reports the residual overflow (0 = the
        spectrum's droplet records are complete).

        ``zipup_rsvd=False`` pins the exact-SVD zip-up boundary build (the
        same exactness-escalation rung as the GS drivers — the randomized
        sketch perturbs f32 boundaries enough to anchor hair-trigger
        instances to a wrong ground state; see tools/RUNBOOK.md)."""
        from . import spectrum as _spec
        ctx = self._context()
        self.excitations_encoding = excitations_encoding
        fn = _spec.device_search_spectrum if path == "device" \
            else _spec.search_spectrum
        kw = dict(cand_factor=cand_factor) if path == "device" else {}
        res = fn(
            self, ctx, excitations_encoding, M=M,
            relative_P_cutoff=relative_P_cutoff, max_dEng=max_dEng,
            lim_hd=lim_hd, min_dEng=min_dEng, Dmax=Dmax, tolS=tolS, tolV=tolV,
            max_sweeps=max_sweeps, graduate_truncation=graduate_truncation,
            zipup_rsvd=zipup_rsvd, **kw)
        factor = cand_factor
        while path == "device" and auto_grow and res.merge_overflow \
                and factor < ctx.Np:
            # the rerun's counts can exceed the capped run's measurement
            # (different beam content), so grow with 2x margin, rounded up
            # to a power of two so grown caps repeat across instances and
            # hit the jit cache (the cap only ever gets larger — semantics
            # unchanged); cand_factor = Np is the full M*Np expansion,
            # which cannot overflow
            grown = 2 * max(-(-res.count_max // M), factor)
            factor = min(ctx.Np, 1 << (grown - 1).bit_length())
            self.logger.info(
                "merge candidate cap exceeded at %d sites; re-running with "
                "cand_factor=%d for a complete droplet tree",
                res.merge_overflow, factor)
            res = fn(self, ctx, excitations_encoding, M=M,
                     relative_P_cutoff=relative_P_cutoff, max_dEng=max_dEng,
                     lim_hd=lim_hd, min_dEng=min_dEng, Dmax=Dmax, tolS=tolS,
                     tolV=tolV, max_sweeps=max_sweeps,
                     graduate_truncation=graduate_truncation,
                     cand_factor=factor, zipup_rsvd=zipup_rsvd)
        self.energy = res.energy
        self.probability = res.probability
        self.degeneracy = res.degeneracy
        self.states = res.states[:, self.order]
        self.discarded_probability = res.discarded_probability
        self.negative_probability = res.negative_probability
        self.negative_probability_core = res.negative_probability_core
        self.merge_overflow = res.merge_overflow
        return self.energy

    def decode_low_energy_states(self, max_dEng=0.0, max_states=1024):
        """Expand the droplet tree into explicit low-energy states
        (reference `tnac4o/tnac4o.py:1360-1389`)."""
        from . import spectrum as _spec
        return _spec.decode_low_energy_states(self, max_dEng=max_dEng,
                                              max_states=max_states)

    # -- decode / io --------------------------------------------------------
    def binary_states(self, number=-1):
        """States as spin bit-strings: 1=up, 0=down, 2=inactive
        (reference `tnac4o/tnac4o.py:261-288`)."""
        ns = self.states.shape[0]
        ns = ns + number + 1 if number < 0 else min(number, ns)
        if self.mode == "Ising":
            return self.problem.decode_states(self.states[:ns], self.ind0,
                                              self.L) if self.problem else \
                _decode_from_ind0(self.states[:ns], self.ind0, self.L)
        return self.states[:ns]

    def save(self, file_name):
        """Persist results in the reference's .npy dict format
        (`tnac4o/tnac4o.py:200-233`) — files round-trip with the reference."""
        d = {
            "mode": self.mode, "rotation": self.rotation,
            "energy": self.energy, "probability": self.probability,
            "degeneracy": self.degeneracy, "states": self.states,
            "discarded_probability": self.discarded_probability,
            "negative_probability": self.negative_probability,
            "negative_probability_core": self.negative_probability_core,
            "Nx": self.Nx_model, "Ny": self.Ny_model, "Nc": self.Nc,
            "beta": self.beta,
        }
        if self.mode == "Ising":
            d["ind"] = self.ind0
        if hasattr(self, "excitations_encoding"):
            d["excitations_encoding"] = self.excitations_encoding
            d["d"] = self.d
            d["invd"] = self.invd
            d["el"] = self.el
            d["free_d"] = self.free_d
            if self.excitations_encoding > 1 and self.mode == "Ising":
                import scipy.sparse
                d["adj"] = scipy.sparse.csr_matrix(self.adj)
        np.save(file_name, d)

    # -- display ------------------------------------------------------------
    def show_properties(self):
        print("L:     ", self.L)
        print("Ny:    ", self.Ny)
        print("Nx:    ", self.Nx)
        print("Beta:  ", self.beta)

    def show_solution(self, state=False):
        if len(self.energy) > 0:
            print("Energy            : %4.6f" % self.energy[0])
            print("Degeneracy        : %2d" % self.degeneracy)
            print("log2(Probability) : %0.2e" % self.probability[0])
            print("Discarder log2(P) : %0.2e" % self.discarded_probability)
            print("Min P (err)       : %0.2e" % self.negative_probability)
            print("Min P (core)      : %0.2e"
                  % self.negative_probability_core)
            print("# of states       : %1d" % len(self.energy))
            print("Rotation/direction: %1d" % self.rotation)
            if state:
                print(self.states[0])
        else:
            print("No solution to show.")

    def exc_print(self):
        from . import spectrum as _spec
        _spec.exc_print(self)


def _decode_from_ind0(states, ind0, L):
    from .problems import block_bits
    ns = states.shape[0]
    out = np.full((ns, L), 2, dtype=np.int8)
    kk = -1
    for row in ind0:
        for act in row:
            kk += 1
            act = np.asarray(act)
            if act.size == 0:
                continue
            conf = 1 - block_bits(len(act))
            out[:, act] = conf[states[:ns, kk]]
    return out


def load(file_name):
    """Load a result saved by :meth:`Solver.save` (or by the reference's
    `save`) — reference `load` (`tnac4o/tnac4o.py:31-75`).

    .. warning::
        The on-disk format is a pickled dict inside ``.npy`` (required for
        byte-compatibility with files written by the reference), and
        unpickling executes arbitrary code — only load result files from a
        trusted source.
    """
    d = np.load(file_name, allow_pickle=True).item()
    ins = Solver(mode=d["mode"], Nx=d["Nx"], Ny=d["Ny"], Nc=d["Nc"],
                 beta=d["beta"])
    ins.energy = d["energy"]
    ins.probability = d["probability"]
    ins.degeneracy = d["degeneracy"]
    ins.states = d["states"]
    ins.discarded_probability = d["discarded_probability"]
    ins.negative_probability = d["negative_probability"]
    # absent in files written by the reference (raw flag only there)
    ins.negative_probability_core = d.get("negative_probability_core", 0.0)
    if d["mode"] == "Ising":
        ins.ind0 = d.get("ind")
    if "excitations_encoding" in d:
        ins.excitations_encoding = d["excitations_encoding"]
        ins.d = d["d"]
        ins.invd = d["invd"]
        ins.el = d["el"]
        ins.free_d = d["free_d"]
        if ins.excitations_encoding > 1:
            from . import spectrum as _spec
            adj = d.get("adj")
            _spec.reset_adjacency_from_saved(ins, adj)
    return ins


# reference-compatible alias
tnac4o = Solver

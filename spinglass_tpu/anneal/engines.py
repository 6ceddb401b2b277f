"""Sweep-engine abstraction shared by the SA and PT drivers.

An engine is a callable bundle with a declared spin LAYOUT:
  * "rn" — spins [R, N] (replica-major): the XLA reference engines.
  * "nr" — spins [N, R] (spin-major): the fused Pallas TPU engine, which keeps
    spins transposed so the kernel's sequential dimension walks sublanes.

The drivers keep annealing state in the engine's layout for the whole jitted
scan (no per-sweep transposes) and only convert at chunk boundaries.

Engine selection policy (make_engine):
  1. sweep_method="colored" or auto+small-coloring → colored XLA sweeps
     (k matmuls/sweep; ideal for grids and sparse graphs).
  2. otherwise on TPU → FusedSweep Pallas kernel (in-kernel RNG).
  3. otherwise → blocked XLA sweep (CPU/GPU fallback, host RNG).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.kernels import sweeps as sweep_kernels


class SweepEngine:
    """Base: sweep(spins, beta, key) -> (spins, dE[R], n_accepted[R]).

    Jit-boundary contract (round 4): an engine's device arrays must cross
    jit as ARGUMENTS, not closure constants — closure-captured arrays get
    embedded in the HLO, which measured 64 s vs 9 s compile for the dense
    headline program on the tunneled v5e (the J matrix et al. ride along
    with every compile and serialize into ~278 MB executables), and
    oversized N=8192 programs were rejected outright (HTTP 413).
    Drivers therefore do::

        ops = engine.operands()              # pytree of arrays (host, once)
        @jax.jit
        def step(state, ops):
            eng = engine.bind(ops)           # shallow copy, traced arrays
            ... eng.sweep(...)
        step(state, ops)

    ``operands()`` returns the engine's array pytree; ``bind(ops)`` returns
    a shallow copy whose arrays are the (traced) values from ``ops``.
    Structural data (offsets, shapes, configs) stays in the closure — it
    must remain static."""

    layout = "rn"
    name = "base"
    _operand_attrs: Tuple[str, ...] = ("problem",)

    def __init__(self, problem: IsingProblem):
        self.problem = problem

    def operands(self):
        return {a: getattr(self, a) for a in self._operand_attrs}

    def bind(self, ops):
        import copy

        eng = copy.copy(self)
        for a in self._operand_attrs:
            setattr(eng, a, ops[a])
        eng._rebind()
        return eng

    def _rebind(self) -> None:
        """Hook for subclasses whose sweep closures capture operand arrays
        (rebuild them from the now-bound attributes)."""


    def to_layout(self, spins_rn: jax.Array) -> jax.Array:
        return spins_rn.T if self.layout == "nr" else spins_rn

    def from_layout(self, spins: jax.Array) -> jax.Array:
        return spins.T if self.layout == "nr" else spins

    def energy(self, spins: jax.Array) -> jax.Array:
        """Exact energies in this engine's layout (sparse engines override
        to avoid any dense matmul)."""
        from spinglass_tpu.core import energy as energy_ops

        if self.layout == "nr":
            return energy_ops.energy_t(self.problem, spins)
        return energy_ops.energy(self.problem, spins)

    def sweep(self, spins, beta, key):
        raise NotImplementedError


def bind_call(raw_fn, problem, engine):
    """Jit ``raw_fn(state, prob, eng_ops)`` under the operands contract.

    Returns ``call(state)`` with ``call.raw`` (the unjitted body, for
    callers that scan several steps inside ONE outer jit — they must pass
    ``call.call_args`` as traced arguments there, or the arrays re-embed
    as constants) and ``call.call_args = (problem, eng_ops)``.

    When the engine's operands carry the problem pytree it must be the
    SAME object as ``problem`` — two diverging instances inside one traced
    body (env math vs sweep math) would be a silent correctness bug, so
    this fails loudly instead."""
    ops = (engine.operands() if engine is not None
           and hasattr(engine, "operands") else None)
    if isinstance(ops, dict):
        # sparse engines carry the instance under "ell"; the check only
        # applies when the caller's problem IS that EllProblem (an ell
        # DERIVED from a dense problem is legitimately a different object)
        anchor_key = ("problem" if "problem" in ops
                      else "ell" if "ell" in ops
                      and hasattr(problem, "idx") else None)
        if anchor_key is not None and ops[anchor_key] is not problem:
            raise ValueError(
                "engine was built for a different problem object than the "
                "one passed to bind_call — env math and sweep math would "
                "diverge")
    jitted = jax.jit(raw_fn)
    call_args = (problem, ops)

    def call(state):
        return jitted(state, *call_args)

    call.raw = raw_fn
    call.call_args = call_args
    return call


class ColoredEngine(SweepEngine):
    """Vectorized same-color simultaneous updates (exact for proper colorings)."""

    name = "colored"

    _operand_attrs = ("problem", "masks")

    def __init__(self, problem: IsingProblem, colors: np.ndarray,
                 rule: str = "metropolis"):
        super().__init__(problem)
        self.rule = rule
        self.n_colors = int(colors.max()) + 1 if colors.size else 1
        self.masks = sweep_kernels.color_masks_from_colors(
            colors, problem.n_padded)

    def sweep(self, spins, beta, key):
        uniforms = jax.random.uniform(key, spins.shape, jnp.float32)
        return sweep_kernels.colored_sweep(
            self.problem, self.masks, spins, beta, uniforms, rule=self.rule)


class BlockedXLAEngine(SweepEngine):
    """Exact sequential-equivalent blocked sweep, pure XLA (CPU fallback)."""

    name = "blocked"

    def __init__(self, problem: IsingProblem, block_size: int = 128,
                 rule: str = "metropolis"):
        super().__init__(problem)
        self.block_size = block_size
        self.rule = rule

    def sweep(self, spins, beta, key):
        uniforms = jax.random.uniform(key, spins.shape, jnp.float32)
        return sweep_kernels.blocked_sweep(
            self.problem, spins, beta, uniforms,
            block_size=self.block_size, rule=self.rule)


class PallasEngine(SweepEngine):
    """Fused whole-sweep Pallas TPU kernel, [N, R] layout, in-kernel RNG."""

    layout = "nr"
    name = "blocked_pallas"

    def __init__(self, problem: IsingProblem, block_size: int = 0,
                 rule: str = "metropolis", interpret: bool = False,
                 j_dtype: str = "float32"):
        super().__init__(problem)
        from spinglass_tpu.kernels.metropolis_pallas import FusedSweep

        if not block_size:
            # 256 measured fastest on v5e (full-f32 MXU passes stay hidden
            # behind the sequential VPU loop); fall back when it won't tile
            block_size = 256 if problem.n_padded % 256 == 0 else 128
        self.fused = FusedSweep(problem, block_size=block_size, rule=rule,
                                interpret=interpret,
                                j_dtype=jnp.dtype(j_dtype))

    def sweep(self, spins_t, beta, key):
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        return self.fused(spins_t, beta, seed)

    def operands(self):
        d = super().operands()
        d["fused"] = self.fused.operands()
        return d

    def bind(self, ops):
        eng = super().bind(ops)
        eng.fused = self.fused.bind(ops["fused"])
        return eng


# Engines whose traced program + operand shapes depend ONLY on problem
# shape/dtype and config — safe to share compiled solver executables
# across equal-trace-signature problems (jit_cache signature keying).
# "colored" is EXCLUDED: its mask count/shapes come from a greedy coloring
# of the problem CONTENT (two same-shape problems can dispatch to colored
# vs blocked, or color differently — an r5 suite failure caught exactly
# that: a cached blocked chunk received a colored engine's operands).
# Sparse engines never reach signature mode (EllProblem has no
# trace_signature — bucket layout is content-derived).
SIGNATURE_SHARED_ENGINES = frozenset({"blocked", "blocked_pallas"})


SPARSE_DENSITY_THRESHOLD = 0.05
SPARSE_MIN_SPINS = 2048


# r5: dropped 256 -> 128 with the single-call whole-sweep kernel (the T
# engine's default on TPU) — measured TTT at R=128: sparse_t 0.415 s
# median vs sparse_sorted 0.70 s on the committed provenance instance.
# R % 128 == 0 is also the single kernel's lane-alignment requirement.
SPARSE_T_MIN_REPLICAS = 128


def make_engine(problem: IsingProblem, *, sweep_method: str = "auto",
                update_rule: str = "metropolis", block_size: int = 0,
                use_pallas: str = "auto",
                max_colors: int = 8,
                j_dtype: str = "float32",
                r_hint: int = 0) -> SweepEngine:
    """Pick the sweep engine (replaces the reference's CUDA-vs-torch dispatch,
    annealing/gpu_annealer.py:199-234 / cuda_kernels.py:150-171).

    ``r_hint``: expected total replica count. For sparse problems on TPU with
    r_hint >= SPARSE_T_MIN_REPLICAS (128) the transposed SortedSparseTEngine
    is selected — since round 5 it runs the single-call whole-sweep Pallas
    kernel when [NS, R] fits VMEM (21.4 Gflips/s at [10k, R=1024] vs 10.3
    for the threshold path; ADR-0003 addendum). Narrow-replica runs keep
    the [R, N] SortedSparseEngine whose lane dimension is the spin axis."""
    from spinglass_tpu.kernels.sparse import EllProblem, SparseEngine
    from spinglass_tpu.kernels.sweeps import canonical_rule

    update_rule = canonical_rule(update_rule)

    from spinglass_tpu.kernels.sparse import (SortedSparseEngine,
                                              SortedSparseTEngine)

    def _sorted(p):
        if sweep_method == "sparse_t" or (
                sweep_method in ("auto", "sparse")
                and r_hint >= SPARSE_T_MIN_REPLICAS
                and jax.default_backend() == "tpu"):
            return SortedSparseTEngine(p, rule=update_rule)
        return SortedSparseEngine(p, rule=update_rule)

    if isinstance(problem, EllProblem):
        if sweep_method == "sparse_compact":
            return SparseEngine(problem, rule=update_rule)
        return _sorted(problem)
    if sweep_method == "sparse_compact":
        return SparseEngine(problem, rule=update_rule)
    if sweep_method in ("sparse", "sparse_t") or (
            sweep_method == "auto"
            and problem.n_spins >= SPARSE_MIN_SPINS
            and topology.density(
                np.asarray(problem.j)[: problem.n_spins, : problem.n_spins])
            < SPARSE_DENSITY_THRESHOLD):
        return _sorted(problem)
    if sweep_method in ("auto", "colored"):
        j_np = np.asarray(problem.j)[: problem.n_spins, : problem.n_spins]
        try:
            colors = topology.greedy_coloring(
                j_np, max_colors=max_colors if sweep_method == "auto" else 256)
            n_colors = int(colors.max()) + 1 if colors.size else 1
            if sweep_method == "colored" or n_colors <= max_colors:
                return ColoredEngine(problem, colors, rule=update_rule)
        except ValueError:
            if sweep_method == "colored":
                raise
    pallas_ok = (use_pallas == "always"
                 or (use_pallas == "auto" and jax.default_backend() == "tpu"))
    if pallas_ok:
        return PallasEngine(problem, block_size=block_size, rule=update_rule,
                            interpret=use_pallas == "always"
                            and jax.default_backend() != "tpu",
                            j_dtype=j_dtype)
    return BlockedXLAEngine(problem, block_size=block_size or 128,
                            rule=update_rule)

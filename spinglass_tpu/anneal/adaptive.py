"""Adaptive simulated annealing: restarts, reheating, population resampling.

Rebuilds the reference optimization layer's real algorithms
(optimization/adaptive_optimization.py:69-443 AdaptiveSimulatedAnnealing /
PopulationOptimizer; performance_optimizer.py:151-381 ParallelAnnealer's
adaptive schedule): stagnation-triggered reheats, best-restart injection, and
population resampling toward elite replicas — all expressed on the batched
replica axis instead of thread pools."""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dfield
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spinglass_tpu.anneal.result import AnnealResult
from spinglass_tpu.anneal.sa import (SAConfig, SAState, init_state,
                                     make_sweep_engine, run_chunk)
from spinglass_tpu.anneal.schedules import ScheduleConfig, ScheduleType
from spinglass_tpu.core.problem import IsingProblem, random_spins


@dataclass(frozen=True)
class AdaptiveSAConfig:
    base: SAConfig = dfield(default_factory=lambda: SAConfig(
        n_sweeps=2000, n_replicas=32,
        schedule=ScheduleConfig(ScheduleType.GEOMETRIC, initial_temp=5.0,
                                final_temp=0.01, alpha=0.995)))
    stagnation_chunks: int = 5       # chunks without improvement → intervene
    reheat_factor: float = 5.0       # temperature boost on stagnation
    restart_fraction: float = 0.25   # worst replicas re-randomized
    elite_fraction: float = 0.25     # resampling copies from elites
    max_interventions: int = 20


def adaptive_anneal(problem: IsingProblem,
                    cfg: Optional[AdaptiveSAConfig] = None,
                    key: Optional[jax.Array] = None) -> AnnealResult:
    cfg = cfg or AdaptiveSAConfig()
    sa = cfg.base
    engine = make_sweep_engine(problem, sa)
    state = init_state(problem, sa, engine, key)
    chunk = jax.jit(
        lambda st: run_chunk(problem, sa, engine, st, sa.record_interval))

    n_chunks = max(1, sa.n_sweeps // sa.record_interval)
    best_global = np.inf
    stagnant = 0
    interventions = 0
    e_hist, t_hist, a_hist = [], [], []
    t0 = time.perf_counter()
    for c in range(n_chunks):
        state, stats = chunk(state)
        be = float(stats["best_energy"])
        e_hist.append(be)
        t_hist.append(float(stats["temperature"]))
        a_hist.append(float(stats["acceptance"]))
        if be < best_global - 1e-9:
            best_global = be
            stagnant = 0
        else:
            stagnant += 1
        if (stagnant >= cfg.stagnation_chunks
                and interventions < cfg.max_interventions):
            state = _intervene(problem, sa, engine, cfg, state)
            stagnant = 0
            interventions += 1
    jax.block_until_ready(state.spins)
    total = time.perf_counter() - t0

    b = int(jnp.argmin(state.best_energy))
    # device-side row select (avoid the full [R, N] host pull; r5)
    best_row = np.asarray(engine.from_layout(state.best_spins)[b])
    sweeps = n_chunks * sa.record_interval
    return AnnealResult(
        best_spins=best_row[: problem.n_spins],
        best_energy=float(jnp.min(state.best_energy)),
        replica_best_energy=np.asarray(state.best_energy),
        energy_history=np.asarray(e_hist),
        mean_energy_history=np.asarray(e_hist),
        temperature_history=np.asarray(t_hist),
        acceptance_history=np.asarray(a_hist),
        n_sweeps=sweeps, n_replicas=sa.n_replicas, total_time=total,
        sweeps_per_second=sweeps / total,
        spin_flips_per_second=sweeps * sa.n_replicas * problem.n_spins / total,
        algorithm=f"adaptive_sa/{engine.name}",
        device=jax.default_backend(), seed=sa.seed,
        metadata={"interventions": interventions},
    )


def _intervene(problem, sa, engine, cfg, state: SAState) -> SAState:
    """Reheat + restart worst replicas from elites/random."""
    key, k1, k2 = jax.random.split(state.key, 3)
    r = sa.n_replicas
    order = jnp.argsort(state.best_energy)          # ascending: best first
    n_restart = max(1, int(cfg.restart_fraction * r))
    n_elite = max(1, int(cfg.elite_fraction * r))
    worst = order[-n_restart:]
    elites = order[:n_elite]

    spins_rn = engine.from_layout(state.spins)
    # half of restarts copy a random elite, half re-randomize
    elite_pick = elites[jax.random.randint(k1, (n_restart,), 0, n_elite)]
    fresh = random_spins(k2, (n_restart, problem.n_padded),
                         problem.active_mask)
    copy_mask = (jnp.arange(n_restart) % 2 == 0)[:, None]
    new_rows = jnp.where(copy_mask, spins_rn[elite_pick], fresh)
    spins_rn = spins_rn.at[worst].set(new_rows)

    from spinglass_tpu.core import energy as energy_ops

    spins = engine.to_layout(spins_rn)
    energy = (energy_ops.energy_t(problem, spins) if engine.layout == "nr"
              else energy_ops.energy(problem, spins))
    sched = state.sched.replace(
        temp=jnp.minimum(state.sched.temp * cfg.reheat_factor,
                         sa.schedule.initial_temp))
    return state.replace(spins=spins, energy=energy, sched=sched, key=key)

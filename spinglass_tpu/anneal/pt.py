"""Parallel tempering: lockstep replica-exchange Monte Carlo under jit.

Replaces the reference's thread-based ParallelTempering
(annealing/parallel_tempering.py:39-436) and its CUDA exchange kernel
(cuda_kernels.py:80-124). TPU-native design decisions:

* Replicas are a batched leading axis swept in lockstep (one jitted sweep for
  all R replicas) instead of a ThreadPoolExecutor per replica
  (parallel_tempering.py:191-203, GIL-bound).
* Exchanges swap **temperatures, not states**: each replica r carries a ladder
  slot; an accepted exchange permutes slots. Mathematically identical to the
  reference's O(N) spin-row swap (parallel_tempering.py:252-258) but moves only
  an int per replica — essential when replicas are sharded across chips (the
  multi-host version only exchanges the [R] slot/energy vectors, see
  spinglass_tpu/distributed/pt_sharded.py).
* Even/odd alternating nearest-neighbor pairing with the standard acceptance
  p = min(1, exp((beta_i - beta_j) (E_i - E_j))) (parallel_tempering.py:234-258).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from spinglass_tpu.anneal.engines import SweepEngine, make_engine
from spinglass_tpu.anneal.result import AnnealResult
from spinglass_tpu.core import energy as energy_ops
from spinglass_tpu.core.problem import IsingProblem, random_spins


@dataclass(frozen=True)
class PTConfig:
    """Static PT parameters (reference ParallelTemperingConfig,
    parallel_tempering.py:16-36)."""

    n_replicas: int = 8
    n_sweeps: int = 1000
    min_temp: float = 0.1
    max_temp: float = 10.0
    ladder: str = "geometric"          # geometric | linear | exponential
    exchange_interval: int = 10
    update_rule: str = "metropolis"
    sweep_method: str = "auto"
    block_size: int = 128
    use_pallas: str = "auto"
    record_interval: int = 50
    seed: int = 42


@struct.dataclass
class PTState:
    spins: jax.Array        # [R, Np]
    slot: jax.Array         # [R] i32 — ladder slot held by each replica
    energy: jax.Array       # [R] f32
    best_energy: jax.Array  # [R]
    best_spins: jax.Array   # [R, Np]
    key: jax.Array
    sweep: jax.Array        # i32
    exch_attempts: jax.Array  # [R-1] per-ladder-pair attempt counts
    exch_accepts: jax.Array   # [R-1]
    acc_rate: jax.Array     # [R]


def temperature_ladder(cfg: PTConfig) -> np.ndarray:
    """Sorted hot→cold temperature ladder (reference
    parallel_tempering.py:146-173). Slot 0 is the COLDEST."""
    r = cfg.n_replicas
    if cfg.ladder == "geometric":
        temps = np.geomspace(cfg.min_temp, cfg.max_temp, r)
    elif cfg.ladder == "linear":
        temps = np.linspace(cfg.min_temp, cfg.max_temp, r)
    elif cfg.ladder == "exponential":
        temps = cfg.min_temp * np.expm1(
            np.linspace(0, np.log(cfg.max_temp / cfg.min_temp + 1), r))
        temps = np.clip(temps + cfg.min_temp, cfg.min_temp, cfg.max_temp)
        temps[0], temps[-1] = cfg.min_temp, cfg.max_temp
    else:
        raise ValueError(cfg.ladder)
    return temps.astype(np.float32)


def _energy_in_layout(problem, engine, spins):
    if engine is not None:
        return engine.energy(spins)
    return energy_ops.energy(problem, spins)


def init_state(problem: IsingProblem, cfg: PTConfig,
               key: Optional[jax.Array] = None,
               engine: Optional[SweepEngine] = None) -> PTState:
    """State with spins stored in the engine's layout (rn when engine=None)."""
    if key is None:
        key = jax.random.key(cfg.seed)
    key, sub = jax.random.split(key)
    spins = random_spins(sub, (cfg.n_replicas, problem.n_padded),
                         problem.active_mask)
    if engine is not None:
        spins = engine.to_layout(spins)
    e = _energy_in_layout(problem, engine, spins)
    return PTState(
        spins=spins,
        slot=jnp.arange(cfg.n_replicas, dtype=jnp.int32),
        energy=e,
        best_energy=e,
        best_spins=spins,
        key=key,
        sweep=jnp.asarray(0, jnp.int32),
        exch_attempts=jnp.zeros((cfg.n_replicas - 1,), jnp.int32),
        exch_accepts=jnp.zeros((cfg.n_replicas - 1,), jnp.int32),
        acc_rate=jnp.zeros((cfg.n_replicas,), jnp.float32),
    )


def exchange_step(state: PTState, betas_ladder: jax.Array, parity: jax.Array,
                  key: jax.Array) -> PTState:
    """One even/odd nearest-neighbor exchange pass, fully vectorized.

    Works on ladder-sorted views: inv[k] = replica currently holding slot k.
    Acceptance p = min(1, exp((beta_k - beta_{k+1})(E_k - E_{k+1}))).
    """
    r = state.slot.shape[0]
    inv = jnp.argsort(state.slot)                   # [R] replica at slot k
    e_sorted = state.energy[inv]                    # [R]
    k_idx = jnp.arange(r - 1)
    delta_beta = betas_ladder[:-1] - betas_ladder[1:]
    delta_e = e_sorted[:-1] - e_sorted[1:]
    log_p = delta_beta * delta_e
    u = jax.random.uniform(key, (r - 1,))
    eligible = (k_idx % 2) == parity
    accept = eligible & (jnp.log(jnp.maximum(u, 1e-38)) < log_p)

    # Build slot permutation: slot k moves to k+1 if pair (k,k+1) accepted, etc.
    accept_pad = jnp.concatenate([accept, jnp.zeros((1,), bool)])      # [R]
    accept_prev = jnp.concatenate([jnp.zeros((1,), bool), accept])     # [R]
    pos = jnp.arange(r)
    new_pos = jnp.where(accept_pad, pos + 1, jnp.where(accept_prev, pos - 1, pos))
    slot = state.slot.at[inv].set(new_pos.astype(jnp.int32))

    return state.replace(
        slot=slot,
        exch_attempts=state.exch_attempts + eligible.astype(jnp.int32),
        exch_accepts=state.exch_accepts + accept.astype(jnp.int32),
    )


def make_pt_step(problem: IsingProblem, cfg: PTConfig
                 ) -> Tuple[Callable, jax.Array, SweepEngine]:
    """Build the jittable PT super-step: `exchange_interval` sweeps + one
    exchange pass. Returns (step_fn, betas_ladder, engine)."""
    engine = make_engine(problem, sweep_method=cfg.sweep_method,
                         update_rule=cfg.update_rule,
                         block_size=cfg.block_size, use_pallas=cfg.use_pallas)
    betas_ladder = jnp.asarray(1.0 / temperature_ladder(cfg))

    def super_step(state: PTState, _):
        def one_sweep(st: PTState, _):
            key, ku = jax.random.split(st.key)
            beta = betas_ladder[st.slot]
            spins, de, cnt = engine.sweep(st.spins, beta, ku)
            energy = st.energy + de
            improved = energy < st.best_energy
            imp_b = (improved[None, :] if engine.layout == "nr"
                     else improved[:, None])
            return st.replace(
                spins=spins,
                energy=energy,
                best_energy=jnp.where(improved, energy, st.best_energy),
                best_spins=jnp.where(imp_b, spins, st.best_spins),
                key=key,
                sweep=st.sweep + 1,
                acc_rate=cnt.astype(jnp.float32) / problem.n_spins,
            ), None

        state, _ = lax.scan(one_sweep, state, None, length=cfg.exchange_interval)
        key, kx = jax.random.split(state.key)
        state = state.replace(key=key)
        parity = (state.sweep // cfg.exchange_interval) % 2
        state = exchange_step(state, betas_ladder, parity, kx)
        # resync exact energies once per super-step (f32 drift hygiene)
        state = state.replace(
            energy=_energy_in_layout(problem, engine, state.spins))
        stats = {
            "best_energy": jnp.min(state.best_energy),
            "cold_energy": state.energy[jnp.argmin(state.slot)],
            "mean_acceptance": jnp.mean(state.acc_rate),
        }
        return state, stats

    return super_step, betas_ladder, engine


def run(problem: IsingProblem, cfg: Optional[PTConfig] = None,
        key: Optional[jax.Array] = None) -> AnnealResult:
    """Full PT run (reference parallel_tempering.py:82-143)."""
    cfg = cfg or PTConfig()
    n_super = max(1, cfg.n_sweeps // cfg.exchange_interval)

    def _build():
        super_step, betas_ladder, engine = make_pt_step(problem, cfg)

        @jax.jit
        def run_all(state):
            return lax.scan(super_step, state, None, length=n_super)

        return run_all, betas_ladder, engine

    # reuse the compiled executable across run() calls for the same problem
    # object + config (otherwise every call re-traces and re-compiles)
    from spinglass_tpu.anneal.jit_cache import pt_cache

    run_all, betas_ladder, engine = pt_cache().get_or_build(
        problem, cfg, _build)

    state = init_state(problem, cfg, key, engine)
    t0 = time.perf_counter()
    state, hist = run_all(state)
    jax.block_until_ready(state.spins)
    total = time.perf_counter() - t0

    state = state.replace(spins=engine.from_layout(state.spins),
                          best_spins=engine.from_layout(state.best_spins))
    sweeps_done = n_super * cfg.exchange_interval
    best_r = int(jnp.argmin(state.best_energy))
    attempts = np.maximum(np.asarray(state.exch_attempts), 1)
    exchange_rates = np.asarray(state.exch_accepts) / attempts
    flips = sweeps_done * cfg.n_replicas * problem.n_spins
    return AnnealResult(
        best_spins=np.asarray(state.best_spins[best_r])[: problem.n_spins],
        best_energy=float(jnp.min(state.best_energy)),
        replica_best_energy=np.asarray(state.best_energy),
        energy_history=np.asarray(hist["best_energy"]),
        mean_energy_history=np.asarray(hist["cold_energy"]),
        temperature_history=np.asarray(
            jnp.broadcast_to(1.0 / betas_ladder[0], (n_super,))),
        acceptance_history=np.asarray(hist["mean_acceptance"]),
        n_sweeps=sweeps_done,
        n_replicas=cfg.n_replicas,
        total_time=total,
        sweeps_per_second=sweeps_done / total if total > 0 else 0.0,
        spin_flips_per_second=flips / total if total > 0 else 0.0,
        algorithm=f"pt/{cfg.update_rule}",
        device=jax.default_backend(),
        seed=cfg.seed,
        metadata={
            "ladder": np.asarray(1.0 / betas_ladder).tolist(),
            "exchange_rates": exchange_rates.tolist(),
            "exchange_interval": cfg.exchange_interval,
        },
    )


def exchange_rate_summary(result: AnnealResult) -> dict:
    """Exchange statistics (reference parallel_tempering.py:315-321, 412-428)."""
    rates = np.asarray(result.metadata.get("exchange_rates", []))
    return {
        "mean_exchange_rate": float(rates.mean()) if rates.size else 0.0,
        "min_exchange_rate": float(rates.min()) if rates.size else 0.0,
        "per_pair": rates.tolist(),
    }

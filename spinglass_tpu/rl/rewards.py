"""Composable reward shaping for the annealer environment.

Rebuilds the reference's RewardComponent stack
(rl_integration/reward_shaping.py:14-443) as pure functions with a carried
normalization state: energy-delta with adaptive normalization (:59-93),
acceptance-rate targeting 0.44 (:96-120), convergence bonus (:190-216),
exploration bonus, efficiency penalty (:220-248), combined with clipping and
EMA smoothing (:253-443)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct


@dataclass(frozen=True)
class RewardConfig:
    """Weights + shaping knobs (reference RewardConfig,
    reward_shaping.py:14-43)."""

    energy_weight: float = 1.0
    acceptance_weight: float = 0.2
    convergence_weight: float = 0.5
    efficiency_weight: float = 0.05
    target_acceptance: float = 0.44
    clip: float = 10.0
    smoothing: float = 0.0               # EMA on the final reward (0 = off)
    norm_decay: float = 0.99             # adaptive |dE| normalization EMA


@struct.dataclass
class RewardState:
    de_scale: jax.Array       # [B] EMA of |dE| for adaptive normalization
    reward_ema: jax.Array     # [B]


def init_state(cfg: RewardConfig, n_envs: int) -> RewardState:
    return RewardState(
        de_scale=jnp.ones((n_envs,), jnp.float32),
        reward_ema=jnp.zeros((n_envs,), jnp.float32),
    )


def compute(cfg: RewardConfig, state: RewardState, *, energy, prev_energy,
            best_energy, initial_energy, acc_rate, temp, step, max_steps,
            improved):
    """Returns (reward [B], new RewardState)."""
    de = prev_energy - energy  # positive = improvement
    scale = cfg.norm_decay * state.de_scale + (1 - cfg.norm_decay) * jnp.abs(de)
    scale = jnp.maximum(scale, 1e-6)
    r_energy = de / scale

    r_accept = -jnp.abs(acc_rate - cfg.target_acceptance)

    r_converge = jnp.where(improved, 1.0, 0.0) * (
        step.astype(jnp.float32) / max_steps)

    r_eff = -step.astype(jnp.float32) / max_steps

    reward = (cfg.energy_weight * r_energy
              + cfg.acceptance_weight * r_accept
              + cfg.convergence_weight * r_converge
              + cfg.efficiency_weight * r_eff)
    reward = jnp.clip(reward, -cfg.clip, cfg.clip)
    if cfg.smoothing > 0:
        reward_ema = (cfg.smoothing * state.reward_ema
                      + (1 - cfg.smoothing) * reward)
        reward = reward_ema
    else:
        reward_ema = reward
    return reward, RewardState(de_scale=scale, reward_ema=reward_ema)

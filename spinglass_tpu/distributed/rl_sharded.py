"""Data-parallel PPO over a device mesh: env batch sharded, params replicated.

The reference has no multi-device RL (its DQN trains on one device,
hybrid_agent.py:54-99; SURVEY §2.6 row 'DP/TP/PP/...' concludes plain
data-parallel sharding of the learner is the required capability). Here the
vectorized annealer-env's batch axis shards over the mesh; the PPO update is
the same jitted function — GSPMD partitions the rollout (per-device env
shards, no communication) and inserts the gradient all-reduce over ICI."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.rl import env as env_mod
from spinglass_tpu.rl import ppo as ppo_mod
from spinglass_tpu.rl.env import EnvConfig


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_train_state(state: ppo_mod.TrainState, mesh: Mesh,
                      axis: str = "batch") -> ppo_mod.TrainState:
    """Place a PPO TrainState on the mesh: env fields batch-sharded, learner
    state replicated."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    def shard_env_leaf(x):
        if x.ndim == 0:
            return jax.device_put(x, ns())
        spec = (axis,) + (None,) * (x.ndim - 1)
        return jax.device_put(x, ns(*spec))

    env_state = jax.tree.map(shard_env_leaf, state.env_state)
    # RewardState leaves are [B] — covered by shard_env_leaf; key is scalar-ish
    env_state = env_state.replace(
        reward_state=jax.tree.map(shard_env_leaf, state.env_state.reward_state))
    return state.replace(
        params=jax.device_put(state.params, ns()),
        opt_state=jax.device_put(state.opt_state, ns()),
        env_state=env_state,
        obs=jax.device_put(state.obs, ns(axis, None)),
        key=jax.device_put(state.key, ns()),
        update=jax.device_put(state.update, ns()),
    )


def make_sharded_ppo(problem: IsingProblem, env_cfg: EnvConfig,
                     cfg: Optional[ppo_mod.PPOConfig] = None,
                     mesh: Optional[Mesh] = None, axis: str = "batch"):
    """Returns (init_fn, update_fn, model, mesh). n_envs must divide the
    device count."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if env_cfg.n_envs % n_dev != 0:
        raise ValueError(f"n_envs={env_cfg.n_envs} not divisible by "
                         f"{n_dev} devices")
    base_init, update_fn, model = ppo_mod.make_ppo(problem, env_cfg, cfg)

    def init_fn(key=None) -> ppo_mod.TrainState:
        return shard_train_state(base_init(key), mesh, axis)

    return init_fn, update_fn, model, mesh

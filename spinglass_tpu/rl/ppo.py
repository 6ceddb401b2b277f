"""PPO controller over the vectorized annealer environment.

The BASELINE.json north star names a PPO-style controller (the reference's
README promises PPOController but ships none — SURVEY header; its real agent
is the DQN hybrid, kept in rl/dqn.py as the baseline variant). This is an
on-device actor-learner: rollouts are a jitted lax.scan over the batched env,
GAE + clipped-surrogate updates run in the same jit, and the whole train step
is data-parallel shardable (params replicated, env batch sharded — see
distributed/rl_sharded.py)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct
from jax import lax

from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.rl import env as env_mod
from spinglass_tpu.rl.env import EnvConfig, EnvState


@dataclass(frozen=True)
class PPOConfig:
    hidden_sizes: Tuple[int, ...] = (128, 128)
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    rollout_len: int = 16
    n_epochs: int = 4
    n_minibatches: int = 4
    max_grad_norm: float = 0.5
    n_updates: int = 50
    seed: int = 0


class ActorCritic(nn.Module):
    """MLP trunk + categorical policy + value head."""

    n_actions: int
    hidden_sizes: Tuple[int, ...] = (128, 128)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden_sizes:
            x = nn.tanh(nn.Dense(h)(x))
        logits = nn.Dense(self.n_actions)(x)
        value = nn.Dense(1)(x)[..., 0]
        return logits, value


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    env_state: EnvState
    obs: jax.Array
    key: jax.Array
    update: jax.Array


def make_ppo(problem: IsingProblem, env_cfg: EnvConfig,
             cfg: Optional[PPOConfig] = None):
    """Returns (init_fn, update_fn, model). update_fn is one fully-jitted
    PPO iteration: rollout + GAE + clipped updates."""
    cfg = cfg or PPOConfig()
    model = ActorCritic(n_actions=env_mod.N_ACTIONS,
                        hidden_sizes=cfg.hidden_sizes)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))

    def init_fn(key: Optional[jax.Array] = None) -> TrainState:
        key = key if key is not None else jax.random.key(cfg.seed)
        key, k_env, k_par = jax.random.split(key, 3)
        env_state, obs = env_mod.reset(problem, env_cfg, k_env)
        params = model.init(k_par, obs)
        return TrainState(params=params, opt_state=tx.init(params),
                          env_state=env_state, obs=obs, key=key,
                          update=jnp.asarray(0, jnp.int32))

    def rollout(state: TrainState):
        def step_fn(carry, _):
            env_state, obs, key = carry
            key, k_act, k_env, k_reset = jax.random.split(key, 4)
            logits, value = model.apply(state.params, obs)
            action = jax.random.categorical(k_act, logits)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(env_cfg.n_envs), action]
            env_state, next_obs, reward, done = env_mod.step(
                problem, env_cfg, env_state, action, k_env)
            env_state, next_obs = env_mod.auto_reset(
                problem, env_cfg, env_state, k_reset)
            traj = dict(obs=obs, action=action, logp=logp, value=value,
                        reward=reward, done=done)
            return (env_state, next_obs, key), traj

        (env_state, obs, key), traj = lax.scan(
            step_fn, (state.env_state, state.obs, state.key), None,
            length=cfg.rollout_len)
        _, last_value = model.apply(state.params, obs)
        return state.replace(env_state=env_state, obs=obs, key=key), traj, last_value

    def gae(traj, last_value):
        """Generalized advantage estimation over the [T, B] rollout."""
        def scan_fn(carry, x):
            adv_next, v_next = carry
            reward, value, done = x
            nonterm = 1.0 - done.astype(jnp.float32)
            delta = reward + cfg.gamma * v_next * nonterm - value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterm * adv_next
            return (adv, value), adv

        (_, _), advs = lax.scan(
            scan_fn, (jnp.zeros_like(last_value), last_value),
            (traj["reward"], traj["value"], traj["done"]), reverse=True)
        returns = advs + traj["value"]
        return advs, returns

    def loss_fn(params, batch):
        logits, value = model.apply(params, batch["obs"])
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(
            logp_all, batch["action"][..., None], axis=-1)[..., 0]
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        value_loss = jnp.mean((value - batch["ret"]) ** 2)
        entropy = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
        loss = (policy_loss + cfg.value_coef * value_loss
                - cfg.entropy_coef * entropy)
        return loss, dict(policy_loss=policy_loss, value_loss=value_loss,
                          entropy=entropy)

    @jax.jit
    def update_fn(state: TrainState):
        state, traj, last_value = rollout(state)
        advs, rets = gae(traj, last_value)
        t, b = advs.shape
        flat = dict(
            obs=traj["obs"].reshape(t * b, -1),
            action=traj["action"].reshape(t * b),
            logp=traj["logp"].reshape(t * b),
            adv=advs.reshape(t * b),
            ret=rets.reshape(t * b),
        )

        def epoch_fn(carry, key_ep):
            params, opt_state = carry
            perm = jax.random.permutation(key_ep, t * b)
            mbs = cfg.n_minibatches
            mb_idx = perm.reshape(mbs, (t * b) // mbs)

            def mb_fn(carry, idx):
                params, opt_state = carry
                batch = jax.tree.map(lambda x: x[idx], flat)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = lax.scan(mb_fn, (params, opt_state),
                                                mb_idx)
            return (params, opt_state), aux

        key, k_ep = jax.random.split(state.key)
        ep_keys = jax.random.split(k_ep, cfg.n_epochs)
        (params, opt_state), aux = lax.scan(
            epoch_fn, (state.params, state.opt_state), ep_keys)
        metrics = dict(
            mean_reward=jnp.mean(traj["reward"]),
            mean_best_energy=jnp.mean(state.env_state.best_energy),
            policy_loss=jnp.mean(aux["policy_loss"]),
            value_loss=jnp.mean(aux["value_loss"]),
            entropy=jnp.mean(aux["entropy"]),
        )
        state = state.replace(params=params, opt_state=opt_state, key=key,
                              update=state.update + 1)
        return state, metrics

    return init_fn, update_fn, model


def train(problem: IsingProblem, env_cfg: Optional[EnvConfig] = None,
          cfg: Optional[PPOConfig] = None, verbose: bool = False) -> dict:
    """Full training loop; returns params + per-update metric history."""
    env_cfg = env_cfg or EnvConfig()
    cfg = cfg or PPOConfig()
    init_fn, update_fn, model = make_ppo(problem, env_cfg, cfg)
    state = init_fn()
    history = []
    t0 = time.perf_counter()
    t_warm = t0
    for u in range(cfg.n_updates):
        state, metrics = update_fn(state)
        history.append({k: float(v) for k, v in metrics.items()})
        if u == 0:
            t_warm = time.perf_counter()  # first update carries the compile
        if verbose and (u % 10 == 0 or u == cfg.n_updates - 1):
            print(f"update {u}: {history[-1]}")
    total = time.perf_counter() - t0
    steady = time.perf_counter() - t_warm
    env_steps = cfg.n_updates * cfg.rollout_len * env_cfg.n_envs
    steady_steps = max(cfg.n_updates - 1, 1) * cfg.rollout_len * env_cfg.n_envs
    return {
        "params": state.params,
        "history": history,
        # steady-state rate (first update's compile excluded)
        "env_steps_per_second": steady_steps / steady if steady > 0 else 0.0,
        "env_steps_per_second_incl_compile": env_steps / total
        if total > 0 else 0.0,
        "total_time": total,
        "final_mean_best_energy": history[-1]["mean_best_energy"],
    }

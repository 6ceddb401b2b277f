"""Controller evaluation: does the trained RL policy actually help?

Closes the BASELINE.md north star "RL learning curve within seed variance"
(BASELINE.md:30-31) with a measured artifact instead of a smoke test: the
trained PPO controller is rolled out against two schedule baselines at an
EQUAL total sweep budget —

  * random policy  — uniform over the temperature-multiplier ladder (a
    zero-drift random walk in log T, so it hovers near the initial
    temperature and anneals poorly);
  * fixed geometric — the constant multiplier whose per-step ratio best
    matches a geometric schedule from the initial temperature to
    ``target_temp`` over the episode (the reference's default GEOMETRIC
    schedule, temperature_scheduler.py:116-129, expressed as an env action);

and the per-seed mean best energies are compared with the Welch t-test
machinery from research/validation.py (the reference's
StatisticalAnalyzer capability, experimental_validation.py:210).

Every rollout is a single jitted lax.scan over env steps (no auto-reset:
fixed episode length == equal sweep budget for every controller).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.rl import env as env_mod
from spinglass_tpu.rl.env import N_ACTIONS, TEMP_MULTIPLIERS, EnvConfig


def make_random_policy():
    """Uniform over the discrete temperature-multiplier ladder."""

    def policy(obs, key):
        return jax.random.randint(key, (obs.shape[0],), 0, N_ACTIONS,
                                  dtype=jnp.int32)

    return policy


def geometric_action_index(env_cfg: EnvConfig, target_temp: float,
                           n_steps: Optional[int] = None) -> int:
    """The ladder index whose multiplier best matches the per-step ratio of
    a geometric schedule initial_temp -> target_temp over n_steps."""
    n = n_steps or env_cfg.max_steps
    t0 = env_cfg.initial_temp
    if env_cfg.init_temp_range is not None:
        lo, hi = env_cfg.init_temp_range
        t0 = float(np.sqrt(lo * hi))  # geometric-mean start: the best a
        # FIXED schedule can do against a log-uniform randomized start
    ratio = (target_temp / t0) ** (1.0 / max(n, 1))
    return int(np.argmin(np.abs(np.asarray(TEMP_MULTIPLIERS) - ratio)))


def make_geometric_policy(env_cfg: EnvConfig, target_temp: float = 0.05,
                          n_steps: Optional[int] = None):
    """Constant-action policy implementing the geometric baseline."""
    idx = geometric_action_index(env_cfg, target_temp, n_steps)

    def policy(obs, key):
        return jnp.full((obs.shape[0],), idx, jnp.int32)

    return policy


def make_ppo_policy(model, params, greedy: bool = True):
    """Policy closure over trained ActorCritic params (discrete mode)."""

    def policy(obs, key):
        dist, _ = model.apply(params, obs)
        logits = dist["logits"] if isinstance(dist, dict) else dist
        if greedy:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    return policy


def rollout_best_energy(problem: IsingProblem, env_cfg: EnvConfig,
                        policy: Callable, key: jax.Array,
                        engine=None, n_steps: Optional[int] = None
                        ) -> jax.Array:
    """One fixed-length episode batch; returns best energy per env [B].

    No auto-reset and no plateau early-exit shortcut: every controller gets
    exactly n_steps * sweeps_per_step sweeps — equal budget."""
    n = n_steps or env_cfg.max_steps

    @jax.jit
    def run(key):
        k_reset, k_run = jax.random.split(key)
        state, obs = env_mod.reset(problem, env_cfg, k_reset, engine)

        def step_fn(carry, k):
            state, obs = carry
            k_act, k_env = jax.random.split(k)
            action = policy(obs, k_act)
            state, obs, _, _ = env_mod.step(problem, env_cfg, state, action,
                                            k_env, engine)
            return (state, obs), None

        (state, _), _ = lax.scan(step_fn, (state, obs),
                                 jax.random.split(k_run, n))
        return state.best_energy

    return run(key)


def evaluate_controllers(problem: IsingProblem, env_cfg: EnvConfig,
                         policies: dict, n_seeds: int = 5, seed: int = 0,
                         engine=None, n_steps: Optional[int] = None) -> dict:
    """Rollout each named policy over ``n_seeds`` seeds at equal budget.

    Returns {name: [n_seeds] per-seed mean best energy} plus Welch-t
    comparisons of every baseline against the first-listed policy."""
    from spinglass_tpu.research import validation as val

    results = {}
    for name, policy in policies.items():
        per_seed = []
        for s in range(n_seeds):
            e = rollout_best_energy(problem, env_cfg, policy,
                                    jax.random.key(seed + 1000 * s + hash(name) % 97),
                                    engine=engine, n_steps=n_steps)
            per_seed.append(float(jnp.mean(e)))
        results[name] = np.asarray(per_seed)

    names = list(policies)
    report = {"mean_best_energy": {k: float(v.mean())
                                   for k, v in results.items()},
              "per_seed": {k: v.tolist() for k, v in results.items()}}
    first = names[0]
    for other in names[1:]:
        t = val.welch_t(results[first], results[other])
        t["first_better"] = bool(results[first].mean()
                                 < results[other].mean())
        report[f"{first}_vs_{other}"] = t
    return report, results


def learning_report(problem: IsingProblem, env_cfg: Optional[EnvConfig] = None,
                    ppo_cfg=None, n_seeds: int = 5,
                    target_temp: float = 0.05, engine="auto",
                    verbose: bool = False) -> dict:
    """Train PPO, then compare trained vs geometric vs random controllers.

    The returned dict carries per-seed energies, Welch-t p-values, and the
    training throughput (env_steps_per_second) — the full proof artifact for
    the BASELINE.md RL north star."""
    from spinglass_tpu.rl import ppo as ppo_mod

    env_cfg = env_cfg or EnvConfig()
    if engine == "auto":
        engine = env_mod.default_engine(problem, env_cfg)
    out = ppo_mod.train(problem, env_cfg, ppo_cfg, verbose=verbose,
                        engine=engine)
    model = ppo_mod.ActorCritic(
        action_mode=env_cfg.action_mode, n_actions=N_ACTIONS,
        hidden_sizes=(ppo_cfg.hidden_sizes if ppo_cfg is not None
                      else ppo_mod.PPOConfig().hidden_sizes))
    policies = {
        "trained_ppo": make_ppo_policy(model, out["params"]),
        "geometric": make_geometric_policy(env_cfg, target_temp),
        "random": make_random_policy(),
    }
    report, results = evaluate_controllers(problem, env_cfg, policies,
                                           n_seeds=n_seeds, engine=engine)
    report["env_steps_per_second"] = out["env_steps_per_second"]
    report["n_updates"] = len(out["history"])
    report["learning_curve"] = [h["mean_best_energy"] for h in out["history"]]
    return report

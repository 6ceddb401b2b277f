"""RL training pipeline: curriculum, evaluation, checkpointing.

Rebuilds the reference's RLTrainingPipeline (rl_integration/
training_pipeline.py:136-584 — which ships with broken imports and cannot
run; treated as design intent per SURVEY §2.5): episode loop with
curriculum over problem difficulty, periodic evaluation, JSON metrics and
checkpoint cadence. The learner is PPO (rl/ppo.py) by default, DQN-hybrid
(rl/dqn.py) as the baseline variant."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field as dfield
from typing import Callable, Optional

import jax
import numpy as np

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.rl import dqn as dqn_mod
from spinglass_tpu.rl import ppo as ppo_mod
from spinglass_tpu.rl.env import EnvConfig


@dataclass(frozen=True)
class TrainingConfig:
    """Reference TrainingConfig (training_pipeline.py:25-63)."""

    agent: str = "ppo"                    # ppo | dqn
    n_updates: int = 100
    eval_interval: int = 20
    checkpoint_interval: int = 50
    checkpoint_dir: Optional[str] = None
    resume: bool = False                  # restore latest full TrainState
    curriculum: bool = False
    curriculum_sizes: tuple = (32, 64, 128)
    problem_seed: int = 0
    seed: int = 0


def default_problem(n_spins: int, seed: int = 0) -> IsingProblem:
    j = topology.fully_connected(n_spins, dist="gaussian",
                                 scale=1.0 / np.sqrt(n_spins), seed=seed)
    return IsingProblem.from_dense(j)


class RLTrainingPipeline:
    """Host-side orchestration around the jitted learner steps."""

    def __init__(self, cfg: Optional[TrainingConfig] = None,
                 env_cfg: Optional[EnvConfig] = None,
                 ppo_cfg: Optional[ppo_mod.PPOConfig] = None,
                 dqn_cfg: Optional[dqn_mod.DQNConfig] = None,
                 problem: Optional[IsingProblem] = None):
        self.cfg = cfg or TrainingConfig()
        self.env_cfg = env_cfg or EnvConfig()
        self.ppo_cfg = ppo_cfg or ppo_mod.PPOConfig(n_updates=self.cfg.n_updates)
        self.dqn_cfg = dqn_cfg or dqn_mod.DQNConfig()
        self.problem = problem
        self.metrics: list = []

    def _problems(self):
        if self.problem is not None:
            return [self.problem]
        if self.cfg.curriculum:
            return [default_problem(n, self.cfg.problem_seed + i)
                    for i, n in enumerate(self.cfg.curriculum_sizes)]
        return [default_problem(64, self.cfg.problem_seed)]

    def train(self, verbose: bool = False) -> dict:
        t0 = time.perf_counter()
        problems = self._problems()
        updates_per_stage = max(1, self.cfg.n_updates // len(problems))
        params = None
        env_steps = 0
        for stage, problem in enumerate(problems):
            if self.cfg.agent == "ppo":
                init_fn, update_fn, model = ppo_mod.make_ppo(
                    problem, self.env_cfg, self.ppo_cfg)
                state = init_fn(jax.random.key(self.cfg.seed + stage))
                if params is not None:
                    state = state.replace(params=params)
                u0 = 0
                if self.cfg.resume and self.cfg.checkpoint_dir:
                    restored = self._restore_full(stage, state)
                    if restored is not None:
                        state, u0 = restored
                for u in range(u0, updates_per_stage):
                    state, m = update_fn(state)
                    env_steps += (self.ppo_cfg.rollout_len
                                  * self.env_cfg.n_envs)
                    self._record(stage, u, m, verbose)
                    self._maybe_checkpoint(stage, u, state.params,
                                           full_state=state)
                params = state.params
            elif self.cfg.agent == "dqn":
                init_fn, step_fn, model = dqn_mod.make_dqn(
                    problem, self.env_cfg, self.dqn_cfg)
                state = init_fn(jax.random.key(self.cfg.seed + stage))
                if params is not None:
                    state = state.replace(params=params,
                                          target_params=params)
                kd = max(1, self.dqn_cfg.steps_per_dispatch)
                if kd > 1:
                    # scan kd act+learn steps per dispatch (ppo.train's
                    # updates_per_dispatch analog): the unjitted raw body
                    # is mandatory here — calling the jitted step inside
                    # this traced scan would capture the engine operands
                    # as HLO constants (ADR-0004)
                    from jax import lax

                    raw, call_args = step_fn.raw, step_fn.call_args

                    @jax.jit
                    def _multi(st, *args):
                        def body(st, _):
                            return raw(st, *args)
                        return lax.scan(body, st, None, length=kd)

                u = 0
                while u < updates_per_stage:
                    if kd > 1 and updates_per_stage - u >= kd:
                        state, ms = _multi(state, *step_fn.call_args)
                        ms = {k: np.asarray(v) for k, v in ms.items()}
                        for i in range(kd):
                            self._record(stage, u + i,
                                         {k: v[i] for k, v in ms.items()},
                                         verbose)
                        env_steps += kd * self.env_cfg.n_envs
                        u += kd
                    else:
                        state, m = step_fn(state)
                        env_steps += self.env_cfg.n_envs
                        self._record(stage, u, m, verbose)
                        u += 1
                    self._maybe_checkpoint(stage, u - 1, state.params)
                params = state.params
            else:
                raise ValueError(self.cfg.agent)
        total = time.perf_counter() - t0
        return {
            "params": params,
            "metrics": self.metrics,
            "env_steps_per_second": env_steps / total if total > 0 else 0.0,
            "total_time": total,
        }

    def _record(self, stage, update, metrics, verbose):
        row = {"stage": stage, "update": update,
               **{k: float(v) for k, v in metrics.items()}}
        self.metrics.append(row)
        if verbose and update % self.cfg.eval_interval == 0:
            print(row)

    def _maybe_checkpoint(self, stage, update, params, full_state=None):
        d = self.cfg.checkpoint_dir
        if d and (update + 1) % self.cfg.checkpoint_interval == 0:
            os.makedirs(d, exist_ok=True)
            dqn_mod.save_params(
                params, os.path.join(d, f"params_s{stage}_u{update}.npz"))
            if full_state is not None:
                # full TrainState (params, optimizer, env, PRNG key) so a
                # killed run resumes exactly (reference
                # training_pipeline.py:437-507 save AND load)
                from spinglass_tpu.utils.checkpoint import save_pytree

                save_pytree({"state": full_state, "update": np.int64(update)},
                            os.path.join(d, f"train_state_s{stage}.npz"))
            with open(os.path.join(d, "metrics.json"), "w") as f:
                json.dump(self.metrics, f)

    def _restore_full(self, stage, template_state):
        """Latest full TrainState for this stage, or None."""
        from spinglass_tpu.utils.checkpoint import load_pytree

        path = os.path.join(self.cfg.checkpoint_dir,
                            f"train_state_s{stage}.npz")
        if not os.path.exists(path):
            return None
        restored = load_pytree({"state": template_state,
                                "update": np.int64(0)}, path)
        return restored["state"], int(restored["update"]) + 1

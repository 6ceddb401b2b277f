"""Tests for the parity-gap extras: plotting, minimal fallback, dynamics
analysis, scaling fits, QEC annealer, feasibility search, networkx export."""

import numpy as np
import pytest

from spinglass_tpu.core import constraints as C
from spinglass_tpu.core import dynamics_analysis as DA
from spinglass_tpu.core import minimal, topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.research import novel, scaling


class TestMinimalFallback:
    def test_solves_ferromagnet_stdlib_only(self):
        m = minimal.MinimalIsingModel(10)
        for i in range(10):
            for k in range(i + 1, 10):
                m.set_coupling(i, k, 1.0)
        out = minimal.MinimalAnnealer(n_sweeps=300, seed=1).anneal(m)
        assert out["best_energy"] == pytest.approx(-45.0)
        assert abs(sum(out["best_spins"])) == 10

    def test_incremental_energy_consistent(self):
        m = minimal.create_test_problem(12, seed=3)
        import random
        m.randomize(random.Random(0))
        e0 = m.energy()
        de = m.delta_energy(5)
        m.flip(5)
        assert m.energy() == pytest.approx(e0 + de)


class TestDynamicsAnalysis:
    def test_autocorrelation_of_white_noise_small(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=2000)
        tau = DA.integrated_autocorrelation_time(x)
        assert 0.3 < tau < 1.5  # white noise: tau ~ 0.5

    def test_autocorrelation_of_correlated_series_large(self):
        rng = np.random.default_rng(1)
        x = np.zeros(3000)
        for i in range(1, 3000):
            x[i] = 0.95 * x[i - 1] + rng.normal()
        tau = DA.integrated_autocorrelation_time(x, max_lag=300)
        assert tau > 5.0
        assert DA.effective_sample_size(x) < 1000

    def test_equilibration_detection(self):
        rng = np.random.default_rng(2)
        flat = rng.normal(0, 1, 1000)
        assert DA.is_equilibrated(flat)
        drifting = np.linspace(0, 50, 1000) + rng.normal(0, 0.5, 1000)
        assert not DA.is_equilibrated(drifting)


class TestScaling:
    def test_power_law_fit_recovers_exponent(self):
        sizes = [16, 32, 64, 128, 256]
        values = [2.0 * n ** 1.5 for n in sizes]
        a, b, r2 = scaling.fit_power_law(sizes, values)
        assert b == pytest.approx(1.5, abs=0.01)
        assert r2 > 0.999

    def test_analyzer_end_to_end(self):
        import time as _t

        def fake_solve(n):
            _t.sleep(n * 1e-4)
            class R:
                best_energy = -float(n)
            return R()

        out = scaling.ScalingAnalyzer().measure(
            fake_solve, [50, 100, 200, 400]).analyze()
        assert out["best_fit"] in ("power", "exponential")
        assert "complexity_estimate" in out


class TestQEC:
    def test_qec_decodes_ground_state(self):
        n = 10
        j = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
        p = IsingProblem.from_dense(j)
        res = novel.quantum_error_corrected_annealing(
            p, novel.QECConfig(n_sweeps=200, n_replicas=8))
        assert res.best_energy == pytest.approx(-0.5 * n * (n - 1), rel=1e-5)
        assert res.metadata["repetition"] == 3
        assert len(res.best_spins) == n


class TestFeasibilitySearch:
    def test_finds_feasible_when_exists(self):
        comp = C.ConstraintCompiler()
        comp.add(C.CardinalityConstraint(indices=np.arange(4), k=2))
        s = comp.find_feasible(6, n_attempts=500, seed=1)
        assert s is not None
        assert comp.count_violations(s) == 0

    def test_returns_none_when_impossible(self):
        comp = C.ConstraintCompiler()
        comp.add(C.CardinalityConstraint(indices=np.arange(3), k=1))
        comp.add(C.CardinalityConstraint(indices=np.arange(3), k=2))
        assert comp.find_feasible(3, n_attempts=200) is None


class TestPlotting:
    def test_result_plot(self, tmp_path):
        pytest.importorskip("matplotlib")
        from spinglass_tpu.anneal.result import AnnealResult
        from spinglass_tpu.utils import plotting

        res = AnnealResult(
            best_spins=np.ones(4), best_energy=-2.0,
            replica_best_energy=np.array([-2.0]),
            energy_history=np.linspace(0, -2, 20),
            mean_energy_history=np.linspace(1, -1, 20),
            temperature_history=np.geomspace(5, 0.01, 20),
            acceptance_history=np.linspace(0.9, 0.1, 20))
        path = plotting.plot_result(res, str(tmp_path / "r.png"))
        import os
        assert os.path.getsize(path) > 1000

    def test_gantt_plot(self, tmp_path):
        pytest.importorskip("matplotlib")
        from spinglass_tpu.problems.base import ProblemSolution
        from spinglass_tpu.utils import plotting

        sol = ProblemSolution(
            objective_value=5.0,
            variables={"assignments": {0: {"agent": 0, "start": 0, "end": 2},
                                       1: {"agent": 1, "start": 1, "end": 3}},
                       "makespan": 3})
        path = plotting.plot_gantt(sol, str(tmp_path / "g.png"))
        import os
        assert os.path.exists(path)


class TestNetworkx:
    def test_roundtrip(self):
        pytest.importorskip("networkx")
        j = topology.chain(6, dist="ferromagnetic", scale=2.0)
        g = topology.to_networkx(j)
        assert g.number_of_nodes() == 6
        assert g.number_of_edges() == 5
        assert g[0][1]["weight"] == 2.0

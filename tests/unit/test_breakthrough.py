"""Breakthrough tier (research/breakthrough.py — reference
breakthrough_algorithms.py parity): each named annealer solves a small
instance, and the framework emits the validation-report format."""

import numpy as np
import pytest

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.research import breakthrough as B


@pytest.fixture(scope="module")
def problem():
    j = topology.fully_connected(12, dist="binary", seed=7)
    return IsingProblem.from_dense(j)


CFG = B.BreakthroughConfig(n_sweeps=40, n_replicas=4, use_pallas="never")


class TestAnnealers:
    def test_adaptive_neural(self, problem):
        res = B.AdaptiveNeuralAnnealer(CFG).solve(problem, seed=0)
        assert np.isfinite(res.best_energy)

    def test_quantum_error_corrected(self, problem):
        res = B.QuantumErrorCorrectedAnnealer(CFG).solve(problem, seed=0)
        assert np.isfinite(res.best_energy)

    def test_federated(self, problem):
        net = B.FederatedOptimizationNetwork(CFG, n_clients=2, n_rounds=2)
        res = net.solve(problem, seed=0)
        assert np.isfinite(res.best_energy)
        assert len(res.detail["history"]) == 2


class TestFramework:
    @pytest.mark.slow  # the 4x2 validate cross-product; each algorithm's
    # solve path stays covered non-slow by TestAnnealers (suite budget)
    def test_validate_report_shape(self, problem, tmp_path):
        fw = B.BreakthroughResearchFramework(CFG, n_trials=2)
        report = fw.validate(problem)
        algos = report["algorithms"]
        assert set(algos) == {"baseline", "adaptive_neural",
                              "quantum_error_corrected", "federated"}
        for name, entry in algos.items():
            assert np.isfinite(entry["mean_best_energy"])
            assert entry["mean_runtime"] >= 0
            if name != "baseline":
                assert "p_value" in entry["welch_t"]
                assert isinstance(entry["significant_vs_baseline"], bool)
        out = tmp_path / "breakthrough.json"
        fw.save(str(out))
        import json
        loaded = json.loads(out.read_text())
        assert loaded["baseline"] == "baseline"

    def test_save_before_validate_raises(self):
        fw = B.BreakthroughResearchFramework(CFG, n_trials=1)
        with pytest.raises(ValueError):
            fw.save("/tmp/never.json")

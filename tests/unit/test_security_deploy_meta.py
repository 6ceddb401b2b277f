"""Security, deployment config, federated, and meta-optimizer tests."""

import os

import numpy as np
import pytest

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.deployment import Environment, ProductionConfig
from spinglass_tpu.research.federated import (FederatedAnnealingServer,
                                              FederatedConfig)
from spinglass_tpu.research.meta import (MetaOptimizer, ScheduleMemory,
                                         characterize, select_algorithm)
from spinglass_tpu.utils import security as sec
from spinglass_tpu.utils.exceptions import ValidationError


class TestSecurity:
    def test_path_traversal_blocked(self, tmp_path):
        base = str(tmp_path)
        ok = sec.sanitize_path(os.path.join(base, "a.npz"), base_dir=base)
        assert ok.endswith("a.npz")
        with pytest.raises(ValidationError):
            sec.sanitize_path(os.path.join(base, "../../etc/passwd.npz"),
                              base_dir=base)
        with pytest.raises(ValidationError):
            sec.sanitize_path(os.path.join(base, "x.sh"), base_dir=base)
        with pytest.raises(ValidationError):
            sec.sanitize_path("bad\x00.npz")

    def test_payload_limits(self):
        sec.validate_problem_payload(np.zeros((10, 10)))
        with pytest.raises(ValidationError):
            sec.validate_problem_payload(np.zeros((30, 2)))  # not square
        bad = np.zeros((4, 4))
        bad[1, 2] = np.inf
        with pytest.raises(ValidationError):
            sec.validate_problem_payload(bad)
        with pytest.raises(ValidationError):
            sec.validate_problem_payload(np.zeros((8, 8)), h=np.zeros(3))
        # strict level rejects >20k spins (broadcast view: no real memory)
        huge = np.broadcast_to(np.zeros(1), (21_000, 21_000))
        with pytest.raises(ValidationError):
            sec.validate_problem_payload(huge,
                                         level=sec.ValidationLevel.STRICT)

    def test_audit_log(self, tmp_path):
        log = sec.AuditLogger(str(tmp_path / "audit.jsonl"))
        log.log("solve", problem="tsp", size=10)
        log.log("load", path="/x.npz")
        entries = log.entries()
        assert len(entries) == 2
        assert entries[0]["action"] == "solve"
        assert entries[1]["path"] == "/x.npz"


class TestDeploymentConfig:
    def test_environment_presets(self):
        dev = ProductionConfig.from_environment("development")
        prod = ProductionConfig.from_environment("production")
        assert dev.environment == Environment.DEVELOPMENT
        assert not dev.observability.log_json
        assert prod.service.validation_level == "strict"
        assert prod.observability.log_level == "WARNING"

    def test_env_var_override(self, monkeypatch):
        monkeypatch.setenv("SGT_COMPUTE_N_REPLICAS", "512")
        monkeypatch.setenv("SGT_OBSERVABILITY_LOG_JSON", "false")
        cfg = ProductionConfig.from_environment("staging")
        assert cfg.compute.n_replicas == 512
        assert cfg.observability.log_json is False

    def test_save_roundtrip(self, tmp_path):
        cfg = ProductionConfig.from_environment("production")
        path = str(tmp_path / "cfg.json")
        cfg.save(path)
        import json
        loaded = json.load(open(path))
        assert loaded["environment"] == "production"
        assert "compute" in loaded


class TestFederated:
    def test_round_improves_and_keeps_privacy(self):
        problems = []
        for i in range(3):
            j = topology.fully_connected(12, dist="binary", seed=i)
            problems.append(IsingProblem.from_dense(j))
        server = FederatedAnnealingServer(FederatedConfig(
            n_rounds=2, local_sweeps=80, n_replicas=8))
        out = server.run(problems)
        assert len(out["history"]) == 2
        assert len(out["final_best"]) == 3
        assert all(np.isfinite(e) for e in out["final_best"])
        # the server state contains only schedule params, never couplings
        assert set(out["global_params"]) == {"initial_temp", "alpha"}


class TestMeta:
    def test_characterize_features_sane(self):
        j = topology.fully_connected(32, dist="binary", seed=0)
        f = characterize(IsingProblem.from_dense(j))
        assert f.shape == (8,)
        assert f[1] == pytest.approx(1.0)        # fully connected density
        assert 0.0 <= f[4] <= 1.0                # frustration fraction

    def test_selector_rules(self):
        # sparse large → sa; frustrated dense → pt or sqa
        sparse = IsingProblem.from_dense(
            topology.random_graph(2500, density=0.002, seed=1))
        assert select_algorithm(sparse) == "sa"
        frustrated = IsingProblem.from_dense(
            topology.fully_connected(64, dist="binary", seed=2))
        assert select_algorithm(frustrated) in ("pt", "sqa", "adaptive_sa")

    def test_schedule_memory_best_of_nearest(self):
        """suggest() picks the best-scoring among the 3 nearest embeddings."""
        mem = ScheduleMemory()
        # cluster A near zero: two entries, the better-scoring one wins
        mem.record(np.zeros(8), {"initial_temp": 1.0, "alpha": 0.9}, 0.1)
        mem.record(np.full(8, 0.05), {"initial_temp": 2.0, "alpha": 0.95},
                   0.8)
        mem.record(np.full(8, 0.1), {"initial_temp": 3.0, "alpha": 0.92},
                   0.3)
        # far cluster B with a top score must NOT be picked for queries at A
        mem.record(np.full(8, 10.0), {"initial_temp": 9.0, "alpha": 0.99},
                   0.99)
        assert mem.suggest(np.full(8, 0.02))["initial_temp"] == 2.0
        assert mem.suggest(np.full(8, 9.9))["initial_temp"] == 9.0
        # empty memory falls back to the default
        assert ScheduleMemory().suggest(np.zeros(8))["initial_temp"] == 5.0

    def test_meta_solver_end_to_end(self):
        opt = MetaOptimizer(n_sweeps=80, n_replicas=8)
        for seed in range(2):
            j = topology.fully_connected(16, dist="binary", seed=seed)
            res = opt.solve(IsingProblem.from_dense(j))
            assert np.isfinite(res.best_energy)
        rep = opt.report()
        assert rep["n_solved"] == 2
        assert rep["memory_size"] == 2

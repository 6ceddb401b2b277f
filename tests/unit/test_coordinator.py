"""Job coordinator + interactive optimizer tests (replacing the reference's
simulated cluster tests, SURVEY §4)."""

import time

import numpy as np
import pytest

from spinglass_tpu.cli_interactive import InteractiveOptimizer
from spinglass_tpu.core import topology
from spinglass_tpu.distributed.coordinator import (Job, JobCoordinator,
                                                   JobStatus)


class TestCoordinator:
    def test_submit_and_collect(self):
        c = JobCoordinator(n_workers=2).start()
        for i in range(5):
            c.submit(f"sq_{i}", lambda i=i: i * i)
        assert c.wait(timeout=10)
        res = c.results()
        assert res == {f"sq_{i}": i * i for i in range(5)}
        c.shutdown()

    def test_retry_then_success(self):
        c = JobCoordinator(n_workers=1).start()
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("flake")
            return "done"

        c.submit("flaky", flaky, max_retries=3)
        assert c.wait(timeout=10)
        assert c.results()["flaky"] == "done"
        assert c.jobs["flaky"].attempts == 3
        c.shutdown()

    def test_failure_after_retries(self):
        c = JobCoordinator(n_workers=1).start()

        def broken():
            raise ValueError("always")

        c.submit("bad", broken, max_retries=1)
        ok = c.wait(timeout=10)
        assert not ok
        assert c.jobs["bad"].status == JobStatus.FAILED
        assert "always" in c.jobs["bad"].error
        c.shutdown()

    def test_duplicate_id_rejected(self):
        c = JobCoordinator().start()
        c.submit("x", lambda: 1)
        with pytest.raises(ValueError):
            c.submit("x", lambda: 2)
        c.shutdown()

    def test_map_and_progress(self):
        c = JobCoordinator(n_workers=2).start()
        ids = c.map(lambda x: x + 1, [10, 20, 30], prefix="inc")
        assert c.wait(timeout=10)
        assert [c.results()[i] for i in ids] == [11, 21, 31]
        assert c.progress() == {"completed": 3}
        c.shutdown()

    def test_anneal_jobs(self):
        """Real workload: a seed sweep of anneals through the coordinator."""
        from spinglass_tpu.anneal.sa import SAConfig, anneal
        from spinglass_tpu.core.problem import IsingProblem

        j = topology.fully_connected(12, dist="binary", seed=0)
        p = IsingProblem.from_dense(j)
        c = JobCoordinator(n_workers=1).start()
        c.map(lambda seed: anneal(p, SAConfig(
            n_sweeps=40, n_replicas=4, use_pallas="never",
            seed=seed)).best_energy, [1, 2, 3], prefix="seed")
        assert c.wait(timeout=120)
        energies = list(c.results().values())
        assert all(np.isfinite(e) for e in energies)
        c.shutdown()


class TestInteractive:
    def test_quick_solve_raw_matrix(self):
        j = topology.fully_connected(12, dist="ferromagnetic", scale=1.0)
        opt = InteractiveOptimizer(n_sweeps=100, n_replicas=8, verbose=False)
        res = opt.quick_solve(j)
        assert res.best_energy == pytest.approx(-0.5 * 12 * 11, rel=1e-4)
        assert len(opt.history()) == 1

"""Batch processor, adaptive SA, caches, profiler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.anneal import batch as B
from spinglass_tpu.anneal.adaptive import AdaptiveSAConfig, adaptive_anneal
from spinglass_tpu.anneal.sa import SAConfig
from spinglass_tpu.anneal.schedules import ScheduleConfig
from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.utils import cache as C
from spinglass_tpu.utils.profiling import PerformanceProfiler


def _problems(ns, seed=0):
    out = []
    for i, n in enumerate(ns):
        j = topology.fully_connected(n, dist="binary", seed=seed + i)
        out.append(IsingProblem.from_dense(j))
    return out


FAST = SAConfig(n_sweeps=60, n_replicas=8, use_pallas="never")


class TestBatch:
    def test_stack_problems(self):
        ps = _problems([10, 12])
        st = B.stack_problems(ps)
        assert st.j.shape == (2, 128, 128)
        assert st.h.shape == (2, 128)

    def test_stack_requires_same_padding(self):
        ps = _problems([10, 200])
        with pytest.raises(ValueError):
            B.stack_problems(ps)

    def test_process_preserves_order_and_solves(self):
        ps = _problems([10, 14, 12, 16])
        proc = B.BatchProcessor(FAST, B.BatchConfig(max_batch_size=3))
        results = proc.process(ps)
        assert len(results) == 4
        assert proc.n_processed == 4
        for p, r in zip(ps, results):
            assert len(r.best_spins) == p.n_spins
            assert np.isfinite(r.best_energy)
            assert r.algorithm == "sa/batched"

    def test_batched_matches_single_quality(self):
        """Batched solve should match a plain anneal's energy on a
        ferromagnet (exact ground state)."""
        n = 12
        j = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
        p = IsingProblem.from_dense(j)
        cfg = SAConfig(n_sweeps=200, n_replicas=16, use_pallas="never",
                       schedule=ScheduleConfig(initial_temp=4.0,
                                               final_temp=0.01))
        res = B.BatchProcessor(cfg).process([p, p])
        for r in res:
            assert r.best_energy == pytest.approx(-0.5 * n * (n - 1),
                                                  rel=1e-5)

    def test_streaming(self):
        ps = _problems([10, 11, 12, 13, 14])
        proc = B.BatchProcessor(FAST, B.BatchConfig(max_batch_size=2))
        out = list(proc.process_stream(iter(ps), batch_size=2))
        assert len(out) == 5

    def test_checkpointing(self, tmp_path):
        ps = _problems([10, 11, 12, 13])
        proc = B.BatchProcessor(
            FAST, B.BatchConfig(max_batch_size=2, checkpoint_interval=1,
                                checkpoint_dir=str(tmp_path)))
        proc.process(ps)
        import os
        files = [f for f in os.listdir(tmp_path) if "progress" in f]
        assert files

    def test_adaptive_batch_processor(self):
        ps = _problems([10] * 6)
        proc = B.AdaptiveBatchProcessor(FAST,
                                        B.BatchConfig(max_batch_size=8))
        results = proc.process(ps)
        assert all(r is not None for r in results)
        assert proc._current_bs >= 2

    def test_estimate_batch_size_bounds(self):
        bs = B.estimate_batch_size(128, 16, B.BatchConfig(max_batch_size=7))
        assert 1 <= bs <= 7


class TestAdaptiveSA:
    def test_adaptive_finds_ground_state_and_intervenes(self):
        n = 16
        j = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
        p = IsingProblem.from_dense(j)
        cfg = AdaptiveSAConfig(
            base=SAConfig(n_sweeps=600, n_replicas=8, record_interval=25,
                          use_pallas="never",
                          schedule=ScheduleConfig(initial_temp=3.0,
                                                  final_temp=0.05)),
            stagnation_chunks=3)
        res = adaptive_anneal(p, cfg)
        assert res.best_energy == pytest.approx(-0.5 * n * (n - 1), rel=1e-5)
        # ferromagnet converges fast → stagnation → interventions fired
        assert res.metadata["interventions"] >= 1
        assert res.algorithm.startswith("adaptive_sa")


class TestCache:
    def test_lru_basic_and_eviction(self):
        c = C.LRUCache(max_size=2)
        c.put("a", 1)
        c.put("b", 2)
        assert c.get("a") == 1
        c.put("c", 3)          # evicts b (a was refreshed)
        assert c.get("b") is None
        assert c.get("a") == 1
        assert 0 < c.hit_rate < 1

    def test_ttl_expiry(self):
        import time
        c = C.LRUCache(ttl=0.05)
        c.put("k", "v")
        assert c.get("k") == "v"
        time.sleep(0.06)
        assert c.get("k") is None

    def test_cached_anneal_hits(self):
        p = _problems([10])[0]
        cache = C.LRUCache()
        calls = {"n": 0}

        def fake_anneal(problem, config):
            calls["n"] += 1
            return "result"

        r1 = C.cached_anneal(p, FAST, cache=cache, anneal_fn=fake_anneal)
        r2 = C.cached_anneal(p, FAST, cache=cache, anneal_fn=fake_anneal)
        assert r1 == r2 == "result"
        assert calls["n"] == 1
        assert cache.hit_rate == 0.5

    def test_fingerprint_distinguishes_problems(self):
        p1, p2 = _problems([10, 10], seed=0), _problems([10, 10], seed=9)
        assert C.problem_fingerprint(p1[0]) != C.problem_fingerprint(p2[0])
        assert C.problem_fingerprint(p1[0]) == C.problem_fingerprint(p1[0])

    def test_memoize_decorator(self):
        calls = {"n": 0}

        @C.memoize()
        def f(x):
            calls["n"] += 1
            return x * 2

        assert f(3) == 6 and f(3) == 6
        assert calls["n"] == 1


class TestProfiler:
    def test_phase_and_decorator(self):
        prof = PerformanceProfiler()
        with prof.phase("a"):
            pass

        @prof.profile(name="b")
        def g():
            return 1

        g(); g()
        s = prof.summary()
        assert s["a"]["n"] == 1 and s["b"]["n"] == 2
        prof.reset()
        assert prof.summary() == {}

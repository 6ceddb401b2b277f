"""Adaptive meta-RL tier (research/meta_rl.py — reference
adaptive_meta_rl.py parity): characterizer, episodic memory, meta network
fit, NAS, and the end-to-end agent loop."""

import numpy as np
import pytest

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.research import meta_rl as M


def _problem(n=24, seed=0):
    j = topology.fully_connected(n, dist="gaussian",
                                 scale=1.0 / np.sqrt(n), seed=seed)
    return IsingProblem.from_dense(j)


class TestCharacterizer:
    def test_embedding_shape_and_names(self):
        c = M.ProblemCharacterizer()
        emb = c.characterize(_problem(16))
        assert emb.shape == (M.EMBED_DIM,)
        d = c.describe(_problem(16))
        assert set(d) == set(c.feature_names)

    def test_batch(self):
        c = M.ProblemCharacterizer()
        embs = c.characterize_batch([_problem(16, 0), _problem(32, 1)])
        assert embs.shape == (2, M.EMBED_DIM)
        assert embs[1][0] > embs[0][0]  # log10 n increases


class TestStrategyCodec:
    def test_roundtrip(self):
        vec = M.encode_strategy(5.0, 0.99, 1.0)
        out = M.decode_strategy(vec)
        assert abs(out["initial_temp"] - 5.0) < 1e-6
        assert abs(out["alpha"] - 0.99) < 1e-4
        assert abs(out["replica_mult"] - 1.0) < 1e-6

    def test_decode_clips(self):
        out = M.decode_strategy(np.array([10.0, 50.0, 10.0]))
        assert out["initial_temp"] <= 100.0
        assert 0.9 < out["alpha"] < 1.0
        assert out["replica_mult"] <= 4.0


class TestEpisodicMemory:
    def test_store_recall(self):
        mem = M.EpisodicMemory(capacity=8)
        assert mem.recall(np.zeros(M.EMBED_DIM)) is None
        e1 = np.zeros(M.EMBED_DIM)
        mem.store(e1, M.encode_strategy(3.0, 0.95), score=1.0)
        rec = mem.recall(e1)
        assert abs(M.decode_strategy(rec)["initial_temp"] - 3.0) < 1e-4

    def test_eviction_drops_worst(self):
        mem = M.EpisodicMemory(capacity=3)
        for i, s in enumerate([0.9, 0.1, 0.8, 0.7]):
            mem.store(np.full(M.EMBED_DIM, i, np.float32),
                      M.encode_strategy(2.0 + i, 0.95), score=s)
        assert len(mem) == 3
        assert min(e.score for e in mem.episodes) >= 0.7

    def test_nearest_distance(self):
        mem = M.EpisodicMemory()
        assert mem.nearest_distance(np.zeros(M.EMBED_DIM)) == float("inf")
        mem.store(np.zeros(M.EMBED_DIM), M.encode_strategy(2.0, 0.95), 1.0)
        assert mem.nearest_distance(np.zeros(M.EMBED_DIM)) == 0.0


class TestMetaNetworkFit:
    def test_fit_reduces_loss(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(32, M.EMBED_DIM)).astype(np.float32)
        w_true = rng.normal(size=(M.EMBED_DIM, M.STRATEGY_DIM))
        y = (x @ w_true).astype(np.float32)
        model = M.MetaLearningNetwork(hidden_sizes=(32,))
        _, loss_short = M.fit_meta_network(model, x, y, np.ones(32),
                                           n_steps=5, seed=0)
        _, loss_long = M.fit_meta_network(model, x, y, np.ones(32),
                                          n_steps=300, seed=0)
        assert loss_long < loss_short * 0.5


class TestNAS:
    def test_search_finds_scored_best(self):
        # score = negative param count proxy: prefer the narrowest net
        def eval_fn(arch):
            return -sum(arch)

        nas = M.NeuralArchitectureSearch(population=5, generations=3, seed=0)
        res = nas.search(eval_fn, initial=(64, 64))
        assert res.score == -sum(res.architecture)
        assert sum(res.architecture) <= 128
        assert len(res.history) == 3


class TestAgent:
    def test_solve_records_and_refits(self):
        agent = M.AdaptiveMetaRLAgent(M.MetaRLConfig(
            n_sweeps=60, n_replicas=4, refit_interval=4, fit_steps=20))
        for i in range(4):
            res, info = agent.solve(_problem(16, seed=i))
            assert np.isfinite(res.best_energy)
            assert info["source"] in ("default", "memory", "network")
        rep = agent.report()
        assert rep["n_solves"] == 4
        assert rep["memory_size"] == 4
        assert rep["fits"] == 1
        assert np.isfinite(rep["last_fit_loss"])

    def test_memory_recall_used_for_repeat_problem(self):
        agent = M.AdaptiveMetaRLAgent(M.MetaRLConfig(
            n_sweeps=40, n_replicas=4, refit_interval=100,
            explore_std=0.0))
        p = _problem(16, seed=3)
        agent.solve(p)
        _, info = agent.solve(p)
        assert info["source"] == "memory"

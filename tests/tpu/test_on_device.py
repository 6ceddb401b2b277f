"""Real-TPU test tier (VERDICT.md r3 task 6).

Run with:  SPINGLASS_TPU_TESTS=1 python -m pytest tests/tpu -m tpu -q

Everything here is skipped unless the default backend is an actual TPU
(tests/conftest.py forces CPU unless SPINGLASS_TPU_TESTS=1). The point of
this tier is to execute the flagship multi-chip code paths on the hardware
they target — the CPU suite only ever runs the sharded Pallas engine in
interpret mode. Shapes are kept small enough that each program compiles in
well under a minute through the axon tunnel.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="requires a real TPU backend "
                              "(set SPINGLASS_TPU_TESTS=1 on a TPU host)"),
]


def _dense_problem(n=256, seed=0):
    from spinglass_tpu.core import topology
    from spinglass_tpu.core.problem import IsingProblem

    j = topology.fully_connected(n, dist="gaussian", scale=1.0 / np.sqrt(n),
                                 seed=seed)
    return IsingProblem.from_dense(j)


class TestShardedPallasOnTPU:
    def test_sharded_pallas_pt_step_compiles_and_runs(self):
        """FusedSweep under shard_map on a real 1-device TPU mesh: compiled
        Mosaic (NOT interpret mode), finite energies, slot permutation
        preserved, and best_energy consistent with a direct recompute."""
        import jax.numpy as jnp

        from spinglass_tpu.anneal.pt import PTConfig
        from spinglass_tpu.core.energy import energy as batched_energy
        from spinglass_tpu.distributed import pt_sharded
        from spinglass_tpu.distributed.pt_sharded import ShardedPallasEngine

        problem = _dense_problem()
        mesh = pt_sharded.make_mesh(jax.devices()[:1])
        cfg = PTConfig(n_replicas=8, exchange_interval=2, n_sweeps=4,
                       sweep_method="blocked", use_pallas="always",
                       min_temp=0.2, max_temp=5.0, seed=0)
        step, init, betas, engine, _ = pt_sharded.make_sharded_pt_step(
            problem, cfg, mesh)
        assert isinstance(engine, ShardedPallasEngine), engine
        state = init(jax.random.key(0))
        state, stats = step(state)
        state, stats = step(state)
        jax.block_until_ready(state.spins)

        assert bool(jnp.all(jnp.isfinite(state.energy)))
        slots = np.sort(np.asarray(state.slot))
        assert (slots == np.arange(cfg.n_replicas)).all()
        # carried energies must match a fresh recompute from the spins
        spins_rn = engine.from_layout(state.spins)
        e_direct = batched_energy(problem, spins_rn)
        np.testing.assert_allclose(np.asarray(state.energy),
                                   np.asarray(e_direct),
                                   rtol=2e-4, atol=2e-2)

    def test_threshold_kernel_on_tpu(self):
        """Pallas on-chip PRNG threshold kernel (compiled Mosaic): same
        seed -> identical output, different key word or block -> different
        streams (the r3 single-word seeding folded the key space to 2^32;
        ADVICE r3 #1), padding rows forced to -inf."""
        import jax.numpy as jnp

        from spinglass_tpu.kernels.sparse import make_threshold_call

        ns, r = 512, 128
        call = jax.jit(make_threshold_call(ns, r, "metropolis",
                                           block_rows=256))
        nib = jnp.full((1, r), -0.5, jnp.float32)
        mask = jnp.zeros((ns, 1), jnp.float32).at[500:].set(-jnp.inf)
        s1 = jnp.array([123, 456], jnp.int32)
        s1b = jnp.array([123, 457], jnp.int32)   # second word differs
        s2 = jnp.array([124, 456], jnp.int32)    # first word differs
        th1 = np.asarray(call(s1, nib, mask))
        th1_again = np.asarray(call(s1, nib, mask))
        th_b = np.asarray(call(s1b, nib, mask))
        th_2 = np.asarray(call(s2, nib, mask))

        assert np.array_equal(th1, th1_again)          # deterministic
        assert not np.array_equal(th1, th_b)           # word 2 matters
        assert not np.array_equal(th1, th_2)           # word 1 matters
        assert np.all(np.isneginf(th1[500:]))          # padding
        real = th1[:500]
        assert np.all(np.isfinite(real))
        assert not np.array_equal(th1[:256], th1[256:512])  # blocks differ
        # Metropolis thresholds are log(U)*nib with nib=-0.5 and
        # log(U) <= 0 => th >= 0, median at -0.5*log(0.5) ~ 0.3466
        assert np.all(real >= 0.0)
        assert abs(np.median(real) - (-0.5 * np.log(0.5))) < 0.02

    def test_sparse_t_engine_pallas_rng_sweep(self):
        """SortedSparseTEngine with the Pallas threshold RNG (r % 128 == 0
        activates it on TPU): energies stay consistent with recompute over
        a few sweeps."""
        import jax.numpy as jnp

        from spinglass_tpu.anneal.engines import make_engine
        from spinglass_tpu.core import topology
        from spinglass_tpu.core.problem import random_spins
        from spinglass_tpu.kernels.sparse import EllProblem, sparse_energy

        n, r = 1024, 256
        coo = topology.sparse_random_graph_coo(n, avg_degree=6.0,
                                               dist="gaussian", seed=1)
        ell = EllProblem.from_coo(n, *coo)
        engine = make_engine(ell, sweep_method="sparse_t", r_hint=r)
        assert engine.name == "sparse_sorted_t"
        key = jax.random.key(0)
        s = engine.to_layout(random_spins(key, (r, ell.n_padded),
                                          ell.active_mask))

        @jax.jit
        def run(s, key):
            def body(carry, k):
                s2, de, cnt = engine.sweep(carry, jnp.float32(1.0), k)
                return s2, de
            return jax.lax.scan(body, s, jax.random.split(key, 4))

        s2, des = run(s, jax.random.key(7))
        jax.block_until_ready(s2)
        e = sparse_energy(ell, engine.from_layout(s2))
        assert bool(jnp.all(jnp.isfinite(e)))
        # sweeps at beta=1 from random start must lower typical energy
        e0 = sparse_energy(ell, engine.from_layout(s))
        assert float(jnp.mean(e)) < float(jnp.mean(e0))

    def test_fused_accept_energy_identity(self):
        """The fused accept kernel's reported dE must satisfy
        E0 + dE == E1 exactly (f32 tolerance) — the strongest single-sweep
        correctness check: it ties the kernel's flip decisions, its dE
        reduction, and the spin store together."""
        import jax.numpy as jnp

        from spinglass_tpu.core.problem import random_spins
        from spinglass_tpu.kernels.sparse import (EllProblem,
                                                  SortedSparseTEngine)
        from spinglass_tpu.core import topology

        n, r = 1024, 128
        coo = topology.sparse_random_graph_coo(n, avg_degree=6.0,
                                               dist="gaussian", seed=2)
        ell = EllProblem.from_coo(n, *coo)
        eng = SortedSparseTEngine(ell, accept_kernel="fused")
        assert eng._use_fused_accept
        s = eng.to_layout(random_spins(jax.random.key(1), (r, ell.n_padded),
                                       ell.active_mask))

        @jax.jit
        def one(s, key):
            return eng.sweep(s, jnp.float32(0.7), key)

        e0 = eng.energy(s)
        s1, de, cnt = one(s, jax.random.key(9))
        e1 = eng.energy(s1)
        np.testing.assert_allclose(np.asarray(e0 + de), np.asarray(e1),
                                   rtol=1e-4, atol=5e-2)
        assert int(jnp.sum(cnt)) > 0
        # spins stay exactly +-1 through the int8 store
        vals = np.unique(np.asarray(s1))
        assert set(vals.tolist()) <= {-1, 1}

    def test_single_call_sweep_on_tpu(self):
        """The single-call whole-sweep kernel (accept_kernel='single',
        default on TPU) with on-chip RNG: energy identity over sweeps and
        acceptance statistics consistent with the threshold path."""
        import jax.numpy as jnp

        from spinglass_tpu.core import topology
        from spinglass_tpu.core.problem import random_spins
        from spinglass_tpu.kernels.sparse import (EllProblem,
                                                  SortedSparseTEngine)

        n, r = 1024, 256
        coo = topology.sparse_random_graph_coo(n, avg_degree=6.0,
                                               dist="gaussian", seed=2)
        ell = EllProblem.from_coo(n, *coo)
        eng = SortedSparseTEngine(ell, accept_kernel="single")
        assert eng._use_single
        base = SortedSparseTEngine(ell, accept_kernel="threshold")
        s0 = random_spins(jax.random.key(0), (r, ell.n_padded),
                          ell.active_mask)
        st = eng.to_layout(s0)
        e0 = np.asarray(eng.energy(st))
        de_sum = np.zeros(r, np.float32)
        accs = []
        for i in range(10):
            st, de, cnt = eng.sweep(st, jnp.float32(1.0), jax.random.key(i))
            de_sum += np.asarray(de)
            accs.append(np.mean(np.asarray(cnt)) / n)
        e1 = np.asarray(eng.energy(st))
        np.testing.assert_allclose(e0 + de_sum, e1, rtol=1e-3, atol=0.5)
        sb = base.to_layout(s0)
        acc_b = []
        for i in range(10):
            sb, _, cnt_b = base.sweep(sb, jnp.float32(1.0),
                                      jax.random.key(50 + i))
            acc_b.append(np.mean(np.asarray(cnt_b)) / n)
        assert abs(np.mean(accs[3:]) - np.mean(acc_b[3:])) < 0.04

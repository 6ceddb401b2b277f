"""SortedSparseTEngine (transposed aligned sorted sliced-ELL) tests:
layout round trip, energy identity, exact decision parity with the compact
colored sweep, alignment invariants, SA/PT driver integration, and engine
selection via r_hint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.anneal.engines import make_engine
from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import random_spins
from spinglass_tpu.kernels import sparse as S


@pytest.fixture
def key():
    return jax.random.key(7)


def _ell(n=128, seed=3, with_h=False):
    coo = topology.sparse_random_graph_coo(n, avg_degree=4.0,
                                           dist="gaussian", seed=seed)
    h = (np.random.default_rng(seed).normal(0, 0.3, n) if with_h else None)
    return S.EllProblem.from_coo(n, *coo, h=h)


class TestSortedSparseTEngine:
    def test_layout_roundtrip_and_energy(self, key):
        ell = _ell(with_h=True)
        eng = S.SortedSparseTEngine(ell)
        spins = jnp.where(jax.random.uniform(key, (4, ell.n_padded)) < 0.5,
                          -1.0, 1.0)
        spins = jnp.where(ell.active_mask[None, :] > 0, spins, 1.0)
        s_t = eng.to_layout(spins)
        assert s_t.dtype == jnp.int8
        assert s_t.shape == (eng.n_sorted, 4)
        np.testing.assert_array_equal(np.asarray(eng.from_layout(s_t)),
                                      np.asarray(spins))
        np.testing.assert_allclose(np.asarray(eng.energy(s_t)),
                                   np.asarray(S.sparse_energy(ell, spins)),
                                   rtol=1e-5, atol=1e-3)

    def test_energy_identity_after_sweep(self, key):
        ell = _ell(with_h=True)
        eng = S.SortedSparseTEngine(ell)
        k1, k2 = jax.random.split(key)
        s_t = eng.to_layout(jnp.where(
            jax.random.uniform(k1, (4, ell.n_padded)) < 0.5, -1.0, 1.0))
        e0 = eng.energy(s_t)
        s1, de, cnt = eng.sweep(s_t, jnp.float32(0.8), k2)
        np.testing.assert_allclose(np.asarray(e0 + de),
                                   np.asarray(eng.energy(s1)),
                                   rtol=1e-4, atol=1e-2)
        assert int(jnp.sum(cnt)) > 0

    @pytest.mark.parametrize("rule", ["metropolis", "glauber"])
    def test_decision_parity_with_compact(self, key, rule):
        """Same coloring + same per-spin uniforms -> identical flips,
        counts, and dE as the compact colored sweep (both rules)."""
        ell = _ell()
        eng = S.SortedSparseTEngine(ell, rule=rule)
        ceng = S.SparseEngine(ell, compact=True, rule=rule)
        k1, k2 = jax.random.split(key)
        spins = jnp.where(jax.random.uniform(k1, (4, ell.n_padded)) < 0.5,
                          -1.0, 1.0)
        u_orig = jax.random.uniform(k2, (4, ell.n_padded))
        u_t = u_orig[:, eng._perm_gather].T
        s_t, de_t, cnt_t = eng.sweep_with_uniforms(
            eng.to_layout(spins), jnp.float32(0.7), u_t)
        s_c, de_c, cnt_c = S.sparse_colored_sweep_compact(
            ell, ceng.groups, spins, jnp.float32(0.7), u_orig, rule=rule)
        np.testing.assert_array_equal(np.asarray(cnt_t), np.asarray(cnt_c))
        n = ell.n_spins
        np.testing.assert_array_equal(
            np.asarray(eng.from_layout(s_t))[:, :n],
            np.asarray(s_c)[:, :n])
        np.testing.assert_allclose(np.asarray(de_t), np.asarray(de_c),
                                   rtol=1e-4, atol=1e-3)

    def test_f32_spin_dtype_same_decisions(self, key):
        ell = _ell()
        eng8 = S.SortedSparseTEngine(ell, spin_dtype=jnp.int8)
        eng32 = S.SortedSparseTEngine(ell, spin_dtype=jnp.float32)
        k1, k2 = jax.random.split(key)
        spins = jnp.where(jax.random.uniform(k1, (3, ell.n_padded)) < 0.5,
                          -1.0, 1.0)
        u_t = jax.random.uniform(k2, (3, ell.n_padded))[
            :, eng8._perm_gather].T
        s8, _, c8 = eng8.sweep_with_uniforms(eng8.to_layout(spins), 0.9, u_t)
        s32, _, c32 = eng32.sweep_with_uniforms(eng32.to_layout(spins), 0.9,
                                                u_t)
        assert s32.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(c8), np.asarray(c32))
        np.testing.assert_array_equal(np.asarray(s8.astype(jnp.float32)),
                                      np.asarray(s32))

    def test_alignment_invariants(self):
        ell = _ell()
        eng = S.SortedSparseTEngine(ell)
        assert eng.n_sorted % 256 == 0
        covered = []
        for off, mc, bs in eng.groups:
            assert off % 32 == 0 and mc % 32 == 0
            pos = off
            for b in bs:
                assert b.off == pos and b.m % 8 == 0
                pos += b.m
                covered.append((b.off, b.m))
        # every real spin appears exactly once across bucket rows
        real = np.concatenate([eng.perm[o:o + m] for o, m in covered])
        real = real[real >= 0]
        assert len(real) == ell.n_spins
        assert len(np.unique(real)) == ell.n_spins
        # padding rows never accept: mask is -inf exactly off the real rows
        mask = np.asarray(eng.mask_col)[:, 0]
        assert np.all(np.isneginf(mask[np.asarray(eng.perm) < 0]))
        assert np.all(mask[np.asarray(eng.perm) >= 0] == 0.0)

    def test_padding_rows_never_flip(self, key):
        ell = _ell()
        eng = S.SortedSparseTEngine(ell)
        s_t = eng.to_layout(jnp.ones((2, ell.n_padded)))
        pad = np.asarray(eng.perm) < 0
        s1 = s_t
        for i in range(3):
            s1, _, _ = eng.sweep(s1, jnp.float32(0.1),
                                 jax.random.fold_in(key, i))
        np.testing.assert_array_equal(np.asarray(s1)[pad],
                                      np.asarray(s_t)[pad])

    def test_make_engine_selection(self):
        ell = _ell()
        # explicit override always yields the transposed engine
        eng = make_engine(ell, sweep_method="sparse_t")
        assert eng.name == "sparse_sorted_t"
        # narrow replica hint keeps the [R, N] engine
        eng = make_engine(ell, r_hint=16)
        assert eng.name == "sparse_sorted"
        # wide hint selects the transposed engine only on TPU backends
        eng = make_engine(ell, r_hint=1024)
        expected = ("sparse_sorted_t" if jax.default_backend() == "tpu"
                    else "sparse_sorted")
        assert eng.name == expected

    def test_sa_driver_end_to_end(self, key):
        """The SA driver runs with the transposed engine (layout 'nr',
        int8 state) and improves energy."""
        from spinglass_tpu.anneal import sa

        ell = _ell(n=128, seed=5)
        cfg = sa.SAConfig(n_sweeps=200, n_replicas=8,
                          sweep_method="sparse_t", enable_early_stop=False,
                          seed=1)
        engine = sa.make_sweep_engine(ell, cfg)
        assert engine.name == "sparse_sorted_t"
        res = sa.anneal(ell, cfg)
        e_rand = float(np.mean(np.asarray(
            S.sparse_energy(ell, jnp.ones((1, ell.n_padded))))))
        assert res.best_energy < e_rand

    def test_pt_driver_end_to_end(self):
        from spinglass_tpu.anneal import pt as pt_mod

        ell = _ell(n=128, seed=5)
        cfg = pt_mod.PTConfig(n_replicas=4, n_sweeps=80,
                              exchange_interval=10, sweep_method="sparse_t",
                              seed=1)
        res = pt_mod.run(ell, cfg)
        assert np.isfinite(res.best_energy)
        assert res.best_energy <= float(np.mean(res.energy_history[0]))


class TestSingleCallSweep:
    """accept_kernel='single' (r5, VERDICT r4 task 4): the WHOLE colored
    sweep — gather, fields, thresholds, flips — as ONE pallas_call with
    spins VMEM-resident. Measured 478 us/sweep = 21.4 Gflips/s on v5e at
    [10k, R=1024] vs the threshold path's 996 us; default on TPU. These
    CPU tests drive the interpret-mode no-RNG kernel variant. Parity/bind
    and energy/padding are SEPARATE tests: the combined original measured
    ~13 s sequential and 27 s under the 2-worker suite (each test pays 1-2
    interpret-mode compiles; splitting halves the worst single test)."""

    def test_decision_parity_and_bind_roundtrip(self, key):
        """Bit-exact decision parity with the per-color XLA sweep, and
        bind(operands()) behavior identity (the bound copy SHARES the
        compiled call cache, so the roundtrip adds ~10 ms)."""
        from spinglass_tpu.kernels.sparse import SortedSparseTEngine

        ell = _ell(n=96, seed=3)
        base = SortedSparseTEngine(ell)
        single = SortedSparseTEngine(ell, accept_kernel="single",
                                     single_rows_per_step=8)
        r = 128
        s_rn = random_spins(key, (r, ell.n_padded), ell.active_mask)
        u = jax.random.uniform(jax.random.key(1), (base.n_sorted, r),
                               jnp.float32)
        sb, deb, cb = base.sweep_with_uniforms(
            base.to_layout(s_rn), jnp.float32(0.8), u)
        ss, des, cs = single.sweep_with_uniforms(
            single.to_layout(s_rn), jnp.float32(0.8), u)
        np.testing.assert_array_equal(np.asarray(sb, np.float32),
                                      np.asarray(ss))
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(cs))
        np.testing.assert_allclose(np.asarray(deb), np.asarray(des),
                                   rtol=1e-4, atol=1e-3)
        bound = single.bind(jax.tree.map(lambda x: x, single.operands()))
        s1b, deb2, cb2 = bound.sweep_with_uniforms(
            single.to_layout(s_rn), jnp.float32(0.8), u)
        np.testing.assert_array_equal(np.asarray(ss), np.asarray(s1b))
        assert "single" in single.operands()

    def test_energy_identity_and_padding_inert(self, key):
        """E0+dE==E1 through engine.sweep (host-threshold path on CPU) and
        inert (padding) sorted rows never flip."""
        from spinglass_tpu.kernels.sparse import SortedSparseTEngine

        ell = _ell(n=96, seed=3)
        single = SortedSparseTEngine(ell, accept_kernel="single",
                                     single_rows_per_step=8)
        st = single.to_layout(random_spins(key, (128, ell.n_padded),
                                           ell.active_mask))
        e0 = single.energy(st)
        s1, de, cnt = single.sweep(st, jnp.float32(0.7), jax.random.key(4))
        np.testing.assert_allclose(np.asarray(e0 + de),
                                   np.asarray(single.energy(s1)),
                                   rtol=1e-4, atol=1e-2)
        pad = np.asarray(single.perm) < 0
        assert pad.any()
        np.testing.assert_array_equal(np.asarray(s1)[pad],
                                      np.asarray(st)[pad])

    def test_explicit_single_rejects_unaligned_r(self, key):
        from spinglass_tpu.kernels.sparse import SortedSparseTEngine

        ell = _ell(n=128, seed=5)
        eng = SortedSparseTEngine(ell, accept_kernel="single")
        s = eng.to_layout(random_spins(key, (8, ell.n_padded),
                                       ell.active_mask))
        with pytest.raises(ValueError, match="128"):
            eng.sweep(s, jnp.float32(1.0), jax.random.key(0))

    def test_auto_mode_on_cpu_uses_threshold_path(self):
        from spinglass_tpu.kernels.sparse import SortedSparseTEngine

        eng = SortedSparseTEngine(_ell(n=128, seed=5))  # auto
        assert not eng._use_single  # CPU backend

"""Sweep-engine correctness: blocked sweep == sequential oracle, colored sweep
validity, energy bookkeeping, and statistical physics sanity (detailed balance
via exact Boltzmann comparison on a tiny system)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.core import energy as E
from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem, random_spins
from spinglass_tpu.kernels import sweeps as K


def _mk_problem(n=24, seed=0, dist="gaussian"):
    j = topology.fully_connected(n, dist=dist, scale=0.5, seed=seed)
    h = np.random.default_rng(seed).normal(0, 0.3, n)
    return IsingProblem.from_dense(j, h)


class TestBlockedSweep:
    @pytest.mark.parametrize("block_size", [32, 64, 128])
    @pytest.mark.parametrize("rule", ["metropolis", "glauber"])
    def test_matches_sequential_oracle(self, block_size, rule, key):
        """The rank-1-correction blocked sweep must reproduce a fully
        sequential sweep exactly (site order 0..N-1, same uniforms)."""
        p = _mk_problem(24, seed=1)
        r = 5
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (r, p.n_padded), p.active_mask)
        uniforms = jax.random.uniform(k2, (r, p.n_padded))
        beta = 0.7
        out, de, cnt = K.blocked_sweep(p, spins, jnp.float32(beta), uniforms,
                                       block_size=block_size, rule=rule)
        jn = np.asarray(p.j, np.float64)
        hn = np.asarray(p.h, np.float64)
        for ri in range(r):
            # Guided oracle: verify each decision against float64 truth, but at
            # float-borderline cases (|u - p| < 1e-4, where f32 vs f64 rounding
            # legitimately differs) adopt the kernel's decision and continue.
            s_ref, de_ref, cnt_ref = _masked_oracle(
                jn, hn, np.asarray(spins[ri]), beta,
                np.asarray(uniforms[ri]), np.asarray(p.active_mask), rule,
                follow=np.asarray(out[ri]))
            np.testing.assert_array_equal(np.asarray(out[ri]), s_ref)
            assert int(cnt[ri]) == cnt_ref
            np.testing.assert_allclose(float(de[ri]), de_ref, rtol=1e-2,
                                       atol=1e-2)

    def test_energy_bookkeeping(self, key):
        """Incremental dE accumulation equals full energy recompute."""
        p = _mk_problem(30, seed=2)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (4, p.n_padded), p.active_mask)
        e0 = E.energy(p, spins)
        u = jax.random.uniform(k2, (4, p.n_padded))
        out, de, _ = K.blocked_sweep(p, spins, jnp.float32(0.5), u)
        e1 = E.energy(p, out)
        # f32 roundoff accumulates over the sweep (the algorithm is exact in
        # f64 — verified 1e-15 — and the SA driver resyncs exact energies per
        # chunk); allow f32-scale drift here.
        np.testing.assert_allclose(np.asarray(e0 + de), np.asarray(e1),
                                   rtol=5e-3, atol=0.1)

    def test_zero_temperature_is_greedy(self, key):
        """At beta→inf only dE<0 moves are accepted → energy never rises."""
        p = _mk_problem(20, seed=3)
        spins = random_spins(key, (8, p.n_padded), p.active_mask)
        e = E.energy(p, spins)
        for i in range(5):
            u = jax.random.uniform(jax.random.key(i), (8, p.n_padded))
            spins, de, _ = K.blocked_sweep(p, spins, jnp.float32(1e8), u)
            e2 = E.energy(p, spins)
            assert np.all(np.asarray(e2) <= np.asarray(e) + 1e-3)
            e = e2

    def test_padding_never_flips(self, key):
        p = _mk_problem(10, seed=4)
        spins = random_spins(key, (3, p.n_padded), p.active_mask)
        u = jnp.zeros((3, p.n_padded))  # u=0 would accept everything
        out, _, cnt = K.blocked_sweep(p, spins, jnp.float32(0.01), u)
        assert np.all(np.asarray(out[:, 10:]) == 1.0)
        assert np.all(np.asarray(cnt) <= 10)


def _masked_oracle(j, h, s, beta, u, mask, rule, follow=None, border_tol=1e-4):
    """Sequential float64 oracle. When `follow` (the kernel's final spins) is
    given, borderline accepts (|u - p| < border_tol) take the kernel's decision
    — each spin is proposed exactly once per sweep, so follow[i] != s_initial[i]
    identifies the kernel's flip choice."""
    s0 = s.astype(np.float64).copy()
    s = s0.copy()
    de_sum, cnt = 0.0, 0
    for i in range(len(s)):
        if mask[i] <= 0:
            continue
        f = float(j[i] @ s + h[i])
        de = 2.0 * s[i] * f
        if rule == "metropolis":
            pacc = np.exp(-beta * max(de, 0.0))
        else:
            pacc = 1.0 / (1.0 + np.exp(np.clip(beta * de, -500, 500)))
        if follow is not None and abs(u[i] - pacc) < border_tol:
            acc = follow[i] != s0[i]
        else:
            acc = u[i] < pacc
        if acc:
            s[i] = -s[i]
            de_sum += de
            cnt += 1
    return s, de_sum, cnt


class TestColoredSweep:
    def test_grid_colored_matches_color_sequential_oracle(self, grid_problem, key):
        """Colored sweep == sequential updates processed color-by-color
        (exactness of simultaneous same-color flips)."""
        p = grid_problem
        jn = np.asarray(p.j, np.float64)[:64, :64]
        colors = topology.greedy_coloring(jn)
        masks = K.color_masks_from_colors(colors, p.n_padded)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (2, p.n_padded), p.active_mask)
        u = jax.random.uniform(k2, (2, p.n_padded))
        beta = 0.8
        out, de, cnt = K.colored_sweep(p, masks, spins, jnp.float32(beta), u)

        for r in range(2):
            s = np.asarray(spins[r], np.float64).copy()
            hn = np.asarray(p.h, np.float64)
            jp = np.asarray(p.j, np.float64)
            de_ref, cnt_ref = 0.0, 0
            for c in range(int(colors.max()) + 1):
                for i in np.nonzero(colors == c)[0]:
                    f = float(jp[i] @ s + hn[i])
                    dei = 2.0 * s[i] * f
                    if np.asarray(u[r])[i] < np.exp(-beta * max(dei, 0.0)):
                        s[i] = -s[i]
                        de_ref += dei
                        cnt_ref += 1
            np.testing.assert_array_equal(np.asarray(out[r])[:64], s[:64])
            assert int(cnt[r]) == cnt_ref

    def test_energy_bookkeeping(self, grid_problem, key):
        p = grid_problem
        colors = topology.greedy_coloring(np.asarray(p.j)[:64, :64])
        masks = K.color_masks_from_colors(colors, p.n_padded)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (6, p.n_padded), p.active_mask)
        e0 = E.energy(p, spins)
        u = jax.random.uniform(k2, (6, p.n_padded))
        out, de, _ = K.colored_sweep(p, masks, spins, jnp.float32(0.4), u)
        np.testing.assert_allclose(np.asarray(e0 + de),
                                   np.asarray(E.energy(p, out)),
                                   rtol=1e-4, atol=1e-3)


class TestPallasKernel:
    """Pallas blocked sweep (interpret mode on CPU) must match the XLA
    reference implementation bit-for-bit in flip decisions."""

    @pytest.mark.parametrize("rule", ["metropolis", "glauber"])
    def test_pallas_matches_xla(self, rule, key):
        from spinglass_tpu.kernels import metropolis_pallas as MP

        p = _mk_problem(24, seed=6)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (4, p.n_padded), p.active_mask)
        u = jax.random.uniform(k2, (4, p.n_padded))
        beta = jnp.float32(0.8)
        # block 32 halves the unrolled interpret-mode trace vs 64 (same
        # parity coverage; suite-budget VERDICT r4 task 8)
        s_x, de_x, cnt_x = K.blocked_sweep(p, spins, beta, u, block_size=32,
                                           rule=rule)
        s_p, de_p, cnt_p = MP.blocked_sweep_pallas(
            p, spins, beta, u, block_size=32, rule=rule, interpret=True)
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
        np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
        np.testing.assert_allclose(np.asarray(de_x), np.asarray(de_p),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow  # per-replica beta also covered non-slow by
    # test_sharded_pallas_energy_identity (beta [r]) and the TPU tier
    def test_pallas_per_replica_beta(self, key):
        from spinglass_tpu.kernels import metropolis_pallas as MP

        p = _mk_problem(16, seed=8)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (4, p.n_padded), p.active_mask)
        u = jax.random.uniform(k2, (4, p.n_padded))
        beta = jnp.asarray([0.1, 0.5, 1.0, 5.0], jnp.float32)
        s_x, _, cnt_x = K.blocked_sweep(p, spins, beta, u, block_size=128)
        s_p, _, cnt_p = MP.blocked_sweep_pallas(p, spins, beta, u,
                                                block_size=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
        np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))


@pytest.mark.slow
class TestDetailedBalance:
    """Empirical Boltzmann-distribution check on a 6-spin system: long-run state
    frequencies from the blocked sweep must match exp(-beta E)/Z. This is the
    statistical-correctness test the reference never had (SURVEY §5: the CUDA
    kernel's all-site update breaks detailed balance; our engines must not)."""

    @pytest.mark.parametrize("sweep_kind", ["blocked", "colored"])
    def test_boltzmann_sampling(self, sweep_kind):
        n = 6
        rng = np.random.default_rng(11)
        if sweep_kind == "blocked":
            j = topology.fully_connected(n, dist="gaussian", scale=0.4, seed=11)
        else:
            j = topology.chain(n, periodic=True, dist="binary", seed=11)
        h = rng.normal(0, 0.2, n)
        p = IsingProblem.from_dense(j, h)
        beta = 0.6

        # exact Boltzmann distribution
        states = np.array(list(itertools.product([-1.0, 1.0], repeat=n)))
        energies = np.array([-0.5 * s @ j @ s - h @ s for s in states])
        logw = -beta * energies
        probs = np.exp(logw - logw.max())
        probs /= probs.sum()

        r = 512
        n_sweeps = 400
        spins = random_spins(jax.random.key(0), (r, p.n_padded), p.active_mask)
        if sweep_kind == "colored":
            colors = topology.greedy_coloring(j)
            masks = K.color_masks_from_colors(colors, p.n_padded)

        def step(carry, k):
            s = carry
            u = jax.random.uniform(k, (r, p.n_padded))
            if sweep_kind == "blocked":
                s, _, _ = K.blocked_sweep(p, s, jnp.float32(beta), u,
                                          block_size=128)
            else:
                s, _, _ = K.colored_sweep(p, masks, s, jnp.float32(beta), u)
            return s, s[:, :n]

        keys = jax.random.split(jax.random.key(1), n_sweeps)
        _, trace = jax.lax.scan(step, spins, keys)
        # discard burn-in, pool samples
        samples = np.asarray(trace[100:]).reshape(-1, n)
        codes = ((samples > 0) * (2 ** np.arange(n))).sum(axis=1).astype(int)
        state_codes = ((states > 0) * (2 ** np.arange(n))).sum(axis=1).astype(int)
        counts = np.bincount(codes, minlength=2 ** n)
        emp = counts / counts.sum()
        emp_aligned = emp[state_codes]
        # total-variation distance small
        tv = 0.5 * np.abs(emp_aligned - probs).sum()
        assert tv < 0.05, f"TV distance {tv} too large — detailed balance broken?"


class TestPipelinedKernel:
    @pytest.mark.slow
    def test_pipelined_matches_base_decisions(self, key):
        """The software-pipelined FusedSweep (prefetch H_pre + sub-diagonal
        repair) must make bitwise-identical flip decisions to the in-order
        kernel under the same host uniforms (interpret mode on CPU)."""
        import jax
        import numpy as np

        from spinglass_tpu.core import topology
        from spinglass_tpu.core.problem import IsingProblem, random_spins
        from spinglass_tpu.kernels.metropolis_pallas import FusedSweep

        n, r = 256, 8
        j = topology.fully_connected(n, dist="gaussian",
                                     scale=1.0 / np.sqrt(n), seed=1)
        p = IsingProblem.from_dense(j)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (r, p.n_padded), p.active_mask).T
        u = jax.random.uniform(k2, (p.n_padded, r))
        beta = jnp.float32(0.8)
        base = FusedSweep(p, precision="highest", interpret=True)
        pipe = FusedSweep(p, precision="highest", interpret=True,
                          pipelined=True)
        s0, de0, c0 = base.sweep_with_uniforms(spins, beta, u)
        s1, de1, c1 = pipe.sweep_with_uniforms(spins, beta, u)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_allclose(np.asarray(de0), np.asarray(de1),
                                   rtol=1e-4, atol=1e-3)


class TestHeatBathRule:
    """heat_bath is the reference's third update rule
    (spin_dynamics.py:172-191); for +-1 Ising it equals Glauber, and the
    framework must accept the name everywhere rules are plumbed."""

    def test_canonical_rule(self):
        assert K.canonical_rule("heat_bath") == "glauber"
        assert K.canonical_rule("metropolis") == "metropolis"
        with pytest.raises(ValueError):
            K.canonical_rule("bogus")

    def test_heat_bath_matches_glauber_decisions(self, key):
        p = _mk_problem(16, seed=3)
        k1, k2 = jax.random.split(key)
        spins = random_spins(k1, (3, p.n_padded), p.active_mask)
        u = jax.random.uniform(k2, (3, p.n_padded))
        out_hb, de_hb, cnt_hb = K.blocked_sweep(
            p, spins, jnp.float32(0.8), u, block_size=32, rule="heat_bath")
        out_gl, de_gl, cnt_gl = K.blocked_sweep(
            p, spins, jnp.float32(0.8), u, block_size=32, rule="glauber")
        np.testing.assert_array_equal(np.asarray(out_hb), np.asarray(out_gl))
        np.testing.assert_array_equal(np.asarray(cnt_hb), np.asarray(cnt_gl))

    def test_engine_accepts_heat_bath(self, key):
        from spinglass_tpu.anneal.engines import make_engine

        p = _mk_problem(16, seed=4)
        eng = make_engine(p, sweep_method="blocked", use_pallas="never",
                          update_rule="heat_bath")
        assert eng.rule == "glauber"


@pytest.mark.slow
class TestFoldedKernel:
    def test_folded_matches_base_decisions(self, key):
        """Sublane-folded FusedSweep variant (r4 experiment, measured
        perf-neutral on v5e — see _make_kernel_folded docstring) must make
        bitwise-identical decisions to the flat kernel under the same
        uniforms."""
        from spinglass_tpu.core.problem import random_spins
        from spinglass_tpu.kernels.metropolis_pallas import FusedSweep

        p = _mk_problem(48, seed=12)
        r = 64
        base = FusedSweep(p, block_size=128, interpret=True)
        fold = FusedSweep(p, block_size=128, interpret=True, folded=True)
        k1, k2 = jax.random.split(key)
        s = random_spins(k1, (r, p.n_padded), p.active_mask).T
        u = jax.random.uniform(k2, (p.n_padded, r), jnp.float32)
        beta = jnp.full((r,), 0.8, jnp.float32)
        s_b, de_b, cnt_b = base.sweep_with_uniforms(s, beta, u)
        s_f, de_f, cnt_f = fold.sweep_with_uniforms(s, beta, u)
        np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_f))
        np.testing.assert_array_equal(np.asarray(cnt_b), np.asarray(cnt_f))
        np.testing.assert_allclose(np.asarray(de_b), np.asarray(de_f),
                                   atol=1e-3)


@pytest.mark.slow
class TestInterleavedKernel:
    @pytest.mark.parametrize("nchains", [2, 4])
    def test_interleaved_matches_base_decisions(self, key, nchains):
        """Chain-interleaved FusedSweep (r5, VERDICT r4 task 3: private
        per-chain scratch refs so independent replica sub-tiles' dependency
        chains hide each other's latency) must make bitwise-identical
        decisions to the flat kernel under the same uniforms — every op is
        lane-wise, chains only re-partition the replica axis."""
        from spinglass_tpu.core.problem import random_spins
        from spinglass_tpu.kernels.metropolis_pallas import FusedSweep

        p = _mk_problem(48, seed=13)
        r = 128 * nchains  # rc = 128, the lane-alignment minimum
        base = FusedSweep(p, block_size=128, interpret=True)
        inter = FusedSweep(p, block_size=128, interpret=True,
                           interleave=nchains)
        k1, k2 = jax.random.split(key)
        s = random_spins(k1, (r, p.n_padded), p.active_mask).T
        u = jax.random.uniform(k2, (p.n_padded, r), jnp.float32)
        beta = jnp.full((r,), 0.8, jnp.float32)
        s_b, de_b, cnt_b = base.sweep_with_uniforms(s, beta, u)
        s_i, de_i, cnt_i = inter.sweep_with_uniforms(s, beta, u)
        np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_i))
        np.testing.assert_array_equal(np.asarray(cnt_b), np.asarray(cnt_i))
        np.testing.assert_allclose(np.asarray(de_b), np.asarray(de_i),
                                   atol=1e-3)

    def test_interleave_validates(self):
        from spinglass_tpu.kernels.metropolis_pallas import FusedSweep

        p = _mk_problem(48, seed=13)
        with pytest.raises(ValueError, match="combine"):
            FusedSweep(p, interleave=2, folded=True)

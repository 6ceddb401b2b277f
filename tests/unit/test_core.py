"""Core-layer tests: energy identities, padding invariance, serialization,
constraint compilation — porting the reference's assertion ideas
(tests/unit/test_core_ising_model.py) to the functional API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.core import constraints as C
from spinglass_tpu.core import energy as E
from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem, random_spins


def brute_energy(j, h, s):
    return -0.5 * s @ j @ s - h @ s


class TestProblem:
    def test_padding_and_symmetry(self):
        j = np.random.default_rng(0).normal(size=(10, 10))
        p = IsingProblem.from_dense(j, np.ones(10))
        assert p.n_spins == 10
        assert p.n_padded == 128
        jn = np.asarray(p.j)
        np.testing.assert_allclose(jn, jn.T, atol=1e-6)
        assert np.all(np.diag(jn) == 0)
        # padding rows/cols are zero
        assert np.all(jn[10:] == 0) and np.all(jn[:, 10:] == 0)
        assert np.all(np.asarray(p.h)[10:] == 0)

    def test_energy_identity(self, small_problem, key):
        """H = -1/2 s^T J s - h^T s (reference ising_model.py:149-174)."""
        s = random_spins(key, (4, small_problem.n_padded), small_problem.active_mask)
        e = E.energy(small_problem, s)
        n = small_problem.n_spins
        jn = np.asarray(small_problem.j, np.float64)[:n, :n]
        hn = np.asarray(small_problem.h, np.float64)[:n]
        for r in range(4):
            sr = np.asarray(s[r], np.float64)[:n]
            np.testing.assert_allclose(float(e[r]), brute_energy(jn, hn, sr),
                                       rtol=1e-5)

    def test_padding_does_not_change_energy(self, key):
        j = topology.random_graph(20, density=0.3, seed=1)
        h = np.random.default_rng(1).normal(size=20)
        p_pad = IsingProblem.from_dense(j, h, pad=True)
        p_nopad = IsingProblem.from_dense(j, h, pad=False)
        s20 = random_spins(key, (3, 20))
        s_pad = jnp.concatenate(
            [s20, jnp.ones((3, p_pad.n_padded - 20))], axis=1)
        np.testing.assert_allclose(
            E.energy(p_pad, s_pad), E.energy(p_nopad, s20), rtol=1e-5)

    def test_delta_energy_matches_flip(self, small_problem, key):
        """dE_i = 2 s_i field_i equals E(flip i) - E(s) for every i
        (reference ising_model.py:125-147)."""
        s = random_spins(key, (small_problem.n_padded,), small_problem.active_mask)
        de = E.delta_energy(small_problem, s)
        e0 = E.energy(small_problem, s)
        for i in range(small_problem.n_spins):
            s2 = s.at[i].multiply(-1.0)
            np.testing.assert_allclose(
                float(E.energy(small_problem, s2) - e0), float(de[i]),
                rtol=1e-4, atol=1e-4)

    def test_serialization_roundtrip(self, small_problem, tmp_path):
        path = str(tmp_path / "prob.npz")
        small_problem.save(path)
        p2 = IsingProblem.load(path)
        np.testing.assert_allclose(np.asarray(small_problem.j),
                                   np.asarray(p2.j), atol=1e-6)
        assert p2.n_spins == small_problem.n_spins

    def test_from_terms_matches_dense(self):
        n = 12
        rng = np.random.default_rng(5)
        qi = rng.integers(0, n, 30)
        qj = (qi + 1 + rng.integers(0, n - 1, 30)) % n
        qv = rng.normal(size=30)
        li = rng.integers(0, n, 10)
        lv = rng.normal(size=10)
        p = IsingProblem.from_terms(n, qi, qj, qv, li, lv)
        jd = np.zeros((n, n))
        np.add.at(jd, (qi, qj), qv)
        np.add.at(jd, (qj, qi), qv)
        np.fill_diagonal(jd, 0)
        hd = np.zeros(n)
        np.add.at(hd, li, lv)
        np.testing.assert_allclose(np.asarray(p.j)[:n, :n], jd, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p.h)[:n], hd, rtol=1e-6)

    def test_magnetization_uses_logical_spins(self, key):
        p = IsingProblem.from_dense(np.zeros((5, 5)))
        s = jnp.ones((p.n_padded,))
        assert float(E.magnetization(p, s)) == pytest.approx(1.0)

    def test_invalid_inputs_rejected(self):
        with pytest.raises(ValueError):
            IsingProblem.from_dense(np.ones((3, 4)))
        bad = np.zeros((4, 4))
        bad[0, 1] = np.nan
        with pytest.raises(ValueError):
            IsingProblem.from_dense(bad)


class TestTopology:
    def test_grid_is_two_colorable(self):
        j = topology.grid_2d(6, 6)
        colors = topology.greedy_coloring(j)
        assert colors.max() + 1 == 2
        # no edge joins same colors
        rows, cols = np.nonzero(j)
        assert np.all(colors[rows] != colors[cols])

    def test_coloring_valid_on_random_graph(self):
        j = topology.random_graph(40, density=0.15, seed=2)
        colors = topology.greedy_coloring(j)
        rows, cols = np.nonzero(j)
        assert np.all(colors[rows] != colors[cols])

    @pytest.mark.parametrize("builder,kwargs", [
        (topology.fully_connected, {}),
        (topology.chain, {"periodic": True}),
        (topology.grid_2d, {}),
        (topology.random_graph, {"density": 0.2}),
        (topology.small_world, {}),
        (topology.scale_free, {}),
    ])
    def test_generators_symmetric_zero_diag(self, builder, kwargs):
        if builder is topology.grid_2d:
            j = builder(5, 5, **kwargs)
        else:
            j = builder(25, **kwargs)
        np.testing.assert_allclose(j, j.T)
        assert np.all(np.diag(j) == 0)
        assert np.count_nonzero(j) > 0

    def test_density_and_degrees(self):
        j = topology.chain(10)
        assert topology.density(j) == pytest.approx(9 / 45)
        assert topology.degrees(j)[0] == 1
        assert topology.degrees(j)[5] == 2


class TestConstraints:
    def _enumerate_penalty(self, terms, n):
        """Evaluate compiled penalty on all 2^n spin configs."""
        out = {}
        for bits in range(2 ** n):
            s = np.array([1.0 if (bits >> i) & 1 else -1.0 for i in range(n)])
            out[bits] = C.penalty_energy(terms, s)
        return out

    def test_equality_penalty_zero_iff_satisfied(self):
        # s0 + s1 + s2 == 1
        c = C.EqualityConstraint(indices=np.arange(3), coeffs=np.ones(3),
                                 target=1.0, weight=2.0)
        pen = self._enumerate_penalty(c.terms(), 3)
        for bits, p in pen.items():
            s = np.array([1.0 if (bits >> i) & 1 else -1.0 for i in range(3)])
            expected = 2.0 * (s.sum() - 1.0) ** 2
            assert p == pytest.approx(expected, abs=1e-9)

    def test_cardinality_exactly_k(self):
        """Penalty is minimized exactly on k-hot configs
        (reference constraints.py:147-158)."""
        c = C.CardinalityConstraint(indices=np.arange(4), k=2, weight=4.0)
        pen = self._enumerate_penalty(c.terms(), 4)
        for bits, p in pen.items():
            ones = bin(bits).count("1")
            if ones == 2:
                assert p == pytest.approx(0.0, abs=1e-9)
            else:
                assert p > 0.5

    @pytest.mark.parametrize("op,fn", [
        (C.LogicalOp.AND, lambda x, y: x and y),
        (C.LogicalOp.OR, lambda x, y: x or y),
        (C.LogicalOp.XOR, lambda x, y: x ^ y),
    ])
    def test_logical_gadgets(self, op, fn):
        anc = 3 if op == C.LogicalOp.XOR else None
        c = C.LogicalConstraint(op=op, x=0, y=1, z=2, ancilla=anc, weight=1.0)
        n = 4 if anc is not None else 3
        pen = self._enumerate_penalty(c.terms(), n)
        for bits, p in pen.items():
            x, y, z = (bits >> 0) & 1, (bits >> 1) & 1, (bits >> 2) & 1
            valid = fn(bool(x), bool(y)) == bool(z)
            if anc is not None:
                # valid configs must have SOME ancilla value with zero penalty
                continue
            if valid:
                assert p == pytest.approx(0.0, abs=1e-9), (bits, p)
            else:
                assert p >= 0.99

    def test_xor_min_over_ancilla(self):
        c = C.LogicalConstraint(op=C.LogicalOp.XOR, x=0, y=1, z=2, ancilla=3)
        pen = self._enumerate_penalty(c.terms(), 4)
        for xyz in range(8):
            x, y, z = (xyz >> 0) & 1, (xyz >> 1) & 1, (xyz >> 2) & 1
            best = min(pen[xyz], pen[xyz | 8])
            if (x ^ y) == z:
                assert best == pytest.approx(0.0, abs=1e-9)
            else:
                assert best >= 0.99

    def test_not_gadget(self):
        c = C.LogicalConstraint(op=C.LogicalOp.NOT, x=0, z=1)
        pen = self._enumerate_penalty(c.terms(), 2)
        for bits, p in pen.items():
            x, z = bits & 1, (bits >> 1) & 1
            if z == 1 - x:
                assert p == pytest.approx(0.0, abs=1e-9)
            else:
                assert p >= 0.99

    def test_compiler_applies_to_problem(self):
        comp = C.ConstraintCompiler()
        comp.add(C.CardinalityConstraint(name="pick2", indices=np.arange(4),
                                         k=2, weight=8.0))
        t = comp.compile()
        p = IsingProblem.from_terms(
            6, t.quad_i, t.quad_j, t.quad_v, t.lin_i, t.lin_v)
        # 2-hot configs should have lowest energy (energy excludes const shift)
        from itertools import product
        energies = {}
        for s_bits in product([-1.0, 1.0], repeat=6):
            s = np.zeros(p.n_padded)
            s[:6] = s_bits
            s[6:] = 1.0
            energies[s_bits] = float(E.energy(p, jnp.asarray(s)))
        best = min(energies.values())
        for s_bits, e in energies.items():
            ones = sum(1 for b in s_bits[:4] if b > 0)
            if ones == 2:
                assert e == pytest.approx(best, abs=1e-4)
            else:
                assert e > best + 0.5

    def test_violation_reporting(self):
        comp = C.ConstraintCompiler()
        comp.add(C.CardinalityConstraint(name="c1", indices=np.arange(3), k=1))
        s = np.array([1.0, 1.0, -1.0])
        assert comp.count_violations(s) == 1
        assert comp.violation_report(s)["c1"] == pytest.approx(1.0)
        s_ok = np.array([1.0, -1.0, -1.0])
        assert comp.count_violations(s_ok) == 0

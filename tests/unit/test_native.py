"""Native C++ host-kernel tests: compile, bind, and match numpy fallbacks."""

import numpy as np
import pytest

from spinglass_tpu import native
from spinglass_tpu.core import topology


@pytest.fixture(scope="module")
def lib_available():
    return native.available()


class TestNative:
    def test_compiles_in_this_env(self, lib_available):
        # g++ is baked into the image; the native path must be live here
        assert lib_available

    def test_build_ell_matches_python(self):
        rng = np.random.default_rng(0)
        n, n_pad = 50, 128
        j = topology.random_graph(n, density=0.1, seed=1)
        rows, cols = np.nonzero(j)
        vals = j[rows, cols]
        idx, val, max_deg = native.build_ell(rows, cols, vals, n_pad, 16)
        assert idx.shape == (n_pad, 16)
        # reconstruct fields and compare against dense
        s = rng.choice([-1.0, 1.0], n_pad)
        f_ell = (val * s[idx]).sum(axis=1)
        f_dense = np.zeros(n_pad)
        f_dense[:n] = j @ s[:n]
        np.testing.assert_allclose(f_ell, f_dense, atol=1e-5)
        assert max_deg == int((j != 0).sum(axis=1).max())

    def test_coloring_valid_and_fast(self):
        j = topology.random_graph(500, density=0.02, seed=3)
        colors = topology.greedy_coloring(j)
        rows, cols = np.nonzero(j)
        assert np.all(colors[rows] != colors[cols])
        assert colors.max() + 1 <= int((j != 0).sum(axis=1).max()) + 1

    def test_coloring_max_colors_enforced(self):
        j = topology.fully_connected(20, dist="binary", seed=0)
        with pytest.raises(ValueError):
            topology.greedy_coloring(j, max_colors=5)

    def test_cardinality_terms_match_python_path(self):
        from spinglass_tpu.core import constraints as C

        supports = [np.array([0, 1, 2]), np.array([3, 4, 5, 6])]
        ks = np.array([1, 2])
        ws = np.array([2.0, 3.0])
        qi, qj, qv, li, lv, const = native.cardinality_terms_batch(
            supports, ks, ws)
        # compare against the per-constraint compiler
        ref = C.Terms.concat([
            C.quadratic_penalty_terms(supports[0], np.ones(3),
                                      2.0 * 1 - 3, 2.0),
            C.quadratic_penalty_terms(supports[1], np.ones(4),
                                      2.0 * 2 - 4, 3.0),
        ])
        np.testing.assert_array_equal(qi, ref.quad_i)
        np.testing.assert_array_equal(qj, ref.quad_j)
        np.testing.assert_allclose(qv, ref.quad_v)
        np.testing.assert_array_equal(li, ref.lin_i)
        np.testing.assert_allclose(lv, ref.lin_v)
        assert const == pytest.approx(ref.const)

    def test_scatter_add_symmetric_matches_numpy(self):
        rng = np.random.default_rng(5)
        n = 40
        qi = rng.integers(0, n, 300)
        qj = rng.integers(0, n, 300)
        qv = rng.normal(size=300)
        j_native = native.scatter_add_symmetric(qi, qj, qv, n)
        j_np = np.zeros((n, n))
        np.add.at(j_np, (qi, qj), qv)
        np.add.at(j_np, (qj, qi), qv)
        np.fill_diagonal(j_np, 0.0)
        np.testing.assert_allclose(j_native, j_np, atol=1e-12)

    def test_from_terms_uses_native_and_matches(self):
        """IsingProblem.from_terms end-to-end with the native scatter."""
        from spinglass_tpu.core.problem import IsingProblem

        rng = np.random.default_rng(7)
        n = 30
        qi = rng.integers(0, n, 100)
        qj = (qi + 1 + rng.integers(0, n - 1, 100)) % n
        qv = rng.normal(size=100)
        p = IsingProblem.from_terms(n, qi, qj, qv)
        jd = np.zeros((n, n))
        np.add.at(jd, (qi, qj), qv)
        np.add.at(jd, (qj, qi), qv)
        np.fill_diagonal(jd, 0.0)
        np.testing.assert_allclose(np.asarray(p.j)[:n, :n], jd, rtol=1e-6)


class TestBalancedColoringNative:
    def test_native_matches_python_exactly(self):
        """Native balanced greedy coloring must produce the IDENTICAL
        coloring to the Python fallback (layouts and checkpoints must not
        depend on whether a C++ compiler was present). Python 1M-node loop
        measured ~70 s; native ~1 s."""
        from spinglass_tpu import native
        from spinglass_tpu.core import topology

        if not native.available():
            pytest.skip("no C++ compiler")
        for n, deg, seed in ((150, 5.0, 1), (600, 8.0, 2)):
            rows, cols, _ = topology.sparse_random_graph_coo(
                n, avg_degree=deg, dist="gaussian", seed=seed)
            rows, cols = rows.astype(np.int64), cols.astype(np.int64)
            nat = topology.greedy_coloring_coo(rows, cols, n, balanced=True)
            orig = native.available
            native.available = lambda: False
            try:
                py = topology.greedy_coloring_coo(rows, cols, n,
                                                  balanced=True)
            finally:
                native.available = orig
            np.testing.assert_array_equal(nat, py)
            assert np.all(nat[rows] != nat[cols])   # proper coloring
            # balanced: class sizes within ~2x of each other
            sizes = np.bincount(nat)
            assert sizes.max() <= 2 * max(sizes.min(), 1) + 8

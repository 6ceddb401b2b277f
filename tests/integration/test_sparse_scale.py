"""Sparse-at-scale: the >=100k-spin dense-free path, end to end.

The reference's headline claim is "sub-second solving for problems with 10k+
variables" (reference README.md:13); its largest exercised instance was ~2k
spins (IMPLEMENTATION_REPORT.md:38). This test proves the ELL path at 100k
spins: construction never materializes an [N, N] matrix, sweeps run, energy
is finite and improves over the random initial state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.core import topology
from spinglass_tpu.kernels.sparse import EllProblem, sparse_energy

N_BIG = 100_000


@pytest.fixture(scope="module")
def big_ell():
    coo = topology.sparse_random_graph_coo(N_BIG, avg_degree=6.0,
                                           dist="gaussian", seed=7)
    return EllProblem.from_coo(N_BIG, *coo)


class TestHundredKSpins:
    def test_construction_is_dense_free(self, big_ell):
        # ELL footprint is O(N * max_degree), not O(N^2): the idx/val arrays
        # are the only per-edge storage.
        assert big_ell.n_spins == N_BIG
        n_pad, k = big_ell.idx.shape
        assert n_pad >= N_BIG and n_pad < N_BIG + 1024
        assert k < 64  # max degree of an avg-degree-6 ER graph, not N
        ell_bytes = (big_ell.idx.size * 4 + big_ell.val.size * 4
                     + big_ell.h.size * 4)
        assert ell_bytes < 200e6  # vs ~40 GB for dense f32 [N, N]

    def test_energy_finite_and_symmetric(self, big_ell, key):
        spins = jnp.where(
            jax.random.uniform(key, (2, big_ell.n_padded)) < 0.5, -1.0, 1.0
        ) * big_ell.active_mask[None, :]
        e = np.asarray(sparse_energy(big_ell, spins))
        assert np.all(np.isfinite(e))
        # flipping ALL spins leaves the (h=0) Ising energy invariant
        e_flip = np.asarray(sparse_energy(big_ell, -spins))
        np.testing.assert_allclose(e, e_flip, rtol=1e-5)

    def test_sweeps_improve_energy(self, big_ell, key):
        from spinglass_tpu.anneal.engines import make_engine

        eng = make_engine(big_ell)
        assert eng.name == "sparse_sorted"
        k1, k2 = jax.random.split(key)
        spins = eng.to_layout(jnp.where(
            jax.random.uniform(k1, (2, big_ell.n_padded)) < 0.5, -1.0, 1.0
        ) * big_ell.active_mask[None, :])
        e0 = np.asarray(eng.energy(spins))

        @jax.jit
        def run(s, key):
            def body(carry, k):
                s, de = carry
                s, d, _ = eng.sweep(s, jnp.float32(2.0), k)
                return (s, de + d), None
            (s, de), _ = jax.lax.scan(body, (s, jnp.zeros(2, jnp.float32)),
                                      jax.random.split(key, 3))
            return s, de

        s1, de = run(spins, k2)
        e1 = np.asarray(eng.energy(s1))
        assert np.all(np.isfinite(e1))
        # 3 greedy-ish sweeps at beta=2 on a random init must improve a lot
        assert np.all(e1 < e0 - 0.1 * np.abs(e0))
        # incremental dE bookkeeping matches the exact energies
        np.testing.assert_allclose(e0 + np.asarray(de), e1,
                                   rtol=1e-3, atol=50.0)

"""Wolff cluster updates, batched over replicas.

Rebuilds SpinDynamics' Wolff BFS (reference core/spin_dynamics.py:211-323 —
a per-replica Python BFS with set()s) as a jittable frontier iteration:

Each step adds every non-cluster spin j with joint probability
    p_join(j) = 1 - prod_{i in frontier} (1 - p_ij),
    p_ij     = 1 - exp(-2 beta J_ij s_i s_j)   when J_ij s_i s_j > 0
i.e. log(1 - p_join) = -2 beta sum_{i in frontier} max(J_ij s_i s_j, 0),
evaluated as one batched contraction per BFS step. The grown cluster flips
as a whole — rejection-free and ergodicity-preserving (standard Wolff), which
beats single-spin Metropolis near criticality.

Note: the inner contraction materializes [R, N, N] per BFS step, so this is
a sampling-studies tool for moderate N (like the reference's), not the
optimization hot path."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from spinglass_tpu.core import energy as energy_ops
from spinglass_tpu.core.problem import IsingProblem


@functools.partial(jax.jit, static_argnames=())
def wolff_update(problem: IsingProblem, spins: jax.Array, beta: jax.Array,
                 key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One Wolff cluster flip per replica.

    spins [R, Np]; returns (spins, cluster_size[R])."""
    r, n_pad = spins.shape
    beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
    k_seed, k_loop = jax.random.split(key)
    active = problem.active_mask > 0

    # random seed spin per replica (logical sites only)
    seed = jax.random.randint(k_seed, (r,), 0, problem.n_spins)
    cluster = jnp.zeros((r, n_pad), bool).at[jnp.arange(r), seed].set(True)
    frontier = cluster

    def cond(carry):
        _, frontier, _, it = carry
        return (it < n_pad) & jnp.any(frontier)

    def body(carry):
        cluster, frontier, key, it = carry
        key, ku = jax.random.split(key)
        # T[r, i, j] = frontier_i * J_ij * s_i * s_j ; join-log = -2b sum max(T,0)
        fs = jnp.where(frontier, spins, 0.0)                       # [R, Np]
        t = (fs[:, :, None] * problem.j[None, :, :].astype(jnp.float32)
             * spins[:, None, :])
        bond_sum = jnp.sum(jnp.maximum(t, 0.0), axis=1)            # [R, Np]
        p_join = 1.0 - jnp.exp(-2.0 * beta[:, None] * bond_sum)
        u = jax.random.uniform(ku, (r, n_pad))
        newly = (u < p_join) & ~cluster & active[None, :]
        return (cluster | newly, newly, key, it + 1)

    cluster, _, _, _ = lax.while_loop(
        cond, body, (cluster, frontier, k_loop, jnp.asarray(0)))
    spins = jnp.where(cluster, -spins, spins)
    return spins, jnp.sum(cluster, axis=-1).astype(jnp.int32)


def wolff_sweep(problem: IsingProblem, spins: jax.Array, beta: jax.Array,
                key: jax.Array, n_clusters: int = 1
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """n_clusters Wolff updates; returns (spins, dE[R], total_flipped[R]).

    dE is recomputed exactly (cluster flips change energy globally)."""
    e0 = energy_ops.energy(problem, spins)
    total = jnp.zeros((spins.shape[0],), jnp.int32)
    for i in range(n_clusters):
        key, sub = jax.random.split(key)
        spins, size = wolff_update(problem, spins, beta, sub)
        total = total + size
    e1 = energy_ops.energy(problem, spins)
    return spins, e1 - e0, total

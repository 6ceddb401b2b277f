"""Headline benchmark: spin-flips/sec/chip on dense spin-glass annealing.

Runs the fused Pallas parallel-tempering-style sweep workload (dense SK
coupling matrix, replica batch, kernel RNG) as one long jitted scan, and
reports throughput as ONE JSON line:

    {"metric": "spin_flips_per_sec_per_chip", "value": ..., "unit": "flips/s",
     "vs_baseline": ...}

Baseline: the reference has no published throughput numbers (BASELINE.md).
Its CPU sweep path does O(N) torch ops + .item() syncs per spin
(spin_dynamics.py:61-94); measured small-instance runs (breakthrough_
validation_results.json: 10 spins, ~1k sweeps, 0.053 s) put it near
2e5 flips/s, and its (unreachable; SURVEY §2.1) CUDA kernel claim was
"sub-second for 10k+ variables". We use BASELINE_FLIPS = 1e6 flips/s — a
generous CPU-reference figure — so vs_baseline is the speedup multiple.
"""

import json
import time

import numpy as np

BASELINE_FLIPS = 1.0e6

N_SPINS = 4096
N_REPLICAS = 1024
N_SWEEPS = 2000
SEED = 42


def main():
    import jax
    import jax.numpy as jnp

    from spinglass_tpu.anneal.engines import make_engine
    from spinglass_tpu.core import topology
    from spinglass_tpu.core.problem import IsingProblem, random_spins

    n, r = N_SPINS, N_REPLICAS
    if jax.default_backend() != "tpu":
        # keep CPU smoke runs tractable
        n, r, sweeps = 256, 64, 20
    else:
        sweeps = N_SWEEPS

    j = topology.fully_connected(n, dist="gaussian", scale=1.0 / np.sqrt(n),
                                 seed=SEED)
    problem = IsingProblem.from_dense(j)
    engine = make_engine(problem, sweep_method="blocked", use_pallas="auto")
    key = jax.random.key(SEED)
    spins = engine.to_layout(
        random_spins(key, (r, problem.n_padded), problem.active_mask))
    beta = jnp.float32(1.0)

    @jax.jit
    def run(s, key):
        def body(carry, k):
            s, _ = carry
            s, de, cnt = engine.sweep(s, beta, k)
            return (s, cnt), None
        (s, cnt), _ = jax.lax.scan(body, (s, jnp.zeros((r,), jnp.int32)),
                                   jax.random.split(key, sweeps))
        return s, cnt

    out = run(spins, jax.random.key(1))
    jax.block_until_ready(out)
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        out = run(spins, jax.random.key(2 + trial))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    flips = sweeps * r * n
    flips_per_sec = flips / best
    print(json.dumps({
        "metric": "spin_flips_per_sec_per_chip",
        "value": flips_per_sec,
        "unit": "flips/s",
        "vs_baseline": flips_per_sec / BASELINE_FLIPS,
    }))


if __name__ == "__main__":
    main()

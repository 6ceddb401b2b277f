"""Micro-bench 10: in-scan sparse sweep variants at wide R.

Current engine @R=1024: ~1474 us/sweep. Dependent-gather floor: ~797 us.
Variants:
  V1 engine baseline
  V2 int8 spin table for gathers (f32 state kept separately? no — int8 state,
     f32 conversion after gather)
  V3 pallas-RNG uniforms (replaces threefry in the scan)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spinglass_tpu.core import topology
from spinglass_tpu.kernels.sparse import EllProblem, SortedSparseEngine
from spinglass_tpu.kernels.sweeps import accept_threshold

N = 10000
coo = topology.sparse_random_graph_coo(N, avg_degree=6.0, dist="gaussian",
                                       seed=42)
ell = EllProblem.from_coo(N, *coo)
NP = ell.n_padded
eng = SortedSparseEngine(ell)
beta = jnp.float32(1.0)
R = 1024


def timeit(f, *args, n=8):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def marginal(mk, *args):
    return (timeit(mk(40), *args) - timeit(mk(8), *args)) / 32


key = jax.random.key(0)
spins = jnp.where(jax.random.uniform(key, (R, NP)) < 0.5, -1.0,
                  1.0).astype(jnp.float32)


# V1 baseline
def mk1(n_s):
    @jax.jit
    def f(s, key):
        def body(c, k):
            s, _ = c
            s, de, cnt = eng.sweep(s, beta, k)
            return (s, de), None
        (s, de), _ = lax.scan(body, (s, jnp.zeros(R)),
                              jax.random.split(key, n_s))
        return s, de
    return f


dt = marginal(mk1, spins, key)
print(f"V1 baseline        : {dt*1e6:8.1f} us/sweep {R*N/dt/1e9:6.2f} G",
      flush=True)


# V2: int8 spins for the gather
def make_i8_sweep(groups, rule="metropolis"):
    def sweep(spins8, beta_, uniforms):
        # spins8 [R, Np] int8
        r = spins8.shape[0]
        b = jnp.broadcast_to(jnp.asarray(beta_, jnp.float32), (r,))
        th = accept_threshold(uniforms, b[:, None], rule)
        de_acc = jnp.zeros((r,), jnp.float32)
        cnt = jnp.zeros((r,), jnp.int32)
        for off, mc, bs in groups:
            fs = []
            for bkt in bs:
                g = spins8[:, bkt.idx]                  # [R, m, k] int8
                fs.append(jnp.einsum("rmk,mk->rm", g.astype(jnp.float32),
                                     bkt.val) + bkt.h[None, :])
            f = jnp.concatenate(fs, axis=1) if len(fs) > 1 else fs[0]
            s_c = lax.slice_in_dim(spins8, off, off + mc, axis=1)
            sf = s_c.astype(jnp.float32) * f
            acc = sf < lax.slice_in_dim(th, off, off + mc, axis=1)
            s_new = jnp.where(acc, -s_c, s_c)
            spins8 = lax.dynamic_update_slice(spins8, s_new, (0, off))
            de_acc = de_acc + 2.0 * jnp.sum(jnp.where(acc, sf, 0.0), axis=-1)
            cnt = cnt + jnp.sum(acc, axis=-1).astype(jnp.int32)
        return spins8, de_acc, cnt
    return sweep


i8_sweep = make_i8_sweep(eng.color_groups)
spins8 = spins.astype(jnp.int8)


def mk2(n_s):
    @jax.jit
    def f(s8, key):
        def body(c, k):
            s8, _ = c
            u = jax.random.uniform(k, (R, NP), jnp.float32)
            s8, de, cnt = i8_sweep(s8, beta, u)
            return (s8, de), None
        (s8, de), _ = lax.scan(body, (s8, jnp.zeros(R)),
                               jax.random.split(key, n_s))
        return s8, de
    return f


dt = marginal(mk2, spins8, key)
print(f"V2 int8 table      : {dt*1e6:8.1f} us/sweep {R*N/dt/1e9:6.2f} G",
      flush=True)


# V3: pallas RNG fill instead of threefry
def _uniform_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.int32)
    out_ref[:] = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5


def pallas_uniform(seed):
    return pl.pallas_call(
        _uniform_kernel,
        out_shape=jax.ShapeDtypeStruct((R, NP), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed)


def mk3(n_s):
    @jax.jit
    def f(s, seed0):
        def body(c, i):
            s, _ = c
            u = pallas_uniform(seed0 + i[None])
            s, de, cnt = eng._sweep(s, beta, u)
            return (s, de), None
        (s, de), _ = lax.scan(body, (s, jnp.zeros(R)),
                              jnp.arange(n_s, dtype=jnp.int32))
        return s, de
    return f


try:
    dt = marginal(mk3, spins, jnp.int32(7))
    print(f"V3 pallas RNG      : {dt*1e6:8.1f} us/sweep {R*N/dt/1e9:6.2f} G",
          flush=True)
except Exception as e:
    print("V3 FAIL:", str(e)[:200], flush=True)


# V2+V3 combined
def mk4(n_s):
    @jax.jit
    def f(s8, seed0):
        def body(c, i):
            s8, _ = c
            u = pallas_uniform(seed0 + i[None])
            s8, de, cnt = i8_sweep(s8, beta, u)
            return (s8, de), None
        (s8, de), _ = lax.scan(body, (s8, jnp.zeros(R)),
                               jnp.arange(n_s, dtype=jnp.int32))
        return s8, de
    return f


try:
    dt = marginal(mk4, spins8, jnp.int32(7))
    print(f"V4 int8+pallasRNG  : {dt*1e6:8.1f} us/sweep {R*N/dt/1e9:6.2f} G",
          flush=True)
except Exception as e:
    print("V4 FAIL:", str(e)[:200], flush=True)

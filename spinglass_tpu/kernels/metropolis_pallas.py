"""Pallas TPU kernel: fused whole-sweep blocked-sequential Metropolis/Glauber.

TPU-native replacement for the reference's inline CUDA
``metropolis_update_kernel`` (annealing/cuda_kernels.py:8-50), as ONE
pallas_call per sweep with ``grid=(n_blocks,)`` and a two-level delayed-update
schedule:

* grid step b streams J's row-block ``J[bB:(b+1)B, :]`` from HBM (Pallas
  double-buffers it against compute) and computes the block's local fields
  ``H = J_rows @ s + h`` on the MXU *inside* the kernel.
* the B sequential Metropolis steps run out of VMEM in micro-blocks of
  C=8 spins (sublane granularity): within a micro-block each accepted flip
  immediately corrects only the micro-block's [C, R] field rows; when the
  micro-block finishes, its accumulated spin changes propagate to the whole
  block with one [B, C] x [C, R] MXU matmul (jbb with zeroed diagonal
  C-blocks, so nothing is double-corrected). Classic blocked delayed-update:
  VPU work per spin drops from B*R to C*R.
* spins live VMEM-resident in [N, R] layout for the whole sweep (constant
  index_map + input/output aliasing), so block b's flips are visible to block
  b+1's matmul — *exact* sequential-sweep semantics, unlike the reference CUDA
  kernel's all-sites-at-once update race (SURVEY §5).
* dE / acceptance counts are derived post-hoc per block from the identity
  dE_j * accepted_j = -ds_j * f_j (ds_j = spin change, f_j = field at decision
  time, saved to scratch), avoiding lane-padded [1, R] accumulator chains in
  the sequential loop — measured 3x kernel speedup.
* acceptance is exp-free on the critical path: each block's uniforms become
  thresholds th = -ln(u)/(2β) in one vectorized [B, R] pass
  (kernels/sweeps.py accept_threshold), so the dependent per-spin steps are
  pure mul/compare/select.
* replica tiles are picked as wide as scoped VMEM allows (vmem_limit_bytes
  raised past the 16 MB default): wide [1, R] rows amortize the VPU
  per-instruction overhead that dominates this kernel — rt 128 → 1024
  measured ~2.5x on v5e.

Two RNG modes:
* rng="host": uniforms supplied by the caller in the same [R, N] stream as the
  XLA reference implementation (kernels/sweeps.py) — both paths make identical
  flip decisions (used by tests; padding masked by setting u=2).
* rng="kernel" (fast path): uniforms generated on-chip with pltpu.prng_*, one
  [B, R] draw per block seeded by (host_seed, block); padding masked via the
  active-mask column.

Precision note: the in-kernel matmuls default to the MXU's fast f32 path
(bf16 passes). Fields may differ ~1e-3 relative vs the exact XLA path, which
flips ~0.5% of borderline accept decisions — a slightly perturbed but still
valid MC chain. Pass precision="highest" for exact f32 at ~2x kernel cost.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spinglass_tpu.core.problem import IsingProblem

MICRO = 32  # micro-block size for immediate corrections (multiple of the
# 8-row sublane granularity; 32 measured fastest on v5e — fewer delayed-update
# MXU passes outweigh the larger [C, R] immediate-correction rows)

_PRECISIONS = {
    None: None, "default": None,
    "highest": lax.Precision.HIGHEST,
}


def _make_kernel(rule: str, block_size: int, kernel_rng: bool, precision,
                 j_bf16: bool = False, micro: int = MICRO):
    prec = _PRECISIONS[precision]

    def kernel(seed_ref,     # [1] SMEM int32 (scalar prefetch; unused w/ host rng)
               jrows_ref,    # [B, Np]  J row-block, streamed per grid step
               jbb_ref,      # [B, B]   diagonal block J[bB:, bB:]
               jbb_od_ref,   # [B, B]   same, diagonal C-blocks zeroed
               h_ref,        # [B, 1]   external fields for the block
               u_ref,        # [B, R]   uniforms (host rng) or mask column (kernel rng)
               beta_ref,     # [1, R]
               s_in_ref,     # [Np, R]  spins input (aliased with s_io_ref)
               s_io_ref,     # [Np, R]  spins, VMEM-resident, aliased output
               de_out,       # [1, R]   accumulated dE
               cnt_out,      # [1, R]   accumulated accept count
               ht,           # scratch [B, R] running local fields
               sblk,         # scratch [B, R] block spins
               dsb,          # scratch [B, R] accepted spin deltas
               fb,           # scratch [B, R] field at decision time
               ub):          # scratch [B, R] uniforms (kernel rng)
        rt = pl.program_id(0)
        b = pl.program_id(1)
        bb = block_size

        @pl.when(b == 0)
        def _():
            # the output window is NOT initialized from the aliased input
            # buffer — seed it explicitly at the start of each tile's sweep
            s_io_ref[:] = s_in_ref[:]
            de_out[:] = jnp.zeros_like(de_out)
            cnt_out[:] = jnp.zeros_like(cnt_out)

        i0 = pl.multiple_of(b * bb, bb)
        if j_bf16:
            # J streamed in bf16 (half the HBM traffic); spins are exactly
            # representable in bf16, accumulation stays f32 on the MXU.
            # Measured v5e @ N=4096 R=1024: 415 vs 392 us/sweep for f32 —
            # the kernel is MXU/VPU-bound there, so the halved J traffic
            # buys nothing and the spin conversion costs; useful only when
            # J streaming dominates (N >> 4k at narrow R).
            ht[:] = jnp.dot(jrows_ref[:],
                            s_io_ref[:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + h_ref[:]
        else:
            ht[:] = jnp.dot(jrows_ref[:], s_io_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=prec) + h_ref[:]
        sblk[:] = s_io_ref[pl.ds(i0, bb), :]
        if kernel_rng:
            pltpu.prng_seed(seed_ref[0] + rt * pl.num_programs(1) + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(ub.shape), jnp.int32)
            # signed bits / 2^32 + 0.5 → uniforms in [0, 1); padded rows get
            # u >= 1 via the mask column (u_ref carries the mask in kernel-rng
            # mode: 0 on active rows, 2 on padding)
            ub[:] = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
            ub[:] = ub[:] + u_ref[:]
        else:
            ub[:] = u_ref[:]
        # Exp-free acceptance (kernels/sweeps.py accept_threshold): turn the
        # block's uniforms into thresholds th with accept ⟺ s_j·f_j < th_j in
        # ONE vectorized [B, R] pass, so the dependent per-spin loop below is
        # pure mul/compare/select — no transcendentals on the critical path.
        nib = -0.5 / beta_ref[:]  # [1, R]
        if rule == "metropolis":
            th = jnp.log(ub[:]) * nib
        else:  # glauber
            th = (jnp.log(ub[:]) - jnp.log1p(-jnp.minimum(ub[:], 0.999999))) \
                * nib
        ub[:] = jnp.where(ub[:] < 1.0, th, -jnp.inf)
        for c in range(bb // micro):
            lo, hi = c * micro, (c + 1) * micro
            for j in range(micro):  # static unroll: dependent sequential steps
                jj = lo + j
                row = sblk[jj:jj + 1, :]     # [1, R]
                f = ht[jj:jj + 1, :]
                acc = row * f < ub[jj:jj + 1, :]
                ds = jnp.where(acc, -2.0 * row, 0.0)  # [1, R]
                sblk[jj:jj + 1, :] = row + ds
                dsb[jj:jj + 1, :] = ds
                fb[jj:jj + 1, :] = f
                # immediate correction from the sublane-aligned floor of the
                # current row to the end of the micro-block. Rows < start are
                # already decided and their ht is never read again, so
                # skipping them is exact; starting at the 8-row floor keeps
                # the slice sublane-aligned (correcting jj+1:hi measures
                # SLOWER — misaligned slices cost more than the saved rows;
                # aligned-floor start measures ~3% faster than lo:hi:
                # 391.7 -> 381.7 us/sweep at N=4096 R=1024 on v5e).
                # jbb symmetric → column jj == row jj; jbb[jj, jj] == 0.
                start = lo + (j // 8) * 8
                ht[start:hi, :] = (ht[start:hi, :]
                                   + jbb_ref[start:hi, jj:jj + 1] * ds)
            # delayed update: propagate the micro-block's flips to the whole
            # block in one MXU pass (diagonal C-blocks zeroed in jbb_od)
            ht[:] = ht[:] + jnp.dot(jbb_od_ref[:, lo:hi], dsb[lo:hi, :],
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
        s_io_ref[pl.ds(i0, bb), :] = sblk[:]
        # post-hoc bookkeeping: dE_j acc_j = -ds_j f_j ; acc_j = |ds_j| / 2
        de_out[:] = de_out[:] - jnp.sum(dsb[:] * fb[:], axis=0, keepdims=True)
        cnt_out[:] = cnt_out[:] + 0.5 * jnp.sum(jnp.abs(dsb[:]), axis=0,
                                                keepdims=True)

    return kernel


def _make_kernel_folded(rule: str, block_size: int, kernel_rng: bool,
                        precision, rt: int, j_bf16: bool = False,
                        micro: int = MICRO):
    """Sublane-folded variant of _make_kernel (round-4 experiment).

    In the base kernel every dependent per-spin step operates on [1, rt]
    rows: with rt=1024 a row spans 8 vregs each using 1/8 of its sublanes,
    so the VPU executes ~8x more instructions than the data needs. Here the
    replica axis is FOLDED to [8, rt/8] for the sequential phase — one spin
    row is then a fully-packed vreg set — and the immediate correction
    becomes a [rows, 8, rt8] broadcast fma (leading-dim slices of a 3D
    array are vreg-granular, so the aligned-floor trick of the flat kernel
    is unnecessary; corrections start exactly at j+1).

    The MXU passes (row-block matmul, delayed update) keep flat [B, rt]
    operands; folds/unfolds are jnp.reshape relayouts at micro-block or
    block granularity (~4 MB per block at B=256 rt=1024).

    MEASURED NEUTRAL on v5e at the bench shape (404.4 vs 408.6 us/sweep,
    N=4096 R=1024 block=256): the sequential phase is bound by the
    LATENCY of the per-spin dependency chain (each decision feeds the next
    spin's field), not by VPU instruction issue — folding shortens the
    instruction stream ~8x but not the chain, and the reshape relayouts
    absorb the rest. Kept as a decision-parity-tested option for TPU
    generations with different VPU issue/latency balance."""
    prec = _PRECISIONS[precision]
    rt8 = rt // 8

    def kernel(seed_ref, jrows_ref, jbb_ref, jbb_od_ref, h_ref, u_ref,
               beta_ref, s_in_ref, s_io_ref, de_out, cnt_out,
               ht,           # scratch [B, rt]   flat fields (MXU target)
               sbf,          # scratch [B, 8, rt8] folded block spins
               dsb,          # scratch [B, 8, rt8] folded accepted deltas
               fbf,          # scratch [B, 8, rt8] folded decision fields
               ubf,          # scratch [B, 8, rt8] folded thresholds
               htf,          # scratch [micro, 8, rt8] folded fields (cur mb)
               dflat):       # scratch [micro, rt] flat deltas for the MXU
        t = pl.program_id(0)
        b = pl.program_id(1)
        bb = block_size

        @pl.when(b == 0)
        def _():
            s_io_ref[:] = s_in_ref[:]
            de_out[:] = jnp.zeros_like(de_out)
            cnt_out[:] = jnp.zeros_like(cnt_out)

        i0 = pl.multiple_of(b * bb, bb)
        if j_bf16:
            ht[:] = jnp.dot(jrows_ref[:],
                            s_io_ref[:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + h_ref[:]
        else:
            ht[:] = jnp.dot(jrows_ref[:], s_io_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=prec) + h_ref[:]
        sbf[:] = s_io_ref[pl.ds(i0, bb), :].reshape(bb, 8, rt8)
        if kernel_rng:
            pltpu.prng_seed(seed_ref[0] + t * pl.num_programs(1) + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits((bb, 8, rt8)),
                                 jnp.int32)
            u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
            u = u + u_ref[:].reshape(bb, 8, rt8)
        else:
            u = u_ref[:].reshape(bb, 8, rt8)
        # folding is a row-major reshape: replica r -> (r // rt8, r % rt8)
        # consistently for u/beta/spins, so decisions match the flat kernel
        nib = (-0.5 / beta_ref[:]).reshape(1, 8, rt8)
        if rule == "metropolis":
            th = jnp.log(u) * nib
        else:
            th = (jnp.log(u) - jnp.log1p(-jnp.minimum(u, 0.999999))) * nib
        ubf[:] = jnp.where(u < 1.0, th, -jnp.inf)
        for c in range(bb // micro):
            lo, hi = c * micro, (c + 1) * micro
            htf[:] = ht[lo:hi, :].reshape(micro, 8, rt8)
            for j in range(micro):
                jj = lo + j
                row = sbf[jj]                 # [8, rt8] — one packed vreg set
                f = htf[j]
                acc = row * f < ubf[jj]
                ds = jnp.where(acc, -2.0 * row, 0.0)
                sbf[jj] = row + ds
                dsb[jj] = ds
                fbf[jj] = f
                if j + 1 < micro:
                    col = jbb_ref[jj + 1:hi, jj:jj + 1]      # [rows, 1]
                    htf[j + 1:] = (htf[j + 1:]
                                   + col[:, :, None] * ds[None, :, :])
            dflat[:] = dsb[pl.ds(lo, micro)].reshape(micro, rt)
            ht[:] = ht[:] + jnp.dot(jbb_od_ref[:, lo:hi], dflat[:],
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
        s_io_ref[pl.ds(i0, bb), :] = sbf[:].reshape(bb, rt)
        de_out[:] = de_out[:] - jnp.sum(
            dsb[:] * fbf[:], axis=0).reshape(1, rt)
        cnt_out[:] = cnt_out[:] + 0.5 * jnp.sum(
            jnp.abs(dsb[:]), axis=0).reshape(1, rt)

    return kernel


def _make_kernel_interleaved(rule: str, block_size: int, kernel_rng: bool,
                             precision, rt: int, nchains: int,
                             j_bf16: bool = False, micro: int = MICRO):
    """Chain-interleaved variant (round-5, VERDICT.md r4 task 3).

    The flat kernel's sequential phase is bound by the LATENCY of the
    per-spin dependency chain: spin j's accept decision writes an ht
    correction that spin j+1's decision reads back, and because ht is ONE
    VMEM scratch ref, every step's load waits on the previous step's store
    (the folded r4 variant shortened the instruction stream 8x and measured
    neutral — issue width was never the bound). Here the replica tile is
    split into ``nchains`` independent sub-tiles with PRIVATE ht/sblk/dsb/fb
    scratch refs, and their per-spin steps are interleaved in program order:
    chain A step j, chain B step j, chain A step j+1, ... Writes to chain
    A's refs provably cannot alias chain B's, so Mosaic can issue B's
    compare/select/fma while A's store->load chain drains — up to
    ``nchains``x latency hiding with identical total VPU work.

    Decisions are bit-identical to the flat kernel for the same uniforms:
    chain ci owns replica lanes [ci*rc, (ci+1)*rc) of the tile and every
    op is lane-wise (parity-tested in tests/unit/test_sweeps.py).

    MEASURED NEUTRAL on v5e (N=4096 R=1024 b256 m32, marginal protocol
    (t500-t100)/400, 5 interleaved trials, one process): flat 388-395,
    interleave=2 390 median (one 363 outlier trial), interleave=4 422-427
    us/sweep (WORSE — [1, 256] per-op width pays fixed instruction
    overheads). Together with the r4 folded-neutral and pipelined-neutral
    results this rules latency OUT as the bound: the sequential phase is a
    throughput balance of MXU (~220 us) and VPU (~265 us) work already
    ~75% overlapped — see docs/adr/0001 addendum. Kept as an option; the
    flat kernel stays the default."""
    prec = _PRECISIONS[precision]
    if rt % nchains:
        raise ValueError(f"replica tile {rt} not divisible by {nchains}")
    rc = rt // nchains
    if rc % 128:
        raise ValueError(f"per-chain width {rc} must be lane-aligned (128)")

    def kernel(seed_ref, jrows_ref, jbb_ref, jbb_od_ref, h_ref, u_ref,
               beta_ref, s_in_ref, s_io_ref, de_out, cnt_out, *scr):
        # scr layout: ub [B, rt] shared (read-only in the loop), then
        # nchains each of ht / sblk / dsb / fb, all [B, rc] PRIVATE
        ub = scr[0]
        hts = scr[1:1 + nchains]
        sbs = scr[1 + nchains:1 + 2 * nchains]
        dss = scr[1 + 2 * nchains:1 + 3 * nchains]
        fbs = scr[1 + 3 * nchains:1 + 4 * nchains]
        t = pl.program_id(0)
        b = pl.program_id(1)
        bb = block_size

        @pl.when(b == 0)
        def _():
            s_io_ref[:] = s_in_ref[:]
            de_out[:] = jnp.zeros_like(de_out)
            cnt_out[:] = jnp.zeros_like(cnt_out)

        i0 = pl.multiple_of(b * bb, bb)
        # per-chain row-block matmuls (same MXU flops as one flat pass;
        # rc >= 128 keeps every pass lane-full)
        for ci in range(nchains):
            sl = slice(ci * rc, (ci + 1) * rc)
            if j_bf16:
                hts[ci][:] = jnp.dot(
                    jrows_ref[:], s_io_ref[:, sl].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + h_ref[:]
            else:
                hts[ci][:] = jnp.dot(jrows_ref[:], s_io_ref[:, sl],
                                     preferred_element_type=jnp.float32,
                                     precision=prec) + h_ref[:]
            sbs[ci][:] = s_io_ref[pl.ds(i0, bb), sl]
        if kernel_rng:
            # same stream as the flat kernel: one [B, rt] draw per block
            pltpu.prng_seed(seed_ref[0] + t * pl.num_programs(1) + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(ub.shape), jnp.int32)
            ub[:] = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
            ub[:] = ub[:] + u_ref[:]
        else:
            ub[:] = u_ref[:]
        nib = -0.5 / beta_ref[:]
        if rule == "metropolis":
            th = jnp.log(ub[:]) * nib
        else:
            th = (jnp.log(ub[:]) - jnp.log1p(-jnp.minimum(ub[:], 0.999999))) \
                * nib
        ub[:] = jnp.where(ub[:] < 1.0, th, -jnp.inf)
        for c in range(bb // micro):
            lo, hi = c * micro, (c + 1) * micro
            for j in range(micro):
                jj = lo + j
                start = lo + (j // 8) * 8  # aligned-floor (see _make_kernel)
                col = jbb_ref[start:hi, jj:jj + 1]
                # the interleave: consecutive statements belong to
                # DIFFERENT chains' private refs -> independent, so each
                # chain's store->load latency hides under the others' issue
                for ci in range(nchains):
                    row = sbs[ci][jj:jj + 1, :]
                    f = hts[ci][jj:jj + 1, :]
                    acc = row * f < ub[jj:jj + 1, ci * rc:(ci + 1) * rc]
                    ds = jnp.where(acc, -2.0 * row, 0.0)
                    sbs[ci][jj:jj + 1, :] = row + ds
                    dss[ci][jj:jj + 1, :] = ds
                    fbs[ci][jj:jj + 1, :] = f
                    hts[ci][start:hi, :] = hts[ci][start:hi, :] + col * ds
            for ci in range(nchains):
                hts[ci][:] = hts[ci][:] + jnp.dot(
                    jbb_od_ref[:, lo:hi], dss[ci][lo:hi, :],
                    preferred_element_type=jnp.float32, precision=prec)
        for ci in range(nchains):
            sl = slice(ci * rc, (ci + 1) * rc)
            s_io_ref[pl.ds(i0, bb), sl] = sbs[ci][:]
            de_out[:, sl] = de_out[:, sl] - jnp.sum(
                dss[ci][:] * fbs[ci][:], axis=0, keepdims=True)
            cnt_out[:, sl] = cnt_out[:, sl] + 0.5 * jnp.sum(
                jnp.abs(dss[ci][:]), axis=0, keepdims=True)

    return kernel


def _make_kernel_pipe(rule: str, block_size: int, kernel_rng: bool, precision,
                      j_bf16: bool = False, micro: int = MICRO):
    """Software-pipelined variant: grid step bp PRE-COMPUTES block bp's local
    fields H_pre = J_rows(bp) @ s (MXU) and then runs block bp-1's dependent
    sequential loop (VPU). The two have no data dependency — H_pre(bp) misses
    exactly block bp-1's flips, which the next step repairs with one
    [B, B] x [B, R] sub-diagonal correction — so the TPU's asynchronous
    MXU/VPU issue queues can overlap the big matmul with the update loop.
    Grid is (r_tiles, n_blocks + 1): step 0 only prefetch-computes H_pre(0);
    step n_blocks only drains the last loop.

    Measured NEUTRAL on v5e at bench scale (9.95 vs 9.95 Gflips/s): the
    in-order variant's 545 us/sweep is already below VPU(460) + MXU(175),
    i.e. Mosaic/hardware overlaps the row matmul with the dependent loop
    without the explicit pipeline. Kept as an option (decision-identical to
    the base kernel under host uniforms — tested) for TPU generations with a
    different MXU:VPU balance."""
    prec = _PRECISIONS[precision]

    def kernel(seed_ref,     # [1] SMEM int32
               jrows_ref,    # [B, Np]  J rows of block bp (prefetch target)
               jbb_ref,      # [B, B]   diag block of cur = bp-1
               jbb_od_ref,   # [B, B]   same, diagonal C-blocks zeroed
               jsub_ref,     # [B, B]   J[cur rows, cur-1 cols]
               h_ref,        # [B, 1]   fields of block bp
               u_ref,        # [B, R]   uniforms/mask of cur
               beta_ref,     # [1, R]
               s_in_ref,     # [Np, R]
               s_io_ref,     # [Np, R]  aliased output
               de_out,       # [1, R]
               cnt_out,      # [1, R]
               hpa,          # scratch [B, R] H_pre parity buffer (even bp)
               hpb,          # scratch [B, R] H_pre parity buffer (odd bp)
               ht,           # scratch [B, R] working fields of cur
               sblk,         # scratch [B, R]
               dsb,          # scratch [B, R] cur's deltas (persist to bp+1)
               fb,           # scratch [B, R]
               ub):          # scratch [B, R]
        rt = pl.program_id(0)
        bp = pl.program_id(1)
        n_steps = pl.num_programs(1)          # n_blocks + 1
        bb = block_size

        @pl.when(bp == 0)
        def _():
            s_io_ref[:] = s_in_ref[:]
            de_out[:] = jnp.zeros_like(de_out)
            cnt_out[:] = jnp.zeros_like(cnt_out)

        # ---- (a) prefetch-compute H_pre(bp) — independent of (b)'s loop ----
        @pl.when(bp < n_steps - 1)
        def _():
            if j_bf16:
                hp = jnp.dot(jrows_ref[:], s_io_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32) + h_ref[:]
            else:
                hp = jnp.dot(jrows_ref[:], s_io_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=prec) + h_ref[:]

            @pl.when(bp % 2 == 0)
            def _():
                hpa[:] = hp

            @pl.when(bp % 2 == 1)
            def _():
                hpb[:] = hp

        # ---- (b) dependent sequential loop for block cur = bp - 1 ----------
        @pl.when(bp > 0)
        def _():
            cur = bp - 1
            i0 = pl.multiple_of(cur * bb, bb)
            cur_even = (cur % 2) == 0
            ht[:] = jnp.where(cur_even, hpa[:], hpb[:])

            @pl.when(bp > 1)
            def _():
                # repair H_pre(cur): it predates block cur-1's flips (in dsb)
                ht[:] = ht[:] + jnp.dot(jsub_ref[:], dsb[:],
                                        preferred_element_type=jnp.float32,
                                        precision=prec)

            sblk[:] = s_io_ref[pl.ds(i0, bb), :]
            if kernel_rng:
                pltpu.prng_seed(seed_ref[0] + rt * (n_steps - 1) + cur)
                bits = pltpu.bitcast(pltpu.prng_random_bits(ub.shape),
                                     jnp.int32)
                ub[:] = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
                ub[:] = ub[:] + u_ref[:]
            else:
                ub[:] = u_ref[:]
            nib = -0.5 / beta_ref[:]
            if rule == "metropolis":
                th = jnp.log(ub[:]) * nib
            else:
                th = (jnp.log(ub[:])
                      - jnp.log1p(-jnp.minimum(ub[:], 0.999999))) * nib
            ub[:] = jnp.where(ub[:] < 1.0, th, -jnp.inf)
            for c in range(bb // micro):
                lo, hi = c * micro, (c + 1) * micro
                for j in range(micro):
                    jj = lo + j
                    row = sblk[jj:jj + 1, :]
                    f = ht[jj:jj + 1, :]
                    acc = row * f < ub[jj:jj + 1, :]
                    ds = jnp.where(acc, -2.0 * row, 0.0)
                    sblk[jj:jj + 1, :] = row + ds
                    dsb[jj:jj + 1, :] = ds
                    fb[jj:jj + 1, :] = f
                    # aligned-floor immediate correction (see _make_kernel)
                    start = lo + (j // 8) * 8
                    ht[start:hi, :] = (ht[start:hi, :]
                                       + jbb_ref[start:hi, jj:jj + 1] * ds)
                ht[:] = ht[:] + jnp.dot(jbb_od_ref[:, lo:hi], dsb[lo:hi, :],
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
            s_io_ref[pl.ds(i0, bb), :] = sblk[:]
            de_out[:] = de_out[:] - jnp.sum(dsb[:] * fb[:], axis=0,
                                            keepdims=True)
            cnt_out[:] = cnt_out[:] + 0.5 * jnp.sum(jnp.abs(dsb[:]), axis=0,
                                                    keepdims=True)

    return kernel


def _sub_diag_blocks(j: jax.Array, block_size: int) -> jax.Array:
    """[Np, Np] -> [Np, B]: stacked sub-diagonal blocks J[bB:(b+1)B,
    (b-1)B:bB] (zeros for b = 0) — the pipelined kernel's repair operand."""
    n_pad = j.shape[-1]
    n_blocks = n_pad // block_size
    jr = j.reshape(n_blocks, block_size, n_blocks, block_size)
    sub = jnp.einsum("ibic->ibc", jnp.roll(jr, 1, axis=2))  # block (b, b-1)
    sub = sub.at[0].set(0.0)
    return sub.reshape(n_pad, block_size)


def _diag_blocks(j: jax.Array, block_size: int) -> jax.Array:
    """[Np, Np] -> [Np, B]: stacked diagonal blocks J[bB:(b+1)B, bB:(b+1)B]."""
    n_pad = j.shape[-1]
    n_blocks = n_pad // block_size
    jr = j.reshape(n_blocks, block_size, n_blocks, block_size)
    diag = jnp.einsum("ibic->ibc", jr)
    return diag.reshape(n_pad, block_size)


def _zero_micro_diag(jbb_all: jax.Array, block_size: int,
                     micro: int = MICRO) -> jax.Array:
    """Zero the [C, C] diagonal micro-blocks of each stacked [B, B] block."""
    n_rows = jbb_all.shape[0]
    keep = 1.0 - np.kron(np.eye(block_size // micro, dtype=np.float32),
                         np.ones((micro, micro), np.float32))
    tiles = np.tile(keep, (n_rows // block_size, 1))
    return jbb_all * jnp.asarray(tiles)


VMEM_BUDGET = 88 * 1024 * 1024  # scoped-VMEM ceiling requested per kernel


def _pick_replica_tile(n_pad: int, r: int, block_size: int,
                       vmem_budget: int = VMEM_BUDGET) -> int:
    """Largest replica tile (multiple of 128, divides r) whose VMEM footprint
    fits the budget. Wider tiles amortize the per-instruction overhead of the
    sequential [1, rt] update steps AND cut how often J re-streams per sweep,
    so bigger is strictly better until VMEM runs out.

    Footprint model (validated against the Mosaic scoped-vmem allocator):
    3 spin-window buffers (aliased in/out + copy), double-buffered J row
    blocks, and ~9 [B, rt] block buffers (5 scratch + u/beta double buffers).
    """
    rt = min(r, 2048)
    while rt > 128:
        need = 4 * (3 * n_pad * rt + 3 * block_size * n_pad
                    + 9 * block_size * rt)
        if need <= vmem_budget and r % rt == 0:
            return rt
        rt -= 128
    return min(r, 128)


def _build_call(n_pad: int, r: int, block_size: int, rule: str,
                kernel_rng: bool, precision, interpret: bool, dtype,
                replica_tile: int = 0, j_bf16: bool = False,
                micro: int = MICRO, folded: bool = False,
                interleave: int = 0):
    n_blocks = n_pad // block_size
    rt = replica_tile or _pick_replica_tile(n_pad, r, block_size)
    if r % rt != 0:
        raise ValueError(f"replica count {r} not divisible by tile {rt}")
    r_tiles = r // rt
    if folded and rt % 8 != 0:
        raise ValueError(f"folded kernel needs replica tile % 8 == 0, "
                         f"got {rt}")
    if folded and interleave:
        raise ValueError("folded and interleave cannot combine")
    if interleave:
        kernel = _make_kernel_interleaved(rule, block_size, kernel_rng,
                                          precision, rt, interleave,
                                          j_bf16, micro)
        rc = rt // interleave
        scratches = [pltpu.VMEM((block_size, rt), jnp.float32)]  # ub shared
        for _ in range(4):  # ht / sblk / dsb / fb, one PRIVATE ref per chain
            scratches += [pltpu.VMEM((block_size, rc), jnp.float32)
                          for _ in range(interleave)]
    elif folded:
        kernel = _make_kernel_folded(rule, block_size, kernel_rng,
                                     precision, rt, j_bf16, micro)
        scratches = [
            pltpu.VMEM((block_size, rt), jnp.float32),           # ht
            pltpu.VMEM((block_size, 8, rt // 8), jnp.float32),   # sbf
            pltpu.VMEM((block_size, 8, rt // 8), jnp.float32),   # dsb
            pltpu.VMEM((block_size, 8, rt // 8), jnp.float32),   # fbf
            pltpu.VMEM((block_size, 8, rt // 8), jnp.float32),   # ubf
            pltpu.VMEM((micro, 8, rt // 8), jnp.float32),        # htf
            pltpu.VMEM((micro, rt), jnp.float32),                # dflat
        ]
    else:
        kernel = _make_kernel(rule, block_size, kernel_rng, precision,
                              j_bf16, micro)
        scratches = [pltpu.VMEM((block_size, rt), jnp.float32)
                     for _ in range(5)]
    # grid order (rt, b): b innermost, so each replica tile runs a full sweep
    # (its spin window stays resident) before the next tile begins; J streams
    # once per tile.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_tiles, n_blocks),
        scratch_shapes=scratches,
        in_specs=[
            pl.BlockSpec((block_size, n_pad), lambda t, b, sref: (b, 0)),
            pl.BlockSpec((block_size, block_size), lambda t, b, sref: (b, 0)),
            pl.BlockSpec((block_size, block_size), lambda t, b, sref: (b, 0)),
            pl.BlockSpec((block_size, 1), lambda t, b, sref: (b, 0)),
            pl.BlockSpec((block_size, rt), lambda t, b, sref: (b, t)),
            pl.BlockSpec((1, rt), lambda t, b, sref: (0, t)),
            pl.BlockSpec((n_pad, rt), lambda t, b, sref: (0, t)),
        ],
        out_specs=(
            pl.BlockSpec((n_pad, rt), lambda t, b, sref: (0, t)),
            pl.BlockSpec((1, rt), lambda t, b, sref: (0, t)),
            pl.BlockSpec((1, rt), lambda t, b, sref: (0, t)),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, r), dtype),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ),
        input_output_aliases={7: 0},  # input indices count the scalar-prefetch seed
        # default scoped-vmem limit is 16 MB; wide replica tiles need more
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(VMEM_BUDGET * 1.25)),
        interpret=interpret,
    )


def _build_call_pipe(n_pad: int, r: int, block_size: int, rule: str,
                     kernel_rng: bool, precision, interpret: bool, dtype,
                     replica_tile: int = 0, j_bf16: bool = False,
                     micro: int = MICRO):
    """pallas_call for the software-pipelined kernel (_make_kernel_pipe):
    grid (r_tiles, n_blocks + 1); extra jsub operand + 2 H_pre scratches."""
    n_blocks = n_pad // block_size
    rt = replica_tile or _pick_replica_tile(n_pad, r, block_size)
    if r % rt != 0:
        raise ValueError(f"replica count {r} not divisible by tile {rt}")
    r_tiles = r // rt
    kernel = _make_kernel_pipe(rule, block_size, kernel_rng, precision,
                               j_bf16, micro)
    last = n_blocks - 1

    def _pre(t, b, sref):      # operands for the prefetched block bp
        return (jnp.minimum(b, last), 0)

    def _cur(t, b, sref):      # operands for the in-flight block bp-1
        return (jnp.maximum(b - 1, 0), 0)

    def _cur_t(t, b, sref):
        return (jnp.maximum(b - 1, 0), t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_tiles, n_blocks + 1),
        scratch_shapes=[pltpu.VMEM((block_size, rt), jnp.float32)
                        for _ in range(7)],
        in_specs=[
            pl.BlockSpec((block_size, n_pad), _pre),                 # jrows
            pl.BlockSpec((block_size, block_size), _cur),            # jbb
            pl.BlockSpec((block_size, block_size), _cur),            # jbb_od
            pl.BlockSpec((block_size, block_size), _cur),            # jsub
            pl.BlockSpec((block_size, 1), _pre),                     # h
            pl.BlockSpec((block_size, rt), _cur_t),                  # u
            pl.BlockSpec((1, rt), lambda t, b, sref: (0, t)),        # beta
            pl.BlockSpec((n_pad, rt), lambda t, b, sref: (0, t)),    # s_in
        ],
        out_specs=(
            pl.BlockSpec((n_pad, rt), lambda t, b, sref: (0, t)),
            pl.BlockSpec((1, rt), lambda t, b, sref: (0, t)),
            pl.BlockSpec((1, rt), lambda t, b, sref: (0, t)),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, r), dtype),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ),
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(VMEM_BUDGET * 1.25)),
        interpret=interpret,
    )


class FusedSweep:
    """Per-problem fused sweep engine, [N, R] spin layout, kernel RNG.

    Precomputes every per-problem operand (J, diagonal blocks, fields, mask)
    once so the per-sweep work is exactly one pallas_call. This is the engine
    the SA/PT drivers use on TPU (kernels/sweeps.py is the XLA reference
    implementation and CPU fallback).
    """

    layout = "nr"

    def __init__(self, problem: IsingProblem, block_size: int = 128,
                 rule: str = "metropolis", precision=None,
                 interpret: bool = False, j_dtype=jnp.float32,
                 micro: int = MICRO, pipelined: bool = False,
                 folded: bool = False, interleave: int = 0):
        from spinglass_tpu.kernels.sweeps import canonical_rule
        n_pad = problem.n_padded
        if n_pad % block_size != 0:
            raise ValueError(
                f"padded N={n_pad} not divisible by block {block_size}")
        self.problem = problem
        self.block_size = block_size
        self.rule = canonical_rule(rule)
        self.precision = precision
        self.interpret = interpret
        self.j_bf16 = j_dtype == jnp.bfloat16
        self.micro = micro
        self.pipelined = pipelined
        self.folded = folded
        self.interleave = interleave  # chains with private scratch refs
        # (see _make_kernel_interleaved); 0/1 = flat kernel
        if pipelined and folded:
            raise ValueError(
                "pipelined and folded kernel variants cannot combine — "
                "the pipelined builder has no folded form and silently "
                "running the flat kernel would misattribute measurements")
        if interleave and (pipelined or folded):
            raise ValueError(
                "interleave cannot combine with pipelined/folded")
        self.j32 = problem.j.astype(j_dtype)
        # jbb blocks stay f32 (VPU elementwise + small MXU passes)
        self.jbb_all = _diag_blocks(self.j32, block_size).astype(jnp.float32)
        self.jbb_od_all = _zero_micro_diag(self.jbb_all, block_size, micro)
        self.jsub_all = (_sub_diag_blocks(self.j32, block_size)
                         .astype(jnp.float32) if pipelined else None)
        self.h_col = problem.h.astype(jnp.float32)[:, None]
        # mask column for kernel-rng mode: +2 on padded rows pushes u >= 2
        self.mask_col = jnp.where(problem.active_mask > 0, 0.0, 2.0)[:, None]
        self._calls = {}

    def operands(self):
        """Array pytree for jit-argument passing (see
        anneal.engines.SweepEngine docstring: closure-embedded J measured
        64 s vs 9 s compile and oversized the N=8192 program)."""
        d = {"j32": self.j32, "jbb_all": self.jbb_all,
             "jbb_od_all": self.jbb_od_all, "h_col": self.h_col,
             "mask_col": self.mask_col,
             # sweep_with_uniforms reads problem.active_mask — without
             # this the host-RNG path re-embeds it (r4 review #4)
             "problem": self.problem}
        if self.jsub_all is not None:
            d["jsub_all"] = self.jsub_all
        return d

    def bind(self, ops):
        import copy

        eng = copy.copy(self)           # shares _calls (shape-keyed, pure)
        for k, v in ops.items():
            setattr(eng, k, v)
        return eng

    def _call(self, r: int, kernel_rng: bool):
        key = (r, kernel_rng)
        if key not in self._calls:
            build = _build_call_pipe if self.pipelined else _build_call
            kwargs = ({} if self.pipelined else
                      {"folded": self.folded,
                       "interleave": 0 if self.interleave in (0, 1)
                       else self.interleave})
            self._calls[key] = build(
                self.problem.n_padded, r, self.block_size, self.rule,
                kernel_rng, self.precision, self.interpret, jnp.float32,
                j_bf16=self.j_bf16, micro=self.micro, **kwargs)
        return self._calls[key]

    def _operands(self, u, beta, spins_t):
        if self.pipelined:
            return (self.j32, self.jbb_all, self.jbb_od_all, self.jsub_all,
                    self.h_col, u, beta, spins_t)
        return (self.j32, self.jbb_all, self.jbb_od_all, self.h_col, u,
                beta, spins_t)

    def __call__(self, spins_t: jax.Array, beta: jax.Array,
                 seed: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One sweep. spins_t [Np, R]; beta [] or [R]; seed int32 scalar.
        Returns (spins_t, dE_sum[R], n_accepted[R])."""
        n_pad, r = spins_t.shape
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
        if self.interpret:
            # pltpu.prng_* has no CPU lowering — in interpret mode draw the
            # uniforms on the host stream instead (a different but equally
            # valid MC stream; interpret is a correctness/dryrun mode)
            key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
            u = jax.random.uniform(key, (n_pad, r), jnp.float32)
            return self.sweep_with_uniforms(spins_t, beta, u)
        mask = jnp.broadcast_to(self.mask_col, (n_pad, r))
        s_t, de, cnt = self._call(r, True)(
            jnp.asarray(seed, jnp.int32)[None],
            *self._operands(mask, beta[None, :], spins_t))
        return s_t, de[0], cnt[0].astype(jnp.int32)

    def sweep_with_uniforms(self, spins_t: jax.Array, beta: jax.Array,
                            uniforms_t: jax.Array):
        """Host-RNG sweep (test parity with the XLA path)."""
        n_pad, r = spins_t.shape
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
        u = jnp.where(self.problem.active_mask[:, None] > 0, uniforms_t, 2.0)
        s_t, de, cnt = self._call(r, False)(
            jnp.zeros((1,), jnp.int32),
            *self._operands(u, beta[None, :], spins_t))
        return s_t, de[0], cnt[0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_size", "rule", "interpret",
                                             "precision"))
def blocked_sweep_pallas(
    problem: IsingProblem,
    spins: jax.Array,     # [R, Np] f32
    beta: jax.Array,      # [] or [R]
    uniforms: jax.Array,  # [R, Np]
    block_size: int = 128,
    rule: str = "metropolis",
    interpret: bool = False,
    precision: Optional[str] = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact sequential-equivalent sweep; same contract and RNG stream as
    kernels.sweeps.blocked_sweep ([R, N] layout, host uniforms). Used by tests
    and as a drop-in; the drivers' hot loop uses FusedSweep instead."""
    r, n_pad = spins.shape
    if n_pad % block_size != 0:
        raise ValueError(f"padded N={n_pad} not divisible by block {block_size}")
    beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
    j32 = problem.j.astype(jnp.float32)
    jbb_all = _diag_blocks(j32, block_size)
    jbb_od_all = _zero_micro_diag(jbb_all, block_size)
    h_col = problem.h.astype(jnp.float32)[:, None]
    uniforms = jnp.where(problem.active_mask[None, :] > 0, uniforms, 2.0)
    call = _build_call(n_pad, r, block_size, rule, False, precision,
                       interpret, spins.dtype)
    s_t, de, cnt = call(jnp.zeros((1,), jnp.int32), j32, jbb_all, jbb_od_all,
                        h_col, uniforms.T, beta[None, :], spins.T)
    return s_t.T, de[0], cnt[0].astype(jnp.int32)

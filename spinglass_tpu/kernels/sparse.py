"""Sparse (ELL / padded-neighbor-list) sweep engine for large sparse instances.

SURVEY §7 hard part 2: for 10k+ spins with sparse J the dense [N, N] matmul
wastes O(N^2) HBM traffic on zeros. The ELL layout stores, per spin, a fixed
K = max-degree list of (neighbor index, coupling value), padded with
self-loops of value 0; local fields become a gather + K-reduction

    f[r, i] = sum_k val[i, k] * s[r, idx[i, k]] + h[i]

which XLA lowers to vectorized dynamic-gathers on TPU. Sweeps are colored
(greedy coloring of a sparse graph needs <= max_degree + 1 colors), giving
exact Metropolis with C sparse-field passes per sweep — O(C * R * N * K)
work instead of the dense O(C * R * N^2)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem, round_up
from spinglass_tpu.kernels.sweeps import (accept_threshold,
                                          color_masks_from_colors)


@struct.dataclass
class EllProblem:
    """ELL-format sparse Ising problem pytree.

    idx [Np, K] int32 neighbor indices (self-index on padding slots),
    val [Np, K] coupling values (0 on padding), h [Np], active_mask [Np]."""

    idx: jax.Array
    val: jax.Array
    h: jax.Array
    active_mask: jax.Array
    n_spins: int = struct.field(pytree_node=False)

    @property
    def n_padded(self) -> int:
        return self.idx.shape[0]

    @property
    def max_degree(self) -> int:
        return self.idx.shape[1]

    @staticmethod
    def from_coo(n_spins: int, rows, cols, vals, h=None,
                 max_degree: Optional[int] = None) -> "EllProblem":
        """Dense-free constructor from symmetric COO (both directions
        present) — THE path for 10k+ sparse instances (no [N, N] matrix is
        ever materialized)."""
        from spinglass_tpu import native

        n_pad = round_up(n_spins)
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        vals = np.asarray(vals, np.float64)
        degs = np.bincount(rows, minlength=n_pad)
        k = int(max_degree or max(int(degs.max()), 1))
        idx, val, _ = native.build_ell(rows, cols, vals, n_pad, k)
        if h is None:
            h_full = np.zeros(n_pad, np.float32)
        else:
            h_full = np.zeros(n_pad, np.float32)
            h_full[:n_spins] = np.asarray(h, np.float32)
        mask = np.zeros(n_pad, np.float32)
        mask[:n_spins] = 1.0
        return EllProblem(idx=jnp.asarray(idx), val=jnp.asarray(val),
                          h=jnp.asarray(h_full),
                          active_mask=jnp.asarray(mask), n_spins=n_spins)

    @staticmethod
    def from_problem(problem: IsingProblem,
                     max_degree: Optional[int] = None) -> "EllProblem":
        """Convert a dense IsingProblem (host-side, once per problem).
        Uses the native C++ COO->ELL builder when available."""
        from spinglass_tpu import native

        n = problem.n_spins
        n_pad = problem.n_padded
        j = np.asarray(problem.j)[:n, :n]
        degs = (j != 0).sum(axis=1)
        k = int(max_degree or max(int(degs.max()), 1))
        rows, cols = np.nonzero(j)
        idx, val, _ = native.build_ell(rows, cols, j[rows, cols], n_pad, k)
        return EllProblem(
            idx=jnp.asarray(idx),
            val=jnp.asarray(val),
            h=problem.h,
            active_mask=problem.active_mask,
            n_spins=n,
        )


def ell_from_terms(n_spins: int, terms, max_degree: Optional[int] = None
                   ) -> EllProblem:
    """Compile core.constraints.Terms straight into an EllProblem — the
    dense-free encode path for constraint-heavy problems (e.g. large
    scheduling QUBOs whose dense J would not fit memory). Duplicate (i, j)
    term entries are kept as separate ELL slots; the gather-reduce sums them,
    so fields/energies match the dense scatter-add exactly."""
    qi = np.asarray(terms.quad_i, np.int64)
    qj = np.asarray(terms.quad_j, np.int64)
    qv = np.asarray(terms.quad_v, np.float64)
    rows = np.concatenate([qi, qj])
    cols = np.concatenate([qj, qi])
    vals = np.concatenate([qv, qv])
    h = np.zeros(n_spins, np.float64)
    if len(terms.lin_i):
        np.add.at(h, np.asarray(terms.lin_i, np.int64),
                  np.asarray(terms.lin_v, np.float64))
    return EllProblem.from_coo(n_spins, rows, cols, vals, h,
                               max_degree=max_degree)


def sparse_local_fields(ell: EllProblem, spins: jax.Array) -> jax.Array:
    """[R, Np] -> [R, Np]: gather neighbors, multiply, reduce K."""
    gathered = spins[:, ell.idx]                   # [R, Np, K]
    f = jnp.einsum("rnk,nk->rn", gathered,
                   ell.val.astype(jnp.float32))
    return f + ell.h.astype(jnp.float32)[None, :]


def sparse_energy(ell: EllProblem, spins: jax.Array) -> jax.Array:
    """E = -1/2 s.f_J - h.s  (f_J excludes h)."""
    f_j = sparse_local_fields(ell, spins) - ell.h.astype(jnp.float32)[None, :]
    s32 = spins.astype(jnp.float32)
    return (-0.5 * jnp.sum(s32 * f_j, axis=-1)
            - jnp.sum(s32 * ell.h.astype(jnp.float32)[None, :], axis=-1))


@functools.partial(jax.jit, static_argnames=("rule",))
def sparse_colored_sweep(
    ell: EllProblem,
    color_masks: jax.Array,   # [C, Np]
    spins: jax.Array,         # [R, Np]
    beta: jax.Array,
    uniforms: jax.Array,      # [R, Np]
    rule: str = "metropolis",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One exact colored sweep with sparse fields."""
    r = spins.shape[0]
    beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
    active = ell.active_mask > 0

    th = accept_threshold(uniforms, beta[:, None], rule)

    def body(carry, mask):
        spins, de_acc, cnt = carry
        f = sparse_local_fields(ell, spins)
        sf = spins.astype(jnp.float32) * f
        acc = (sf < th) & (mask > 0)[None, :] & active[None, :]
        spins = jnp.where(acc, -spins, spins)
        de_acc = de_acc + 2.0 * jnp.sum(jnp.where(acc, sf, 0.0), axis=-1)
        cnt = cnt + jnp.sum(acc, axis=-1).astype(jnp.int32)
        return (spins, de_acc, cnt), None

    init = (spins, jnp.zeros((r,), jnp.float32), jnp.zeros((r,), jnp.int32))
    (spins, de_acc, cnt), _ = lax.scan(body, init, color_masks)
    return spins, de_acc, cnt


# ---------------------------------------------------------------------------
# Compacted colored sweep — per-color gather of ONLY that color's spins
# ---------------------------------------------------------------------------

@struct.dataclass
class ColorGroups:
    """Per-color compacted operands, padded to the largest class size M.

    nodes [C, M] int32 spin indices (0 on padding, masked), nmask [C, M],
    idx [C, M, K] neighbor indices, val [C, M, K] couplings, h [C, M]."""

    nodes: jax.Array
    nmask: jax.Array
    idx: jax.Array
    val: jax.Array
    h: jax.Array


def build_color_groups(ell: EllProblem, colors: np.ndarray) -> ColorGroups:
    """Precompute the per-color gathered operands (host-side, once).

    The mask-based sweep re-gathers fields for ALL N spins per color — a
    C-fold waste. Compaction makes total per-sweep gather work ~N*K instead
    of C*N*K; with a balanced coloring (topology.greedy_coloring_coo
    balanced=True) the padding overhead M*C/N stays near 1."""
    colors = np.asarray(colors)
    c_count = int(colors.max()) + 1 if colors.size else 1
    idx_np = np.asarray(ell.idx)
    val_np = np.asarray(ell.val)
    h_np = np.asarray(ell.h)
    classes = [np.nonzero(colors == c)[0] for c in range(c_count)]
    m = max(len(cl) for cl in classes)
    nodes = np.zeros((c_count, m), np.int32)
    nmask = np.zeros((c_count, m), np.float32)
    for c, cl in enumerate(classes):
        nodes[c, : len(cl)] = cl
        nmask[c, : len(cl)] = 1.0
    return ColorGroups(
        nodes=jnp.asarray(nodes), nmask=jnp.asarray(nmask),
        idx=jnp.asarray(idx_np[nodes]), val=jnp.asarray(
            val_np[nodes].astype(np.float32)),
        h=jnp.asarray(h_np[nodes].astype(np.float32)))


@functools.partial(jax.jit, static_argnames=("rule",))
def sparse_colored_sweep_compact(
    ell: EllProblem,
    groups: ColorGroups,
    spins: jax.Array,         # [R, Np]
    beta: jax.Array,
    uniforms: jax.Array,      # [R, Np] (spin i consumes uniforms[:, i])
    rule: str = "metropolis",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact colored sweep, decision-identical to sparse_colored_sweep /
    colored_sweep under the same uniforms and coloring, but gathering only
    each color's M spins per pass. Spin updates apply via scatter-ADD of
    ds = -2s (padding adds 0, so duplicate pad indices are benign)."""
    r = spins.shape[0]
    beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
    th = accept_threshold(uniforms, beta[:, None], rule)

    def body(carry, g):
        spins, de_acc, cnt = carry
        nodes, nmask, idx_c, val_c, h_c = g
        gathered = spins[:, idx_c]                       # [R, M, K]
        f = jnp.einsum("rmk,mk->rm", gathered, val_c) + h_c[None, :]
        s_c = spins[:, nodes]                            # [R, M]
        sf = s_c.astype(jnp.float32) * f
        acc = (sf < th[:, nodes]) & (nmask > 0)[None, :]
        ds = jnp.where(acc, -2.0 * s_c, 0.0)
        spins = spins.at[:, nodes].add(ds)
        de_acc = de_acc + 2.0 * jnp.sum(jnp.where(acc, sf, 0.0), axis=-1)
        cnt = cnt + jnp.sum(acc, axis=-1).astype(jnp.int32)
        return (spins, de_acc, cnt), None

    init = (spins, jnp.zeros((r,), jnp.float32), jnp.zeros((r,), jnp.int32))
    (spins, de_acc, cnt), _ = lax.scan(
        init=init, xs=(groups.nodes, groups.nmask, groups.idx, groups.val,
                       groups.h), f=body)
    return spins, de_acc, cnt


# ---------------------------------------------------------------------------
# Sorted sliced-ELL sweep — contiguous color classes + per-degree-bucket K
# ---------------------------------------------------------------------------

class SortedBucket:
    """One degree bucket of one color class, in the color-sorted spin layout.

    Spins [off, off+m) of the sorted layout form (part of) an independent
    set; their neighbor lists are padded only to THIS bucket's max degree k
    (sliced-ELL / SELL: per-slice K instead of the global max degree — on an
    avg-degree-6 / max-degree-19 graph this cuts gather work ~3x)."""

    def __init__(self, off: int, idx: np.ndarray, val: np.ndarray,
                 h: np.ndarray):
        self.off = int(off)
        self.m = int(idx.shape[0])
        self.k = int(idx.shape[1])
        self.idx = jnp.asarray(idx, jnp.int32)        # [m, k] sorted-layout indices
        self.val = jnp.asarray(val, jnp.float32)      # [m, k]
        self.h = jnp.asarray(h, jnp.float32)          # [m]


def build_sorted_buckets(ell: EllProblem, colors: np.ndarray,
                         n_buckets: int = 4):
    """Host-side precompute for the sorted sliced-ELL sweep.

    Returns (perm [Np], inv_perm [Np], buckets, color_groups). ``perm`` maps
    sorted position -> original index; within each color class nodes are
    sorted by descending degree and split at degree quantiles so each
    bucket's K is its own max degree. Order of buckets preserves color
    barriers (all of color 0, then color 1, ...); buckets within a color are
    subsets of the same independent set — mutually independent, which the
    sweep exploits by computing their fields from the SAME spin state and
    applying one contiguous update per color (``color_groups`` is a list of
    (offset, size, [bucket, ...]) spans in sorted coordinates)."""
    colors = np.asarray(colors)
    idx_np = np.asarray(ell.idx)
    val_np = np.asarray(ell.val)
    h_np = np.asarray(ell.h, np.float32)
    n_pad = ell.n_padded
    degs = (val_np != 0).sum(axis=1)

    order: list = []
    spans: list = []  # (start, node_array, color) per bucket in sorted coords
    c_count = int(colors.max()) + 1 if colors.size else 1
    pos = 0
    for c in range(c_count):
        cl = np.nonzero(colors == c)[0]
        if len(cl) == 0:
            continue
        cl = cl[np.argsort(-degs[cl], kind="stable")]
        # split at degree quantiles; merge adjacent splits with equal K
        nb = min(n_buckets, len(cl))
        splits = np.array_split(cl, nb)
        merged = [splits[0]]
        for s in splits[1:]:
            if len(s) == 0:
                continue
            if degs[s].max(initial=0) == degs[merged[-1]].max(initial=0):
                merged[-1] = np.concatenate([merged[-1], s])
            else:
                merged.append(s)
        for nodes in merged:
            if len(nodes) == 0:
                continue
            order.append(nodes)
            spans.append((pos, nodes, c))
            pos += len(nodes)
    # leftover positions (padding rows / uncolored) go at the end, never swept
    covered = np.concatenate(order) if order else np.zeros(0, np.int64)
    rest = np.setdiff1d(np.arange(n_pad), covered)
    perm = np.concatenate([covered, rest]).astype(np.int64)
    inv_perm = np.empty(n_pad, np.int64)
    inv_perm[perm] = np.arange(n_pad)

    buckets = []
    bucket_colors = []
    for start, nodes, c in spans:
        k_b = max(int(degs[nodes].max(initial=1)), 1)
        rows_idx = idx_np[nodes][:, :]
        rows_val = val_np[nodes][:, :]
        # compact each row's nonzeros to the front, then cut at k_b —
        # vectorized via a stable argsort on the zero-mask (the per-row
        # np.nonzero loop cost ~8 s alone at 1M rows; this is ~0.5 s)
        colorder = np.argsort(rows_val == 0, axis=1, kind="stable")
        val_b = np.take_along_axis(rows_val, colorder, axis=1)[:, :k_b]
        idx_c = np.take_along_axis(rows_idx, colorder, axis=1)[:, :k_b]
        # zero-valued (padding) slots keep the self-index convention
        idx_b = np.where(val_b != 0, inv_perm[idx_c],
                         inv_perm[nodes][:, None]).astype(np.int64)
        val_b = np.ascontiguousarray(val_b, np.float32)
        buckets.append(SortedBucket(start, idx_b, val_b, h_np[nodes]))
        bucket_colors.append(c)

    color_groups = []
    prev_c = None
    for b, c in zip(buckets, bucket_colors):
        if color_groups and c == prev_c:
            off, size, bs = color_groups[-1]
            color_groups[-1] = (off, size + b.m, bs + [b])
        else:
            color_groups.append((b.off, b.m, [b]))
        prev_c = c
    return perm, inv_perm, buckets, color_groups


def make_sorted_sweep(color_groups, n_padded: int, rule: str = "metropolis"):
    """Build the traceable sorted sliced-ELL sweep, color-grouped.

    spins [R, Np] in SORTED layout; spin at sorted position p consumes
    uniforms[:, p]. Per color: the degree buckets are subsets of the same
    independent set, so their neighbor gathers all read the SAME spin state
    (no false inter-bucket dependency — XLA overlaps them) and the color's
    flips apply as ONE contiguous slice update. Measured 1.5x over the
    bucket-chained form at narrow replica counts on v5e (the dependent-
    gather latency chain shrinks from n_buckets*n_colors to n_colors steps);
    decision-identical to the bucket-chained and compact sweeps under the
    same uniforms."""

    def sweep(spins, beta, uniforms):
        r = spins.shape[0]
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
        from spinglass_tpu.kernels.sweeps import accept_threshold

        th = accept_threshold(uniforms, beta[:, None], rule)
        de_acc = jnp.zeros((r,), jnp.float32)
        cnt = jnp.zeros((r,), jnp.int32)
        for off, mc, bs in color_groups:
            fs = []
            for b in bs:  # independent: all read the same `spins`
                gathered = spins[:, b.idx]                  # [R, m, k]
                fs.append(jnp.einsum("rmk,mk->rm", gathered, b.val)
                          + b.h[None, :])
            f = jnp.concatenate(fs, axis=1) if len(fs) > 1 else fs[0]
            s_c = lax.slice_in_dim(spins, off, off + mc, axis=1)
            sf = s_c.astype(jnp.float32) * f
            acc = sf < lax.slice_in_dim(th, off, off + mc, axis=1)
            ds = jnp.where(acc, -2.0 * s_c, 0.0)
            spins = lax.dynamic_update_slice(spins, s_c + ds, (0, off))
            de_acc = de_acc + 2.0 * jnp.sum(jnp.where(acc, sf, 0.0), axis=-1)
            cnt = cnt + jnp.sum(acc, axis=-1).astype(jnp.int32)
        return spins, de_acc, cnt

    return sweep


# ---------------------------------------------------------------------------
# Transposed aligned sorted sliced-ELL — the wide-replica sparse fast path
# ---------------------------------------------------------------------------

class TBucket:
    """One degree bucket of one color class in the TRANSPOSED ([NS, R])
    sorted layout. Rows [off, off+m) of the sorted layout; neighbor lists
    padded to this bucket's max degree k; m padded to the sublane multiple
    (inert rows: val=0, h=0, masked in the acceptance thresholds)."""

    def __init__(self, off: int, idx: np.ndarray, val: np.ndarray,
                 h: np.ndarray):
        self.off = int(off)
        self.m = int(idx.shape[0])
        self.k = int(idx.shape[1])
        self.idx = jnp.asarray(idx, jnp.int32)     # [m, k] sorted coords
        self.val = jnp.asarray(val, jnp.float32)   # [m, k]
        self.h = jnp.asarray(h, jnp.float32)       # [m]


def build_sorted_t(ell: EllProblem, colors: np.ndarray, n_buckets: int = 12,
                   row_align: int = 8, color_align: int = 32,
                   total_align: int = 256, bucket_order: str = "degree"):
    """Host-side layout for the transposed sorted sliced-ELL sweep.

    Differences vs build_sorted_buckets (both measured on v5e, 10k spins /
    avg degree 6 / R=1024):
    * every bucket size is padded to ``row_align`` rows and every color span
      to ``color_align`` rows, so all sweep slices/updates are tile-aligned
      (unaligned sublane offsets forced XLA relayouts worth ~30% of the
      sweep);
    * more degree buckets (12 vs 4) cut padded gather rows 77k → 65k on the
      benchmark graph — the row-gather is issue-bound (~7 ns/row), so fewer
      padded rows is time saved regardless of byte width;
    * returns a [NS, 1] threshold mask (0 real / -inf padding) consumed by
      the threshold generator so inert rows never flip.

    ``bucket_order``: row order INSIDE each degree bucket — "degree"
    (descending, the historical default) or "index" (ascending original
    index — the r5 1M-spin locality experiment, VERDICT r4 task 5: does
    keeping original-index order inside buckets recover DRAM locality
    that degree-sorting scatters? Bucket membership and padding are
    identical either way; only the within-bucket row order changes).

    Returns (perm [NS] original index per sorted row (-1 padding),
    inv_map [n_padded] sorted position per original row, groups
    [(off, size, [TBucket...])], mask_col [NS, 1], n_sorted)."""
    colors = np.asarray(colors)
    idx_np = np.asarray(ell.idx)
    val_np = np.asarray(ell.val)
    h_np = np.asarray(ell.h, np.float32)
    degs = (val_np != 0).sum(axis=1)
    c_count = int(colors.max()) + 1 if colors.size else 1

    def aup(x, a):
        return -(-x // a) * a

    pos = 0
    plan = []  # (span_start, [(bucket_off, nodes, m_pad, k)])
    for c in range(c_count):
        cl = np.nonzero(colors == c)[0]
        if len(cl) == 0:
            continue
        cl = cl[np.argsort(-degs[cl], kind="stable")]
        nb = min(n_buckets, len(cl))
        splits = [s for s in np.array_split(cl, nb) if len(s)]
        merged = [splits[0]]
        for s in splits[1:]:
            if degs[s].max(initial=0) == degs[merged[-1]].max(initial=0):
                merged[-1] = np.concatenate([merged[-1], s])
            else:
                merged.append(s)
        if bucket_order == "index":
            merged = [np.sort(nodes_b) for nodes_b in merged]
        elif bucket_order != "degree":
            raise ValueError(f"bucket_order must be 'degree' or 'index', "
                             f"got {bucket_order!r}")
        span_start = pos
        buckets = []
        for bi, nodes in enumerate(merged):
            m_pad = aup(len(nodes), row_align)
            if bi == len(merged) - 1:  # color span up to color_align
                m_pad = (aup(pos - span_start + m_pad, color_align)
                         - (pos - span_start))
            buckets.append((pos, nodes, m_pad,
                            max(int(degs[nodes].max(initial=1)), 1)))
            pos += m_pad
        plan.append((span_start, buckets))
    n_sorted = aup(max(pos, total_align), total_align)

    perm = np.full(n_sorted, -1, np.int64)
    for _, buckets in plan:
        for start, nodes, m_pad, k in buckets:
            perm[start:start + len(nodes)] = nodes
    inv_map = np.zeros(ell.n_padded, np.int64)
    real = perm >= 0
    inv_map[perm[real]] = np.nonzero(real)[0]

    groups = []
    for span_start, buckets in plan:
        bl = []
        span_size = 0
        for start, nodes, m_pad, k in buckets:
            bidx = np.zeros((m_pad, k), np.int64)
            bval = np.zeros((m_pad, k), np.float32)
            bh = np.zeros(m_pad, np.float32)
            # vectorized per-row nonzero compaction (same stable argsort
            # trick as build_sorted_buckets — the per-row np.nonzero loop
            # cost ~8 s at 1M rows; found duplicated here in r4 review)
            m = len(nodes)
            rows_val = val_np[nodes]
            rows_idx = idx_np[nodes]
            colorder = np.argsort(rows_val == 0, axis=1, kind="stable")
            v_c = np.take_along_axis(rows_val, colorder, axis=1)[:, :k]
            i_c = np.take_along_axis(rows_idx, colorder, axis=1)[:, :k]
            bidx[:m] = np.where(v_c != 0, inv_map[i_c], 0)
            bval[:m] = v_c
            bh[:m] = h_np[nodes]
            bl.append(TBucket(start, bidx, bval, bh))
            span_size += m_pad
        groups.append((span_start, span_size, bl))
    mask = np.where(real, 0.0, -np.inf).astype(np.float32)
    return perm, inv_map, groups, jnp.asarray(mask[:, None]), n_sorted


def make_threshold_call(n_sorted: int, r: int, rule: str,
                        block_rows: int = 256, interpret: bool = False):
    """Pallas TPU kernel producing acceptance thresholds th [NS, R] directly
    from the on-chip PRNG (replaces host threefry + accept_threshold, which
    cost ~400 us/sweep at [10240, 1024] — ~27%% of the whole sweep).

    Same exp-free semantics as kernels.sweeps.accept_threshold: accept a
    flip iff s_i * f_i < th_i. nib = -0.5/beta arrives as [1, R] (per-replica
    ladders supported); mask_col [NS, 1] is 0 on real rows / -inf on layout
    padding, forcing never-accept there."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = n_sorted // block_rows
    assert n_sorted % block_rows == 0

    def kernel(seed_ref, nib_ref, mask_ref, out_ref):
        b = pl.program_id(0)
        # seed with BOTH key words, folding the block id into word 1 with a
        # golden-ratio odd multiplier: collapsing the key to one int32 (r3)
        # left ~2^32/n_blocks distinct per-block streams, so 200k-sweep
        # runs could reuse bit-identical threshold blocks across sweeps
        # (ADVICE.md r3 #1). Mosaic accepts at most 2 seed values
        # ("Setting seed with more than 2 values is not supported",
        # verified on v5e), hence the fold instead of a third seed.
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (b * jnp.int32(-1640531527)))
        bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.int32)
        u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        if rule == "metropolis":
            th = jnp.log(u) * nib_ref[:]
        else:  # glauber: -logit(u)/(2 beta)
            th = (jnp.log(u) - jnp.log1p(-u)) * nib_ref[:]
        # int32->f32 rounding can land u EXACTLY on 1.0 (bits near 2^31-1),
        # making th 0 (accept-any-downhill); guard to never-accept for
        # consistency with the dense kernel's u < 1.0 guard (ADVICE.md r4 #1)
        th = jnp.where(u < 1.0, th, -jnp.inf)
        out_ref[:] = jnp.where(mask_ref[:] < 0, -jnp.inf, th)

    def call(seed, nib, mask_col):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((n_sorted, r), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, r), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, r), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(seed, nib, mask_col)

    return call


def make_accept_call(mc: int, r: int, rule: str, off: int, spin_dtype,
                     interpret: bool = False):
    """Fused per-color accept kernel (round-4 experiment, NOT the default
    — see SortedSparseTEngine.__init__): generates acceptance thresholds
    from the on-chip PRNG, compares s*f < th, flips, and accumulates
    dE/counts — all in one VMEM pass over the color slice, replacing the
    separate [NS, R] threshold kernel + XLA elementwise passes (threshold
    write+readback is ~80 MB of HBM traffic per sweep at [10240, 1024]).
    Measured on v5e: the per-sweep n_colors pallas_call overheads cost
    more than that traffic saves (1021-1027 vs 947-951 us/sweep).

    Mosaic note: selects on int8 values crash the TPU compiler
    (tpu_compile_helper exit 1, found r3); spins are widened to f32 on
    load, all math/selects run in f32, and the result is narrowed back to
    ``spin_dtype`` only at the store.

    Seeding: (key word 0, key word 1 ^ hash(global row)) — the block's
    GLOBAL starting row (off + b*block_rows) is unique across all
    colors/blocks of a sweep; the key words are split per sweep upstream.
    (Folded because Mosaic accepts at most 2 seed values.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block_rows = next(b for b in (256, 128, 64, 32)
                      if mc % b == 0 and off % b == 0)
    n_blocks = mc // block_rows

    def kernel(seed_ref, nib_ref, f_ref, s_ref, mask_ref,
               s_out, de_out, cnt_out):
        b = pl.program_id(0)
        # global starting row of this block, folded into seed word 1
        # (Mosaic caps prng_seed at 2 values; golden-ratio odd multiplier
        # spreads the small row ids across the word)
        row = jnp.int32(off) + b * jnp.int32(block_rows)
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (row * jnp.int32(-1640531527)))
        bits = pltpu.bitcast(pltpu.prng_random_bits((block_rows, r)),
                             jnp.int32)
        u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        if rule == "metropolis":
            th = jnp.log(u) * nib_ref[:]
        else:  # glauber: -logit(u)/(2 beta)
            th = (jnp.log(u) - jnp.log1p(-u)) * nib_ref[:]
        # u == 1.0 guard, same as make_threshold_call (ADVICE.md r4 #1)
        th = jnp.where(u < 1.0, th, -jnp.inf)
        th = jnp.where(mask_ref[:] < 0, -jnp.inf, th)
        s32 = s_ref[:].astype(jnp.float32)
        sf = s32 * f_ref[:]
        acc = sf < th
        s_out[:] = jnp.where(acc, -s32, s32).astype(s_out.dtype)
        de_b = 2.0 * jnp.sum(jnp.where(acc, sf, 0.0), axis=0,
                             keepdims=True)
        cnt_b = jnp.sum(acc.astype(jnp.int32), axis=0, keepdims=True)

        @pl.when(b == 0)
        def _init():
            de_out[:] = de_b
            cnt_out[:] = cnt_b

        @pl.when(b != 0)
        def _acc():
            de_out[:] = de_out[:] + de_b
            cnt_out[:] = cnt_out[:] + cnt_b

    def call(seed, nib, f, s_c, mask_c):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=[
                jax.ShapeDtypeStruct((mc, r), jnp.dtype(spin_dtype)),
                jax.ShapeDtypeStruct((1, r), jnp.float32),
                jax.ShapeDtypeStruct((1, r), jnp.int32),
            ],
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, r), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, r), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, r), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_rows, r), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            interpret=interpret,
        )(seed, nib, f, s_c, mask_c)

    return call


def make_sorted_t_sweep_fused(groups, mask_col, rule, spin_dtype,
                              interpret: bool = False):
    """Transposed sorted sweep with the fused Pallas accept kernel: XLA
    does the neighbor gathers + einsum local fields per color (MXU/issue
    bound — XLA already does this well), the Pallas kernel does
    RNG+threshold+compare+flip+reduce in one pass (the part XLA spread
    over an [NS, R] threshold round trip and several elementwise passes).
    Signature: sweep(s_t, nib [1,R], seed [2] int32) — no threshold input."""
    calls = {}

    def sweep(s_t, nib, seed):
        r = s_t.shape[1]
        de_acc = jnp.zeros((r,), jnp.float32)
        cnt = jnp.zeros((r,), jnp.int32)
        for off, mc, bs in groups:
            fs = []
            for b in bs:  # independent: all read the same `s_t`
                g = s_t[b.idx]                      # [m, k, R]
                fs.append(jnp.einsum("mkr,mk->mr", g.astype(jnp.float32),
                                     b.val) + b.h[:, None])
            f = jnp.concatenate(fs, axis=0) if len(fs) > 1 else fs[0]
            if (off, mc, r) not in calls:
                calls[(off, mc, r)] = make_accept_call(
                    mc, r, rule, off, s_t.dtype, interpret=interpret)
            s_c = lax.slice_in_dim(s_t, off, off + mc, axis=0)
            mask_c = lax.slice_in_dim(mask_col, off, off + mc, axis=0)
            s_new, de_c, cnt_c = calls[(off, mc, r)](seed, nib, f, s_c,
                                                     mask_c)
            s_t = lax.dynamic_update_slice(s_t, s_new, (off, 0))
            de_acc = de_acc + de_c[0]
            cnt = cnt + cnt_c[0]
        return s_t, de_acc, cnt

    return sweep


KS_BLOCK = 256  # per-step max-degree table streams to SMEM in this many
# rows per window (a whole-table SMEM operand failed Mosaic allocation
# above ~1900 rows / ~7.7 KB — r5 probe at n_sorted >= 61440)


def build_single_tables(groups, n_sorted: int, rps: int = 32):
    """Flatten build_sorted_t's per-color bucket lists into whole-layout
    row tables for the single-call sweep kernel (make_single_sweep_call):

      idx_all [NS, KMAX] int32 — neighbor SORTED rows, nonzeros first
      val_all [NS, KMAX] f32   — couplings (0 padding)
      ks      [NS/rps, 1] int32 — per-STEP edge-slot bound: max true
                                 neighbor count over the step's rows (the
                                 kernel statically unrolls KMAX edge slots
                                 and skips slot e when e >= ks — a dynamic
                                 per-row loop measured 20.3 vs 2.4 ns/edge)
      h_all   [NS, 1]   f32    — external fields (0 on inert rows)
    """
    kmax = max((b.k for _, _, bs in groups for b in bs), default=1)
    idx_all = np.zeros((n_sorted, kmax), np.int32)
    val_all = np.zeros((n_sorted, kmax), np.float32)
    krow = np.zeros(n_sorted, np.int32)
    h_all = np.zeros((n_sorted, 1), np.float32)
    for _, _, bs in groups:
        for b in bs:
            i0 = b.off
            v = np.asarray(b.val)
            idx_all[i0:i0 + b.m, :b.k] = np.asarray(b.idx)
            val_all[i0:i0 + b.m, :b.k] = v
            krow[i0:i0 + b.m] = (v != 0).sum(axis=1)
            h_all[i0:i0 + b.m, 0] = np.asarray(b.h)
    ks = krow.reshape(n_sorted // rps, rps).max(axis=1)
    # pad to the kernel's 256-step SMEM block (whole-table SMEM operands
    # hit a ~8 KB Mosaic limit around n_sorted ~61k: blocks stream instead)
    n_steps_pad = -(-len(ks) // KS_BLOCK) * KS_BLOCK
    ks = np.pad(ks, (0, n_steps_pad - len(ks)))[:, None]
    return (jnp.asarray(idx_all), jnp.asarray(val_all),
            jnp.asarray(ks.astype(np.int32)), jnp.asarray(h_all), kmax)


def make_single_sweep_call(n_sorted: int, r: int, kmax: int, rule: str,
                           kernel_rng: bool = True, rows_per_step: int = 32,
                           interpret: bool = False, expr_k0: int = 0):
    """ONE pallas_call for the ENTIRE colored sparse sweep (round-5,
    VERDICT.md r4 task 4): neighbor gather, local fields, threshold RNG,
    accept, flip and dE/count reduction all happen in-kernel, with spins
    [NS, R] f32 VMEM-resident (constant index_map + input/output aliasing,
    same pattern as the dense FusedSweep).

    Why this wins over the per-color XLA path: XLA's `s_t[idx]` gather
    MATERIALIZES the [m, k, R] gather to HBM and the einsum reads it back
    (measured 24.8 ns/edge-row at [10240, 1024]); the in-kernel gather
    keeps rows in VMEM (measured 9.5 ns/edge-row — probe r5). It also
    kills the [NS, R] threshold round trip, the per-color concats and the
    n_colors-per-sweep pallas_call overheads that made the r4 per-color
    fused-accept variant 7% slower.

    Sequencing: the grid runs color-sorted 32-row steps IN ORDER (TPU
    grid execution is sequential) over the shared VMEM spin buffer, so a
    later color's gather sees every earlier color's flips — identical
    update semantics to make_sorted_t_sweep. Rows within a step belong to
    one color (color spans are 32-aligned) and colors are independent
    sets, so intra-step gathers never read rows the step itself flips.

    ``kernel_rng=False`` takes a precomputed threshold array th [NS, R]
    instead of the on-chip PRNG — bit-identical decisions to
    make_sorted_t_sweep under the same thresholds (the parity-test mode;
    also the CPU/interpret path since pltpu.prng_* has no CPU lowering).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rps = rows_per_step
    assert n_sorted % rps == 0
    n_steps = n_sorted // rps

    def body(b, seed_ref, idx_ref, kr_ref, val_ref, h_ref, rng_in,
             s_io_ref, de_out, cnt_out, th, acc):
        """rng_in: (mask_ref, nib_ref) for kernel RNG, (th_in_ref,) for
        precomputed thresholds."""
        if kernel_rng:
            mask_ref, nib_ref = rng_in
            # per-step stream: both key words, step id folded into word 1
            # with a golden-ratio odd multiply (Mosaic caps prng_seed at 2
            # values; see make_threshold_call)
            pltpu.prng_seed(seed_ref[0],
                            seed_ref[1] ^ (b * jnp.int32(-1640531527)))
            bits = pltpu.bitcast(pltpu.prng_random_bits((rps, r)),
                                 jnp.int32)
            u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
            if rule == "metropolis":
                t = jnp.log(u) * nib_ref[:]
            else:  # glauber
                t = (jnp.log(u) - jnp.log1p(-jnp.minimum(u, 0.999999))) \
                    * nib_ref[:]
            t = jnp.where(u < 1.0, t, -jnp.inf)       # ADVICE r4 #1 guard
            th[:] = jnp.where(mask_ref[:] < 0, -jnp.inf, t)
        else:
            (th_in_ref,) = rng_in
            th[:] = th_in_ref[:]                      # pre-masked upstream
        # Gather/field phase: STATICALLY unrolled edge slots with one
        # scalar per-STEP predicate each. A dynamic per-row fori_loop
        # measured 20.3 ns/edge vs 2.4 ns static-unrolled (v5e probe —
        # the loop overhead, not the loads, dominated the v1 kernel); the
        # step-level `e < ks` guard skips unused high-degree slots for
        # low-degree steps, and val=0 padding inertly fills the rest.
        # expr_k0 > 0 accumulates the first slots as one register
        # expression tree per row (no per-edge acc ref traffic, no
        # guards; val=0 padding keeps it exact). MEASURED SLOWER on v5e
        # at [10k, R=1024]: k0=8 -> 560 us/sweep, k0=32 -> 887 vs 475
        # for the guarded ref-accumulate — the unconditional padded-slot
        # loads cost more than the acc read/write they save. Default 0.
        # The accept phase runs vectorized on the whole [rps, R] step
        # (same-color rows are independent; per-row accepts cost ~500
        # us/sweep at [10k, 1024] in the v1 kernel).
        ks = kr_ref[b % KS_BLOCK, 0]
        k0 = min(kmax, expr_k0)
        for i in range(rps):
            # h_ref is VMEM: read the [1, 1] slice and broadcast (scalar
            # element reads only lower from SMEM)
            f = jnp.zeros((1, r), jnp.float32) + h_ref[i:i + 1, :]
            for e in range(k0):
                f = f + val_ref[i, e] * s_io_ref[pl.ds(idx_ref[i, e], 1), :]
            acc[i:i + 1, :] = f
        for e in range(k0, kmax):
            @pl.when(e < ks)
            def _(e=e):
                for i in range(rps):
                    row = idx_ref[i, e]
                    acc[i:i + 1, :] = (acc[i:i + 1, :]
                                       + val_ref[i, e]
                                       * s_io_ref[pl.ds(row, 1), :])
        blk = pl.ds(b * rps, rps)
        s_blk = s_io_ref[blk, :]
        sf = s_blk * acc[:]
        a = sf < th[:]
        s_io_ref[blk, :] = jnp.where(a, -s_blk, s_blk)
        de_out[:] = de_out[:] + 2.0 * jnp.sum(jnp.where(a, sf, 0.0),
                                              axis=0, keepdims=True)
        cnt_out[:] = cnt_out[:] + jnp.sum(a.astype(jnp.float32), axis=0,
                                          keepdims=True)

    def init_spins(b, s_in_ref, s_io_ref, dma_sem):
        # s_in stays in HBM (memory_space ANY) and is DMA'd into the VMEM
        # output window once — a second [NS, R] VMEM input window halved
        # the serviceable NS*R (16k x 1024 f32 = 64 MB failed Mosaic
        # allocation with two windows; ~88 MB compiles with one)
        @pl.when(b == 0)
        def _():
            dma = pltpu.make_async_copy(s_in_ref, s_io_ref, dma_sem)
            dma.start()
            dma.wait()

    if kernel_rng:
        def kernel(seed_ref, idx_ref, kr_ref, val_ref, h_ref, mask_ref,
                   nib_ref, s_in_ref, s_io_ref, de_out, cnt_out,
                   th, acc, dma_sem):
            b = pl.program_id(0)
            init_spins(b, s_in_ref, s_io_ref, dma_sem)

            @pl.when(b == 0)
            def _():
                de_out[:] = jnp.zeros_like(de_out)
                cnt_out[:] = jnp.zeros_like(cnt_out)

            body(b, seed_ref, idx_ref, kr_ref, val_ref, h_ref,
                 (mask_ref, nib_ref), s_io_ref, de_out, cnt_out, th, acc)

        rng_specs = [
            pl.BlockSpec((rps, 1), lambda b, s: (b, 0)),      # mask col
            pl.BlockSpec((1, r), lambda b, s: (0, 0)),        # nib
        ]
    else:
        def kernel(seed_ref, idx_ref, kr_ref, val_ref, h_ref, th_in_ref,
                   s_in_ref, s_io_ref, de_out, cnt_out, th, acc, dma_sem):
            b = pl.program_id(0)
            init_spins(b, s_in_ref, s_io_ref, dma_sem)

            @pl.when(b == 0)
            def _():
                de_out[:] = jnp.zeros_like(de_out)
                cnt_out[:] = jnp.zeros_like(cnt_out)

            body(b, seed_ref, idx_ref, kr_ref, val_ref, h_ref,
                 (th_in_ref,), s_io_ref, de_out, cnt_out, th, acc)

        rng_specs = [
            pl.BlockSpec((rps, r), lambda b, s: (b, 0)),      # th_in
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,           # seed [2] (SMEM scalars)
        grid=(n_steps,),
        scratch_shapes=[
            pltpu.VMEM((rps, r), jnp.float32),        # th
            pltpu.VMEM((rps, r), jnp.float32),        # acc / f rows
            pltpu.SemaphoreType.DMA,                  # s_in -> s_io copy
        ],
        in_specs=[
            pl.BlockSpec((rps, kmax), lambda b, s: (b, 0),
                         memory_space=pltpu.SMEM),     # idx
            pl.BlockSpec((KS_BLOCK, 1), lambda b, s: (b // KS_BLOCK, 0),
                         memory_space=pltpu.SMEM),     # ks (step chunk)
            pl.BlockSpec((rps, kmax), lambda b, s: (b, 0),
                         memory_space=pltpu.SMEM),     # val (scalar reads)
            pl.BlockSpec((rps, 1), lambda b, s: (b, 0)),   # h (vector add)
        ] + rng_specs + [
            pl.BlockSpec(memory_space=pl.ANY),        # s_in (stays HBM)
        ],
        out_specs=(
            pl.BlockSpec((n_sorted, r), lambda b, s: (0, 0)),
            pl.BlockSpec((1, r), lambda b, s: (0, 0)),
            pl.BlockSpec((1, r), lambda b, s: (0, 0)),
        ),
    )
    # operand index of s_in counting the scalar-prefetch seed:
    # seed, idx, krow, val, h, <2 rng-mode operands or 1 th>, s_in
    s_in_index = 5 + len(rng_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_sorted, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ),
        input_output_aliases={s_in_index: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_sorted_t_sweep(groups):
    """Traceable transposed sorted sweep: spins [NS, R] (int8 or f32),
    thresholds [NS, R] f32 (pre-masked). Per color the degree buckets all
    gather from the SAME spin state (independent set) and the color's flips
    apply as one contiguous aligned slice update. Row-gathers in [NS, R]
    read whole contiguous replica rows — measured 553 vs 797 us/sweep
    against the [R, NS] minor-dim gathers of make_sorted_sweep."""

    def sweep(s_t, th_t):
        r = s_t.shape[1]
        de_acc = jnp.zeros((r,), jnp.float32)
        cnt = jnp.zeros((r,), jnp.int32)
        for off, mc, bs in groups:
            fs = []
            for b in bs:  # independent: all read the same `s_t`
                g = s_t[b.idx]                      # [m, k, R]
                fs.append(jnp.einsum("mkr,mk->mr", g.astype(jnp.float32),
                                     b.val) + b.h[:, None])
            f = jnp.concatenate(fs, axis=0) if len(fs) > 1 else fs[0]
            s_c = lax.slice_in_dim(s_t, off, off + mc, axis=0)
            sf = s_c.astype(jnp.float32) * f
            acc = sf < lax.slice_in_dim(th_t, off, off + mc, axis=0)
            s_new = jnp.where(acc, -s_c, s_c)
            s_t = lax.dynamic_update_slice(s_t, s_new, (off, 0))
            de_acc = de_acc + 2.0 * jnp.sum(jnp.where(acc, sf, 0.0), axis=0)
            cnt = cnt + jnp.sum(acc, axis=0).astype(jnp.int32)
        return s_t, de_acc, cnt

    return sweep


class SortedSparseTEngine:
    """Transposed ([NS, R]) aligned sorted sliced-ELL engine — the
    wide-replica sparse fast path on TPU (engines.SweepEngine contract,
    layout 'nr').

    Three measured improvements over SortedSparseEngine on the 10k-spin
    avg-degree-6 benchmark at R=1024 on v5e (1477 -> 964 us/sweep,
    6.9 -> 10.6 Gflips/s):
    * [NS, R] layout: neighbor gathers read whole contiguous replica rows
      (major-dim gather) instead of minor-dim scattered elements;
    * tile-aligned color spans + 12 degree buckets (build_sorted_t);
    * acceptance thresholds generated on-chip by a Pallas PRNG kernel
      (make_threshold_call) instead of host threefry + accept_threshold.
    Spins are carried as int8 between sweeps (smaller gather rows and
    HBM footprint; decisions are identical — spin values are exact in
    int8 and fields are accumulated in f32).

    For narrow replica counts (R < 256, e.g. single-ladder PT) the [R, NS]
    SortedSparseEngine stays faster — make_engine picks by ``r_hint``."""

    layout = "nr"
    name = "sparse_sorted_t"

    def __init__(self, problem, rule: str = "metropolis",
                 max_colors: int = 256, n_buckets: int = 12,
                 spin_dtype=jnp.int8, threshold_rng: str = "auto",
                 accept_kernel: str = "auto", bucket_order: str = "degree",
                 single_rows_per_step: int = 32):
        from spinglass_tpu.kernels.sweeps import canonical_rule

        self.problem = problem
        self.rule = canonical_rule(rule)
        self.spin_dtype = jnp.dtype(spin_dtype)
        if isinstance(problem, EllProblem):
            ell = problem
            idx = np.asarray(problem.idx)
            val = np.asarray(problem.val)
            rows_l, cols_l = np.nonzero(val)
            rows = rows_l.astype(np.int64)
            cols = idx[rows_l, cols_l].astype(np.int64)
            colors = topology.greedy_coloring_coo(
                rows, cols, problem.n_spins, max_colors=max_colors,
                balanced=True)
        else:
            ell = EllProblem.from_problem(problem)
            n = problem.n_spins
            j_np = np.asarray(problem.j)[:n, :n]
            rows, cols = (a.astype(np.int64) for a in np.nonzero(j_np))
            colors = topology.greedy_coloring_coo(rows, cols, n,
                                                  max_colors=max_colors,
                                                  balanced=True)
        self.ell = ell
        self.n_colors = int(colors.max()) + 1 if colors.size else 1
        (self.perm, self.inv_map, self.groups, self.mask_col,
         self.n_sorted) = build_sorted_t(ell, colors, n_buckets=n_buckets,
                                         bucket_order=bucket_order)
        self._perm_gather = jnp.asarray(np.where(self.perm >= 0,
                                                 self.perm, 0))
        self._inv_map_j = jnp.asarray(self.inv_map)
        self._use_pallas_rng = (threshold_rng == "pallas"
                                or (threshold_rng == "auto"
                                    and jax.default_backend() == "tpu"))
        # fused accept (r4 experiment): one Pallas pass does RNG+threshold+
        # flip+reduce per color instead of the [NS, R] threshold round trip
        # + XLA elementwise chain. MEASURED SLOWER on v5e at the bench
        # shape (1021-1027 vs 947-951 us/sweep, interleaved min-of-5 at
        # scan lengths 100/500): the ~n_colors per-sweep pallas_call
        # overheads exceed the ~80 MB/sweep threshold-traffic saving.
        # Off by default; kept as an option (correctness-tested on TPU).
        self._use_fused_accept = accept_kernel == "fused"
        if self._use_fused_accept and jax.default_backend() != "tpu":
            # no CPU path exists: pltpu.prng_seed has no CPU lowering even
            # in interpret mode — fail at construction, not mid-sweep
            raise ValueError(
                "accept_kernel='fused' requires a TPU backend (the "
                "kernel's on-chip PRNG has no CPU lowering); use the "
                "default threshold path off-TPU")
        # single-call whole-sweep kernel (r5, VERDICT r4 task 4): gather +
        # fields + threshold + flip for ALL colors in ONE pallas_call with
        # spins VMEM-resident (see make_single_sweep_call). Carries f32
        # spins ([1, R] f32 rows gather at 1/8 sublane use; int8 rows
        # would be 1/32 and selects on int8 crash Mosaic — r3 finding).
        # MEASURED on v5e [10k spins, deg 6, R=1024], marginal protocol:
        # 478 us/sweep = 21.4 Gflips/s vs the threshold path's 996 us
        # (10.3 G) — 2.1x, and BELOW the old 553 us "gather floor"
        # (that floor was an XLA artifact: XLA materializes the [m, k, R]
        # gather to HBM; the in-kernel gather stays in VMEM). DEFAULT on
        # TPU via accept_kernel="auto"; falls back to the threshold path
        # when the replica count is not lane-aligned (r % 128 != 0).
        self._accept_kernel = accept_kernel
        # rows per single-kernel grid step; must divide the 32-row color
        # alignment (32 = measured default; tests use 8 to shrink the
        # interpret-mode trace ~4x)
        if single_rows_per_step not in (8, 16, 32):
            raise ValueError("single_rows_per_step must be 8, 16 or 32")
        self._srps = single_rows_per_step
        self._use_single = (accept_kernel == "single"
                            or (accept_kernel == "auto"
                                and jax.default_backend() == "tpu"))
        # instances whose [NS, 128] f32 spins (the MINIMUM lane-aligned
        # replica width) exceed the VMEM budget can never run the single
        # kernel — don't build/ship its ~NS*KMAX*8-byte tables (at 1M
        # spins they cost ~250 MB of HBM and OOM'd the R=1024 threshold
        # path that auto mode falls back to anyway)
        if (accept_kernel == "auto" and self._use_single
                and self.n_sorted * 128 * 4 > self.SINGLE_VMEM_SPIN_BYTES):
            self._use_single = False
        if self._use_single:
            self.spin_dtype = jnp.dtype(jnp.float32)
            (self._sidx, self._skrow, self._sval, self._sh,
             self._skmax) = self._single_tables()
        self._single_calls = {}
        self._sweep = make_sorted_t_sweep(self.groups)
        self._sweep_fused = make_sorted_t_sweep_fused(
            self.groups, self.mask_col, self.rule, self.spin_dtype)
        self._th_calls = {}

    def _single_tables(self):
        idx_all, val_all, krow, h_all, kmax = build_single_tables(
            self.groups, self.n_sorted, rps=self._srps)
        return idx_all, krow, val_all, h_all, kmax

    def _single_call(self, r, kernel_rng, interpret=False):
        key = (r, kernel_rng, interpret)
        if key not in self._single_calls:
            self._single_calls[key] = make_single_sweep_call(
                self.n_sorted, r, self._skmax, self.rule,
                kernel_rng=kernel_rng, rows_per_step=self._srps,
                interpret=interpret)
        return self._single_calls[key]

    # single-call mode keeps the whole [NS, R] f32 spin array VMEM-resident;
    # beyond this byte budget (v5e scoped VMEM ~100 MB, minus th/acc
    # scratches and streamed operands) auto mode falls back to the
    # threshold path (1M-spin instances would fail Mosaic allocation)
    SINGLE_VMEM_SPIN_BYTES = 80 * 1024 * 1024

    def _single_fits(self, r: int) -> bool:
        return self.n_sorted * r * 4 <= self.SINGLE_VMEM_SPIN_BYTES

    def _sweep_single(self, spins_t, beta, key):
        r = spins_t.shape[1]
        s32 = spins_t.astype(jnp.float32)
        if jax.default_backend() == "tpu":
            beta_r = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
            nib = (-0.5 / beta_r)[None, :]
            s, de, cnt = self._single_call(r, True)(
                self._seed_words(key), self._sidx, self._skrow, self._sval,
                self._sh, self.mask_col, nib, s32)
        else:  # CPU/interpret: host thresholds (no pltpu PRNG lowering)
            th = self._thresholds(r, beta, key)
            s, de, cnt = self._single_call(r, False, interpret=True)(
                self._seed_words(key), self._sidx, self._skrow, self._sval,
                self._sh, th, s32)
        return s, de[0], cnt[0].astype(jnp.int32)

    # -- layout ------------------------------------------------------------
    def to_layout(self, spins_rn):
        s_t = spins_rn[:, self._perm_gather].T
        return s_t.astype(self.spin_dtype)

    def from_layout(self, spins_t):
        s_rn = spins_t[self._inv_map_j].T.astype(jnp.float32)
        # original padding rows carry junk sorted rows; restore the +1
        # convention of core.problem.random_spins
        return jnp.where(self.ell.active_mask[None, :] > 0, s_rn, 1.0)

    # -- energy (exact, in the transposed layout) --------------------------
    def energy(self, spins_t):
        s32 = spins_t.astype(jnp.float32)
        r = spins_t.shape[1]
        e = jnp.zeros((r,), jnp.float32)
        for _, _, bs in self.groups:
            for b in bs:
                g = s32[b.idx]                     # [m, k, R]
                fj = jnp.einsum("mkr,mk->mr", g, b.val)
                s_b = lax.slice_in_dim(s32, b.off, b.off + b.m, axis=0)
                e = e - 0.5 * jnp.sum(s_b * fj, axis=0) \
                    - jnp.sum(b.h[:, None] * s_b, axis=0)
        return e

    # -- sweeps ------------------------------------------------------------
    def _thresholds(self, r, beta, key):
        from spinglass_tpu.kernels.sweeps import accept_threshold

        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
        if self._use_pallas_rng and r % 128 == 0:
            if r not in self._th_calls:
                self._th_calls[r] = make_threshold_call(
                    self.n_sorted, r, self.rule)
            nib = (-0.5 / beta)[None, :]
            return self._th_calls[r](self._seed_words(key), nib,
                                     self.mask_col)
        u = jax.random.uniform(key, (self.n_sorted, r), jnp.float32)
        th = accept_threshold(u, beta[None, :], self.rule)
        return jnp.where(self.mask_col < 0, -jnp.inf, th)

    def _seed_words(self, key):
        """Kernel seed from the key's own counter words (keys are split per
        sweep upstream; a scalar randint would serialize a threefry against
        the sweep chain, ~65 us/sweep at R=1024). Both words: 2^64 stream
        space (ADVICE r3 #1)."""
        data = jax.random.key_data(key).reshape(-1)
        return jnp.concatenate([
            lax.bitcast_convert_type(data[0], jnp.int32).reshape(1),
            lax.bitcast_convert_type(data[-1], jnp.int32).reshape(1)])

    def sweep(self, spins_t, beta, key):
        r = spins_t.shape[1]
        if ((self._use_fused_accept
             or self._accept_kernel == "single") and r % 128 != 0):
            raise ValueError(
                f"accept_kernel='fused'/'single' needs replica count % 128 "
                f"== 0 (got {r}); falling back silently would benchmark "
                f"the wrong code path")
        if self._use_single and r % 128 == 0 and self._single_fits(r):
            # auto mode falls back to the threshold path for unaligned r
            # or VMEM-overflowing [NS, R] (the explicit 'single' setting
            # also falls back on overflow — Mosaic would fail allocation)
            return self._sweep_single(spins_t, beta, key)
        if self._use_fused_accept:
            beta_r = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
            nib = (-0.5 / beta_r)[None, :]
            return self._sweep_fused(spins_t, nib, self._seed_words(key))
        th = self._thresholds(r, beta, key)
        return self._sweep(spins_t, th)

    def sweep_with_uniforms(self, spins_t, beta, uniforms_t):
        """Deterministic-uniform entry (tests): uniforms in the SORTED
        transposed layout — sorted row p consumes uniforms_t[p, :].
        In single-call mode this drives the no-RNG kernel variant, which
        must be decision-identical to the per-color XLA sweep under the
        same thresholds."""
        from spinglass_tpu.kernels.sweeps import accept_threshold

        r = spins_t.shape[1]
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (r,))
        th = accept_threshold(uniforms_t, beta[None, :], self.rule)
        th = jnp.where(self.mask_col < 0, -jnp.inf, th)
        if self._use_single and r % 128 == 0 and self._single_fits(r):
            interp = jax.default_backend() != "tpu"
            s, de, cnt = self._single_call(r, False, interpret=interp)(
                jnp.zeros((2,), jnp.int32), self._sidx, self._skrow,
                self._sval, self._sh, th, spins_t.astype(jnp.float32))
            return s, de[0], cnt[0].astype(jnp.int32)
        return self._sweep(spins_t, th)

    # jit-boundary contract (anneal.engines.SweepEngine docstring)
    def operands(self):
        ops = {"ell": self.ell, "mask_col": self.mask_col,
               "_perm_gather": self._perm_gather,
               "_inv_map_j": self._inv_map_j,
               "buckets": _bucket_arrays(self.groups)}
        if self._use_single:
            ops["single"] = (self._sidx, self._skrow, self._sval, self._sh)
        return ops

    def bind(self, ops):
        import copy

        eng = copy.copy(self)
        eng.ell = ops["ell"]
        eng.mask_col = ops["mask_col"]
        eng._perm_gather = ops["_perm_gather"]
        eng._inv_map_j = ops["_inv_map_j"]
        eng.groups = _rebind_groups(self.groups, ops["buckets"])
        if self._use_single and "single" in ops:
            (eng._sidx, eng._skrow, eng._sval, eng._sh) = ops["single"]
        eng._sweep = make_sorted_t_sweep(eng.groups)
        eng._sweep_fused = make_sorted_t_sweep_fused(
            eng.groups, eng.mask_col, eng.rule, eng.spin_dtype)
        return eng


class SparseEngine:
    """Sweep engine over ELL problems (engines.SweepEngine contract,
    layout 'rn'). Selected automatically for low-density large instances;
    also constructible dense-free from an EllProblem (anneal() accepts
    EllProblem directly)."""

    layout = "rn"
    name = "sparse_colored"

    def __init__(self, problem, rule: str = "metropolis",
                 max_colors: int = 256, compact: bool = True):
        self.problem = problem
        self.rule = rule
        if isinstance(problem, EllProblem):
            self.ell = problem
            idx = np.asarray(problem.idx)
            val = np.asarray(problem.val)
            rows_l, cols_l = np.nonzero(val)
            rows = rows_l.astype(np.int64)
            cols = idx[rows_l, cols_l].astype(np.int64)
            colors = topology.greedy_coloring_coo(rows, cols,
                                                  problem.n_spins,
                                                  max_colors=max_colors,
                                                  balanced=compact)
        else:
            self.ell = EllProblem.from_problem(problem)
            n = problem.n_spins
            j_np = np.asarray(problem.j)[:n, :n]
            rows, cols = (a.astype(np.int64) for a in np.nonzero(j_np))
            colors = topology.greedy_coloring_coo(rows, cols, n,
                                                  max_colors=max_colors,
                                                  balanced=compact)
        self.n_colors = int(colors.max()) + 1 if colors.size else 1
        self.masks = color_masks_from_colors(colors, problem.n_padded)
        self.compact = compact
        self.groups = build_color_groups(self.ell, colors) if compact else None

    def energy(self, spins):
        return sparse_energy(self.ell, spins)

    def to_layout(self, spins_rn):
        return spins_rn

    def from_layout(self, spins):
        return spins

    def sweep(self, spins, beta, key):
        uniforms = jax.random.uniform(key, spins.shape, jnp.float32)
        if self.compact:
            return sparse_colored_sweep_compact(
                self.ell, self.groups, spins, beta, uniforms, rule=self.rule)
        return sparse_colored_sweep(self.ell, self.masks, spins, beta,
                                    uniforms, rule=self.rule)

    # jit-boundary contract (anneal.engines.SweepEngine docstring);
    # ColorGroups is a flax pytree so it passes wholesale
    def operands(self):
        return {"ell": self.ell, "masks": self.masks, "groups": self.groups}

    def bind(self, ops):
        import copy

        eng = copy.copy(self)
        eng.ell = ops["ell"]
        eng.masks = ops["masks"]
        eng.groups = ops["groups"]
        return eng


def _bucket_arrays(groups):
    """Flat list of (idx, val, h) per bucket — the operand leaves of a
    sorted-layout engine (see anneal.engines.SweepEngine jit-boundary
    contract; bucket OFFSETS stay static in the closure)."""
    return [(b.idx, b.val, b.h) for _, _, bs in groups for b in bs]


def _rebind_groups(groups, arrays):
    """Same group structure, bucket arrays replaced by (traced) values."""
    import copy

    it = iter(arrays)
    out = []
    for off, size, bs in groups:
        nbs = []
        for b in bs:
            nb = copy.copy(b)
            nb.idx, nb.val, nb.h = next(it)
            nbs.append(nb)
        out.append((off, size, nbs))
    return out


class SortedSparseEngine:
    """Sorted sliced-ELL sweep engine — the fast sparse path on TPU.

    Improvements over SparseEngine(compact=True), both per sweep:
    * sliced-ELL: per-bucket K = that bucket's max degree instead of the
      global max degree (~3x less gather work on irregular-degree graphs);
    * color-sorted spin layout: spin reads/writes are contiguous slices, so
      the node-gather, threshold-gather, and scatter-add of the compact
      sweep disappear — only the irreducible neighbor gather remains.

    State lives in the sorted layout between sweeps; ``to_layout`` /
    ``from_layout`` convert at the run boundary (the SweepEngine contract
    the SA/PT drivers already use)."""

    layout = "rn"
    name = "sparse_sorted"

    def __init__(self, problem, rule: str = "metropolis",
                 max_colors: int = 256, n_buckets: int = 4):
        from spinglass_tpu.kernels.sweeps import canonical_rule

        self.problem = problem
        self.rule = canonical_rule(rule)
        if isinstance(problem, EllProblem):
            ell = problem
            idx = np.asarray(problem.idx)
            val = np.asarray(problem.val)
            rows_l, cols_l = np.nonzero(val)
            rows = rows_l.astype(np.int64)
            cols = idx[rows_l, cols_l].astype(np.int64)
            colors = topology.greedy_coloring_coo(
                rows, cols, problem.n_spins, max_colors=max_colors,
                balanced=True)
        else:
            ell = EllProblem.from_problem(problem)
            n = problem.n_spins
            j_np = np.asarray(problem.j)[:n, :n]
            rows, cols = (a.astype(np.int64) for a in np.nonzero(j_np))
            colors = topology.greedy_coloring_coo(rows, cols, n,
                                                  max_colors=max_colors,
                                                  balanced=True)
        self.ell = ell
        self.n_colors = int(colors.max()) + 1 if colors.size else 1
        (self.perm, self.inv_perm, self.buckets,
         self.color_groups) = build_sorted_buckets(
            ell, colors, n_buckets=n_buckets)
        self._perm_j = jnp.asarray(self.perm)
        self._inv_perm_j = jnp.asarray(self.inv_perm)
        # full sorted ELL for energy evaluation in the sorted layout
        idx_np = np.asarray(ell.idx)
        self.ell_sorted = EllProblem(
            idx=jnp.asarray(self.inv_perm[idx_np[self.perm]].astype(np.int32)),
            val=ell.val[self._perm_j],
            h=ell.h[self._perm_j],
            active_mask=ell.active_mask[self._perm_j],
            n_spins=ell.n_spins,
        )
        self._sweep = make_sorted_sweep(self.color_groups, ell.n_padded,
                                        rule=self.rule)

    def energy(self, spins):
        return sparse_energy(self.ell_sorted, spins)

    def to_layout(self, spins_rn):
        return spins_rn[:, self._perm_j]

    def from_layout(self, spins):
        return spins[:, self._inv_perm_j]

    def sweep(self, spins, beta, key):
        uniforms = jax.random.uniform(key, spins.shape, jnp.float32)
        return self._sweep(spins, beta, uniforms)

    def sweep_with_uniforms(self, spins, beta, uniforms_sorted):
        """Deterministic-uniform entry for tests (uniforms already in the
        sorted layout: sorted position p consumes uniforms[:, p])."""
        return self._sweep(spins, beta, uniforms_sorted)

    # jit-boundary contract (anneal.engines.SweepEngine docstring)
    def operands(self):
        return {"ell_sorted": self.ell_sorted, "_perm_j": self._perm_j,
                "_inv_perm_j": self._inv_perm_j,
                "buckets": _bucket_arrays(self.color_groups)}

    def bind(self, ops):
        import copy

        eng = copy.copy(self)
        eng.ell_sorted = ops["ell_sorted"]
        eng._perm_j = ops["_perm_j"]
        eng._inv_perm_j = ops["_inv_perm_j"]
        eng.color_groups = _rebind_groups(self.color_groups, ops["buckets"])
        eng._sweep = make_sorted_sweep(eng.color_groups,
                                       self.ell.n_padded, rule=self.rule)
        return eng

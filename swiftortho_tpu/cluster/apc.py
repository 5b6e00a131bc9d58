"""Affinity-propagation clustering as jitted edge-list segment ops.

Behavioral contract: reference ``apclust`` (bin/find_cluster.py:517-617)
and ``fc2mat`` (:767-858): edge rows (i, k, s) for both directions of every
pair plus self-preference rows s = -20 * n_taxa; damped R/A updates;
exemplar per node = argmax_k(R+A); converged after 15 unchanged sweeps;
clusters = connected components of the node->exemplar graph.

Documented deviation: the reference's numba row-max kernel carries two
order-dependent artifacts (the running 2nd-max is never demoted when a new
max arrives, and the max registers persist across iterations,
find_cluster.py:538-552).  We compute the exact per-iteration row max and
runner-up — the textbook update the reference approximates — so cluster
assignments can differ on near-tie margins.  Measured on the shared
parity corpus (4 taxa x 40 families, tests/test_ref_parity.py): 37/40
reference groups identical (92.5%); the textbook max splits the other 3
into finer subsets.  ``apc_cluster_faithful`` replicates the reference's
streaming quirks bit-for-bit instead — partition-identical to the
runnable reference, enforced by TestFindClusterAPC — and is the DRIVER
DEFAULT as of r5 (measured 1.49x over textbook at ~100k-graph scale,
BASELINE.md r5; quirks are the spec).  ``SWIFTORTHO_APC_FAITHFUL=0`` or
``ClusterConfig(faithful=False)`` selects the textbook mode; the direct
``apc_cluster``/``apc_cluster_blocked`` functions stay textbook.
"""

from __future__ import annotations

from functools import partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from .components import connected_components

NEG = -3.4e38


@partial(jax.jit, static_argnames=('n_nodes', 'damp', 'convit', 'itr'))
def _apclust_core(ei: jnp.ndarray, ek: jnp.ndarray, s: jnp.ndarray,
                  n_nodes: int, damp: float = 0.5, convit: int = 15,
                  itr: int = 100) -> jnp.ndarray:
    E = ei.shape[0]
    beta = 1.0 - damp
    is_self = ei == ek
    eidx = jnp.arange(E)

    def body(state):
        r, a, lab, mconv, i_ = state
        ra = r + a
        # per-row max and runner-up (exact)
        m1 = jnp.full(n_nodes, NEG).at[ei].max(ra)
        # arg of the max: smallest edge index achieving it
        hit = ra >= m1[ei] - 0.0
        first = jnp.full(n_nodes, E).at[ei].min(jnp.where(hit, eidx, E))
        is_arg = eidx == first[ei]
        m2 = jnp.full(n_nodes, NEG).at[ei].max(jnp.where(is_arg, NEG, ra))
        r_new = s - jnp.where(is_arg, m2[ei], m1[ei])
        r = damp * r + beta * r_new

        rkk = jnp.zeros(n_nodes).at[ei].max(
            jnp.where(is_self, r, NEG))          # R_kk per node
        colsum = jnp.zeros(n_nodes).at[ek].add(
            jnp.where(is_self, 0.0, jnp.maximum(0.0, r)))
        a_new = jnp.where(is_self, colsum[ek],
                          jnp.minimum(0.0, rkk[ek] + colsum[ek]
                                      - jnp.maximum(0.0, r)))
        a = damp * a + beta * a_new

        ra = r + a
        m = jnp.full(n_nodes, NEG).at[ei].max(ra)
        hit = ra >= m[ei]
        firstk = jnp.full(n_nodes, E).at[ei].min(jnp.where(hit, eidx, E))
        new_lab = jnp.where(firstk < E, ek[jnp.clip(firstk, 0, E - 1)],
                            jnp.arange(n_nodes))
        changed = jnp.any(new_lab != lab)
        mconv = jnp.where(changed, 0, mconv + 1)
        return r, a, new_lab, mconv, i_ + 1

    def cond(state):
        _, _, _, mconv, i_ = state
        return (i_ < itr) & (mconv <= convit)

    z = jnp.zeros(E)
    lab0 = jnp.arange(n_nodes)
    _, _, lab, _, _ = jax.lax.while_loop(
        cond, body, (z, z, lab0, jnp.int32(0), jnp.int32(0)))
    return lab


@partial(jax.jit, static_argnames=('n1',))
def _blk_max_by(acc, idx, val, n1: int):
    return acc.at[idx].max(val)


@jax.jit
def _blk_first(acc, idx, val, thresh_by_idx, base):
    hit = val >= thresh_by_idx[idx]
    eidx = base + jnp.arange(val.shape[0], dtype=jnp.int64)
    return acc.at[idx].min(jnp.where(hit, eidx, jnp.int64(2 ** 62)))


@partial(jax.jit, static_argnames=('n1', 'damp'))
def _blk_r_update(r, a, s, ei, ek, m1, m2, first, base, n1: int,
                  damp: float):
    """Damped R update for one block + partial rkk/colsum contributions."""
    beta = 1.0 - damp
    eidx = base + jnp.arange(r.shape[0])
    is_arg = eidx == first[ei]
    r_new = s - jnp.where(is_arg, m2[ei], m1[ei])
    r = damp * r + beta * r_new
    is_self = ei == ek
    rkk_part = jnp.full(n1, NEG, r.dtype).at[ei].max(
        jnp.where(is_self, r, NEG))
    col_part = jnp.zeros(n1, r.dtype).at[ek].add(
        jnp.where(is_self, 0.0, jnp.maximum(0.0, r)))
    return r, rkk_part, col_part


@partial(jax.jit, static_argnames=('n1', 'damp'))
def _blk_a_update(r, a, ei, ek, rkk, colsum, n1: int, damp: float):
    """Damped A update for one block + partial row-max of R+A."""
    beta = 1.0 - damp
    is_self = ei == ek
    a_new = jnp.where(is_self, colsum[ek],
                      jnp.minimum(0.0, rkk[ek] + colsum[ek]
                                  - jnp.maximum(0.0, r)))
    a = damp * a + beta * a_new
    m_part = jnp.full(n1, NEG, r.dtype).at[ei].max(r + a)
    return a, m_part


def apc_cluster_blocked(n: int, ei: np.ndarray, ej: np.ndarray,
                        w: np.ndarray, n_taxa: int, damp: float = 0.5,
                        convit: int = 15, itr: int = 100,
                        block: int = 25_000_000,
                        spill_dir: str | None = None) -> List[List[int]]:
    """Blocked / out-of-core affinity propagation — the reference's
    ``apclust_blk`` (bin/find_cluster.py:405-513): the (i, k, s, R, A)
    edge table is swept in `block`-row blocks (reference -b default
    25e6), so device and host memory are bounded by one block plus the
    (n,) accumulators.  With ``spill_dir`` the R/A columns live in disk
    memmaps (the reference's cffi-mmapped .npy, :36-77).

    Same math per sweep as ``_apclust_core`` (exact row max/runner-up —
    the deviation from the reference's numba artifacts documented in the
    module docstring applies here too).  Block-partial reductions are
    combined with max/sum, so results match the in-memory path up to
    float addition order in colsum.
    """
    if len(ei) == 0:
        return []
    pref = -20.0 * n_taxa
    i_all = np.concatenate([ei, ej, np.arange(n)]).astype(np.int64)
    k_all = np.concatenate([ej, ei, np.arange(n)]).astype(np.int64)
    s_all = np.concatenate([w, w, np.full(n, pref)]).astype(np.float32)
    E = len(i_all)
    n1 = n + 1                                   # slot n = padding sink

    if spill_dir:
        import os
        os.makedirs(spill_dir, exist_ok=True)
        r = np.memmap(os.path.join(spill_dir, 'R.f32'), np.float32,
                      'w+', shape=(E,))
        a = np.memmap(os.path.join(spill_dir, 'A.f32'), np.float32,
                      'w+', shape=(E,))
        r[:] = 0.0
        a[:] = 0.0
    else:
        r = np.zeros(E, np.float32)
        a = np.zeros(E, np.float32)

    nb = -(-E // block)
    blocks = [(b * block, min((b + 1) * block, E)) for b in range(nb)]

    def pad_blk(x, lo, hi, fill):
        out = x[lo:hi]
        if hi - lo < min(block, E):
            out = np.concatenate(
                [out, np.full(min(block, E) - (hi - lo), fill, x.dtype)])
        return out

    bsz = min(block, E)
    ei_b = [pad_blk(i_all, lo, hi, n) for lo, hi in blocks]
    ek_b = [pad_blk(k_all, lo, hi, n) for lo, hi in blocks]
    s_b = [pad_blk(s_all, lo, hi, 0.0) for lo, hi in blocks]

    def blk_ra(b):
        lo, hi = blocks[b]
        return jnp.asarray(pad_blk(r, lo, hi, NEG)) \
            + jnp.asarray(pad_blk(a, lo, hi, 0.0))

    lab = np.arange(n, dtype=np.int64)
    mconv = 0
    with jax.enable_x64(True):   # 64-bit global edge indices in `first`
        for it in range(itr):
            # sweep 1: per-row max of R+A
            m1 = jnp.full(n1, NEG, jnp.float32)
            for b, (lo, hi) in enumerate(blocks):
                m1 = _blk_max_by(m1, jnp.asarray(ei_b[b]), blk_ra(b), n1)
            # sweep 2: first edge index achieving the row max
            first = jnp.full(n1, 2 ** 62, jnp.int64)
            for b, (lo, hi) in enumerate(blocks):
                first = _blk_first(first, jnp.asarray(ei_b[b]), blk_ra(b),
                                   m1, lo)
            # sweep 3: runner-up excluding the arg edge
            m2 = jnp.full(n1, NEG, jnp.float32)
            for b, (lo, hi) in enumerate(blocks):
                eidx = lo + jnp.arange(bsz)
                is_arg = eidx == first[jnp.asarray(ei_b[b])]
                m2 = _blk_max_by(m2, jnp.asarray(ei_b[b]),
                                 jnp.where(is_arg, NEG, blk_ra(b)), n1)
            # sweep 4: R update + rkk/colsum accumulation
            rkk = jnp.full(n1, NEG, jnp.float32)
            colsum = jnp.zeros(n1, jnp.float32)
            for b, (lo, hi) in enumerate(blocks):
                rb, rkk_p, col_p = _blk_r_update(
                    jnp.asarray(pad_blk(r, lo, hi, 0.0)),
                    jnp.asarray(pad_blk(a, lo, hi, 0.0)),
                    jnp.asarray(s_b[b]), jnp.asarray(ei_b[b]),
                    jnp.asarray(ek_b[b]), m1, m2, first, lo, n1,
                    float(damp))
                r[lo:hi] = np.asarray(rb)[:hi - lo]
                rkk = jnp.maximum(rkk, rkk_p)
                colsum = colsum + col_p
            rkk = jnp.maximum(rkk, 0.0)  # core inits its rkk scatter at 0
            # sweep 5: A update + row max of new R+A
            m = jnp.full(n1, NEG, jnp.float32)
            for b, (lo, hi) in enumerate(blocks):
                ab, m_p = _blk_a_update(
                    jnp.asarray(pad_blk(r, lo, hi, 0.0)),
                    jnp.asarray(pad_blk(a, lo, hi, 0.0)),
                    jnp.asarray(ei_b[b]), jnp.asarray(ek_b[b]),
                    rkk, colsum, n1, float(damp))
                a[lo:hi] = np.asarray(ab)[:hi - lo]
                m = jnp.maximum(m, m_p)
            # sweep 6: exemplar = k of the first max edge per row
            firstk = jnp.full(n1, 2 ** 62, jnp.int64)
            for b, (lo, hi) in enumerate(blocks):
                firstk = _blk_first(firstk, jnp.asarray(ei_b[b]),
                                    blk_ra(b), m, lo)
            fk = np.asarray(firstk[:n])
            new_lab = np.where(fk < E, k_all[np.minimum(fk, E - 1)],
                               np.arange(n))
            if np.array_equal(new_lab, lab):
                mconv += 1
            else:
                mconv = 0
            lab = new_lab
            if mconv > convit:
                break

    labels = connected_components(n, np.arange(n), lab)
    out: List[List[int]] = []
    order = np.argsort(labels, kind='stable')
    bounds = np.searchsorted(labels[order], np.arange(labels.max() + 2))
    for c in range(labels.max() + 1):
        out.append(sorted(int(x) for x in order[bounds[c]:bounds[c + 1]]))
    out.sort(key=lambda cl: cl[0])
    return out


def _apclust_ref_py(ei: np.ndarray, ek: np.ndarray, s: np.ndarray,
                    n_nodes: int, damp: float = 0.5,
                    itr: int = 100) -> np.ndarray:
    """Pure-Python fallback of native/apclust.cpp apclust_ref — the same
    streaming emulation of the reference apclust_blk (find_cluster.py:
    406-513): never-reset/never-demoted row-max registers, float64 math
    with float32 R/A stores per pass, dead convergence check (full itr
    iterations), streaming exemplar updates."""
    beta = 1.0 - damp
    nr = len(ei)
    s64 = s.astype(np.float32).astype(np.float64)
    R = np.zeros(nr, np.float32)
    A = np.zeros(nr, np.float32)
    diag = np.zeros((n_nodes, 6))
    lab = np.arange(n_nodes, dtype=np.int64)
    eil = ei.tolist()
    ekl = ek.tolist()
    sl = s64.tolist()
    labl = lab.tolist()
    for _ in range(itr):
        Rl = R.astype(np.float64).tolist()
        Al = A.astype(np.float64).tolist()
        d0 = diag[:, 0].tolist(); d1 = diag[:, 1].tolist()
        d2 = diag[:, 2].tolist(); d3 = diag[:, 3].tolist()
        d5 = diag[:, 5].tolist()
        for n_ in range(nr):
            i = eil[n_]
            ra = Rl[n_] + Al[n_]
            if d0[i] < ra:
                d0[i] = ra
                d1[i] = float(ekl[n_])
            elif d2[i] < ra:
                d2[i] = ra
                d3[i] = float(ekl[n_])
        for n_ in range(nr):
            i, k = eil[n_], ekl[n_]
            r = sl[n_] - (d0[i] if float(k) != d1[i] else d2[i])
            r3 = Rl[n_] * damp + beta * r
            if i == k:
                d5[i] = r3
            Rl[n_] = r3
        R = np.asarray(Rl, np.float32)         # float32 store per pass
        Rl = R.astype(np.float64).tolist()
        d4 = [0.0] * n_nodes
        for n_ in range(nr):
            if eil[n_] != ekl[n_]:
                r = Rl[n_]
                if r > 0.0:
                    d4[ekl[n_]] += r
        for n_ in range(nr):
            i, k = eil[n_], ekl[n_]
            a4 = Al[n_] * damp
            if i != k:
                a4 += beta * min(0.0, d5[k] + d4[k] - max(0.0, Rl[n_]))
            else:
                a4 += beta * d4[k]
            Al[n_] = a4
        A = np.asarray(Al, np.float32)
        Al = A.astype(np.float64).tolist()
        ras = [float('-inf')] * n_nodes
        for n_ in range(nr):
            i = eil[n_]
            ra = Rl[n_] + Al[n_]
            if ras[i] < ra:
                ras[i] = ra
                if labl[i] != ekl[n_]:
                    labl[i] = ekl[n_]
        diag[:, 0] = d0; diag[:, 1] = d1; diag[:, 2] = d2
        diag[:, 3] = d3; diag[:, 4] = d4; diag[:, 5] = d5
    return np.asarray(labl, np.int64)


def apc_cluster_faithful(n: int, ei: np.ndarray, ej: np.ndarray,
                         w: np.ndarray, n_taxa: int, damp: float = 0.5,
                         itr: int = 100) -> List[List[int]]:
    """Reference-faithful AP: identical partitions to the runnable
    reference `find_cluster.py -a apc` (apclust_blk path, the -b default).

    Row order matters (the streaming quirks are order-dependent), so the
    caller must pass edges in input-line order WITH duplicates retained;
    this builds the fc2mat row stream — (x, y), (y, x) interleaved per
    line, then the n preference diagonal rows (find_cluster.py:806-848) —
    and runs the streaming kernel (native C++, pure-Python fallback,
    bit-identical; pinned by tests/test_fallbacks.py)."""
    if n == 0:
        return []
    # zero edges still cluster: every node gets its preference diagonal
    # row and becomes its own exemplar (singletons), like the reference
    pref = np.float32(-20.0 * n_taxa)
    i_all = np.empty(2 * len(ei) + n, np.int64)
    k_all = np.empty_like(i_all)
    s_all = np.empty(len(i_all), np.float32)
    i_all[0:2 * len(ei):2] = ei
    k_all[0:2 * len(ei):2] = ej
    i_all[1:2 * len(ei):2] = ej
    k_all[1:2 * len(ei):2] = ei
    s_all[0:2 * len(ei):2] = w
    s_all[1:2 * len(ei):2] = w
    i_all[2 * len(ei):] = np.arange(n)
    k_all[2 * len(ei):] = np.arange(n)
    s_all[2 * len(ei):] = pref
    try:
        from ..native import apclust_ref_native
        lab = apclust_ref_native(i_all, k_all, s_all, n, damp=damp,
                                 itr=itr)
    except Exception:
        from ..utils import warn_fallback
        warn_fallback('apclust_ref',
                      'native .so unavailable; pure-Python streaming AP')
        lab = _apclust_ref_py(i_all, k_all, s_all, n, damp=damp, itr=itr)
    labels = connected_components(n, np.arange(n), lab)
    out: List[List[int]] = []
    order = np.argsort(labels, kind='stable')
    bounds = np.searchsorted(labels[order], np.arange(labels.max() + 2))
    for c in range(labels.max() + 1):
        out.append(sorted(int(x) for x in order[bounds[c]:bounds[c + 1]]))
    out.sort(key=lambda cl: cl[0])
    return out


def apc_cluster(n: int, ei: np.ndarray, ej: np.ndarray, w: np.ndarray,
                n_taxa: int, damp: float = 0.5, convit: int = 15,
                itr: int = 100, pref: float | None = None) -> List[List[int]]:
    """AP over an undirected edge list; returns clusters (>= 1 member) as
    ascending id lists ordered by smallest member."""
    if len(ei) == 0:
        return []
    if pref is None:
        pref = -20.0 * n_taxa                # fc2mat preference (:840-848)
    i_all = np.concatenate([ei, ej, np.arange(n)])
    k_all = np.concatenate([ej, ei, np.arange(n)])
    s_all = np.concatenate([w, w, np.full(n, pref)]).astype(np.float32)
    lab = np.asarray(_apclust_core(jnp.asarray(i_all), jnp.asarray(k_all),
                                   jnp.asarray(s_all.astype(np.float64)),
                                   n_nodes=n, damp=float(damp),
                                   convit=convit, itr=itr))
    labels = connected_components(n, np.arange(n), lab)
    out: List[List[int]] = []
    order = np.argsort(labels, kind='stable')
    bounds = np.searchsorted(labels[order], np.arange(labels.max() + 2))
    for c in range(labels.max() + 1):
        members = sorted(int(x) for x in order[bounds[c]:bounds[c + 1]])
        out.append(members)
    out.sort(key=lambda cl: cl[0])
    return out


def sap_cluster(n: int, ei: np.ndarray, ej: np.ndarray, w: np.ndarray,
                n_taxa: int, damp: float = 0.9, convit: int = 15,
                itr: int = 200) -> List[List[int]]:
    """Sparse-AP clustering with the reference SAP branch's contract
    (find_cluster.py:1725-1751): edge weights min-max normalized to
    [0, 1] (``(z - min) / (max - min)``), per-node preference
    ``-10 * n_taxa`` (:1737-1738 — half the APC branch's -20), sparse AP
    over exactly the edge support.  The reference delegates the updates
    to pysapc's SAP (damping default 0.9, converged after 15 stable
    sweeps); pysapc is absent in both environments (import verified
    failing), so the updates run on this framework's own sparse
    edge-list AP core — the same R/A message recurrences on the same
    sparse support, textbook row-max.

    Deviations, named: (a) uniform-weight input (max == min) normalizes
    to 0.0 here; the reference divides by zero and NaN-poisons pysapc.
    (b) the reference groups rows directly by exemplar label
    (:1740-1749); here exemplar chains are closed with connected
    components like the APC branch — identical whenever AP converged
    (every exemplar then labels itself), a superset merge otherwise.
    """
    if len(ei) == 0:
        return []
    lo, hi = float(w.min()), float(w.max())
    wn = (w - lo) / (hi - lo) if hi > lo else np.zeros_like(w)
    return apc_cluster(n, ei, ej, wn, n_taxa, damp=damp, convit=convit,
                       itr=itr, pref=-10.0 * n_taxa)

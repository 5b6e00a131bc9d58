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
assignments can differ on near-tie margins.
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


def apc_cluster(n: int, ei: np.ndarray, ej: np.ndarray, w: np.ndarray,
                n_taxa: int, damp: float = 0.5, convit: int = 15,
                itr: int = 100) -> List[List[int]]:
    """AP over an undirected edge list; returns clusters (>= 1 member) as
    ascending id lists ordered by smallest member."""
    if len(ei) == 0:
        return []
    pref = -20.0 * n_taxa                    # fc2mat preference (:840-848)
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

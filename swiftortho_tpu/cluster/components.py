"""Connected components of an edge list.

The reference computes full-graph components via a 2-round mutual-NN
coarsening (bin/find_cluster.py:1470-1557) — rounds 1+2 together equal
plain connected components of the whole graph; we compute them directly.
Host path: numpy union-find.  Device path (for pod-scale graphs):
iterative min-label propagation with segment ops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def union_find(n: int, ei: np.ndarray, ej: np.ndarray) -> np.ndarray:
    """Component label per node (labels are root ids, renumbered 0..k-1
    in first-appearance order)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(ei.tolist(), ej.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def connected_components(n: int, ei: np.ndarray, ej: np.ndarray,
                         use_scipy: bool = True) -> np.ndarray:
    if use_scipy:
        try:
            from scipy.sparse import coo_matrix
            from scipy.sparse.csgraph import connected_components as _cc
            m = coo_matrix((np.ones(len(ei), np.int8), (ei, ej)),
                           shape=(n, n))
            _, labels = _cc(m, directed=False)
            return labels.astype(np.int64)
        except ImportError:
            pass
    return union_find(n, ei, ej)


@jax.jit
def label_propagation(n_nodes_labels: jnp.ndarray, ei: jnp.ndarray,
                      ej: jnp.ndarray) -> jnp.ndarray:
    """Device min-label propagation: labels converge to per-component min
    node id.  O(diameter) sweeps; each sweep is two segment_mins."""
    labels = n_nodes_labels

    def body(state):
        labels, _ = state
        li = labels[ei]
        lj = labels[ej]
        m = jnp.minimum(li, lj)
        new = labels
        new = new.at[ei].min(m)
        new = new.at[ej].min(m)
        # pointer-jump: label of my label
        new = jnp.minimum(new, new[new])
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return labels

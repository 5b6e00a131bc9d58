"""Connected components + the reference's cnc decomposition.

``connected_components`` is plain full-graph components (host scipy /
union-find; device min-label propagation for pod-scale graphs).

``cnc_labels`` replicates the reference's 2-round mutual-NN coarsening
(bin/find_cluster.py:1470-1593) **exactly**, quirks included.  This is NOT
equivalent to plain connected components: round 2 merges coarse components
bridged by any edge, EXCEPT edges touching the coarse component numbered 0
(`if X and Y`, :1539 — falsy int id), so that component is permanently
severed from its neighbors and its bridge edges are dropped from the
output.  Which component is "0" depends on dict/graph insertion order,
which we reproduce (NNs dict popitem LIFO + node-first-appearance ids).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def cnc_labels(n: int, ei: np.ndarray, ej: np.ndarray,
               w: np.ndarray) -> np.ndarray:
    """Per-node final component label, reference cnc semantics
    (bin/find_cluster.py:1470-1593).

    Inputs are the deduped edge arrays from ``driver.parse_graph`` whose
    node ids equal first-appearance rank and whose edge order equals
    first-occurrence order — the same order the reference scans the file.

    Round 1: mutual-NN graph — for every node keep edges to its max-weight
    neighbor(s) (ties kept, :1486-1505); components of that graph get
    coarse ids in the reference's iteration order (NNs popitem LIFO feeds
    nx.Graph insertion order, :1508-1520).  Round 2: coarse components
    connected by any edge merge — except pairs where either coarse id is
    the falsy 0 (:1527-1546); nodes of coarse component 0 end with label
    -1 (`n2n.get(j, -1)`, :1593-1596).

    Edges survive into clustering iff their endpoints' labels are equal;
    the reference additionally drops label 0 (`if cx and cy`, :1611-1612)
    — a documented deviation: we keep it.
    """
    # round 1: per-node max weight + tied NN targets, reference update
    # order (x processed before y per edge, :1486-1505)
    NNs: dict = {}
    for a, b, z in zip(ei.tolist(), ej.tolist(), w.tolist()):
        for s, t in ((a, b), (b, a)):
            e = NNs.get(s)
            if e is None or z > e[0]:
                NNs[s] = [z, t]
            elif z == e[0]:
                e.append(t)

    # NN graph with the reference's node insertion order: popitem is LIFO
    # over the insertion-ordered dict (:1508-1512)
    adj: dict = {}
    order: list = []
    while NNs:
        x, j = NNs.popitem()
        for y in j[1:]:
            for v in (x, y):
                if v not in adj:
                    adj[v] = []
                    order.append(v)
            adj[x].append(y)
            adj[y].append(x)

    # coarse ids in component-discovery order over `order` (:1514-1520)
    l2n: dict = {}
    cid = 0
    for v in order:
        if v in l2n:
            continue
        l2n[v] = cid
        stack = [v]
        while stack:
            u = stack.pop()
            for nb in adj[u]:
                if nb not in l2n:
                    l2n[nb] = cid
                    stack.append(nb)
        cid += 1

    # round 2: coarse-pair graph, skipping falsy coarse id 0 (:1527-1546)
    G1: dict = {}
    for a, b in zip(ei.tolist(), ej.tolist()):
        X = l2n.get(a)
        Y = l2n.get(b)
        if X and Y:
            G1[(X, Y) if X < Y else (Y, X)] = None
    adj2: dict = {}
    order2: list = []
    for a, b in G1:
        for v in (a, b):
            if v not in adj2:
                adj2[v] = []
                order2.append(v)
        adj2[a].append(b)
        adj2[b].append(a)
    n2n: dict = {}
    fid = 0
    for v in order2:
        if v in n2n:
            continue
        n2n[v] = fid
        stack = [v]
        while stack:
            u = stack.pop()
            for nb in adj2[u]:
                if nb not in n2n:
                    n2n[nb] = fid
                    stack.append(nb)
        fid += 1

    labels = np.empty(n, np.int64)
    for v in range(n):
        c = l2n.get(v)
        labels[v] = -1 if c is None else n2n.get(c, -1)
    return labels


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

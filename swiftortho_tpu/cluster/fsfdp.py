"""Density-peaks clustering (Rodriguez & Laio) over an xyz edge list.

Behavioral contract: reference scripts/fsfdp.py (experimental in the
reference): z column treated as a *distance*; dc comes from
`len(d) < di and d[-di] or d[-1]` (:58) which, since d holds all N edge
distances and di = 0.02*N, always takes d[-1] — the MAXIMUM distance;
Gaussian density rho[x] += exp(-(z/dc)^2) per incident edge; delta[x] =
min distance to a higher-density neighbor along an edge, nn[x] = that
neighbor; the global density peak gets delta = max(delta); centers =
nodes with rho > mean(rho) and delta > sd(delta), where sd() runs over
only the delta-dict members (nodes that HAVE a higher-rho neighbor, plus
the global peak — component-local peaks are excluded, :145-146); members
are assigned by flooding the reversed nearest-higher-neighbor forest
from each center (:148-209). Deviations (guarded reference crashes):
dc == 0 would ZeroDivisionError (:68) -> we use 1.0; an all-equal-rho
input would ValueError on max(delta.values()) (:113) -> mx_delta = 1.0.

Vectorized numpy implementation.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List

import numpy as np


def fsfdp_cluster(lines: Iterable[str]) -> Dict[str, int]:
    l2n: Dict[str, int] = {}
    ei: List[int] = []
    ej: List[int] = []
    w: List[float] = []
    for line in lines:
        f = line.rstrip('\n').split('\t')
        if len(f) < 3 or f[0] == f[1]:
            continue
        for t in (f[0], f[1]):
            if t not in l2n:
                l2n[t] = len(l2n)
        ei.append(l2n[f[0]])
        ej.append(l2n[f[1]])
        w.append(float(f[2]))
    n = len(l2n)
    if n == 0:
        return {}
    ei = np.asarray(ei)
    ej = np.asarray(ej)
    z = np.asarray(w)
    m = len(z)

    # reference :58: `len(d) < di and d[-di] or d[-1]` with len(d) == m
    # and di = int(.02*m) <= m, so the conditional is always False and
    # dc is the maximum distance.
    dc = z.max()
    dc = dc if dc > 0 else 1.0

    gauss = np.exp(-((z / dc) ** 2))
    rho = np.zeros(n)
    # interleave x/y increments in file order so float accumulation
    # matches the reference's rho[x]+=g; rho[y]+=g loop bit-for-bit
    # (np.add.at is unbuffered and applies updates sequentially).
    np.add.at(rho, np.stack([ei, ej], 1).ravel(), np.repeat(gauss, 2))

    # delta[x] = min distance to a higher-rho neighbor; nn = that neighbor
    # (first minimal edge in file order on ties, like the reference)
    delta = np.full(n, np.inf)
    nn = np.full(n, -1, np.int64)
    lower_i = rho[ei] < rho[ej]
    lower_j = rho[ej] < rho[ei]
    eidx = np.arange(m)
    cand_a = np.concatenate([ei[lower_i], ej[lower_j]])
    cand_b = np.concatenate([ej[lower_i], ei[lower_j]])
    cand_z = np.concatenate([z[lower_i], z[lower_j]])
    cand_o = np.concatenate([eidx[lower_i], eidx[lower_j]])
    # ins[x] = index of the edge that first inserted x into the delta
    # dict (the reference's dict preserves insertion order, which sets
    # both the sd() accumulation order and center numbering).
    ins = np.full(n, np.iinfo(np.int64).max)
    if len(cand_a):
        np.minimum.at(ins, cand_a, cand_o)
        order = np.lexsort((cand_o, cand_z, cand_a))
        aa, bb, zz = cand_a[order], cand_b[order], cand_z[order]
        first = np.ones(len(aa), bool)
        first[1:] = aa[1:] != aa[:-1]
        delta[aa[first]] = zz[first]
        nn[aa[first]] = bb[first]

    peak = int(np.argmax(rho))
    member = np.isfinite(delta)  # nodes in the reference's delta dict
    finite = delta[member]
    mx_delta = finite.max() if len(finite) else 1.0
    delta[peak] = mx_delta
    member[peak] = True  # appended last (ins[peak] stays at int64 max)
    delta[~np.isfinite(delta)] = 0.0

    def _seqsum(v):
        # left-to-right sequential float sum, like the reference's sum()
        return float(np.cumsum(v)[-1]) if len(v) else 0.0

    rho_min = _seqsum(rho) / n
    # sd() over the delta dict only (:145-146), in insertion order:
    # component-local peaks that never entered delta are excluded.
    midx = np.flatnonzero(member)
    midx = midx[np.argsort(ins[midx], kind='stable')]
    vals = delta[midx]
    mu = _seqsum(vals) / len(vals)
    dmin = (_seqsum((vals - mu) ** 2) / len(vals)) ** 0.5

    cl = np.full(n, -1, np.int64)
    centers = [int(x) for x in midx
               if rho[x] > rho_min and delta[x] > dmin]
    for c, node in enumerate(centers):
        cl[node] = c
    # flood the reversed nn forest from centers
    children: Dict[int, List[int]] = {}
    for x in range(n):
        if nn[x] >= 0:
            children.setdefault(int(nn[x]), []).append(x)
    for node in centers:
        stack = list(children.get(int(node), []))
        seen = set()
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            cl[x] = cl[node]
            stack.extend(children.get(x, []))

    n2l = {v: k for k, v in l2n.items()}
    return {n2l[i]: int(cl[i]) for i in range(n) if cl[i] >= 0}


def fsfdp_groups(lines: Iterable[str]) -> Iterator[str]:
    assign = fsfdp_cluster(lines)
    groups: Dict[int, List[str]] = {}
    for g, c in assign.items():
        groups.setdefault(c, []).append(g)
    for c in sorted(groups):
        yield '\t'.join(sorted(groups[c])) + '\n'

"""Block-sparse MCL for oversize components: dense (mb, mb) tiles driven
through the MXU.

Behavioral contract: the same loop as the reference ``mcl``
(bin/find_cluster.py:652-689) / ``mcl_xyz`` (:1425-1466) and this
package's ``_mcl_sparse`` transcription (cluster/mcl.py): column
L1-normalize (+1e-8) -> snapshot every `check` iters -> expansion x@x ->
inflation data**I -> convergence max(|x-x_old| - rtol|x_old|) <= atol at
check iters -> prune < 1e-5.  The matrix is held as a set of dense
mb x mb tiles (block-CSR); expansion is a batched tile matmul
y[I,J] += x[I,K] @ x[K,J] over present tile pairs with segment-add into
output tiles — the TPU-native reading of the reference's scipy csr x@x
(SURVEY.md §7: sharded blocked SpMM).  Fill-in materializes new tiles;
pruning drops all-zero tiles, which keeps the tile set bounded the same
way csr pruning bounds nnz.

Float caveat (named deviation): tile-level matmul accumulation order
differs from csr row-order accumulation, so borderline prune/convergence
floats can differ in the last ulp vs the scipy path; partitions on real
ortholog graphs are unaffected (tests compare partitions, not floats).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

_PAIR_CHUNK = 512           # tile pairs per batched matmul dispatch


@partial(jax.jit, static_argnames=('nt',))
def _colsums(data, tJ, nt: int):
    """(T, mb, mb) tiles -> (nt*mb,) global column sums."""
    per_tile = data.sum(axis=1)                     # (T, mb)
    mb = data.shape[1]
    out = jnp.zeros((nt, mb), data.dtype).at[tJ].add(per_tile)
    return out.reshape(-1)


@jax.jit
def _normalize(data, tJ, colsum_blocks):
    """Divide every tile's columns by its block-column sums (+1e-8)."""
    denom = colsum_blocks[tJ][:, None, :] + 1e-8    # (T, 1, mb)
    return data / denom


@jax.jit
def _matmul_accum(out, lhs, rhs, out_idx):
    prod = jnp.matmul(lhs, rhs, precision=jax.lax.Precision.HIGHEST)
    return out.at[out_idx].add(prod)


@partial(jax.jit, static_argnames=('inflation',))
def _inflate(data, inflation: float):
    return jnp.power(data, inflation)


@jax.jit
def _conv_metric(y_aligned, x_old_aligned, rtol):
    d = jnp.abs(y_aligned - x_old_aligned) - rtol * jnp.abs(x_old_aligned)
    return d.max()


@jax.jit
def _prune_tiles(data, prune):
    data = jnp.where(data < prune, 0.0, data)
    return data, data.max(axis=(1, 2))


def _expand(keys: np.ndarray, data, nt: int):
    """One expansion step: returns (new_keys, new_data) for y = x @ x."""
    tI = keys // nt
    tJ = keys % nt
    # per middle-index K: tiles with column K (lhs) x tiles with row K (rhs)
    order_col = np.argsort(tJ, kind='stable')       # lhs grouped by K=tJ
    order_row = np.argsort(tI, kind='stable')       # rhs grouped by K=tI
    colK = tJ[order_col]
    rowK = tI[order_row]
    cb = np.searchsorted(colK, np.arange(nt + 1))
    rb = np.searchsorted(rowK, np.arange(nt + 1))
    lhs_l, rhs_l = [], []
    for K in range(nt):
        A = order_col[cb[K]:cb[K + 1]]
        Bv = order_row[rb[K]:rb[K + 1]]
        if len(A) == 0 or len(Bv) == 0:
            continue
        lhs_l.append(np.repeat(A, len(Bv)))
        rhs_l.append(np.tile(Bv, len(A)))
    if not lhs_l:
        return keys, data
    lhs = np.concatenate(lhs_l)
    rhs = np.concatenate(rhs_l)
    out_key = tI[lhs] * nt + tJ[rhs]
    new_keys, out_idx = np.unique(out_key, return_inverse=True)
    Tn = len(new_keys)
    mb = data.shape[1]
    out = jnp.zeros((Tn, mb, mb), jnp.float32)
    for st in range(0, len(lhs), _PAIR_CHUNK):
        sl = slice(st, st + _PAIR_CHUNK)
        out = _matmul_accum(out, data[jnp.asarray(lhs[sl])],
                            data[jnp.asarray(rhs[sl])],
                            jnp.asarray(out_idx[sl]))
    return new_keys, out


def _align(keys_a, data_a, keys_b, data_b):
    """Zero-pad both tile sets onto their key union; returns
    (union_keys, a_aligned, b_aligned) with device zero-fill."""
    union = np.union1d(keys_a, keys_b)
    mb = data_a.shape[1] if len(keys_a) else data_b.shape[1]

    def place(keys, data):
        out = jnp.zeros((len(union), mb, mb), jnp.float32)
        if len(keys):
            pos = np.searchsorted(union, keys)
            out = out.at[jnp.asarray(pos)].set(data)
        return out

    return union, place(keys_a, data_a), place(keys_b, data_b)


def mcl_blocksparse(m: int, li: np.ndarray, lj: np.ndarray,
                    w: np.ndarray, selfw: np.ndarray,
                    inflation: float, prune: float = 1e-5,
                    rtol: float = 1e-5, atol: float = 1e-8,
                    itr: int = 100, check: int = 5,
                    mb: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
    """Run MCL on one m-node component given symmetric local edges
    (li, lj, w) and per-node self-loop weights; returns the surviving
    (row, col) entry coordinates (> prune) for component extraction."""
    nt = -(-m // mb)
    # build initial tiles (symmetric + self-loops; duplicate pairs: last
    # assignment wins, like the reference's lil construction)
    ei = np.concatenate([li, lj, np.arange(m, dtype=np.int64)])
    ej = np.concatenate([lj, li, np.arange(m, dtype=np.int64)])
    ew = np.concatenate([w, w, selfw]).astype(np.float32)
    key = (ei // mb) * nt + (ej // mb)
    keys, inv = np.unique(key, return_inverse=True)
    data_h = np.zeros((len(keys), mb, mb), np.float32)
    data_h[inv, ei % mb, ej % mb] = ew
    data = jnp.asarray(data_h)

    old_keys, old_data = None, None
    for i in range(itr):
        tJ = jnp.asarray(keys % nt)
        cs = _colsums(data, tJ, nt)
        data = _normalize(data, tJ, cs.reshape(nt, mb))
        if i % check == 0:
            old_keys, old_data = keys, data
        keys, data = _expand(keys, data, nt)
        data = _inflate(data, float(inflation))
        if i % check == 0 and i > 0:
            _, ya, xa = _align(keys, data, old_keys, old_data)
            if float(_conv_metric(ya, xa, rtol)) <= atol:
                break
        data, tmax = _prune_tiles(data, prune)
        alive = np.asarray(tmax) > 0.0
        if not alive.all():
            keys = keys[alive]
            data = data[jnp.asarray(np.flatnonzero(alive))]
        if len(keys) == 0:
            return (np.zeros(0, np.int64),) * 2
    dh = np.asarray(data)
    t, ri, rj = np.nonzero(dh > prune)
    gi = (keys[t] // nt) * mb + ri
    gj = (keys[t] % nt) * mb + rj
    ok = (gi < m) & (gj < m)
    return gi[ok].astype(np.int64), gj[ok].astype(np.int64)

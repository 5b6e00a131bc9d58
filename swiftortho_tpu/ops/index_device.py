"""On-device seed-index build (jit): spaced-seed FNV hashing + packed-key
sort as one XLA program — the TPU-native reading of the reference's hot
loop 1 (``Fasta.build_msav`` counting sort, lib/fsearch.py:2240-2266;
SURVEY §7 maps it to bincount/cumsum/scatter on device).

Bit-for-bit contract with ``ops.index.build_index`` (enforced by
tests/test_device_index.py): identical ``start``/``locus``/``threshold``.
How the equality is engineered:

- hashing: the same shifted-slice FNV-1a chain as ops.seeds (u32 ops are
  exact on any backend);
- dedup: (bucket, position) duplicates across patterns of ONE alphabet
  keep the earliest stream (the reference's ``visit`` dict,
  fsearch.py:554-556).  Within a pattern positions are distinct, so
  duplicates always share a position — a per-position pairwise compare
  over the static stream list is exactly the host path's np.unique;
- ordering: postings sort by a packed key (bucket, stream, position),
  which reproduces the host's stable argsort over the alphabet-major
  concatenated stream — so ``locus`` matches element-for-element;
- threshold: the devices returns the SORTED bucket stream; the host
  derives run-length counts from it (ascending-bucket order — the same
  values in the same order as ``counts[counts > 0]``) and runs the exact
  ``ref_mu_sd`` float64 reduction, so the mu+2sd integer gate cannot
  drift by a summation-order ulp.

The nc-sized CSR offsets stay a host bincount/cumsum over the fetched
sorted stream: O(n + nc) trivial work, while the O(n·k) hashing and the
O(n log n) sort — the actual hot loop — run on device.  Selected by
SWIFTORTHO_INDEX=device (IndexSource.from_build); falls back to the host
build when the packed-key ranges don't hold.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import reduced_alphabet_table
from ..io_fasta import SeqDB
from .index import SeedIndex, ref_mu_sd
from .seeds import FNV_BASIS, FNV_PRIME, min_pattern_len, parse_patterns

_XL, _XU = ord('x'), ord('X')


@lru_cache(maxsize=None)
def _tables(alphabets: tuple) -> np.ndarray:
    return np.stack([reduced_alphabet_table(a) for a in alphabets]) \
        .astype(np.int32)


def _streams(alphabets: tuple, ssps: str) -> tuple:
    """(alpha_idx, pattern_idx, klen, ones) in the host concatenation
    order (alphabet-major, pattern within — ops.index.build_index)."""
    out = []
    pats = parse_patterns(ssps)
    for ai in range(len(alphabets)):
        for s, (klen, ones) in enumerate(pats):
            out.append((ai, s, klen, tuple(int(x) for x in ones)))
    return tuple(out)


def _pad_len(n: int) -> int:
    """{2^k, 3*2^k} ladder (compile-cache reuse across chunk sizes)."""
    p = 1
    while p < n:
        if 3 * p >= n and 2 * p < n:
            return 3 * p
        p *= 2
    return p


@partial(jax.jit, static_argnames=('streams', 'step', 'Tp'))
def _hash_sort_device(tokens, seq_of, code_tbls, nc_u32, T,
                      streams: tuple, step: int, Tp: int):
    """Hash every stream over the padded flat token array, dedup within
    alphabets, and return the (S*Tp,) ascending packed-key array plus the
    valid-posting count.  Packed key: bucket * (S*(Tp+1)) + stream*(Tp+1)
    + position; invalid windows carry the max key (tail after sort)."""
    S = len(streams)
    toks = tokens.astype(jnp.int32)
    is_x = (toks == _XL) | (toks == _XU)
    pos = jnp.arange(Tp, dtype=jnp.int64)

    def shifted(a, j, fill):
        return jnp.concatenate(
            [a[j:], jnp.full((j,), fill, a.dtype)]) if j else a

    if step > 1:
        # per-sequence window stride from position 0 of each sequence
        # (fsearch.py:534): seq_start[p] = first flat index of p's seq
        change = jnp.concatenate(
            [jnp.ones((1,), bool), seq_of[1:] != seq_of[:-1]])
        starts_flat = jax.lax.cummax(jnp.where(change, pos, 0))

    buckets, valid = [], []
    for (ai, s, klen, ones) in streams:
        codes = jnp.take(code_tbls[ai], toks)
        h = jnp.full((Tp,), np.uint32(FNV_BASIS))
        for j in ones:
            h = (h ^ shifted(codes, j, 0).astype(jnp.uint32)) \
                * np.uint32(FNV_PRIME)
        h = (h ^ np.uint32(s)) * np.uint32(FNV_PRIME)
        b = (h % nc_u32).astype(jnp.int64)
        bad = jnp.zeros((Tp,), bool)
        for j in range(klen):
            bad = bad | shifted(is_x, j, True)
        ok = (~bad) & (seq_of == shifted(seq_of, klen - 1, jnp.int64(-1))) \
            & (pos + (klen - 1) < T)
        if step > 1:
            ok = ok & ((pos - starts_flat) % step == 0)
        buckets.append(b)
        valid.append(ok)

    kept = list(valid)
    for i2, (a2, _, _, _) in enumerate(streams):
        for i1, (a1, _, _, _) in enumerate(streams[:i2]):
            if a1 != a2:
                continue
            dup = valid[i1] & valid[i2] & (buckets[i1] == buckets[i2])
            kept[i2] = kept[i2] & ~dup

    M = jnp.int64(S) * (Tp + 1)
    keys = []
    for si in range(S):
        rank = jnp.int64(si) * (Tp + 1) + pos
        k = buckets[si] * M + rank
        keys.append(jnp.where(kept[si], k, jnp.int64(2 ** 62)))
    key = jnp.sort(jnp.concatenate(keys))
    n = sum(jnp.sum(k.astype(jnp.int64)) for k in kept)
    return key, n


def device_index_supported(T: int, nc: int, n_streams: int) -> bool:
    """Packed-key range: bucket * (S*(Tp+1)) + rank must stay < 2^62."""
    Tp = _pad_len(max(T, 1))
    return nc * (n_streams * (Tp + 1) + 1) < (1 << 62)


def build_index_device(db: SeqDB, start: int, end: int,
                       alphabets: List[str], ssps: str, nc: int,
                       step: int = 1,
                       threshold_override: int = -1) -> SeedIndex:
    """Drop-in device-path replacement for ``ops.index.build_index`` —
    identical SeedIndex (tests/test_device_index.py pins start/locus/
    soas/threshold).  Falls back to the host build when the packed-key
    range doesn't hold."""
    end = min(end, len(db))
    lens = db.lengths[start:end].astype(np.int64)
    soas = np.zeros(end - start + 1, dtype=np.int64)
    np.cumsum(lens, out=soas[1:])
    chunk_tokens = db.tokens[db.offsets[start]:db.offsets[end]]
    T = len(chunk_tokens)
    streams = _streams(tuple(alphabets), ssps)
    if not streams or not device_index_supported(T, nc, len(streams)):
        from .index import build_index
        from ..utils import log_event
        log_event('device_index_fallback', T=T, nc=nc)
        return build_index(db, start, end, alphabets, ssps, nc, step,
                           threshold_override)

    seq_of = np.repeat(np.arange(end - start, dtype=np.int64), lens)
    Tp = _pad_len(max(T, 1))
    tok_pad = np.zeros(Tp, np.uint8)
    tok_pad[:T] = chunk_tokens
    # padding positions get unique negative "sequence" ids so no window
    # crosses the tail (and the pos < T gate kills them anyway)
    seq_pad = np.full(Tp, -1, np.int64)
    seq_pad[:T] = seq_of
    seq_pad[T:] = -2 - np.arange(Tp - T, dtype=np.int64)

    with jax.enable_x64(True):
        key, n = _hash_sort_device(
            jnp.asarray(tok_pad), jnp.asarray(seq_pad),
            jnp.asarray(_tables(tuple(alphabets))), jnp.uint32(nc),
            jnp.asarray(T, jnp.int64), streams, int(step), Tp)
        n = int(n)
        key = np.asarray(key[:n])

    S = len(streams)
    M = np.int64(S) * (Tp + 1)
    b = key // M
    p = (key % M) % np.int64(Tp + 1)

    counts = np.bincount(b, minlength=nc) if n else \
        np.zeros(nc, np.int64)
    csr = np.zeros(nc + 1, dtype=np.int64)
    np.cumsum(counts, out=csr[1:])
    mu, sd = ref_mu_sd(counts)
    threshold = int(mu + 2 * sd)
    if threshold_override >= 1:
        threshold = threshold_override

    return SeedIndex(nc=nc, start=csr, locus=p.astype(np.int64),
                     soas=soas, seq_offset=start, threshold=threshold,
                     mink=min_pattern_len(ssps))

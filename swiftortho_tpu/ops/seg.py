"""SEG-like low-complexity masking.

Behavioral contract: reference lib/fsearch.py:2854-2946.

Quirk reproduced faithfully: entropy() double-counts every character of the
first window (fsearch.py:2857-2859), and the sliding update then adds or
removes chars only *once* (fsearch.py:2895-2898).  The effective count used
for the entropy of window i is therefore c0(char) + ci(char), where c0 is the
first window's count — i.e. the running entropy depends on the first window
for the whole sequence.  Frequencies use denominator 12 and sum to 2.

- mask[i] = entropy-like value < 2.2 for window [i, i+12).
- If mask[n-12] is set, the whole tail is masked (fsearch.py:2909-2912).
- A masked start emits twelve 'x' and skips 12 positions (fsearch.py:2918-2928).
- A second pass dilates each 'x' by ±8 and merges islands
  (fsearch.py:2930-2946); the search pipeline uses the *first* output.

Implementations: a sequential python oracle (seg_string) that reproduces
the reference's *incremental* +- entropy accumulation bit-for-bit, and two
batched ones (JAX seg_batch, numpy seg_batch_vec).

Named deviation (floating point): the batched paths recompute each window's
entropy from counts (f32 / f64) instead of accumulating incremental +-
updates, so on a knife-edge window whose accumulated-vs-recomputed entropy
rounds differently across 2.2 the mask bit can differ from the oracle /
reference.  Not observed on any corpus tested; the oracle is the parity
arbiter.
"""

from __future__ import annotations

from collections import Counter
from math import log

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import SEG_MIN_ENT, SEG_WINDOW

_X = ord('x')


def _ent_from_counts(counts, denom: float) -> float:
    ent = 0.0
    for c in counts.values():
        if c > 0:
            f = c / denom
            ent -= f * log(f)
    return ent / log(2)


def seg_string(S: str, minent: float = SEG_MIN_ENT,
               window: int = SEG_WINDOW) -> tuple[str, str]:
    """Sequential oracle implementation; returns (expanded, merged)."""
    s = S.upper()
    n = len(s)
    w = window
    mask = np.zeros(max(n, 1), dtype=np.int8)

    win = s[:w]
    counts = Counter(win)
    for c in win:
        counts[c] += 1           # double-count, like reference entropy()
    denom = float(len(win)) if win else 1.0
    ent = _ent_from_counts(counts, denom)
    if n and ent < minent:
        mask[0] = 1
    # incremental +- entropy accumulation in the reference's exact order
    # and expression form (fsearch.py:2895-2907), so knife-edge windows
    # compare identically (recomputing from counts would round differently)
    log2 = log(2)
    wf = float(window)
    for i in range(1, n - w + 1):
        pre, cur = s[i - 1], s[i + w - 1]
        if pre == cur:
            mask[i] = mask[i - 1]     # reference copies the previous bit
            continue
        pre_count = counts[pre]
        counts[pre] -= 1              # reference slides by +-1, not +-2
        cur_count = counts[cur]
        counts[cur] += 1
        a, b = pre_count / wf, counts[pre] / wf
        ent += (b != 0 and (a * log(a) - b * log(b)) / log2
                or a * log(a) / log2)
        a, b = cur_count / wf, counts[cur] / wf
        ent += (a != 0 and (a * log(a) - b * log(b)) / log2
                or -b * log(b) / log2)
        if ent < minent:
            mask[i] = 1
    nws = max(0, n - w)
    if n and mask[nws] == 1:
        mask[nws:n] = 1

    out = []
    st = 0
    while st < n:
        if mask[st] == 0:
            out.append(s[st])
            st += 1
        else:
            out.append('x' * w)
            st += w
    output = ''.join(out)[:n]

    cover = np.zeros(n, dtype=bool)
    for i, ch in enumerate(output):
        if ch == 'x':
            cover[max(i - 8, 0):min(i + 9, n)] = True
    merged = ''.join('x' if cover[i] else output[i] for i in range(n))
    return output, merged


# ---------------------------------------------------------------------------
# Batched JAX implementation
# ---------------------------------------------------------------------------

_NBINS = 64


def _tok_bins(tok_u: jnp.ndarray) -> jnp.ndarray:
    """Map uppercased bytes to one of 64 bins: A..Z -> 1..26, other ->
    27 + b % 37.  Distinct non-letter bytes collide only when congruent
    mod 37 and both non-alphabetic (e.g. '7' vs backslash) — beyond any
    realistic protein alphabet; letters never collide."""
    is_alpha = (tok_u >= 65) & (tok_u <= 90)
    return jnp.where(is_alpha, tok_u - 64,
                     27 + (tok_u % 37)).astype(jnp.int32)


def _gent(c: jnp.ndarray, denom) -> jnp.ndarray:
    """Entropy contribution -f*log2(f) with f = c/denom."""
    f = c.astype(jnp.float32) / denom
    return jnp.where(c > 0, -f * jnp.log2(jnp.maximum(f, 1e-30)), 0.0)


@jax.jit
def seg_batch(tokens: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Vectorized seg over a padded (B, L) uint8 batch; returns masked+upper
    tokens (the reference's first output). Padding tail is left untouched."""
    B, L = tokens.shape
    w = SEG_WINDOW
    tok_u = jnp.where((tokens >= 97) & (tokens <= 122),
                      tokens - 32, tokens).astype(jnp.uint8)
    lengths = lengths.astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    bins = jnp.where(valid, _tok_bins(tok_u), _NBINS - 1)

    n = lengths
    ent = jnp.zeros((B, L), dtype=jnp.float32)      # windows [i, i+12)
    ent_whole = jnp.zeros((B,), dtype=jnp.float32)  # short-seq single window
    denom_whole = jnp.maximum(n.astype(jnp.float32), 1.0)
    nwin = L - w + 1
    for b in range(_NBINS):
        oh = (bins == b) & valid
        cs = jnp.cumsum(oh.astype(jnp.int32), axis=1)
        cs0 = jnp.pad(cs, ((0, 0), (1, 0)))         # exclusive prefix sums
        if nwin > 0:
            ci = cs0[:, w:] - cs0[:, :-w]           # count in window i
            c0 = cs0[:, w][:, None]                 # first-window count
            ent = ent.at[:, :nwin].add(_gent(c0 + ci, float(w)))
        ent_whole += _gent(2 * cs[:, -1], denom_whole)  # doubled counts

    if nwin > 0:
        mask = (ent < SEG_MIN_ENT) & (pos <= (n - w)[:, None]) & (n[:, None] >= w)
    else:
        mask = jnp.zeros((B, L), dtype=bool)
    short_all = (n < w)[:, None] & (ent_whole < SEG_MIN_ENT)[:, None] & valid
    mask = mask | short_all
    nws = jnp.maximum(n - w, 0)
    tail_bit = jnp.take_along_axis(mask, nws[:, None].astype(jnp.int32), axis=1)
    mask = mask | (tail_bit & (pos >= nws[:, None]) & (n[:, None] >= w) & valid)

    def step(cd, m):
        is_x = (cd > 0) | m
        new_cd = jnp.where(cd > 0, cd - 1, jnp.where(m, w - 1, 0))
        return new_cd, is_x

    _, xcols = jax.lax.scan(step, jnp.zeros((B,), jnp.int32), mask.T)
    x_out = xcols.T & valid
    return jnp.where(x_out, jnp.uint8(_X), tok_u)


def seg_batch_np(tokens: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Oracle-backed batch version (host, sequential) for tests."""
    out = tokens.copy()
    for r in range(tokens.shape[0]):
        n = int(lengths[r])
        s = tokens[r, :n].tobytes().decode('latin-1')
        e, _ = seg_string(s)
        out[r, :n] = np.frombuffer(e.encode('latin-1'), dtype=np.uint8)
    return out


def seg_batch_vec(tokens: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Batched seg masking (same outputs as seg_batch).

    Prefers the native threaded port of the sequential oracle
    (native/seg.cpp) — bit-for-bit seg_string semantics, i.e. the
    incremental +- entropy accumulation, so the f32/f64-recompute
    deviation documented above does not apply on that path.  Falls back
    to the vectorized numpy implementation below (the JAX version's
    per-residue expansion scan is pathologically slow through the axon
    dispatch path; here only the 12-residue countdown runs as a python
    loop over L with (B,)-vector steps).
    """
    try:
        from ..native import seg_batch_native
        return seg_batch_native(tokens, lengths, SEG_WINDOW, SEG_MIN_ENT)
    except Exception:
        pass        # no compiler: vectorized numpy below
    B, L = tokens.shape
    w = SEG_WINDOW
    tok_u = np.where((tokens >= 97) & (tokens <= 122),
                     tokens - 32, tokens).astype(np.uint8)
    lengths = lengths.astype(np.int64)
    pos = np.arange(L, dtype=np.int64)[None, :]
    valid = pos < lengths[:, None]
    t = tok_u.astype(np.int64)
    is_alpha = (t >= 65) & (t <= 90)
    bins = np.where(is_alpha, t - 64, 27 + (t % 37))
    bins = np.where(valid, bins, _NBINS - 1)

    n = lengths
    nwin = L - w + 1
    ent = np.zeros((B, L), dtype=np.float64)
    ent_whole = np.zeros(B, dtype=np.float64)
    denom_whole = np.maximum(n.astype(np.float64), 1.0)

    def gent(c, denom):
        f = c / denom
        with np.errstate(divide='ignore', invalid='ignore'):
            v = -f * np.log2(np.where(c > 0, f, 1.0))
        return np.where(c > 0, v, 0.0)

    for b in range(_NBINS):
        oh = ((bins == b) & valid).astype(np.int64)
        cs0 = np.zeros((B, L + 1), dtype=np.int64)
        np.cumsum(oh, axis=1, out=cs0[:, 1:])
        if nwin > 0:
            ci = cs0[:, w:] - cs0[:, :-w]
            c0 = cs0[:, w][:, None]
            ent[:, :nwin] += gent(c0 + ci, float(w))
        ent_whole += gent(2 * cs0[:, -1], denom_whole)

    if nwin > 0:
        mask = (ent < SEG_MIN_ENT) & (pos <= (n - w)[:, None]) \
            & (n[:, None] >= w)
    else:
        mask = np.zeros((B, L), dtype=bool)
    mask |= (n < w)[:, None] & (ent_whole < SEG_MIN_ENT)[:, None] & valid
    nws = np.maximum(n - w, 0)
    tail_bit = np.take_along_axis(mask, nws[:, None], axis=1)
    mask |= tail_bit & (pos >= nws[:, None]) & (n[:, None] >= w) & valid

    x_out = np.zeros((B, L), dtype=bool)
    cd = np.zeros(B, dtype=np.int64)
    for p in range(L):
        m = mask[:, p]
        is_x = (cd > 0) | m
        x_out[:, p] = is_x
        cd = np.where(cd > 0, cd - 1, np.where(m, w - 1, 0))
    x_out &= valid
    return np.where(x_out, np.uint8(_X), tok_u)

"""Banded Smith-Waterman-Gotoh with traceback statistics.

Behavioral contract: reference ``kswat_st`` (lib/fsearch.py:1357-1476).
Semantics reproduced exactly:

- The pair is swapped so the *shorter* suffix becomes the column sequence
  (fsearch.py:1364-1369); band half-width ``kbound`` = 16 around the main
  diagonal of the (suffix-)shifted pair.
- Computed band cells are diagonal offsets d = j - i in [-k, k-1]; the slot
  at d = k is never written in the reference (reads as score 0), and
  d = -k-1 is explicitly zeroed.  Row 0 / column 0 carry score 0 with trace
  '-' / '|', so a traceback that reaches the border walks to (0,0)
  accumulating gap columns.  All load-bearing for output parity.
- Pseudo-affine gaps: a gap step costs ge only when the predecessor cell's
  *winning direction* was the same gap direction (fsearch.py:1395-1398);
  tie priority M > I > D.
- Max cell = first strictly-greater occurrence in row-major order
  (fsearch.py:1401-1402); traceback until a '*' cell (score 0 that won
  no direction).
- Stats: aln counts all path columns; gap columns also count as mismatches;
  `gap` counts gap openings scanning start->end; idy% = 100*matches/aln.

Two implementations with identical results:
- ``kswat_oracle``: sequential matrices + explicit traceback (tests/host).
- ``sw_align_batch``: pair-vectorized anti-diagonal wavefront where every
  cell carries its path statistics ("augmented DP") — no traceback storage.
  Band slots are parity-split into two classes of k+1 slots; one scan
  iteration advances two anti-diagonals so the class alternation is static.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import (B62_BYTES, GAP_EXTEND, GAP_OPEN, KA_GAPPED_LAMBDA,
                         KA_GAPPED_LNK, KBOUND, LN2)
from .stats import score2bit

_STAR, _DIAG, _DASH, _PIPE = 0, 1, 2, 3


@dataclass
class AlnResult:
    idy: float
    aln: int
    mis: int
    gap: int
    qst: int   # traceback end (matrix coord + offset): alignment start - 1
    qed: int
    sst: int
    sed: int
    bit: int
    raw_score: int = 0


def kswat_oracle(S0: str, S1: str, qst: int = 0, sst: int = 0,
                 kbound: int = KBOUND, go: int = GAP_OPEN,
                 ge: int = GAP_EXTEND) -> AlnResult:
    """Sequential oracle; forward coordinates only (the live path)."""
    qed, sed = len(S0), len(S1)
    if abs(qed - qst) < abs(sed - sst):
        s0, s1, swap = S0, S1, False
    else:
        s0, s1, swap = S1, S0, True
        qst, sst = sst, qst
        qed, sed = sed, qed

    l0 = (qed - qst) + 1
    l1 = (sed - sst) + 1
    b0 = np.frombuffer(s0.encode('latin-1'), np.uint8)
    b1 = np.frombuffer(s1.encode('latin-1'), np.uint8)

    score = np.zeros((l1, l0), dtype=np.int64)
    trace = np.full((l1, l0), _STAR, dtype=np.int8)
    trace[0, 1:] = _DASH
    for i in range(1, l1):
        trace[i, 0] = _PIPE
        lo, hi = max(0, i - kbound - 1), min(i + kbound + 1, l0 - 1)
        if lo <= l0 - 1:  # reference writes into 4100-wide slack otherwise
            trace[i, lo] = _PIPE
            score[i, lo] = 0
        trace[i, hi] = _DASH
        score[i, hi] = 0

    i_max = j_max = maxscore = 0
    for i in range(1, l1):
        lo, hi = max(1, i - kbound), min(i + kbound, l0)
        c1 = b1[(i - 1) + sst]
        for j in range(lo, hi):
            I = score[i, j - 1] + (ge if trace[i, j - 1] == _DASH else go)
            M = score[i - 1, j - 1] + int(B62_BYTES[c1, b0[(j - 1) + qst]])
            D = score[i - 1, j] + (ge if trace[i - 1, j] == _PIPE else go)
            B = max(0, I, M, D)
            score[i, j] = B
            if B > maxscore:
                i_max, j_max, maxscore = i, j, B
            if B == M:
                trace[i, j] = _DIAG
            elif B == I:
                trace[i, j] = _DASH
            elif B == D:
                trace[i, j] = _PIPE
            else:
                trace[i, j] = _STAR

    i, j = i_max, j_max
    path = []
    while i > 0 or j > 0:
        t = trace[i, j]
        if t == _DIAG:
            path.append(('M', b0[(j - 1) + qst], b1[(i - 1) + sst]))
            i -= 1
            j -= 1
        elif t == _DASH:
            path.append(('I', 0, 0))
            j -= 1
        elif t == _PIPE:
            path.append(('D', 0, 0))
            i -= 1
        else:
            break
    path.reverse()
    aln = len(path)
    idy = mis = gap = 0
    op = -1
    for opc, c0, c1 in path:
        if opc == 'M':
            if c0 == c1:
                idy += 1
            else:
                mis += 1
            op = -1
        elif opc == 'I':   # al1 gets '-'
            mis += 1
            if op != 1:
                gap += 1
                op = 1
            else:
                op = -1    # reference resets op on gap *continuation*
                           # (fsearch.py:1462-1469 falls to the else branch),
                           # so an m-column gap run counts ceil(m/2) openings
        else:              # al0 gets '-'
            mis += 1
            if op != 0:
                gap += 1
                op = 0
            else:
                op = -1

    idy_pct = 100.0 * idy / aln if aln else 0.0
    ms = int(maxscore)
    if swap:
        return AlnResult(idy_pct, aln, mis, gap,
                         i + sst, i_max + sst, j + qst, j_max + qst,
                         score2bit(ms), ms)
    return AlnResult(idy_pct, aln, mis, gap,
                     j + qst, j_max + qst, i + sst, i_max + sst,
                     score2bit(ms), ms)


# ---------------------------------------------------------------------------
# Vectorized anti-diagonal wavefront with augmented statistics (JAX)
# ---------------------------------------------------------------------------

_STAT_NAMES = ('H', 'tr', 'idy', 'aln', 'mis', 'gap', 'op', 'sti', 'stj')


def _zero_state(ns: int, B: int):
    z = jnp.zeros((ns, B), jnp.int32)
    return {'H': z, 'tr': z, 'idy': z, 'aln': z, 'mis': z, 'gap': z,
            'op': jnp.full((ns, B), -1, jnp.int32), 'sti': z, 'stj': z}


def _shift_down(st):
    """slot e <- slot e-1 (slot 0 filled with neutral)."""
    out = {}
    for nm, v in st.items():
        fill = -1 if nm == 'op' else 0
        out[nm] = jnp.concatenate(
            [jnp.full((1, v.shape[1]), fill, v.dtype), v[:-1]], axis=0)
    return out


def _shift_up(st):
    """slot e <- slot e+1 (last slot filled with neutral)."""
    out = {}
    for nm, v in st.items():
        fill = -1 if nm == 'op' else 0
        out[nm] = jnp.concatenate(
            [v[1:], jnp.full((1, v.shape[1]), fill, v.dtype)], axis=0)
    return out


@partial(jax.jit, static_argnames=('kbound', 'go', 'ge'))
def sw_align_batch(tok0: jnp.ndarray, tok1: jnp.ndarray,
                   len0: jnp.ndarray, len1: jnp.ndarray,
                   kbound: int = KBOUND, go: int = GAP_OPEN,
                   ge: int = GAP_EXTEND) -> dict:
    """Align B pairs in parallel.

    tok0 (B, L0) uint8: column sequence (the shorter suffix, zero-anchored;
        callers perform the reference's swap and re-add offsets afterwards)
    tok1 (B, L1) uint8: row sequence
    len0/len1 (B,) int32: per-pair suffix lengths

    Returns (B,) int32 arrays: score, bi, bj (max cell), sti, stj (traceback
    end), idy, aln, mis, gap.
    """
    B, L0 = tok0.shape
    _, L1 = tok1.shape
    k = kbound
    ns = k + 1
    sub_flat = jnp.asarray(B62_BYTES.reshape(-1).astype(np.int32))
    t0i = tok0.astype(jnp.int32)
    t1i = tok1.astype(jnp.int32)
    l0 = len0.astype(jnp.int32) + 1
    l1 = len1.astype(jnp.int32) + 1

    # class c slot e covers diagonal offset d = -k-1 + c + 2e
    d_of = [(-k - 1 + c + 2 * np.arange(ns, dtype=np.int32))[:, None]
            for c in (0, 1)]
    d_of = [jnp.asarray(x) for x in d_of]

    def char_at(seq, idx):
        idxc = jnp.clip(idx, 0, seq.shape[1] - 1)
        return jnp.take_along_axis(
            jnp.broadcast_to(seq[None], (ns,) + seq.shape),
            idxc[:, :, None], axis=2)[:, :, 0]

    def substep(cls, a, st_m1, st_m2, best):
        d = d_of[cls]                           # (ns, 1)
        ii = (a - d) // 2                       # exact: parity matches
        jj = (a + d) // 2
        ii = jnp.broadcast_to(ii, (ns, B))
        jj = jnp.broadcast_to(jj, (ns, B))
        l0b, l1b = l0[None, :], l1[None, :]
        computed = ((ii >= 1) & (jj >= 1) & (ii <= l1b - 1) & (jj <= l0b - 1)
                    & (d >= -k) & (d <= k - 1))

        diag = st_m2
        if cls == 0:
            left, up = _shift_down(st_m1), st_m1
        else:
            left, up = st_m1, _shift_up(st_m1)

        c1 = char_at(t1i, ii - 1)
        c0 = char_at(t0i, jj - 1)
        sub = jnp.take(sub_flat, c1 * 256 + c0)
        eq = (c1 == c0)

        I = left['H'] + jnp.where(left['tr'] == _DASH, ge, go)
        M = diag['H'] + sub
        D = up['H'] + jnp.where(up['tr'] == _PIPE, ge, go)
        Bv = jnp.maximum(jnp.maximum(0, I), jnp.maximum(M, D))
        tr = jnp.where(Bv == M, _DIAG,
                       jnp.where(Bv == I, _DASH,
                                 jnp.where(Bv == D, _PIPE, _STAR)))

        def pick(name, add_m, add_i, add_d, reset):
            return jnp.where(
                tr == _DIAG, diag[name] + add_m,
                jnp.where(tr == _DASH, left[name] + add_i,
                          jnp.where(tr == _PIPE, up[name] + add_d, reset)))

        z = jnp.zeros_like(Bv)
        one = jnp.ones_like(Bv)
        new = {
            'H': Bv,
            'tr': tr,
            'idy': pick('idy', jnp.where(eq, 1, 0), z, z, z),
            'aln': pick('aln', one, one, one, z),
            'mis': pick('mis', jnp.where(eq, 0, 1), one, one, z),
            'gap': pick('gap', z, jnp.where(left['op'] != 1, 1, 0),
                        jnp.where(up['op'] != 0, 1, 0), z),
            # op resets to -1 on gap continuation (reference quirk: an
            # m-column gap run counts ceil(m/2) openings)
            'op': jnp.where(
                tr == _DIAG, -1,
                jnp.where(tr == _DASH, jnp.where(left['op'] != 1, 1, -1),
                          jnp.where(tr == _PIPE,
                                    jnp.where(up['op'] != 0, 0, -1), -1))),
            'sti': pick('sti', z, z, z, ii),
            'stj': pick('stj', z, z, z, jj),
        }

        # border/edge slots: row 0 carries the I-chain stats, col 0 the
        # D-chain stats, everything else zeros (see module docstring; the
        # trace value of border cells is never distinguished by readers,
        # so _STAR everywhere is safe).
        inmat = (ii >= 0) & (jj >= 0) & (ii <= l1b - 1) & (jj <= l0b - 1)
        is_row0 = inmat & (ii == 0)
        is_col0 = inmat & (jj == 0) & (ii > 0)
        bd_aln = jnp.where(is_row0, jj, jnp.where(is_col0, ii, 0))
        # the op-reset-on-continuation quirk makes an m-column border run
        # count ceil(m/2) openings, with op set only after an odd column
        bd_odd = (bd_aln % 2) == 1
        border = {
            'H': z, 'tr': z,
            'idy': z, 'aln': bd_aln, 'mis': bd_aln,
            'gap': (bd_aln + 1) // 2,
            'op': jnp.where(is_row0 & (jj > 0) & bd_odd, 1,
                            jnp.where(is_col0 & bd_odd, 0, -1)),
            'sti': z, 'stj': z,
        }
        out = {nm: jnp.where(computed, new[nm], border[nm])
               for nm in _STAT_NAMES}

        # running max cell: strictly greater, ties to smallest (i, j)
        # row-major (the reference's first-occurrence rule).
        NEG = jnp.int32(-2 ** 30)
        key = jnp.where(computed, Bv * 8192 - ii, NEG)   # max H then min i
        e_best = jnp.argmax(key, axis=0)                 # (B,)
        sel = (jnp.arange(ns, dtype=jnp.int32)[:, None] == e_best[None, :])

        def take_best(x):
            return jnp.sum(jnp.where(sel, x, 0), axis=0)

        Hc = take_best(jnp.where(computed, Bv, 0))
        iic, jjc = take_best(ii), take_best(jj)
        better = (Hc > best['score']) | (
            (Hc == best['score']) & (Hc > 0) &
            ((iic < best['bi']) | ((iic == best['bi']) & (jjc < best['bj']))))
        nbest = {'score': jnp.where(better, Hc, best['score']),
                 'bi': jnp.where(better, iic, best['bi']),
                 'bj': jnp.where(better, jjc, best['bj'])}
        for nm in ('idy', 'aln', 'mis', 'gap', 'sti', 'stj'):
            nbest[nm] = jnp.where(better, take_best(out[nm]), best[nm])
        return out, nbest

    best0 = {nm: jnp.zeros((B,), jnp.int32)
             for nm in ('score', 'bi', 'bj', 'idy', 'aln', 'mis', 'gap',
                        'sti', 'stj')}
    st_init = _zero_state(ns, B)

    # k even => odd diagonals live in class 0, even in class 1.
    assert k % 2 == 0, "kbound must be even for the parity-class layout"
    nsteps = (L0 + L1) // 2 + 1

    def body(carry, t):
        st_m1, st_m2, best = carry
        a_odd = 2 * t + 1
        st_odd, best = substep(0, a_odd, st_m1, st_m2, best)
        st_even, best = substep(1, a_odd + 1, st_odd, st_m1, best)
        return (st_even, st_odd, best), None

    (_, _, best), _ = jax.lax.scan(
        body, (st_init, st_init, best0), jnp.arange(nsteps, dtype=jnp.int32))
    return best


# Pairs per pallas kernel launch.  The TPU batch rides ONE dispatch as a
# lax.map over fixed-size chunks; SMALLER chunks measured faster per cell
# on the target chip (finer map pipelining of input DMA against compute:
# 128 -> 17.6 Gcells/s vs 512 -> 14.6 at 4096 pairs, L=500, full stats),
# and 128 is the floor (the kernel requires multiples of 128 lanes).
# SWIFTORTHO_ALIGN_CHUNK overrides for re-tuning on other parts.
_CHUNK = max(128, int(os.environ.get('SWIFTORTHO_ALIGN_CHUNK', '128'))
             // 128 * 128)


@partial(jax.jit, static_argnames=('score_only',))
def _sw_align_chunked(t0, t1, l0, l1, score_only=False):
    """(N, _CHUNK, L) chunked alignment in ONE dispatch: lax.map over the
    pallas kernel (dispatch through the TPU tunnel costs ~20 ms, so many
    chunks must ride one call; _CHUNK defaults to 128 — the measured
    optimum, see the _CHUNK comment above)."""
    from .banded_sw_pallas import sw_align_batch_pallas

    def one(args):
        return sw_align_batch_pallas.__wrapped__(*args,
                                                 score_only=score_only)

    return jax.lax.map(one, (t0, t1, l0, l1))


_COMPILED_NPOW: dict = {}


def next_chunk_count(n: int) -> int:
    """Smallest {2^k, 3*2^k} >= n.  Chunk counts are drawn from this
    ladder (instead of pure powers of two) so batch padding worst-case
    drops from ~100% to ~50% (n = 2*2^k + 1 rounds up to 3*2^k; the
    3*2^k -> 4*2^k gap pads at most ~33%); each ladder value still
    compiles only once per shape key (and the XLA compile cache
    persists)."""
    p = 1
    while p < n:
        if 3 * p >= n and 2 * p < n:
            return 3 * p
        p *= 2
    return p

# wall-time decomposition of the TPU align path, accumulated across calls
# (pad_s: host padding; call_s: H2D + trace/enqueue; fetch_s: completion +
# D2H; pairs/padded: batch accounting).  blastp logs + resets per wave.
ALIGN_PROF = {'pad_s': 0.0, 'call_s': 0.0, 'fetch_s': 0.0,
              'pairs': 0, 'padded': 0, 'calls': 0}


def sw_align_auto(tok0, tok1, len0, len1, score_only=False):
    """Dispatch to the Pallas TPU kernel when running on TPU (fixed
    _CHUNK-pair chunks — default 128 — with chunk counts drawn from
    next_chunk_count's {2^k, 3*2^k} ladder to bound compilation), else
    the portable lax.scan version.

    score_only: skip the per-cell path-statistics carries in the TPU
    kernel (score/bi/bj remain exact; other fields return 0).  The host
    paths ignore it — the C++ kernel computes everything in one pass.
    """
    import jax as _jax

    # an active search mesh (parallel.mesh.use_search_mesh) overrides the
    # single-device dispatch: pairs shard over every mesh device.  Lazy
    # import (parallel.mesh imports this module at load time).
    from ..parallel import mesh as _meshmod
    m = _meshmod.active_search_mesh()
    if m is not None:
        return _meshmod.sw_align_sharded(m, tok0, tok1, len0, len1)

    B = tok0.shape[0]
    platform = _jax.default_backend()
    if platform in ('tpu', 'axon'):
        n = -(-B // _CHUNK)
        # reuse an already-compiled chunk count when one can serve this
        # batch: padding a few chunks costs ms, a fresh XLA compile over
        # the tunnel costs ~20-40 s (tail waves would otherwise pay it)
        key = (tok0.shape[1], tok1.shape[1], bool(score_only))
        seen = _COMPILED_NPOW.setdefault(key, set())
        usable = [p for p in seen if p >= n]
        if usable:
            npow = min(usable)
        else:
            npow = next_chunk_count(n)
            seen.add(npow)
        import time as _t
        _w0 = _t.time()
        pad = npow * _CHUNK - B
        if pad:
            tok0 = np.pad(tok0, ((0, pad), (0, 0)))
            tok1 = np.pad(tok1, ((0, pad), (0, 0)))
            len0 = np.pad(len0, (0, pad))
            len1 = np.pad(len1, (0, pad))
        sh0 = (npow, _CHUNK, tok0.shape[1])
        sh1 = (npow, _CHUNK, tok1.shape[1])
        _w1 = _t.time()
        out = _sw_align_chunked(tok0.reshape(sh0), tok1.reshape(sh1),
                                len0.reshape(npow, _CHUNK).astype(np.int32),
                                len1.reshape(npow, _CHUNK).astype(np.int32),
                                score_only=bool(score_only))
        _w2 = _t.time()
        res = {k: np.asarray(v).reshape(-1)[:B] for k, v in out.items()}
        _w3 = _t.time()
        ALIGN_PROF['pad_s'] += _w1 - _w0
        ALIGN_PROF['call_s'] += _w2 - _w1
        ALIGN_PROF['fetch_s'] += _w3 - _w2
        ALIGN_PROF['pairs'] += B
        ALIGN_PROF['padded'] += npow * _CHUNK
        ALIGN_PROF['calls'] += 1
        return res
    try:        # host: the C++ kernel is ~10x the portable lax.scan one
        from ..native import sw_align_batch_native
        return sw_align_batch_native(np.asarray(tok0), np.asarray(tok1),
                                     np.asarray(len0), np.asarray(len1))
    except Exception:
        return sw_align_batch(tok0, tok1, len0, len1)


def postprocess_batch(best: dict, qst: np.ndarray, sst: np.ndarray,
                      swapped: np.ndarray) -> dict:
    """Map kernel outputs back to reference coordinates (numpy, host).

    qst/sst: per-pair suffix offsets in the *original* (query, subject)
    order; swapped: True where the subject ran as the column sequence.
    Returns dict with idy (float %), aln, mis, gap, qst, qed, sst, sed,
    bit, score (all numpy arrays).  Start coords are the traceback end
    (reference returns them 0-based; the driver prints +1).
    """
    score = np.asarray(best['score'])
    bi, bj = np.asarray(best['bi']), np.asarray(best['bj'])
    sti, stj = np.asarray(best['sti']), np.asarray(best['stj'])
    aln = np.asarray(best['aln'])
    idy_n = np.asarray(best['idy'])
    with np.errstate(divide='ignore', invalid='ignore'):
        idy = np.where(aln > 0, 100.0 * idy_n / np.maximum(aln, 1), 0.0)

    # column seq indices (jj) belong to s0 = query when not swapped.
    q_lo = np.where(swapped, sti, stj)
    q_hi = np.where(swapped, bi, bj)
    s_lo = np.where(swapped, stj, sti)
    s_hi = np.where(swapped, bj, bi)
    return {
        'idy': idy, 'aln': aln, 'mis': np.asarray(best['mis']),
        'gap': np.asarray(best['gap']),
        'qst': q_lo + qst, 'qed': q_hi + qst,
        'sst': s_lo + sst, 'sed': s_hi + sst,
        'bit': np.trunc((KA_GAPPED_LAMBDA * score - KA_GAPPED_LNK)
                        / LN2).astype(np.int64),
        'score': score,
    }

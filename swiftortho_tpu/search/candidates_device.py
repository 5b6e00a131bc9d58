"""On-device candidate generation (jit): seed hashing, budget filter,
posting expansion, diagonal grouping, and x-drop chain scoring as XLA
programs — the TPU-native reading of the reference ``find_msav_m``
(lib/fsearch.py:2645-2724) designed in SURVEY.md §7:

- spaced-seed FNV hashing as vectorized u32 ops over static shifted
  slices (reference spseeds_fnv :519-556);
- the self-score seed budget as a per-row key sort + exclusive cumsum
  (reference :2647-2677);
- posting expansion via an inclusive-cumsum + searchsorted flat
  expansion into a fixed pow2 capacity (reference get_locs_m :2638-2642);
- (query, subject, diagonal) grouping as a sort on packed 61-bit keys
  (reference dict grouping :2679-2691);
- chain scoring as a lockstep while_loop over per-group pointers with
  full-width x-drop windows (reference ungap/get_ungap_scores
  :2454-2510) — windows span the whole padded query length, so unlike
  the capped numpy fallback this path is EXACT (an extension never
  outruns the query, both indices advance together).

Exactness notes:
- duplicate (group, qst) postings are NOT pre-deduplicated: a duplicate
  point is always <= the running cover bound after its twin extends, so
  the drain step skips it and it contributes exactly 0 — identical to
  the host path's explicit dedup.
- the final min-score gate / best-per-subject selection runs on the
  HOST via the same ``_finish_candidates`` as the numpy path (tiny
  arrays by then), so tie-break semantics are shared by construction.

The heavy arrays (CSR start, postings, db tokens) are transferred to
device once per chunk index and cached on the SeedIndex instance.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import B62_BYTES, XDROP, reduced_alphabet_table
from ..io_fasta import SeqDB
from ..ops.index import SeedIndex
from ..ops.seeds import FNV_BASIS, FNV_PRIME, parse_patterns
from .candidates import Candidates, _finish_candidates

_XL, _XU = ord('x'), ord('X')
NEG_STEP = -(1 << 19)       # invalid-step sentinel: cumsum over W stays i32
NEG_INF = -(1 << 29)
GB = 2048                   # groups per chain-scoring block


def _patterns_static(alphabets: tuple, ssps: str):
    """Static (alpha_idx, pattern_idx, klen, ones) streams, in the host
    path's concatenation order (alphabet-major, pattern within)."""
    out = []
    pats = parse_patterns(ssps)
    for ai in range(len(alphabets)):
        for s, (klen, ones) in enumerate(pats):
            out.append((ai, s, klen, tuple(int(x) for x in ones)))
    return tuple(out)


# constant tables cached as NUMPY (a jnp.asarray cached under lru_cache
# and first materialized inside a trace would leak a tracer)
@lru_cache(maxsize=None)
def _tables(alphabets: tuple):
    return np.stack([reduced_alphabet_table(a) for a in alphabets]) \
        .astype(np.int32)


@lru_cache(maxsize=None)
def _b62_flat():
    return B62_BYTES.reshape(-1).astype(np.int32)


@lru_cache(maxsize=None)
def _b62_diag():
    return np.array([int(B62_BYTES[i, i]) for i in range(256)], np.int32)


@partial(jax.jit, static_argnames=('streams',))
def _stage1_seeds(q_tokens, q_lengths, code_tbls, start_i32, nc_u32,
                  threshold, streams: tuple):
    """Dense seed hashing + per-pattern dedup + budget filter.

    Returns (buckets (S,B,L) i32, kept (S,B,L) bool, counts (S,B,L) i32,
    total i64) — all device-resident; only `total` is fetched.
    """
    B, L = q_tokens.shape
    toks = q_tokens.astype(jnp.int32)
    is_x = (toks == _XL) | (toks == _XU)
    lens = q_lengths.astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)

    def shifted(a, j, fill):
        # a[:, p + j] for all p, static j (pad tail)
        return jnp.concatenate(
            [a[:, j:], jnp.full((B, j), fill, a.dtype)], axis=1) \
            if j else a

    buckets, valid = [], []
    for (ai, s, klen, ones) in streams:
        codes = jnp.take(code_tbls[ai], toks, axis=0)
        h = jnp.full((B, L), np.uint32(FNV_BASIS))
        for j in ones:
            h = (h ^ shifted(codes, j, 0).astype(jnp.uint32)) \
                * np.uint32(FNV_PRIME)
        h = (h ^ np.uint32(s)) * np.uint32(FNV_PRIME)
        b = (h % nc_u32).astype(jnp.int32)
        bad = jnp.zeros((B, L), bool)
        for j in range(klen):
            bad = bad | shifted(is_x, j, True)
        ok = (~bad) & (pos[None, :] <= lens[:, None] - klen)
        buckets.append(b)
        valid.append(ok)
    buckets = jnp.stack(buckets)            # (S, B, L)
    valid = jnp.stack(valid)

    # dedup (bucket, pos) across patterns within one alphabet, keep the
    # earliest stream (reference visit dict, fsearch.py:554-556)
    kept = valid
    for i2, (a2, _, _, _) in enumerate(streams):
        for i1, (a1, _, _, _) in enumerate(streams[:i2]):
            if a1 != a2:
                continue
            dup = valid[i1] & valid[i2] & (buckets[i1] == buckets[i2])
            kept = kept.at[i2].set(kept[i2] & ~dup)

    counts = jnp.where(
        kept,
        jnp.take(start_i32, jnp.where(kept, buckets, 0) + 1)
        - jnp.take(start_i32, jnp.where(kept, buckets, 0)),
        0).astype(jnp.int32)

    # self-score budget (reference :2645-2677): per-position histogram of
    # posting counts, ranked by mink-window BLOSUM62 self-score desc
    # (ties: position asc), kept while the exclusive cumsum <= thr*len
    mink = min(k for (_, _, k, _) in streams)
    diag_self = jnp.take(_b62_diag(), toks)
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                          jnp.cumsum(diag_self, axis=1, dtype=jnp.int32)],
                         axis=1)
    # window self-scores padded back to L columns (positions beyond the
    # last full window carry 0 posting counts, so their order is moot)
    ksc = jnp.concatenate(
        [cs[:, mink:] - cs[:, :-mink],
         jnp.zeros((B, mink - 1), jnp.int32)], axis=1)
    hist = jnp.sum(counts, axis=0).astype(jnp.int64)      # (B, L)
    key = (jnp.int32(4096) - ksc) * jnp.int32(8192) + pos[None, :]
    order = jnp.argsort(key, axis=1)
    sorted_hist = jnp.take_along_axis(hist, order, axis=1)
    excl = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int64),
         jnp.cumsum(sorted_hist[:, :-1], axis=1)], axis=1)
    # threshold and lengths are integers, so the host's float64
    # `excl <= thr*len` comparison is exactly this integer one
    budgets = threshold.astype(jnp.int64) * lens.astype(jnp.int64)
    keep_sorted = excl <= budgets[:, None]
    keep_pos = jnp.zeros((B, L), bool).at[
        jnp.arange(B)[:, None], order].set(keep_sorted)
    kept = kept & keep_pos[None, :, :]
    counts = jnp.where(kept, counts, 0)
    total = jnp.sum(counts.astype(jnp.int64))
    return buckets, kept, counts, total


def _walk_chunked(qtok_flat, db_tokens, b62, L, WC, Wmax, qrow, s_off,
                  start_q, start_s, step, base, qlo, slo, qlen, slen):
    """Chunked-window exact equivalent of ``_walk``: the prefix sums,
    running max and first-argmax are carried across WC-step chunks, so
    the results are bit-identical for any WC — but the loop exits as
    soon as EVERY lane has ended, so the work is O(actual extension
    length) instead of O(full window).  The r4 on-chip decomposition
    (tools/probe_cand_phase.py) showed the old full-width lockstep
    walks were ~99% of stage-2 time (42 of 42.4 s per 512-row block);
    extensions typically end within a few dozen steps of the x-drop."""
    P = qrow.shape[0]
    t_rel = jnp.arange(WC, dtype=jnp.int32)[None, :]
    NEGI = jnp.int32(NEG_INF)

    def cond(st):
        _, alive = st[0], st[1]
        return jnp.any(alive)

    def body(st):
        t0, alive, run_sum, run_max, best, best_t = st
        t = t0 + t_rel
        qpos = start_q[:, None] + step * t
        spos = start_s[:, None] + step * t
        valid = ((qpos > qlo[:, None]) & (qpos < qlen[:, None])
                 & (spos > slo[:, None]) & (spos < slen[:, None]))
        qi = jnp.take(qtok_flat,
                      qrow[:, None] * L + jnp.clip(qpos, 0, L - 1))
        sj = jnp.take(db_tokens,
                      jnp.clip(s_off[:, None] + spos, 0,
                               db_tokens.shape[0] - 1))
        d = jnp.where(valid, jnp.take(b62, qi * 256 + sj),
                      jnp.int32(NEG_STEP))
        sums = run_sum[:, None] + jnp.cumsum(d, axis=1, dtype=jnp.int32)
        prev = jnp.concatenate([run_sum[:, None], sums[:, :-1]], axis=1)
        runmax = jnp.maximum(run_max[:, None],
                             jax.lax.cummax(prev, axis=1))
        stopped = sums + XDROP < runmax
        ended = stopped | ~valid
        dead = jnp.concatenate(
            [jnp.zeros((P, 1), bool),
             jnp.cumsum(ended.astype(jnp.int32), axis=1)[:, :-1] > 0],
            axis=1) | ~alive[:, None]
        alive_sums = jnp.where(dead | ~valid, NEGI, sums)
        bc = jnp.max(alive_sums, axis=1)
        tc = jnp.argmax(alive_sums, axis=1).astype(jnp.int32) + t0
        better = bc > best          # strict: keeps the FIRST global argmax
        best = jnp.where(better, bc, best)
        best_t = jnp.where(better, tc, best_t)
        alive = alive & ~jnp.any(ended, axis=1) & (t0 + WC < Wmax)
        run_sum = jnp.where(alive, sums[:, -1], run_sum)
        run_max = jnp.where(alive, jnp.maximum(run_max,
                                               jnp.max(prev, axis=1)),
                            run_max)
        return t0 + WC, alive, run_sum, run_max, best, best_t

    init = (jnp.int32(0), jnp.ones((P,), bool), base,
            jnp.full((P,), NEGI), base, jnp.full((P,), -1, jnp.int32))
    st = jax.lax.while_loop(cond, body, init)
    return st[4], st[5]


def _seg_max_scan(flags, vals):
    """Segmented inclusive max-scan (flags mark segment starts)."""
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    _, out = jax.lax.associative_scan(op, (flags, vals))
    return out


def _accept_rounds(new_seg, valid_s, p_qst, E):
    """The greedy cover chain (reference get_ungap_scores drain,
    fsearch.py:2679-2724) as parallel rounds: cover after an accepted
    point = its right-walk end E (strictly increasing, E >= qst), so the
    'skip points <= cover' drain is the classic greedy interval chain —
    each round accepts the first still-uncovered point of every group
    simultaneously (segmented scans, no gathers), and the loop runs
    max-accepted-per-group times (typically 1-3).  Returns (accepted,
    qlo_rec) where qlo_rec is the cover at acceptance time (-1 marks a
    group's first point, whose walk bounds are 0 — see _walk callers)."""
    C = p_qst.shape[0]

    def cond(st):
        return st[3]

    def body(st):
        acc, cov, qlo_rec, _ = st
        cand = valid_s & (~acc) & (p_qst > cov)
        ci = cand.astype(jnp.int32)
        excl = jnp.cumsum(ci) - ci
        segbase = _seg_max_scan(new_seg, jnp.where(new_seg, excl, -1))
        firstc = cand & (excl == segbase)
        covE = _seg_max_scan(new_seg,
                             jnp.where(firstc, E, jnp.int32(-1)))
        return (acc | firstc, jnp.maximum(cov, covE),
                jnp.where(firstc, cov, qlo_rec), jnp.any(firstc))

    init = (jnp.zeros((C,), bool), jnp.full((C,), -1, jnp.int32),
            jnp.zeros((C,), jnp.int32), jnp.bool_(True))
    acc, _, qlo_rec, _ = jax.lax.while_loop(cond, body, init)
    return acc, qlo_rec


def _walk(qtok_flat, db_tokens, b62, L, W, qrow, s_off,
          start_q, start_s, step, base, qlo, slo, qlen, slen):
    """One-direction windowed x-drop (ungap semantics, fsearch.py
    :2454-2494): each in-bounds step adds its substitution score; stop
    after the first step whose running total drops more than XDROP below
    the running max; out-of-bounds stops before the step."""
    G = qrow.shape[0]
    t = jnp.arange(W, dtype=jnp.int32)[None, :]
    qpos = start_q[:, None] + step * t
    spos = start_s[:, None] + step * t
    valid = ((qpos > qlo[:, None]) & (qpos < qlen[:, None])
             & (spos > slo[:, None]) & (spos < slen[:, None]))
    qi = jnp.take(qtok_flat,
                  qrow[:, None] * L + jnp.clip(qpos, 0, L - 1))
    sj = jnp.take(db_tokens,
                  jnp.clip(s_off[:, None] + spos, 0,
                           db_tokens.shape[0] - 1))
    dvals = jnp.take(b62, qi * 256 + sj)
    d = jnp.where(valid, dvals, jnp.int32(NEG_STEP))
    sums = base[:, None] + jnp.cumsum(d, axis=1, dtype=jnp.int32)
    runmax = jax.lax.cummax(
        jnp.concatenate([base[:, None], sums[:, :-1]], axis=1), axis=1)
    stopped = sums + XDROP < runmax
    ended = stopped | ~valid
    dead = jnp.concatenate(
        [jnp.zeros((G, 1), bool),
         jnp.cumsum(ended.astype(jnp.int32), axis=1)[:, :-1] > 0], axis=1)
    alive_sums = jnp.where(dead | ~valid, jnp.int32(NEG_INF), sums)
    best = jnp.maximum(base, jnp.max(alive_sums, axis=1))
    best_t = jnp.where(best > base,
                       jnp.argmax(alive_sums, axis=1).astype(jnp.int32),
                       jnp.int32(-1))
    return best, best_t


@partial(jax.jit, static_argnames=('C', 'L', 'W', 'ablate', 'WC', 'PB'))
def _stage2_expand_chain(buckets, kept, counts, q_tokens, q_lengths,
                         start_i32, sid_i32, sst_i32,
                         db_tokens, db_offsets, total,
                         C: int, L: int, W: int, ablate: str = '',
                         WC: int = 64, PB: int = 1 << 14):
    """Posting expansion into capacity C, packed-key grouping, lockstep
    chain scoring.  Returns per-group (qrow, sid, diag, score, valid).

    ablate (perf probes only, results invalid): 'nochain' stops after
    grouping (totals = 0); 'nosort' additionally replaces the capacity
    argsort with iota."""
    S, B, _ = buckets.shape
    b_flat = buckets.reshape(-1)
    c_flat = counts.reshape(-1).astype(jnp.int32)
    cum = jnp.cumsum(c_flat, dtype=jnp.int32)              # inclusive
    excl = cum - c_flat

    o = jnp.arange(C, dtype=jnp.int32)
    valid_o = o < total.astype(jnp.int32)
    seed_of = jnp.searchsorted(cum, o, side='right').astype(jnp.int32)
    seed_of = jnp.clip(seed_of, 0, S * B * L - 1)
    bucket_o = jnp.take(b_flat, seed_of)
    within = o - jnp.take(excl, seed_of)
    slot = jnp.take(start_i32, bucket_o) + within
    slot = jnp.clip(slot, 0, sid_i32.shape[0] - 1)
    sid_o = jnp.take(sid_i32, slot).astype(jnp.int32)
    sst_o = jnp.take(sst_i32, slot).astype(jnp.int32)
    qrow_o = (seed_of % (B * L)) // L
    qst_o = seed_of % L
    diag_o = qst_o - sst_o

    # packed 61-bit key: qrow(13) sid(21) diag+8192(14) qst(13); invalid
    # elements get the max key so they sort to the tail
    key = ((((qrow_o.astype(jnp.int64) << 21) | sid_o.astype(jnp.int64))
            << 14) | (diag_o.astype(jnp.int64) + 8192)) << 13 \
        | qst_o.astype(jnp.int64)
    key = jnp.where(valid_o, key, jnp.int64(2 ** 62))
    order = jnp.arange(C) if ablate == 'nosort' else jnp.argsort(key)
    key_s = jnp.take(key, order)
    qst_s = (key_s & 8191).astype(jnp.int32)
    valid_s = jnp.take(valid_o, order)
    gkey = key_s >> 13
    new_group = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), gkey[1:] != gkey[:-1]])
    n_groups = jnp.sum(new_group.astype(jnp.int32))
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    gid_v = jnp.where(valid_s, jnp.clip(gid, 0, C - 1), C - 1)

    idx = jnp.arange(C, dtype=jnp.int32)
    grp_start = jnp.full((C,), C, jnp.int32).at[gid_v].min(idx)
    grp_end = jnp.zeros((C,), jnp.int32).at[gid_v].max(
        jnp.where(valid_s, idx + 1, 0))
    grp_valid = idx < n_groups
    grp_start = jnp.where(grp_valid, grp_start, 1)
    grp_end = jnp.where(grp_valid, grp_end, 0)

    first_el = jnp.clip(grp_start, 0, C - 1)
    fkey = jnp.take(key_s, first_el)
    g_qrow = (fkey >> 48).astype(jnp.int32)
    g_sid = ((fkey >> 27) & ((1 << 21) - 1)).astype(jnp.int32)
    g_diag = ((fkey >> 13) & ((1 << 14) - 1)).astype(jnp.int32) - 8192

    if ablate:
        return (jnp.stack([g_qrow, g_sid, g_diag,
                           jnp.zeros((C,), jnp.int32)]),
                grp_valid, n_groups)

    # --- chain scoring, fully parallel over POINTS (r4 redesign).  The
    # old lockstep group-walk (serial while_loop per 2048-group block,
    # full-width windows) measured 42 s of device compute per 512-row
    # block (tools/probe_cand_phase.py) — 99% of stage-2.  Replaced by:
    # (1) one chunked-window RIGHT walk for every point at once (the
    #     right walk never depends on the cover state — its lower bounds
    #     are vacuous except for each group's first point, a static
    #     flag);
    # (2) the greedy cover chain as parallel segmented-scan rounds
    #     (_accept_rounds) over the precomputed right ends;
    # (3) one chunked LEFT walk for every point with its recorded cover
    #     bound; non-accepted points are masked out of the group sums.
    # Bit-identical to the host engine (tests pin it); the per-point
    # walks are lax.map'ed over PB-point blocks to bound the (PB, WC)
    # temporaries.
    qtok_flat = q_tokens.reshape(-1).astype(jnp.int32)
    b62 = _b62_flat()
    p_qrow = (key_s >> 48).astype(jnp.int32)
    p_sid = ((key_s >> 27) & ((1 << 21) - 1)).astype(jnp.int32)
    p_diag = ((key_s >> 13) & ((1 << 14) - 1)).astype(jnp.int32) - 8192
    p_qst = qst_s
    sid_c = jnp.clip(p_sid, 0, db_offsets.shape[0] - 2)
    p_soff = jnp.take(db_offsets, sid_c)
    p_slen = (jnp.take(db_offsets, sid_c + 1) - p_soff).astype(jnp.int32)
    p_qlen = jnp.take(q_lengths.astype(jnp.int32),
                      jnp.clip(p_qrow, 0, B - 1))
    first = new_group                   # group's first point (always run)
    # duplicate (group, qst) postings contribute exactly 0 (the twin's
    # cover always absorbs them) — drop them from the walk workload
    live = valid_s & (first | jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]))

    PB_ = min(C, PB)

    def walk_blocked(pts, start_q, start_s, step, base, qlo, slo):
        sh2 = (C // PB_, PB_)

        def one(a):
            (b_qrow, b_soff, b_sq, b_ss, b_base, b_qlo, b_slo, b_qlen,
             b_slen) = a
            return _walk_chunked(qtok_flat, db_tokens, b62, L, WC, W,
                                 b_qrow, b_soff, b_sq, b_ss, step,
                                 b_base, b_qlo, b_slo, b_qlen, b_slen)

        br, bt = jax.lax.map(one, (pts[0].reshape(sh2),
                                   pts[1].reshape(sh2),
                                   start_q.reshape(sh2),
                                   start_s.reshape(sh2),
                                   base.reshape(sh2), qlo.reshape(sh2),
                                   slo.reshape(sh2),
                                   pts[2].reshape(sh2),
                                   pts[3].reshape(sh2)))
        return br.reshape(-1), bt.reshape(-1)

    s0 = p_qst - p_diag
    zero = jnp.zeros((C,), jnp.int32)
    # right-walk lower bounds: 0 for a group's first point (positions 0
    # are excluded, reference ungap 1-based walk); vacuous otherwise —
    # the old code passed (cover, cover-diag), but every processed
    # non-first point has p0 > cover, so qpos >= p0 > cover and
    # spos = qpos - diag > cover - diag never bind.  Dead lanes (dups /
    # invalid tail) get qlen 0 so their walk ends at step one.
    r_qlo = jnp.where(first, 0, -1)
    r_slo = jnp.where(first, 0, jnp.int32(-2 ** 30))
    pts = (p_qrow, p_soff, jnp.where(live, p_qlen, 0),
           jnp.where(live, p_slen, 0))
    best_r, t_r = walk_blocked(pts, p_qst, s0, 1, zero, r_qlo, r_slo)
    E = jnp.where(t_r >= 0, p_qst + t_r, p_qst)

    acc, qlo_rec = _accept_rounds(new_group, live, p_qst, E)

    # LEFT walks only for accepted points: compact them to the array
    # front (stable flag sort) so the lax.map covers ceil(n_acc / PB)
    # blocks of real work and the rest end immediately
    perm = jnp.argsort(jnp.where(acc, 0, 1).astype(jnp.int32),
                       stable=True)
    inv_ok = acc[perm]

    def g(a):
        return jnp.take(a, perm)

    l_qlo_all = jnp.maximum(qlo_rec, 0)
    l_slo_all = jnp.where(qlo_rec < 0, 0, qlo_rec - p_diag)
    pts_l = (g(p_qrow), g(p_soff), jnp.where(inv_ok, g(p_qlen), 0),
             jnp.where(inv_ok, g(p_slen), 0))
    best_c, _ = walk_blocked(pts_l, g(p_qst) - 1, g(s0) - 1, -1,
                             g(best_r), g(l_qlo_all), g(l_slo_all))

    totals = jnp.zeros((C,), jnp.int32).at[jnp.take(gid_v, perm)].add(
        jnp.where(inv_ok, best_c, 0))
    # one stacked output: a single D2H transfer fetches all four result
    # columns (per-array slice fetches cost ~10 s/block through the
    # relay, tools/probe_cand_phase.py)
    out4 = jnp.stack([g_qrow, g_sid, g_diag, totals])
    return out4, grp_valid, n_groups


_DB_CACHE: dict = {}


def _device_db(db: SeqDB, device=None):
    """db token slab on device.  Default placement holds ONE slab; an
    explicit multidb shard device caches per device.id on the db object
    (shards share the token array; only the CSR is per-shard)."""
    if device is not None:
        cache = getattr(db, '_multidb_tok', {})
        ent = cache.get(device.id)
        if ent is None:
            ent = (jax.device_put(db.tokens, device),
                   jax.device_put(db.offsets.astype(np.int64), device))
            cache[device.id] = ent
            db._multidb_tok = cache
        return ent
    key = id(db)
    ent = _DB_CACHE.get(key)
    if ent is None or ent[0]() is None:
        import weakref
        toks = jnp.asarray(db.tokens)
        offs = jnp.asarray(db.offsets.astype(np.int64))
        ent = (weakref.ref(db), toks, offs)
        _DB_CACHE.clear()       # hold at most one db slab on device
        _DB_CACHE[key] = ent
    return ent[1], ent[2]


def _device_index(index: SeedIndex, device=None):
    """CSR arrays on device (cached on the index; per device.id when an
    explicit multidb shard device is given)."""
    if device is not None:
        key = getattr(index, '_multidb_dev', None)
        if key is not None and key[0] == device.id:
            return key[1]
        arrs = tuple(jax.device_put(a, device) for a in (
            index.start.astype(np.int32), index.sid.astype(np.int32),
            index.sst.astype(np.int32)))
        index._multidb_dev = (device.id, arrs)
        return arrs
    dev = getattr(index, '_device_arrays', None)
    if dev is None:
        dev = (jnp.asarray(index.start.astype(np.int32)),
               jnp.asarray(index.sid.astype(np.int32)),
               jnp.asarray(index.sst.astype(np.int32)))
        index._device_arrays = dev
    return dev


def device_path_supported(q_tokens: np.ndarray, db: SeqDB,
                          index: SeedIndex) -> bool:
    """Packed-key range preconditions (same spirit as the host packing
    guards, candidates.py): query batch and padded length < 2^13,
    subject ids < 2^21, and |diagonal| < 2^13 — i.e. the longest db
    sequence must stay <= 8192 residues."""
    B, L = q_tokens.shape
    max_slen = int((db.offsets[1:] - db.offsets[:-1]).max()) if len(db) \
        else 0
    return (B < (1 << 13) and L <= (1 << 13) and len(db) < (1 << 21)
            and max_slen <= 8192)


def generate_candidates_device(q_tokens: np.ndarray, q_lengths: np.ndarray,
                               db: SeqDB, index: SeedIndex,
                               alphabets: list, ssps: str,
                               device=None) -> Candidates:
    """Drop-in device-path replacement for
    ``candidates.generate_candidates`` — identical results (enforced by
    tests/test_device_candidates.py).  Falls back to the host path when
    the packed-key ranges don't hold (see device_path_supported).

    ``device``: pin every array (and therefore the jitted stage-1/2
    programs) to one explicit device — the multidb per-shard fan-out
    (candidates_multidb); default placement otherwise."""
    if not device_path_supported(q_tokens, db, index):
        from .candidates import generate_candidates
        return generate_candidates(q_tokens, q_lengths, db, index,
                                   alphabets, ssps)
    # Platform history (round-2 'axon worker crash', root-caused round
    # 3, 2026-08-19 — BASELINE.md 'device candidates on the real chip'):
    # (a) before the capacity cap existed, production waves wanted
    # C ~ 2^26 and stage 2's several capacity-sized i64 arrays blew
    # device memory — fixed by the cap + 512-row block chunking below
    # (C stays <= ~2^20); (b) with the cap, the full path runs on the
    # real chip with EXACT parity (probed at 128/512/2048/4096-query
    # waves, 2227- and 41k-seq corpora); (c) one transient relay
    # 'remote_compile: response body closed' connection drop was
    # observed and the identical program compiled fine on retry —
    # platform flakiness, not a kernel bug.  The former hard-disable
    # keyed on backend=='axon' is gone (the relay now registers as
    # 'tpu' anyway); the engine stays OPT-IN via SWIFTORTHO_CANDIDATES=
    # device because the measured winner through this chip's relay is
    # the host engine (0.95 s vs 333 s per 4096-query wave at 41k seqs
    # — ~20 ms/dispatch and serial chain while_loops dominate).
    B, L = q_tokens.shape
    streams = _patterns_static(tuple(alphabets), ssps)
    tbls = _tables(tuple(alphabets))
    if device is not None:
        tbls = jax.device_put(tbls, device)

    def put(a):
        return jnp.asarray(a) if device is None \
            else jax.device_put(a, device)

    with jax.enable_x64(True):
        start_i32, sid_i32, sst_i32 = _device_index(index, device)
        q_dev = put(q_tokens)
        qlen_dev = put(q_lengths.astype(np.int32))
        buckets, kept, counts, total = _stage1_seeds(
            q_dev, qlen_dev,
            tbls, start_i32, jnp.uint32(index.nc),
            put(np.int64(index.threshold)), streams)
        row_tot = np.asarray(jnp.sum(counts, axis=(0, 2))).astype(np.int64)
        total_i = int(row_tot.sum())
        if total_i == 0:
            z = np.zeros(0, dtype=np.int64)
            return Candidates(z, z, z, z, z)

        # posting-capacity guard: stage 2 materializes several
        # capacity-sized i64 arrays (packed sort keys + workspace), so
        # one stage-2 call is bounded by the cap (production-scale waves
        # once exceeded device memory and CRASHED the TPU worker: a
        # 41k-seq corpus wanted C ~ 2^26).  Waves over the cap run
        # stage 2 CHUNKED over contiguous query-row blocks — chain
        # groups are per-query, so block boundaries at query rows keep
        # every group intact and the concatenated result identical.
        # Only a single query whose own postings exceed the cap cannot
        # be split; that falls back to the bit-identical host engine.
        import os as _os

        from ..utils import log_event
        cap = int(_os.environ.get('SWIFTORTHO_DEVICE_CAND_CAP',
                                  str(1 << 23)))
        if int(row_tot.max()) > cap:
            log_event('device_candidates_fallback',
                      max_query_postings=int(row_tot.max()), cap=cap)
            from .candidates import generate_candidates
            return generate_candidates(q_tokens, q_lengths, db, index,
                                       alphabets, ssps)

        # greedy row blocks: rows until the cap (or RB rows) is reached;
        # RB is the static padded row count so XLA compiles one stage-2
        # program per (capacity, RB) pair
        RB = min(B, 512)
        blocks = []                 # (row_lo, row_hi)
        lo = 0
        while lo < B:
            hi, acc = lo, 0
            while hi < B and hi - lo < RB and acc + row_tot[hi] <= cap:
                acc += int(row_tot[hi])
                hi += 1
            if hi == lo:            # single row over cap: handled above
                hi = lo + 1
            blocks.append((lo, hi))
            lo = hi
        if len(blocks) > 1:
            log_event('device_candidates_chunked', blocks=len(blocks),
                      postings=total_i, cap=cap)

        db_tokens, db_offsets = _device_db(db, device)
        parts = []
        for (blo, bhi) in blocks:
            btot = int(row_tot[blo:bhi].sum())
            if btot == 0:
                continue
            C = 1
            while C < btot:
                C *= 2
            C = max(C, GB)
            pad_r = RB - (bhi - blo)

            def rows(a):
                a = a[:, blo:bhi] if a.ndim == 3 else a[blo:bhi]
                if pad_r:
                    width = [(0, 0), (0, pad_r), (0, 0)] if a.ndim == 3 \
                        else [(0, pad_r)] + [(0, 0)] * (a.ndim - 1)
                    a = jnp.pad(a, width)
                return a

            # knob defaults = the r5 on-chip sweep optimum
            # (tools/probe_wc_sweep.py, BASELINE.md r5: WC=32 PB=2^12 =
            # 7.23 s per 512-row block, reproduced across two sessions;
            # the 9-config WC x PB surface is flat at 7.2-9.7 s — a
            # plateau set by the chip's 0.031 G elem/s gather rate)
            wc = int(_os.environ.get('SWIFTORTHO_DEVICE_CAND_WC', '32'))
            pb = int(_os.environ.get('SWIFTORTHO_DEVICE_CAND_PB',
                                     str(1 << 12)))
            out4, grp_valid, n_groups = _stage2_expand_chain(
                rows(buckets), rows(kept), rows(counts),
                rows(q_dev), rows(qlen_dev),
                start_i32, sid_i32, sst_i32, db_tokens, db_offsets,
                put(np.int64(btot)), C=C, L=L, W=L + 1,
                WC=wc, PB=pb)
            ng = int(n_groups)
            res = np.asarray(out4[:, :ng]).astype(np.int64)
            res[0] += blo
            parts.append(tuple(res))
        g_qrow, g_sid, g_diag, score = (
            np.concatenate([p[i] for p in parts]) for i in range(4))
    return _finish_candidates(g_qrow, g_sid, g_diag, score)

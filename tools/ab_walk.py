#!/usr/bin/env python
"""Micro-A/B of the fused candidate engine's chain walks (SIMD vs
scalar) on REAL inputs: chunk 0 / wave 0 of a cached scale corpus.
CPU-only; uses the cached idx_nc*.npz written by tools/profile_phaseA.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/scale250')
    ap.add_argument('--nc', type=int, default=1 << 24)
    ap.add_argument('--chunk', type=int, default=0)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.ops.index import load_index
    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search.candidates import (_self_score_budget,
                                                  make_wave_seeds)
    from swiftortho_tpu.constants import MIN_CHAIN_SCORE, XDROP

    fsa = os.path.join(args.workdir, 'c.fsa')
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=args.nc)
    index = load_index(os.path.join(
        args.workdir, 'idx_nc%d.%d.npz' % (args.nc, args.chunk)))

    pad = 1
    maxq = int(db.lengths.max())
    while pad < maxq:
        pad *= 2
    pad = max(pad, 64)
    idx = np.arange(0, cfg.query_batch, dtype=np.int64)
    toks, lens = db.padded_batch(idx, pad)
    toks = seg_batch_vec(toks, lens)

    ws = make_wave_seeds(toks, lens, cfg.resolved_alphabets(), cfg.seeds,
                         index.nc, index.mink)
    counts = index.bucket_counts(ws.buckets)
    keep = _self_score_budget(toks, lens, ws.rows, ws.qst, counts,
                              index.mink, index.threshold, order=ws.order)
    rows, qst = ws.rows[keep], ws.qst[keep]
    counts = counts[keep]
    starts, _ = index.posting_range(ws.buckets[keep])
    print('postings: %d' % counts.sum(), flush=True)

    from swiftortho_tpu.native import candidates_fused_native

    def run():
        t0 = time.time()
        out = candidates_fused_native(
            rows, qst, counts, starts, index.sid, index.sst,
            toks.shape[0], toks, db.tokens, db.offsets,
            lens.astype(np.int64), XDROP, MIN_CHAIN_SCORE)
        return time.time() - t0, out

    results = {}
    for mode, env in (('simd', '0'), ('scalar', '1')):
        os.environ['SWNATIVE_NO_SIMD'] = env
        times = []
        for r in range(args.reps):
            dt, out = run()
            times.append(dt)
            print('%s rep %d: %.2fs  (cands %d)'
                  % (mode, r, dt, len(out[0])), flush=True)
        results[mode] = (min(times), out)
    a, b = results['simd'][1], results['scalar'][1]
    same = all(np.array_equal(x, y) for x, y in zip(a, b))
    print('outputs identical: %s' % same)
    print('best: simd %.2fs scalar %.2fs (%.2fx)'
          % (results['simd'][0], results['scalar'][0],
             results['scalar'][0] / results['simd'][0]))


if __name__ == '__main__':
    main()

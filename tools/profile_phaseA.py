#!/usr/bin/env python
"""Decompose phase-A (host candidate generation) wall time per
(wave, chunk) and A/B the chunk-invariant WaveSeeds cache + native
budget_keep (VERDICT r3 item 2 groundwork).  CPU-only; safe off-chip.
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
    ap.add_argument('--taxa', type=int, default=25)
    ap.add_argument('--families', type=int, default=4000)
    ap.add_argument('--workdir', default='/tmp/scale102')
    ap.add_argument('--waves', type=int, default=2)
    ap.add_argument('--nc', type=int, default=1 << 24,
                    help='hash buckets (r2 scale methodology: 2^24)')
    args = ap.parse_args()

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB

    os.makedirs(args.workdir, exist_ok=True)
    fsa = os.path.join(args.workdir, 'c.fsa')
    if not os.path.exists(fsa):
        t0 = time.time()
        write_corpus(fsa, make_corpus(n_taxa=args.taxa,
                                      n_families=args.families,
                                      seed=7, min_len=80, max_len=600))
        print('corpus gen %.1fs' % (time.time() - t0), flush=True)
    db = SeqDB.from_path(fsa)
    n = len(db)
    cfg = SearchConfig(expect=1e-5, nc=args.nc)
    print('corpus %d seqs, chunk=%d -> %d chunks'
          % (n, cfg.effective_chunk(),
             -(-n // cfg.effective_chunk())), flush=True)

    from swiftortho_tpu.ops.index import load_index, save_index
    from swiftortho_tpu.search.blastp import IndexSource
    t0 = time.time()
    idx_prefix = os.path.join(args.workdir, 'idx_nc%d' % args.nc)
    import glob
    cached = sorted(glob.glob(idx_prefix + '.*.npz'))
    if cached:
        indexes = [load_index(p) for p in cached]
    else:
        src = IndexSource.from_build(db, cfg)
        indexes = [src.get(ci) for ci in range(len(src))]
        for ci, ix in enumerate(indexes):
            save_index('%s.%d.npz' % (idx_prefix, ci), ix)
    print('index: %.1fs (%d chunks)' % (time.time() - t0,
                                        len(indexes)), flush=True)

    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search.candidates import (generate_candidates,
                                                  make_wave_seeds)

    alphabets = cfg.resolved_alphabets()
    pad = 1
    maxq = int(db.lengths.max())
    while pad < maxq:
        pad *= 2
    pad = max(pad, 64)

    for wi in range(args.waves):
        wst = wi * cfg.query_batch
        wend = min(wst + cfg.query_batch, n)
        idx = np.arange(wst, wend, dtype=np.int64)
        t0 = time.time()
        toks, lens = db.padded_batch(idx, pad)
        toks = seg_batch_vec(toks, lens)
        t_seg = time.time() - t0

        t0 = time.time()
        ws = make_wave_seeds(toks, lens, alphabets, cfg.seeds,
                             indexes[0].nc, indexes[0].mink)
        t_ctx = time.time() - t0
        print('wave %d (%d q): seg %.2fs  ctx(hash+order) %.2fs'
              % (wi, wend - wst, t_seg, t_ctx), flush=True)

        tot_cached = 0.0
        for ci, index in enumerate(indexes):
            t0 = time.time()
            c = generate_candidates(toks, lens, db, index, alphabets,
                                    cfg.seeds, wave_seeds=ws)
            dt = time.time() - t0
            tot_cached += dt
            print('  [cached ctx] chunk %d: %.2fs  (cands %d)'
                  % (ci, dt, len(c.qrow)), flush=True)
        tot_plain = 0.0
        for ci, index in enumerate(indexes):
            t0 = time.time()
            c = generate_candidates(toks, lens, db, index, alphabets,
                                    cfg.seeds)
            dt = time.time() - t0
            tot_plain += dt
            print('  [plain]      chunk %d: %.2fs' % (ci, dt), flush=True)
        print('wave %d: ctx+cached %.2fs  vs plain %.2fs  (%.2fx)'
              % (wi, t_ctx + tot_cached, tot_plain,
                 tot_plain / max(t_ctx + tot_cached, 1e-9)), flush=True)


if __name__ == '__main__':
    main()

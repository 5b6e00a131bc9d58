#!/usr/bin/env python
"""Host-thread scaling of phase A (VERDICT r4 item 3): sweep the
(producer threads x SWNATIVE_THREADS) grid over real (wave, chunk)
candidate-generation cells with cached chunk indexes.  CPU-only; uses
the idx_nc*.npz cache written by tools/profile_phaseA.py.

The production default is SWIFTORTHO_PRODUCERS=2 with the native engine
at hardware_concurrency (4 here); this measures whether that is the
right point on a 4-core host.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/scale250_400')
    ap.add_argument('--nc', type=int, default=1 << 24)
    ap.add_argument('--waves', type=int, default=2)
    ap.add_argument('--chunks', type=int, default=3,
                    help='chunk indexes per wave (grid = waves x chunks)')
    args = ap.parse_args()

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.ops.index import load_index
    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search.candidates import (generate_candidates,
                                                  make_wave_seeds)

    db = SeqDB.from_path(os.path.join(args.workdir, 'c.fsa'))
    cfg = SearchConfig(expect=1e-5, nc=args.nc)
    alphabets = cfg.resolved_alphabets()
    import glob
    paths = sorted(glob.glob(os.path.join(
        args.workdir, 'idx_nc%d.*.npz' % args.nc)))[:args.chunks]
    if not paths:
        print('no cached indexes; run tools/profile_phaseA.py first')
        return 1
    indexes = [load_index(p) for p in paths]

    pad = 1
    maxq = int(db.lengths.max())
    while pad < maxq:
        pad *= 2
    pad = max(pad, 64)

    wavedat = []
    for wi in range(args.waves):
        wst = wi * cfg.query_batch
        idx = np.arange(wst, min(wst + cfg.query_batch, len(db)),
                        dtype=np.int64)
        toks, lens = db.padded_batch(idx, pad)
        toks = seg_batch_vec(toks, lens)
        ws = make_wave_seeds(toks, lens, alphabets, cfg.seeds,
                             indexes[0].nc, indexes[0].mink)
        wavedat.append((toks, lens, ws))

    grid = [(wi, ci) for wi in range(len(wavedat))
            for ci in range(len(indexes))]

    def run_grid(nprod):
        from concurrent.futures import ThreadPoolExecutor

        def cell(wc):
            wi, ci = wc
            toks, lens, ws = wavedat[wi]
            return len(generate_candidates(toks, lens, db, indexes[ci],
                                           alphabets, cfg.seeds,
                                           wave_seeds=ws).qrow)

        t0 = time.time()
        if nprod == 1:
            total = sum(cell(wc) for wc in grid)
        else:
            with ThreadPoolExecutor(nprod) as ex:
                total = sum(ex.map(cell, grid))
        return time.time() - t0, total

    print('grid: %d waves x %d chunks' % (len(wavedat), len(indexes)),
          flush=True)
    run_grid(1)                                   # warm (jit, page-in)
    base = None
    for nprod, nat in ((1, 4), (2, 4), (2, 2), (3, 4), (4, 4), (4, 1)):
        os.environ['SWNATIVE_THREADS'] = str(nat)
        dt, total = run_grid(nprod)
        if base is None:
            base = dt
        print('producers=%d native_threads=%d: %.2fs  (%.2fx vs 1x4) '
              'cands=%d' % (nprod, nat, dt, base / dt, total), flush=True)
    os.environ.pop('SWNATIVE_THREADS', None)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Device vs host candidate generation at the 40k corpus (VERDICT r2
item 2 'Done' criterion): time both engines on real 4096-query waves,
check exact parity, and escalate the stage-2 capacity cap to find the
relay's compile ceiling (largest caps LAST — a failure there must not
cost the earlier measurements).

Run detached: nohup python tools/bench_device_cand.py > log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    print('backend: %s' % jax.default_backend(), flush=True)
    os.environ['SWIFTORTHO_DEVICE_CAND_UNSAFE'] = '1'

    import tempfile

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.ops.index import build_index
    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search.candidates import generate_candidates
    from swiftortho_tpu.search.candidates_device import \
        generate_candidates_device

    td = tempfile.mkdtemp(prefix='bench_cand_')
    fsa = os.path.join(td, 'c40k.fsa')
    t0 = time.time()
    write_corpus(fsa, make_corpus(n_taxa=10, n_families=4000, seed=7,
                                  min_len=80, max_len=600))
    db = SeqDB.from_path(fsa)
    print('corpus: %d seqs %.1fs' % (len(db), time.time() - t0),
          flush=True)
    cfg = SearchConfig(expect=1e-5, nc=1 << 24)
    t0 = time.time()
    index = build_index(db, 0, len(db), ['aa9'], cfg.seeds, cfg.nc)
    print('index: %d postings %.1fs'
          % (len(index.locus), time.time() - t0), flush=True)

    maxq = int(db.lengths.max())
    pad = 1
    while pad < maxq:
        pad *= 2
    WQ = 4096
    waves = []
    for wst in (0, WQ):
        idx = np.arange(wst, min(wst + WQ, len(db)), dtype=np.int64)
        toks, lens = db.padded_batch(idx, pad)
        waves.append((seg_batch_vec(toks, lens), lens))

    # host engine (native C++ chain), wave-by-wave
    host_res = []
    t0 = time.time()
    for toks, lens in waves:
        host_res.append(generate_candidates(toks, lens, db, index,
                                            ['aa9'], cfg.seeds))
    t_host = time.time() - t0
    print('HOST: %d+%d candidates in %.1fs'
          % (len(host_res[0].qrow), len(host_res[1].qrow), t_host),
          flush=True)

    # device engine: cap ladder, ascending; each cap does a cold pass
    # (compiles) then a warm pass for the honest steady-state number
    for cap_log2 in (20, 21, 22, 23):
        os.environ['SWIFTORTHO_DEVICE_CAND_CAP'] = str(1 << cap_log2)
        try:
            t0 = time.time()
            dev0 = generate_candidates_device(*waves[0], db, index,
                                              ['aa9'], cfg.seeds)
            t_cold = time.time() - t0
            t0 = time.time()
            dev1 = generate_candidates_device(*waves[1], db, index,
                                              ['aa9'], cfg.seeds)
            t_warm = time.time() - t0
            par = all(
                np.array_equal(getattr(d, f), getattr(h, f))
                for d, h in zip((dev0, dev1), host_res)
                for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'))
            print('DEVICE cap=2^%d: cold %.1fs warm %.1fs parity=%s'
                  % (cap_log2, t_cold, t_warm, par), flush=True)
        except Exception as e:
            print('DEVICE cap=2^%d FAILED: %s: %s'
                  % (cap_log2, type(e).__name__, str(e)[:160]),
                  flush=True)
            break
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

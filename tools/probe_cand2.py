#!/usr/bin/env python
"""Stage-2 capacity ceiling probe: find the largest static capacity C
whose _stage2_expand_chain program the axon relay can compile
(remote_compile drops the response at C=2^23; P7 proved C=2^20 works).
Then prove the production path at a 2048-query wave under that cap."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print('backend: %s' % jax.default_backend(), flush=True)

    t0 = time.time()
    chk = int(np.asarray(jnp.sort(jnp.arange(1024, 0, -1))[0]))
    print('SANITY-OK %.1fs chk=%d' % (time.time() - t0, chk), flush=True)

    import tempfile

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.ops.index import build_index
    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search.candidates import generate_candidates
    from swiftortho_tpu.search.candidates_device import \
        generate_candidates_device

    os.environ['SWIFTORTHO_DEVICE_CAND_UNSAFE'] = '1'
    td = tempfile.mkdtemp(prefix='probe_cand2_')
    fsa = os.path.join(td, 'c.fsa')
    write_corpus(fsa, make_corpus(n_taxa=5, n_families=445, seed=5,
                                  min_len=60, max_len=400))
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=1 << 20)
    index = build_index(db, 0, len(db), ['aa9'], cfg.seeds, cfg.nc)
    maxq = int(db.lengths.max())
    pad = 1
    while pad < maxq:
        pad *= 2

    for name, nq, cap in (('C21-512q', 512, 1 << 21),
                          ('C22-512q', 512, 1 << 22),
                          ('C20-2048q', 2048, 1 << 20)):
        t0 = time.time()
        os.environ['SWIFTORTHO_DEVICE_CAND_CAP'] = str(cap)
        idx = np.arange(min(nq, len(db)), dtype=np.int64)
        toks, lens = db.padded_batch(idx, pad)
        toks = seg_batch_vec(toks, lens)
        try:
            cand = generate_candidates_device(toks, lens, db, index,
                                              ['aa9'], cfg.seeds)
        except Exception as e:
            print('PROBE-FAIL %s %.1fs %s: %s'
                  % (name, time.time() - t0, type(e).__name__,
                     str(e)[:120]), flush=True)
            continue
        host = generate_candidates(toks, lens, db, index, ['aa9'],
                                   cfg.seeds)
        same = all(np.array_equal(getattr(cand, f), getattr(host, f))
                   for f in ('qrow', 'subject', 'score', 'band_q',
                             'band_s'))
        print('PROBE-OK %s %.1fs n=%d parity=%s'
              % (name, time.time() - t0, len(cand.qrow), same),
              flush=True)

    print('DONE', flush=True)


if __name__ == '__main__':
    main()

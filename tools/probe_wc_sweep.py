#!/usr/bin/env python
"""Finer WC/PB sweep of the device candidate engine's chain stage
(VERDICT r4 item 7): r4 stopped at WC=32/PB=2^13 with a monotone trend —
measure whether smaller windows keep winning on one real 512-row block.

nohup python tools/probe_wc_sweep.py > /tmp/probe_wc.log 2>&1 &
"""

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
    chk = int(np.asarray(jnp.sort(jnp.arange(64, 0, -1))[0]))
    print('SANITY-OK %.1fs chk=%d' % (time.time() - t0, chk), flush=True)

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.ops.index import build_index
    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search import candidates_device as cd

    wd = '/tmp/probe_wc'
    os.makedirs(wd, exist_ok=True)
    fsa = os.path.join(wd, 'c40k.fsa')
    if not os.path.exists(fsa):
        write_corpus(fsa, make_corpus(n_taxa=10, n_families=4000, seed=7,
                                      min_len=80, max_len=600))
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=1 << 24)
    index = build_index(db, 0, len(db), ['aa9'], cfg.seeds, cfg.nc)
    print('corpus %d seqs, %d postings' % (len(db), len(index.locus)),
          flush=True)

    maxq = int(db.lengths.max())
    pad = 1
    while pad < maxq:
        pad *= 2
    idx = np.arange(0, 4096, dtype=np.int64)
    toks, lens = db.padded_batch(idx, pad)
    toks = seg_batch_vec(toks, lens)
    B, L = toks.shape
    streams = cd._patterns_static(('aa9',), cfg.seeds)
    tbls = cd._tables(('aa9',))

    with jax.enable_x64(True):
        start_i32, sid_i32, sst_i32 = cd._device_index(index)
        db_tokens, db_offsets = cd._device_db(db)
        q_dev = jnp.asarray(toks)
        qlen_dev = jnp.asarray(lens.astype(np.int32))
        buckets, kept, counts, total = cd._stage1_seeds(
            q_dev, qlen_dev, tbls, start_i32, jnp.uint32(index.nc),
            jnp.asarray(np.int64(index.threshold)), streams)
        row_tot = np.asarray(jnp.sum(counts, axis=(0, 2)))
        RB = 512
        btot = int(row_tot[:RB].sum())
        C = 1
        while C < btot:
            C *= 2
        C = max(C, cd.GB)
        print('block postings %d C=2^%d' % (btot, int(np.log2(C))),
              flush=True)

        def rows(a):
            return a[:, :RB] if a.ndim == 3 else a[:RB]

        args = (rows(buckets), rows(kept), rows(counts), rows(q_dev),
                rows(qlen_dev), start_i32, sid_i32, sst_i32, db_tokens,
                db_offsets, jnp.asarray(np.int64(btot)))

        ref = None
        for wc, pb in ((32, 1 << 12), (32, 1 << 13), (32, 1 << 11),
                       (64, 1 << 12), (32, 1 << 12)):
            times = []
            for rep in range(3):
                t0 = time.time()
                out = cd._stage2_expand_chain(*args, C=C, L=L, W=L + 1,
                                              WC=wc, PB=pb)
                ng = int(out[2])            # forcing fetch
                times.append(time.time() - t0)
            if ref is None:
                ref = ng
            assert ng == ref, (wc, pb, ng, ref)
            print('WC=%-3d PB=2^%d: cold %.2fs warm %.2fs/%.2fs '
                  '(groups %d)' % (wc, int(np.log2(pb)), times[0],
                                   times[1], times[2], ng), flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

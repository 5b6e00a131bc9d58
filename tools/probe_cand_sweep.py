#!/usr/bin/env python
"""On-chip (WC, PB) sweep for the r4 parallel-points chain engine:
warm stage-2 time of one 512-row block of a real 4096-query wave on the
41k corpus, per knob pair, plus host-parity of the full block outputs.

Run detached: nohup python tools/probe_cand_sweep.py > log 2>&1 &
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
    chk = int(np.asarray(jnp.sort(jnp.arange(1024, 0, -1))[0]))
    print('SANITY-OK %.1fs chk=%d' % (time.time() - t0, chk), flush=True)

    import tempfile

    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.ops.index import build_index
    from swiftortho_tpu.ops.seg import seg_batch_vec
    from swiftortho_tpu.search import candidates_device as cd

    td = tempfile.mkdtemp(prefix='probe_sweep_')
    fsa = os.path.join(td, 'c40k.fsa')
    write_corpus(fsa, make_corpus(n_taxa=10, n_families=4000, seed=7,
                                  min_len=80, max_len=600))
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=1 << 24)
    index = build_index(db, 0, len(db), ['aa9'], cfg.seeds, cfg.nc)
    print('corpus %d seqs, %d postings'
          % (len(db), len(index.locus)), flush=True)

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
        print('block rows 0:%d postings %d -> C=2^%d'
              % (RB, btot, int(np.log2(C))), flush=True)

        def rows(a):
            return a[:, :RB] if a.ndim == 3 else a[:RB]

        args = (rows(buckets), rows(kept), rows(counts), rows(q_dev),
                rows(qlen_dev), start_i32, sid_i32, sst_i32, db_tokens,
                db_offsets, jnp.asarray(np.int64(btot)))

        ref_out = None
        for wc, pb in ((64, 1 << 14), (32, 1 << 14), (64, 1 << 15),
                       (32, 1 << 13), (128, 1 << 15)):
            name = 'WC=%d PB=2^%d' % (wc, int(np.log2(pb)))
            t0 = time.time()
            out = cd._stage2_expand_chain(*args, C=C, L=L, W=L + 1,
                                          WC=wc, PB=pb)
            ng = int(out[2])
            cold = time.time() - t0
            times = []
            for _ in range(2):
                t0 = time.time()
                out = cd._stage2_expand_chain(*args, C=C, L=L, W=L + 1,
                                              WC=wc, PB=pb)
                ng = int(out[2])
                times.append(time.time() - t0)
            parts = tuple(np.asarray(out[0][:, :ng]))
            if ref_out is None:
                ref_out = parts
                same = True
            else:
                same = all(np.array_equal(a, b)
                           for a, b in zip(parts, ref_out))
            print('%s: cold %.1fs warm %s  identical=%s'
                  % (name, cold,
                     '/'.join('%.2f' % t for t in times), same),
                  flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Itemized on-chip decomposition of the device candidate engine
(VERDICT r3 item 1): where do the 333 s/wave go?

For one 512-row stage-2 block of a real 4096-query wave on the 41k
corpus, times (warm, with a forcing scalar fetch after each step — the
relay's block_until_ready does not force completion, BASELINE.md):

  stage1          one dispatch (seeds + budget)
  s2 nosort       expansion + grouping minus the argsort
  s2 nochain      + capacity argsort
  s2 full         + lockstep chain while_loops
  fetch           D2H of the per-group result slices

Run detached: nohup python tools/probe_cand_phase.py > log 2>&1 &
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

    td = tempfile.mkdtemp(prefix='probe_phase_')
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
    idx = np.arange(0, WQ, dtype=np.int64)
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

        def force(x):
            return float(np.asarray(x).reshape(-1)[0])

        def stage1():
            return cd._stage1_seeds(q_dev, qlen_dev, tbls, start_i32,
                                    jnp.uint32(index.nc),
                                    jnp.asarray(np.int64(index.threshold)),
                                    streams)

        # cold + warm
        for label in ('cold', 'warm'):
            t0 = time.time()
            buckets, kept, counts, total = stage1()
            row_tot = np.asarray(jnp.sum(counts, axis=(0, 2)))
            print('stage1 %s: %.2fs (total postings %d)'
                  % (label, time.time() - t0, int(row_tot.sum())),
                  flush=True)

        # one 512-row block (rows 0:512)
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

        for ab in ('nosort', 'nochain', ''):
            name = ab or 'full'
            for label in ('cold', 'warm', 'warm2'):
                t0 = time.time()
                out = cd._stage2_expand_chain(*args, C=C, L=L, W=L + 1,
                                              ablate=ab)
                ng = int(out[2])        # forcing fetch
                dt = time.time() - t0
                print('s2 %-8s %s: %.2fs (n_groups %d)'
                      % (name, label, dt, ng), flush=True)
            if not ab:
                t0 = time.time()
                parts = tuple(np.asarray(out[0][:, :ng]))
                print('fetch slices: %.2fs (%d groups x 4 cols)'
                      % (time.time() - t0, ng), flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

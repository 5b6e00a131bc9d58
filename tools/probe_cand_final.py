#!/usr/bin/env python
"""Final r4 device-candidate A/B (VERDICT r3 item 1 'record the new
winner'): full 4096-query waves on the 41k corpus, host native engine
vs the parallel-points device engine (WC=32, PB=2^13 — the sweep
optimum), exact parity asserted — plus a direct measurement of the
chip's gather throughput, the floor the chain walks run at.

Run detached: nohup python tools/probe_cand_final.py > log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['SWIFTORTHO_DEVICE_CAND_WC'] = '32'
os.environ['SWIFTORTHO_DEVICE_CAND_PB'] = str(1 << 13)

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

    td = tempfile.mkdtemp(prefix='probe_final_')
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
    waves = []
    for wst in (0, 4096):
        idxw = np.arange(wst, wst + 4096, dtype=np.int64)
        toks, lens = db.padded_batch(idxw, pad)
        waves.append((seg_batch_vec(toks, lens), lens))

    host_res = []
    t0 = time.time()
    for toks, lens in waves:
        host_res.append(generate_candidates(toks, lens, db, index,
                                            ['aa9'], cfg.seeds))
    t_host = time.time() - t0
    print('HOST: %.2fs for 2 waves (%.2fs/wave)'
          % (t_host, t_host / 2), flush=True)

    t0 = time.time()
    dev0 = generate_candidates_device(*waves[0], db, index, ['aa9'],
                                      cfg.seeds)
    t_cold = time.time() - t0
    t0 = time.time()
    dev1 = generate_candidates_device(*waves[1], db, index, ['aa9'],
                                      cfg.seeds)
    t_warm = time.time() - t0
    par = all(np.array_equal(getattr(d, f), getattr(h, f))
              for d, h in zip((dev0, dev1), host_res)
              for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'))
    print('DEVICE (r4 parallel-points, WC=32 PB=2^13): cold %.1fs '
          'warm %.1fs/wave parity=%s' % (t_cold, t_warm, par),
          flush=True)

    # gather throughput, the chain walks' floor: random int32 takes from
    # a 16M-entry table (sized so even 0.01 G elem/s finishes in ~100 s;
    # index passed as an argument — a baked constant 413s the relay)
    N, T = 1 << 19, 1 << 24
    tab = jnp.arange(T, dtype=jnp.int32)
    idx_h = np.random.default_rng(0).integers(0, T, N, dtype=np.int32)

    @jax.jit
    def gat(idx, seed):
        a = jnp.take(tab, jnp.bitwise_xor(idx, seed))
        b = jnp.take(tab, jnp.bitwise_xor(idx, seed + 1))
        return a[0] + b[0] + a[N - 1] + b[N - 1]

    idx_d = jnp.asarray(idx_h)
    int(np.asarray(gat(idx_d, jnp.int32(0))))    # compile + warm
    t0 = time.time()
    int(np.asarray(gat(idx_d, jnp.int32(2))))
    dt = time.time() - t0
    print('gather throughput: %.4f G elem/s (%d elems in %.2fs)'
          % (2 * N / dt / 1e9, 2 * N, dt), flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

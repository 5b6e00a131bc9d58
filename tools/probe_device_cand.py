#!/usr/bin/env python
"""Axon stage-2 crash bisect (VERDICT r2 item 2).

Escalating probes of the device-candidate stage-2 building blocks on the
real chip, one per step, each followed by a host fetch (the only thing
that forces completion through the relay) and a flushed marker line.  If
the TPU worker crashes at probe K, the log's last marker identifies the
culprit.  Run detached:  nohup python tools/probe_device_cand.py > log &

Probe ladder:
  P1  x64 sort, 2^20 i64 keys
  P2  x64 sort, 2^23 i64 keys            (production capacity)
  P3  x64 argsort+take, 2^23             (the actual stage-2 op)
  P4  u32 double-word sort, 2^23         (the no-x64 alternative)
  P5  scatter min/max group bounds, 2^23
  P6  lockstep while_loop chain scoring, 2^20 groups, W=513
  P7  full _stage2_expand_chain, synthetic, C=2^20
  P8  full generate_candidates_device, real 2227-seq corpus wave
  P9  same, 512-query wave, cap 2^23     (the crashing config of r2)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mark(name, t0, extra=''):
    print('PROBE-OK %s %.1fs %s' % (name, time.time() - t0, extra),
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    print('backend: %s' % jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)

    # P1/P2: x64 sort
    with jax.enable_x64(True):
        for name, n in (('P1-sort-2^20', 1 << 20), ('P2-sort-2^23', 1 << 23)):
            t0 = time.time()
            keys = rng.integers(0, 1 << 61, n, dtype=np.int64)
            out = jnp.sort(jnp.asarray(keys))
            chk = int(np.asarray(out[::n // 16]).sum())
            mark(name, t0, 'chk=%d' % chk)

        # P3: argsort + take (what _stage2 actually does)
        t0 = time.time()
        n = 1 << 23
        keys = jnp.asarray(rng.integers(0, 1 << 61, n, dtype=np.int64))

        @jax.jit
        def argsort_take(k):
            o = jnp.argsort(k)
            return jnp.take(k, o)

        out = argsort_take(keys)
        chk = int(np.asarray(out[::n // 16]).sum())
        mark('P3-argsort-2^23', t0, 'chk=%d' % chk)

    # P4: u32 double-word sort (no x64): sort by hi then stable by lo
    t0 = time.time()
    n = 1 << 23
    hi = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))

    @jax.jit
    def sort2(hi, lo):
        o1 = jnp.argsort(lo, stable=True)
        h1, l1 = jnp.take(hi, o1), jnp.take(lo, o1)
        o2 = jnp.argsort(h1, stable=True)
        return jnp.take(h1, o2), jnp.take(l1, o2)

    h, l = sort2(hi, lo)
    chk = int(np.asarray(h[::n // 16]).sum()) + int(np.asarray(l[0]))
    mark('P4-u32x2-sort-2^23', t0, 'chk=%d' % chk)

    # P5: scatter min/max group bounds at capacity
    with jax.enable_x64(True):
        t0 = time.time()
        C = 1 << 23
        gid = jnp.asarray(rng.integers(0, C // 4, C, dtype=np.int64))

        @jax.jit
        def bounds(gid):
            idx = jnp.arange(C, dtype=jnp.int32)
            gs = jnp.full((C,), C, jnp.int32).at[gid].min(idx)
            ge = jnp.zeros((C,), jnp.int32).at[gid].max(idx + 1)
            return gs, ge

        gs, ge = bounds(gid)
        chk = int(np.asarray(gs[::C // 16]).sum()) + int(np.asarray(ge[0]))
        mark('P5-scatter-bounds-2^23', t0, 'chk=%d' % chk)

    # P6: the lockstep while_loop walker on synthetic groups
    t0 = time.time()
    from swiftortho_tpu.search.candidates_device import _walk, _b62_flat
    G, W, L = 2048, 513, 512
    qtok = jnp.asarray(rng.integers(65, 90, G * L, dtype=np.int32))
    dbtok = jnp.asarray(rng.integers(65, 90, G * L, dtype=np.uint8))
    b62 = jnp.asarray(_b62_flat())

    @jax.jit
    def walk_many(qtok, dbtok, b62):
        qrow = jnp.arange(G, dtype=jnp.int32) % 8
        zero = jnp.zeros(G, jnp.int32)
        best, bt = _walk(qtok, dbtok, b62, L, W, qrow,
                         jnp.zeros(G, jnp.int64), zero, zero, 1, zero,
                         zero - 1, zero - 1,
                         jnp.full(G, L, jnp.int32), jnp.full(G, L, jnp.int32))
        return best.sum() + bt.sum()

    chk = int(np.asarray(walk_many(qtok, dbtok, b62)))
    mark('P6-walk-2048xW513', t0, 'chk=%d' % chk)

    # P7-P9: the real engine on a real corpus
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
    td = tempfile.mkdtemp(prefix='probe_cand_')
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

    for name, nq, cap in (('P7-realwave-128q', 128, 1 << 20),
                          ('P8-realwave-512q', 512, 1 << 23),
                          ('P9-realwave-2048q', 2048, 1 << 23)):
        t0 = time.time()
        os.environ['SWIFTORTHO_DEVICE_CAND_CAP'] = str(cap)
        idx = np.arange(min(nq, len(db)), dtype=np.int64)
        toks, lens = db.padded_batch(idx, pad)
        toks = seg_batch_vec(toks, lens)
        cand = generate_candidates_device(toks, lens, db, index,
                                          ['aa9'], cfg.seeds)
        host = generate_candidates(toks, lens, db, index, ['aa9'],
                                   cfg.seeds)
        same = all(np.array_equal(getattr(cand, f), getattr(host, f))
                   for f in ('qrow', 'subject', 'score', 'band_q',
                             'band_s'))
        mark(name, t0, 'n=%d parity=%s' % (len(cand.qrow), same))

    print('ALL PROBES PASSED', flush=True)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""End-to-end scale measurement (VERDICT r3 item 2): synthesize an
N-proteome corpus, run the full search -> orth -> MCL pipeline on the
real chip, and report stage walls + pairs/s + the phase-A share.

Usage:  nohup python tools/run_scale.py --taxa 25 --families 4000 \
            > /tmp/run_scale.log 2>&1 &
The structured [swiftortho] log lines carry the per-wave / per-phase
decomposition; this script summarizes them at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--taxa', type=int, default=25)
    ap.add_argument('--families', type=int, default=4000)
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--min-len', type=int, default=80)
    ap.add_argument('--max-len', type=int, default=600,
                    help='r2 scale methodology used 400 (the BASELINE '
                         '79.5M pairs/s corpus is --taxa 60 '
                         '--families 4100 --max-len 400 -> 252608 '
                         'seqs); 600 makes a ~2x harder phase A')
    ap.add_argument('--nc', type=int, default=1 << 24,
                    help='hash bucket count (r2 scale methodology: 2^24; '
                         'the 120M reference default costs ~34 s/chunk of '
                         'index build and cache-hostile bucket walks at '
                         'this corpus size)')
    ap.add_argument('--workdir', default='')
    ap.add_argument('--skip-downstream', action='store_true')
    args = ap.parse_args()

    import tempfile

    from swiftortho_tpu.config import ClusterConfig, OrthConfig, \
        SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.utils import log_event

    td = args.workdir or tempfile.mkdtemp(prefix='run_scale_')
    os.makedirs(td, exist_ok=True)
    fsa = os.path.join(td, 'c.fsa')
    t0 = time.time()
    if not os.path.exists(fsa):
        write_corpus(fsa, make_corpus(n_taxa=args.taxa,
                                      n_families=args.families,
                                      seed=args.seed,
                                      min_len=args.min_len,
                                      max_len=args.max_len))
    db = SeqDB.from_path(fsa)
    n = len(db)
    print('corpus: %d seqs (%d taxa x %d families) %.1fs  dir=%s'
          % (n, args.taxa, args.families, time.time() - t0, td),
          flush=True)

    import jax
    print('backend: %s' % jax.default_backend(), flush=True)

    # absorb the per-process tunnel warm (first host fetch of a session
    # costs 40-600 s, unrelated to the pipeline) BEFORE timing: a
    # throwaway on-device op + fetch, logged so runs are comparable
    t0 = time.time()
    import jax.numpy as jnp
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros(8, jnp.int32)))
    warm_s = time.time() - t0
    print('tunnel warm: %.1fs' % warm_s, flush=True)
    log_event('run_scale_warm', seconds=round(warm_s, 1))

    from swiftortho_tpu.search.blastp import blastp_to_file
    cfg = SearchConfig(expect=1e-5, nc=args.nc)
    sc = os.path.join(td, 'c.sc')
    t0 = time.time()
    blastp_to_file(fsa, fsa, sc, cfg)
    t_search = time.time() - t0
    pairs = float(n) * n
    nrows = sum(1 for _ in open(sc))
    print('SEARCH: %.1fs  %.2fM pairs/s  %d hit rows'
          % (t_search, pairs / t_search / 1e6, nrows), flush=True)
    log_event('run_scale_search', seconds=round(t_search, 1),
              pairs_per_s=round(pairs / t_search), rows=nrows)

    if args.skip_downstream:
        print('DONE', flush=True)
        return

    from swiftortho_tpu.orth.inference import find_orth_blocks
    opc = os.path.join(td, 'c.opc')
    t0 = time.time()
    with open(sc) as fh, open(opc, 'w') as out:
        for block in find_orth_blocks(fh, OrthConfig()):
            out.write(block)
    t_orth = time.time() - t0
    nedges = sum(1 for _ in open(opc))
    print('ORTH: %.1fs  %d edges' % (t_orth, nedges), flush=True)

    from swiftortho_tpu.cluster.driver import find_cluster_stream
    clsr = os.path.join(td, 'c.clsr')
    t0 = time.time()
    with open(opc) as fh, open(clsr, 'w') as out:
        for line in find_cluster_stream(
                fh, ClusterConfig(algorithm='mcl', inflation=1.5)):
            out.write(line)
    t_mcl = time.time() - t0
    ngroups = sum(1 for _ in open(clsr))
    print('MCL: %.1fs  %d groups' % (t_mcl, ngroups), flush=True)

    # cluster purity vs the known families
    # family lives in the fasta *description* ("tax0|g0000 fam000",
    # corpus.py:76), not in the gene id
    fam_of = {}
    from swiftortho_tpu.io_fasta import iter_fasta
    with open(fsa) as fh:
        for head, _ in iter_fasta(fh):
            parts = head.split()
            fam_of[parts[0]] = parts[1] if len(parts) > 1 else '?'
    pure = clustered = 0
    for line in open(clsr):
        genes = line.rstrip('\n').split('\t')
        fams = {fam_of.get(g, '?') for g in genes}
        clustered += len(genes)
        pure += len(fams) == 1
    print('purity: %d/%d groups single-family, %d/%d genes clustered'
          % (pure, ngroups, clustered, n), flush=True)
    print('TOTAL: %.1f min (search %.1fs orth %.1fs mcl %.1fs)'
          % ((t_search + t_orth + t_mcl) / 60, t_search, t_orth,
             t_mcl), flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

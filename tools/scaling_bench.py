#!/usr/bin/env python
"""Fleet scaling-efficiency harness (VERDICT r2 item 4).

Measures the rank-split fleet search (parallel.distributed) at 1/2/4
processes on one corpus and prints a table of wall time, output pairs/s,
and scaling efficiency vs the 1-rank run — the BASELINE.md north star is
>=80% at small fleet sizes.

Ranks run single-device with 1 native thread each (a model of a fleet of
1-chip hosts on this 4-core box: what divides across ranks is the HOST
pipeline, the measured critical path at scale).  The chunk index is
prebuilt once and shared via disk (the reference's formatdb artifact), so
per-rank replicated work is an npz load.

Usage: python tools/scaling_bench.py [--fsa path] [--seqs 2000]
       [--procs 1,2,4]
Writes nothing; prints one table + one JSON line.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys, time
    tproc = time.time()
    pid, nproc, port, fsa, out, dbprefix = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], sys.argv[6])
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.parallel.distributed import (fleet_search_to_file,
                                                     init_distributed)
    init_distributed('127.0.0.1:%d' % port, nproc, pid)
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=262144, query_batch=16)
    import resource
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.time()
    fleet_search_to_file(db, db, cfg, out, db_prefix=dbprefix)
    t1 = time.time()
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    print('RANKTIME %d %f' % (pid, t1 - t0), flush=True)
    print('RANKINIT %d %f' % (pid, t0 - tproc), flush=True)
    print('RANKCPU %d %f %f' % (pid,
          (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime),
          t1 - t0), flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def run_fleet(nproc, fsa, out, dbprefix, workdir):
    worker = os.path.join(workdir, 'worker.py')
    with open(worker, 'w') as fh:
        fh.write(WORKER)
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=1'
                        ).strip()
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    env['SWNATIVE_THREADS'] = '1'
    env['SWIFTORTHO_PRODUCERS'] = '1'
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(nproc), str(port), fsa,
         out, dbprefix], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE) for pid in range(nproc)]
    times = {}
    phases = {}
    for p in procs:
        sout, serr = p.communicate(timeout=3600)
        assert p.returncode == 0, serr[-2000:]
        for line in sout.decode().splitlines():
            if line.startswith('RANKTIME'):
                _, pid, dt = line.split()
                times[int(pid)] = float(dt)
            elif line.startswith('RANKINIT'):
                _, pid, dt = line.split()
                phases.setdefault(int(pid), {})['init_s'] = float(dt)
            elif line.startswith('RANKCPU'):
                _, pid, cpu, wall = line.split()
                phases.setdefault(int(pid), {})['cpu_s'] = float(cpu)
        # per-rank phase decomposition from the structured log
        for line in serr.decode().splitlines():
            if not line.startswith('[swiftortho] '):
                continue
            rec = json.loads(line[len('[swiftortho] '):])
            if rec.get('stage') == 'fleet_rank_phases':
                d = phases.setdefault(rec['rank'], {})
                for k in ('search_s', 'barrier_s', 'merge_s'):
                    d[k] = rec[k]
    for pid in sorted(phases):
        d = phases[pid]
        print('    rank %d: init %.2f  search %.2f  barrier %.2f  '
              'merge %.2f  cpu %.2f' % (pid, d.get('init_s', 0),
                                        d.get('search_s', 0),
                                        d.get('barrier_s', 0),
                                        d.get('merge_s', 0),
                                        d.get('cpu_s', 0)))
    return max(times.values())


def main():
    sys.path.insert(0, REPO)
    import jax
    jax.config.update('jax_platforms', 'cpu')   # index build is host work
    ap = argparse.ArgumentParser()
    ap.add_argument('--fsa', default='')
    ap.add_argument('--seqs', type=int, default=2000)
    ap.add_argument('--procs', default='1,2,4')
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix='swortho_scale_')
    fsa = args.fsa
    if not fsa:
        from swiftortho_tpu.corpus import make_corpus, write_corpus
        fsa = os.path.join(workdir, 'scale.fsa')
        n_fam = max(1, args.seqs // 10)
        write_corpus(fsa, make_corpus(n_taxa=10, n_families=n_fam, seed=7,
                                      min_len=120, max_len=240))
    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.search.blastp import make_db
    cfg = SearchConfig(expect=1e-5, nc=262144, query_batch=16)
    make_db(SeqDB.from_path(fsa), cfg, out_prefix=fsa)

    results = []
    base_t = None
    base_rows = None
    for nproc in [int(x) for x in args.procs.split(',')]:
        out = os.path.join(workdir, 'out_%d.sc' % nproc)
        t = run_fleet(nproc, fsa, out, fsa, workdir)
        nrows = sum(1 for _ in open(out))
        if base_t is None:
            base_t, base_rows = t, nrows
        assert nrows == base_rows, (nproc, nrows, base_rows)
        eff = base_t / (t * nproc)
        results.append({'procs': nproc, 'seconds': round(t, 2),
                        'rows_per_s': round(nrows / t, 1),
                        'efficiency': round(eff, 3)})
        print('procs=%d  wall=%.2fs  rows/s=%.1f  efficiency=%.1f%%'
              % (nproc, t, nrows / t, 100 * eff), flush=True)
    print(json.dumps({'metric': 'fleet_scaling', 'fsa': fsa,
                      'results': results}))


if __name__ == '__main__':
    main()

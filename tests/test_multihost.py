"""Multi-host scale-out: two local processes with 4 CPU devices each.

Round-3 architecture (VERDICT r2 item 1): fleet ranks DIVIDE the work —
each rank searches its contiguous 1/N query slice (the reference's -l/-u
worker fan-out, bin/find_hit.py:107-151) over its LOCAL devices, and
rank 0 concatenates the parts in rank order.  These tests assert:

- the merged output is byte-identical to the single-process
  blastp_stream over the full range (including misaligned wave
  boundaries: the corpus size is odd with respect to query_batch);
- each rank really ran ~half the waves (search_wave log counts) over
  half the query range (fleet_rank_range log events);
- the lockstep global-mesh SPMD step still works across hosts
  (demo_multichip over the 2x4 global mesh);
- 2-rank fleet search wall time < 0.7x the 1-rank time on the same
  corpus (the scaling-efficiency regression, VERDICT r2 item 4).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys, time
    pid, nproc, port, fsa, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                     int(sys.argv[3]), sys.argv[4],
                                     sys.argv[5])
    dbprefix = sys.argv[6] if len(sys.argv) > 6 else ''
    ndev = int(sys.argv[7]) if len(sys.argv) > 7 else 4
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    from swiftortho_tpu.parallel.distributed import (fleet_search_to_file,
                                                     global_mesh,
                                                     init_distributed)
    init_distributed('127.0.0.1:%d' % port, nproc, pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == ndev
    assert jax.device_count() == ndev * nproc

    if nproc > 1 and ndev > 1:
        # the lockstep SPMD step, unchanged, over the 2-host global mesh
        from swiftortho_tpu.parallel.mesh import demo_multichip
        mesh = global_mesh()
        assert mesh.devices.shape == (nproc, ndev)
        masked, bits, merged = demo_multichip(mesh=mesh)
        np.save('%s/merged_%d.npy' % (outdir, pid), merged)

    # the production fleet path: rank-split ranges + rank-0 ordered merge
    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.io_fasta import SeqDB
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=262144, chunk=12, query_batch=4)
    t0 = time.time()
    fleet_search_to_file(db, db, cfg, '%s/merged_%d.sc' % (outdir, nproc),
                         db_prefix=dbprefix)
    dt = time.time() - t0
    with open('%s/time_%d_%d.txt' % (outdir, nproc, pid), 'w') as fh:
        fh.write('%f' % dt)
    print('worker %d/%d done in %.2fs' % (pid, nproc, dt), flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run_fleet(tmp_path, fsa, nproc, dbprefix='', threads='1', ndev=4):
    """Launch an nproc fleet; returns per-rank combined stdout+stderr."""
    worker = tmp_path / 'worker.py'
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=%d'
                        % ndev).strip()
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    # fair scaling on one box: cap per-rank native threads so ranks
    # parallelize over cores instead of each grabbing every core
    env['SWNATIVE_THREADS'] = threads
    env['SWIFTORTHO_PRODUCERS'] = '1'
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(nproc), str(port),
         fsa, str(tmp_path), dbprefix, str(ndev)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors='replace'))
    assert all(p.returncode == 0 for p in procs), '\n'.join(outs)
    return outs


def _events(out: str, stage: str):
    evs = []
    for line in out.splitlines():
        if line.startswith('[swiftortho] {'):
            rec = json.loads(line[len('[swiftortho] '):])
            if rec.get('stage') == stage:
                evs.append(rec)
    return evs


def test_two_process_fleet_divides_work_and_matches_single(tmp_path):
    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.search.blastp import blastp_stream

    # 18 sequences with query_batch=4: rank 1 starts at query 9, so its
    # wave boundaries (9,13,17) differ from the single-process run's
    # (8,12,16) — byte-identity proves per-query output is
    # wave-boundary invariant
    fsa = str(tmp_path / 'mini.fsa')
    write_corpus(fsa, make_corpus(n_taxa=2, n_families=9, seed=5,
                                  min_len=60, max_len=120))
    outs = _run_fleet(tmp_path, fsa, nproc=2)

    # lockstep SPMD step outputs agree across ranks
    m0 = np.load(tmp_path / 'merged_0.npy')
    m1 = np.load(tmp_path / 'merged_1.npy')
    assert np.array_equal(m0, m1)

    # each rank took half the query range...
    ranges = [_events(o, 'fleet_rank_range') for o in outs]
    assert [r[0]['q_lo'] for r in ranges] == [0, 9] or \
        [r[0]['q_lo'] for r in ranges] == [9, 0]
    spans = sorted((r[0]['q_lo'], r[0]['q_hi']) for r in ranges)
    assert spans == [(0, 9), (9, 18)]
    # ...and really ran only its own waves (~half each, not replicated)
    wave_counts = sorted(len(_events(o, 'search_wave')) for o in outs)
    assert wave_counts == [3, 3], wave_counts     # ceil(9/4) per rank

    # merged output byte-identical to the single-process run
    merged = (tmp_path / 'merged_2.sc').read_text()
    db = SeqDB.from_path(fsa)
    cfg = SearchConfig(expect=1e-5, nc=262144, chunk=12, query_batch=4)
    ref = ''.join(blastp_stream(db, db, cfg))
    assert merged == ref and merged
    # parts were cleaned up after the merge
    assert not list(tmp_path.glob('merged_2.sc.part*'))


def _run_all_fleet(tmp_path, fsa, nproc, extra=()):
    """Launch an nproc run_all CLI fleet via the SWIFTORTHO_COORD env
    bootstrap (what a real multi-host launch uses)."""
    port = _free_port()
    base = dict(os.environ, JAX_PLATFORMS='cpu', SWIFTORTHO_PLATFORM='cpu',
                SWNATIVE_THREADS='1', SWIFTORTHO_PRODUCERS='1',
                PYTHONPATH=REPO)
    procs = []
    for pid in range(nproc):
        env = dict(base)
        if nproc > 1:
            env.update(SWIFTORTHO_COORD='127.0.0.1:%d' % port,
                       SWIFTORTHO_NPROCS=str(nproc),
                       SWIFTORTHO_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, '-m', 'swiftortho_tpu.cli.run_all',
             '-i', fsa, '-M', '262144', '-y', '0'] + list(extra),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=600)[0].decode(errors='replace')
            for p in procs]
    assert all(p.returncode == 0 for p in procs), '\n'.join(outs)
    return outs


def test_run_all_fleet_matches_single(tmp_path):
    """The full run_all CLI in a 2-rank fleet: both the plain branch
    (rank-0 shared index build, regression: every rank used to rebuild
    all chunks) and the -z fast branch (regression: every rank used to
    write the shared nr/sc files concurrently — corruption) must emit
    the exact single-process outputs."""
    import shutil
    from swiftortho_tpu.corpus import make_corpus, write_corpus

    corpus = make_corpus(n_taxa=2, n_families=6, seed=11,
                         min_len=60, max_len=120)
    single = str(tmp_path / 's.fsa')
    write_corpus(single, corpus)
    want = {}
    for name, extra in (('plain', []), ('fast', ['-z', 'fast'])):
        _run_all_fleet(tmp_path, single, nproc=1, extra=extra)
        want[name] = open('%s_results/s.fsa.sc' % single).read()
        assert want[name]

    for name, extra in (('plain', []), ('fast', ['-z', 'fast'])):
        fas = str(tmp_path / ('%s.fsa' % name))
        shutil.copy(single, fas)
        _run_all_fleet(tmp_path, fas, nproc=2, extra=extra)
        got = open('%s_results/%s.fsa.sc' % (fas, name)).read()
        assert got == want[name], name
        # final pipeline artifacts exist (rank 0 ran the tail stages)
        for sfx in ('.opc', '.clsr', '.pan'):
            p = '%s_results/%s.fsa%s' % (fas, name, sfx)
            assert os.path.getsize(p) > 0, (name, sfx)
    # the plain fleet reused a rank-0-built shared index
    import glob
    assert glob.glob('%s_results/plain.fsa.fleetdb.*.npz'
                     % (str(tmp_path / 'plain.fsa')))


def test_fleet_scaling_efficiency(tmp_path):
    """2-rank fleet wall time < 0.7x 1-rank on the same corpus (both
    measured in-worker, same startup costs, shared prebuilt disk index,
    1 native thread per rank so ranks scale over cores).  Ranks run
    single-device (a fleet of 1-chip hosts): what divides across ranks
    is the HOST pipeline — the critical path at scale (BASELINE.md) —
    and per-rank jit compiles would otherwise swamp this small corpus."""
    from swiftortho_tpu.config import SearchConfig
    from swiftortho_tpu.corpus import make_corpus, write_corpus
    from swiftortho_tpu.io_fasta import SeqDB
    from swiftortho_tpu.search.blastp import make_db

    fsa = str(tmp_path / 'scale.fsa')
    write_corpus(fsa, make_corpus(n_taxa=10, n_families=200, seed=7,
                                  min_len=120, max_len=240))
    cfg = SearchConfig(expect=1e-5, nc=262144, query_batch=4)
    make_db(SeqDB.from_path(fsa), cfg, out_prefix=fsa)

    def measure():
        _run_fleet(tmp_path, fsa, nproc=1, dbprefix=fsa, ndev=1)
        t1 = float((tmp_path / 'time_1_0.txt').read_text())
        _run_fleet(tmp_path, fsa, nproc=2, dbprefix=fsa, ndev=1)
        t2 = max(float((tmp_path / ('time_2_%d.txt' % pid)).read_text())
                 for pid in range(2))
        _run_fleet(tmp_path, fsa, nproc=4, dbprefix=fsa, ndev=1)
        t4 = max(float((tmp_path / ('time_4_%d.txt' % pid)).read_text())
                 for pid in range(4))
        return t1, t2, t4

    t1, t2, t4 = measure()
    # byte-identity between the fleet sizes, for free
    assert (tmp_path / 'merged_2.sc').read_text() == \
        (tmp_path / 'merged_1.sc').read_text() != ''
    assert (tmp_path / 'merged_4.sc').read_text() == \
        (tmp_path / 'merged_1.sc').read_text()
    if not (t2 < 0.7 * t1 and t4 < 0.5 * t1):
        # wall-clock gate: one retry absorbs transient host load (the
        # measured idle-box ratios are 0.55 at 2 ranks and 0.34 at 4
        # ranks — tools/scaling_bench.py r4 — so a clean rerun passes)
        t1, t2, t4 = measure()
    assert t2 < 0.7 * t1, (t1, t2)
    # 4 ranks saturate this 4-core box (per-rank cpu ~= wall, merge ~0,
    # BASELINE.md r4 profile); 0.5x pins >=50% efficiency with CI slack
    # under the measured 73.5%
    assert t4 < 0.5 * t1, (t1, t4)

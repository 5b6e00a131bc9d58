"""Multi-host scale-out: rank-split query ranges + ordered part merge.

The reference scales past one machine by fanning INDEPENDENT find_hit
workers over contiguous query ranges and concatenating their outputs in
range order (bin/find_hit.py:107-151: each mp.Pool worker gets one
``-l/-u`` slice; :135-146 writes the parts back in order).  Query
data-parallelism needs no communication, so the TPU-native mapping keeps
that shape on top of jax.distributed processes:

- every rank loads the same inputs and takes its contiguous 1/N slice of
  the query range (``rank_query_range``) — host phase A/B work (seeding,
  candidate generation, ranking, policy, formatting) is 1/N per rank,
  not replicated (BASELINE.md: phase A is the critical path at >=100k
  sequences, so this is where fleet scaling is won);
- within a rank, device pair batches shard over the rank's LOCAL devices
  only (parallel.mesh) — per-wave collectives ride ICI and never cross
  hosts (ranks run different wave schedules, so cross-host lockstep
  collectives are impossible by construction, not just slow);
- the merged hit table is the rank-ordered concatenation of per-rank
  outputs (``fleet_search_to_file``), byte-identical to the
  single-process ``blastp_stream`` over the full range: rows are emitted
  in query order and per-query output is wave-boundary invariant
  (enforced by tests/test_multihost.py).

The only cross-rank communication is a barrier before the rank-0 merge.
A shared prebuilt chunk index (``-D`` / ``db_prefix``, the reference's
formatdb artifact) keeps the per-rank replicated work to an npz load.

On a real TPU pod ``init_distributed()`` auto-detects everything from
the environment; on a CPU fleet (and in the 2-process regression test)
the coordinator/process identity comes from arguments or
SWIFTORTHO_COORD / SWIFTORTHO_NPROCS / SWIFTORTHO_PROC_ID.
"""

from __future__ import annotations

import os
from contextlib import nullcontext
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

from .mesh import make_mesh, use_search_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax's distributed runtime if configured; returns True
    when this process is part of a multi-process fleet.

    Argument-free on TPU pods (auto-detected); otherwise reads
    SWIFTORTHO_COORD (host:port), SWIFTORTHO_NPROCS, SWIFTORTHO_PROC_ID.
    No-op (returns False) when neither arguments nor env are present.
    """
    coord = coordinator_address or os.environ.get('SWIFTORTHO_COORD')
    nproc = num_processes if num_processes is not None else \
        int(os.environ.get('SWIFTORTHO_NPROCS', '0')) or None
    pid = process_id if process_id is not None else \
        (int(os.environ['SWIFTORTHO_PROC_ID'])
         if 'SWIFTORTHO_PROC_ID' in os.environ else None)
    if coord is None and nproc is None:
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return jax.process_count() > 1


def rank_query_range(q_start: int, q_end: int, nproc: int,
                     pid: int) -> tuple:
    """Rank ``pid``'s contiguous query slice [lo, hi) of the global
    range [q_start, q_end) — the reference's per-worker ``-l/-u``
    assignment (bin/find_hit.py:107-127), balanced to within one query.
    """
    total = max(0, q_end - q_start)
    lo = q_start + (total * pid) // nproc
    hi = q_start + (total * (pid + 1)) // nproc
    return lo, hi


def global_mesh(n_db: Optional[int] = None) -> Mesh:
    """('data', 'db') mesh over every device of every process,
    process-major: 'data' crosses hosts (DCN), 'db' stays local (ICI).

    Used by the lockstep SPMD demos/dryrun (sharded_search_step) — the
    production fleet search shards only over LOCAL devices, because
    rank-split query ranges give each rank its own wave schedule.

    n_db defaults to the per-process device count, i.e. one 'data' row
    per host; it must divide the local device count so no 'db' group
    straddles a host boundary.
    """
    local = jax.local_device_count()
    if n_db is None:
        n_db = local
    assert local % n_db == 0, (local, n_db)
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    dev = np.asarray(devs).reshape(-1, n_db)
    return Mesh(dev, axis_names=('data', 'db'))


def is_multiprocess(mesh: Mesh) -> bool:
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def host_to_global(sharding, arr: np.ndarray):
    """Build a globally-sharded jax.Array from a host array every process
    holds in full (used by the lockstep SPMD demo/dryrun paths, where
    each process computed the identical array)."""
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def local_search_mesh(n_db: Optional[int] = None) -> Mesh:
    """('data', 'db') mesh over THIS rank's local devices only — the
    per-rank device parallelism inside the fleet's query-range split."""
    return make_mesh(n_db=n_db or 1, devices=jax.local_devices())


def search_mesh_context(n_db: Optional[int] = None):
    """Context manager the CLIs wrap their search in: shard device pair
    batches over this process's LOCAL devices when it is part of a fleet
    (init_distributed succeeded) or SWIFTORTHO_MESH=1 asks for local
    multi-device sharding; no-op on a single-device run.

    Fleet ranks never share a search mesh: cross-host parallelism comes
    from the query-range split (each rank has its own wave schedule), so
    per-wave collectives must stay within a host.
    """
    want = (jax.process_count() > 1
            or os.environ.get('SWIFTORTHO_MESH', '') not in ('', '0'))
    if want and jax.local_device_count() > 1:
        return use_search_mesh(local_search_mesh(n_db=n_db))
    return nullcontext()


def resolve_query_range(qry, ref, q_start: int, q_end: int) -> tuple:
    """The reference's range defaulting (fsearch.py:2980-2981): the end
    defaults to the REFERENCE-set size clamped to the query count."""
    nq, D = len(qry), len(ref)
    q_start = min(max(0, q_start), nq)
    q_end = min(D, nq) if q_end < 0 else min(q_end, nq)
    return q_start, q_end


def blastp_distributed(qry, ref, cfg, n_db: Optional[int] = None,
                       q_start: int = 0, q_end: int = -1,
                       indexes=None, spill_dir: Optional[str] = None):
    """This rank's share of the all-vs-all search (true P1): the global
    query range splits into process_count contiguous slices — 1/N of the
    host candidate/policy pipeline per rank, the reference's ``-l/-u``
    fan-out (bin/find_hit.py:107-151) — and each rank's device batches
    shard over its LOCAL devices only.

    Yields THIS RANK'S m8 rows (queries [lo, hi) in query order).  The
    full table is the rank-ordered concatenation of every rank's rows
    (``fleet_search_to_file``), byte-identical to the single-process
    ``blastp_stream`` over the full range.
    """
    from ..search.blastp import blastp_stream

    q_start, q_end = resolve_query_range(qry, ref, q_start, q_end)
    lo, hi = rank_query_range(q_start, q_end, jax.process_count(),
                              jax.process_index())
    from ..utils import log_event
    log_event('fleet_rank_range', rank=jax.process_index(),
              nproc=jax.process_count(), q_lo=lo, q_hi=hi)
    ctx = (use_search_mesh(local_search_mesh(n_db=n_db))
           if jax.local_device_count() > 1 else nullcontext())
    with ctx:
        yield from blastp_stream(qry, ref, cfg, indexes=indexes,
                                 q_start=lo, q_end=hi,
                                 spill_dir=spill_dir)


def barrier(name: str):
    """Cross-rank barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def fleet_search_to_file(qry, ref, cfg, out: str,
                         q_start: int = 0, q_end: int = -1,
                         db_prefix: str = '', append: bool = False,
                         spill_dir: Optional[str] = None,
                         r_start: int = 0, r_end: int = -1) -> str:
    """Fleet all-vs-all search into one output file: every rank writes
    its slice to ``out.partNNNNN``, a barrier, then rank 0 concatenates
    the parts in rank order and removes them — the reference's ordered
    write-back of per-range worker outputs (bin/find_hit.py:135-146).

    Returns ``out``.  The merged file is byte-identical to a
    single-process blastp_to_file over the same range.
    """
    pid, nproc = jax.process_index(), jax.process_count()
    from ..search.blastp import IndexSource

    if db_prefix:
        indexes = IndexSource.from_disk(db_prefix)
    elif r_start > 0 or r_end >= 0:
        indexes = IndexSource.from_build(ref, cfg, r_start=r_start,
                                         r_end=r_end)
    else:
        indexes = None
    from time import time as _now

    from ..utils import log_event
    t0 = _now()
    part = '%s.part%05d' % (out, pid)
    with open(part, 'w') as fh:
        buf = []
        for row in blastp_distributed(qry, ref, cfg, q_start=q_start,
                                      q_end=q_end, indexes=indexes,
                                      spill_dir=spill_dir):
            buf.append(row)
            if len(buf) >= 10000:
                fh.write(''.join(buf))
                buf = []
        fh.write(''.join(buf))
    t1 = _now()
    barrier('swiftortho_fleet_parts')
    t2 = _now()
    if pid == 0:
        import shutil
        with open(out, 'ab' if append else 'wb') as dst:
            for r in range(nproc):
                p = '%s.part%05d' % (out, r)
                with open(p, 'rb') as src:
                    shutil.copyfileobj(src, dst)
                os.remove(p)
    t3 = _now()
    barrier('swiftortho_fleet_merge')
    # per-rank wall decomposition (VERDICT r3 item 6): search includes
    # this rank's index loads + host pipeline + device waits; barrier_s
    # is straggler skew (time blocked waiting for slower ranks)
    log_event('fleet_rank_phases', rank=pid, nproc=nproc,
              search_s=round(t1 - t0, 3), barrier_s=round(t2 - t1, 3),
              merge_s=round(t3 - t2, 3),
              total_s=round(_now() - t0, 3))
    return out

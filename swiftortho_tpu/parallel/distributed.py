"""Multi-host scale-out: jax.distributed-aware mesh construction.

The reference scales past one machine by running independent find_hit
processes over sequence ranges and sort-merging their hit tables
(bin/find_hit.py:107-151, :286-351 + the >4.2 GB DB split).  The TPU
analog is SPMD over a global device mesh: every host runs the SAME
pipeline in lockstep, device arrays are globally sharded, and XLA's
collectives do the merge — over ICI within a slice and DCN across
hosts/slices.

Layout: the global ('data', 'db') mesh is built process-major, so the
outer 'data' axis (query parallelism, no intra-step communication) spans
hosts over DCN while the inner 'db' axis (per-wave hit merge via
all-gather) stays inside each host's devices — the cheap collective
rides the fast interconnect, per the scaling-book recipe.

On a real TPU pod `init_distributed()` auto-detects everything from the
environment; on a CPU fleet (and in the 2-process regression test) the
coordinator/process identity comes from arguments or SWIFTORTHO_COORD /
SWIFTORTHO_NPROCS / SWIFTORTHO_PROC_ID.
"""

from __future__ import annotations

import os
from contextlib import nullcontext
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

from .mesh import use_search_mesh


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


def global_mesh(n_db: Optional[int] = None) -> Mesh:
    """('data', 'db') mesh over every device of every process,
    process-major: 'data' crosses hosts (DCN), 'db' stays local (ICI).

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
    holds in full (the pipeline's host stages run replicated, so each
    process already computed the identical array)."""
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def search_mesh_context(n_db: Optional[int] = None):
    """Context manager the CLIs wrap their search in: activates the
    global ('data','db') mesh when this process is part of a fleet
    (init_distributed succeeded) or SWIFTORTHO_MESH=1 asks for local
    multi-device sharding; no-op on a plain single-device run."""
    multi = jax.process_count() > 1
    want_local = (os.environ.get('SWIFTORTHO_MESH', '') not in ('', '0')
                  and jax.local_device_count() > 1)
    if multi or want_local:
        return use_search_mesh(global_mesh(n_db=n_db))
    return nullcontext()


def blastp_distributed(qry, ref, cfg, n_db: Optional[int] = None,
                       q_start: int = 0, q_end: int = -1):
    """All-vs-all search over every host's devices: the host pipeline
    runs replicated on each process, device batches shard over the global
    mesh, and outputs replicate back — so the yielded m8 rows are
    identical on every process (and identical to the single-device run;
    enforced by tests/test_multihost.py)."""
    from ..search.blastp import blastp_stream

    mesh = global_mesh(n_db=n_db)
    with use_search_mesh(mesh):
        yield from blastp_stream(qry, ref, cfg, q_start=q_start,
                                 q_end=q_end)

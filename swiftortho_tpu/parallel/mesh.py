"""Multi-chip sharding for the search pipeline.

TPU-native mapping of the reference's parallelism (SURVEY.md 2.5):
- P1 (query data-parallelism; reference mp.Pool over 10k-query chunks,
  bin/find_hit.py:107-146) -> the 'data' mesh axis: query/pair batches
  sharded over devices, no communication inside a step.
- P2/P3 (reference DB chunk passes + sort-merge of per-part hit tables,
  find_hit.py:286-351) -> the 'db' mesh axis: each device holds one DB
  shard's candidates; per-query best-hit tables are merged with an
  all_gather over 'db' followed by a local top-k.

Collectives ride ICI via jax.sharding + jit; no NCCL/MPI analog needed.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.banded_sw import sw_align_batch
from ..ops.seg import seg_batch

# The active search mesh: when set (via use_search_mesh), the search
# pipeline's device batches (sw_align_auto) run pjit-sharded over it
# instead of single-device.  Module-global rather than threaded through
# every call because the mesh is a per-run execution property, not a
# per-batch argument (mirrors jax's own Mesh context manager design).
_ACTIVE_MESH: Mesh | None = None


def active_search_mesh() -> Mesh | None:
    return _ACTIVE_MESH


@contextmanager
def use_search_mesh(mesh: Mesh):
    """Run the search pipeline's device compute sharded over `mesh`."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def make_mesh(n_data: int | None = None, n_db: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_db
    assert n_data * n_db <= n, (n_data, n_db, n)
    dev = np.asarray(devices[:n_data * n_db]).reshape(n_data, n_db)
    return Mesh(dev, axis_names=('data', 'db'))


def sharded_align_fn(mesh: Mesh):
    """jit-compiled pair alignment with the pair axis sharded over
    ('data', 'db') — pure data parallelism, XLA partitions automatically."""
    pair_sharding = NamedSharding(mesh, P(('data', 'db'), None))
    vec_sharding = NamedSharding(mesh, P(('data', 'db')))

    fn = jax.jit(
        sw_align_batch.__wrapped__,
        static_argnames=('kbound', 'go', 'ge'),
        in_shardings=(pair_sharding, pair_sharding,
                      vec_sharding, vec_sharding),
        out_shardings=NamedSharding(mesh, P(('data', 'db'))),
    )
    return fn, pair_sharding, vec_sharding


_SHARDED_ALIGN_CACHE: dict = {}


def sw_align_sharded(mesh: Mesh, tok0, tok1, len0, len1) -> dict:
    """Batch alignment with the pair axis sharded over every mesh device
    (('data','db') flattened — pure data parallelism over pairs, the mesh
    analog of the reference's mp.Pool over per-range fsearch-c processes,
    bin/find_hit.py:127-132).

    Pads the batch to a pow2 multiple of the device count so repeat waves
    reuse compiled executables; results are exact (padding rows align
    empty suffixes and are dropped).
    """
    ndev = int(mesh.devices.size)
    B = tok0.shape[0]
    unit = ndev
    n = -(-B // unit)
    npow = 1
    while npow < n:
        npow *= 2
    padB = npow * unit
    if padB != B:
        tok0 = np.pad(np.asarray(tok0), ((0, padB - B), (0, 0)))
        tok1 = np.pad(np.asarray(tok1), ((0, padB - B), (0, 0)))
        len0 = np.pad(np.asarray(len0), (0, padB - B))
        len1 = np.pad(np.asarray(len1), (0, padB - B))

    multi = len({d.process_index for d in mesh.devices.flat}) > 1
    psh = NamedSharding(mesh, P(('data', 'db'), None))
    vsh = NamedSharding(mesh, P(('data', 'db')))
    key = (id(mesh), tok0.shape[1], tok1.shape[1])
    fn = _SHARDED_ALIGN_CACHE.get(key)
    if fn is None:
        # multi-process mesh: outputs replicate over every process (the
        # all-gather IS the reference's cross-worker hit-table merge,
        # find_hit.py:350) so the host-side policy stages — which run
        # replicated on every host — see the full result
        fn = jax.jit(sw_align_batch.__wrapped__,
                     static_argnames=('kbound', 'go', 'ge'),
                     in_shardings=(psh, psh, vsh, vsh),
                     out_shardings=NamedSharding(mesh, P()) if multi
                     else vsh)
        _SHARDED_ALIGN_CACHE[key] = fn
    args = (np.ascontiguousarray(tok0), np.ascontiguousarray(tok1),
            np.asarray(len0, np.int32), np.asarray(len1, np.int32))
    if jax.process_count() > 1:
        # a multi-process runtime refuses numpy inputs under non-trivial
        # shardings even on a local-devices mesh — build the jax.Arrays
        # explicitly (this host holds the full batch: the fleet's ranks
        # each run their own query slice with a LOCAL mesh)
        from .distributed import host_to_global
        args = (host_to_global(psh, args[0]), host_to_global(psh, args[1]),
                host_to_global(vsh, args[2]), host_to_global(vsh, args[3]))
    with mesh:
        out = fn(*args)
    return {k: np.asarray(v)[:B] for k, v in out.items()}


def sharded_search_step(mesh: Mesh, replicate_out: bool = False):
    """The full per-wave device step, sharded over a 2-D mesh:

    queries  (Bq, L)  sharded over 'data'   (replicated over 'db')
    pairs: per (data-shard query block, db shard) candidate pair batch
           (Bp, L) sharded over ('data', 'db')
    output: per-query top-v bit scores after an all-gather merge over 'db'
            (the reference's sort -m merge, find_hit.py:350).

    replicate_out: replicate every output over the whole mesh — required
    on a multi-process (multi-host) mesh, where a host can only read the
    shards it owns.

    Returns a jitted fn(q_tokens, q_lens, t0, t1, l0, l1, pair_query) ->
    (masked queries, per-pair bits, merged per-query best bit).
    """
    qsh = NamedSharding(mesh, P('data', None))
    qvec = NamedSharding(mesh, P('data'))
    psh = NamedSharding(mesh, P(('data', 'db'), None))
    pvec = NamedSharding(mesh, P(('data', 'db')))
    rep = NamedSharding(mesh, P())

    def step(q_tokens, q_lens, t0, t1, l0, l1, pair_query, nq: int):
        masked = seg_batch.__wrapped__(q_tokens, q_lens)
        best = sw_align_batch.__wrapped__(t0, t1, l0, l1)
        from ..constants import KA_GAPPED_LAMBDA, KA_GAPPED_LNK, LN2
        bits = jnp.trunc((KA_GAPPED_LAMBDA * best['score'].astype(jnp.float32)
                          - KA_GAPPED_LNK) / LN2).astype(jnp.int32)
        # per-query max bit via segment max over the (gathered) pair axis;
        # jit+sharding inserts the all-gather/reduce over 'db' and 'data'
        merged = jnp.full((nq,), -1, jnp.int32).at[pair_query].max(bits)
        return masked, bits, merged

    return jax.jit(
        step,
        static_argnums=(7,),
        in_shardings=(qsh, qvec, psh, psh, pvec, pvec, pvec),
        out_shardings=(rep, rep, rep) if replicate_out
        else (qsh, pvec, rep),
    )


def blastp_sharded(qry, ref, cfg, mesh: Mesh | None = None,
                   q_start: int = 0, q_end: int = -1):
    """All-vs-all search with the device compute sharded over `mesh` —
    the multi-chip analog of the reference's process fan-out + merge
    (bin/find_hit.py:107-151, :286-351).

    - Query waves' alignment batches run pjit-sharded with the pair axis
      over ('data','db') — every chip advances the same wave (P1).
    - Reference chunk indexes stream through candidate generation in
      chunk order (P2); per-wave candidate merge across chunks is the
      host-side analog of the all-gather (device-side candidates land
      with the device candidate path).
    - Output rows are byte-identical to the single-device
      ``blastp_stream`` (enforced by tests/test_parallel.py and the
      driver's ``dryrun_multichip``).

    Yields m8 rows in query order.
    """
    from ..search.blastp import blastp_stream

    mesh = mesh or make_mesh()
    with use_search_mesh(mesh):
        yield from blastp_stream(qry, ref, cfg,
                                 q_start=q_start, q_end=q_end)


def demo_multichip(n_queries: int = 16, pad: int = 64,
                   mesh: Mesh | None = None):
    """Build tiny inputs and run one sharded step (used by the driver's
    multi-chip dry-run and by tests)."""
    mesh = mesh or make_mesh()
    ndev = int(np.prod(mesh.devices.shape))
    nq = max(n_queries, ndev * 2)
    nq -= nq % (mesh.devices.shape[0])          # divisible over 'data'
    rng = np.random.default_rng(0)
    AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
    q = AA[rng.integers(0, 20, (nq, pad))]
    ql = np.full(nq, pad - 8, np.int32)
    npair = nq * 2
    npair -= npair % ndev
    t0 = AA[rng.integers(0, 20, (npair, pad))]
    t1 = AA[rng.integers(0, 20, (npair, pad))]
    l0 = np.full(npair, pad - 8, np.int32)
    l1 = np.full(npair, pad - 8, np.int32)
    pq = (np.arange(npair) % nq).astype(np.int32)

    multi = len({d.process_index for d in mesh.devices.flat}) > 1
    step = sharded_search_step(mesh, replicate_out=multi)
    args = (q, ql.astype(np.int32), t0, t1, l0, l1, pq)
    if multi:
        from .distributed import host_to_global
        shard = (P('data', None), P('data'), P(('data', 'db'), None),
                 P(('data', 'db'), None), P(('data', 'db')),
                 P(('data', 'db')), P(('data', 'db')))
        args = tuple(host_to_global(NamedSharding(mesh, s), a)
                     for s, a in zip(shard, args))
    with mesh:
        masked, bits, merged = step(*args, nq)
    return (np.asarray(masked), np.asarray(bits), np.asarray(merged))

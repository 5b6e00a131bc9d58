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




import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.banded_sw import sw_align_batch
from ..ops.seg import seg_batch


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


def sharded_search_step(mesh: Mesh):
    """The full per-wave device step, sharded over a 2-D mesh:

    queries  (Bq, L)  sharded over 'data'   (replicated over 'db')
    pairs: per (data-shard query block, db shard) candidate pair batch
           (Bp, L) sharded over ('data', 'db')
    output: per-query top-v bit scores after an all-gather merge over 'db'
            (the reference's sort -m merge, find_hit.py:350).

    Returns a jitted fn(q_tokens, q_lens, t0, t1, l0, l1, pair_query) ->
    (masked queries, per-pair bits, merged per-query best bit).
    """
    qsh = NamedSharding(mesh, P('data', None))
    qvec = NamedSharding(mesh, P('data'))
    psh = NamedSharding(mesh, P(('data', 'db'), None))
    pvec = NamedSharding(mesh, P(('data', 'db')))

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
        out_shardings=(qsh, pvec, NamedSharding(mesh, P())),
    )


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

    step = sharded_search_step(mesh)
    with mesh:
        masked, bits, merged = step(q, ql, t0, t1, l0, l1, pq, nq)
    return (np.asarray(masked), np.asarray(bits), np.asarray(merged))

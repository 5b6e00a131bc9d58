"""P2 reference sharding: per-device DB index shards on the 'db' mesh
axis, candidate generation fanned out across them.

The reference shards the subject set as disk chunk passes (>4.2 GB DB
split + per-part hit tables merged by ordered sort,
bin/find_hit.py:286-351; fsearch.py:2727-2805 keeps one part resident).
The TPU-native reading (SURVEY §2.5 P2): a DB shard IS a chunk index
over a subject subrange, so K shards live device-resident — one per
'db'-axis device — and one query wave's candidate generation runs on
ALL shards concurrently (async dispatch: each shard's jitted stage-1/2
executes on its own device; the host fetches per-shard results as they
complete).  The cross-shard merge is the same per-wave candidate
concatenation in shard (= chunk = subject) order that the streamed host
pipeline already uses, so output is byte-identical to the serial chunk
sweep (enforced by tests/test_multidb.py on the CPU mesh).

On this machine (ONE physical chip behind a ~20 ms/dispatch relay) the
fan-out degenerates to serial dispatches, so the host engine remains
the measured default (BASELINE.md); the path exists for real multi-chip
pods, where K shards' stage-2 programs genuinely overlap.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax

from ..io_fasta import SeqDB
from ..ops.index import SeedIndex
from .candidates import Candidates


def shard_devices(n_shards: int, devices: Sequence | None = None) -> list:
    """One device per shard, round-robin over the 'db' axis of the
    active search mesh (or all local devices)."""
    if devices is None:
        from ..parallel import mesh as _meshmod
        m = _meshmod.active_search_mesh()
        if m is not None and 'db' in m.axis_names:
            # this process's slice of the db axis
            local = [d for d in m.devices.reshape(
                -1, m.devices.shape[-1])[0].tolist()
                if d.process_index == jax.process_index()] or \
                jax.local_devices()
            devices = local
        else:
            devices = jax.local_devices()
    return [devices[i % len(devices)] for i in range(n_shards)]


def _index_to_device(index: SeedIndex, device):
    """Pin one shard's CSR arrays to one device (cached per device)."""
    key = getattr(index, '_multidb_dev', None)
    if key is not None and key[0] == device.id:
        return key[1]
    import jax.numpy as jnp
    arrs = tuple(jax.device_put(a, device) for a in (
        index.start.astype(np.int32), index.sid.astype(np.int32),
        index.sst.astype(np.int32)))
    index._multidb_dev = (device.id, arrs)
    return arrs


def generate_candidates_multidb(q_tokens: np.ndarray,
                                q_lengths: np.ndarray,
                                db: SeqDB, indexes: List[SeedIndex],
                                alphabets: list, ssps: str,
                                devices: Sequence | None = None
                                ) -> List[Candidates]:
    """One query wave against K device-resident index shards: per-shard
    candidate lists in shard order — exactly what the chunk-major host
    sweep produces per wave, so ``CandidateSpill.append`` order (and
    therefore every downstream byte) is unchanged.

    Falls back per shard to the host engine when the device path's
    packed-key ranges don't hold (device_path_supported).
    """
    from .candidates import generate_candidates
    from .candidates_device import device_path_supported

    devs = shard_devices(len(indexes), devices)
    out: List[Candidates] = []
    for index, dev in zip(indexes, devs):
        if not device_path_supported(q_tokens, db, index):
            out.append(generate_candidates(q_tokens, q_lengths, db,
                                           index, alphabets, ssps))
            continue
        out.append(_one_shard(q_tokens, q_lengths, db, index, alphabets,
                              ssps, dev))
    return out


def _one_shard(q_tokens, q_lengths, db, index, alphabets, ssps, device):
    """The device engine pinned to one shard's device.  Mirrors
    ``generate_candidates_device`` (same jit programs — the device
    placement comes from the committed inputs), kept separate so the
    single-device path stays untouched."""
    import jax.numpy as jnp

    from .candidates_device import (_finish_candidates, _patterns_static,
                                    _stage1_seeds, _stage2_expand_chain,
                                    _tables, GB)

    B, L = q_tokens.shape
    streams = _patterns_static(tuple(alphabets), ssps)
    tbls = jax.device_put(_tables(tuple(alphabets)), device)
    start_i32, sid_i32, sst_i32 = _index_to_device(index, device)
    with jax.enable_x64(True):
        q_dev = jax.device_put(q_tokens, device)
        qlen_dev = jax.device_put(q_lengths.astype(np.int32), device)
        buckets, kept, counts, total = _stage1_seeds(
            q_dev, qlen_dev, tbls, start_i32, jnp.uint32(index.nc),
            jax.device_put(np.int64(index.threshold), device), streams)
        row_tot = np.asarray(jnp.sum(counts, axis=(0, 2))).astype(np.int64)
        total_i = int(row_tot.sum())
        if total_i == 0:
            z = np.zeros(0, dtype=np.int64)
            return Candidates(z, z, z, z, z)

        import os as _os
        cap = int(_os.environ.get('SWIFTORTHO_DEVICE_CAND_CAP',
                                  str(1 << 23)))
        if int(row_tot.max()) > cap:
            from .candidates import generate_candidates
            return generate_candidates(q_tokens, q_lengths, db, index,
                                       alphabets, ssps)

        RB = min(B, 512)
        blocks = []
        lo = 0
        while lo < B:
            hi, acc = lo, 0
            while hi < B and hi - lo < RB and acc + row_tot[hi] <= cap:
                acc += int(row_tot[hi])
                hi += 1
            if hi == lo:
                hi = lo + 1
            blocks.append((lo, hi))
            lo = hi

        # the shard's subject tokens: the full db slab, device_put once
        # per device (shards share the token array; only the CSR is
        # per-shard)
        dbt = getattr(db, '_multidb_tok', {})
        ent = dbt.get(device.id)
        if ent is None:
            ent = (jax.device_put(db.tokens, device),
                   jax.device_put(db.offsets.astype(np.int64), device))
            dbt[device.id] = ent
            db._multidb_tok = dbt
        db_tokens, db_offsets = ent

        parts = []
        for (blo, bhi) in blocks:
            btot = int(row_tot[blo:bhi].sum())
            if btot == 0:
                continue
            C = 1
            while C < btot:
                C *= 2
            C = max(C, GB)
            pad_r = RB - (bhi - blo)

            def rows(a):
                a = a[:, blo:bhi] if a.ndim == 3 else a[blo:bhi]
                if pad_r:
                    width = [(0, 0), (0, pad_r), (0, 0)] if a.ndim == 3 \
                        else [(0, pad_r)] + [(0, 0)] * (a.ndim - 1)
                    a = jnp.pad(a, width)
                return a

            g_qrow, g_sid, g_diag, score, grp_valid, n_groups = \
                _stage2_expand_chain(
                    rows(buckets), rows(kept), rows(counts),
                    rows(q_dev), rows(qlen_dev),
                    start_i32, sid_i32, sst_i32, db_tokens, db_offsets,
                    jax.device_put(np.int64(btot), device),
                    C=C, L=L, W=L + 1)
            ng = int(n_groups)
            parts.append((
                np.asarray(g_qrow[:ng]).astype(np.int64) + blo,
                np.asarray(g_sid[:ng]).astype(np.int64),
                np.asarray(g_diag[:ng]).astype(np.int64),
                np.asarray(score[:ng]).astype(np.int64)))
        g_qrow, g_sid, g_diag, score = (
            np.concatenate([p[i] for p in parts]) for i in range(4))
    return _finish_candidates(g_qrow, g_sid, g_diag, score)

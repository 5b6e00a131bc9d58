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
    packed-key ranges don't hold (generate_candidates_device checks
    device_path_supported itself).  Each shard runs the ONE device
    engine pinned to its device — same jit programs, same cap/blocking
    logic, no forked copy to drift.
    """
    from .candidates_device import generate_candidates_device

    devs = shard_devices(len(indexes), devices)
    return [generate_candidates_device(q_tokens, q_lengths, db, index,
                                       alphabets, ssps, device=dev)
            for index, dev in zip(indexes, devs)]

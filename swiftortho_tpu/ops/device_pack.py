"""Device-side pair packing for the transfer-light TPU align path.

The banded-SW stage consumes per-pair (column, row) token suffixes.  The
reference gathers them on the host by construction (fsearch.py:3059-3101
reads the mmapped reference per candidate); round 1 shipped host-gathered
(B, L) pair arrays to the device.  This machine's TPU sits behind a
~50 MB/s tunnel (BASELINE.md), so shipped pair tokens — ~15x the unique
data, since every query row re-ships per candidate and every subject row
per hit — dominated the align wall time.

This module keeps a row-padded token table device-resident (uploaded
once per search for the reference set, once per wave for the queries)
and ships only per-pair integers (row index, suffix offset, suffix
length).  The (B, L) pair arrays are then built ON DEVICE:

- row lookup: ``jnp.take(table, idx, axis=0)`` — a row-granularity
  dynamic-slice, fast on this backend (element gathers run at 0.01 G/s
  and are never used);
- suffix shift: a log2(W)-stage barrel roll (each stage is a concat of
  two static lane slices + a per-row select), then a length mask.

Output is byte-identical to the host gather path (native.gather_rows
feeding the same kernel); tests force this path on CPU and diff.

SWIFTORTHO_DEVICE_PACK: '0' disables (host gather path), 'force'
enables on any backend (tests), default auto (TPU/axon only).
"""

from __future__ import annotations

import os

import numpy as np

ROW_ALIGN = 128
# sequences longer than this stay on the host gather path (the table
# width is shared by every row, so one huge protein would multiply the
# whole table's footprint and roll cost)
STRIDE_CAP = 4096
# device-table byte budget (SWIFTORTHO_PACK_CAP overrides): references
# beyond it get a PARTIAL table — cap//stride resident rows, the rest
# ride the host gather path per pair (the `fits` routing below), so huge
# references degrade gradually instead of losing the transfer-light path
# outright.  WHICH rows are resident is a hot-set selection: the search
# driver feeds the first consumable wave's candidate subjects (merged
# across every reference chunk) to ``maybe_select``, and the table keeps
# the most-hit subjects.  All-vs-all subject frequency is heavily skewed
# and stationary across query waves, so one sampled selection + one
# upload beats any rotation scheme here: re-shipping a multi-GB table
# through the ~50 MB/s tunnel would cost more than host-gathering the
# cold tail it displaces.  Until selection happens (or when the table
# fits whole), residency is the identity prefix [0, n_db).
TABLE_BYTE_CAP = 2 << 30


def _pack(table, idx, off, n, L: int):
    """(B,) rows/offsets/lengths -> (B, L) token array, on device.

    out[b, l] = table[idx[b], off[b] + l] for l < n[b], else 0.
    Requires 0 <= off < W; n <= W - off (callers guarantee both: offsets
    are in-sequence band anchors, n is the suffix length clipped to L).
    """
    import jax.numpy as jnp

    x = jnp.take(table, idx, axis=0)
    W = table.shape[1]
    for k in range((W - 1).bit_length()):
        bit = ((off >> k) & 1).astype(bool)[:, None]
        rolled = jnp.concatenate([x[:, (1 << k):], x[:, :(1 << k)]], axis=1)
        x = jnp.where(bit, rolled, x)
    x = x[:, :L]
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    return jnp.where(lane < n[:, None], x, jnp.uint8(0))


def _packed_align(db_table, q_table, i0, o0, n0, i1, o1, n1,
                  score_only: bool, L0: int, L1: int,
                  use_scan: bool = False):
    """Jitted: build both pair arrays on device and run the kernel.
    Shapes are static per (L0, L1, npow, table rows, widths).  Outputs
    are flattened to (B,) per field so a sharded caller can partition
    the pair axis uniformly.

    ``use_scan``: force the portable lax.scan kernel — the sharded
    (mesh) path uses it so the pair axis partitions cleanly over
    devices (matching sw_align_sharded's kernel choice; bit-identical
    by the four-implementation parity contract)."""
    import jax
    import jax.numpy as jnp

    from .banded_sw import _CHUNK, _sw_align_chunked, sw_align_batch

    W = max(db_table.shape[1], q_table.shape[1])
    if db_table.shape[1] < W:
        db_table = jnp.pad(db_table, ((0, 0), (0, W - db_table.shape[1])))
    if q_table.shape[1] < W:
        q_table = jnp.pad(q_table, ((0, 0), (0, W - q_table.shape[1])))
    table = jnp.concatenate([db_table, q_table], axis=0)
    t0 = _pack(table, i0, o0, n0, L0)
    t1 = _pack(table, i1, o1, n1, L1)
    if use_scan or jax.default_backend() not in ('tpu', 'axon'):
        # portable lax.scan kernel (CPU tests and the sharded path) —
        # bit-identical to the pallas/native ones by the
        # four-implementation parity contract
        return sw_align_batch(t0, t1, n0, n1)
    B = t0.shape[0]
    npow = B // _CHUNK
    sh0 = (npow, _CHUNK, L0)
    sh1 = (npow, _CHUNK, L1)
    out = _sw_align_chunked(t0.reshape(sh0), t1.reshape(sh1),
                            n0.reshape(npow, _CHUNK),
                            n1.reshape(npow, _CHUNK),
                            score_only=score_only)
    return {k: v.reshape(-1) for k, v in out.items()}


_packed_align_jits: dict = {}


def _mesh_key(mesh):
    """Stable cache key for a mesh: device ids + axis names.  id(mesh)
    would miss for every freshly-constructed (but equal) Mesh and could
    alias a GC'd mesh's id to a later different mesh."""
    if mesh is None:
        return None
    return (tuple(d.id for d in np.asarray(mesh.devices).flat),
            tuple(mesh.axis_names))


def _get_packed_align(mesh=None):
    """The jitted packed-align entry: single-device by default; with an
    active search mesh, a sharded variant — token tables replicated over
    every mesh device, the per-pair scalar vectors (and outputs)
    partitioned over the flattened ('data','db') axes.  Multi-chip runs
    therefore KEEP the scalars-only H2D transfer shape (VERDICT r2
    item 3): the only per-wave device traffic is the scalar index
    vectors, exactly as on one chip."""
    import jax
    key = _mesh_key(mesh)
    fn = _packed_align_jits.get(key)
    if fn is None:
        # statics positionally (argnums): pjit with in_shardings
        # rejects kwargs, so both variants share one calling convention
        statics = (8, 9, 10, 11)        # score_only, L0, L1, use_scan
        if mesh is None:
            fn = jax.jit(_packed_align, static_argnums=statics)
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            rep = NamedSharding(mesh, P())
            vec = NamedSharding(mesh, P(('data', 'db')))
            fn = jax.jit(
                _packed_align, static_argnums=statics,
                in_shardings=(rep, rep, vec, vec, vec, vec, vec, vec),
                out_shardings=vec)
        _packed_align_jits[key] = fn
    return fn


class DevicePackContext:
    """Per-search device token tables + the packed align entry.

    ``db_rows``: every reference sequence (<= STRIDE_CAP long) as one
    zero-padded row; a pair's subject tokens are row ``sid``.  The
    query side reuses the wave's padded token batch (set_wave), its rows
    addressed as ``n_db + qrow``.  Rows are padded to stable shapes
    (table to the full reference size, wave to the wave capacity) so
    XLA compiles once per (L0, L1, score_only, npow).
    """

    def __init__(self, db):
        lens = (db.offsets[1:] - db.offsets[:-1]).astype(np.int64)
        n = len(lens)
        maxlen = int(lens.max()) if n else 1
        stride = -(-min(maxlen, STRIDE_CAP) // ROW_ALIGN) * ROW_ALIGN
        stride = max(stride, ROW_ALIGN)
        self.stride = stride
        cap = int(os.environ.get('SWIFTORTHO_PACK_CAP',
                                 str(TABLE_BYTE_CAP)))
        # partial table beyond the byte budget: n_db resident rows (the
        # identity prefix until maybe_select swaps in the hot set);
        # other subjects fall back per pair via `fits`
        self.n_db = min(n, max(cap // stride, 0))
        self._lens_ok = lens <= stride
        # sel[r] = reference sequence id resident in table row r;
        # row_of[sid] = its row, or -1 (host gather path)
        self.sel = np.arange(self.n_db, dtype=np.int64)
        self.row_of = np.full(n, -1, np.int64)
        self.row_of[:self.n_db] = np.arange(self.n_db)
        self.fits = self._lens_ok & (self.row_of >= 0)
        self.selected = self.n_db >= n   # no point re-selecting a
        self.ok = self.n_db > 0          # table that holds everything
        self.n_total = n
        self.wave_capacity = 0       # driver sets to the wave size so
        self._tab_dev: dict = {}     # mesh-key -> device table
        self._db = db                # kept: tables rebuild per mesh key
        self._wave_cache: list = []  # [(toks_ref, mesh_key, dev, width)]

    def maybe_select(self, subjects: np.ndarray) -> bool:
        """Hot-set residency for partial tables: the search driver calls
        this with the first consumable wave's candidate subject ids
        (merged across every reference chunk, so the sample sees the
        whole reference).  The n_db most-hit packable subjects become the
        resident rows (ties broken by id; spare capacity filled with the
        lowest unseen ids); everything else host-gathers per pair.
        One-shot by design: subject frequency in all-vs-all search is
        stationary across query waves, and re-shipping a multi-GB table
        through a ~50 MB/s tunnel costs more than host-gathering the
        cold tail.  No-op (returns False) once selected or when the
        table already holds the whole reference.  Output-neutral: both
        paths are bit-identical, selection only routes pairs."""
        if self.selected or not self.ok:
            return False
        counts = np.bincount(
            np.asarray(subjects, dtype=np.int64), minlength=self.n_total)
        counts[~self._lens_ok] = -1   # overlong rows can never pack
        order = np.lexsort((np.arange(self.n_total), -counts))
        sel = order[:self.n_db]
        sel = np.sort(sel[counts[sel] >= 0])
        self.sel = sel
        self.row_of = np.full(self.n_total, -1, np.int64)
        self.row_of[sel] = np.arange(len(sel))
        self.fits = self._lens_ok & (self.row_of >= 0)
        self.selected = True
        self._tab_dev.clear()         # table rebuilds on next use (same
        return True                   # n_db-row shape: no recompile)

    @staticmethod
    def _mesh():
        """The active search mesh (parallel.mesh) — when set, the table
        replicates over every mesh device and the packed align runs with
        the pair axis sharded, so multi-chip keeps scalars-only H2D."""
        from ..parallel import mesh as _meshmod
        return _meshmod.active_search_mesh()

    @staticmethod
    def _put(arr, mesh):
        import jax
        import jax.numpy as jnp
        if mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        return jax.device_put(arr, NamedSharding(mesh, P()))

    def _table(self, mesh=None):
        key = _mesh_key(mesh)
        dev = self._tab_dev.get(key)
        if dev is None:
            db = self._db
            sel = self.sel
            # table height is ALWAYS n_db (query rows are addressed as
            # n_db + qrow and the jit caches key on the shape); rows past
            # len(sel) stay zero and are never referenced (row_of == -1)
            tab = np.zeros((self.n_db, self.stride), np.uint8)
            if len(sel):
                starts = db.offsets[sel].astype(np.int64)
                cl = np.minimum((db.offsets[sel + 1] - starts)
                                .astype(np.int64), self.stride)
                mask = np.zeros((self.n_db, self.stride), bool)
                mask[:len(sel)] = (
                    np.arange(self.stride, dtype=np.int64)[None, :]
                    < cl[:, None])
                # vectorized ragged gather: row r reads
                # tokens[starts[r] : starts[r] + cl[r]]
                within = (np.arange(int(cl.sum()), dtype=np.int64)
                          - np.repeat(np.concatenate(
                              [[0], np.cumsum(cl)[:-1]]), cl))
                tab[mask] = db.tokens[np.repeat(starts, cl) + within]
            dev = self._put(tab, mesh)
            # keep BOTH keys resident (None + the one active mesh): on
            # >128-device meshes the per-wave npow divisibility fallback
            # alternates mesh <-> None, and a clear() here would re-ship
            # the multi-GB table through the tunnel on every flip.  The
            # key space is bounded at 2 — mesh is a per-run property.
            self._tab_dev[key] = dev
        return dev

    def wave_table(self, toks: np.ndarray):
        """Upload a wave's padded query rows; returns a (device_rows,
        width) handle.  Cached by array identity (the cache keeps strong
        references, so ids stay valid); a few entries are retained so
        pipelined waves don't evict each other."""
        mesh = self._mesh()
        mkey = _mesh_key(mesh)
        for ref, mk, dev, width in self._wave_cache:
            if ref is toks and mk == mkey:
                return dev, width
        t = toks
        cap = max(self.wave_capacity, t.shape[0])
        if t.shape[0] < cap:
            t = np.pad(t, ((0, cap - t.shape[0]), (0, 0)))
        dev = self._put(t, mesh)
        self._wave_cache.append((toks, mkey, dev, toks.shape[1]))
        del self._wave_cache[:-4]
        return dev, toks.shape[1]

    def active(self) -> bool:
        if not self.ok:
            return False
        mode = os.environ.get('SWIFTORTHO_DEVICE_PACK', '')
        if mode == '0':
            return False
        if mode == 'force':
            return True
        import jax
        return jax.default_backend() in ('tpu', 'axon')

    def run(self, wave, i0, o0, n0, i1, o1, n1, L0: int, L1: int,
            score_only: bool = False) -> dict:
        """Align B pairs; mirrors sw_align_auto's TPU branch (pow-of-two
        chunk-count reuse, ALIGN_PROF accounting) with scalars-only H2D.
        Returns {field: np.ndarray(B)}; in score_only mode only
        score/bi/bj are fetched (the rest are zeros, as the kernel
        computes them)."""
        import time as _t

        import jax.numpy as jnp

        from .banded_sw import (_CHUNK, _COMPILED_NPOW, ALIGN_PROF,
                                next_chunk_count)

        # the pair arrays cannot be wider than the combined table; the
        # kernel's results depend only on the lengths, so clamping the
        # pad width is output-neutral
        wave_dev, wave_width = wave
        W = max(self.stride, wave_width)
        L0, L1 = min(L0, W), min(L1, W)

        B = len(i0)
        _w0 = _t.time()
        n = -(-B // _CHUNK)
        key = ('packed', L0, L1, bool(score_only))
        seen = _COMPILED_NPOW.setdefault(key, set())
        usable = [p for p in seen if p >= n]
        if usable:
            npow = min(usable)
        else:
            npow = next_chunk_count(n)
            seen.add(npow)
        pad = npow * _CHUNK - B

        # active search mesh: replicate the tables, shard the pair axis
        # (VERDICT r2 item 3: multi-chip keeps scalars-only H2D).  The
        # padded batch is a _CHUNK(=128)-multiple, so any pow2 mesh up
        # to 128 devices divides it; larger/odd meshes fall back to the
        # single-device dispatch (still correct, still packed)
        mesh = self._mesh()
        if mesh is not None and (npow * _CHUNK) % int(mesh.devices.size):
            mesh = None

        def prep(a):
            a = np.ascontiguousarray(a, dtype=np.int32)
            return np.pad(a, (0, pad)) if pad else a

        i0, o0, n0 = prep(i0), prep(o0), prep(n0)
        i1, o1, n1 = prep(i1), prep(o1), prep(n1)
        _w1 = _t.time()
        vecs = (i0, o0, n0, i1, o1, n1)
        if mesh is not None:
            import jax as _jax
            if _jax.process_count() > 1:
                # multi-process runtime refuses numpy under non-trivial
                # shardings even on a local mesh
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                from ..parallel.distributed import host_to_global
                vsh = NamedSharding(mesh, P(('data', 'db')))
                vecs = tuple(host_to_global(vsh, a) for a in vecs)
        else:
            vecs = tuple(jnp.asarray(a) for a in vecs)
        out = _get_packed_align(mesh)(
            self._table(mesh), wave_dev, *vecs,
            bool(score_only), L0, L1, mesh is not None)
        _w2 = _t.time()
        # prepass consumers read only score (bit derives from it); skip
        # the D2H of every other field
        fields = ('score',) if score_only else tuple(out)
        res = {k: np.asarray(out[k]).reshape(-1)[:B] for k in fields}
        if score_only:
            for k in out:
                if k not in res:
                    res[k] = np.zeros(B, np.int32)
        _w3 = _t.time()
        ALIGN_PROF['pad_s'] += _w1 - _w0
        ALIGN_PROF['call_s'] += _w2 - _w1
        ALIGN_PROF['fetch_s'] += _w3 - _w2
        ALIGN_PROF['pairs'] += B
        ALIGN_PROF['padded'] += npow * _CHUNK
        ALIGN_PROF['calls'] += 1
        return res

"""Device-pack align path (ops/device_pack.py): pair token arrays built
on device from resident tables + per-pair scalars must be byte-identical
to the host gather path feeding the same kernel family."""

import numpy as np
import pytest

from swiftortho_tpu.config import SearchConfig
from swiftortho_tpu.corpus import make_corpus, write_corpus
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.ops import device_pack
from swiftortho_tpu.search.blastp import blastp_stream

CFG = dict(expect=1e-5, nc=262144, query_batch=96)


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp('dpack')
    fsa = str(p / 'c.fsa')
    write_corpus(fsa, make_corpus(n_taxa=3, n_families=45, seed=5,
                                  min_len=60, max_len=200))
    return SeqDB.from_path(fsa)


class TestPackUnit:
    def test_pack_matches_numpy(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        N, W, B, L = 37, 256, 300, 96
        table = rng.integers(0, 24, (N, W), dtype=np.uint8)
        idx = rng.integers(0, N, B)
        off = rng.integers(0, W, B).astype(np.int32)
        n = rng.integers(0, L + 1, B).astype(np.int32)
        # honor the contract: n <= W - off
        n = np.minimum(n, W - off).astype(np.int32)
        got = np.asarray(device_pack._pack(
            jnp.asarray(table), jnp.asarray(idx), jnp.asarray(off),
            jnp.asarray(n), L))
        want = np.zeros((B, L), np.uint8)
        for b in range(B):
            seg = table[idx[b], off[b]:off[b] + n[b]]
            want[b, :len(seg)] = seg
        np.testing.assert_array_equal(got, want)


class TestForcedPackPath:
    def test_byte_identical(self, corpus, monkeypatch):
        cfg = SearchConfig(**CFG)
        host = list(blastp_stream(corpus, corpus, cfg))
        assert len(host) > 0
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        dev = list(blastp_stream(corpus, corpus, cfg))
        assert dev == host

    def test_mixed_fit_split(self, corpus, monkeypatch):
        """Subjects longer than the table stride fall back to the host
        gather inside the same bucket; the merged output is unchanged."""
        cfg = SearchConfig(**CFG)
        host = list(blastp_stream(corpus, corpus, cfg))
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        monkeypatch.setattr(device_pack, 'STRIDE_CAP', 128)
        dev = list(blastp_stream(corpus, corpus, cfg))
        n_long = int((corpus.lengths > 128).sum())
        assert n_long > 0, 'corpus must exercise the non-fitting split'
        assert dev == host

    def test_multi_chunk_pack(self, corpus, monkeypatch):
        """The device table spans the whole reference, so chunked index
        passes reuse it unchanged; output must match the host path."""
        cfg = SearchConfig(expect=1e-5, nc=262144, chunk=40,
                           query_batch=96)
        host = list(blastp_stream(corpus, corpus, cfg))
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        dev = list(blastp_stream(corpus, corpus, cfg))
        assert len(corpus) > 80 and dev == host

    def test_score_only_fields(self, corpus, monkeypatch):
        """score_only=True fetches only the score (prepass contract):
        scores must equal the full run's, other fields read as zeros."""
        import jax.numpy as jnp  # noqa: F401 - ensures jax is up

        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        ctx = device_pack.DevicePackContext(corpus)
        wv = ctx.wave_table(np.zeros((4, 128), np.uint8))
        n = 64
        rng = np.random.default_rng(1)
        i0 = rng.integers(0, len(corpus), n)
        i1 = rng.integers(0, len(corpus), n)
        ln0 = np.minimum(corpus.lengths[i0], 96).astype(np.int64)
        ln1 = np.minimum(corpus.lengths[i1], 96).astype(np.int64)
        z = np.zeros(n, np.int64)
        full = ctx.run(wv, i0, z, ln0, i1, z, ln1, L0=96, L1=96)
        sc = ctx.run(wv, i0, z, ln0, i1, z, ln1, L0=96, L1=96,
                     score_only=True)
        np.testing.assert_array_equal(sc['score'], full['score'])
        assert (sc['aln'] == 0).all()

    def test_disabled_env(self, corpus, monkeypatch):
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', '0')
        ctx = device_pack.DevicePackContext(corpus)
        assert not ctx.active()


class TestPartialTable:
    def test_partial_table_byte_identical(self, corpus, monkeypatch):
        """A byte budget too small for the whole reference produces a
        PARTIAL device table: early subjects pack on device, later ones
        ride the host gather path per pair — rows byte-identical."""
        cfg = SearchConfig(**CFG)
        host = list(blastp_stream(corpus, corpus, cfg))
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        # budget for roughly half the reference rows
        ctx_probe = device_pack.DevicePackContext(corpus)
        half = (len(corpus) // 2) * ctx_probe.stride
        monkeypatch.setenv('SWIFTORTHO_PACK_CAP', str(half))
        ctx = device_pack.DevicePackContext(corpus)
        assert 0 < ctx.n_db < len(corpus)
        assert ctx.fits[:ctx.n_db].any() and not ctx.fits[ctx.n_db:].any()
        packed = list(blastp_stream(corpus, corpus, cfg))
        assert packed == host


class TestPackUnderMesh:
    def test_pack_plus_mesh_byte_identical(self, corpus, monkeypatch):
        """VERDICT r2 item 3: the transfer-light pack path must COMPOSE
        with an active search mesh (tables replicated over every device,
        pair axis sharded) instead of disabling itself — byte-identical
        to the host gather path under the same mesh AND to the plain
        single-device run."""
        from swiftortho_tpu.parallel.mesh import make_mesh, use_search_mesh
        cfg = SearchConfig(**CFG)
        plain = list(blastp_stream(corpus, corpus, cfg))

        mesh = make_mesh()                      # all 8 virtual devices
        with use_search_mesh(mesh):
            mesh_host = list(blastp_stream(corpus, corpus, cfg))
        assert mesh_host == plain

        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        ctx = device_pack.DevicePackContext(corpus)
        with use_search_mesh(mesh):
            assert ctx.active(), 'pack must stay active under a mesh'
            mesh_pack = list(blastp_stream(corpus, corpus, cfg))
        assert mesh_pack == plain

    def test_pack_mesh_mixed_fit(self, corpus, monkeypatch):
        """Non-fitting subjects ride the (sharded) host gather path
        while fitting ones pack on device, under the same mesh."""
        from swiftortho_tpu.parallel.mesh import make_mesh, use_search_mesh
        cfg = SearchConfig(**CFG)
        plain = list(blastp_stream(corpus, corpus, cfg))
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        monkeypatch.setattr(device_pack, 'STRIDE_CAP', 128)
        with use_search_mesh(make_mesh()):
            mesh_pack = list(blastp_stream(corpus, corpus, cfg))
        assert mesh_pack == plain


class TestHotSetSelection:
    """Partial tables pick WHICH rows stay resident from the first
    wave's subject sample (most-hit first) instead of the identity
    prefix — the cold tail host-gathers, outputs unchanged."""

    def _partial_ctx(self, corpus, monkeypatch, rows):
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        probe = device_pack.DevicePackContext(corpus)
        monkeypatch.setenv('SWIFTORTHO_PACK_CAP', str(rows * probe.stride))
        return device_pack.DevicePackContext(corpus)

    def test_topk_by_count_ties_by_id(self, corpus, monkeypatch):
        ctx = self._partial_ctx(corpus, monkeypatch, 4)
        assert ctx.n_db == 4 and not ctx.selected
        n = len(corpus)
        # skewed sample: ids n-1, n-2 hot; 5 and 7 lukewarm (tie)
        sample = np.array([n - 1] * 9 + [n - 2] * 5 + [5, 7, 7, 5])
        assert ctx.maybe_select(sample)
        assert ctx.selected
        np.testing.assert_array_equal(ctx.sel, np.sort([n - 1, n - 2, 5, 7]))
        assert ctx.fits[[5, 7, n - 2, n - 1]].all()
        assert not ctx.fits[0] and not ctx.fits[1]
        # rows map back to the right sequences
        assert (ctx.row_of[ctx.sel] == np.arange(4)).all()
        # idempotent
        assert not ctx.maybe_select(np.array([0, 1, 2]))

    def test_overlong_rows_never_selected(self, corpus, monkeypatch):
        monkeypatch.setattr(device_pack, 'STRIDE_CAP', 128)
        ctx = self._partial_ctx(corpus, monkeypatch, 6)
        long_id = int(np.argmax(corpus.lengths))
        assert corpus.lengths[long_id] > 128
        ctx.maybe_select(np.array([long_id] * 50 + [2, 3]))
        assert long_id not in ctx.sel and not ctx.fits[long_id]

    def test_full_table_never_reselects(self, corpus, monkeypatch):
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        ctx = device_pack.DevicePackContext(corpus)
        assert ctx.selected  # whole reference resident
        assert not ctx.maybe_select(np.array([1, 1, 1]))
        np.testing.assert_array_equal(ctx.sel, np.arange(len(corpus)))

    def test_selected_table_rows_match_sequences(self, corpus, monkeypatch):
        ctx = self._partial_ctx(corpus, monkeypatch, 3)
        n = len(corpus)
        ctx.maybe_select(np.array([n - 1, n - 1, 4, 4, 4, 9]))
        tab = np.asarray(ctx._table())
        assert tab.shape == (3, ctx.stride)
        for r, sid in enumerate(ctx.sel):
            s = corpus.tokens[corpus.offsets[sid]:corpus.offsets[sid + 1]]
            s = s[:ctx.stride]
            np.testing.assert_array_equal(tab[r, :len(s)], s)
            assert (tab[r, len(s):] == 0).all()

    def test_partial_with_selection_byte_identical(self, corpus,
                                                   monkeypatch):
        """End-to-end: a quarter-size table with hot-set routing must
        still produce byte-identical rows, and the selection must have
        actually replaced the identity prefix."""
        cfg = SearchConfig(**CFG)
        host = list(blastp_stream(corpus, corpus, cfg))
        seen = {}
        orig = device_pack.DevicePackContext.maybe_select

        def spy(self, subjects):
            r = orig(self, subjects)
            if r:
                seen['sel'] = self.sel.copy()
                seen['n_db'] = self.n_db
            return r

        monkeypatch.setattr(device_pack.DevicePackContext,
                            'maybe_select', spy)
        ctx_probe = device_pack.DevicePackContext(corpus)
        monkeypatch.setenv('SWIFTORTHO_DEVICE_PACK', 'force')
        monkeypatch.setenv('SWIFTORTHO_PACK_CAP',
                           str((len(corpus) // 4) * ctx_probe.stride))
        packed = list(blastp_stream(corpus, corpus, cfg))
        assert packed == host
        assert 'sel' in seen and len(seen['sel']) == seen['n_db']

"""P2 reference sharding (search/candidates_multidb.py): per-device DB
index shards on the mesh's 'db' axis, candidates fanned out per wave —
byte-identical to the serial chunk sweep."""

import numpy as np
import pytest

import jax

from swiftortho_tpu.config import SearchConfig
from swiftortho_tpu.corpus import make_corpus, write_corpus
from swiftortho_tpu.io_fasta import SeqDB
from swiftortho_tpu.search.blastp import IndexSource, blastp_stream
from swiftortho_tpu.search.candidates import generate_candidates
from swiftortho_tpu.search.candidates_multidb import (
    generate_candidates_multidb, shard_devices)

CFG = dict(expect=1e-5, nc=262144, chunk=30, query_batch=32)


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp('mdb')
    fsa = str(p / 'c.fsa')
    write_corpus(fsa, make_corpus(n_taxa=4, n_families=30, seed=21,
                                  min_len=60, max_len=160))
    return SeqDB.from_path(fsa)


class TestMultiDB:
    def test_shards_pinned_to_distinct_devices(self, corpus):
        cfg = SearchConfig(**CFG)
        indexes = list(IndexSource.from_build(corpus, cfg))
        assert len(indexes) >= 4, 'need a multi-chunk setup'
        devs = shard_devices(len(indexes))
        assert len(set(d.id for d in devs[:8])) == min(8, len(devs)), \
            'shards must spread over distinct devices'

    def test_per_shard_candidates_identical(self, corpus):
        """Each shard's candidate list equals the host engine run on the
        same chunk index (field-for-field)."""
        cfg = SearchConfig(**CFG)
        alphabets = cfg.resolved_alphabets()
        indexes = list(IndexSource.from_build(corpus, cfg))
        idx = np.arange(min(32, len(corpus)), dtype=np.int64)
        pad = 256
        toks, lens = corpus.padded_batch(idx, pad)
        dev_cands = generate_candidates_multidb(
            toks, lens, corpus, indexes, alphabets, cfg.seeds)
        assert len(dev_cands) == len(indexes)
        for ix, got in zip(indexes, dev_cands):
            want = generate_candidates(toks, lens, corpus, ix,
                                       alphabets, cfg.seeds)
            for f in ('qrow', 'subject', 'score', 'band_q', 'band_s'):
                np.testing.assert_array_equal(
                    getattr(got, f), getattr(want, f), err_msg=f)

    def test_search_end_to_end_identical(self, corpus, monkeypatch):
        """blastp under SWIFTORTHO_CANDIDATES=multidb on the 8-device
        mesh emits the same bytes as the plain host sweep."""
        from swiftortho_tpu.parallel.mesh import make_mesh, use_search_mesh
        cfg = SearchConfig(**CFG)
        host_rows = list(blastp_stream(corpus, corpus, cfg))
        assert host_rows
        monkeypatch.setenv('SWIFTORTHO_CANDIDATES', 'multidb')
        with use_search_mesh(make_mesh(n_data=2, n_db=4)):
            dev_rows = list(blastp_stream(corpus, corpus, cfg))
        assert dev_rows == host_rows

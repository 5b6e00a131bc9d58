"""Multi-device sharding over the virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax

from swiftortho_tpu.ops.banded_sw import sw_align_batch
from swiftortho_tpu.parallel.mesh import (demo_multichip, make_mesh,
                                          sharded_align_fn)


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(n_data=4, n_db=2)


class TestMesh:
    def test_shape(self, mesh):
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ('data', 'db')

    def test_sharded_align_matches_single(self, mesh, rng):
        B, L = 16, 96
        AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
        t0 = AA[rng.integers(0, 20, (B, L))]
        t1 = AA[rng.integers(0, 20, (B, L))]
        l0 = np.full(B, L - 8, np.int32)
        l1 = np.full(B, L - 8, np.int32)
        fn, psh, vsh = sharded_align_fn(mesh)
        with mesh:
            sharded = fn(t0, t1, l0, l1)
        single = sw_align_batch(t0, t1, l0, l1)
        for k in single:
            assert np.array_equal(np.asarray(sharded[k]),
                                  np.asarray(single[k])), k

    def test_sharded_pipeline_byte_identical(self, mesh, tmp_path):
        """The real pipeline under the 8-device mesh emits the exact same
        hit table as the single-device path (VERDICT item 1)."""
        from swiftortho_tpu.config import SearchConfig
        from swiftortho_tpu.corpus import make_corpus, write_corpus
        from swiftortho_tpu.io_fasta import SeqDB
        from swiftortho_tpu.parallel.mesh import blastp_sharded
        from swiftortho_tpu.search.blastp import blastp_stream

        fsa = str(tmp_path / 'mini.fsa')
        write_corpus(fsa, make_corpus(n_taxa=3, n_families=16, seed=13,
                                      min_len=60, max_len=140))
        db = SeqDB.from_path(fsa)
        cfg = SearchConfig(expect=1e-5, nc=262144, chunk=13, query_batch=16)
        single = list(blastp_stream(db, db, cfg))
        sharded = list(blastp_sharded(db, db, cfg, mesh=mesh))
        assert single and sharded == single

    def test_merge_semantics(self, mesh):
        # merged[q] must equal the max bit over q's pairs
        masked, bits, merged = demo_multichip(n_queries=16, mesh=mesh)
        npair = len(bits)
        nq = len(merged)
        pq = np.arange(npair) % nq
        want = np.full(nq, -1, np.int64)
        np.maximum.at(want, pq, bits.astype(np.int64))
        assert np.array_equal(merged.astype(np.int64), want)

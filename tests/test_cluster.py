"""Clustering: components, MCL (dense batched + sparse), APC, driver."""

import numpy as np
import pytest

from swiftortho_tpu.cluster.apc import apc_cluster
from swiftortho_tpu.cluster.components import (connected_components,
                                               union_find)
from swiftortho_tpu.cluster.driver import find_cluster_stream, parse_graph
from swiftortho_tpu.cluster.mcl import mcl_cluster
from swiftortho_tpu.config import ClusterConfig, OrthConfig, SearchConfig


class TestComponents:
    def test_union_find(self):
        ei = np.array([0, 1, 3])
        ej = np.array([1, 2, 4])
        lab = union_find(6, ei, ej)
        assert lab[0] == lab[1] == lab[2]
        assert lab[3] == lab[4]
        assert len({lab[0], lab[3], lab[5]}) == 3

    def test_scipy_matches_unionfind(self, rng):
        n = 50
        ei = rng.integers(0, n, 80)
        ej = rng.integers(0, n, 80)
        a = union_find(n, ei, ej)
        b = connected_components(n, ei, ej)
        # same partition (labels may differ)
        amap = {}
        for x, y in zip(a, b):
            assert amap.setdefault(x, y) == y


def _two_cliques(wab=1.0, bridge=0.01):
    """Two 4-cliques weakly bridged: MCL should split them."""
    ei, ej, w = [], [], []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                ei.append(base + i)
                ej.append(base + j)
                w.append(wab)
    ei.append(0)
    ej.append(4)
    w.append(bridge)
    return np.array(ei), np.array(ej), np.array(w)


class TestMCL:
    def test_splits_weak_bridge(self):
        ei, ej, w = _two_cliques()
        cl = mcl_cluster(8, ei, ej, w, inflation=1.5)
        assert sorted(map(tuple, cl)) == [(0, 1, 2, 3), (4, 5, 6, 7)]

    def test_strong_bridge_merges(self):
        ei, ej, w = _two_cliques(bridge=1.0)
        # fully connect across at weight 1 -> one cluster
        for i in range(4):
            for j in range(4, 8):
                ei = np.append(ei, i)
                ej = np.append(ej, j)
                w = np.append(w, 1.0)
        cl = mcl_cluster(8, ei, ej, w, inflation=1.5)
        assert len(cl) == 1 and len(cl[0]) == 8

    def test_separate_components_independent(self):
        # two disconnected triangles, different sizes in the same run
        ei = np.array([0, 1, 2, 3, 4, 5, 3])
        ej = np.array([1, 2, 0, 4, 5, 6, 6])
        w = np.ones(7)
        cl = mcl_cluster(7, ei, ej, w)
        assert sorted(map(tuple, cl)) == [(0, 1, 2), (3, 4, 5, 6)]

    def test_sparse_path_matches_dense(self):
        ei, ej, w = _two_cliques()
        dense = mcl_cluster(8, ei, ej, w, max_dense=4096)
        sparse = mcl_cluster(8, ei, ej, w, max_dense=4)  # force sparse
        assert sorted(map(tuple, dense)) == sorted(map(tuple, sparse))


class TestAPC:
    def test_two_groups(self):
        ei, ej, w = _two_cliques(wab=5.0, bridge=0.01)
        cl = apc_cluster(8, ei, ej, w, n_taxa=2)
        parts = sorted(map(tuple, cl))
        assert (0, 1, 2, 3) in parts and (4, 5, 6, 7) in parts

    def test_blocked_matches_in_memory(self, rng, tmp_path):
        """apc_cluster_blocked (reference apclust_blk,
        find_cluster.py:405-513): multi-block sweeps + memmap spill give
        the same clusters as the in-memory path."""
        from swiftortho_tpu.cluster.apc import apc_cluster_blocked

        ei, ej, w = [], [], []
        for c in range(12):                      # 12 cliques of 6
            off = c * 6
            for a_ in range(6):
                for b_ in range(a_ + 1, 6):
                    ei.append(off + a_)
                    ej.append(off + b_)
                    w.append(4.0 + 0.2 * float(rng.random()))
        n = 72
        ei = np.asarray(ei)
        ej = np.asarray(ej)
        w = np.asarray(w)
        base = apc_cluster(n, ei, ej, w, n_taxa=3)
        # block smaller than the edge table -> 5+ sweeps per block set
        blk = list(apc_cluster_blocked(n, ei, ej, w, n_taxa=3, block=100))
        assert sorted(map(tuple, blk)) == sorted(map(tuple, base))
        spill = list(apc_cluster_blocked(n, ei, ej, w, n_taxa=3,
                                         block=100,
                                         spill_dir=str(tmp_path / 'ap')))
        assert sorted(map(tuple, spill)) == sorted(map(tuple, base))


class TestSAP:
    """Reference SAP branch contract (find_cluster.py:1725-1751) on the
    framework's sparse-AP core (cluster/apc.sap_cluster): min-max
    normalized weights, preference -10 * n_taxa."""

    def test_two_groups(self):
        from swiftortho_tpu.cluster.apc import sap_cluster
        ei, ej, w = _two_cliques(wab=5.0, bridge=0.01)
        cl = sap_cluster(8, ei, ej, w, n_taxa=2)
        parts = sorted(map(tuple, cl))
        assert (0, 1, 2, 3) in parts and (4, 5, 6, 7) in parts

    def test_affine_weight_invariance(self):
        # the reference normalizes to (z - min) / (max - min)
        # (find_cluster.py:1726-1733), so clusters are invariant under
        # any positive affine rescale of the weights — NOT true of the
        # APC branch, which consumes raw weights; this is the observable
        # algorithmic difference between -a apc and -a sap
        from swiftortho_tpu.cluster.apc import sap_cluster
        ei, ej, w = _two_cliques(wab=5.0, bridge=0.01)
        a = sap_cluster(8, ei, ej, w, n_taxa=2)
        b = sap_cluster(8, ei, ej, w * 37.0 + 11.0, n_taxa=2)
        assert a == b

    def test_uniform_weights_no_nan(self):
        # documented deviation: max == min normalizes to 0.0 here; the
        # reference divides by zero (c = 0) and NaN-poisons pysapc
        from swiftortho_tpu.cluster.apc import sap_cluster
        ei, ej, w = _two_cliques()
        cl = sap_cluster(8, ei, ej, np.ones_like(w), n_taxa=2)
        assert sorted(x for c in cl for x in c) == list(range(8))

    def test_driver_dispatch(self):
        lines = []
        for base, tag in ((0, 'a'), (4, 'b')):
            for i in range(4):
                for j in range(i + 1, 4):
                    lines.append('t%d|%s%d\tt%d|%s%d\t5.0\n'
                                 % (i, tag, base + i, j, tag, base + j))
        lines.append('t0|a0\tt0|b4\t0.01\n')
        groups = [set(g.split('\t')) for g in
                  (ln.rstrip('\n') for ln in find_cluster_stream(
                      iter(lines), ClusterConfig(algorithm='sap')))]
        assert {'t0|a0', 't1|a1', 't2|a2', 't3|a3'} in groups
        assert {'t0|b4', 't1|b5', 't2|b6', 't3|b7'} in groups


class TestDriver:
    def test_parse_graph(self):
        lines = ['OT\ta|1\tb|1\t1.5\n', 'IP\ta|1\ta|2\t2.0\n',
                 'OT\tb|9\ta|1\t1.0\n',      # x > y: skipped
                 'x|1\ty|1\t0.5\n']          # 3-col form
        names, ei, ej, w, ntx = parse_graph(lines)
        assert set(names) == {'a|1', 'b|1', 'a|2', 'x|1', 'y|1'}
        assert ntx == 4
        assert len(ei) == 3

    def test_duplicate_pair_last_wins(self):
        lines = ['a|1\tb|1\t5.0\n', 'a|1\tb|1\t1.0\n']
        _, _, _, w, _ = parse_graph(lines)
        assert w.tolist() == [1.0]

    def test_end_to_end_groups(self):
        from swiftortho_tpu.corpus import make_corpus
        from swiftortho_tpu.io_fasta import SeqDB
        from swiftortho_tpu.orth.inference import find_orth_stream
        from swiftortho_tpu.search.blastp import blastp_stream

        corpus = make_corpus(n_taxa=3, n_families=12, seed=9, dup_prob=0.2)
        db = SeqDB.from_records(corpus.records)
        sc = list(blastp_stream(db, db, SearchConfig(expect=1e-5,
                                                     nc=1 << 18,
                                                     query_batch=64)))
        orth = list(find_orth_stream(sc, OrthConfig(0.5, 0)))
        for alg in ('mcl', 'apc'):
            groups = list(find_cluster_stream(orth,
                                              ClusterConfig(algorithm=alg)))
            assert groups, alg
            # each group should be family-pure
            impure = 0
            for g in groups:
                members = g.rstrip('\n').split('\t')
                fams = {corpus.family_of[m] for m in members}
                if len(fams) != 1:
                    impure += 1
            assert impure == 0, alg

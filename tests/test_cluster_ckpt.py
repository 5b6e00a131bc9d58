"""Resumable MCL checkpointing (VERDICT item 9): finished component
batches are never recomputed, and a run killed mid-component resumes
from its last checkpointed iteration."""

import numpy as np
import pytest

import swiftortho_tpu.cluster.mcl as mcl_mod
import swiftortho_tpu.cluster.mcl_blocksparse as bs_mod
from swiftortho_tpu.cluster.checkpoint import (ClusterCheckpoint,
                                               graph_signature)
from swiftortho_tpu.cluster.mcl import mcl_cluster


def _clique_chain(n_cliques, csize, rng, base=0, bridge_w=0.05):
    ei, ej, w = [], [], []
    for c in range(n_cliques):
        off = base + c * csize
        for a in range(csize):
            for b in range(a + 1, csize):
                ei.append(off + a)
                ej.append(off + b)
                w.append(1.0 + 0.1 * float(rng.random()))
        if c:
            ei.append(off - 1)
            ej.append(off)
            w.append(bridge_w)
    return ei, ej, w


def _graph_with_big(rng, n_small=40, csize=12, big_cliques=360):
    """Small components (dense buckets) + one oversize component."""
    ei, ej, w = [], [], []
    for c in range(n_small):                  # isolated cliques
        off = c * csize
        for a in range(csize):
            for b in range(a + 1, csize):
                ei.append(off + a)
                ej.append(off + b)
                w.append(1.0)
    base = n_small * csize
    bi, bj, bw = _clique_chain(big_cliques, csize, rng, base=base)
    n = base + big_cliques * csize            # big comp: 4320 > 4096
    return (n, np.asarray(ei + bi), np.asarray(ej + bj),
            np.asarray(w + bw))


class TestBatchCache:
    def test_second_run_recomputes_nothing(self, rng, tmp_path,
                                           monkeypatch):
        n, ei, ej, w = _graph_with_big(rng)
        first = mcl_cluster(n, ei, ej, w, ckpt_dir=str(tmp_path))
        assert list(tmp_path.glob('*_batch_*.npz'))

        def boom(*a, **k):
            raise AssertionError('batch recomputed despite checkpoint')
        monkeypatch.setattr(mcl_mod, '_run_dense_batch', boom)
        monkeypatch.setattr(mcl_mod, '_run_sparse_comp', boom)
        second = mcl_cluster(n, ei, ej, w, ckpt_dir=str(tmp_path))
        assert second == first

    def test_signature_invalidates_on_params(self, rng):
        n, ei, ej, w = _graph_with_big(rng)
        s1 = graph_signature(n, ei, ej, w, None, inflation=1.5)
        s2 = graph_signature(n, ei, ej, w, None, inflation=2.0)
        s3 = graph_signature(n, ei, ej, w * 2, None, inflation=1.5)
        assert len({s1, s2, s3}) == 3

    def test_state_roundtrip_and_corruption(self, tmp_path):
        ck = ClusterCheckpoint(str(tmp_path), 'sig0')
        ck.save_state('k', m=7, i_next=5, keys=np.arange(3))
        st = ck.load_state('k')
        assert int(st['m']) == 7 and int(st['i_next']) == 5
        # truncate the file: load must return None, not raise
        path = next(tmp_path.glob('sig0_state_k.npz'))
        path.write_bytes(path.read_bytes()[:20])
        assert ck.load_state('k') is None
        ck.clear_state('k')
        assert ck.load_state('k') is None


class TestMidRunResume:
    def test_killed_component_resumes_mid_run(self, rng, tmp_path,
                                              monkeypatch):
        """Inject a crash after 7 expansion dispatches; the rerun must
        start past iteration 0 and produce the uninterrupted partition."""
        m = 4320
        ei, ej, w = _clique_chain(360, 12, rng)
        li = np.asarray(ei)
        lj = np.asarray(ej)
        w = np.asarray(w, np.float32)
        selfw = np.zeros(m, np.float32)
        np.maximum.at(selfw, li, w)
        np.maximum.at(selfw, lj, w)

        orig = bs_mod._expand_device
        ref_calls = {'n': 0}

        def ref_counting(*a, **k):
            ref_calls['n'] += 1
            return orig(*a, **k)
        monkeypatch.setattr(bs_mod, '_expand_device', ref_counting)
        ref_ri, ref_rj = bs_mod.mcl_blocksparse(m, li, lj, w, selfw, 1.5,
                                                mb=512)
        ck = ClusterCheckpoint(str(tmp_path), 'sigX')
        calls = {'n': 0}

        def crashing(*a, **k):
            calls['n'] += 1
            if calls['n'] > 7:
                raise RuntimeError('simulated kill')
            return orig(*a, **k)
        monkeypatch.setattr(bs_mod, '_expand_device', crashing)
        with pytest.raises(RuntimeError):
            bs_mod.mcl_blocksparse(m, li, lj, w, selfw, 1.5, mb=512,
                                   ckpt=ck, ckpt_key='comp')
        st = ck.load_state('comp')
        assert st is not None and int(st['i_next']) == 5

        monkeypatch.setattr(bs_mod, '_expand_device', orig)
        calls_resume = {'n': 0}

        def counting(*a, **k):
            calls_resume['n'] += 1
            return orig(*a, **k)
        monkeypatch.setattr(bs_mod, '_expand_device', counting)
        ri, rj = bs_mod.mcl_blocksparse(m, li, lj, w, selfw, 1.5, mb=512,
                                        ckpt=ck, ckpt_key='comp')
        # resumed run skips exactly the 5 checkpointed iterations and
        # reproduces the uninterrupted result bit-for-bit
        assert calls_resume['n'] == ref_calls['n'] - 5
        assert np.array_equal(ri, ref_ri) and np.array_equal(rj, ref_rj)

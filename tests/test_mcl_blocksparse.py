"""Block-sparse (dense-tile SpMM) MCL for oversize components: partition
parity vs the scipy csr oracle, and a >=1e6-edge graph end-to-end
(VERDICT item 4)."""

import numpy as np
import pytest

from swiftortho_tpu.cluster.components import connected_components
from swiftortho_tpu.cluster.mcl import mcl_cluster
from swiftortho_tpu.cluster.mcl_blocksparse import mcl_blocksparse


def _clique_chain(n_cliques, csize, rng, bridge_w=0.05, base=0):
    """Chain of cliques linked by weak bridges -> ONE component whose MCL
    partition is the cliques."""
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


def _partition(clusters):
    return sorted(tuple(c) for c in clusters)


def _extract(m, ri, rj):
    if not len(ri):
        return []
    labels = connected_components(m, ri, rj)
    present = np.zeros(m, bool)
    present[ri] = True
    present[rj] = True
    out = []
    for lab in np.unique(labels[present]):
        out.append(sorted(np.flatnonzero((labels == lab)
                                         & present).tolist()))
    return out


class TestEngineParity:
    @pytest.mark.parametrize('mb', [128, 256])
    def test_vs_scipy_random_sparse(self, rng, mb):
        import scipy.sparse as sp

        from swiftortho_tpu.cluster.mcl import _mcl_sparse
        m = 600
        ei, ej, w = _clique_chain(40, 15, rng)
        li = np.asarray(ei)
        lj = np.asarray(ej)
        w = np.asarray(w, np.float32)
        selfw = np.zeros(m, np.float32)
        np.maximum.at(selfw, li, w)
        np.maximum.at(selfw, lj, w)

        ri, rj = mcl_blocksparse(m, li, lj, w, selfw, 1.5, mb=mb)
        got = _partition(_extract(m, ri, rj))

        mat = sp.lil_matrix((m, m), dtype=np.float32)
        mat[li, lj] = w
        mat[lj, li] = w
        mat.setdiag(selfw)
        xr = _mcl_sparse(mat, 1.5)
        sri, srj = (xr > 1e-5).nonzero()
        want = _partition(_extract(m, sri, srj))
        assert got == want

    def test_oversize_component_vs_scipy(self, rng, monkeypatch):
        """A component just over max_dense through mcl_cluster: the
        default block-sparse engine and the scipy engine give the same
        partition."""
        csize, ncl = 20, 225                     # m = 4500 > 4096
        ei, ej, w = _clique_chain(ncl, csize, rng)
        n = ncl * csize
        ei = np.asarray(ei)
        ej = np.asarray(ej)
        w = np.asarray(w)

        dev = _partition(mcl_cluster(n, ei, ej, w))
        monkeypatch.setenv('SWIFTORTHO_MCL', 'scipy')
        cpu = _partition(mcl_cluster(n, ei, ej, w))
        assert dev == cpu
        assert len(dev) == ncl                   # cliques recovered
        assert all(len(c) == csize for c in dev)


class TestMillionEdgeGraph:
    def test_e2e_million_edges(self, rng):
        """>=1e6-edge synthetic ortholog graph: thousands of family
        cliques (dense MXU path) plus one oversize component
        (block-sparse path); partition equals the known families."""
        ei, ej, w = [], [], []
        n_fam, csize = 5200, 20                  # 5200*190 = 988k edges
        for f in range(n_fam):
            off = f * csize
            for a in range(csize):
                for b in range(a + 1, csize):
                    ei.append(off + a)
                    ej.append(off + b)
                    w.append(1.0 + 0.1 * float(rng.random()))
        base = n_fam * csize
        bi, bj, bw = _clique_chain(225, csize, rng, base=base)
        ei += bi
        ej += bj
        w += bw
        n = base + 225 * csize
        ei = np.asarray(ei)
        ej = np.asarray(ej)
        w = np.asarray(w)
        assert len(ei) >= 1_000_000

        clusters = mcl_cluster(n, ei, ej, w)
        assert len(clusters) == n_fam + 225
        assert all(len(c) == csize for c in clusters)
        # every cluster is exactly one family block
        for c in clusters:
            assert c[0] % csize == 0 and c[-1] == c[0] + csize - 1


class TestMeshSharded:
    def test_mesh_partitions_identical_small(self, rng):
        """8-virtual-device sharded expansion == single-device
        partitions on a chained-clique component."""
        import jax
        from jax.sharding import Mesh
        m = 600
        ei, ej, w = _clique_chain(40, 15, rng)
        li, lj = np.asarray(ei), np.asarray(ej)
        w = np.asarray(w, np.float32)
        selfw = np.zeros(m, np.float32)
        np.maximum.at(selfw, li, w)
        np.maximum.at(selfw, lj, w)
        single = _partition(_extract(
            m, *mcl_blocksparse(m, li, lj, w, selfw, 1.5, mb=128)))
        mesh = Mesh(np.asarray(jax.devices()), ('dev',))
        sharded = _partition(_extract(
            m, *mcl_blocksparse(m, li, lj, w, selfw, 1.5, mb=128,
                                mesh=mesh)))
        assert sharded == single

    def test_mesh_million_edge_graph(self, rng, monkeypatch):
        """VERDICT r2 item 6: a >=1e6-edge graph (dense families + one
        oversize component) through SWIFTORTHO_MCL_MESH=1 — the
        oversize component's expansion shards over all 8 virtual
        devices — gives identical partitions to the single-device run."""
        ei, ej, w = [], [], []
        n_fam, csize = 5200, 20
        for f in range(n_fam):
            off = f * csize
            for a in range(csize):
                for b in range(a + 1, csize):
                    ei.append(off + a)
                    ej.append(off + b)
                    w.append(1.0 + 0.1 * float(rng.random()))
        base = n_fam * csize
        bi, bj, bw = _clique_chain(225, csize, rng, base=base)
        ei += bi
        ej += bj
        w += bw
        n = base + 225 * csize
        ei, ej, w = np.asarray(ei), np.asarray(ej), np.asarray(w)
        assert len(ei) >= 1_000_000
        single = _partition(mcl_cluster(n, ei, ej, w))
        monkeypatch.setenv('SWIFTORTHO_MCL_MESH', '1')
        sharded = _partition(mcl_cluster(n, ei, ej, w))
        assert sharded == single
        assert len(sharded) == n_fam + 225
        assert all(len(c) == csize for c in sharded)

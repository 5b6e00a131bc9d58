"""SwiftOrtho-TPU: a TPU-native ortholog-grouping framework.

A from-scratch re-design of the capabilities of SwiftOrtho
(GigaScience 8(10):giz118; reference layout at /root/reference) for TPU
hardware: JAX/XLA for the data-parallel pipeline, Pallas kernels for the
banded Smith-Waterman hot loop, `jax.sharding` meshes for multi-chip
scale-out.

Pipeline stages (mirroring the reference's three-stage design,
reference bin/find_hit.py, bin/find_orth.py, bin/find_cluster.py):

1. ``swiftortho_tpu.search``  — all-vs-all protein homology search
2. ``swiftortho_tpu.orth``    — OrthoMCL-style ortholog/paralog inference
3. ``swiftortho_tpu.cluster`` — MCL / affinity-propagation graph clustering
4. ``swiftortho_tpu.analysis``— pan-genome, RBH trees, operons, GO profiles
"""

__version__ = "0.1.0"

"""Pallas banded-SW kernel vs the portable implementation (interpret mode:
these tests run on the CPU mesh; the real-chip parity check against the
native C++ kernel is exercised by bench/verify runs)."""

import numpy as np
import pytest

from swiftortho_tpu.ops.banded_sw import sw_align_batch
from swiftortho_tpu.ops.banded_sw_pallas import sw_align_batch_pallas

AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
FIELDS = ('score', 'bi', 'bj', 'sti', 'stj', 'idy', 'aln', 'mis', 'gap')


def _cmp(t0, t1, l0, l1):
    ref = sw_align_batch(t0, t1, l0, l1)
    pal = sw_align_batch_pallas(t0, t1, l0, l1, interpret=True)
    for k in FIELDS:
        a, b = np.asarray(ref[k]), np.asarray(pal[k])
        assert np.array_equal(a, b), (k, np.flatnonzero(a != b)[:5])


class TestPallasParity:
    def test_mixed_batch(self, rng):
        B, L = 128, 80
        t0 = AA[rng.integers(0, 20, (B, L))]
        t1 = t0.copy()
        t1[B // 2:] = AA[rng.integers(0, 20, (B // 2, L))]
        l0 = rng.integers(10, L, B).astype(np.int32)
        l1 = rng.integers(10, L, B).astype(np.int32)
        _cmp(t0, t1, l0, l1)

    def test_asymmetric_lengths(self, rng):
        B = 128
        t0 = AA[rng.integers(0, 20, (B, 48))]
        t1 = AA[rng.integers(0, 20, (B, 144))]
        l0 = np.full(B, 40, np.int32)
        l1 = np.full(B, 140, np.int32)
        _cmp(t0, t1, l0, l1)

    def test_tiny_and_empty(self, rng):
        B = 128
        t0 = AA[rng.integers(0, 20, (B, 32))]
        t1 = AA[rng.integers(0, 20, (B, 32))]
        l0 = rng.integers(0, 5, B).astype(np.int32)
        l1 = rng.integers(0, 5, B).astype(np.int32)
        _cmp(t0, t1, l0, l1)

    def test_lowercase_and_junk_bytes(self, rng):
        B, L = 128, 64
        alpha = np.frombuffer(b'acdefghiklmnpqrstvwyXJ*-', np.uint8)
        t0 = alpha[rng.integers(0, len(alpha), (B, L))]
        t1 = alpha[rng.integers(0, len(alpha), (B, L))]
        l0 = np.full(B, 60, np.int32)
        l1 = np.full(B, 60, np.int32)
        _cmp(t0, t1, l0, l1)

    def test_score_only_matches_full(self, rng):
        from swiftortho_tpu.ops.banded_sw_pallas import sw_align_batch_pallas
        B, L = 128, 96
        t0 = AA[rng.integers(0, 20, (B, L))]
        t1 = AA[rng.integers(0, 20, (B, L))]
        l0 = rng.integers(10, L, B).astype(np.int32)
        l1 = rng.integers(10, L, B).astype(np.int32)
        f = sw_align_batch_pallas(t0, t1, l0, l1, interpret=True)
        s = sw_align_batch_pallas(t0, t1, l0, l1, interpret=True,
                                  score_only=True)
        for k in ('score', 'bi', 'bj'):
            assert np.array_equal(np.asarray(f[k]), np.asarray(s[k]))
        for k in ('sti', 'stj', 'idy', 'aln', 'mis', 'gap'):
            assert (np.asarray(s[k]) == 0).all()

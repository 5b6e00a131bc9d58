"""Test shim: bare @jit passthrough so the reference's numba path
(bin/find_cluster.py:7-14, cc='jit') runs as pure python in this
environment (numba is not installed).  Used only by the parity tests."""


def jit(f):
    return f

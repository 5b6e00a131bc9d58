"""Test shim, auto-imported by the interpreter via PYTHONPATH.

The reference's scripts/pan_genome.py does ``import scipy as np`` and
``from scipy import median, mean`` (pan_genome.py:8-9), relying on old
scipy versions re-exporting the numpy namespace (removed in modern
scipy).  Patch the missing numpy names into scipy so the unmodified
reference script runs for the parity tests.

Shadowing the container's axon sitecustomize here is deliberate:
reference subprocesses are pure-CPU scripts and must not initialize the
single-tenant TPU tunnel.
"""

try:
    import numpy as _np
    import scipy as _sp

    for _k in dir(_np):
        if not _k.startswith('_') and not hasattr(_sp, _k):
            try:
                setattr(_sp, _k, getattr(_np, _k))
            except Exception:
                pass
except Exception:
    pass

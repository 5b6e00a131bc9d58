"""Reference-compatible flag parsing.

The reference accepts both '-k value' and '-kvalue' forms with a defaults
dict (bin/find_hit.py:227-242 et al.); we reproduce that surface so the
CLIs are drop-in replacements.
"""

from __future__ import annotations

from typing import Dict, List


def parse_args(argv: List[str], defaults: Dict[str, str]) -> Dict[str, str]:
    args = dict(defaults)
    i = 1
    n = len(argv)
    while i < n:
        k = argv[i]
        if k in args:
            if i + 1 < n:
                args[k] = argv[i + 1]
                i += 2
                continue
            break
        elif k[:2] in args and len(k) > 2:
            args[k[:2]] = k[2:]
        i += 1
    return args


def apply_platform_env():
    """Honor SWIFTORTHO_PLATFORM=cpu|tpu and enable the persistent
    compilation cache.  The container's sitecustomize hard-selects the
    axon TPU backend at interpreter start, so plain JAX_PLATFORMS is
    ignored; jax.config still wins before first use."""
    import os
    plat = os.environ.get('SWIFTORTHO_PLATFORM')
    if plat:
        import jax
        try:
            jax.config.update('jax_platforms', plat)
        except RuntimeError:
            pass
    if os.environ.get('SWIFTORTHO_COORD'):
        # join a multi-host fleet (parallel/distributed.py); every rank
        # runs the same CLI invocation in lockstep
        from ..parallel.distributed import init_distributed
        init_distributed()
    cache = os.environ.get('SWIFTORTHO_JAX_CACHE',
                           os.path.expanduser('~/.cache/swiftortho_jax'))
    if cache and cache != '0':
        import jax
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache)
            jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
        except Exception:
            pass

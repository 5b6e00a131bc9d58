#!/usr/bin/env python
"""Same-process A/B of the pallas SW kernel: committed (_pallas_old) vs
working-tree (banded_sw_pallas), on whatever platform jax resolves
(axon = the real chip).  Cross-process chip numbers vary ~30%; only
same-process relative comparisons are trustworthy (see memory
axon-tpu-gotchas), hence both variants in one process, interleaved.

Bench shape: B=4096 pairs x L=500, band 32, lax.map over 128-pair
pallas chunks, ITERS fori_loop iterations inside one jit (dispatch
through the tunnel costs ~20 ms).  Also asserts the two variants agree
bit-for-bit on-chip before timing.
"""

import json
import pathlib
import subprocess
import time

import numpy as np
import jax
import jax.numpy as jnp

_REPO = pathlib.Path(__file__).resolve().parent.parent
_OLD = _REPO / 'swiftortho_tpu' / 'ops' / '_pallas_old.py'
_OLD.write_text(subprocess.run(
    ['git', 'show', 'HEAD:swiftortho_tpu/ops/banded_sw_pallas.py'],
    cwd=_REPO, capture_output=True, text=True, check=True).stdout)

from swiftortho_tpu.ops import banded_sw_pallas as newmod   # noqa: E402
from swiftortho_tpu.ops import _pallas_old as oldmod        # noqa: E402

B, L, BAND, CHUNK, ITERS = 4096, 500, 32, 128, 100
CELLS = B * L * BAND

rng = np.random.default_rng(0)
AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
n = B // CHUNK
t0 = AA[rng.integers(0, 20, (n, CHUNK, L + 12))]
t1 = AA[rng.integers(0, 20, (n, CHUNK, L + 12))]
l0 = np.full((n, CHUNK), L, np.int32)
l1 = np.full((n, CHUNK), L, np.int32)


def make_run(mod, score_only=False):
    def chunked(a, b, c, d):
        def one(args):
            return mod.sw_align_batch_pallas.__wrapped__(
                *args, score_only=score_only)
        return jax.lax.map(one, (a, b, c, d))

    @jax.jit
    def run(seed, t0, t1, l0, l1):
        def body(i, acc):
            t0x = jnp.bitwise_xor(t0, ((i + seed) & 1).astype(jnp.uint8))
            r = chunked(t0x, t1, l0, l1)
            return acc + r['score'][0, (i + seed) % CHUNK]
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    @jax.jit
    def once(t0, t1, l0, l1):
        return chunked(t0, t1, l0, l1)

    return run, once


def main():
    print('platform:', jax.devices()[0].platform, flush=True)
    results = {}
    runs = {}
    for name, mod in (('new', newmod), ('old', oldmod)):
        run, once = make_run(mod)
        tt = time.time()
        out = {k: np.asarray(v) for k, v in
               once(t0, t1, l0, l1).items()}
        print(f'{name}: first full fetch {time.time()-tt:.1f}s',
              flush=True)
        results[name] = out
        runs[name] = run
    for k in results['new']:
        assert np.array_equal(results['new'][k], results['old'][k]), k
    print('on-chip parity new==old: OK', flush=True)

    # warm both timed jits with a real fetch
    for name in ('new', 'old'):
        tt = time.time()
        int(np.asarray(runs[name](0, t0, t1, l0, l1)))
        print(f'{name}: timed-jit warm {time.time()-tt:.1f}s', flush=True)

    best = {'new': 0.0, 'old': 0.0}
    for trial in (1, 2, 3):
        for name in ('new', 'old'):
            tt = time.time()
            int(np.asarray(runs[name](trial, t0, t1, l0, l1)))
            dt = (time.time() - tt) / ITERS
            v = CELLS / dt
            best[name] = max(best[name], v)
            print(f'trial {trial} {name}: {v:.3e} cells/s', flush=True)

    # score-only variants too (the 36%-tax measurement)
    bso = {'new': 0.0, 'old': 0.0}
    runs_so = {}
    for name, mod in (('new', newmod), ('old', oldmod)):
        run, _ = make_run(mod, score_only=True)
        runs_so[name] = run
        int(np.asarray(run(0, t0, t1, l0, l1)))
    for trial in (1, 2):
        for name in ('new', 'old'):
            tt = time.time()
            int(np.asarray(runs_so[name](trial, t0, t1, l0, l1)))
            dt = (time.time() - tt) / ITERS
            bso[name] = max(bso[name], CELLS / dt)
            print(f'score-only trial {trial} {name}: '
                  f'{CELLS/dt:.3e} cells/s', flush=True)

    print(json.dumps({'full': best, 'score_only': bso,
                      'ratio_full': best['new'] / best['old']}),
          flush=True)


if __name__ == '__main__':
    main()

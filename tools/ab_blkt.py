#!/usr/bin/env python
"""Same-process blk_t sweep of the pallas SW kernel on the chip: how
many anti-diagonal steps per grid step (default 8) is optimal at the
production dispatch shape.  Asserts all configs agree bit-for-bit
before timing (same-process interleaved trials; see axon-tpu-gotchas
for why cross-process numbers are not comparable)."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from swiftortho_tpu.ops.banded_sw_pallas import sw_align_batch_pallas

B, L, BAND, CHUNK, ITERS = 4096, 500, 32, 128, 100
CELLS = B * L * BAND
BLKTS = (8, 16, 24, 32)

rng = np.random.default_rng(0)
AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
n = B // CHUNK
t0 = AA[rng.integers(0, 20, (n, CHUNK, L + 12))]
t1 = AA[rng.integers(0, 20, (n, CHUNK, L + 12))]
l0 = np.full((n, CHUNK), L, np.int32)
l1 = np.full((n, CHUNK), L, np.int32)


def make_run(bt, score_only=False):
    def chunked(a, b, c, d):
        def one(args):
            return sw_align_batch_pallas.__wrapped__(
                *args, score_only=score_only, blk_t=bt)
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
    runs, ref = {}, None
    for bt in BLKTS:
        run, once = make_run(bt)
        tt = time.time()
        out = {k: np.asarray(v) for k, v in once(t0, t1, l0, l1).items()}
        print(f'blk_t={bt}: first full fetch {time.time()-tt:.1f}s',
              flush=True)
        if ref is None:
            ref = out
        else:
            for k in ref:
                assert np.array_equal(ref[k], out[k]), (bt, k)
        runs[bt] = run
        int(np.asarray(run(0, t0, t1, l0, l1)))      # warm timed jit
    print('cross-blk_t parity: OK', flush=True)

    best = {bt: 0.0 for bt in BLKTS}
    for trial in (1, 2, 3):
        for bt in BLKTS:
            tt = time.time()
            int(np.asarray(runs[bt](trial, t0, t1, l0, l1)))
            v = CELLS / ((time.time() - tt) / ITERS)
            best[bt] = max(best[bt], v)
            print(f'trial {trial} blk_t={bt}: {v:.3e} cells/s',
                  flush=True)
    print(json.dumps({str(k): v for k, v in best.items()}), flush=True)


if __name__ == '__main__':
    main()

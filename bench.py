#!/usr/bin/env python
"""Round benchmark: banded-SW cell updates per second on the TPU.

Prints ONE JSON line:
  {"metric": "sw_bandcell_updates_per_s", "value": N, "unit": "cells/s",
   "vs_baseline": R}

- value: computed band-cell updates/s of the full augmented-statistics
  banded-SW batch kernel on the real chip, measured through the PRODUCTION
  dispatch (ops/banded_sw._sw_align_chunked: one device call = lax.map
  over _CHUNK-pair pallas launches; B=4096 pairs x L=500, band 32),
  steady state.  The map shape is the measured optimum — see BASELINE.md
  "kernel dispatch shape".
- vs_baseline: speedup over the C++ host kernel (g++ -O3 -march=native,
  swiftortho_tpu/native/banded_sw.cpp — the stand-in for the reference's
  RPython->C fsearch kernel, bin/find_hit.py:205) on one CPU core, same
  workload and identical outputs.

Measurements run in subprocesses under timeouts so a wedged TPU claim
cannot hang the driver; on TPU failure value is reported as 0.
"""

import json
import os
import subprocess
import sys

B, L, BAND = 4096, 500, 32
CELLS = B * L * BAND


def _tpu_worker():
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp
    from swiftortho_tpu.ops.banded_sw import _CHUNK, _sw_align_chunked

    rng = np.random.default_rng(0)
    AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
    # CELLS assumes every one of the B pairs runs; a chunk size that does
    # not divide B would silently truncate the workload and overstate
    # cells/s (and break the parity gate's reshape below)
    assert B % _CHUNK == 0, (B, _CHUNK)
    n = B // _CHUNK
    t0 = AA[rng.integers(0, 20, (n, _CHUNK, L + 12))]
    t1 = AA[rng.integers(0, 20, (n, _CHUNK, L + 12))]
    l0 = np.full((n, _CHUNK), L, np.int32)
    l1 = np.full((n, _CHUNK), L, np.int32)

    ITERS = 100

    @jax.jit
    def run(seed, t0, t1, l0, l1):
        # dispatch through the tunnel costs ~20 ms, so iterate inside one
        # jit call; vary the input per iteration (and per trial via seed)
        # so nothing can be hoisted or reused
        def body(i, acc):
            t0x = jnp.bitwise_xor(t0, ((i + seed) & 1).astype(jnp.uint8))
            r = _sw_align_chunked(t0x, t1, l0, l1)
            return acc + r['score'][0, (i + seed) % _CHUNK]

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    # NOTE: block_until_ready does NOT force completion through the axon
    # tunnel; only a host fetch does, and the first fetch absorbs a ~40-90s
    # lazy warm cost.  Warm with a real fetch, then time fresh work.
    tw = time.time()
    chk = int(np.asarray(run(0, t0, t1, l0, l1)))
    warm_s = time.time() - tw

    # session-condition probes (VERDICT r4 item 6): cross-round
    # vs_baseline swings must be attributable to tunnel/session state vs
    # code.  dispatch_ms = median round-trip of a trivial jitted op
    # (compile excluded); recorded alongside every measurement.
    tiny = jax.jit(lambda x: x + 1)
    _ = int(np.asarray(tiny(jnp.int32(0))))          # compile + warm
    dts = []
    for i in range(10):
        td = time.time()
        _ = int(np.asarray(tiny(jnp.int32(i))))
        dts.append(time.time() - td)
    dispatch_ms = sorted(dts)[len(dts) // 2] * 1e3

    best = 0.0
    trials = []
    for trial in (1, 2, 3):
        tt = time.time()
        r = int(np.asarray(run(trial, t0, t1, l0, l1)))
        dt = (time.time() - tt) / ITERS
        trials.append(round(CELLS / dt, 1))
        best = max(best, CELLS / dt)

    # real-chip correctness gate: every output field of the MEASURED
    # production path must be bit-identical to the C++ oracle (the
    # interpret-mode tests cannot see chip-specific lowering bugs); a
    # mismatch zeroes the reported value so a wrong-but-fast kernel can
    # never score
    parity = True
    try:
        from swiftortho_tpu.native import sw_align_batch_native
        got = {k: np.asarray(v).reshape(-1)
               for k, v in _sw_align_chunked(
                   jnp.asarray(t0), jnp.asarray(t1),
                   jnp.asarray(l0), jnp.asarray(l1)).items()}
        want = sw_align_batch_native(t0.reshape(B, -1), t1.reshape(B, -1),
                                     l0.reshape(-1), l1.reshape(-1))
        parity = all(np.array_equal(got[k], np.asarray(want[k]).reshape(-1))
                     for k in want)

        # VERDICT r3 item 4: the gate must cover the whole length-bucket
        # ladder AND both best-tracking strategies — a chip-lowering bug
        # off the production L=500 shape (or in the per-substep branch
        # the interpret tests pin) must zero the score too.  One 128-pair
        # chunk per bucket, mixed lengths, full stats.
        from swiftortho_tpu.ops.banded_sw_pallas import sw_align_batch_pallas
        FIELDS = ('score', 'bi', 'bj', 'sti', 'stj', 'idy', 'aln', 'mis',
                  'gap')
        for Lb in (128, 500, 1536, 4096):
            bt0 = AA[rng.integers(0, 20, (128, Lb))]
            bt1 = AA[rng.integers(0, 20, (128, Lb))]
            bl0 = rng.integers(Lb // 2, Lb + 1, 128).astype(np.int32)
            bl1 = rng.integers(Lb // 2, Lb + 1, 128).astype(np.int32)
            want_b = sw_align_batch_native(bt0, bt1, bl0, bl1)
            ps = sw_align_batch_pallas(bt0, bt1, bl0, bl1)  # per-slot
            su = sw_align_batch_pallas(bt0, bt1, bl0, bl1,
                                       per_slot=False)      # per-substep
            ok = all(
                np.array_equal(np.asarray(ps[k]),
                               np.asarray(want_b[k]).astype(np.int32))
                and np.array_equal(np.asarray(su[k]), np.asarray(ps[k]))
                for k in FIELDS)
            if not ok:
                print(json.dumps({'ladder_fail': Lb}), flush=True)
            parity = parity and ok
    except (ImportError, OSError):
        pass        # no g++/oracle .so: skip the gate; anything else
        # (shape bugs, chip faults) must fail LOUDLY, not skip the gate
    print(json.dumps({'cells_per_s': best if parity else 0.0,
                      'chk': chk, 'parity': parity,
                      'warm_s': round(warm_s, 1),
                      'dispatch_ms': round(dispatch_ms, 1),
                      'trials': trials}), flush=True)


def _cpu_worker():
    import time

    os.environ['SWNATIVE_THREADS'] = '1'          # single-core baseline

    import numpy as np
    from swiftortho_tpu.native import sw_align_batch_native

    rng = np.random.default_rng(0)
    AA = np.frombuffer(b'ACDEFGHIKLMNPQRSTVWY', np.uint8)
    n = 48                                        # subset: same per-cell cost
    t0 = AA[rng.integers(0, 20, (n, L + 12))]
    t1 = AA[rng.integers(0, 20, (n, L + 12))]
    l0 = np.full(n, L, np.int32)
    l1 = np.full(n, L, np.int32)
    sw_align_batch_native(t0, t1, l0, l1)         # warm (builds .so)
    tt = time.time()
    r = sw_align_batch_native(t0, t1, l0, l1)
    dt = time.time() - tt
    print(json.dumps({'cells_per_s': n * L * BAND / dt,
                      'chk': int(r['score'].sum())}), flush=True)


def _run(worker, timeout):
    out = ''
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            worker], capture_output=True, text=True,
                           timeout=timeout, cwd=os.path.dirname(
                               os.path.abspath(__file__)))
        out = p.stdout or ''
    except subprocess.TimeoutExpired as e:   # results may precede a hung exit
        out = (e.stdout or b'')
        if isinstance(out, bytes):
            out = out.decode(errors='replace')
    for line in out.splitlines():
        line = line.strip()
        if line.startswith('{'):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--tpu-worker':
        _tpu_worker()
        return
    if len(sys.argv) > 1 and sys.argv[1] == '--cpu-worker':
        _cpu_worker()
        return

    cpu = _run('--cpu-worker', timeout=600)
    # axon session establishment can inflate to many minutes when prior
    # processes were killed mid-warm (server-side sessions drain over
    # ~1 h) — give the worker room, and retry once
    # ladder gate adds up to 8 on-chip compiles on a cold XLA cache
    tpu = _run('--tpu-worker', timeout=2400)
    if tpu is None:                               # one retry (cold tunnel)
        tpu = _run('--tpu-worker', timeout=2400)

    tpu_v = tpu['cells_per_s'] if tpu else 0.0
    cpu_v = cpu['cells_per_s'] if cpu else 0.0
    vs = (tpu_v / cpu_v) if (tpu_v and cpu_v) else 0.0
    out = {'metric': 'sw_bandcell_updates_per_s',
           'value': round(tpu_v, 1), 'unit': 'cells/s',
           'vs_baseline': round(vs, 2),
           # session conditions (VERDICT r4 item 6): the single-core C++
           # oracle rate is a fixed host probe (host load/turbo state),
           # warm_s/dispatch_ms pin the tunnel state, trials expose
           # within-session spread — so cross-round vs_baseline swings
           # are attributable
           'session': {
               'host_cells_per_s': round(cpu_v, 1),
               'warm_s': tpu.get('warm_s') if tpu else None,
               'dispatch_ms': tpu.get('dispatch_ms') if tpu else None,
               'trials': tpu.get('trials') if tpu else None}}
    if tpu is None:
        # distinguish "chip unreachable" from "kernel slow/wrong": the
        # axon relay has shown multi-hour UNAVAILABLE outages; the last
        # verified on-chip figure lives in BASELINE.md
        out['note'] = 'tpu backend unavailable/timeout; see BASELINE.md'
    elif not tpu.get('parity', True):
        out['note'] = 'on-chip parity gate failed; value zeroed'
    print(json.dumps(out))


if __name__ == '__main__':
    main()

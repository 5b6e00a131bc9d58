#!/bin/bash
# Round-5 scale matrix, pass B: clean reruns with the per-process tunnel
# warm absorbed + logged BEFORE timing (run_scale.py warm probe), then
# the host-only profiling batch (SWNATIVE_PROF phase-A split at 250k,
# ab_walk SIMD A/B on cached inputs, ab_apc faithful-vs-textbook).
# Corpora cached in the pass-A workdirs.
#
#   nohup bash tools/run_scale_r5b.sh > /tmp/scale_r5b_driver.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

run() {
    local tag="$1"; shift
    echo "=== $tag start $(date +%H:%M:%S) ==="
    python tools/run_scale.py "$@" --workdir "/tmp/${tag%%__*}" \
        > "/tmp/$tag.r5b.log" 2>&1
    echo "=== $tag done $(date +%H:%M:%S) rc=$? ==="
    grep -E 'warm|SEARCH|TOTAL|purity' "/tmp/$tag.r5b.log"
    sleep 5
}

run scale102_600 --taxa 25 --families 4000 --max-len 600
run scale102_400 --taxa 25 --families 4000 --max-len 400
run scale250_400 --taxa 60 --families 4100 --max-len 400
run scale250_600 --taxa 60 --families 4100 --max-len 600

# phase-A decomposition at 250k with the SIMD walks shipped: walk/sort
# split + per-thread saturation ([fused prof] lines), search only
echo "=== prof250 start $(date +%H:%M:%S) ==="
SWNATIVE_PROF=1 SWIFTORTHO_PROF_CAND=1 \
python tools/run_scale.py --taxa 60 --families 4100 --max-len 400 \
    --workdir /tmp/scale250_400 --skip-downstream \
    > /tmp/prof250.r5b.log 2>&1
echo "=== prof250 done rc=$? ==="

# host-only A/Bs (chip idle from here on)
echo "=== profile_phaseA (index dump for ab_walk) ==="
python tools/profile_phaseA.py --workdir /tmp/scale250_400 --waves 2 \
    > /tmp/profile_phaseA.r5b.log 2>&1
echo rc=$?
echo "=== ab_walk ==="
python tools/ab_walk.py --workdir /tmp/scale250_400 \
    > /tmp/ab_walk.r5b.log 2>&1
echo rc=$?
tail -5 /tmp/ab_walk.r5b.log
echo "=== ab_apc ==="
python tools/ab_apc.py --opc /tmp/scale102_600/c.opc \
    > /tmp/ab_apc.r5b.log 2>&1
echo rc=$?
tail -5 /tmp/ab_apc.r5b.log
echo ALLDONE

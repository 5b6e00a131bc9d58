#!/bin/bash
# Round-5 scale matrix (VERDICT r4 item 1): rerun the 102k and 250k
# end-to-end pipelines with everything r4 shipped (AVX-512 walks,
# chunk-invariant WaveSeeds, one-ahead index prefetch) on BOTH corpus
# methodologies: the r2 record corpus (--max-len 400, nc 2^24) and the
# harder max-len-600 one.  Sequential — single-tenant chip.
#
#   nohup bash tools/run_scale_r5.sh > /tmp/scale_r5_driver.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

run() {
    local tag="$1"; shift
    echo "=== $tag start $(date +%H:%M:%S) ==="
    python tools/run_scale.py "$@" --workdir "/tmp/$tag" \
        > "/tmp/$tag.log" 2>&1
    echo "=== $tag done $(date +%H:%M:%S) rc=$? ==="
    tail -6 "/tmp/$tag.log"
    sleep 5
}

run scale102_600 --taxa 25 --families 4000 --max-len 600
run scale102_400 --taxa 25 --families 4000 --max-len 400
run scale250_400 --taxa 60 --families 4100 --max-len 400
run scale250_600 --taxa 60 --families 4100 --max-len 600
echo ALLDONE

#!/bin/bash
# Retry loop for the IN-FAMILY paper-scale dense-metric NUTS run (round 5).
# Same dispatch-size discipline as paper_loop.sh (PERF.md "Dispatch-size
# limits"): chunk 3 x depth 7, per-attempt wall budget inside the timeout.
cd /root/repo
OUT=results/paper_nuts_family
mkdir -p "$OUT"
for i in $(seq 1 60); do
    echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$OUT/loop.log"
    timeout 3600 python scripts/paper_nuts_run.py --out-dir "$OUT" \
        --dense-mass --pool-warmup --chunk 3 --max-depth 7 \
        --max-seconds 3250 >> "$OUT/loop.log" 2>&1
    rc=$?
    echo "=== attempt $i exit $rc ===" >> "$OUT/loop.log"
    if [ $rc -eq 0 ]; then
        echo "PAPER RUN COMPLETE" >> "$OUT/loop.log"
        break
    fi
    if [ $rc -eq 3 ]; then sleep 5; else sleep 120; fi
done

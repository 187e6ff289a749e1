#!/bin/bash
# Round-5 production paper run: in-family surrogate + dense metric +
# het_noise=exact (the eval-noise fix — PERF.md round-5 diagnosis).
cd /root/repo
OUT=results/paper_nuts_hetx
mkdir -p "$OUT"
for i in $(seq 1 40); do
    echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$OUT/loop.log"
    timeout 3600 python scripts/paper_nuts_run.py --out-dir "$OUT" \
        --dense-mass --pool-warmup --chunk 3 --max-depth 7 --het-exact \
        --inputs-from results/paper_nuts_family \
        --max-seconds 3250 >> "$OUT/loop.log" 2>&1
    rc=$?
    echo "=== attempt $i exit $rc ===" >> "$OUT/loop.log"
    if [ $rc -eq 0 ]; then
        echo "PAPER RUN COMPLETE" >> "$OUT/loop.log"
        break
    fi
    if [ $rc -eq 3 ]; then sleep 5; else sleep 120; fi
done

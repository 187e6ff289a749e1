#!/bin/bash
# Retry loop for the paper-scale NUTS run (crash/timeout resumable).
# Each attempt budgets its own wall clock (--max-seconds) so it exits at a
# checkpoint boundary before the external `timeout` would kill it mid-
# dispatch (a killed dispatch puts the axon worker into minutes of cooldown).
cd /root/repo
mkdir -p results/paper_nuts
for i in $(seq 1 60); do
    echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> results/paper_nuts/loop.log
    # chunk 3 x depth 7 caps the worst dispatch at ~7 s device time: 5 x
    # depth-8 chunks (up to ~23 s when a chain saturates the tree) crashed
    # the axon worker three times in a row (PERF.md "Dispatch-size limits")
    timeout 1500 python scripts/paper_nuts_run.py --pool-warmup --chunk 3 \
        --max-depth 7 --max-seconds 1250 >> results/paper_nuts/loop.log 2>&1
    rc=$?
    echo "=== attempt $i exit $rc ===" >> results/paper_nuts/loop.log
    if [ $rc -eq 0 ]; then
        echo "PAPER RUN COMPLETE" >> results/paper_nuts/loop.log
        break
    fi
    # worker cooldown after an abnormal death; short breather on clean rc=3
    if [ $rc -eq 3 ]; then sleep 5; else sleep 120; fi
done

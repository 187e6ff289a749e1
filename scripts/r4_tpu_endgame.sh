#!/bin/bash
# Round-4 TPU endgame: runs the post-paper-run task queue.  TPU tasks are
# serialized (the axon worker crashes under concurrent clients); the
# CPU-only accuracy stage overlaps the 2D probe.  Ordered so the
# acceptance artifact (VERDICT r3 #4) lands before the long 2D probe.
cd /root/repo
LOG=results/r4_endgame.log
echo "=== endgame start $(date -u +%H:%M:%S) ===" >> $LOG

# 1. mixed-path cost breakdown, default vs identity-start temporal (A/B)
timeout 1500 python scripts/mixed_cost_breakdown.py \
    --json-out results/mixed_cost_breakdown.jsonl >> $LOG 2>&1
echo "--- breakdown default rc=$? $(date -u +%H:%M:%S)" >> $LOG
timeout 1500 python scripts/mixed_cost_breakdown.py --temporal-identity-start \
    --json-out results/mixed_cost_breakdown.jsonl >> $LOG 2>&1
echo "--- breakdown ident rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 2. likelihood-noise probe A/B for the identity-start temporal flag
timeout 1500 python scripts/f32_noise_probe.py > results/noise_probe_default.txt 2>&1
echo "--- noise probe default rc=$? $(date -u +%H:%M:%S)" >> $LOG
timeout 1500 python scripts/f32_noise_probe.py --temporal-identity-start \
    > results/noise_probe_ident.txt 2>&1
echo "--- noise probe ident rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 3. on-device accuracy acceptance: TPU stage (cached MAP resume)
for i in 1 2 3; do
    timeout 1500 python scripts/tpu_accuracy.py --backend tpu >> $LOG 2>&1 && break
    echo "--- accuracy tpu retry $i $(date -u +%H:%M:%S)" >> $LOG
    sleep 60
done
echo "--- accuracy tpu rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 4. accuracy CPU stage in the BACKGROUND (CPU-only) while the 2D probe
# owns the TPU
( timeout 3000 python scripts/tpu_accuracy.py --backend cpu >> $LOG 2>&1;
  echo "--- accuracy cpu rc=$? $(date -u +%H:%M:%S)" >> $LOG;
  timeout 600 python scripts/tpu_accuracy.py --report >> $LOG 2>&1;
  echo "--- accuracy report rc=$? $(date -u +%H:%M:%S)" >> $LOG ) &
CPU_PID=$!

# 5. 2D NUTS probe (resumable chunked; prep already cached)
for i in $(seq 1 8); do
    timeout 1500 python scripts/nuts_2d_probe.py --max-seconds 1250 \
        --chunk 2 >> $LOG 2>&1
    rc=$?
    echo "--- 2d probe attempt $i rc=$rc $(date -u +%H:%M:%S)" >> $LOG
    if [ $rc -eq 0 ]; then break; fi
    if [ $rc -eq 3 ]; then sleep 5; else sleep 120; fi
done

wait $CPU_PID

# 5b. posterior-quality figure panels from the finished run (CPU-only)
timeout 600 python scripts/paper_figures.py >> $LOG 2>&1
echo "--- figures rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 6. headline bench preview (artifact path should now fire)
timeout 1500 python bench.py > results/bench_r4_preview.json 2>>$LOG
echo "--- bench rc=$? $(date -u +%H:%M:%S)" >> $LOG
echo "=== endgame done $(date -u +%H:%M:%S) ===" >> $LOG

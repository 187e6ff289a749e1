#!/bin/bash
# Round-4 TPU endgame: runs the post-paper-run TPU task queue in order.
# Started by a watcher once results/paper_nuts/paper_nuts_auditory.json
# exists (the TPU must not be shared with the paper run — the axon worker
# crashes under concurrent clients).
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

# 1b. likelihood-noise probe A/B for the identity-start temporal flag —
# the acceptance evidence for flipping the default
timeout 1500 python scripts/f32_noise_probe.py >> $LOG 2>&1
echo "--- noise probe default rc=$? $(date -u +%H:%M:%S)" >> $LOG
timeout 1500 python scripts/f32_noise_probe.py --temporal-identity-start \
    >> $LOG 2>&1
echo "--- noise probe ident rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 2. on-device accuracy acceptance: TPU stage (resumable-ish; cached MAP)
for i in 1 2 3; do
    timeout 1500 python scripts/tpu_accuracy.py --backend tpu >> $LOG 2>&1 && break
    echo "--- accuracy tpu retry $i $(date -u +%H:%M:%S)" >> $LOG
    sleep 60
done
echo "--- accuracy tpu rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 3. 2D NUTS probe (resumable chunked; prep stage already cached on CPU)
for i in $(seq 1 8); do
    timeout 1500 python scripts/nuts_2d_probe.py --max-seconds 1250 \
        --chunk 2 >> $LOG 2>&1
    rc=$?
    echo "--- 2d probe attempt $i rc=$rc $(date -u +%H:%M:%S)" >> $LOG
    if [ $rc -eq 0 ]; then break; fi
    if [ $rc -eq 3 ]; then sleep 5; else sleep 120; fi
done

# 4. accuracy CPU stage + report (CPU-only; safe anytime)
timeout 3000 python scripts/tpu_accuracy.py --backend cpu >> $LOG 2>&1
echo "--- accuracy cpu rc=$? $(date -u +%H:%M:%S)" >> $LOG
timeout 600 python scripts/tpu_accuracy.py --report >> $LOG 2>&1
echo "--- accuracy report rc=$? $(date -u +%H:%M:%S)" >> $LOG

# 5. headline bench (artifact path should now fire)
timeout 1500 python bench.py > results/bench_r4_preview.json 2>>$LOG
echo "--- bench rc=$? $(date -u +%H:%M:%S)" >> $LOG
echo "=== endgame done $(date -u +%H:%M:%S) ===" >> $LOG

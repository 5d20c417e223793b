#!/bin/bash
# Round-4 lambda_wave_l1 ablation (VERDICT r3 #2 / QUALITY_r03 "Results
# below"): fine-tune the best r03 EMA generator with the waveform-L1
# extension enabled and show best-lag-aligned SI-SDR recovering while
# DNSMOS OVRL holds.
#
# Protocol (declared in advance): 3000 steps from checkpoint-best, batch
# 16, G-EMA 0.999, no noise dropout, lambda_wave_l1=100 (mel term is
# 45 x ~1.2, wave L1 ~0.02-0.05, so 100 puts the new term at a few loss
# units - meaningful, not dominant). Steps 0-999: mel+SNR+waveL1 only
# (the archived "melonly" control here = wave-l1-without-adversarial at
# step 1000); steps 1000-2999: fresh discriminator opens, full objective
# + waveL1. Eval every 500 steps with the r03 battery.
set -u
cd "$(dirname "$0")/.."
OUT=runs/quality_r04_wavel1
STEPS="${1:-3000}"
mkdir -p "$OUT"
CMD=(python tools/quality_run.py --steps "$STEPS" --disc-at 1000
     --eval-every 500 --save-every 2 --batch 16 --g-ema 0.999
     --ndo 0 --seed 1 --wave-l1 100
     --init-from runs/quality_r03/checkpoint-best
     --auto-resume --out "$OUT")
nohup "${CMD[@]}" >> "$OUT/train.log" 2>&1 &
echo $! > /tmp/q4w.pid
nohup bash tools/run_watchdog.sh "$OUT/train.log" /tmp/q4w.pid 1800 -- \
    "${CMD[@]}" > /tmp/q4w_watchdog.log 2>&1 &
echo $! > /tmp/q4w_watchdog.pid
echo "trainer $(cat /tmp/q4w.pid) watchdog $(cat /tmp/q4w_watchdog.pid)"

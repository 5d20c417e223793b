#!/bin/bash
# Launcher for the round-3 quality campaign: trainer + stall watchdog with
# correct pid tracking. (A previous inline launch backgrounded the whole
# `&&` chain, so the pid file held the wrapper shell and the watchdog got an
# empty relaunch command — this script is the fix.)
set -u
cd "$(dirname "$0")/.."
OUT=runs/quality_r03
STEPS="${1:-20000}"
mkdir -p "$OUT"
CMD=(python tools/quality_run.py --steps "$STEPS" --disc-at 4000
     --eval-every 1000 --save-every 4 --batch 16 --g-ema 0.999
     --ndo 0.15 --ndo-decay 0.025 --ndo-decay-every 2000 --seed 0
     --auto-resume --out "$OUT")
nohup "${CMD[@]}" >> "$OUT/train.log" 2>&1 &
echo $! > /tmp/q3.pid
nohup bash tools/run_watchdog.sh "$OUT/train.log" /tmp/q3.pid 1800 -- \
    "${CMD[@]}" > /tmp/q3_watchdog.log 2>&1 &
echo $! > /tmp/q3_watchdog.pid
echo "trainer $(cat /tmp/q3.pid) watchdog $(cat /tmp/q3_watchdog.pid)"

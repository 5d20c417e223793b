#!/bin/bash
# Round-4 idle-chip measurement session (VERDICT r3 tasks 3/4/5/6).
# Run ONLY with the chip idle (no training/ablation in flight) — results
# land in runs/measurements_r04/*.log and are transcribed into
# docs/SCALING.md. Each leg is bounded; a failed leg must not block the
# rest.
set -u
cd "$(dirname "$0")/.."
OUT=runs/measurements_r04
mkdir -p "$OUT"
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout "$LEGTIME" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($name)"
  grep -v WARNING "$OUT/$name.log" | tail -6
}
LEGTIME="${LEGTIME:-900}"

# 1. stacked kernel sweep (the r3-#4 rebuild): B x chunk points
run stacked_sweep python tools/stacked_probe.py \
    --points 4:300,8:300,16:300,4:1200,8:600 --fits 3
# 2. stacked PQC codec at the serving point
run stacked_pqc python tools/stacked_probe.py --pqc --points 16:300 --fits 3
# 2b. stacked v1 vocoder rx
run stacked_voc python tools/stacked_probe.py --vocoder \
    --points 4:300,8:300,16:300 --fits 3
# 3. vocoder group-pack A/B (on/off) + roofline accounting
run voc_pack_on  python tools/vocoder_probe.py --skip-chain --fits 3
run voc_pack_off python tools/vocoder_probe.py --skip-chain --fits 3 \
    --group-pack-max-lanes 0
# 4. batch sweep: explain the B>128 per-stream regression
run batch_sweep python tools/batch_sweep_probe.py
# 5. stream-major grid upper bound (r2-#3 proposal, for the record)
run mega_batched python tools/mega_batched_probe.py
# 6. training-precision probe (chip default vs highest; CPU truth is a
#    separate long leg — run manually if time allows)
run precision_tpu python tools/precision_probe.py --out "$OUT/prec_tpu.json"
run precision_tpu_hi python tools/precision_probe.py --precision highest \
    --out "$OUT/prec_tpu_hi.json"
run precision_cmp python tools/precision_probe.py \
    --compare "$OUT/prec_tpu.json" "$OUT/prec_tpu_hi.json"
# 7. the driver bench, warm cache (wall + every leg status recorded),
#    then a cold-cache run (fresh cache dir) to record the cold wall
LEGTIME=600 run bench_warm env BENCH_BUDGET_S=420 python bench.py
LEGTIME=900 run bench_cold env BENCH_BUDGET_S=420 \
    DLSE_COMPILE_CACHE_DIR=/tmp/dlse_cold_cache python bench.py
echo "=== done; transcribe into docs/SCALING.md ==="

#!/usr/bin/env python3
"""Summarize a quality-campaign curve.jsonl into the QUALITY_r03 tables.

Reads the run directory produced by tools/quality_run.py and prints:
- the reference rows (clean / noisy identity controls);
- a curve table (step, phase, mean OVRL/SIG/BAK, raw + aligned SI-SDR,
  lag, STOI/ESTOI, mel-L1);
- best checkpoint + mel-only control summaries;
- the SI-SDR verdict numbers (mel-only vs adversarial vs any ablation
  runs passed as extra directories).

Usage: python tools/quality_report.py runs/quality_r03 [ablation_dir ...]
"""

import json
import os
import sys


def load(d):
    recs = []
    with open(os.path.join(d, "curve.jsonl")) as f:
        for line in f:
            recs.append(json.loads(line))
    ref = next((r for r in recs if r["step"] == -1), None)
    # a wedge+auto-resume replays the evals since the last checkpoint and
    # re-appends them; keep the LAST occurrence per step (the replayed
    # rows are byte-identical when the resume is deterministic — worth
    # checking by diffing occurrences before trusting a curve)
    by_step = {}
    for r in recs:
        if r["step"] != -1:
            by_step[r["step"]] = r
    curve = [by_step[s] for s in sorted(by_step)]
    best = melonly = None
    for name in ("best", "melonly"):
        p = os.path.join(d, f"{name}.json")
        if os.path.exists(p):
            with open(p) as f:
                v = json.load(f)
            if name == "best":
                best = v
            else:
                melonly = v
    return ref, curve, best, melonly


def fmt_mean(m, extra=()):
    cols = ["OVRL", "SIG", "BAK", "si_sdr", "si_sdr_aligned", "snr",
            "stoi", "estoi", "mel_l1"] + list(extra)
    return " | ".join(f"{m.get(c, float('nan')):.3f}"
                      if isinstance(m.get(c), (int, float)) else "-"
                      for c in cols)


def main():
    d = sys.argv[1]
    ref, curve, best, melonly = load(d)
    print(f"== {d} ==")
    if ref:
        print("clean:", {k: ref["clean"][k] for k in ("SIG", "BAK", "OVRL")})
        for k, v in ref.items():
            if k.startswith("noisy"):
                print(f"{k}: OVRL {v['OVRL']} si_sdr {v['si_sdr']} "
                      f"aligned {v.get('si_sdr_aligned')} lag {v.get('lag')} "
                      f"stoi {v.get('stoi')}")
    hdr = ("step  phase  | OVRL | SIG | BAK | si_sdr | aligned | snr | "
           "stoi | estoi | mel_l1")
    print(hdr)
    for r in curve:
        phase = "adv" if r.get("disc_enabled") else "mel"
        m = r["mean"]
        lags = [r["per_snr"][s].get("lag") for s in r["per_snr"]]
        print(f"{r['step']:>6} {phase:>5} | {fmt_mean(m)} | lags {lags}")
    if melonly:
        print("MELONLY control:", melonly["step"], melonly["mean"])
    if best:
        print("BEST:", best["step"], "mean_ovrl", best["mean_ovrl"],
              best["mean"])
    for extra in sys.argv[2:]:
        ref2, curve2, best2, _ = load(extra)
        print(f"== ablation {extra} ==")
        for r in curve2:
            m = r["mean"]
            print(f"{r['step']:>6} | {fmt_mean(m)}")
        if best2:
            print("BEST:", best2["step"], best2["mean"])


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Summarize a quality-run curve.jsonl into a markdown table + stats.

Usage: python tools/curve_report.py runs/r02c/curve.jsonl [--every 4]

Prints: baseline rows (the step==-1 record holds the noisy-input and clean
reference scores when present), every Nth eval row, the best row by mean
OVRL, and trend stats (first/last disc-phase OVRL mean over 5 evals).
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curve")
    ap.add_argument("--every", type=int, default=4)
    args = ap.parse_args()

    rows, meta = [], None
    for line in open(args.curve):
        r = json.loads(line)
        if r.get("step") == -1:
            meta = r
        elif "mean" in r:
            rows.append(r)
    if not rows:
        print("no eval rows")
        return

    def fmt(r):
        m = r["mean"]
        return (f"| {r['step']} | {m['SIG']:.2f} | {m['BAK']:.2f} | "
                f"**{m['OVRL']:.2f}** | {m['P808_MOS']:.2f} | "
                f"{m.get('si_sdr', float('nan')):.1f} | "
                f"{'on' if r.get('disc_enabled') else 'off'} |")

    print("| step | SIG | BAK | OVRL | P808 | SI-SDR | D |")
    print("|---|---|---|---|---|---|---|")
    if meta:
        names = ["clean"] + [k for k in meta if k.startswith("noisy")]
        for name in names:
            if isinstance(meta.get(name), dict):
                m = meta[name]
                print(f"| {name} | {m['SIG']:.2f} | {m['BAK']:.2f} | "
                      f"**{m['OVRL']:.2f}** | {m['P808_MOS']:.2f} | "
                      f"{m.get('si_sdr', float('nan')):.1f} | — |")
    for i, r in enumerate(rows):
        if i % args.every == 0 or i == len(rows) - 1:
            print(fmt(r))
    best = max(rows, key=lambda r: r["mean"]["OVRL"])
    print("\nbest by mean OVRL:")
    print(fmt(best))
    disc = [r for r in rows if r.get("disc_enabled")]
    if len(disc) >= 10:
        head = sum(r["mean"]["OVRL"] for r in disc[:5]) / 5
        tail = sum(r["mean"]["OVRL"] for r in disc[-5:]) / 5
        print(f"\ndisc-phase OVRL: first-5-eval mean {head:.3f} -> "
              f"last-5-eval mean {tail:.3f}")
    import math

    n_nan = sum(1 for r in rows
                if not (math.isfinite(r["g_loss"])
                        and math.isfinite(r["d_loss"])))
    print(f"evals: {len(rows)}; non-finite losses: {n_nan}")


if __name__ == "__main__":
    main()

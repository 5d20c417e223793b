#!/usr/bin/env python3
"""Rebuild runs/smoke_r05/curves.json from the already-written logs.

The first smoke_r05.py run completed ALL chip work (AE two-phase + resume,
statistic, vocoder) but crashed in parse_curve on the trainer's trailing
period before writing curves.json. This re-parses the logs (with the fixed
regex) and reconstructs the per-segment walls from the timestamped stderr
log rather than re-running 550 training steps on the chip.
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ROOT = os.path.join(REPO, "runs", "smoke_r05")

from tools.smoke_r05 import parse_curve  # noqa: E402  (fixed regex)


def segment_walls(stderr_log):
    """Per-segment walls from the '%H:%M:%S,ms' timestamps of segment
    boundary lines in the captured trainer stderr."""
    ts = re.compile(r"^(\d{4}-\d{2}-\d{2}) (\d{2}):(\d{2}):(\d{2}),(\d{3})")

    def t_of(line):
        m = ts.match(line)
        if not m:
            return None
        _, h, mi, s, ms = m.groups()
        return int(h) * 3600 + int(mi) * 60 + int(s) + int(ms) / 1e3

    events = []
    with open(stderr_log) as f:
        for line in f:
            t = t_of(line)
            if t is None:
                continue
            if "(train) expdir:" in line:
                events.append(("train_start", t, line.strip()))
            elif "Successfully saved checkpoint" in line:
                events.append(("ckpt", t, line.strip()))
            elif "saved stats" in line:
                events.append(("stats", t, line.strip()))
    return events


def main():
    results = {}
    events = segment_walls(os.path.join(REPO, "runs",
                                        "smoke_r05_stderr.log"))
    starts = [e for e in events if e[0] == "train_start"]
    ckpts = [e for e in events if e[0] == "ckpt"]
    # segments: ae (start0 -> last ckpt before start1), ae_resume
    # (start1 -> its last ckpt), voc (start2 -> final ckpt)
    if len(starts) >= 3:
        ae0, ae1, voc0 = starts[0][1], starts[1][1], starts[2][1]
        ae_end = max(t for _, t, _ in ckpts if t < ae1)
        res_end = max(t for _, t, _ in ckpts if ae1 < t < voc0)
        voc_end = max(t for _, t, _ in ckpts)
        results["ae_wall_s"] = round(ae_end - ae0, 1)
        results["ae_resume_wall_s"] = round(res_end - ae1, 1)
        results["voc_wall_s"] = round(voc_end - voc0, 1)
    results["ae_curve"] = parse_curve(os.path.join(ROOT, "ae.log"))
    results["voc_curve"] = parse_curve(os.path.join(ROOT, "voc.log"))
    with open(os.path.join(ROOT, "curves.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if not k.endswith("curve")}))
    for name in ("ae_curve", "voc_curve"):
        c = results[name]
        print(name, "points:", len(c), "first:", c[0] if c else None,
              "last:", c[-1] if c else None)


if __name__ == "__main__":
    main()

"""DNSMOS scoring CLI (DNSMOS/dnsmos_local.py equivalent, JAX backend).

Usage:
    python -m dl_speech_enhancement_tpu.cli.dnsmos -t test_out -o scores.csv [-p]

Walks ``testset_dir`` (one subdirectory per model, as produced by
cli.testing_denoise), scores every wav, prints pandas describe() per model
and optionally writes a CSV — same outputs as the reference
(dnsmos_local.py:102-145), minus the thread pool (segments batch on device).
"""

from __future__ import annotations

import glob
import os
from argparse import ArgumentParser

import pandas as pd


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("-t", "--testset_dir", default=".")
    parser.add_argument("-o", "--csv_path", default=None)
    parser.add_argument("-p", "--personalized_MOS", action="store_true")
    parser.add_argument("--model-dir", default="/root/reference/DNSMOS",
                        help="directory holding the DNSMOS onnx assets")
    args = parser.parse_args(argv)

    from dl_speech_enhancement_tpu.eval.dnsmos import (
        ComputeScore, default_model_paths,
    )
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # DNSMOS programs persist across CLI runs
    primary, p808 = default_model_paths(args.personalized_MOS, args.model_dir)
    compute_score = ComputeScore(primary, p808,
                                 personalized=args.personalized_MOS)

    clips = sorted(glob.glob(os.path.join(args.testset_dir, "*.wav")))
    for sub in sorted(glob.glob(os.path.join(args.testset_dir, "*"))):
        if os.path.isdir(sub):
            clips.extend(sorted(glob.glob(os.path.join(sub, "**", "*.wav"),
                                          recursive=True)))
    rows = []
    for clip in clips:
        try:
            row = compute_score(clip, 16000, args.personalized_MOS)
            row["model"] = os.path.relpath(
                os.path.dirname(clip), args.testset_dir
            )
            rows.append(row)
        except Exception as exc:  # mirror the reference's per-clip tolerance
            print(f"{clip!r} generated an exception: {exc}")

    df = pd.DataFrame(rows)
    if args.csv_path:
        df.to_csv(args.csv_path)
    if not df.empty and "model" in df:
        for model, group in df.groupby("model"):
            print(f"== {model} (n={len(group)})")
            print(group[["SIG", "BAK", "OVRL", "P808_MOS"]].mean().round(3))
    else:
        print(df.describe())
    return df


if __name__ == "__main__":
    main()

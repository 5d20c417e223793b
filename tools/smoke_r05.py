#!/usr/bin/env python3
"""On-chip smoke campaigns for the two never-trained-on-chip workloads
(VERDICT r4 #7): the autoencoder (two-phase efficient paradigm) and the
vocoder (frozen analyzer), at FULL model size on real audio.

Corpus: the reference's 6 demo clips (~2.5-2.8 s each, 48 kHz) — enough
for a few hundred real steps with the production configs' crop lengths.
Chain (mirrors the reference's gitignored codecTrain/codecStatistic
drivers): autoencoder phase 1 (metric+VQ) -> phase 2 (adversarial, with
the encoder/projector/quantizer freeze) -> resume for +50 steps ->
statistic -> vocoder (frozen analyzer, adversarial from step 0).

Writes runs/smoke_r05/{ae,voc}.log (trainer console curves:
'(Steps: N) train/<k> = v' lines), curves.json (parsed), and leaves the
experiment dirs under runs/smoke_r05/exp for checkpoint inspection.
"""

import json
import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ROOT = os.path.join(REPO, "runs", "smoke_r05")
DEMO = "/root/reference/notebook_files"


def build_corpus():
    base = os.path.join(ROOT, "corpus", "48000")
    names = {
        "clean_trainset_84spk_wav": [f"clean{i}.wav" for i in (1, 2, 3, 4, 5)],
        "clean_validset_84spk_wav": ["clean6.wav"],
        "clean_testset_wav": ["clean6.wav"],
        "noisy_trainset_84spk_wav": [f"noise{i}.wav" for i in (1, 2, 3, 4, 5)],
        "noisy_validset_84spk_wav": ["noise6.wav"],
        "noisy_testset_wav": ["noise6.wav"],
    }
    for sub, files in names.items():
        d = os.path.join(base, sub)
        os.makedirs(d, exist_ok=True)
        for f in files:
            dst = os.path.join(d, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(DEMO, f), dst)
    return base


def write_cfg(src, dst, overrides):
    import yaml
    with open(src) as f:
        cfg = yaml.safe_load(f)
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        yaml.safe_dump(cfg, f)
    return dst


class Tee:
    def __init__(self, path):
        self.f = open(path, "a")

    def write(self, s):
        self.f.write(s)
        self.f.flush()
        sys.__stderr__.write(s)

    def flush(self):
        self.f.flush()


def run_logged(fn, logpath):
    """Run fn() with the trainer's console logging captured to logpath."""
    import logging
    h = logging.StreamHandler(Tee(logpath))
    h.setFormatter(logging.Formatter("%(message)s"))
    root = logging.getLogger()
    old_level = root.level
    root.addHandler(h)
    root.setLevel(logging.INFO)
    try:
        t0 = time.time()
        fn()
        return time.time() - t0
    finally:
        root.removeHandler(h)
        root.setLevel(old_level)


def parse_curve(logpath):
    rows = {}
    # trainer console lines end with a period ("... = 107.7745.") — strip
    # it before float() (the first run crashed here after all training
    # completed; curves were reconstructed by tools/smoke_r05_reparse.py)
    pat = re.compile(r"\(Steps: (\d+)\) (\S+) = ([-\d.]+?)\.?\s*$")
    with open(logpath) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.setdefault(int(m.group(1)), {})[m.group(2)] = float(
                    m.group(3))
    return [{"step": s, **v} for s, v in sorted(rows.items())]


def main():
    os.makedirs(ROOT, exist_ok=True)
    corpus = build_corpus()
    cfgdir = os.path.join(ROOT, "configs")
    expdir = os.path.join(ROOT, "exp")
    data_path = os.path.dirname(corpus)  # configs use path + '48000'? no:
    # reference configs point data.path at corpus/48000 directly
    data_path = corpus

    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from dl_speech_enhancement_tpu.cli import train as train_cli
    from dl_speech_enhancement_tpu.cli import statistic as stat_cli

    results = {}

    # ---- autoencoder: phase 1 (0-250) + phase 2 adversarial (250-300) ----
    ae_cfg = write_cfg(
        os.path.join(REPO, "configs/autoencoder/symAD_vctk_48000_hop300.yaml"),
        os.path.join(cfgdir, "ae_smoke.yaml"),
        {
            "data.path": data_path,
            "batch_size": 4,
            "train_max_steps": 250,
            "adv_train_max_steps": 300,
            "start_steps.discriminator": 250,
            "save_interval_steps": 100,
            "eval_interval_steps": 100,
            "log_interval_steps": 10,
        })
    ae_log = os.path.join(ROOT, "ae.log")
    wall = run_logged(
        lambda: train_cli.main(["-c", ae_cfg, "--tag", "ae_smoke",
                                "--exp-root", expdir]),
        ae_log)
    results["ae_wall_s"] = round(wall, 1)

    # resume from the 300-step checkpoint for +50 adversarial steps
    ae_cfg2 = write_cfg(ae_cfg, os.path.join(cfgdir, "ae_smoke_resume.yaml"),
                        {"adv_train_max_steps": 350})
    wall = run_logged(
        lambda: train_cli.main(["-c", ae_cfg2, "--tag", "ae_smoke",
                                "--exp-root", expdir, "--resume"]),
        ae_log)
    results["ae_resume_wall_s"] = round(wall, 1)

    ae_ckpt = os.path.join(expdir, "autoencoder", "ae_smoke",
                           "checkpoint-350steps")
    assert os.path.isdir(ae_ckpt) or os.path.exists(ae_ckpt), ae_ckpt

    # ---- statistic (analyzer code stats for the vocoder input norm) ----
    stats_path = os.path.join(ROOT, "stats", "ae_smoke.npy")
    os.makedirs(os.path.dirname(stats_path), exist_ok=True)
    st_cfg = write_cfg(
        os.path.join(REPO,
                     "configs/statistic/symAD_vctk_48000_hop300_clean.yaml"),
        os.path.join(cfgdir, "stat_smoke.yaml"),
        {"data.path": data_path, "analyzer": ae_ckpt, "stats": stats_path})
    run_logged(lambda: stat_cli.main(["-c", st_cfg]),
               os.path.join(ROOT, "stat.log"))
    assert os.path.exists(stats_path)

    # ---- vocoder on the frozen smoke analyzer ----
    voc_cfg = write_cfg(
        os.path.join(
            REPO,
            "configs/vocoder/AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml"),
        os.path.join(cfgdir, "voc_smoke.yaml"),
        {
            "data.path": data_path,
            "analyzer": ae_ckpt,
            "generator_params.stats": stats_path,
            "batch_size": 4,
            "train_max_steps": 200,
            "save_interval_steps": 100,
            "eval_interval_steps": 100,
            "log_interval_steps": 10,
        })
    voc_log = os.path.join(ROOT, "voc.log")
    wall = run_logged(
        lambda: train_cli.main(["-c", voc_cfg, "--tag", "voc_smoke",
                                "--exp-root", expdir]),
        voc_log)
    results["voc_wall_s"] = round(wall, 1)

    results["ae_curve"] = parse_curve(ae_log)
    results["voc_curve"] = parse_curve(voc_log)
    with open(os.path.join(ROOT, "curves.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if not k.endswith("curve")}))
    for name in ("ae_curve", "voc_curve"):
        c = results[name]
        print(name, "first:", c[:1], "last:", c[-1:])


if __name__ == "__main__":
    main()

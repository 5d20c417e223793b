"""Analyzer code-statistics driver (codecStatistic equivalent).

Usage:
    python -m dl_speech_enhancement_tpu.cli.statistic \
        -c configs/statistic/symAD_vctk_48000_hop300_clean.yaml
"""

from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s (%(module)s) %(message)s")
logger = logging.getLogger(__name__)


def main(argv=None):
    from dl_speech_enhancement_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # persist jitted programs across CLI runs
    parser = ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--subset", default="train")
    parser.add_argument("--subset-num", type=int, default=-1)
    args = parser.parse_args(argv)

    import jax
    from dl_speech_enhancement_tpu.utils.config import (
        load_config, load_config_beside,
    )
    from dl_speech_enhancement_tpu.train.checkpoint import load_checkpoint
    from dl_speech_enhancement_tpu.train.workloads.statistic import (
        compute_statistics, save_statistics,
    )
    from dl_speech_enhancement_tpu.models import AudioDecGenerator
    from dl_speech_enhancement_tpu.data import SingleDataset

    config = load_config(args.config)
    analyzer_ckpt = config["analyzer"]
    a_config = load_config_beside(analyzer_ckpt)
    analyzer = AudioDecGenerator(**a_config["generator_params"], use_pqc=True)
    params_like, vq_like = analyzer.init(jax.random.PRNGKey(0))
    restored = load_checkpoint(
        analyzer_ckpt, like={"params_generator": params_like, "vq_state": vq_like}
    )
    dataset = SingleDataset(
        os.path.join(config["data"]["path"], config["data"]["subset"][args.subset]),
        sample_rate=config["sampling_rate"], subset_num=args.subset_num,
    )
    stats = compute_statistics(analyzer, restored["params_generator"],
                               restored["vq_state"], dataset)
    save_statistics(config["stats"], stats)
    logger.info("saved stats %s -> %s", stats.shape, config["stats"])


if __name__ == "__main__":
    main()

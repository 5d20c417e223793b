from dl_speech_enhancement_tpu.eval.metrics import (
    stoi,
    sdr,
    signal_noise_ratio,
    scale_invariant_sdr,
    mean_absolute_error,
    mel_l1,
    si_sdr_best_lag,
)
from dl_speech_enhancement_tpu.eval.dnsmos import ComputeScore

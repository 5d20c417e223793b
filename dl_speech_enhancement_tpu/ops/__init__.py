from dl_speech_enhancement_tpu.ops.mel_kernel import (
    fused_log_mel,
    make_fused_log_mel,
    make_fused_stft_magnitude,
)

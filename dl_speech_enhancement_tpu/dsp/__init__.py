from dl_speech_enhancement_tpu.dsp.stft import (
    hann_window,
    frame_signal,
    stft,
    stft_magnitude,
    spectrogram,
)
from dl_speech_enhancement_tpu.dsp.mel import (
    mel_filterbank,
    MelSpectrogram,
    log_mel_spectrogram,
)

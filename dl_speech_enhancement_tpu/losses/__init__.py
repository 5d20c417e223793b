from dl_speech_enhancement_tpu.losses.mel_loss import MultiMelSpectrogramLoss
from dl_speech_enhancement_tpu.losses.stft_loss import MultiResolutionSTFTLoss
from dl_speech_enhancement_tpu.losses.adversarial_loss import (
    GeneratorAdversarialLoss,
    DiscriminatorAdversarialLoss,
)
from dl_speech_enhancement_tpu.losses.feat_match_loss import FeatureMatchLoss
from dl_speech_enhancement_tpu.losses.waveform_loss import MultiWindowShapeLoss
from dl_speech_enhancement_tpu.losses.metrics import (
    signal_noise_ratio,
    scale_invariant_sdr,
    mean_absolute_error,
)

from dl_speech_enhancement_tpu.models.autoencoder import (
    Encoder,
    Decoder,
    Projector,
    AudioDecGenerator,
)
from dl_speech_enhancement_tpu.models.hifigan import (
    HiFiGANGenerator,
    HiFiGANDiscriminator,
)
from dl_speech_enhancement_tpu.models.discriminator import (
    HiFiGANPeriodDiscriminator,
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANScaleDiscriminator,
    HiFiGANMultiScaleDiscriminator,
    UnivNetSpectralDiscriminator,
    UnivNetMultiResolutionSpectralDiscriminator,
)
from dl_speech_enhancement_tpu.models.univnet import UnivNetDiscriminator

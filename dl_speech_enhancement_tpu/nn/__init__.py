from dl_speech_enhancement_tpu.nn.conv import (
    Conv1d,
    Conv1d1x1,
    ConvTranspose1d,
    CausalConv1d,
    CausalConvTranspose1d,
    Conv2d,
)
from dl_speech_enhancement_tpu.nn.vq import VectorQuantizeEMA, ResidualVQ, Quantizer

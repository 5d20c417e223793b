"""dl_speech_enhancement_tpu — a TPU-native (JAX/XLA/Pallas) speech-enhancement framework.

A from-scratch rebuild of the capabilities of ``s194584/dl-speech-enhancement``
(a streaming AudioDec-based speech codec / denoiser, see SURVEY.md): causal
convolutional encoder/decoder, residual vector quantization, HiFiGAN/UnivNet
vocoders and discriminators, GAN training loops, chunked streaming inference,
and evaluation tooling — re-designed TPU-first:

- compute path: pure-functional JAX lowered by XLA:TPU, Pallas kernels for hot ops
- parallelism: ``jax.sharding.Mesh`` + NamedSharding data parallelism over ICI
- streaming: explicit cache pytrees carried through jitted chunk steps
  (the reference's mutable per-layer ``pad_buffer`` state, functionalized)

Layout (mirrors SURVEY.md §7 target architecture):
    dsp/       STFT, mel filterbank, resampling
    nn/        functional layers: causal convs (+stream caches), weight norm, RVQ
    models/    AudioDec autoencoder (PQC & without-PQC), HiFiGAN, UnivNet, discriminators
    losses/    mel / multi-res STFT / shape / adversarial / feature-matching losses
    data/      host-side audio pipeline: wav io, splits, crops, SNR mixing
    train/     GAN trainer + the four workloads (autoencoder/vocoder/denoise/statistic)
    parallel/  device mesh + sharding helpers
    stream/    chunked streaming runtime (tx/rx split, multi-stream batching)
    eval/      metric battery, RTF bench, DNSMOS
    ops/       Pallas TPU kernels
    utils/     config system, facades, model zoo
    cli/       entry points matching the reference CLI contract
"""

__version__ = "0.1.0"

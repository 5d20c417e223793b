from dl_speech_enhancement_tpu.train.optim import (
    build_optimizer,
    build_optimizer_from_config,
)
from dl_speech_enhancement_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
from dl_speech_enhancement_tpu.train.gan_trainer import TrainerGAN
from dl_speech_enhancement_tpu.train.denoise_course import (
    train_denoise_course,
    make_course_steps,
)

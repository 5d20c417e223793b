from dl_speech_enhancement_tpu.data.audio_io import (
    read_wav,
    write_wav,
    resample,
    load_audio,
)
from dl_speech_enhancement_tpu.data.dataset import (
    AudioDataset,
    SingleDataset,
    MultiDataset,
    find_files,
    random_split,
)
from dl_speech_enhancement_tpu.data.collate import CollaterAudio, CollaterAudioPair
from dl_speech_enhancement_tpu.data.mixing import add_noise, noise_dropout
from dl_speech_enhancement_tpu.data.loader import (
    DataLoader,
    create_dataloader,
    get_dataloaders,
)

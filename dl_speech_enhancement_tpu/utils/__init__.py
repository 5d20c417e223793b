from dl_speech_enhancement_tpu.utils.config import load_config, save_config

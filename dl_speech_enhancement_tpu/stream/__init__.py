from dl_speech_enhancement_tpu.stream.runtime import (
    StreamingTransmitter,
    StreamingReceiver,
    AudioCodec,
    AudioCodecStreamer,
    VocoderReceiver,
    make_scan_stream,
    make_vocoder_scan_stream,
)

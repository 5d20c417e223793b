from dl_speech_enhancement_tpu.stream.runtime import (
    StreamingTransmitter,
    StreamingReceiver,
    AudioCodec,
    AudioCodecStreamer,
    make_scan_stream,
)

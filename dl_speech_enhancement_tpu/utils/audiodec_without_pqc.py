"""Without-PQC AudioDec facade (reference utils/audiodec_without_PQC.py).

The denoiser variant of the codec facade: projector/quantizer removed, raw
encoder features cross the tx->rx boundary (audiodec_without_PQC.py:85-92).
Thin aliases over utils.audiodec with ``use_pqc=False``.
"""

from __future__ import annotations

from dl_speech_enhancement_tpu.utils.audiodec import (
    AudioDec as _AudioDec,
    load_generator_from_checkpoint,
)


class AudioDec(_AudioDec):
    def __init__(self, checkpoint: str, batch: int = 1):
        super().__init__(checkpoint, use_pqc=False, batch=batch)


def load_without_pqc(checkpoint: str):
    """(gen, params, None, config) for a without-PQC checkpoint."""
    return load_generator_from_checkpoint(checkpoint, use_pqc=False)

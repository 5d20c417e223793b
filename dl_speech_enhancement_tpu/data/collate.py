"""Random-crop collaters producing fixed-shape (B, T, C) batches.

Reference dataloader/collater.py:18-87 — short clips are filtered, remaining
clips are randomly cropped to exactly ``batch_length``; the pair variant
crops both signals at the same offsets. Fixed output shapes are what keeps
the jitted train step compile-once on TPU.

Layout note: batches are (B, T, C) (channels-last) — the reference emits
(B, C, T).
"""

from __future__ import annotations

import numpy as np


class CollaterAudio:
    def __init__(self, batch_length: int = 9600, rng: np.random.Generator | None = None):
        self.batch_length = batch_length
        self.rng = rng or np.random.default_rng()

    def __call__(self, batch):
        xs = [b for b in batch if len(b) > self.batch_length]
        if not xs:
            return None
        starts = [self.rng.integers(0, len(x) - self.batch_length) for x in xs]
        return self._cut(xs, starts)

    def _cut(self, xs, starts):
        from dl_speech_enhancement_tpu.data import native
        if native.available() and all(
            x.dtype == np.float32 and x.shape[1:] == xs[0].shape[1:] for x in xs
        ):
            out = native.crop_batch(xs, np.asarray(starts, np.int64),
                                    self.batch_length)
            if out is not None:
                return out
        return np.stack(
            [x[s : s + self.batch_length] for x, s in zip(xs, starts)]
        ).astype(np.float32, copy=False)  # (B, T, C)


class CollaterAudioPair(CollaterAudio):
    def __call__(self, batch):
        batch = [
            b for b in batch
            if (len(b[0]) > self.batch_length) and (len(b[0]) == len(b[1]))
        ]
        assert len(batch) > 0, "No qualified audio pairs!"
        xs = [b[0] for b in batch]
        ns = [b[1] for b in batch]
        starts = [self.rng.integers(0, len(x) - self.batch_length) for x in xs]
        x_batch = self._cut(xs, starts)
        n_batch = self._cut(ns, starts)
        return n_batch, x_batch  # (input, output) like collater.py:87

"""Datasets: course-style recursive wav scan + AudioDec file-list datasets.

- :class:`AudioDataset` — reference dataloader/AudioDataset.py:8-36:
  recursive glob of ``.wav`` files 1-2 directories deep, loaded + resampled
  to the target rate, items are (T, C) float32.
- :class:`SingleDataset` / :class:`MultiDataset` — reference
  dataloader/dataset.py:20-152: directory / list / file-of-paths resolution,
  sorted files with utterance ids, optional subset; the multi variant zips N
  parallel corpora (e.g. noisy+clean) with length checking.
- :func:`find_files` — reference dataloader/utils.py (os.walk + fnmatch).
"""

from __future__ import annotations

import fnmatch
import glob
import os

import numpy as np

from dl_speech_enhancement_tpu.data.audio_io import load_audio


def load_files(data_path: str, query: str = "*.wav", num_core: int = 1):
    """Sorted file scan split into ``num_core`` chunks (reference
    dataloader/utils.py — feeds the multiprocess resampler)."""
    files = sorted(find_files(data_path, query))
    if num_core <= 1:
        return files
    return [list(chunk) for chunk in np.array_split(files, num_core) if len(chunk)]


def find_files(root_dir: str, query: str = "*.wav", include_root_dir: bool = True):
    files = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            files.append(os.path.join(root, filename))
    files = sorted(files)
    if not include_root_dir:
        files = [f.replace(root_dir + "/", "") for f in files]
    return files


class AudioDataset:
    """Recursive scan 1-2 levels deep (AudioDataset.py:14-24)."""

    def __init__(self, audio_dir: str, audio_root: str, sample_rate: int):
        self.audio_dir = audio_dir
        self.sample_rate = sample_rate
        names = []
        for depth in range(1, 3):
            pattern = audio_dir + "/*" * depth + ".wav"
            for filename in glob.glob(pattern):
                names.append(
                    filename.replace("\\", "/").split(audio_root + "/")[-1]
                )
        self.audio_file_names = names

    def __len__(self):
        return len(self.audio_file_names)

    def __getitem__(self, idx: int) -> np.ndarray:
        path = os.path.join(self.audio_dir, self.audio_file_names[idx])
        return load_audio(path, self.sample_rate)


def _resolve_files(files) -> list[str]:
    """dir / list / *.scp file-of-paths -> sorted file list (dataset.py:30-55)."""
    if isinstance(files, (list, tuple)):
        return sorted(files)
    if os.path.isdir(files):
        return find_files(files)
    if os.path.isfile(files):
        if files.endswith(".wav"):
            return [files]
        with open(files) as f:
            return [line.strip() for line in f if line.strip()]
    raise ValueError(f"{files} is not a valid file source")


class SingleDataset:
    def __init__(self, files, query="*.wav", load_fn="audio", return_utt_id=False,
                 subset_num=-1, sample_rate=None):
        del query
        self.return_utt_id = return_utt_id
        self.sample_rate = sample_rate
        self.filenames = _resolve_files(files)
        if subset_num > 0:
            self.filenames = self.filenames[:subset_num]
        self.utt_ids = [
            os.path.splitext(os.path.basename(f))[0] for f in self.filenames
        ]
        assert load_fn == "audio"

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, idx: int):
        data = load_audio(self.filenames[idx], self.sample_rate)
        if self.return_utt_id:
            return self.utt_ids[idx], data
        return data


class MultiDataset:
    """N parallel corpora, length-checked (dataset.py:99-152)."""

    def __init__(self, multi_files, queries=None, load_fns=None,
                 return_utt_id=False, subset_num=-1, sample_rate=None):
        del queries, load_fns
        self.return_utt_id = return_utt_id
        self.file_lists = [_resolve_files(f) for f in multi_files]
        if subset_num > 0:
            self.file_lists = [fl[:subset_num] for fl in self.file_lists]
        lengths = {len(fl) for fl in self.file_lists}
        assert len(lengths) == 1, "file lists have mismatched lengths"
        self.sample_rate = sample_rate
        self.utt_ids = [
            os.path.splitext(os.path.basename(f))[0] for f in self.file_lists[0]
        ]

    def __len__(self):
        return len(self.file_lists[0])

    def __getitem__(self, idx: int):
        items = [load_audio(fl[idx], self.sample_rate) for fl in self.file_lists]
        if self.return_utt_id:
            return self.utt_ids[idx], items
        return items


class Subset:
    """View of a dataset through an index list (torch random_split analogue)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def random_split(dataset, fractions, seed: int):
    """Seeded split into len(fractions) Subsets (torch random_split analogue,
    used for the leakage-free 70/15/15 split, data_utils.py:38-51)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    sizes = [int(np.floor(f * n)) for f in fractions]
    # torch.random_split semantics: round-robin the rounding remainder
    # over the splits starting from the FIRST (not all to the last)
    for i in range(n - sum(sizes)):
        sizes[i % len(sizes)] += 1
    out, ofs = [], 0
    for s in sizes:
        out.append(Subset(dataset, perm[ofs : ofs + s]))
        ofs += s
    return out

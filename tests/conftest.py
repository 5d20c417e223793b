"""Test env: force a virtual 8-device CPU mesh before JAX initializes.

Multi-chip sharding paths are validated on ``--xla_force_host_platform_
device_count=8`` CPU devices (no multi-chip TPU hardware is available in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container pins JAX_PLATFORMS=axon (single real TPU chip behind a
# tunnel); tests run on a virtual 8-device CPU backend instead, so sharding
# paths execute without the hardware.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE.is_dir()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def add_reference_to_path():
    """Make the read-only upstream repo importable (parity tests only)."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="upstream reference repo not mounted"
)

# shared small-but-complete generator topology for the checkpoint
# import/export golden suites (both sides must test the SAME model)
SMALL_TOPOLOGY = dict(
    encode_channels=8, decode_channels=8, code_dim=16, codebook_num=2,
    codebook_size=32, enc_ratios=(2, 4), dec_ratios=(4, 2),
    enc_strides=(3, 4), dec_strides=(4, 3),
)


def stub_torchaudio():
    """Reference model modules import torchaudio at module scope (for the
    MRSD spectrogram); it is not installed here — stub just enough for the
    imports used by the non-MRSD parity tests."""
    import sys
    import types

    if "torchaudio" in sys.modules:
        return
    ta = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")
    func.spectrogram = lambda *a, **k: None
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = func
    ta.functional = func

"""Test config: force an 8-device virtual CPU mesh before JAX imports.

This is the TPU-native substitute for the reference's missing distributed
tests (SURVEY.md §4): sharding/pjit paths are validated on host CPU with
XLA's virtual device partitioning.
"""
import os

# The image's sitecustomize registers the axon TPU plugin at interpreter
# start and pins jax_platforms="axon,cpu"; env vars alone don't override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_active_mesh():
    """Trainer construction registers its mesh in the fused-routing
    registry (trainer.py set_active_mesh) and tests that build a Trainer
    would otherwise leak an 8-virtual-device mesh into later tests,
    flipping fused-path divisibility checks (e.g. a B=3 fused chunk test
    suddenly routes 3 % 8 → ineligible). Reset the registry around every
    test; tests that want a mesh use the active_mesh context manager."""
    from masr_tpu.parallel.mesh import set_active_mesh
    set_active_mesh(None)
    yield
    set_active_mesh(None)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def test_wav_path(tmp_path_factory):
    """A deterministic synthetic 16 kHz test WAV (2 s: tone + noise bursts)."""
    from masr_tpu.audio.io import write_wave
    rs = np.random.RandomState(0)
    sr = 16000
    t = np.arange(2 * sr) / sr
    sig = 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    sig += 0.05 * rs.standard_normal(len(t)).astype(np.float32)
    path = tmp_path_factory.mktemp("audio") / "test.wav"
    write_wave(path, sig, sr)
    return str(path)

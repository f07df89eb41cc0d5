"""Checkpoint averaging tool: arithmetic, layout, and resume-slot
compatibility (tools/avg_checkpoints.py)."""
import importlib.util
import os

import jax.numpy as jnp
import numpy as np

from masr_tpu.training import checkpoints as ckpt

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "avg_checkpoints", os.path.join(_TOOLS, "avg_checkpoints.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _state(scale, step):
    return {"step": jnp.asarray(step, jnp.int32),
            "params": {"dense": {"kernel": jnp.full((3, 2), scale,
                                                    jnp.float32),
                                 "bias": jnp.full((2,), -scale,
                                                  jnp.float32)}},
            "opt_state": {"mu": jnp.full((3, 2), 10.0 * scale, jnp.float32)}}


def test_average_checkpoints_math_and_resume(tmp_path):
    tool = _load_tool()
    save_dir = str(tmp_path / "models")
    for epoch, scale in ((1, 1.0), (2, 2.0), (3, 6.0)):
        ckpt.save_checkpoint(save_dir, epoch, _state(scale, epoch * 100),
                             metrics={"test_cer": 1.0 / epoch})
    found = tool.list_epoch_checkpoints(save_dir)
    assert [e for e, _ in found] == [1, 2, 3]
    out = tool.average_checkpoints([p for _, p in found],
                                   str(tmp_path / "avg"))
    restored, meta = ckpt.load_checkpoint(out, _state(0.0, 0))
    np.testing.assert_allclose(restored["params"]["dense"]["kernel"],
                               np.full((3, 2), 3.0))  # mean(1, 2, 6)
    np.testing.assert_allclose(restored["params"]["dense"]["bias"],
                               np.full((2,), -3.0))
    # non-averaged leaves come from the NEWEST checkpoint
    assert int(restored["step"]) == 300
    np.testing.assert_allclose(restored["opt_state"]["mu"],
                               np.full((3, 2), 60.0))
    assert meta["averaged_from"] == ["epoch_1", "epoch_2", "epoch_3"]
    assert meta["test_cer"] == 1.0 / 3  # metadata carried from newest


def test_cli_last_n(tmp_path):
    import subprocess
    import sys
    save_dir = str(tmp_path / "models")
    for epoch in (1, 2, 3, 4):
        ckpt.save_checkpoint(save_dir, epoch, _state(float(epoch), epoch),
                             keep_last=10)
    tool = os.path.join(_TOOLS, "avg_checkpoints.py")
    # the image's sitecustomize pins the axon TPU plugin; force the
    # subprocess onto CPU (same dance as conftest.py, but via env the
    # plugin honors)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, tool, "--checkpoints_dir", save_dir,
                        "--num", "2"], capture_output=True, text=True,
                       env=env)
    assert r.returncode == 0, r.stderr
    restored, meta = ckpt.load_checkpoint(
        os.path.join(save_dir, "avg_model"), _state(0.0, 0))
    np.testing.assert_allclose(restored["params"]["dense"]["kernel"],
                               np.full((3, 2), 3.5))  # mean(3, 4)
    assert meta["averaged_from"] == ["epoch_3", "epoch_4"]

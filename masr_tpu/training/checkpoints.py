"""Checkpoint management (parity: trainer.py:266-321 semantics):
per-epoch directories `epoch_N/` with model state + `model.state` JSON
(last_epoch, error rates, version), plus `best_model/` and `last_model/`
copies; epoch N-3 garbage-collected. Orbax handles the array I/O.
"""
import json
import os
import shutil

import orbax.checkpoint as ocp

from masr_tpu import __version__
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(save_dir, epoch, train_state_pytree, metrics=None,
                    best=False, keep_last=3):
    """Write epoch_N + refresh last_model (and best_model if best)."""
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"epoch_{epoch}")
    ckptr = _ckptr()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(os.path.join(path, "state"), train_state_pytree)
    ckptr.wait_until_finished()
    state_json = {"last_epoch": int(epoch), "version": __version__}
    state_json.update(metrics or {})
    with open(os.path.join(path, "model.state"), "w", encoding="utf-8") as f:
        json.dump(state_json, f)
    _refresh_copy(path, os.path.join(save_dir, "last_model"))
    if best:
        _refresh_copy(path, os.path.join(save_dir, "best_model"))
    old = os.path.join(save_dir, f"epoch_{epoch - keep_last}")
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
    logger.info(f"checkpoint saved: {path}")
    return path


def _refresh_copy(src, dst):
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)


def load_checkpoint(path, template_pytree):
    """Restore a checkpoint dir → (pytree, state_json)."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    restored = ckptr.restore(os.path.join(path, "state"), template_pytree)
    meta_path = os.path.join(path, "model.state")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
    return restored, meta


def latest_checkpoint(save_dir):
    """→ last_model path if it exists (auto-resume, trainer.py:266-272)."""
    p = os.path.join(os.path.abspath(save_dir), "last_model")
    return p if os.path.exists(os.path.join(p, "model.state")) else None


def load_pretrained(params, pretrained_path, template):
    """Shape-checked partial load (parity: trainer.py:243-264): params whose
    name+shape match are copied, the rest keep their fresh init."""
    import jax
    restored, _ = load_checkpoint(pretrained_path, template)
    src_params = restored["params"] if "params" in restored else restored

    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src_params)[0])
    merged, skipped = {}, 0
    for k, v in flat_new.items():
        s = flat_src.get(k)
        if s is not None and getattr(s, "shape", None) == v.shape:
            merged[k] = s
        else:
            merged[k] = v
            skipped += 1
    if skipped:
        logger.warning(f"pretrained load skipped {skipped} mismatched tensors")
    leaves = [merged[k] for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)

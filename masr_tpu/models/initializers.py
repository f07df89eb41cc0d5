"""Reference (PyTorch) default parameter initialization.

The reference's model classes inherit torch's module defaults nearly
everywhere (e.g. nn.Linear/nn.Conv*d: kaiming_uniform(a=√5) ⇒
U(±1/√fan_in) weights AND U(±1/√fan_in) biases; reference
masr/model_utils/conformer/*.py define no explicit inits except the
xavier pos biases). flax defaults differ (lecun_normal kernels — 3× the
variance of torch's uniform — and ZERO biases), which measurably changes
optimization trajectories on fresh training runs: the round-4
head-to-head showed masr_tpu descending faster but generalizing worse at
a hard operating point until inits were matched.

`torch_default_reinit` redraws an already-initialized param tree with
torch-default distributions inferred from shapes:

- 'kernel' (ndim ≥ 2):  U(±1/√fan_in), fan_in = prod(shape[:-1])
  (torch kaiming_uniform(a=√5) on Linear/Conv weights; conv fan_in
  includes the receptive field, matching torch's layout)
- 'bias' with a sibling kernel: U(±1/√fan_in) of that kernel
  (torch Linear/Conv bias default)
- 'embedding': N(0, 1) (torch nn.Embedding default)
- everything else (LayerNorm/BatchNorm scales+biases, pos_bias_u/v —
  xavier in BOTH frameworks — AdaptiveScale, CMVN stats) is left as
  initialized.

Torch RNN cells draw ALL weights/biases U(±1/√hidden); the generic
kernel rule uses each matrix's own fan_in instead (input-to-hidden
kernels differ when input ≠ hidden) — close in practice and documented
here. Enable per training run with `train_conf.init_type:
torch_default` (the harness tools/head_to_head.py uses it for the
accuracy-parity measurement).
"""
import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["torch_default_reinit"]


def _redraw(key, name, arr, sibling_kernel):
    if name == "embedding" and arr.ndim == 2:
        return jax.random.normal(key, arr.shape, jnp.float32).astype(
            arr.dtype)
    if name == "kernel" and arr.ndim >= 2:
        fan_in = int(np.prod(arr.shape[:-1]))
        b = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, arr.shape, jnp.float32, -b,
                                  b).astype(arr.dtype)
    if name == "bias" and sibling_kernel is not None \
            and sibling_kernel.ndim >= 2:
        fan_in = int(np.prod(sibling_kernel.shape[:-1]))
        b = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, arr.shape, jnp.float32, -b,
                                  b).astype(arr.dtype)
    return arr


def torch_default_reinit(params, rng):
    """params: a flax 'params' tree (dict of dicts/arrays) → same tree
    with torch-default distributions redrawn (see module docstring).
    Deterministic in (tree structure, rng)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    # index sibling kernels by their parent path for the bias rule
    kernels = {path[:-1]: arr for path, arr in flat
               if getattr(path[-1], "key", None) == "kernel"}
    out = []
    for i, (path, arr) in enumerate(flat):
        name = getattr(path[-1], "key", None)
        key = jax.random.fold_in(rng, i)
        out.append(_redraw(key, name, arr, kernels.get(path[:-1])))
    return jax.tree_util.tree_unflatten(treedef, out)

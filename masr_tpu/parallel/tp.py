"""Tensor parallelism via GSPMD sharding rules (beyond the reference —
its only parallelism is DDP data parallel, SURVEY.md §2.14/§5.8; on TPU
a 2-D (data, model) mesh over ICI lets one model span chips).

Megatron-style column/row sharding of the transformer matmuls, expressed
as PartitionSpec rules over param paths; XLA inserts the collectives
(all-reduce after row-parallel matmuls, gradient psums over the data
axis). Attention q/k/v/pos projections are column-parallel (heads split
across the model axis), the output projection row-parallel; feed-forward
w_1 column / w_2 row. The conv module, embeddings, norms, CTC head, and
decoder output stay replicated (small, and GLU/depthwise channel pairing
would force reshards).

Optimizer state (adam mu/nu are params-shaped subtrees) inherits the same
shardings by path-suffix matching, so per-chip optimizer memory scales
down with the model axis too.
"""
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder) — first match wins; default replicated.
# Paths are "/"-joined param-tree keys, e.g.
# "encoder/layer_3/self_attn/linear_q/kernel".
TP_RULES = [
    (re.compile(r".*/(linear_q|linear_k|linear_v|linear_pos)/kernel$"),
     P(None, "model")),
    (re.compile(r".*/(linear_q|linear_k|linear_v)/bias$"), P("model")),
    (re.compile(r".*/pos_bias_[uv]$"), P("model", None)),
    (re.compile(r".*/linear_out/kernel$"), P("model", None)),
    (re.compile(r".*/w_1/kernel$"), P(None, "model")),
    (re.compile(r".*/w_1/bias$"), P("model")),
    (re.compile(r".*/w_2/kernel$"), P("model", None)),
]


def make_mesh_2d(tensor_parallel=1, devices=None):
    """(data, model) mesh: model axis innermost so TP collectives ride
    the fastest ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % tensor_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"tensor_parallel={tensor_parallel}")
    grid = np.asarray(devices).reshape(n // tensor_parallel, tensor_parallel)
    return Mesh(grid, ("data", "model"))


def _path_str(path):
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def _spec_for(path_str, leaf, mesh, rules):
    for pattern, spec in rules:
        if pattern.match(path_str):
            # drop the rule if the sharded dim doesn't divide evenly
            ok = True
            for dim, axis in zip(leaf.shape, spec):
                if axis is not None and dim % mesh.shape[axis]:
                    ok = False
                    break
            if ok and len(spec) <= len(leaf.shape):
                return spec
            return P()
    return P()


def param_shardings(params, mesh, rules=None):
    """params pytree → matching NamedSharding pytree (TP rules applied,
    everything else replicated)."""
    rules = rules if rules is not None else TP_RULES
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        out[jax.tree_util.keystr(path)] = NamedSharding(
            mesh, _spec_for(_path_str(path), leaf, mesh, rules))

    def build(path, leaf):
        return out[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(build, params)


def shard_params(params, mesh, rules=None):
    return jax.device_put(params, param_shardings(params, mesh, rules))


def shard_opt_state(opt_state, params, mesh, rules=None):
    """Shard optimizer-state leaves that mirror a parameter (adam mu/nu,
    MultiSteps accumulators): a leaf whose path SUFFIX matches a param
    path (and shape matches) gets that param's sharding; scalars and
    counters replicate."""
    rules = rules if rules is not None else TP_RULES
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_suffix = {}
    for path, leaf in p_flat:
        key = tuple(_path_str((p,)) for p in path)
        by_suffix[key] = (leaf.shape,
                          NamedSharding(mesh,
                                        _spec_for(_path_str(path), leaf,
                                                  mesh, rules)))
    repl = NamedSharding(mesh, P())

    def put(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return jax.device_put(leaf, repl)
        parts = tuple(_path_str((p,)) for p in path)
        for n in range(len(parts), 0, -1):
            hit = by_suffix.get(parts[-n:])
            if hit is not None and hit[0] == leaf.shape:
                return jax.device_put(leaf, hit[1])
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(put, opt_state)


def shard_train_state(state, mesh, rules=None):
    """TrainState → same state with params/opt_state placed per TP rules
    (batch_stats and step replicate)."""
    params = shard_params(state.params, mesh, rules)
    opt_state = shard_opt_state(state.opt_state, state.params, mesh, rules)
    repl = NamedSharding(mesh, P())
    batch_stats = jax.device_put(state.batch_stats, repl) \
        if state.batch_stats is not None else None
    return state.replace(params=params, opt_state=opt_state,
                         batch_stats=batch_stats,
                         step=jax.device_put(state.step, repl))

"""Weight-conversion parity for Squeezeformer and Efficient-Conformer
encoders vs the reference PyTorch implementations."""
import sys
import types
import typing

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    for name in ["av", "soundfile", "resampy", "pydub", "zhconv",
                 "torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi"]:
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            mod.AudioSegment = object
            mod.convert = lambda *a, **k: a[0] if a else ""
            mod.mfcc = mod.fbank = None
            sys.modules[name] = mod
    # the reference's Conv2dValid imports private typing symbols removed
    # from newer torch; restore them
    import torch.nn.modules.conv as tconv
    tconv.Union = typing.Union
    tconv.Optional = typing.Optional
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    yield


FEAT = 80


def test_squeezeformer_encoder_parity():
    import jax
    import jax.numpy as jnp
    from masr.model_utils.squeezeformer.encoder import \
        SqueezeformerEncoder as TorchEnc
    from masr_tpu.models.squeezeformer import \
        SqueezeformerEncoder as FlaxEnc
    from masr_tpu.models.convert import apply_converted, convert_squeezeformer
    from flax.traverse_util import flatten_dict, unflatten_dict

    kw = dict(input_size=FEAT, encoder_dim=32, output_size=32,
              attention_heads=2, num_blocks=4, reduce_idx=1, recover_idx=3,
              feed_forward_expansion_factor=2, cnn_module_kernel=7,
              causal=True, time_reduction_layer_type="stream")
    torch.manual_seed(9)
    t_enc = TorchEnc(input_dropout_rate=0.0, feed_forward_dropout_rate=0.0,
                     attention_dropout_rate=0.0, dropout=0.1, **kw)
    t_enc.eval()
    sd = {("encoder." + k): v.detach().numpy()
          for k, v in t_enc.state_dict().items()}
    params_c, bstats_c, misses = convert_squeezeformer(sd, FEAT, 32)
    assert not misses, f"unmapped: {misses[:6]}"

    f_enc = FlaxEnc(input_dropout_rate=0.0, feed_forward_dropout_rate=0.0,
                    attention_dropout_rate=0.0, dropout=0.0, **kw)
    rs = np.random.RandomState(2)
    x = rs.standard_normal((2, 131, FEAT)).astype(np.float32)
    lens = np.array([131, 111])
    variables = f_enc.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), jnp.asarray(lens),
                           decoding_chunk_size=-1)
    params = apply_converted({"encoder": variables["params"]}, params_c,
                             strict=True)["encoder"]
    bstats = apply_converted({"encoder": variables["batch_stats"]}, bstats_c,
                             strict=True)["encoder"]

    with torch.no_grad():
        t_out, t_mask = t_enc(torch.from_numpy(x), torch.from_numpy(lens),
                              decoding_chunk_size=-1,
                              num_decoding_left_chunks=-1)
    f_out, f_mask = f_enc.apply({"params": params, "batch_stats": bstats},
                                jnp.asarray(x), jnp.asarray(lens),
                                decoding_chunk_size=-1)
    valid = np.asarray(f_mask[:, 0, :])
    diff = np.abs(t_out.numpy() - np.asarray(f_out))[valid]
    assert diff.max() < 3e-3, f"squeezeformer diverges: {diff.max()}"


def test_efficient_conformer_encoder_parity():
    import jax
    import jax.numpy as jnp
    from masr.model_utils.efficient_conformer.encoder import \
        EfficientConformerEncoder as TorchEnc
    from masr_tpu.models.efficient_conformer import \
        EfficientConformerEncoder as FlaxEnc
    from masr_tpu.models.convert import (apply_converted,
                                         convert_efficient_conformer)

    eff = dict(stride_layer_idx=[1], stride=[2], group_layer_idx=[0, 1],
               group_size=3, stride_kernel=True)
    torch.manual_seed(13)
    t_enc = TorchEnc(input_size=FEAT, output_size=32, attention_heads=2,
                     linear_units=48, num_blocks=4, dropout_rate=0.0,
                     positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                     cnn_module_kernel=8, cnn_module_norm="layer_norm",
                     causal=True, **eff)
    t_enc.eval()
    sd = {("encoder." + k): v.detach().numpy()
          for k, v in t_enc.state_dict().items()}
    params_c, bstats_c, misses = convert_efficient_conformer(
        sd, FEAT, 32, group_layer_idx=eff["group_layer_idx"])
    assert not misses, f"unmapped: {misses[:6]}"

    f_enc = FlaxEnc(input_size=FEAT, output_size=32, attention_heads=2,
                    linear_units=48, num_blocks=4, dropout_rate=0.0,
                    positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                    cnn_module_kernel=8, cnn_module_norm="layer_norm",
                    causal=True, efficient_conf=eff)
    rs = np.random.RandomState(4)
    x = rs.standard_normal((2, 131, FEAT)).astype(np.float32)
    lens = np.array([131, 111])
    variables = f_enc.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), jnp.asarray(lens),
                           decoding_chunk_size=-1)
    params = apply_converted({"encoder": variables["params"]}, params_c,
                             strict=True)["encoder"]
    assert not bstats_c  # layer_norm config → no running stats

    with torch.no_grad():
        t_out, t_mask = t_enc(torch.from_numpy(x), torch.from_numpy(lens),
                              decoding_chunk_size=-1,
                              num_decoding_left_chunks=-1)
    f_out, f_mask = f_enc.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(lens), decoding_chunk_size=-1)
    valid = np.asarray(f_mask[:, 0, :])
    diff = np.abs(t_out.numpy() - np.asarray(f_out))[valid]
    assert diff.max() < 3e-3, f"efficient_conformer diverges: {diff.max()}"

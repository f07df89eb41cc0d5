"""Convert reference-MASR PyTorch checkpoints to masr_tpu flax params.

Supports the Conformer family (encoder + BiTransformerDecoder + CTC head)
and DeepSpeech2 (conv + LSTM CRNN + CTC). Users of the reference can
migrate their published `model.pt` state dicts directly:

    python tools/convert_masr_checkpoint.py --configs configs/conformer.yml \
        --torch_model model.pt --save_dir models/...

Layout notes encoded here:
- torch Linear (out, in) → flax Dense kernel (in, out)
- torch Conv2d OIHW → flax HWIO
- torch Conv1d pointwise (out, in, 1) → Dense (in, out)
- torch depthwise Conv1d (C, 1, k) → flax (k, 1, C) with feature groups
- subsampling flatten order: torch (B,T,C,F)→C-major, flax (B,T,F,C)→F-major
  ⇒ the first linear after the convs gets its input dim permuted
- torch LSTM fused (4H, in) gates [i,f,g,o] → flax per-gate kernels; the
  two torch biases sum into flax's h-gate biases
"""
import re

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict


def _t(w):
    return np.asarray(w).T


def _conv2d(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW → HWIO


def _dw_conv1d(w):
    return np.transpose(np.asarray(w), (2, 1, 0))  # (C,1,k) → (k,1,C)


def _pw_conv1d(w):
    return np.asarray(w)[:, :, 0].T  # (out,in,1) → (in,out)


def _subsample_linear(w, odim, freq):
    """Permute the post-subsampling linear's input dim from torch's
    channel-major (c*freq+f) to flax's freq-major (f*odim+c) flatten order.
    w: torch (out, odim*freq) → flax kernel (freq*odim, out)."""
    w = np.asarray(w)
    out = w.shape[0]
    w = w.reshape(out, odim, freq)            # (out, c, f)
    w = np.transpose(w, (2, 1, 0))            # (f, c, out)
    return w.reshape(freq * odim, out)


def _conv_freq_out(idim):
    return ((idim - 3) // 2 + 1 - 3) // 2 + 1


def convert_conformer_family(state_dict, input_dim, conv_odim):
    """torch state_dict (name → ndarray) → flat flax param dict
    {('encoder','layer_0',...): ndarray}. Works for conformer and (with the
    shared key grammar) the reference's transformer decoder + CTC head."""
    freq = _conv_freq_out(input_dim)
    out = {}
    misses = []
    state_dict = {k: v for k, v in state_dict.items()
                  if not k.endswith("num_batches_tracked")}
    for key, w in state_dict.items():
        w = np.asarray(w)
        k = key
        # --------------- encoder embed --------------- #
        if k == "encoder.embed.conv.0.weight":
            out[("encoder", "embed", "conv1", "kernel")] = _conv2d(w)
        elif k == "encoder.embed.conv.0.bias":
            out[("encoder", "embed", "conv1", "bias")] = w
        elif k == "encoder.embed.conv.2.weight":
            out[("encoder", "embed", "conv2", "kernel")] = _conv2d(w)
        elif k == "encoder.embed.conv.2.bias":
            out[("encoder", "embed", "conv2", "bias")] = w
        elif k == "encoder.embed.out.0.weight":
            out[("encoder", "embed", "out", "kernel")] = _subsample_linear(
                w, conv_odim, freq)
        elif k == "encoder.embed.out.0.bias":
            out[("encoder", "embed", "out", "bias")] = w
        elif k in ("encoder.after_norm.weight", "encoder.after_norm.bias"):
            part = "scale" if k.endswith("weight") else "bias"
            out[("encoder", "after_norm", part)] = w
        # --------------- encoder layers --------------- #
        elif (m := re.match(r"encoder\.encoders\.(\d+)\.(.+)", k)):
            i, rest = m.group(1), m.group(2)
            conv = _convert_encoder_layer_param(("encoder", f"layer_{i}"),
                                                rest, w)
            if conv is None:
                misses.append(k)
            else:
                out.update(conv)
        # --------------- ctc --------------- #
        elif k == "ctc.ctc_lo.weight" or k == "decoder.ctc_lo.weight":
            out[("ctc", "ctc_lo", "kernel")] = _t(w)
        elif k == "ctc.ctc_lo.bias" or k == "decoder.ctc_lo.bias":
            out[("ctc", "ctc_lo", "bias")] = w
        # --------------- attention decoder --------------- #
        elif (m := re.match(r"decoder\.(left|right)_decoder\.(.+)", k)):
            side, rest = m.group(1) + "_decoder", m.group(2)
            conv = _convert_decoder_param(("decoder", side), rest, w)
            if conv is None:
                misses.append(k)
            else:
                out.update(conv)
        else:
            misses.append(k)
    return out, misses


def _norm(base, name, suffix, w):
    part = "scale" if suffix == "weight" else "bias"
    return {base + (name, part): w}


def _convert_encoder_layer_param(base, rest, w):
    # attention
    if (m := re.match(r"self_attn\.(linear_(?:q|k|v|out|pos))\.(weight|bias)",
                      rest)):
        name, suffix = m.group(1), m.group(2)
        val = _t(w) if suffix == "weight" else w
        part = "kernel" if suffix == "weight" else "bias"
        return {base + ("self_attn", name, part): val}
    if rest in ("self_attn.pos_bias_u", "self_attn.pos_bias_v"):
        return {base + ("self_attn", rest.split(".")[1]): w}
    # feed forwards
    if (m := re.match(r"(feed_forward(?:_macaron)?)\.(w_[12])\.(weight|bias)",
                      rest)):
        ffn, wn, suffix = m.groups()
        val = _t(w) if suffix == "weight" else w
        part = "kernel" if suffix == "weight" else "bias"
        return {base + (ffn, wn, part): val}
    # conv module
    if (m := re.match(r"conv_module\.pointwise_conv([12])\.(weight|bias)",
                      rest)):
        n, suffix = m.groups()
        if suffix == "weight":
            return {base + ("conv_module", f"pointwise_conv{n}", "kernel"):
                    _pw_conv1d(w)}
        return {base + ("conv_module", f"pointwise_conv{n}", "bias"): w}
    if (m := re.match(r"conv_module\.depthwise_conv\.(weight|bias)", rest)):
        if m.group(1) == "weight":
            return {base + ("conv_module", "depthwise_conv", "kernel"):
                    _dw_conv1d(w)}
        return {base + ("conv_module", "depthwise_conv", "bias"): w}
    if (m := re.match(r"conv_module\.norm\.(weight|bias)", rest)):
        return _norm(base + ("conv_module",), "norm", m.group(1), w)
    # layer norms
    if (m := re.match(r"(norm_(?:ff_macaron|ff|mha|conv|final))\.(weight|bias)",
                      rest)):
        return _norm(base, m.group(1), m.group(2), w)
    return None


def _convert_decoder_param(base, rest, w):
    if rest == "embed.0.weight":
        return {base + ("embed", "embedding"): np.asarray(w)}
    if (m := re.match(r"after_norm\.(weight|bias)", rest)):
        return _norm(base, "after_norm", m.group(1), w)
    if (m := re.match(r"output_layer\.(weight|bias)", rest)):
        part = "kernel" if m.group(1) == "weight" else "bias"
        return {base + ("output_layer", part):
                _t(w) if m.group(1) == "weight" else w}
    if (m := re.match(r"decoders\.(\d+)\.(.+)", rest)):
        i, sub = m.groups()
        lbase = base + (f"layer_{i}",)
        if (m2 := re.match(
                r"(self_attn|src_attn)\.(linear_(?:q|k|v|out))\.(weight|bias)",
                sub)):
            att, name, suffix = m2.groups()
            val = _t(w) if suffix == "weight" else w
            part = "kernel" if suffix == "weight" else "bias"
            return {lbase + (att, name, part): val}
        if (m2 := re.match(r"feed_forward\.(w_[12])\.(weight|bias)", sub)):
            wn, suffix = m2.groups()
            val = _t(w) if suffix == "weight" else w
            part = "kernel" if suffix == "weight" else "bias"
            return {lbase + ("feed_forward", wn, part): val}
        if (m2 := re.match(r"(norm[123])\.(weight|bias)", sub)):
            return _norm(lbase, m2.group(1), m2.group(2), w)
    return None


def convert_deepspeech2(state_dict, input_dim, conv_odim=32):
    """torch DS2 state_dict → flat flax params.

    LSTM: torch fused gates [i,f,g,o]; flax biases live on the h-gates.
    GRU:  torch fused gates [r,z,n]; flax GRUCell has ir/iz/in (+bias),
    hr/hz (no bias), hn (+bias) — torch's b_hr/b_hz fold into ir/iz
    biases (r = σ(W_ir x + b_ir + W_hr h + b_hr)), b_hn stays on hn
    (n = tanh(W_in x + b_in + r⊙(W_hn h + b_hn)), same formula both)."""
    freq = _conv_freq_out(input_dim)
    # LSTM (4 gates) vs GRU (3): read the gate count off any hh matrix
    n_gates = 4
    for key, w in state_dict.items():
        if re.search(r"rnn\.weight_hh_l0(_reverse)?$", key):
            w = np.asarray(w)
            n_gates = w.shape[0] // w.shape[1]
            break
    out = {}
    misses = []
    for key, w in state_dict.items():
        w = np.asarray(w)
        k = key
        if k == "encoder.conv.conv.0.weight":
            out[("encoder", "conv", "conv1", "kernel")] = _conv2d(w)
        elif k == "encoder.conv.conv.0.bias":
            out[("encoder", "conv", "conv1", "bias")] = w
        elif k == "encoder.conv.conv.2.weight":
            out[("encoder", "conv", "conv2", "kernel")] = _conv2d(w)
        elif k == "encoder.conv.conv.2.bias":
            out[("encoder", "conv", "conv2", "bias")] = w
        elif k in ("decoder.ctc_lo.weight", "ctc.ctc_lo.weight"):
            out[("ctc", "ctc_lo", "kernel")] = _t(w)
        elif k in ("decoder.ctc_lo.bias", "ctc.ctc_lo.bias"):
            out[("ctc", "ctc_lo", "bias")] = w
        elif (m := re.match(
                r"encoder\.rnns\.(\d+)\.rnn\.(?:rnn\.)?(weight|bias)_(ih|hh)_l0(_reverse)?",
                k)):
            i, kind, which, rev = m.groups()
            cell = "cell_bw" if rev else "cell_fw"
            base = ("encoder", f"rnn_{i}", cell)
            H = w.shape[0] // n_gates
            gates = ["i", "f", "g", "o"] if n_gates == 4 else ["r", "z", "n"]
            for gi, g in enumerate(gates):
                sl = w[gi * H:(gi + 1) * H]
                if kind == "weight":
                    prefix = "i" if which == "ih" else "h"
                    first_layer_input = (which == "ih" and i == "0")
                    kern = _t(sl)
                    if first_layer_input:
                        # permute conv-flatten order (c-major → f-major)
                        kern = kern.reshape(conv_odim, freq, H)
                        kern = np.transpose(kern, (1, 0, 2)).reshape(-1, H)
                    out[base + (f"{prefix}{g}", "kernel")] = kern
                elif n_gates == 4:
                    # LSTM: both torch biases add; flax bias on h-gates
                    tgt = base + (f"h{g}", "bias")
                    out[tgt] = out.get(tgt, 0) + sl
                else:
                    # GRU: r/z biases fold into the i-gates; the n-gate
                    # keeps b_in on `in` and b_hn on `hn`
                    if g == "n":
                        tgt = base + ("in" if which == "ih" else "hn",
                                      "bias")
                        out[tgt] = out.get(tgt, 0) + sl
                    else:
                        tgt = base + (f"i{g}", "bias")
                        out[tgt] = out.get(tgt, 0) + sl
        elif (m := re.match(r"encoder\.rnns\.(\d+)\.layer_norm\.(weight|bias)",
                            k)):
            i, suffix = m.groups()
            out.update(_norm(("encoder", f"rnn_{i}"), "layer_norm", suffix, w))
        else:
            misses.append(k)
    return out, misses


def convert_squeezeformer(state_dict, input_dim, encoder_dim):
    """torch Squeezeformer state_dict → (flat flax params, flat batch_stats,
    misses). Handles adaptive-scale sublayers, the BatchNorm conv modules
    (running stats → batch_stats collection), the stream/conv1d time
    reduction, and the decoder/CTC shared grammar."""
    freq = _conv_freq_out(input_dim)
    params, bstats, misses = {}, {}, []
    for key, w in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        w = np.asarray(w)
        k = key
        if k == "encoder.embed.pw_conv.weight":
            params[("encoder", "embed", "pw_conv", "kernel")] = _conv2d(w)
        elif k == "encoder.embed.pw_conv.bias":
            params[("encoder", "embed", "pw_conv", "bias")] = w
        elif k == "encoder.embed.dw_conv.weight":
            params[("encoder", "embed", "dw_conv", "kernel")] = _conv2d(w)
        elif k == "encoder.embed.dw_conv.bias":
            params[("encoder", "embed", "dw_conv", "bias")] = w
        elif k == "encoder.embed.input_proj.0.weight":
            params[("encoder", "embed", "input_proj", "kernel")] = \
                _subsample_linear(w, encoder_dim, freq)
        elif k == "encoder.embed.input_proj.0.bias":
            params[("encoder", "embed", "input_proj", "bias")] = w
        elif (m := re.match(r"encoder\.preln\.(weight|bias)", k)):
            params.update(_norm(("encoder",), "preln", m.group(1), w))
        elif (m := re.match(
                r"encoder\.time_reduction_layer\.dw_conv\.(weight|bias)", k)):
            if m.group(1) == "weight":
                params[("encoder", "time_reduction_layer", "dw_conv",
                        "kernel")] = _dw_conv1d(w)
            else:
                params[("encoder", "time_reduction_layer", "dw_conv",
                        "bias")] = w
        elif (m := re.match(
                r"encoder\.time_reduction_layer\.pw_conv\.(weight|bias)", k)):
            if m.group(1) == "weight":
                # torch Conv1d (out,in,1) → flax Conv kernel (1, in, out)
                params[("encoder", "time_reduction_layer", "pw_conv",
                        "kernel")] = np.transpose(w, (2, 1, 0))
            else:
                params[("encoder", "time_reduction_layer", "pw_conv",
                        "bias")] = w
        elif (m := re.match(r"encoder\.time_recover_layer\.(weight|bias)", k)):
            part = "kernel" if m.group(1) == "weight" else "bias"
            params[("encoder", "time_recover_layer", part)] = \
                _t(w) if m.group(1) == "weight" else w
        elif (m := re.match(r"encoder\.final_proj\.(weight|bias)", k)):
            part = "kernel" if m.group(1) == "weight" else "bias"
            params[("encoder", "final_proj", part)] = \
                _t(w) if m.group(1) == "weight" else w
        elif (m := re.match(r"encoder\.encoders\.(\d+)\.(.+)", k)):
            i, rest = m.groups()
            base = ("encoder", f"layer_{i}")
            conv = _convert_squeezeformer_layer(base, rest, w, bstats)
            if conv is None:
                misses.append(k)
            else:
                params.update(conv)
        elif k.startswith(("ctc.", "decoder.")):
            sub, sub_misses = convert_conformer_family({k: w}, input_dim,
                                                       encoder_dim)
            params.update(sub)
            misses.extend(sub_misses)
        else:
            misses.append(k)
    return params, bstats, misses


def _convert_squeezeformer_layer(base, rest, w, bstats):
    # adaptive scales: torch module attr → flax AdaptiveScale submodule 'ada'
    if (m := re.match(r"(self_attn|ffn1|ffn2|conv_module)\.ada_(scale|bias)",
                      rest)):
        mod, part = m.groups()
        return {base + (mod, "ada", f"ada_{part}"): w}
    if (m := re.match(r"self_attn\.(linear_(?:q|k|v|out|pos))\.(weight|bias)",
                      rest)):
        name, suffix = m.groups()
        part = "kernel" if suffix == "weight" else "bias"
        return {base + ("self_attn", name, part):
                _t(w) if suffix == "weight" else w}
    if rest in ("self_attn.pos_bias_u", "self_attn.pos_bias_v"):
        return {base + ("self_attn", rest.split(".")[1]): w}
    if (m := re.match(r"(ffn[12])\.(w_[12])\.(weight|bias)", rest)):
        ffn, wn, suffix = m.groups()
        part = "kernel" if suffix == "weight" else "bias"
        return {base + (ffn, wn, part): _t(w) if suffix == "weight" else w}
    if (m := re.match(r"(layer_norm[1234])\.(weight|bias)", rest)):
        return _norm(base, m.group(1), m.group(2), w)
    # conv module (inner flax module named 'conv')
    cbase = base + ("conv_module", "conv")
    if (m := re.match(r"conv_module\.pointwise_conv([12])\.(weight|bias)",
                      rest)):
        n, suffix = m.groups()
        if suffix == "weight":
            return {cbase + (f"pointwise_conv{n}", "kernel"): _pw_conv1d(w)}
        return {cbase + (f"pointwise_conv{n}", "bias"): w}
    if (m := re.match(r"conv_module\.depthwise_conv\.(weight|bias)", rest)):
        if m.group(1) == "weight":
            return {cbase + ("depthwise_conv", "kernel"): _dw_conv1d(w)}
        return {cbase + ("depthwise_conv", "bias"): w}
    if (m := re.match(r"conv_module\.norm\.(weight|bias)", rest)):
        return _norm(cbase, "norm", m.group(1), w)
    if (m := re.match(r"conv_module\.norm\.running_(mean|var)", rest)):
        bstats[cbase + ("norm", m.group(1))] = w
        return {}
    return None


def convert_efficient_conformer(state_dict, input_dim, output_size,
                                group_layer_idx=(0, 1, 2, 3)):
    """torch Efficient-Conformer state_dict → (params, batch_stats, misses)."""
    freq = _conv_freq_out(input_dim)
    params, bstats, misses = {}, {}, []
    for key, w in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        w = np.asarray(w)
        k = key
        if (m := re.match(r"encoder\.encoders\.(\d+)\.(.+)", k)):
            i, rest = m.groups()
            base = ("encoder", f"layer_{i}")
            conv = _convert_eff_layer(base, rest, w, bstats, "self_attn")
            if conv is None:
                misses.append(k)
            else:
                params.update(conv)
        elif (m := re.match(r"encoder\.(embed\..+|after_norm\..+)", k)) or \
                k.startswith(("ctc.", "decoder.")):
            sub, sub_misses = convert_conformer_family({k: w}, input_dim,
                                                       output_size)
            params.update(sub)
            misses.extend(sub_misses)
        else:
            misses.append(k)
    return params, bstats, misses


def _convert_eff_layer(base, rest, w, bstats, attn_name):
    if rest.startswith("concat_linear."):
        # the reference's StrideConformerEncoderLayer always instantiates
        # concat_linear but never uses it with concat_after=False — drop
        return {}
    if (m := re.match(
            rf"{attn_name}\.(linear_(?:q|k|v|out|pos))\.(weight|bias)", rest)):
        name, suffix = m.groups()
        part = "kernel" if suffix == "weight" else "bias"
        return {base + (attn_name, name, part):
                _t(w) if suffix == "weight" else w}
    if rest in (f"{attn_name}.pos_bias_u", f"{attn_name}.pos_bias_v"):
        return {base + (attn_name, rest.split(".")[1]): w}
    if (m := re.match(r"conv_module\.norm\.running_(mean|var)", rest)):
        bstats[base + ("conv_module", "norm", m.group(1))] = w
        return {}
    return _convert_encoder_layer_param(base, rest, w)


def apply_converted(template_params, converted_flat, strict=True,
                    allow_extra=False):
    """Pour the converted flat dict into a flax params template, verifying
    shapes. Returns the new params tree.

    allow_extra=True drops converted tensors with no template slot — e.g.
    the reference's dead right_decoder when r_num_blocks=0 (it always
    instantiates embed/after_norm/output_layer even with zero blocks)."""
    flat = dict(flatten_dict(template_params))
    missing, extra = [], []
    for k, v in converted_flat.items():
        if k not in flat:
            extra.append("/".join(k))
            continue
        if tuple(flat[k].shape) != tuple(np.shape(v)):
            raise ValueError(f"shape mismatch at {'/'.join(k)}: "
                             f"{flat[k].shape} vs {np.shape(v)}")
        flat[k] = np.asarray(v, dtype=np.float32)
    for k in flat:
        if k not in converted_flat:
            missing.append("/".join(k))
    if allow_extra and extra:
        import logging
        logging.getLogger("masr_tpu").warning(
            f"dropping {len(extra)} source params with no target slot "
            f"(first: {extra[:4]})")
        extra = []
    if strict and (missing or extra):
        raise ValueError(f"unconverted params — missing: {missing[:8]}... "
                         f"({len(missing)}), extra: {extra[:8]}... "
                         f"({len(extra)})")
    return unflatten_dict(flat)

"""DeepSpeech2 (CRNN) model (parity: masr/model_utils/deepspeech2/).

Conv2dSubsampling4Pure → N × (LSTM|GRU, uni/bidirectional) with LayerNorm
after each → CTC. Streaming state is the per-layer (h, c) stacks threaded
through `get_encoder_out_chunk` (model.py:70-77 in the reference).
"""
from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from masr_tpu.models.losses import CTCHead
from masr_tpu.models.subsampling import Conv2dSubsampling4Pure


class RNNLayer(nn.Module):
    """One recurrent layer + LayerNorm (parity: deepspeech2/encoder.py:10-45).

    Final states respect true sequence lengths (the reference uses
    pack_padded_sequence; here flax nn.RNN's seq_lengths does the same)."""
    rnn_size: int
    bidirectional: bool = False
    use_gru: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lens, h0=None, c0=None):
        B = x.shape[0]
        if self.use_gru:
            cell = nn.GRUCell(self.rnn_size, dtype=self.dtype, name="cell_fw")
            carry0 = h0 if h0 is not None else jnp.zeros(
                (B, self.rnn_size), x.dtype)
        else:
            cell = nn.OptimizedLSTMCell(self.rnn_size, dtype=self.dtype,
                                        name="cell_fw")
            carry0 = (c0 if c0 is not None else jnp.zeros((B, self.rnn_size), x.dtype),
                      h0 if h0 is not None else jnp.zeros((B, self.rnn_size), x.dtype))
        rnn = nn.RNN(cell, return_carry=True, name="rnn_fw")
        carry, y = rnn(x, initial_carry=carry0, seq_lengths=x_lens)
        if self.use_gru:
            hT, cT = carry, jnp.zeros_like(carry)
        else:
            cT, hT = carry
        if self.bidirectional:
            if self.use_gru:
                cell_bw = nn.GRUCell(self.rnn_size, dtype=self.dtype,
                                     name="cell_bw")
                carry0_bw = jnp.zeros((B, self.rnn_size), x.dtype)
            else:
                cell_bw = nn.OptimizedLSTMCell(self.rnn_size, dtype=self.dtype,
                                               name="cell_bw")
                carry0_bw = (jnp.zeros((B, self.rnn_size), x.dtype),) * 2
            rnn_bw = nn.RNN(cell_bw, return_carry=True, reverse=True,
                            keep_order=True, name="rnn_bw")
            _, y_bw = rnn_bw(x, initial_carry=carry0_bw, seq_lengths=x_lens)
            y = jnp.concatenate([y, y_bw], axis=-1)
        y = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(y)
        return y, hT, cT


class CRNNEncoder(nn.Module):
    """(parity: deepspeech2/encoder.py:48-129)."""
    input_dim: int
    num_rnn_layers: int = 5
    rnn_size: int = 1024
    rnn_direction: str = "forward"  # 'forward' | 'bidirect'
    use_gru: bool = False
    cmvn: Any = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv = Conv2dSubsampling4Pure(self.input_dim, 32,
                                           dtype=self.dtype, name="conv")
        bidirectional = self.rnn_direction in ("bidirect", "bidirectional")
        self.rnns = [RNNLayer(self.rnn_size, bidirectional, self.use_gru,
                              dtype=self.dtype, name=f"rnn_{i}")
                     for i in range(self.num_rnn_layers)]
        self._bidirectional = bidirectional

    @property
    def output_size(self):
        return self.rnn_size * (2 if self.rnn_direction in
                                ("bidirect", "bidirectional") else 1)

    def __call__(self, x, x_lens, init_state_h=None, init_state_c=None):
        """→ (out (B,T',D), out_lens, h stack, c stack)."""
        if self.cmvn is not None:
            x = self.cmvn(x)
        x = x.astype(self.dtype)
        x, x_lens = self.conv(x, x_lens)
        hs, cs = [], []
        for i, rnn in enumerate(self.rnns):
            h0 = init_state_h[i] if init_state_h is not None else None
            c0 = init_state_c[i] if init_state_c is not None else None
            x, hT, cT = rnn(x, x_lens, h0, c0)
            hs.append(hT)
            cs.append(cT)
        return x, x_lens, jnp.stack(hs, axis=0), jnp.stack(cs, axis=0)


class DeepSpeech2Model(nn.Module):
    """(parity: deepspeech2/model.py:14-100)."""
    input_dim: int
    vocab_size: int
    cmvn: Any = None
    streaming: bool = True
    encoder_conf: Optional[Dict] = None
    decoder_conf: Optional[Dict] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc_conf = dict(self.encoder_conf or {})
        self.encoder = CRNNEncoder(
            input_dim=self.input_dim, cmvn=self.cmvn,
            rnn_direction="forward" if self.streaming else "bidirect",
            dtype=self.dtype, name="encoder", **enc_conf)
        dec_conf = dict(self.decoder_conf or {})
        self.ctc = CTCHead(self.vocab_size, dtype=self.dtype, name="ctc",
                           **dec_conf)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 train: bool = False):
        eouts, eouts_len, _, _ = self.encoder(speech, speech_lengths)
        loss = self.ctc(eouts, eouts_len, text, text_lengths, train)
        return {"loss": loss, "loss_att": jnp.zeros(()),
                "loss_ctc": loss, "acc_att": jnp.zeros(())}

    def get_encoder_out(self, speech, speech_lengths):
        eouts, lens, _, _ = self.encoder(speech, speech_lengths)
        return self.ctc.softmax(eouts), lens

    def get_encoder_out_chunk(self, speech, state):
        """state: {'h': (L,B,H), 'c': (L,B,H)} → (probs, new_state)."""
        B, T = speech.shape[0], speech.shape[1]
        lens = jnp.full((B,), T, jnp.int32)
        eouts, _, h, c = self.encoder(speech, lens, state["h"], state["c"])
        return self.ctc.softmax(eouts), {"h": h, "c": c}

    def init_cache(self, batch=1):
        enc_conf = dict(self.encoder_conf or {})
        L = enc_conf.get("num_rnn_layers", 5)
        H = enc_conf.get("rnn_size", 1024)
        return {"h": jnp.zeros((L, batch, H), self.dtype),
                "c": jnp.zeros((L, batch, H), self.dtype)}

    def ctc_logits(self, encoder_out):
        return self.ctc.logits(encoder_out)

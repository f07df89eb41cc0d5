"""DeepSpeech2 (CRNN) model (parity: masr/model_utils/deepspeech2/).

Conv2dSubsampling4Pure → N × (LSTM|GRU, uni/bidirectional) with LayerNorm
after each → CTC. Streaming state is the per-layer (h, c) stacks threaded
through `get_encoder_out_chunk` (model.py:70-77 in the reference).

The recurrence runs a HOISTED-projection scan by default (`fast_scan`):
the input projection x_t @ W_i for every timestep is one big
(B·T, F)×(F, 4H) matmul BEFORE the time scan (MXU-shaped, amortized),
leaving only the sequentially-dependent h_{t-1} @ W_h inside the
`lax.scan` body — the standard RNN-on-accelerator decomposition. The
parameter tree, gate math, and seq-length semantics are identical to the
flax `nn.RNN(OptimizedLSTMCell|GRUCell)` route (which remains the init
path and the `fast_scan: false` fallback): gates evaluate
h-projection + x-projection in flax's order, and the returned final
(h, c) is the carry at t = len−1 per example (flax `_select_last_carry`),
tracked with a running `where(t < len)` select instead of stacking the
carry history.
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.recurrent import flip_sequences

from masr_tpu.models.losses import CTCHead
from masr_tpu.models.subsampling import Conv2dSubsampling4Pure


class RNNLayer(nn.Module):
    """One recurrent layer + LayerNorm (parity: deepspeech2/encoder.py:10-45).

    Final states respect true sequence lengths (the reference uses
    pack_padded_sequence; here flax nn.RNN's seq_lengths — and the
    fast-scan route's running where(t < len) carry select — do the same).

    `fast_scan` (default): hoist the input projection out of the time
    scan (see module docstring). Same params, same math order; the
    nn.RNN route stays as the init path and the opt-out fallback."""
    rnn_size: int
    bidirectional: bool = False
    use_gru: bool = False
    dtype: jnp.dtype = jnp.float32
    fast_scan: bool = True
    scan_unroll: int = 1

    def setup(self):
        def mk(name):
            if self.use_gru:
                return nn.GRUCell(self.rnn_size, dtype=self.dtype, name=name)
            return nn.OptimizedLSTMCell(self.rnn_size, dtype=self.dtype,
                                        name=name)
        self.cell_fw = mk("cell_fw")
        self.rnn_fw = nn.RNN(self.cell_fw, return_carry=True, name="rnn_fw")
        if self.bidirectional:
            self.cell_bw = mk("cell_bw")
            self.rnn_bw = nn.RNN(self.cell_bw, return_carry=True,
                                 reverse=True, keep_order=True,
                                 name="rnn_bw")
        self.layer_norm = nn.LayerNorm(dtype=self.dtype, name="layer_norm")

    def _fast(self, cell, x, x_lens, carry0):
        """Hoisted-projection scan, numerically mirroring the flax cell:
        x @ W_i for ALL timesteps as one matmul, then lax.scan carrying
        (state, running final-carry select, t)."""
        p = cell.variables["params"]
        dt = self.dtype
        H = self.rnn_size
        lens = x_lens.astype(jnp.int32)
        if self.use_gru:
            wi = jnp.concatenate([p["ir"]["kernel"], p["iz"]["kernel"],
                                  p["in"]["kernel"]], axis=1).astype(dt)
            bi = jnp.concatenate([p["ir"]["bias"], p["iz"]["bias"],
                                  p["in"]["bias"]]).astype(dt)
            whrz = jnp.concatenate([p["hr"]["kernel"],
                                    p["hz"]["kernel"]], axis=1).astype(dt)
            whn = p["hn"]["kernel"].astype(dt)
            bhn = p["hn"]["bias"].astype(dt)
            xp = jnp.dot(x.astype(dt), wi) + bi            # (B, T, 3H)

            def body(carry, xp_t):
                h, h_fin, t = carry
                hrz = jnp.dot(h, whrz)
                # flax GRUCell order: dense_i(x) + dense_h(h)
                r = nn.sigmoid(xp_t[..., :H] + hrz[..., :H])
                z = nn.sigmoid(xp_t[..., H:2 * H] + hrz[..., H:])
                n = nn.tanh(xp_t[..., 2 * H:]
                            + r * (jnp.dot(h, whn) + bhn))
                h2 = (1.0 - z) * n + z * h
                upd = (t < lens)[:, None]
                return (h2, jnp.where(upd, h2, h_fin), t + 1), h2

            (_, h_fin, _), ys = jax.lax.scan(
                body, (carry0, carry0, jnp.int32(0)),
                jnp.transpose(xp, (1, 0, 2)), unroll=self.scan_unroll)
            return jnp.transpose(ys, (1, 0, 2)), h_fin
        wi = jnp.concatenate([p["ii"]["kernel"], p["if"]["kernel"],
                              p["ig"]["kernel"], p["io"]["kernel"]],
                             axis=1).astype(dt)
        wh = jnp.concatenate([p["hi"]["kernel"], p["hf"]["kernel"],
                              p["hg"]["kernel"], p["ho"]["kernel"]],
                             axis=1).astype(dt)
        bh = jnp.concatenate([p["hi"]["bias"], p["hf"]["bias"],
                              p["hg"]["bias"], p["ho"]["bias"]]).astype(dt)
        xp = jnp.dot(x.astype(dt), wi)       # (B, T, 4H); no input bias
        c0, h0 = carry0

        def body(carry, xp_t):
            c, h, c_fin, h_fin, t = carry
            # flax OptimizedLSTMCell order: dense_h(h)+bias, then +dense_i
            g = (jnp.dot(h, wh) + bh) + xp_t
            i = nn.sigmoid(g[..., :H])
            f = nn.sigmoid(g[..., H:2 * H])
            gg = nn.tanh(g[..., 2 * H:3 * H])
            o = nn.sigmoid(g[..., 3 * H:])
            c2 = f * c + i * gg
            h2 = o * nn.tanh(c2)
            upd = (t < lens)[:, None]
            return (c2, h2, jnp.where(upd, c2, c_fin),
                    jnp.where(upd, h2, h_fin), t + 1), h2

        (_, _, c_fin, h_fin, _), ys = jax.lax.scan(
            body, (c0, h0, c0, h0, jnp.int32(0)),
            jnp.transpose(xp, (1, 0, 2)), unroll=self.scan_unroll)
        return jnp.transpose(ys, (1, 0, 2)), (c_fin, h_fin)

    def __call__(self, x, x_lens, h0=None, c0=None):
        B = x.shape[0]
        if self.use_gru:
            carry0 = h0 if h0 is not None else jnp.zeros(
                (B, self.rnn_size), x.dtype)
        else:
            carry0 = (c0 if c0 is not None else jnp.zeros(
                (B, self.rnn_size), x.dtype),
                h0 if h0 is not None else jnp.zeros(
                (B, self.rnn_size), x.dtype))
        fast = self.fast_scan and not self.is_initializing()
        if fast:
            y, carry = self._fast(self.cell_fw, x, x_lens, carry0)
        else:
            carry, y = self.rnn_fw(x, initial_carry=carry0,
                                   seq_lengths=x_lens)
        if self.use_gru:
            hT, cT = carry, jnp.zeros_like(carry)
        else:
            cT, hT = carry
        if self.bidirectional:
            if self.use_gru:
                carry0_bw = jnp.zeros((B, self.rnn_size), x.dtype)
            else:
                carry0_bw = (jnp.zeros((B, self.rnn_size), x.dtype),) * 2
            if fast:
                # mirror nn.RNN(reverse=True, keep_order=True): flip each
                # example's valid prefix, scan forward, flip back
                xf = flip_sequences(x, x_lens, num_batch_dims=1,
                                    time_major=False)
                y_bw, _ = self._fast(self.cell_bw, xf, x_lens, carry0_bw)
                y_bw = flip_sequences(y_bw, x_lens, num_batch_dims=1,
                                      time_major=False)
            else:
                _, y_bw = self.rnn_bw(x, initial_carry=carry0_bw,
                                      seq_lengths=x_lens)
            y = jnp.concatenate([y, y_bw], axis=-1)
        y = self.layer_norm(y)
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
    fast_scan: bool = True
    scan_unroll: int = 1

    def setup(self):
        self.conv = Conv2dSubsampling4Pure(self.input_dim, 32,
                                           dtype=self.dtype, name="conv")
        bidirectional = self.rnn_direction in ("bidirect", "bidirectional")
        self.rnns = [RNNLayer(self.rnn_size, bidirectional, self.use_gru,
                              dtype=self.dtype, fast_scan=self.fast_scan,
                              scan_unroll=self.scan_unroll,
                              name=f"rnn_{i}")
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

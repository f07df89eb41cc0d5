"""InferencePredictor — the jitted-model host
(parity: masr/infer_utils/inference_predictor.py:9-102).

Owns the compiled forward functions and the device-resident streaming
state. Full-context inputs are padded to length buckets so XLA compiles a
handful of programs instead of one per utterance; the streaming chunk step
compiles exactly once and keeps att/cnn caches on device between calls.
"""

import numpy as np
import jax
import jax.numpy as jnp

from masr_tpu.infer.bundle import load_inference_bundle


def _round_up(n, m):
    return -(-n // m) * m


class InferencePredictor(object):
    def __init__(self, model_dir=None, model=None, variables=None, meta=None,
                 use_model=None, streaming=True, length_bucket=200,
                 decoding_chunk_size=16, num_decoding_left_chunks=16,
                 dtype=None):
        import masr_tpu
        masr_tpu.enable_compilation_cache()
        if model_dir is not None:
            import os
            if not os.path.exists(os.path.join(model_dir, "inference.json")):
                raise FileNotFoundError(
                    f"not an inference bundle (no inference.json): {model_dir}"
                    " — export one with export_model.py")
            model, variables, meta, _ = load_inference_bundle(model_dir, dtype)
            use_model = meta["use_model"]
            streaming = meta["streaming"]
        assert model is not None and variables is not None
        self.model = model
        # Commit weights to device ONCE. The bundle restores numpy arrays;
        # passing those into jit re-uploads every parameter on EVERY call
        # (~170 MB/call for the full conformer — measured as ~6 s p50
        # per streaming chunk through the remote-TPU tunnel). device_put
        # makes all per-call paths reuse the resident buffers.
        self.variables = jax.device_put(variables)
        self.meta = meta or {}
        self.use_model = use_model
        self.streaming = streaming
        self.length_bucket = length_bucket
        self.decoding_chunk_size = decoding_chunk_size
        self.num_decoding_left_chunks = num_decoding_left_chunks
        self.cache_size = decoding_chunk_size * num_decoding_left_chunks

        self._encode = jax.jit(self._encode_impl)
        self._chunk_step = jax.jit(self._chunk_step_impl)
        self._encode_hidden = jax.jit(self._encode_hidden_impl)
        self._rescore = jax.jit(self._rescore_impl,
                                static_argnames=("reverse_weight",))
        self._chunk_step_full = jax.jit(self._chunk_step_full_impl)
        # fused frontend: samples → fbank → encoder chunk in ONE program
        # (one device roundtrip per window instead of host fbank + H2D)
        self._chunk_step_samples = jax.jit(self._chunk_step_samples_impl)
        self._chunk_step_samples_full = jax.jit(
            self._chunk_step_samples_full_impl)
        # greedy head fused into the chunk program: only per-frame argmax
        # ids + max probs are read back (bytes, not the (B, Tc, V) probs)
        self._chunk_step_greedy = jax.jit(self._chunk_step_greedy_impl)
        self._chunk_step_samples_greedy = jax.jit(
            self._chunk_step_samples_greedy_impl)
        # same fusion for full-context greedy: encode + argmax one program
        self._encode_greedy = jax.jit(self._encode_greedy_impl)
        self.state = None  # streaming state pytree
        self.dec_state = None  # fused stream-decoder state pytree
        self._decode_fn = None
        self._dec_state0 = None

    # ------------------------------------------------------------------ #
    def _encode_impl(self, variables, speech, lens):
        return self.model.apply(variables, speech, lens,
                                method=type(self.model).get_encoder_out)

    def _chunk_step_impl(self, variables, speech, state):
        return self.model.apply(variables, speech, state,
                                method=type(self.model).get_encoder_out_chunk)

    def _encode_hidden_impl(self, variables, speech, lens):
        return self.model.apply(
            variables, speech, lens,
            method=type(self.model).encode_for_rescoring)

    def _rescore_impl(self, variables, encoder_out, encoder_len, hyps,
                      hyps_lens, reverse_weight=0.0):
        return self.model.apply(
            variables, encoder_out, encoder_len, hyps, hyps_lens,
            reverse_weight, method=type(self.model).rescore_hyps)

    def _chunk_step_full_impl(self, variables, speech, state):
        return self.model.apply(
            variables, speech, state,
            method=type(self.model).get_encoder_out_chunk_full)

    def _fused_feats(self, samples, gain, length):
        """samples (B, S) float [-1,1] → fbank feats, inside the compiled
        chunk program (VERDICT r1 item 5: the TPU-first fused frontend).
        Mirrors the host path exactly: dB-norm gain → int16 scale with
        truncation (audio.py:570-574 semantics) → Kaldi fbank; frames past
        `length` samples are zeroed like the host's feature zero-pad."""
        from masr_tpu.ops.fbank import fbank_jax
        pre = self.meta.get("preprocess_conf") or {}
        wav = samples * gain
        wav = jnp.trunc(jnp.clip(wav * 32768.0, -32768.0, 32767.0))
        feats, _ = fbank_jax(
            wav, lengths=jnp.asarray([length], jnp.int32),
            num_mel_bins=int(pre.get("n_mels", 80)),
            sample_rate=int(pre.get("sample_rate", 16000)))
        return feats

    def _chunk_step_samples_impl(self, variables, samples, gain, length,
                                 state):
        feats = self._fused_feats(samples, gain, length)
        return self.model.apply(variables, feats, state,
                                method=type(self.model).get_encoder_out_chunk)

    def _chunk_step_samples_full_impl(self, variables, samples, gain, length,
                                      state):
        feats = self._fused_feats(samples, gain, length)
        return self.model.apply(
            variables, feats, state,
            method=type(self.model).get_encoder_out_chunk_full)

    @staticmethod
    def _greedy_head(probs):
        return (jnp.argmax(probs, axis=-1).astype(jnp.int32),
                jnp.max(probs, axis=-1).astype(jnp.float32))

    def _chunk_step_greedy_impl(self, variables, speech, state):
        probs, state = self._chunk_step_impl(variables, speech, state)
        ids, maxp = self._greedy_head(probs)
        return ids, maxp, state

    def _chunk_step_samples_greedy_impl(self, variables, samples, gain,
                                        length, state):
        probs, state = self._chunk_step_samples_impl(
            variables, samples, gain, length, state)
        ids, maxp = self._greedy_head(probs)
        return ids, maxp, state

    def _encode_greedy_impl(self, variables, speech, lens):
        probs, out_lens = self._encode_impl(variables, speech, lens)
        ids, maxp = self._greedy_head(probs)
        return ids, maxp, out_lens

    def _chunk_step_decode_impl(self, variables, speech, state, dec_state,
                                frame_valid):
        probs, state = self._chunk_step_impl(variables, speech, state)
        # stride-downsampling models emit fewer frames than the nominal
        # chunk size; frame_valid is host-sized to the nominal chunk
        dec_state, best = self._decode_fn(
            dec_state, probs, frame_valid[:, : probs.shape[1]])
        return state, dec_state, best

    def _chunk_step_samples_decode_impl(self, variables, samples, gain,
                                        length, state, dec_state,
                                        frame_valid):
        probs, state = self._chunk_step_samples_impl(
            variables, samples, gain, length, state)
        dec_state, best = self._decode_fn(
            dec_state, probs, frame_valid[:, : probs.shape[1]])
        return state, dec_state, best

    # ------------------------------------------------------------------ #
    def predict(self, speech, speech_lengths):
        """Full-context CTC probs. speech: (B, T, F) ndarray →
        (probs (B, T', V) ndarray, out_lens (B,))."""
        probs, lens = self.predict_device(speech, speech_lengths)
        return np.asarray(probs), np.asarray(lens)

    def predict_device(self, speech, speech_lengths):
        """Like predict() but returns DEVICE arrays — feed these straight
        into an on-device decoder (decode_batch_device) without the
        (B, T', V) probs ever visiting the host (~600 MB of D2H+H2D
        avoided at B=128)."""
        speech = np.asarray(speech, np.float32)
        B, T, F = speech.shape
        T_pad = _round_up(max(T, 8), self.length_bucket)
        if T_pad != T:
            speech = np.pad(speech, ((0, 0), (0, T_pad - T), (0, 0)))
        return self._encode(self.variables, jnp.asarray(speech),
                            jnp.asarray(speech_lengths, jnp.int32))

    def predict_greedy(self, speech, speech_lengths):
        """Full-context encode with the greedy head fused on device: only
        per-frame argmax ids + max probs come back to the host (B, T')
        int32/f32 — the (B, T', V) probs never cross the link (at V≈5k
        chars that's ~64 MB per B=16 batch avoided on remote-TPU setups)."""
        speech = np.asarray(speech, np.float32)
        B, T, F = speech.shape
        T_pad = _round_up(max(T, 8), self.length_bucket)
        if T_pad != T:
            speech = np.pad(speech, ((0, 0), (0, T_pad - T), (0, 0)))
        ids, maxp, lens = self._encode_greedy(
            self.variables, jnp.asarray(speech),
            jnp.asarray(speech_lengths, jnp.int32))
        return np.asarray(ids), np.asarray(maxp), np.asarray(lens)

    # ------------------------------------------------------------------ #
    def encode_for_rescoring(self, speech, speech_lengths):
        """→ (encoder_out, ctc_probs, out_lens) as ndarrays (bucketed)."""
        speech = np.asarray(speech, np.float32)
        B, T, F = speech.shape
        T_pad = _round_up(max(T, 8), self.length_bucket)
        if T_pad != T:
            speech = np.pad(speech, ((0, 0), (0, T_pad - T), (0, 0)))
        enc, probs, lens = self._encode_hidden(
            self.variables, jnp.asarray(speech),
            jnp.asarray(speech_lengths, jnp.int32))
        return enc, np.asarray(probs), np.asarray(lens)

    def rescore(self, encoder_out, encoder_len, hyps_list, reverse_weight=0.0,
                nbest_pad=10, len_bucket=8):
        """hyps_list: list of token-id lists → (N,) attention scores.
        Hyps are padded to fixed (nbest_pad, bucketed L) so rescoring
        compiles once."""
        N = len(hyps_list)
        L = _round_up(max(max((len(h) for h in hyps_list), default=1), 1),
                      len_bucket)
        hyps = np.full((nbest_pad, L), -1, np.int32)
        hyp_lens = np.zeros((nbest_pad,), np.int32)
        for i, h in enumerate(hyps_list[:nbest_pad]):
            hyps[i, : len(h)] = h
            hyp_lens[i] = len(h)
        scores = self._rescore(self.variables, encoder_out,
                               jnp.asarray(int(encoder_len)),
                               jnp.asarray(hyps), jnp.asarray(hyp_lens),
                               reverse_weight=reverse_weight)
        return np.asarray(scores)[:N]

    def init_stream_state(self, batch=1):
        if self.use_model == "deepspeech2":
            self.state = self.model.apply(
                self.variables, method=lambda m: m.init_cache(batch=batch))
        else:
            self.state = self.model.apply(
                self.variables,
                method=lambda m: m.encoder.init_cache(
                    batch=batch, cache_size=self.cache_size))

    def predict_chunk(self, x_chunk):
        """One streaming step. x_chunk: (1, T_win, F) → probs (1, chunk, V)."""
        if self.state is None:
            self.init_stream_state(batch=x_chunk.shape[0])
        probs, self.state = self._chunk_step(
            self.variables, jnp.asarray(x_chunk, jnp.float32), self.state)
        return np.asarray(probs)

    def predict_chunk_full(self, x_chunk):
        """Streaming step returning (probs, encoder hidden) — the hidden
        chunk feeds end-of-utterance attention rescoring."""
        if self.state is None:
            self.init_stream_state(batch=x_chunk.shape[0])
        probs, hidden, self.state = self._chunk_step_full(
            self.variables, jnp.asarray(x_chunk, jnp.float32), self.state)
        return np.asarray(probs), hidden

    def predict_chunk_samples(self, samples, gain=1.0, length=None,
                              full=False):
        """Fused streaming step: raw samples (1, S_window) float [-1,1] →
        CTC probs for one chunk; fbank runs inside the compiled program.
        `length`: valid sample count (rest is padding); `full=True` also
        returns the encoder hidden chunk for attention rescoring."""
        samples = np.asarray(samples, np.float32)
        if samples.ndim == 1:
            samples = samples[None]
        if self.state is None:
            self.init_stream_state(batch=samples.shape[0])
        if length is None:
            length = samples.shape[1]
        args = (self.variables, jnp.asarray(samples),
                jnp.asarray(gain, jnp.float32),
                jnp.asarray(length, jnp.int32), self.state)
        if full:
            probs, hidden, self.state = self._chunk_step_samples_full(*args)
            return np.asarray(probs), hidden
        probs, self.state = self._chunk_step_samples(*args)
        return np.asarray(probs)

    def predict_chunk_greedy(self, x_chunk):
        """Streaming step with the greedy head fused on device:
        (1, T_win, F) → (ids (1, chunk), max_probs (1, chunk)) — the
        full (1, chunk, V) probs never leave the accelerator."""
        if self.state is None:
            self.init_stream_state(batch=x_chunk.shape[0])
        ids, maxp, self.state = self._chunk_step_greedy(
            self.variables, jnp.asarray(x_chunk, jnp.float32), self.state)
        return np.asarray(ids), np.asarray(maxp)

    def predict_chunk_samples_greedy(self, samples, gain=1.0, length=None):
        """Fused frontend + greedy head: raw samples → (ids, max_probs)
        in one device dispatch with a bytes-sized readback."""
        samples = np.asarray(samples, np.float32)
        if samples.ndim == 1:
            samples = samples[None]
        if self.state is None:
            self.init_stream_state(batch=samples.shape[0])
        if length is None:
            length = samples.shape[1]
        ids, maxp, self.state = self._chunk_step_samples_greedy(
            self.variables, jnp.asarray(samples),
            jnp.asarray(gain, jnp.float32), jnp.asarray(length, jnp.int32),
            self.state)
        return np.asarray(ids), np.asarray(maxp)

    # ------------------------------------------------------------------ #
    def attach_stream_decoder(self, init_fn, decode_fn, batch=1):
        """Fuse a pure streaming decoder (e.g. the device beam search,
        decoders.device_beam.make_stream_decode_fn) into the chunk
        programs: each predict_chunk_decode call runs encoder + decoder
        as ONE compiled program and reads back only the best hypothesis.
        """
        self._decode_fn = decode_fn
        self._dec_state0 = jax.device_put(init_fn(batch))
        self.dec_state = self._dec_state0
        self._chunk_step_decode = jax.jit(self._chunk_step_decode_impl)
        self._chunk_step_samples_decode = jax.jit(
            self._chunk_step_samples_decode_impl)

    def predict_chunk_decode(self, x_chunk, frame_valid):
        """One fused encoder+decoder streaming step (feature input) →
        (tokens (B, Lmax) −1-padded, lengths (B,), scores (B,))."""
        if self.state is None:
            self.init_stream_state(batch=x_chunk.shape[0])
        self.state, self.dec_state, best = self._chunk_step_decode(
            self.variables, jnp.asarray(x_chunk, jnp.float32), self.state,
            self.dec_state, jnp.asarray(frame_valid, bool))
        return jax.tree.map(np.asarray, best)

    def predict_chunk_samples_decode(self, samples, gain, length,
                                     frame_valid):
        """One fused frontend+encoder+decoder streaming step (raw-sample
        input) → (tokens, lengths, scores)."""
        samples = np.asarray(samples, np.float32)
        if samples.ndim == 1:
            samples = samples[None]
        if self.state is None:
            self.init_stream_state(batch=samples.shape[0])
        self.state, self.dec_state, best = self._chunk_step_samples_decode(
            self.variables, jnp.asarray(samples),
            jnp.asarray(gain, jnp.float32), jnp.asarray(length, jnp.int32),
            self.state, self.dec_state, jnp.asarray(frame_valid, bool))
        return jax.tree.map(np.asarray, best)

    def reset_stream(self):
        self.state = None
        if self._dec_state0 is not None:
            self.dec_state = self._dec_state0

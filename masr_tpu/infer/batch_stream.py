"""Batched streaming sessions: serve N concurrent audio streams with ONE
compiled chunk step per tick (the b=32 configuration sustains ~8000×
real-time per v5e chip at ~2.5 ms p50 chunk latency — see bench.py).

The single-stream chunk step is vmapped over a stacked state pytree; slots
advance selectively (idle slots keep their old state via a mask), so
streams may start/stop independently. Host-side feature windowing and the
greedy carry are per slot, identical to MASRPredictor.predict_stream
(predict.py:282-330 window math).

Decoding is FUSED into the tick program: greedy mode returns per-frame
argmax ids + max probs (the (N, CH, V) probs — ~8 MB/tick at N=32 —
never leave the device); `ctc_beam_search_device` mode advances every
slot's prefix beam search inside the same program and returns each
slot's best hypothesis (decoders.device_beam.make_stream_decode_fn).
"""
import numpy as np

import jax
import jax.numpy as jnp

from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.decoders.greedy import GreedyChunkDecoder
from masr_tpu.infer.predictor import (CACHED_FEATURE_NUM, CONTEXT,
                                      DECODING_CHUNK_SIZE, DECODING_WINDOW,
                                      STRIDE, _subsampled_len)


class BatchStreamSession(object):
    def __init__(self, inference_predictor, vocab_list, preprocess_conf=None,
                 max_streams=8, decoder="ctc_greedy", decoder_conf=None,
                 tick_chunks=1, pos_table_len=8192):
        """decoder: 'ctc_greedy' (fused argmax head, per-slot host carry)
        or 'ctc_beam_search_device' (ALL slots' prefix beam search inside
        the tick program, incl. optional dense-bigram LM fusion).
        tick_chunks=k>1: MULTI-CHUNK TICKS — when a slot has k full
        windows buffered, they run in ONE dispatch with a block-causal
        sub-chunk mask (bit-equivalent to k single ticks, bf16), paying
        the per-tick cache/weight DMA once instead of k times. A
        throughput knob for bulk transcription: it adds up to
        (k-1)·640 ms of buffering latency before the first partial.
        Needs the fused chunk path and k·chunk ≤ cache_size; falls back
        to 1 otherwise. Slots with fewer than k buffered windows (stream
        tails) advance through the normal single-chunk step.
        pos_table_len: rows in the fused route's HBM position tables
        (~pos_table_len × 40 ms of stream per slot before ticks switch
        to the slower exact-positions program — size to the expected
        session length; the switch is exact, there is NO accuracy cliff,
        and memory stays flat either way)."""
        self.ip = inference_predictor
        self.N = max_streams
        self.vocab_list = vocab_list
        self.decoder = decoder
        conf = dict(decoder_conf or {})
        self._featurizer = AudioFeaturizer(train=False,
                                           **(preprocess_conf or {}))
        model, variables = self.ip.model, self.ip.variables

        def one_step(variables, x, state):
            return model.apply(variables, x, state,
                               method=type(model).get_encoder_out_chunk)

        vstep = jax.vmap(one_step, in_axes=(None, 0, 0))

        # fused batched chunk step (one pallas_call per layer) when the
        # model/config supports it — same semantics as the vmapped step
        use_fused = False
        if hasattr(type(model), "chunk_fused_ok"):
            try:
                use_fused = bool(model.apply(
                    variables, DECODING_CHUNK_SIZE, self.ip.cache_size,
                    max_streams, method=type(model).chunk_fused_ok))
            except Exception:
                use_fused = False
        self._use_fused_chunk = use_fused
        # multi-chunk ticks: eligibility re-checked at the combined chunk
        # size (k·CH must fit the cache and the kernel's VMEM budget)
        self.tick_k = 1
        if tick_chunks > 1 and use_fused:
            try:
                ok = bool(model.apply(
                    variables, DECODING_CHUNK_SIZE * int(tick_chunks),
                    self.ip.cache_size, max_streams,
                    method=type(model).chunk_fused_ok))
            except Exception:
                ok = False
            if ok:
                self.tick_k = int(tick_chunks)
        # ring-buffer att caches (fused path; shard_maps over a
        # registered mesh too — slots are the sharded axis): the kernels
        # write only the c fresh rows per tick and the caches never
        # round-trip through XLA — docs/streaming_roofline.md
        ring = False
        if use_fused and hasattr(type(model), "chunk_ring_ok"):
            try:
                ring = bool(model.apply(
                    variables, DECODING_CHUNK_SIZE, self.ip.cache_size,
                    max_streams, method=type(model).chunk_ring_ok))
            except Exception:
                ring = False
        self._ring = ring
        if self.ip.use_model == "deepspeech2":
            template = model.apply(variables,
                                   method=lambda m: m.init_cache(batch=1))
        elif ring:
            template = None     # ring leaves init at full N, no stacking
            self.states = jax.device_put(model.apply(
                variables, method=lambda m: m.encoder.init_cache(
                    batch=max_streams, cache_size=self.ip.cache_size,
                    ring=True)))
        else:
            template = model.apply(
                variables, method=lambda m: m.encoder.init_cache(
                    batch=1, cache_size=self.ip.cache_size))
        self._template = template
        if not ring:
            self.states = jax.tree.map(
                lambda x: jnp.stack([x] * max_streams), template)
        # weights packed ONCE for the fused kernel (repacking in-trace
        # would cost ~60 MB of stacking traffic on every tick); packs
        # include the per-layer HBM position tables (in-kernel positions
        # DMA — no per-tick sinusoid/einsum)
        self._packed_chunk = jax.device_put(model.apply(
            variables, self.ip.cache_size, int(pos_table_len),
            method=type(model).pack_chunk_params)) \
            if use_fused else None

        def encoder_step(variables, xs, states, active, packed,
                         exact_positions=False):
            if use_fused:
                # (N, 1, W, F) single tick → (N, W, F); (N, k, W, F)
                # multi-chunk tick stays 4-D (block-causal sub-chunks)
                inp = xs[:, 0] if xs.shape[1] == 1 else xs
                probs, new_states = model.apply(
                    variables, inp, states, packed, active,
                    exact_positions,
                    method=type(model).get_encoder_out_chunk_batched) \
                    if ring else model.apply(
                    variables, inp, states, packed, None, exact_positions,
                    method=type(model).get_encoder_out_chunk_batched)
            else:
                probs4, new_states = vstep(variables, xs, states)
                probs = probs4[:, 0]
            if ring:
                # att ring buffers are kernel-managed in place (inactive
                # slots were skipped by the conditional DMA): pass them
                # through; cnn is (L, N, …) — mask on the slot axis
                merged = {
                    "att_cache": new_states["att_cache"],
                    "cnn_cache": jnp.where(
                        active.reshape(1, -1, 1, 1),
                        new_states["cnn_cache"], states["cnn_cache"]),
                }
                for key in ("offset", "cache_len", "wptr"):
                    merged[key] = jnp.where(active, new_states[key],
                                            states[key])
            else:
                merged = jax.tree.map(
                    lambda new, old: jnp.where(
                        active.reshape((-1,) + (1,) * (new.ndim - 1)),
                        new, old),
                    new_states, states)
            return probs, merged  # (N, CH, V)

        # position-table horizon: the fused route reads positions from
        # per-layer HBM tables whose window clamps at table_len - L. A
        # slot streaming past that boundary flips the TICK to an
        # exact-positions step (per-tick sinusoid+einsum from the traced
        # offsets — correct at ANY offset, just slower), replacing the
        # old silent position freeze. Offsets are mirrored host-side so
        # the routing needs no device readback.
        self._pos_cap = None
        if use_fused and self._packed_chunk is not None \
                and not isinstance(self._packed_chunk, dict) \
                and len(self._packed_chunk[0]) == 3:
            table_len = self._packed_chunk[0][2].shape[0]
            L = self.ip.cache_size + DECODING_CHUNK_SIZE * self.tick_k
            self._pos_cap = max(0, (table_len - L) // 8 * 8)
        self._slot_frames = [0] * max_streams

        self._dec_state = None
        if decoder == "ctc_beam_search_device":
            from masr_tpu.decoders.device_beam import make_stream_decode_fn
            space_id = vocab_list.index("<space>") \
                if "<space>" in vocab_list else -1
            init_fn, decode_fn = make_stream_decode_fn(
                beam_size=min(int(conf.get("beam_size", 10)), 32),
                cutoff_top_n=int(conf.get("cutoff_top_n", 40)),
                max_len=int(conf.get("max_len", 512)),
                lm_table=conf.get("lm_table"),
                alpha=float(conf.get("alpha", 2.2)),
                beta=float(conf.get("beta", 4.3)), space_id=space_id)
            self._dec_fresh = jax.device_put(init_fn(max_streams))
            self._dec_state = self._dec_fresh

            def step_beam(variables, xs, states, dec_state, active, fv,
                          packed, exact_positions=False):
                probs, merged = encoder_step(variables, xs, states, active,
                                             packed, exact_positions)
                dec_state, best = decode_fn(dec_state, probs,
                                            fv[:, : probs.shape[1]])
                return best, merged, dec_state

            # ring mode: donate the state pytree so the aliased ring
            # buffers update truly in place across ticks (without
            # donation XLA copies the caches to preserve the caller's
            # buffers — exactly the write traffic ring mode removes)
            self._step_beam = jax.jit(step_beam, static_argnums=(7,),
                                      donate_argnums=(2,) if ring else ())

            def reset_dec(dec_state, fresh, mask):
                return jax.tree.map(
                    lambda s, f: jnp.where(
                        mask.reshape((self.N,) + (1,) * (s.ndim - 1)), f, s),
                    dec_state, fresh)

            self._reset_dec = jax.jit(reset_dec)
        else:
            def step_greedy(variables, xs, states, active, packed,
                            exact_positions=False):
                probs, merged = encoder_step(variables, xs, states, active,
                                             packed, exact_positions)
                ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
                maxp = jnp.max(probs, axis=-1).astype(jnp.float32)
                return ids, maxp, merged  # (N, CH) each

            self._step_greedy = jax.jit(step_greedy, static_argnums=(5,),
                                        donate_argnums=(2,) if ring else ())

        # per-slot host state
        self._cached_feat = [None] * max_streams
        self._remainder = [np.zeros(0, np.float32)] * max_streams
        self._decoders = [GreedyChunkDecoder(vocab_list)
                          for _ in range(max_streams)]
        self._in_use = [False] * max_streams

    # ------------------------------------------------------------------ #
    def open(self):
        """→ slot id for a new stream (raises if all slots busy)."""
        for i, used in enumerate(self._in_use):
            if not used:
                self._in_use[i] = True
                return i
        raise RuntimeError(f"all {self.N} stream slots are in use")

    def close(self, slot):
        self._in_use[slot] = False
        self._cached_feat[slot] = None
        self._remainder[slot] = np.zeros(0, np.float32)
        self._slot_frames[slot] = 0
        self._decoders[slot].reset()
        if self._dec_state is not None:
            mask = np.zeros((self.N,), bool)
            mask[slot] = True
            self._dec_state = self._reset_dec(self._dec_state,
                                              self._dec_fresh,
                                              jnp.asarray(mask))
        if self._ring:
            # cache_len = 0 masks every ring row, so the att buffers need
            # no zeroing (rewriting them would copy ~whole-cache bytes)
            s = dict(self.states)
            s["cnn_cache"] = s["cnn_cache"].at[:, slot].set(0)
            for key in ("offset", "cache_len", "wptr"):
                s[key] = s[key].at[slot].set(0)
            self.states = s
        else:
            self.states = jax.tree.map(
                lambda s, t: s.at[slot].set(t), self.states, self._template)

    # ------------------------------------------------------------------ #
    def _ids_to_text(self, ids):
        from masr_tpu.data.text_featurizer import SPACE_TOKEN
        return "".join(" " if self.vocab_list[i] == SPACE_TOKEN
                       else self.vocab_list[i] for i in ids)

    def _run_round(self, xs, active, valids):
        """One fused tick: encoder (+ decode head) for the active slots.
        xs: (N, k, DECODING_WINDOW, feat) — k=1 single tick, k=tick_k
        multi-chunk tick. valids: {slot: valid OUTPUT frames this tick}
        → {slot: (score, text)}."""
        # slots past the position-table horizon need the exact-positions
        # program (per-tick sinusoid+einsum — correct at ANY offset);
        # slots inside it keep the fast in-kernel table DMA. A mixed
        # tick dispatches the two programs over DISJOINT active masks —
        # one long-lived stream no longer drags every co-scheduled
        # stream onto the slower program (the r4 whole-tick any() flip).
        adv = xs.shape[1] * DECODING_CHUNK_SIZE
        if self._pos_cap is None:
            groups = [(active, False)]
        else:
            crossed = np.asarray(
                [bool(active[s]) and self._slot_frames[s] >= self._pos_cap
                 for s in range(self.N)])
            table = np.asarray(active, bool) & ~crossed
            groups = [(mask, exact) for mask, exact in
                      ((table, False), (crossed, True)) if mask.any()]
        for s in range(self.N):
            if active[s]:
                self._slot_frames[s] += adv
        out = {}
        for mask, exact in groups:
            sub_valids = {s: n for s, n in valids.items() if mask[s]}
            out.update(self._dispatch(xs, mask, sub_valids, exact))
        return out

    def _dispatch(self, xs, active, valids, exact):
        """One compiled step over the `active` slots (all on the same
        positions program). Inactive slots' encoder/decoder states pass
        through unchanged (active-mask merge; the beam advance is
        identity on slots whose frame-valid mask is all-False)."""
        out = {}
        if self._dec_state is not None:
            fv = np.zeros((self.N, xs.shape[1] * DECODING_CHUNK_SIZE), bool)
            for slot, n in valids.items():
                fv[slot, :n] = True
            best, self.states, self._dec_state = self._step_beam(
                self.ip.variables, jnp.asarray(xs), self.states,
                self._dec_state, jnp.asarray(active), jnp.asarray(fv),
                self._packed_chunk, exact)
            tokens, lengths, scores = (np.asarray(x) for x in best)
            for slot, n in valids.items():
                if n:
                    ids = tokens[slot][: int(lengths[slot])].tolist()
                    out[slot] = (float(scores[slot]), self._ids_to_text(ids))
            return out
        ids, maxp, self.states = self._step_greedy(
            self.ip.variables, jnp.asarray(xs), self.states,
            jnp.asarray(active), self._packed_chunk, exact)
        ids, maxp = np.asarray(ids), np.asarray(maxp)
        for slot, n in valids.items():
            n = min(n, ids.shape[1])
            if n:
                out[slot] = self._decoders[slot].decode_chunk_ids(
                    ids[slot, :n], maxp[slot, :n])
        return out

    # ------------------------------------------------------------------ #
    def feed(self, slot, samples, is_end=False, sample_rate=16000):
        """Add PCM float samples to a slot; → {'text','score'} | None."""
        assert self._in_use[slot], f"slot {slot} is not open"
        samples = np.concatenate([self._remainder[slot],
                                  np.asarray(samples, np.float32)])
        feats = self._featurizer.featurize_waveform(samples, sample_rate)
        hop = int(self._featurizer.sample_rate * 0.01)
        self._remainder[slot] = samples[hop * feats.shape[0]:]
        if self._cached_feat[slot] is None:
            self._cached_feat[slot] = feats
        else:
            self._cached_feat[slot] = np.concatenate(
                [self._cached_feat[slot], feats], axis=0)

        num_frames = self._cached_feat[slot].shape[0]
        if num_frames < DECODING_WINDOW and not is_end:
            return None
        if num_frames < CONTEXT:
            return None
        left = CONTEXT if is_end else DECODING_WINDOW
        result = None
        end = None
        windows = []
        for cur in range(0, num_frames - left + 1, STRIDE):
            end = min(cur + DECODING_WINDOW, num_frames)
            windows.append(self._cached_feat[slot][cur:end])
        idx = 0
        k = self.tick_k
        # full windows group into multi-chunk ticks; the (possibly short)
        # tail and partial groups take the single-chunk step
        while k > 1 and len(windows) - idx >= k \
                and windows[idx + k - 1].shape[0] == DECODING_WINDOW:
            result = self._advance_multi(slot, windows[idx:idx + k])
            idx += k
        for window in windows[idx:]:
            result = self._advance(slot, window)
        if end is not None:
            self._cached_feat[slot] = \
                self._cached_feat[slot][end - CACHED_FEATURE_NUM:]
        return result

    def _advance(self, slot, window):
        valid_len = window.shape[0]
        feat_dim = window.shape[1]
        if valid_len < DECODING_WINDOW:
            window = np.pad(window,
                            ((0, DECODING_WINDOW - valid_len), (0, 0)))
        xs = np.zeros((self.N, 1, DECODING_WINDOW, feat_dim), np.float32)
        xs[slot, 0] = window
        active = np.zeros((self.N,), bool)
        active[slot] = True
        decoded = self._run_round(
            xs, active, {slot: max(_subsampled_len(valid_len), 0)})
        if slot not in decoded:
            return None
        score, text = decoded[slot]
        return {"text": text, "score": score}

    def _advance_multi(self, slot, windows):
        """One multi-chunk tick for a single slot: len(windows) == tick_k
        FULL windows → k·CH valid output frames."""
        k = len(windows)
        feat_dim = windows[0].shape[1]
        xs = np.zeros((self.N, k, DECODING_WINDOW, feat_dim), np.float32)
        for j, w in enumerate(windows):
            xs[slot, j] = w
        active = np.zeros((self.N,), bool)
        active[slot] = True
        decoded = self._run_round(xs, active,
                                  {slot: k * DECODING_CHUNK_SIZE})
        if slot not in decoded:
            return None
        score, text = decoded[slot]
        return {"text": text, "score": score}

    def feed_many(self, items, sample_rate=16000):
        """Advance several streams in one device step when their windows
        align: items = [(slot, samples, is_end)] → {slot: result|None}.
        Slots whose buffers fill a window are batched into a single
        masked vmap step."""
        ready = {}
        results = {}
        for slot, samples, is_end in items:
            assert self._in_use[slot]
            samples = np.concatenate([self._remainder[slot],
                                      np.asarray(samples, np.float32)])
            feats = self._featurizer.featurize_waveform(samples, sample_rate)
            hop = int(self._featurizer.sample_rate * 0.01)
            self._remainder[slot] = samples[hop * feats.shape[0]:]
            cf = self._cached_feat[slot]
            self._cached_feat[slot] = feats if cf is None else \
                np.concatenate([cf, feats], axis=0)
            n = self._cached_feat[slot].shape[0]
            left = CONTEXT if is_end else DECODING_WINDOW
            if n >= max(left, CONTEXT):
                ready[slot] = is_end
            results[slot] = None
        feat_dim = self._featurizer.feature_dim
        if self.tick_k > 1:
            # multi-chunk rounds first: every slot with tick_k full
            # windows buffered advances k chunks in ONE dispatch
            k = self.tick_k
            need = DECODING_WINDOW + (k - 1) * STRIDE
            while True:
                group = [s for s in ready
                         if self._cached_feat[s].shape[0] >= need]
                if not group:
                    break
                xs = np.zeros((self.N, k, DECODING_WINDOW, feat_dim),
                              np.float32)
                active = np.zeros((self.N,), bool)
                valids = {}
                for slot in group:
                    for j in range(k):
                        xs[slot, j] = self._cached_feat[slot][
                            j * STRIDE:j * STRIDE + DECODING_WINDOW]
                    active[slot] = True
                    valids[slot] = k * DECODING_CHUNK_SIZE
                    self._cached_feat[slot] = \
                        self._cached_feat[slot][k * STRIDE:]
                for slot, (score, text) in self._run_round(
                        xs, active, valids).items():
                    results[slot] = {"text": text, "score": score}
        while ready:
            xs = np.zeros((self.N, 1, DECODING_WINDOW, feat_dim), np.float32)
            active = np.zeros((self.N,), bool)
            valids = {}
            for slot, is_end in list(ready.items()):
                n = self._cached_feat[slot].shape[0]
                left = CONTEXT if is_end else DECODING_WINDOW
                if n < left:
                    ready.pop(slot)
                    continue
                end = min(DECODING_WINDOW, n)
                window = self._cached_feat[slot][:end]
                if end < DECODING_WINDOW:
                    window = np.pad(window,
                                    ((0, DECODING_WINDOW - end), (0, 0)))
                xs[slot, 0] = window
                active[slot] = True
                valids[slot] = max(_subsampled_len(end), 0)
                # consume one stride; keep the feature-context tail
                self._cached_feat[slot] = self._cached_feat[slot][
                    min(STRIDE, end - CACHED_FEATURE_NUM):]
            if not active.any():
                break
            for slot, (score, text) in self._run_round(xs, active,
                                                       valids).items():
                results[slot] = {"text": text, "score": score}
        return results

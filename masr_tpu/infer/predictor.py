"""MASRPredictor — the public inference API
(parity: masr/predict.py — predict / predict_long / predict_stream /
reset_stream, same streaming window math and result dicts).
"""
import io
import os

import numpy as np

from masr_tpu.audio import AudioSegment
from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.data.text_featurizer import TextFeaturizer
from masr_tpu.decoders.beam_search import BeamSearchDecoder
from masr_tpu.decoders.greedy import GreedyChunkDecoder, greedy_decoder
from masr_tpu.infer.inference_model import InferencePredictor
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()

# streaming constants (parity: predict.py:282-289)
DECODING_CHUNK_SIZE = 16
CONTEXT = 7
SUBSAMPLING = 4
CACHED_FEATURE_NUM = CONTEXT - SUBSAMPLING          # 3
DECODING_WINDOW = (DECODING_CHUNK_SIZE - 1) * SUBSAMPLING + CONTEXT  # 67
STRIDE = SUBSAMPLING * DECODING_CHUNK_SIZE          # 64


def _subsampled_len(t):
    return ((t - 1) // 2 - 1) // 2


class MASRPredictor(object):
    def __init__(self, model_dir=None, model_tag=None, decoder="ctc_greedy",
                 decoder_configs=None, use_pun=False, pun_model_dir=None,
                 num_decoding_left_chunks=16, itn=False, warmup=True,
                 fused_frontend=True):
        """Args mirror the reference's (predict.py:20-58) minus GPU flags:
        model_dir is an exported inference bundle directory, or pass a
        registered model_tag to auto-download into ~/.cache/masr_tpu."""
        if model_dir is None:
            if model_tag is None:
                raise ValueError("provide model_dir or model_tag")
            from masr_tpu.infer.model_zoo import get_model_dir
            model_dir = get_model_dir(model_tag)
        self.model_dir = model_dir
        self.predictor = InferencePredictor(
            model_dir=model_dir,
            num_decoding_left_chunks=num_decoding_left_chunks)
        meta = self.predictor.meta
        self.use_model = meta["use_model"]
        self.streaming = meta["streaming"]
        pre = dict(meta.get("preprocess_conf") or {})
        self._audio_featurizer = AudioFeaturizer(train=False, **pre)
        self._text_featurizer = TextFeaturizer(
            os.path.join(model_dir, "vocabulary.txt"))
        self.decoder = decoder
        decoder_configs = dict(decoder_configs or {})
        # attention rescoring knobs (beyond the reference — it never wired
        # its forward_one_step); defaults follow WeNet conventions
        self.rescoring_nbest = decoder_configs.pop("rescoring_nbest", 10)
        self.rescoring_ctc_weight = decoder_configs.pop(
            "rescoring_ctc_weight",
            float((meta.get("model_conf") or {}).get("ctc_weight", 0.3)))
        dec_conf = dict(meta.get("decoder_conf") or {})
        self.rescoring_reverse_weight = decoder_configs.pop(
            "rescoring_reverse_weight",
            float((meta.get("model_conf") or {}).get("reverse_weight", 0.0))
            if dec_conf.get("r_num_blocks", 0) > 0 else 0.0)
        self.beam_search_decoder = None
        self._device_beam_conf = None
        if decoder == "ctc_beam_search_device":
            # batched on-device prefix beam search (decoders/device_beam)
            # with optional dense-bigram LM fusion from an ARPA char LM
            conf = dict(decoder_configs)
            lm_path = conf.pop("language_model_path", None)
            lm_table = None
            if lm_path and os.path.exists(lm_path):
                from masr_tpu.decoders.scorer import is_kenlm_binary
                if is_kenlm_binary(lm_path):
                    logger.warning("device beam fuses ARPA LMs only; "
                                   "decoding without LM")
                else:
                    from masr_tpu.decoders.device_beam import \
                        build_dense_bigram
                    lm_table = build_dense_bigram(
                        lm_path, self._text_featurizer.vocab_list)
            self._device_beam_conf = dict(
                beam_size=min(int(conf.get("beam_size", 10)), 32),
                cutoff_top_n=int(conf.get("cutoff_top_n", 40)),
                lm_table=lm_table,
                alpha=float(conf.get("alpha", 2.2)),
                beta=float(conf.get("beta", 4.3)))
        elif decoder in ("ctc_beam_search", "attention_rescoring"):
            try:
                self.beam_search_decoder = BeamSearchDecoder(
                    self._text_featurizer.vocab_list, **decoder_configs)
            except Exception as e:
                logger.warning(f"beam search unavailable ({e}); "
                               f"falling back to greedy decoding")
                self.decoder = "ctc_greedy"
        if decoder == "attention_rescoring" and self.use_model == "deepspeech2":
            logger.warning("deepspeech2 has no attention decoder; "
                           "attention_rescoring falls back to ctc_beam_search")
            self.decoder = "ctc_beam_search"
        self.pun_predictor = None
        if use_pun:
            try:
                from masr_tpu.infer.punctuation import PunctuationPredictor
                # pun_model_dir=None → in-repo rule-based restorer
                self.pun_predictor = PunctuationPredictor(pun_model_dir)
            except Exception as e:
                logger.warning(f"punctuation model unavailable: {e}")
        self.inv_normalizer = None
        self._vad = None
        self.running = False
        # fused on-device frontend (samples → fbank → encoder in ONE
        # compiled program per window): fbank models only; the host
        # featurize path stays for mfcc/linear and as an explicit opt-out
        self.fused_frontend = bool(
            fused_frontend and self.streaming
            and pre.get("feature_method", "fbank") == "fbank")
        # streaming state
        self.remained_wav = None
        self.cached_feat = None
        self._stream_samples = None  # fused-path raw sample buffer
        self._stream_hidden = []  # encoder chunks for two-pass rescoring
        self.greedy_chunk_decoder = GreedyChunkDecoder(
            self._text_featurizer.vocab_list)
        if warmup:
            self._warmup()

    def _warmup(self):
        """Random-audio warmup-as-selftest (predict.py:88-93) — compiles the
        full-context program (and the chunk program for streaming models)."""
        warmup_audio = np.random.uniform(low=-2e4, high=2e4,
                                         size=16000).astype(np.float32) / 32768
        self.predict(audio_data=warmup_audio, sample_rate=16000)
        if self.streaming:
            self.predict_stream(audio_data=warmup_audio[:8000], is_end=True,
                                sample_rate=16000)
            self.reset_stream()

    # ------------------------------------------------------------------ #
    def _load_audio(self, audio_data, sample_rate=16000):
        """path | bytes | file-like | ndarray → AudioSegment
        (predict.py:146-164)."""
        if isinstance(audio_data, str):
            if not os.path.exists(audio_data):
                raise FileNotFoundError(f"audio file not found: {audio_data}")
            return AudioSegment.from_file(audio_data)
        if isinstance(audio_data, io.BufferedReader):
            return AudioSegment.from_file(audio_data)
        if isinstance(audio_data, np.ndarray):
            return AudioSegment.from_ndarray(audio_data, sample_rate)
        if isinstance(audio_data, bytes):
            return AudioSegment.from_bytes(audio_data)
        raise TypeError(f"unsupported audio_data type: {type(audio_data)}")

    def _greedy_full_mode(self):
        """True when full-context decoding is plain greedy — then the
        argmax head runs fused on device (ids readback, never probs)."""
        return (self._device_beam_conf is None
                and self.decoder != "attention_rescoring"
                and not (self.decoder == "ctc_beam_search"
                         and self.beam_search_decoder))

    def _finish_text(self, score, text, use_pun, is_itn):
        if use_pun and len(text) > 0 and self.pun_predictor is not None:
            text = self.pun_predictor(text)
        if is_itn:
            text = self.inverse_text_normalization(text)
        return {"text": text, "score": score}

    def _decode_result(self, probs, lens, use_pun=False, is_itn=False):
        """(1, T, V) probs → {'text', 'score'} (predict.py:118-144)."""
        if self._device_beam_conf is not None:
            from masr_tpu.decoders.device_beam import decode_batch_device
            score, text = decode_batch_device(
                probs[:1], lens[:1], self._text_featurizer.vocab_list,
                **self._device_beam_conf)[0]
        elif self.decoder == "ctc_beam_search" and self.beam_search_decoder:
            score, text = self.beam_search_decoder.decode_beam_search_offline(
                probs[0][: int(lens[0])])
        else:
            score, text = greedy_decoder(probs[0][: int(lens[0])],
                                         self._text_featurizer.vocab_list)
        if use_pun and len(text) > 0 and self.pun_predictor is not None:
            text = self.pun_predictor(text)
        if is_itn:
            text = self.inverse_text_normalization(text)
        return {"text": text, "score": score}

    # ------------------------------------------------------------------ #
    def predict(self, audio_data, use_pun=False, is_itn=False,
                sample_rate=16000):
        """Short-utterance recognition (predict.py:167-192)."""
        audio_segment = self._load_audio(audio_data, sample_rate)
        feats = self._audio_featurizer.featurize(audio_segment)
        speech = feats[np.newaxis]
        lens = np.array([feats.shape[0]], np.int64)
        if self.decoder == "attention_rescoring":
            return self._predict_rescoring(speech, lens, use_pun, is_itn)
        if self._device_beam_conf is not None:
            # probs stay on device end-to-end (encode → beam search)
            probs, out_lens = self.predictor.predict_device(speech, lens)
        elif self._greedy_full_mode():
            # greedy head fused on device: ids/maxp readback, never probs
            from masr_tpu.decoders.greedy import _collapse
            ids, maxp, out_lens = self.predictor.predict_greedy(speech, lens)
            L = int(out_lens[0])
            score, text = _collapse(ids[0][:L], maxp[0][:L],
                                    self._text_featurizer.vocab_list)
            return self._finish_text(score, text, use_pun, is_itn)
        else:
            probs, out_lens = self.predictor.predict(speech, lens)
        return self._decode_result(probs, out_lens, use_pun, is_itn)

    def _predict_rescoring(self, speech, lens, use_pun=False, is_itn=False):
        """CTC prefix beam n-best → attention-decoder rescoring:
        total = att_score + rescoring_ctc_weight * ctc_score."""
        enc, probs, out_lens = self.predictor.encode_for_rescoring(speech,
                                                                   lens)
        nbest = self.beam_search_decoder.decode_nbest(
            probs[0][: int(out_lens[0])], self.rescoring_nbest)
        nbest = [(s, ids) for s, ids in nbest if len(ids) > 0] or nbest
        if not nbest or all(len(ids) == 0 for _, ids in nbest):
            return {"text": "", "score": 0.0}
        att_scores = self.predictor.rescore(
            enc, out_lens[0], [ids for _, ids in nbest],
            reverse_weight=self.rescoring_reverse_weight,
            nbest_pad=self.rescoring_nbest)
        totals = [a + self.rescoring_ctc_weight * s
                  for a, (s, _) in zip(att_scores, nbest)]
        best = int(np.argmax(totals))
        text = self._text_featurizer.detokenize(nbest[best][1])
        if use_pun and text and self.pun_predictor is not None:
            text = self.pun_predictor(text)
        if is_itn and text:
            text = self.inverse_text_normalization(text)
        return {"text": text, "score": float(totals[best])}

    def predict_batch(self, audio_list, use_pun=False, is_itn=False,
                      sample_rate=16000):
        """Batched recognition (used by eval; not in the reference's
        predictor but matches its evaluate() batch path)."""
        feats = [self._audio_featurizer.featurize(
            self._load_audio(a, sample_rate)) for a in audio_list]
        T = max(f.shape[0] for f in feats)
        speech = np.zeros((len(feats), T, feats[0].shape[1]), np.float32)
        lens = np.zeros(len(feats), np.int64)
        for i, f in enumerate(feats):
            speech[i, : f.shape[0]] = f
            lens[i] = f.shape[0]
        if self._device_beam_conf is not None:
            # the whole batch's beam search is one device program; probs
            # stay on device between the encode and decode programs
            from masr_tpu.decoders.device_beam import decode_batch_device
            probs, out_lens = self.predictor.predict_device(speech, lens)
            decoded = decode_batch_device(
                probs, out_lens, self._text_featurizer.vocab_list,
                **self._device_beam_conf)
            results = []
            for score, text in decoded:
                if use_pun and text and self.pun_predictor is not None:
                    text = self.pun_predictor(text)
                if is_itn and text:
                    text = self.inverse_text_normalization(text)
                results.append({"text": text, "score": score})
            return results
        if self._greedy_full_mode():
            # greedy head fused on device: ids/maxp readback, never probs
            from masr_tpu.decoders.greedy import _collapse
            ids, maxp, out_lens = self.predictor.predict_greedy(speech, lens)
            results = []
            for i in range(len(feats)):
                L = int(out_lens[i])
                score, text = _collapse(ids[i][:L], maxp[i][:L],
                                        self._text_featurizer.vocab_list)
                results.append(self._finish_text(score, text, use_pun,
                                                 is_itn))
            return results
        probs, out_lens = self.predictor.predict(speech, lens)
        results = []
        for i in range(len(feats)):
            results.append(self._decode_result(probs[i:i + 1],
                                               out_lens[i:i + 1],
                                               use_pun, is_itn))
        return results

    # ------------------------------------------------------------------ #
    def predict_long(self, audio_data, use_pun=False, is_itn=False,
                     sample_rate=16000):
        """VAD-segmented long-audio recognition (predict.py:195-234)."""
        if self._vad is None:
            from masr_tpu.infer.vad import VADPredictor
            self._vad = VADPredictor()
        audio_segment = self._load_audio(audio_data, sample_rate)
        if audio_segment.sample_rate != self._audio_featurizer.sample_rate:
            audio_segment.resample(self._audio_featurizer.sample_rate)
        samples = audio_segment.samples
        sr = audio_segment.sample_rate
        speech_ts = self._vad.get_speech_timestamps(samples, sr)
        segs = [samples[ts["start"]: ts["end"]] for ts in speech_ts]
        results = self._predict_segments(segs, use_pun, is_itn, sr)
        texts, scores = "", []
        for result in results:
            if result["text"]:
                texts = texts + "，" + result["text"] if texts \
                    else result["text"]
                scores.append(result["score"])
        return {"text": texts,
                "score": round(float(np.mean(scores)), 2) if scores else 0.0}

    def _predict_segments(self, segs, use_pun, is_itn, sr, group=16):
        """Recognize VAD segments BATCHED (beyond the reference's
        per-segment loop, predict.py:213-230): segments are sorted by
        duration, grouped, and each group runs as one padded
        predict_batch program — results return in original order.
        Attention rescoring keeps the per-segment path (its n-best
        rescore is per-utterance)."""
        if self.decoder == "attention_rescoring" or len(segs) <= 1:
            return [self.predict(s, use_pun=use_pun, is_itn=is_itn,
                                 sample_rate=sr) for s in segs]
        order = sorted(range(len(segs)), key=lambda i: len(segs[i]))
        results = [None] * len(segs)
        for g in range(0, len(order), group):
            idx = order[g: g + group]
            batch = [segs[i] for i in idx]
            # pad the final partial group (singletons included) to the fixed
            # group size so one compiled (B, T-bucket) program serves every
            # call — a lone final segment must not trigger a fresh B=1 compile
            while 0 < len(batch) < group:
                batch.append(batch[0])
            decoded = self.predict_batch(batch, use_pun=use_pun,
                                         is_itn=is_itn, sample_rate=sr)
            for i, r in zip(idx, decoded):
                results[i] = r
        return results

    # ------------------------------------------------------------------ #
    def _decode_stream_window(self, probs, valid_out, rescoring,
                              hidden=None):
        """Shared per-window tail: trim to valid frames, stash hidden for
        two-pass rescoring, advance the incremental beam/greedy decode."""
        probs = probs[:, :valid_out]
        if probs.shape[1] == 0:
            return None
        if rescoring and hidden is not None:
            self._stream_hidden.append(np.asarray(hidden)[:, :valid_out])
        if self.beam_search_decoder is not None and self.decoder in (
                "ctc_beam_search", "attention_rescoring"):
            return self.beam_search_decoder.decode_chunk(probs[0])
        return self.greedy_chunk_decoder.decode_chunk(probs[0])

    def _greedy_stream_mode(self):
        """True when the streaming decode is plain greedy — then the
        greedy head runs fused on device (ids readback, never probs)."""
        return (self._device_beam_conf is None
                and (self.beam_search_decoder is None or self.decoder
                     not in ("ctc_beam_search", "attention_rescoring")))

    def _decode_greedy_ids(self, ids, maxp, valid_out):
        if valid_out <= 0:
            return None
        return self.greedy_chunk_decoder.decode_chunk_ids(
            ids[0, :valid_out], maxp[0, :valid_out])

    def _ensure_fused_beam(self):
        """Attach the device beam as a pure decode fn fused into the
        chunk program: encoder + beam search + best-hypothesis selection
        run as ONE compiled program per window (the probs never leave
        the accelerator — vs DeviceBeamStream's separate program, which
        cost a D2H+H2D probs round-trip and a second dispatch)."""
        if self.predictor._decode_fn is None:
            from masr_tpu.decoders.device_beam import make_stream_decode_fn
            c = self._device_beam_conf
            vocab = self._text_featurizer.vocab_list
            space_id = vocab.index("<space>") if "<space>" in vocab else -1
            init_fn, decode_fn = make_stream_decode_fn(
                beam_size=c["beam_size"], cutoff_top_n=c["cutoff_top_n"],
                lm_table=c["lm_table"], alpha=c["alpha"], beta=c["beta"],
                space_id=space_id, max_len=4096)
            self.predictor.attach_stream_decoder(init_fn, decode_fn, batch=1)

    def _window_decode_fused(self, valid_out, window=None, seg=None,
                             gain=1.0, valid_samples=None):
        """One fused encoder+beam window step → (score, text) or None."""
        self._ensure_fused_beam()
        CH = DECODING_CHUNK_SIZE
        fv = np.zeros((1, CH), bool)
        fv[0, : max(min(valid_out, CH), 0)] = True
        if window is not None:
            tokens, lengths, scores = self.predictor.predict_chunk_decode(
                window, fv)
        else:
            tokens, lengths, scores = \
                self.predictor.predict_chunk_samples_decode(
                    seg, gain, valid_samples, fv)
        if valid_out <= 0:
            return None
        ids = tokens[0][: int(lengths[0])].tolist()
        return float(scores[0]), self._text_featurizer.detokenize(ids)

    def _stream_step_host(self, audio_data, is_end):
        """Host-featurize path (the reference's structure, predict.py:
        267-330): fbank over the accumulated remainder on CPU, feature
        cache windowing, feature windows to the device chunk step."""
        if self.remained_wav is None:
            self.remained_wav = audio_data
        else:
            self.remained_wav = AudioSegment(
                np.concatenate([self.remained_wav.samples,
                                audio_data.samples]),
                audio_data.sample_rate)

        x_chunk = self._audio_featurizer.featurize(self.remained_wav)
        x_chunk = np.asarray(x_chunk, np.float32)[np.newaxis]
        if self.cached_feat is None:
            self.cached_feat = x_chunk
        else:
            self.cached_feat = np.concatenate([self.cached_feat, x_chunk],
                                              axis=1)
        hop = int(self.remained_wav.sample_rate * 0.01)
        self.remained_wav = AudioSegment(
            self.remained_wav.samples[hop * x_chunk.shape[1]:],
            self.remained_wav.sample_rate)

        num_frames = self.cached_feat.shape[1]
        if num_frames < DECODING_WINDOW and not is_end:
            return None
        if num_frames < CONTEXT:
            return None
        left_frames = CONTEXT if is_end else DECODING_WINDOW

        score, text, end = None, "", None
        rescoring = (self.decoder == "attention_rescoring"
                     and self.beam_search_decoder is not None)
        for cur in range(0, num_frames - left_frames + 1, STRIDE):
            end = min(cur + DECODING_WINDOW, num_frames)
            window = self.cached_feat[:, cur:end, :]
            valid_len = window.shape[1]
            if valid_len < DECODING_WINDOW:
                # final partial window: pad to the compiled static shape and
                # trim the outputs to the valid frame count
                window = np.pad(window,
                                ((0, 0), (0, DECODING_WINDOW - valid_len),
                                 (0, 0)))
            valid_out = max(_subsampled_len(valid_len), 0)
            if rescoring:
                probs, hidden = self.predictor.predict_chunk_full(window)
                r = self._decode_stream_window(probs, valid_out, True, hidden)
            elif self._device_beam_conf is not None:
                r = self._window_decode_fused(valid_out, window=window)
            elif self._greedy_stream_mode():
                ids, maxp = self.predictor.predict_chunk_greedy(window)
                r = self._decode_greedy_ids(ids, maxp, valid_out)
            else:
                probs = self.predictor.predict_chunk(window)
                r = self._decode_stream_window(probs, valid_out, False)
            if r is not None:
                score, text = r
        if end is not None:
            self.cached_feat = self.cached_feat[:, end - CACHED_FEATURE_NUM:, :]
        return score, text

    def _stream_step_fused(self, audio_data, is_end):
        """Fused on-device frontend (VERDICT r1 item 5): the sample buffer
        is windowed in the SAMPLE domain and each 67-frame window's fbank
        runs inside the same compiled program as the encoder chunk step —
        one device roundtrip per window, no host featurize, no feature
        cache. Kaldi snip-edges frames are pure functions of their sample
        window, so recomputing overlap frames from samples is exact.

        Deviation from the host path (documented in
        docs/design_deviations.md): dB-normalization gain is computed per
        call over the raw unconsumed buffer and applied uniformly to the
        call's windows, instead of the reference's normalize-the-mutated-
        remainder-in-place semantics."""
        sr = self._audio_featurizer.sample_rate
        if audio_data.sample_rate != sr:
            audio_data.resample(sr)
        samples = audio_data.samples
        if self._stream_samples is None:
            self._stream_samples = samples
        else:
            self._stream_samples = np.concatenate(
                [self._stream_samples, samples])
        buf = self._stream_samples

        hop = int(sr * 0.01)
        wlen = int(sr * 0.025)
        num_frames = 0 if len(buf) < wlen else 1 + (len(buf) - wlen) // hop
        if num_frames < DECODING_WINDOW and not is_end:
            return None
        if num_frames < CONTEXT:
            return None
        left_frames = CONTEXT if is_end else DECODING_WINDOW
        window_samples = (DECODING_WINDOW - 1) * hop + wlen

        gain = 1.0
        if self._audio_featurizer._use_dB_normalization:
            ms = float(np.mean(buf.astype(np.float64) ** 2))
            if ms > 0:
                gain_db = self._audio_featurizer._target_dB \
                    - 10.0 * np.log10(ms)
                gain = float(10.0 ** (min(gain_db, 300.0) / 20.0))

        score, text, end = None, "", None
        rescoring = (self.decoder == "attention_rescoring"
                     and self.beam_search_decoder is not None)
        for cur in range(0, num_frames - left_frames + 1, STRIDE):
            end = min(cur + DECODING_WINDOW, num_frames)
            valid_len = end - cur
            valid_samples = (valid_len - 1) * hop + wlen
            seg = buf[cur * hop: cur * hop + window_samples]
            if len(seg) < window_samples:
                seg = np.pad(seg, (0, window_samples - len(seg)))
            valid_out = max(_subsampled_len(valid_len), 0)
            if rescoring:
                probs, hidden = self.predictor.predict_chunk_samples(
                    seg[None], gain=gain, length=valid_samples, full=True)
                r = self._decode_stream_window(probs, valid_out, True, hidden)
            elif self._device_beam_conf is not None:
                r = self._window_decode_fused(
                    valid_out, seg=seg[None], gain=gain,
                    valid_samples=valid_samples)
            elif self._greedy_stream_mode():
                ids, maxp = self.predictor.predict_chunk_samples_greedy(
                    seg[None], gain=gain, length=valid_samples)
                r = self._decode_greedy_ids(ids, maxp, valid_out)
            else:
                probs = self.predictor.predict_chunk_samples(
                    seg[None], gain=gain, length=valid_samples)
                r = self._decode_stream_window(probs, valid_out, False)
            if r is not None:
                score, text = r
        if end is not None:
            keep_from = max(end - CACHED_FEATURE_NUM, 0) * hop
            self._stream_samples = buf[keep_from:]
        return score, text

    def predict_stream(self, audio_data, is_end=False, use_pun=False,
                       is_itn=False, channels=1, samp_width=2,
                       sample_rate=16000):
        """Streaming recognition (parity: predict.py:237-343 — identical
        window math: window 67, stride 64, feature cache 3)."""
        if not self.streaming:
            raise RuntimeError(
                f"model {self.use_model} was not exported as streaming")
        if isinstance(audio_data, np.ndarray):
            audio_data = AudioSegment.from_ndarray(audio_data, sample_rate)
        elif isinstance(audio_data, bytes):
            audio_data = AudioSegment.from_pcm_bytes(
                audio_data, channels=channels, samp_width=samp_width,
                sample_rate=sample_rate)
        else:
            raise TypeError(f"unsupported audio_data type: {type(audio_data)}")
        if self.fused_frontend:
            ret = self._stream_step_fused(audio_data, is_end)
        else:
            ret = self._stream_step_host(audio_data, is_end)
        if ret is None:
            return None
        score, text = ret

        # two-pass: rerank the CTC n-best with the attention decoder over
        # the accumulated encoder states (U2-style second pass)
        if is_end and self.decoder == "attention_rescoring" and \
                self.beam_search_decoder is not None and self._stream_hidden:
            nbest = self.beam_search_decoder.nbest_state(self.rescoring_nbest)
            nbest = [(s, ids) for s, ids in nbest if ids]
            if nbest:
                enc = np.concatenate(self._stream_hidden, axis=1)
                att_scores = self.predictor.rescore(
                    enc, enc.shape[1], [ids for _, ids in nbest],
                    reverse_weight=self.rescoring_reverse_weight,
                    nbest_pad=self.rescoring_nbest)
                totals = [a + self.rescoring_ctc_weight * s
                          for a, (s, _) in zip(att_scores, nbest)]
                best = int(np.argmax(totals))
                text = self._text_featurizer.detokenize(nbest[best][1])
                score = float(totals[best])

        if use_pun and is_end and text and self.pun_predictor is not None:
            text = self.pun_predictor(text)
        if is_itn and text:
            text = self.inverse_text_normalization(text)
        return {"text": text, "score": score}

    def reset_stream(self):
        """(parity: predict.py:346-353)."""
        self.predictor.reset_stream()
        self.remained_wav = None
        self.cached_feat = None
        self._stream_samples = None
        self._stream_hidden = []
        self.greedy_chunk_decoder.reset()
        if self.beam_search_decoder is not None:
            self.beam_search_decoder.reset_state()

    def inverse_text_normalization(self, text):
        """Chinese ITN (predict.py:356-362); optional plugin."""
        if self.inv_normalizer is None:
            try:
                from itn.chinese.inverse_normalizer import InverseNormalizer
                self.inv_normalizer = InverseNormalizer()
            except ImportError:
                from masr_tpu.infer.itn import SimpleInverseNormalizer
                self.inv_normalizer = SimpleInverseNormalizer()
        return self.inv_normalizer.normalize(text)

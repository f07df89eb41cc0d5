"""MASRTrainer — the training facade
(parity: masr/trainer.py:38-697 — create_data / train / evaluate / export /
extract_features with the same config schema and checkpoint semantics).

TPU-native: a 1-D data mesh over all devices (SURVEY.md §5.8), params
replicated and the batch sharded on its leading axis — XLA inserts the
gradient all-reduce; grad accumulation via optax.MultiSteps; orbax
checkpoints with last/best/epoch retention; JSONL scalar logging.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.data.dataset import MASRDataset
from masr_tpu.data.manifest import (build_vocab, create_manifest,
                                    create_noise_manifest)
from masr_tpu.data.loader import DataLoader
from masr_tpu.data.normalizer import FeatureNormalizer
from masr_tpu.data.sampler import BatchShuffleSampler, ShardedBatchSampler
from masr_tpu.data.text_featurizer import TextFeaturizer
from masr_tpu.decoders.greedy import greedy_decoder_batch
from masr_tpu.models.registry import build_model
from masr_tpu.optimizer.schedulers import build_optimizer
from masr_tpu.parallel.mesh import (make_mesh, maybe_init_distributed,
                                    replicate, shard_batch)
from masr_tpu.training import checkpoints as ckpt
from masr_tpu.training.logging_util import ScalarWriter
from masr_tpu.training.train_state import (TrainState, make_eval_step,
                                           train_rng,
                                           make_eval_step_rescoring,
                                           make_train_step)
from masr_tpu.utils.config import dict_to_object, load_config
from masr_tpu.utils.logger import setup_logger
from masr_tpu.utils.metrics import cer, wer

logger = setup_logger()


class MASRTrainer(object):
    def __init__(self, configs, use_gpu=True, overwrites=None):
        """configs: YAML path or dict (same schema as the reference,
        SURVEY.md §5.6). use_gpu is accepted for API parity; device
        selection is JAX's (TPU when present)."""
        if isinstance(configs, str):
            configs = load_config(configs)
        self.configs = dict_to_object(configs) if isinstance(configs, dict) \
            else configs
        if overwrites:
            for kv in overwrites.split(","):
                k, v = kv.strip().split("=", 1)
                node = self.configs
                keys = k.split(".")
                for kk in keys[:-1]:
                    node = node[kk]
                node[keys[-1]] = yaml_value(v)
        self.use_model = self.configs.use_model
        self.streaming = bool(self.configs.get("streaming", True))
        self.stop_train = False
        self.stop_eval = False
        self.model = None
        self.state = None
        import masr_tpu
        masr_tpu.enable_compilation_cache()
        maybe_init_distributed()
        # train_conf.tensor_parallel > 1 → 2-D dp×tp mesh with
        # Megatron-style param shardings (masr_tpu/parallel/tp.py);
        # default is the reference-equivalent pure data parallel
        self.tensor_parallel = int(self.configs.get(
            "train_conf", {}).get("tensor_parallel", 1) or 1)
        if self.tensor_parallel > 1:
            from masr_tpu.parallel.tp import make_mesh_2d
            self.mesh = make_mesh_2d(self.tensor_parallel)
        else:
            self.mesh = make_mesh()
        # fused Pallas paths shard_map over this mesh on multi-chip
        from masr_tpu.parallel.mesh import set_active_mesh
        set_active_mesh(self.mesh)
        self.rank = jax.process_index()
        self.num_hosts = jax.process_count()

    # ------------------------------------------------------------------ #
    # data
    # ------------------------------------------------------------------ #
    def create_data(self, annotation_path="dataset/annotation/",
                    noise_dir="dataset/audio/noise",
                    num_samples=1000000, count_threshold=2,
                    is_change_frame_rate=True, max_test_manifest=10000,
                    only_keep_zh_en=True):
        """Manifests → noise manifest → vocab → CMVN stats (trainer.py:429-505)."""
        d = self.configs.dataset_conf
        create_manifest(annotation_path, d.train_manifest, d.test_manifest,
                        is_change_frame_rate=is_change_frame_rate,
                        target_sr=self.configs.preprocess_conf.sample_rate,
                        only_keep_zh_en=only_keep_zh_en,
                        max_test_manifest=max_test_manifest)
        if noise_dir and d.get("noise_manifest_path"):
            create_noise_manifest(noise_dir, d.noise_manifest_path)
        build_vocab(d.dataset_vocab, [d.train_manifest, d.test_manifest],
                    count_threshold=count_threshold)
        featurizer = AudioFeaturizer(train=False, **self.configs.preprocess_conf)
        normalizer = FeatureNormalizer()
        normalizer.compute_mean_istd(d.train_manifest, featurizer,
                                     d.mean_istd_path,
                                     num_samples=num_samples)
        if d.get("manifest_type") == "binary":
            from masr_tpu.data.binary import create_manifest_binary
            create_manifest_binary(d.train_manifest, d.test_manifest)

    def extract_features(self, save_dir="dataset/features", max_duration=100,
                         batch_size=500):
        """Pre-dump features to pooled .npy slabs and rewrite manifests with
        start_frame/end_frame entries (trainer.py:123-165)."""
        d = self.configs.dataset_conf
        os.makedirs(save_dir, exist_ok=True)
        for manifest_path in [d.train_manifest, d.test_manifest]:
            ds = MASRDataset(self.configs.preprocess_conf, manifest_path,
                             vocab_filepath=None, train=False,
                             min_duration=0, max_duration=max_duration)
            out_entries = []
            slab, offsets = [], 0
            slab_idx = 0
            base = os.path.basename(manifest_path)
            for i in range(len(ds)):
                feats, _ = ds[i]
                entry = dict(ds.entries[i])
                out_entries.append({
                    "audio_filepath": os.path.join(
                        save_dir, f"{base}_{slab_idx}.npy"),
                    "duration": entry["duration"], "text": entry["text"],
                    "start_frame": offsets,
                    "end_frame": offsets + feats.shape[0]})
                slab.append(feats)
                offsets += feats.shape[0]
                if len(slab) >= batch_size:
                    np.save(os.path.join(save_dir, f"{base}_{slab_idx}.npy"),
                            np.concatenate(slab, axis=0))
                    slab, offsets, slab_idx = [], 0, slab_idx + 1
            if slab:
                np.save(os.path.join(save_dir, f"{base}_{slab_idx}.npy"),
                        np.concatenate(slab, axis=0))
            out_path = manifest_path + ".feature"
            with open(out_path, "w", encoding="utf-8") as f:
                for e in out_entries:
                    f.write(json.dumps(e, ensure_ascii=False) + "\n")
            logger.info(f"features extracted: {out_path}")

    def _setup_dataloader(self, is_train, augment_conf_path=None):
        d = self.configs.dataset_conf
        pre = self.configs.preprocess_conf
        aug = "{}"
        if is_train and augment_conf_path and os.path.exists(augment_conf_path):
            aug = augment_conf_path
        self._augment_conf_path = aug if aug != "{}" else \
            getattr(self, "_augment_conf_path", None)
        manifest = d.train_manifest if is_train else d.test_manifest
        if d.get("manifest_type") == "binary":
            manifest = manifest + ".data" if not manifest.endswith(".data") \
                else manifest
        on_device = bool(d.get("on_device_frontend", False))
        dataset = MASRDataset(
            pre, manifest, d.dataset_vocab,
            manifest_type=d.get("manifest_type", "txt"),
            min_duration=d.get("min_duration", 0),
            max_duration=d.get("max_duration", 20) if is_train else -1,
            augmentation_config=aug, train=is_train,
            return_waveform=on_device)
        batch_size = d.batch_size
        if is_train:
            sampler = ShardedBatchSampler(
                len(dataset), batch_size, rank=self.rank,
                num_replicas=self.num_hosts, sortagrad=True, drop_last=True,
                seed=self.configs.get("seed", 0)) if self.num_hosts > 1 else \
                BatchShuffleSampler(len(dataset), batch_size, sortagrad=True,
                                    drop_last=True,
                                    seed=self.configs.get("seed", 0))
        else:
            sampler = BatchShuffleSampler(len(dataset), batch_size,
                                          shuffle=False, drop_last=False)
        collate = None
        if on_device:
            from masr_tpu.data.collate import collate_waveforms
            bucket = int(d.get("sample_bucket", 16000))
            rng = np.random.RandomState(self.configs.get("seed", 0))

            def collate(items, _rng=rng, _b=bucket):
                return collate_waveforms(items, sample_bucket=_b, rng=_rng)

        loader = DataLoader(dataset, sampler,
                            num_workers=d.get("num_workers", 4),
                            collate=collate)
        return dataset, sampler, loader

    def _device_frontend(self):
        """The fused on-device input frontend (fbank + SpecAugment +
        SpecSub inside the compiled step) when
        dataset_conf.on_device_frontend is set; None otherwise. Params
        come from the augmentation JSON's specaug/specsub entries."""
        if not bool(self.configs.dataset_conf.get("on_device_frontend",
                                                  False)):
            return None
        from masr_tpu.ops.specaug import make_device_frontend
        specaug = specsub = None
        path = getattr(self, "_augment_conf_path", None)
        if path and os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for item in json.load(f):
                    if item.get("prob", 0) <= 0:
                        continue
                    if item.get("type") == "specaug":
                        specaug = item.get("params")
                    elif item.get("type") == "specsub":
                        specsub = item.get("params")
        return make_device_frontend(self.configs.preprocess_conf, specaug,
                                    specsub)

    # ------------------------------------------------------------------ #
    # model
    # ------------------------------------------------------------------ #
    def _setup_model(self, input_dim, vocab_size, is_train=False):
        d = self.configs.dataset_conf
        # enable_amp → bfloat16 compute (f32 params/reductions), the TPU
        # equivalent of the reference's AMP autocast (trainer.py:369-371)
        amp = bool(self.configs.get("train_conf", {}).get("enable_amp", False))
        self.model = build_model(
            self.use_model, input_dim, vocab_size,
            mean_istd_path=d.mean_istd_path, streaming=self.streaming,
            encoder_conf=self.configs.get("encoder_conf"),
            decoder_conf=self.configs.get("decoder_conf"),
            model_conf=self.configs.get("model_conf"),
            dtype=jnp.bfloat16 if amp else jnp.float32)
        rng = jax.random.PRNGKey(self.configs.get("seed", 0))
        L = self.configs.dataset_conf.get("init_label_len", 8)
        dummy = (jnp.zeros((2, 160, input_dim)), jnp.asarray([160, 160]),
                 jnp.zeros((2, L), jnp.int32), jnp.asarray([L, L]))
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            {"params": rng, "dropout": rng, "chunk": rng}, *dummy, train=True)
        params = variables["params"]
        if str(self.configs.get("train_conf", {}).get(
                "init_type", "flax")) == "torch_default":
            # reference-default init distributions (torch kaiming_uniform
            # kernels + uniform biases) — what the reference's own runs
            # start from; see models/initializers.py
            from masr_tpu.models.initializers import torch_default_reinit
            params = torch_default_reinit(params, jax.random.fold_in(rng, 1))
            variables = dict(variables, params=params)
        batch_stats = variables.get("batch_stats")
        if is_train:
            t = self.configs.train_conf
            tx, self.lr_schedule = build_optimizer(
                self.configs.optimizer_conf,
                grad_clip=t.get("grad_clip", 5.0),
                accum_grad=t.get("accum_grad", 1))
            self.state = TrainState.create(self.model.apply, params, tx,
                                           batch_stats)
        else:
            self.state = None
            self.variables = variables
        return variables

    def _variables(self):
        v = {"params": self.state.params} if self.state is not None \
            else dict(self.variables)
        if self.state is not None and self.state.batch_stats is not None:
            v["batch_stats"] = self.state.batch_stats
        return v

    def _state_pytree(self):
        return {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "batch_stats": self.state.batch_stats,
                "step": self.state.step}

    # ------------------------------------------------------------------ #
    # train
    # ------------------------------------------------------------------ #
    def train(self, save_model_path="models/", resume_model=None,
              pretrained_model=None, augment_conf_path="configs/augmentation.json"):
        t_conf = self.configs.train_conf
        dataset, sampler, loader = self._setup_dataloader(
            True, augment_conf_path)
        test_dataset, _, test_loader = self._setup_dataloader(False)
        input_dim = dataset.feature_dim
        vocab_size = dataset.vocab_size
        self._setup_model(input_dim, vocab_size, is_train=True)
        save_dir = os.path.join(
            save_model_path,
            f"{self.use_model}_{'streaming' if self.streaming else 'non-streaming'}"
            f"_{self.configs.preprocess_conf.feature_method}")

        last_epoch = 0
        best_error = float("inf")
        # auto-resume (trainer.py:266-292)
        resume = resume_model or ckpt.latest_checkpoint(save_dir)
        if resume:
            restored, meta = ckpt.load_checkpoint(resume, self._state_pytree())
            self.state = self.state.replace(
                params=restored["params"], opt_state=restored["opt_state"],
                batch_stats=restored.get("batch_stats"),
                step=restored["step"])
            last_epoch = int(meta.get("last_epoch", 0))
            best_error = float(meta.get("test_cer", meta.get(
                "test_wer", float("inf"))) or float("inf"))
            logger.info(f"resumed from {resume} at epoch {last_epoch}")
        elif pretrained_model:
            params = ckpt.load_pretrained(self.state.params, pretrained_model,
                                          self._state_pytree())
            self.state = self.state.replace(params=params)
            logger.info(f"loaded pretrained weights from {pretrained_model}")

        if self.tensor_parallel > 1:
            from masr_tpu.parallel.tp import shard_train_state
            self.state = shard_train_state(self.state, self.mesh)
        else:
            self.state = replicate(self.state, self.mesh)
        train_step = jax.jit(make_train_step(self.model, self.state.tx,
                                             frontend=self._device_frontend()),
                             donate_argnums=(0,))
        # rbg keys: threefry dropout bits cost ~40% of the fwd+bwd on TPU
        rng = train_rng(self.configs.get("seed", 0))
        writer = ScalarWriter(self.configs.get("log_dir", "log")) \
            if self.rank == 0 else None
        max_epoch = t_conf.max_epoch
        log_interval = t_conf.get("log_interval", 100)
        accum = t_conf.get("accum_grad", 1)
        # mid-epoch checkpoint cadence (trainer.py:425-426: every 10k batches)
        save_interval = t_conf.get("save_interval_batches", 10000)
        # device-level profiling (beyond the reference's hand timing,
        # SURVEY.md §5.1): profile_batches: [start, end] traces those
        # batches of epoch 1 into <log_dir>/profile for xprof/tensorboard
        profile_range = t_conf.get("profile_batches") or []

        for epoch in range(last_epoch, max_epoch):
            sampler.set_epoch(epoch)
            epoch_start = time.time()
            batch_start = time.time()
            losses = []
            for batch_id, batch in enumerate(loader):
                if self.stop_train:
                    logger.warning("training stopped by stop_train flag")
                    return
                reader_cost = time.time() - batch_start
                if profile_range and epoch == last_epoch and \
                        batch_id == profile_range[0] and self.rank == 0:
                    jax.profiler.start_trace(os.path.join(
                        self.configs.get("log_dir", "log"), "profile"))
                sharded = shard_batch(batch, self.mesh)
                self.state, metrics = train_step(self.state, sharded, rng)
                if profile_range and epoch == last_epoch and \
                        batch_id == profile_range[-1] and self.rank == 0:
                    jax.tree.map(
                        lambda x: x.block_until_ready(), self.state.params)
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to log/profile")
                loss = float(metrics["loss"])
                losses.append(loss)
                batch_cost = time.time() - batch_start
                if batch_id % log_interval == 0 and self.rank == 0:
                    step = int(self.state.step)
                    lr = float(self.lr_schedule(step // max(accum, 1)))
                    ips = batch["inputs"].shape[0] / max(batch_cost, 1e-9)
                    eta_batches = (len(loader) - batch_id) + \
                        (max_epoch - epoch - 1) * len(loader)
                    eta = int(eta_batches * batch_cost)
                    logger.info(
                        f"epoch [{epoch + 1}/{max_epoch}] "
                        f"batch [{batch_id}/{len(loader)}] loss {loss:.4f} "
                        f"lr {lr:.8f} reader_cost {reader_cost:.3f}s "
                        f"batch_cost {batch_cost:.3f}s ips {ips:.1f} "
                        f"eta {eta}s")
                    if writer:
                        writer.add_scalar("Train/Loss", loss, step)
                        writer.add_scalar("Train/lr", lr, step)
                if save_interval and batch_id > 0 and \
                        batch_id % save_interval == 0 and self.rank == 0:
                    ckpt.save_checkpoint(
                        save_dir, epoch + 1,
                        jax.device_get(self._state_pytree()),
                        metrics={"last_epoch": epoch,
                                 "mid_epoch_batch": batch_id})
                batch_start = time.time()
            logger.info(f"epoch {epoch + 1} finished in "
                        f"{time.time() - epoch_start:.1f}s, "
                        f"mean loss {np.mean(losses):.4f}")
            if self.rank == 0:
                # training-time eval forces greedy (trainer.py:520)
                error, test_loss = self._evaluate_loader(
                    test_loader, test_dataset, decoder="ctc_greedy")
                metric_name = self.configs.get("metrics_type", "cer")
                logger.info(f"epoch {epoch + 1}: test {metric_name}={error:.5f} "
                            f"loss={test_loss:.4f}")
                if writer:
                    writer.add_scalar(f"Test/{metric_name}", error,
                                      int(self.state.step))
                    writer.add_scalar("Test/Loss", test_loss,
                                      int(self.state.step))
                is_best = error <= best_error
                best_error = min(error, best_error)
                ckpt.save_checkpoint(
                    save_dir, epoch + 1,
                    jax.device_get(self._state_pytree()),
                    metrics={"last_epoch": epoch + 1,
                             f"test_{metric_name}": error,
                             "test_loss": float(test_loss)},
                    best=is_best)
        if writer:
            writer.close()

    # ------------------------------------------------------------------ #
    # evaluate
    # ------------------------------------------------------------------ #
    def _resolve_eval_decoder(self, vocab_list, decoder=None):
        """Resolve the configured eval decoder and lazily build the beam
        engine (parity: reference trainer.py:323-345 — eval decode honors
        the YAML `decoder` key; published CERs are beam-search numbers)."""
        decoder = decoder or self.configs.get("decoder", "ctc_greedy")
        if decoder == "attention_rescoring" and self.use_model == "deepspeech2":
            logger.warning("deepspeech2 has no attention decoder; eval "
                           "attention_rescoring falls back to ctc_beam_search")
            decoder = "ctc_beam_search"
        if decoder == "ctc_beam_search_device":
            # batched LM-free prefix beam search fully on device
            # (masr_tpu/decoders/device_beam.py) — no host decode loop
            return decoder
        if decoder in ("ctc_beam_search", "attention_rescoring"):
            if getattr(self, "_eval_beam_decoder", None) is None:
                from masr_tpu.decoders.beam_search import BeamSearchDecoder
                conf = dict(self.configs.get(
                    "ctc_beam_search_decoder_conf") or {})
                for k in ("rescoring_nbest", "rescoring_ctc_weight",
                          "rescoring_reverse_weight"):
                    conf.pop(k, None)
                try:
                    self._eval_beam_decoder = BeamSearchDecoder(
                        vocab_list, **conf)
                except Exception as e:
                    logger.warning(f"beam search decoder unavailable ({e}); "
                                   f"falling back to ctc_greedy for eval")
                    decoder = "ctc_greedy"
        return decoder

    def _rescore_batch(self, rescore_fn, variables, enc, probs, lens,
                       tf, nbest_n, ctc_weight, reverse_weight):
        """Per-utterance CTC n-best → attention-decoder rescoring over a
        batch; hyps padded to fixed (nbest_n, L8) so the rescore program
        compiles once per (batch T, L bucket)."""
        results = []
        for i in range(probs.shape[0]):
            nbest = self._eval_beam_decoder.decode_nbest(
                probs[i][: int(lens[i])], nbest_n)
            nbest = [(s, ids) for s, ids in nbest if len(ids) > 0] or nbest
            if not nbest or all(len(ids) == 0 for _, ids in nbest):
                results.append((0.0, ""))
                continue
            L = max(max(len(ids) for _, ids in nbest), 1)
            L = -(-L // 8) * 8
            hyps = np.full((nbest_n, L), -1, np.int32)
            hyp_lens = np.zeros((nbest_n,), np.int32)
            for j, (_, ids) in enumerate(nbest[:nbest_n]):
                hyps[j, : len(ids)] = ids
                hyp_lens[j] = len(ids)
            att = np.asarray(rescore_fn(
                variables, enc[i:i + 1], jnp.asarray(int(lens[i])),
                jnp.asarray(hyps), jnp.asarray(hyp_lens)))[: len(nbest)]
            totals = [a + ctc_weight * s
                      for a, (s, _) in zip(att, nbest)]
            best = int(np.argmax(totals))
            results.append((float(totals[best]),
                            tf.detokenize(nbest[best][1])))
        return results

    def _evaluate_loader(self, loader, dataset, display_result=False,
                         decoder=None):
        variables = self._variables()
        vocab_list = dataset.vocab_list
        tf = TextFeaturizer(self.configs.dataset_conf.dataset_vocab)
        metric = self.configs.get("metrics_type", "cer")
        decoder = self._resolve_eval_decoder(vocab_list, decoder)
        frontend = self._device_frontend()
        rescoring = decoder == "attention_rescoring"
        if rescoring:
            eval_step = jax.jit(make_eval_step_rescoring(self.model,
                                                         frontend=frontend))
            m_conf = self.configs.get("model_conf") or {}
            d_conf = self.configs.get("decoder_conf") or {}
            ctc_weight = float(m_conf.get("ctc_weight", 0.3))
            reverse_weight = float(m_conf.get("reverse_weight", 0.0)) \
                if int(d_conf.get("r_num_blocks", 0)) > 0 else 0.0
            nbest_n = int((self.configs.get(
                "ctc_beam_search_decoder_conf") or {}).get(
                "rescoring_nbest", 10))
            model = self.model
            rescore_fn = jax.jit(
                lambda v, e, el, h, hl: model.apply(
                    v, e, el, h, hl, reverse_weight,
                    method=type(model).rescore_hyps))
        else:
            eval_step = jax.jit(make_eval_step(self.model,
                                               frontend=frontend))
        errors, losses = [], []
        for batch in loader:
            if self.stop_eval:
                break
            sharded = {k: jnp.asarray(v) for k, v in batch.items()}
            if rescoring:
                loss, enc, probs, lens = eval_step(variables, sharded)
                probs, lens = np.asarray(probs), np.asarray(lens)
                results = self._rescore_batch(
                    rescore_fn, variables, enc, probs, lens, tf,
                    nbest_n, ctc_weight, reverse_weight)
            else:
                loss, probs, lens = eval_step(variables, sharded)
                probs, lens = np.asarray(probs), np.asarray(lens)
                if decoder == "ctc_beam_search":
                    results = self._eval_beam_decoder.\
                        decode_batch_beam_search_offline(
                            [probs[i][: int(lens[i])]
                             for i in range(probs.shape[0])])
                elif decoder == "ctc_beam_search_device":
                    from masr_tpu.decoders.device_beam import \
                        decode_batch_device
                    conf = self.configs.get(
                        "ctc_beam_search_decoder_conf") or {}
                    if not hasattr(self, "_device_lm_table"):
                        self._device_lm_table = None
                        lm_path = conf.get("language_model_path")
                        if lm_path and os.path.exists(lm_path):
                            from masr_tpu.decoders.device_beam import \
                                build_dense_bigram
                            from masr_tpu.decoders.scorer import \
                                is_kenlm_binary
                            if is_kenlm_binary(lm_path):
                                logger.warning(
                                    "device beam fuses ARPA LMs only; "
                                    "decoding without LM")
                            else:
                                logger.info("building dense bigram table "
                                            "for on-device LM fusion")
                                self._device_lm_table = build_dense_bigram(
                                    lm_path, vocab_list)
                    results = decode_batch_device(
                        probs, lens, vocab_list,
                        beam_size=min(int(conf.get("beam_size", 10)), 32),
                        cutoff_top_n=int(conf.get("cutoff_top_n", 40)),
                        lm_table=self._device_lm_table,
                        alpha=float(conf.get("alpha", 2.2)),
                        beta=float(conf.get("beta", 4.3)))
                else:
                    results = greedy_decoder_batch(probs, vocab_list,
                                                   lens=lens)
            losses.append(float(loss))
            for i, (score, text) in enumerate(results):
                L = batch["label_lens"][i]
                target = tf.detokenize(batch["labels"][i][:L])
                if len(target) == 0:
                    continue
                e = cer(target, text) if metric == "cer" else wer(target, text)
                errors.append(e)
                if display_result:
                    logger.info(f"ref: {target} | hyp: {text} | {metric}={e:.4f}")
        return (float(np.mean(errors)) if errors else 1.0,
                float(np.mean(losses)) if losses else 0.0)

    def evaluate(self, resume_model="models/best_model", display_result=False,
                 decoder=None):
        """decoder=None honors the YAML `decoder` key (ctc_greedy |
        ctc_beam_search | attention_rescoring); pass a name to override."""
        dataset, _, loader = self._setup_dataloader(False)
        if self.model is None:
            self._setup_model(dataset.feature_dim, dataset.vocab_size,
                              is_train=True)
        if resume_model and os.path.exists(resume_model):
            restored, _ = ckpt.load_checkpoint(resume_model,
                                               self._state_pytree())
            self.state = self.state.replace(
                params=restored["params"],
                batch_stats=restored.get("batch_stats"))
            logger.info(f"loaded model from {resume_model}")
        start = time.time()
        error, loss = self._evaluate_loader(loader, dataset, display_result,
                                            decoder=decoder)
        logger.info(f"evaluate done in {time.time() - start:.1f}s")
        return error, loss

    # ------------------------------------------------------------------ #
    # export
    # ------------------------------------------------------------------ #
    def export(self, save_model_path="models/",
               resume_model="models/best_model", half: bool = False,
               quant: str = None):
        """Checkpoint → inference bundle (trainer.py:653-697). quant:
        'bf16' (half=True alias) or 'int8' (weight-only per-channel, the
        dynamic-quantization analogue, 4× smaller artifact)."""
        from masr_tpu.infer.bundle import save_inference_bundle
        d = self.configs.dataset_conf
        featurizer = AudioFeaturizer(train=False,
                                     **self.configs.preprocess_conf)
        tf = TextFeaturizer(d.dataset_vocab)
        if self.model is None:
            self._setup_model(featurizer.feature_dim, tf.vocab_size,
                              is_train=True)
        restored, _ = ckpt.load_checkpoint(resume_model, self._state_pytree())
        variables = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            variables["batch_stats"] = restored["batch_stats"]
        norm = FeatureNormalizer(d.mean_istd_path)
        out_dir = os.path.join(
            save_model_path,
            f"{self.use_model}_{'streaming' if self.streaming else 'non-streaming'}"
            f"_{self.configs.preprocess_conf.feature_method}",
            "inference_model")
        save_inference_bundle(
            out_dir, self.use_model, self.streaming, featurizer.feature_dim,
            tf.vocab_list, norm.mean, norm.istd,
            self.configs.get("encoder_conf"), self.configs.get("decoder_conf"),
            self.configs.get("model_conf"), self.configs.preprocess_conf,
            jax.device_get(variables), half=half, quant=quant)
        logger.info(f"inference bundle exported to {out_dir}")
        return out_dir


def yaml_value(v):
    import yaml as _yaml
    return _yaml.safe_load(v)

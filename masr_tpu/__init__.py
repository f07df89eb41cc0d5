"""masr_tpu — TPU-native streaming speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of MASR
(reference: yeyupiaoling/MASR): four encoder families (DeepSpeech2,
Conformer, Squeezeformer, Efficient-Conformer) with full-context and
chunked streaming inference, a Kaldi-compatible feature frontend,
hybrid CTC + attention training with data-parallel sharding over a
`jax.sharding.Mesh`, CTC greedy/beam decoding, and a
`MASRPredictor`-compatible inference API.
"""

__version__ = "0.1.0"


def enable_compilation_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache so repeat CLI invocations
    skip the multi-minute XLA compiles (first compile on TPU is 20-240 s;
    cached reloads are sub-second)."""
    import os
    import jax
    cache_dir = cache_dir or os.environ.get(
        "MASR_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "masr_tpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass


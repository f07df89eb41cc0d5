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

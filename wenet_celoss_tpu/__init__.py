"""wenet_celoss_tpu: a TPU-native end-to-end speech recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Vindicator645/wenet-celoss reference (WeNet 2.x fork with contextual-biasing
RNN-T + auxiliary cross-entropy hotword loss):

- U2/U2++ unified streaming & non-streaming ASR (dynamic chunk masking,
  joint CTC/attention).
- Conformer / Transformer encoders, bidirectional attention decoders.
- RNN-T transducer stack (RNN / Embedding / Conv predictors, additive joint)
  with contextual biasing and hotword-gate decoding.
- Batched, jit-able decoders: CTC greedy, CTC prefix beam, attention beam,
  attention rescoring, RNN-T greedy and prefix beam.
- SPMD scale-out via jax.sharding Mesh + XLA collectives (no DDP process
  choreography).
- Pallas TPU kernels for the hot numerics (log-mel frontend, transducer
  lattice loss).

The package is organized as:
  ops/       numerics + Pallas kernels (fbank, CTC, RNN-T, specaug)
  models/    flax.linen model components and full models
  decode/    batched search algorithms
  data/      UIO-style data pipeline (raw/shard), tokenizers, batching
  parallel/  mesh construction, sharding rules, train step
  utils/     masks, schedules, checkpointing, config, scoring
  bin/       CLI entry points (train / recognize / average / export)
"""

__version__ = "0.1.0"

"""eventful_transformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Eventful Transformers: exploiting temporal redundancy in video vision
transformers (ICCV 2023, arXiv:2308.13494).

Brand-new implementation with the capabilities of
WISION-Lab/eventful-transformer, re-designed TPU-first:

  * functional state (explicit pytrees) instead of mutable module buffers;
  * ``lax.scan`` over frames instead of per-step Python dispatch;
  * fixed-capacity token selection (one XLA compilation per token budget);
  * FLOP accounting as traced scalars with reference-identical count keys;
  * data-parallel evaluation and tensor-parallel training over device meshes.
"""

__version__ = "0.1.0"

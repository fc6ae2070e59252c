"""semi_tts_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the semi-supervised
multi-speaker TTS framework from ttaoREtw/semi-tts (arXiv 2005.08024).

Design stance (see SURVEY.md §7): functional JAX stack — pure feature/model
functions over pytree params, ``lax.scan`` for every recurrence, static shapes
via length bucketing, optax-style optimization, and a device mesh
(``jax.sharding``) for multi-chip scale-out. The external contract of the
reference (YAML config schema, CLI flags, data-file formats, output artifacts,
checkpoint triple) is preserved; the internals are TPU-first.
"""

__version__ = "0.1.0"

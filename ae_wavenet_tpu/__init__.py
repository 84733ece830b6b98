"""ae_wavenet_tpu — a TPU-native (JAX/XLA/Pallas) WaveNet-autoencoder framework.

A ground-up rebuild of the capabilities of hrbigelow/ae-wavenet (the
Chorowski et al. 2019 WaveNet autoencoder for unsupervised speech
representation learning), designed TPU-first:

* static-shape, geometry-resolved convolution stacks compiled by XLA
* pure-functional models (parameter pytrees), one compiled train step
* data parallelism via ``jax.sharding`` meshes, collectives over ICI
* Pallas kernels for the hot paths (gated conv stack, fused VQ,
  O(1)-per-sample autoregressive fast-queue generation)

See SURVEY.md at the repo root for the reference blueprint this implements.
"""

__version__ = "0.1.0"

"""sin-inn-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for single-video
learning tasks, built from scratch with the capabilities of the PyTorch
reference `paramhanji/sin-inn`:

  * space-time super-resolution with invertible neural networks (INNs),
  * unsupervised optical flow / video interpolation with implicit neural
    representations (INRs) and progressive frequency encodings,
  * scene-space multi-view gather,
  * a bayer-binning dataset preparation toolchain.

Layering (see SURVEY.md for the structural analysis of the reference):

  core/        typed configs, RNG threading, checkpointing, metrics
  ops/         kernel library (pure-XLA reference impls + Pallas fast paths)
  models/      INN architectures, INR zoo, progressive controllers
  data/        host-side datasets + double-buffered host->TPU feeding
  train/       jitted train steps + functional train loops
  parallel/    mesh construction, shardings, multi-scene launcher
  scene_space/ COLMAP readers + multi-view gather
  io/          video/image IO (ffmpeg gated behind availability)
"""

__version__ = "0.1.0"

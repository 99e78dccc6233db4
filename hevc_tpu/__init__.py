"""hevc_tpu — a TPU-native HEVC/SHVC decode engine.

A ground-up reimplementation of the capabilities of openHEVC (wei1ji/HEVC)
designed for TPU hardware: the bitstream/entropy front-end runs on host
(stage A), emitting dense per-CTU symbol tensors; reconstruction (stage B:
dequant/IDCT, intra prediction, motion compensation, deblocking, SAO,
inter-layer upsampling) runs as JAX/XLA/Pallas programs, sharded over a
device mesh for tile/wavefront/frame/layer parallelism.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

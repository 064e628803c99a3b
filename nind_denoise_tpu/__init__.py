"""nind_denoise_tpu — a TPU-native (JAX/XLA/Pallas) photographic denoising framework.

Re-designed from scratch with the capabilities of the reference PyTorch project
``esq4/nind-denoise`` (see /root/repo/SURVEY.md for the full component map):

* End-to-end RAW -> developed-TIFF -> CNN-denoise -> RL-deblur -> JPEG pipeline
  (``nind_denoise_tpu.pipeline``), orchestrating host-side external binaries
  (darktable-cli) around an on-device tiled inference engine.
* Tiled overlap/feather inference engine for arbitrarily large images with
  fixed-shape XLA compilation (``nind_denoise_tpu.engine``).
* Model zoo (UtNet / UNet generators, Hul discriminators) in functional JAX,
  NHWC layout, MXU-friendly formulations (``nind_denoise_tpu.models``), with a
  PyTorch-checkpoint importer for the published NIND weights.
* SSIM / MS-SSIM losses and an on-device Richardson-Lucy deblur kernel
  (``nind_denoise_tpu.ops``) — the gmic subprocess of the reference moves
  on-device here.
* Training stack with MS-SSIM loss, optional cGAN discriminators,
  validation / checkpoint-retention / JSON metric store
  (``nind_denoise_tpu.train``).
* Multi-chip scale-out over ``jax.sharding.Mesh`` (``nind_denoise_tpu.parallel``):
  tile-batch data parallelism for inference and batch data parallelism for
  training, with compiler-inserted ICI collectives.
"""

__version__ = "0.1.0"

"""cistar_tpu — a TPU-native radar↔lidar image style-transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DJNing/Can-Image-Style-Transfer-Save-Automotive-Radar: Gatys optimization
style transfer, CycleGAN, and pix2pixHD (with its radar2lidar / transfer /
WGAN / UDA extensions), as compiled SPMD programs over a device mesh.

Quick tour:
  * ``cistar_tpu.engines.ist.GatysEngine``      — jitted L-BFGS style transfer
  * ``cistar_tpu.engines.cyclegan.CycleGAN``    — single-jit GAN train step
  * ``cistar_tpu.engines.p2phd.Pix2PixHD``      — pix2pixHD trainer
  * ``cistar_tpu.engines.factory.create_model`` — options-driven dispatch
  * ``cistar_tpu.apps.*``                       — CLI entry points
  * ``cistar_tpu.core.convert_models``          — torch checkpoint importers
  * ``cistar_tpu.runtime.aot``                  — AOT serialize/run/profile
  * ``cistar_tpu.parallel``                     — mesh, DP sharding, spatial
                                                  (halo-exchange) sharding
"""

__version__ = "0.1.0"

"""c2m_tpu — a TPU-native JAX/Flax/Pallas rebuild of Click-to-Move (ICCV 2021).

Controllable video generation for driving scenes: given one conditioning frame,
its semantic/instance segmentation and a set of user "clicks" (target object
displacements), generate the next T frames.

The package is a from-scratch TPU-first design with the capabilities of the
PyTorch reference (PierfrancescoArdino/C2M):

- ``c2m_tpu.ops``      — core tensor ops (flow warping, affine rasterization,
  forward-splat occlusion, torch-parity resizes), pure-jnp reference impls and
  Pallas TPU kernels behind one API.
- ``c2m_tpu.nn``       — layer library (conv blocks, SPADE, spectral norm, VGG19).
- ``c2m_tpu.models``   — appearance encoder, sparse-motion GNN (dense masked
  attention over padded object nodes), conditional-VAE dense-motion network,
  occlusion-aware generator, PatchGAN discriminators.
- ``c2m_tpu.losses``   — reconstruction/warp/KL/SSIM/perceptual/GAN losses.
- ``c2m_tpu.data``     — Cityscapes/KITTI clip pipeline producing padded dense
  batches (no ragged graph structures), plus synthetic fixtures.
- ``c2m_tpu.train``    — jitted train step (one combined loss, 4 optimizer
  groups via optax.multi_transform), Orbax checkpointing, trainer loop.
- ``c2m_tpu.parallel`` — device mesh + sharding rules (data parallel over ICI).
- ``c2m_tpu.eval``     — inference path, FID/FVD/detection metrics.
"""

__version__ = "0.1.0"

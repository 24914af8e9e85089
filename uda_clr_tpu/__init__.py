"""uda_clr_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for unsupervised
domain-adaptive fundus segmentation with category-level regularization.

A ground-up TPU-first rebuild of the capabilities of fengweie/UDA_CLR
(MICCAI 2022, "Unsupervised Domain Adaptive Fundus Image Segmentation with
Category-Level Regularization"): dual-head DeepLabv3+ (MobileNetV2 backbone),
output-space adversarial UDA with PatchGAN discriminators, adaptive
inter-domain prototype alignment with EMA class centroids, MC-dropout pseudo
label rectification, intra-domain category regularization (prototype-guided
discriminative loss + augmented-consistency loss), TransNorm domain-conditional
normalization, and cross-replica batch norm over a `jax.sharding.Mesh`.

Design stance (not a port):
  * one pytree TrainState (generator + 2 discriminators + opt states + norm
    stats + prototype bank + PRNG) stepped by a single jitted function;
  * NHWC layout, bf16-friendly compute, MXU-shaped matmul resizes;
  * the reference's freeze/unfreeze + .detach() GAN choreography becomes
    per-parameter-group gradients with `stop_gradient`;
  * data parallelism and cross-replica BN fall out of GSPMD batch sharding
    over a device mesh (collectives ride ICI, emitted by XLA);
  * host-side pipeline only for PIL/scipy-bound augmentation (elastic
    deformation); color/strong augs run on device in the jitted step.
"""

__version__ = "0.1.0"

"""camc2v_tpu — TPU-native (JAX/XLA/Pallas) camera-controllable, context-aware
image-to-video latent diffusion framework.

A from-scratch rebuild of the capabilities of LDenninger/CamC2V (CamContextI2V):
the DynamiCrafter 3D-UNet LVDM backbone, camera-pose conditioning (Plücker rays +
epipolar-masked attention), multi-frame context conditioning, the RealEstate10K data
pipeline, a jit-compiled DDIM CFG sampler, and a data-parallel pjit trainer.

Layout conventions (TPU-first, differs from the reference's torch NCHW):
  * videos:   (B, T, H, W, C)   channels-last — native layout for XLA TPU convs
  * latents:  (B, T, h, w, C)
  * tokens:   (B, L, D)
  * params:   float32; compute: bfloat16 via per-module `dtype` policy
"""

__version__ = "0.1.0"

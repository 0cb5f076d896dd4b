"""splice_tpu — TPU-native semantic appearance transfer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of omerbt/Splice
(CVPR 2022 "Splicing ViT Features for Semantic Appearance Transfer"):
test-time optimization of a skip U-Net generator against frozen DINO-ViT
structure/appearance losses — one fused jitted step, on-device
preprocessing, Pallas fused attention, and jax.sharding scale-out.
"""
from splice_tpu.config import Config, load_config

__version__ = "0.1.0"

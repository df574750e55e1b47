"""ViTPose-TPU: a TPU-native (JAX/XLA/Pallas) pose-estimation framework.

A ground-up re-design of the capabilities of ViTPose / mmpose-0.x
(reference: MiraPurkrabek/ViTPose) for TPU hardware:

- ``ops``      pure-jnp geometry, heatmap codecs, decode, NMS, Pallas kernels
- ``models``   flax ViT / ViTMoE backbones, heatmap heads, top-down estimators
- ``data``     COCO-style datasets, on-device batched preprocessing
- ``train``    optax optimizers (layer-decay AdamW), train step, loops
- ``parallel`` device mesh + sharding rules (dp / expert axes)
- ``eval``     COCO keypoint evaluation (pure numpy, no pycocotools needed)
- ``api``      user-facing inference API mirroring mmpose's call signatures
"""

__version__ = "0.1.0"

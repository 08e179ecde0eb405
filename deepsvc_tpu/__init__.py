"""deepsvc_tpu — a TPU-native scalable neural video codec framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of DeepSVC
(LHB116/DeepSVC, ACM MM 2023): a three-layer scalable video codec
(semantic feature layer, structure/pixel layer, texture enhancement layer)
for both machine and human vision, plus training, RD evaluation and
video-object-detection integration.

Layout
------
- ``core``      dtype policy, config system, image padding/metrics
- ``ops``       TPU compute ops: bilinear warp (Pallas + XLA), resize,
                pooling, pixel shuffle, MS-SSIM
- ``entropy``   factorized + conditional-Gaussian entropy models and the
                integer quantized-CDF builder (all jittable; f32 entropy math)
- ``coder``     host-side C++ streaming rANS range coder (ctypes bindings)
- ``models``    image codec, SPyNet flow, P-frame codec, semantic layer
- ``parallel``  mesh construction, sharding rules, halo-exchange conv
- ``train``     staged trainer, dual optimizer, checkpointing
- ``eval``      RD evaluation harness (test_video.py equivalent)
- ``data``      input pipelines (Vimeo-90k / VID / eval sets)
- ``detect``    video object detection consuming the semantic bitstream
"""

__version__ = "0.1.0"

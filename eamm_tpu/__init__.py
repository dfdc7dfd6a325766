"""eamm_tpu — a TPU-native JAX framework for one-shot emotional talking-face
synthesis, built from scratch with the capabilities of EAMM (SIGGRAPH 2022).

Layers
------
- ``eamm_tpu.ops``       jittable numerical primitives (warping, heatmaps, MFCC, filters)
- ``eamm_tpu.models``    flax modules (keypoint detectors, dense motion, generator,
                         audio-to-facial-dynamics, emotion displacement, discriminator)
- ``eamm_tpu.parallel``  device-mesh / sharding helpers
- ``eamm_tpu.data``      datasets, augmentation, host-side preprocessing
- ``eamm_tpu.train``     loss composition, pjit train steps, checkpointing, logging
- ``eamm_tpu.infer``     batched clip renderer + demo pipeline
- ``eamm_tpu.serve``     dynamic-batching render server for production serving
- ``eamm_tpu.compat``    torch checkpoint -> jax parameter conversion
- ``eamm_tpu.cli``       demo.py / run.py compatible command-line entry points

The reference implementation being re-designed (not ported) lives at
/root/reference (jixinya/EAMM); docstrings cite it as ``ref:<file>:<lines>``.
"""

__version__ = "0.2.0"

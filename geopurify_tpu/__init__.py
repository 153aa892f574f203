"""geopurify_tpu — a TPU-native open-vocabulary 3D semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GeoPurify
(tj12323/GeoPurify, ICLR 2026): Stage-1 geometric distillation of a sparse-3D-conv
student affinity network against a frozen Sonata-style 3D SSL teacher, and Stage-2
geometry-guided pooling of multi-view X-Decoder 2D VLM features lifted into 3D,
classified open-vocabulary against CLIP-style text embeddings.

Package layout:
  ops/       irregular compute primitives (voxelize, kNN, sparse conv, pooling)
  models/    flax modules (student, FocalNet, pixel decoder, XDecoder, Sonata, text)
  data/      host-side scene/camera/point-cloud pipeline
  parallel/  device meshes, shardings, collectives
  utils/     metrics, checkpointing, logging, profiling
  run/       train / validate entry points
"""

__version__ = "0.1.0"

from geopurify_tpu.config import GeoPurifyConfig, load_config  # noqa: F401

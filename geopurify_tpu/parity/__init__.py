"""Torch-oracle parity harness.

The released checkpoints cannot be fetched in this environment (ROADMAP.md),
but the reference torch CODE is mounted read-only and torch-cpu is installed —
so every numerical-parity question (bicubic antialias semantics, /32 padding,
attention-mask thresholds, prompt averaging, converter layout) can be settled
by instantiating the reference modules with seeded random weights, converting
the state dict through utils/convert_xdecoder.py, and diffing activations
stage-by-stage against the flax rebuild.

- shims:  minimal stand-ins for the reference's absent heavy deps
          (detectron2 / timm / fvcore / kornia / mpi4py) — just enough,
          behavior-faithful where it matters (Conv2d norm/activation order,
          ImageList /32 padding).
- oracle: builders that import the mounted reference modules and produce
          (torch module, activations, state_dict) for each pipeline stage.

Run: python -m geopurify_tpu.run.parity --torch-oracle small
"""

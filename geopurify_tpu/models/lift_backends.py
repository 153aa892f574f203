"""Registry for alternative 2D-lift backends (LSeg / APE).

The reference dispatches on ``feature_2d_extractor`` and imports external
LSeg/APE checkouts at that point (reference models/affinity_module.py:348-453,
:736-993 — neither model is vendored there). Here the dispatch surface is the
same: ``--lift-backend {xdecoder,lseg,ape}`` selects the backend, and lseg/ape
resolve through this registry. A JAX port of either model registers itself
with :func:`register_backend`; until one is registered, selecting it raises
the same actionable error the reference's missing checkout would.

Backend callables follow models/lift_variants.py's protocols:
- lseg-style (dense):    image [H, W, 3] -> pixel feats [H', W', C]
- ape-style (instance):  image [H, W, 3] -> (masks [Q, H', W'] logits,
                         embeds [Q, C], scores [Q])
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_backend(name: str, fn: Callable) -> None:
    """Register a lift backend callable under ``name`` (e.g. 'lseg', 'ape')."""
    _REGISTRY[name.lower()] = fn


def get_backend(name: str) -> Callable:
    key = name.lower()
    if key in _REGISTRY:
        return _REGISTRY[key]
    raise KeyError(
        f"No {name!r} lift backend registered. The reference's LSeg/APE "
        "models are external checkouts (not vendored; affinity_module.py:"
        "348,736) — port one to JAX and call "
        "geopurify_tpu.models.lift_backends.register_backend("
        f"{name!r}, fn) before building the pipeline."
    )


def available() -> Dict[str, Callable]:
    return dict(_REGISTRY)

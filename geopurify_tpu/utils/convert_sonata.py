"""Torch (Pointcept PTv3 / facebook-sonata) checkpoint -> SonataTeacher params.

The reference consumes the released frozen Sonata teacher via
``sonata.load("sonata", repo_id="facebook/sonata")`` (reference
models/affinity_module.py:251-264). The sonata package is an EMPTY submodule
in the reference snapshot (.gitmodules:1-6) and the weights are not fetchable
from this zero-egress environment, so this converter targets the PUBLIC
Pointcept PointTransformerV3 state-dict layout that the sonata release uses:

  embedding.stem.conv.weight                  SubMConv3d(in, C0, k=5, no bias)
  embedding.stem.norm.{weight,bias[,running_mean,running_var]}
  enc.enc{s}.down.proj.{weight,bias}          SerializedPooling Linear
  enc.enc{s}.down.norm.0.{weight,bias[,running_*]}
  enc.enc{s}.block{b}.cpe.0.{weight,bias}     SubMConv3d(C, C, k=3, bias)
  enc.enc{s}.block{b}.cpe.1.{weight,bias}     Linear
  enc.enc{s}.block{b}.cpe.2.{weight,bias}     norm (LN in PTv3 blocks)
  enc.enc{s}.block{b}.norm{1,2}.0.{weight,bias}
  enc.enc{s}.block{b}.attn.qkv.{weight,bias}
  enc.enc{s}.block{b}.attn.proj.{weight,bias}
  enc.enc{s}.block{b}.mlp.0.fc{1,2}.{weight,bias}

Layout assumptions that a real-checkpoint parity run must confirm (they are
documented rather than guessed silently; run/parity.py-style stagewise diffing
is the tool once weights exist):
- spconv kernel layouts: spconv>=2.x native ``(out, kx, ky, kz, in)`` and
  spconv 1.x ``(kx, ky, kz, in, out)`` are both accepted (sniffed by shape)
  and flattened C-order over (kx, ky, kz) — matching our x-major tap
  enumeration (ops/sparse_conv.kernel_offsets_3d) under the Pointcept
  convention that grid_coord columns are (x, y, z);
- inference-frozen BatchNorm sites (embedding/pooling in PTv3) are FOLDED
  into per-channel affine (scale', bias') = (w/sqrt(rv+eps), b - rm*scale');
  the model must then run with ``sonata.norm = "bn_folded"``
  (models/sonata.NormOrAffine).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

SD = Dict[str, np.ndarray]


class SonataConversionError(KeyError):
    pass


def _find(sd: SD, *candidates: str) -> Optional[str]:
    for c in candidates:
        if c in sd:
            return c
    return None


def _get(sd: SD, *candidates: str) -> np.ndarray:
    key = _find(sd, *candidates)
    if key is None:
        raise SonataConversionError(
            f"none of {candidates} in checkpoint (have e.g. "
            f"{sorted(sd)[:8]}...)"
        )
    return np.asarray(sd[key])


def _spconv_kernel(w: np.ndarray, k: int) -> np.ndarray:
    """Reorder a spconv SubMConv3d weight to our [k^3, Cin, Cout] tap layout."""
    if w.ndim == 2:                       # 1x1x1 stored dense
        return w[None]
    if w.ndim == 4 and w.shape[0] == k ** 3:
        raise SonataConversionError(f"unexpected 4-d spconv weight {w.shape}")
    if w.ndim == 3 and w.shape[0] == k ** 3:
        return w                          # already [K, in, out]
    if w.ndim != 5:
        raise SonataConversionError(f"unrecognized spconv weight shape {w.shape}")
    if w.shape[1] == w.shape[2] == w.shape[3] == k:
        # (out, kx, ky, kz, in) — spconv >= 2.x native
        w = np.transpose(w, (1, 2, 3, 4, 0))
    elif w.shape[0] == w.shape[1] == w.shape[2] == k:
        # (kx, ky, kz, in, out) — spconv 1.x
        pass
    else:
        raise SonataConversionError(
            f"cannot locate kernel dims (k={k}) in spconv weight {w.shape}"
        )
    K = k ** 3
    return w.reshape(K, w.shape[3], w.shape[4])


def _lin(sd: SD, *prefixes: str) -> Dict[str, Any]:
    prefix = next((p for p in prefixes if f"{p}.weight" in sd), None)
    if prefix is None:
        raise SonataConversionError(f"no linear at any of {prefixes}")
    w = _get(sd, f"{prefix}.weight").T    # torch [out,in] -> flax [in,out]
    out = {"kernel": jnp.asarray(w)}
    b = _find(sd, f"{prefix}.bias")
    out["bias"] = jnp.asarray(sd[b]) if b else jnp.zeros((w.shape[1],), jnp.float32)
    return out


def _norm(sd: SD, *prefixes: str) -> Tuple[Dict[str, Any], bool]:
    """Returns ({scale, bias}, was_batchnorm). BN running stats are folded."""
    prefix = None
    for p in prefixes:
        if f"{p}.weight" in sd:
            prefix = p
            break
    if prefix is None:
        raise SonataConversionError(f"no norm at any of {prefixes}")
    w = np.asarray(sd[f"{prefix}.weight"]).astype(np.float64)
    b = np.asarray(sd[f"{prefix}.bias"]).astype(np.float64)
    rm_key = _find(sd, f"{prefix}.running_mean")
    if rm_key is None:
        return {"scale": jnp.asarray(w, jnp.float32),
                "bias": jnp.asarray(b, jnp.float32)}, False
    rm = np.asarray(sd[rm_key]).astype(np.float64)
    rv = np.asarray(sd[f"{prefix}.running_var"]).astype(np.float64)
    eps = 1e-5
    scale = w / np.sqrt(rv + eps)
    bias = b - rm * scale
    return {"scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32)}, True


def convert_sonata_checkpoint(sd: SD, cfg=None) -> Dict[str, Any]:
    """Map a Pointcept-PTv3-layout state dict into SonataTeacher variables.

    ``cfg`` (SonataConfig) supplies depths/kernel sizes and is validated
    against the checkpoint; pass None to infer depths from the keys.
    Returns {'params': {'encoder': {...}}} ready for SonataTeacher.apply.
    Raises SonataConversionError with an actionable message when the layout
    disagrees (e.g. BN detected but cfg.norm != 'bn_folded').
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}
    # sonata releases may nest under 'backbone.' / 'student.backbone.'
    for candidate in ("backbone.", "student.backbone.", "model."):
        if any(k.startswith(candidate + "embedding.") for k in sd):
            sd = {k.removeprefix(candidate): v for k, v in sd.items()
                  if k.startswith(candidate)}
            break

    stem_kernel = cfg.stem_kernel if cfg is not None else 5
    enc: Dict[str, Any] = {}
    saw_bn = False

    # --- embedding stem
    w = _get(sd, "embedding.stem.conv.weight", "embedding.stem.0.weight")
    enc["stem_kernel_w"] = jnp.asarray(_spconv_kernel(w, stem_kernel))
    enc["embed_norm"], bn = _norm(sd, "embedding.stem.norm", "embedding.stem.1")
    saw_bn |= bn

    # --- stages (blocks stack under stage{s}_blocks/block — the scanned
    # layout of models/sonata.SonataEncoder, leading axis = depth)
    import jax

    depths = []
    s = 0
    while _find(sd, f"enc.enc{s}.block0.attn.qkv.weight") is not None:
        blocks = []
        b = 0
        while _find(sd, f"enc.enc{s}.block{b}.attn.qkv.weight") is not None:
            p = f"enc.enc{s}.block{b}"
            blk: Dict[str, Any] = {}
            cpe_w = _get(sd, f"{p}.cpe.0.weight")
            blk["cpe_kernel"] = jnp.asarray(_spconv_kernel(cpe_w, 3))
            cpe_b = _find(sd, f"{p}.cpe.0.bias")
            blk["cpe_bias"] = (
                jnp.asarray(sd[cpe_b]) if cpe_b
                else jnp.zeros((blk["cpe_kernel"].shape[-1],), jnp.float32)
            )
            blk["cpe_fc"] = _lin(sd, f"{p}.cpe.1")
            blk["cpe_norm"], bn_c = _norm(sd, f"{p}.cpe.2")
            if bn_c:
                raise SonataConversionError(
                    f"{p}.cpe.2 carries BatchNorm running stats — PTv3 blocks "
                    "are LayerNorm; refusing a layout this converter cannot "
                    "represent (cpe_norm is unconditionally LN)."
                )
            blk["norm1"], _ = _norm(sd, f"{p}.norm1.0", f"{p}.norm1")
            blk["norm2"], _ = _norm(sd, f"{p}.norm2.0", f"{p}.norm2")
            blk["attn"] = {
                "qkv": _lin(sd, f"{p}.attn.qkv"),
                "proj": _lin(sd, f"{p}.attn.proj"),
            }
            blk["mlp_fc1"] = _lin(sd, f"{p}.mlp.0.fc1", f"{p}.mlp.fc1")
            blk["mlp_fc2"] = _lin(sd, f"{p}.mlp.0.fc2", f"{p}.mlp.fc2")
            blocks.append(blk)
            b += 1
        enc[f"stage{s}_blocks"] = {
            "block": jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks
            )
        }
        depths.append(b)
        if _find(sd, f"enc.enc{s + 1}.down.proj.weight") is not None:
            enc[f"pool_proj{s}"] = _lin(sd, f"enc.enc{s + 1}.down.proj")
            enc[f"pool_norm{s}"], bn_p = _norm(
                sd, f"enc.enc{s + 1}.down.norm.0", f"enc.enc{s + 1}.down.norm"
            )
            saw_bn |= bn_p
        s += 1

    if cfg is not None:
        want = tuple(cfg.enc_depths)
        if tuple(depths) != want:
            raise SonataConversionError(
                f"checkpoint stage depths {tuple(depths)} != config {want}"
            )
        if saw_bn and cfg.norm != "bn_folded":
            raise SonataConversionError(
                "checkpoint uses BatchNorm at embedding/pooling sites; set "
                "sonata.norm=bn_folded so NormOrAffine applies the folded "
                "running stats as a per-channel affine."
            )
        if not saw_bn and cfg.norm == "bn_folded":
            raise SonataConversionError(
                "sonata.norm=bn_folded but the checkpoint has no BN running "
                "stats; use sonata.norm=ln."
            )
    return {"params": {"encoder": enc}}


def fake_sonata_state_dict(
    enc_depths=(1, 1),
    enc_channels=(8, 16),
    in_channels: int = 6,
    stem_kernel: int = 3,
    mlp_ratio: float = 4.0,
    batchnorm_aux: bool = False,
    seed: int = 0,
) -> SD:
    """A synthetic torch-layout state dict for converter round-trip tests
    (the real weights are not obtainable here; see module docstring)."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return rng.normal(size=shape).astype(np.float32)

    sd: SD = {}

    def norm(prefix: str, c: int, bn: bool):
        sd[f"{prefix}.weight"] = r(c)
        sd[f"{prefix}.bias"] = r(c)
        if bn:
            sd[f"{prefix}.running_mean"] = r(c)
            sd[f"{prefix}.running_var"] = np.abs(r(c)) + 0.5

    sd["embedding.stem.conv.weight"] = r(
        enc_channels[0], stem_kernel, stem_kernel, stem_kernel, in_channels
    )  # spconv >= 2.x native (out, kx, ky, kz, in)
    norm("embedding.stem.norm", enc_channels[0], batchnorm_aux)
    for s, depth in enumerate(enc_depths):
        c = enc_channels[s]
        if s > 0:
            sd[f"enc.enc{s}.down.proj.weight"] = r(c, enc_channels[s - 1])
            sd[f"enc.enc{s}.down.proj.bias"] = r(c)
            norm(f"enc.enc{s}.down.norm.0", c, batchnorm_aux)
        for b in range(depth):
            p = f"enc.enc{s}.block{b}"
            sd[f"{p}.cpe.0.weight"] = r(3, 3, 3, c, c)  # spconv 1.x layout
            sd[f"{p}.cpe.0.bias"] = r(c)
            sd[f"{p}.cpe.1.weight"] = r(c, c)
            sd[f"{p}.cpe.1.bias"] = r(c)
            norm(f"{p}.cpe.2", c, False)
            norm(f"{p}.norm1.0", c, False)
            norm(f"{p}.norm2.0", c, False)
            sd[f"{p}.attn.qkv.weight"] = r(3 * c, c)
            sd[f"{p}.attn.qkv.bias"] = r(3 * c)
            sd[f"{p}.attn.proj.weight"] = r(c, c)
            sd[f"{p}.attn.proj.bias"] = r(c)
            h = int(c * mlp_ratio)
            sd[f"{p}.mlp.0.fc1.weight"] = r(h, c)
            sd[f"{p}.mlp.0.fc1.bias"] = r(h)
            sd[f"{p}.mlp.0.fc2.weight"] = r(c, h)
            sd[f"{p}.mlp.0.fc2.bias"] = r(c)
    return sd

"""Precomputed fused-feature loader (OpenScene-style, legacy path).

Rebuild of the reference's FusedFeatureLoader (reference
dataset/feature_loader.py:11-256): loads per-scene 2D-fused feature files
(torch ``.pt`` with {'feat': [Nv, C], 'mask_full' or 'mask': [N] bool}) that
were precomputed offline, aligns them with the voxelized scene, and yields
(voxel features, visibility mask). Lets Stage-1 train from cached lift
outputs instead of running the 2D teacher in the loop — the cheapest way to
iterate on the student.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from geopurify_tpu.config import GeoPurifyConfig
from geopurify_tpu.data.loaders import SceneDataset, load_scene_any
from geopurify_tpu.ops.voxelize import Voxelizer


@dataclass
class FusedScene:
    point_feats: np.ndarray     # [N, C] f32 fused 2D features (0 where unseen)
    point_mask: np.ndarray      # [N] bool — points with a real fused feature
    xyz: np.ndarray             # [N, 3]
    labels: np.ndarray          # [N]


def load_fused_features(path: str, num_points: int) -> Tuple[np.ndarray, np.ndarray]:
    """Read one precomputed feature file -> ([N, C] feats, [N] mask)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    feat = np.asarray(obj["feat"], np.float32)
    mask = obj.get("mask_full", obj.get("mask"))
    if mask is None:
        if len(feat) != num_points:
            raise ValueError(
                f"{path}: {len(feat)} feats for {num_points} points and no mask"
            )
        mask = np.ones(num_points, bool)
        full = feat
    else:
        mask = np.asarray(mask).astype(bool).reshape(-1)
        full = np.zeros((num_points, feat.shape[1]), np.float32)
        full[mask] = feat[: int(mask.sum())]
    return full, mask


class FusedFeatureDataset:
    """Pairs scene point clouds with precomputed fused features.

    feature_root holds ``<scene_id>*.pt`` files (reference layout:
    one file per scene, optionally per-shard suffixes — first match wins).
    """

    def __init__(self, cfg: GeoPurifyConfig, feature_root: str, split: str = "train"):
        self.cfg = cfg
        self.feature_root = feature_root
        self.base = SceneDataset(cfg, split=split, augment=False)

    def __len__(self) -> int:
        return len(self.base)

    def feature_path(self, sid: str) -> Optional[str]:
        hits = sorted(glob.glob(os.path.join(self.feature_root, f"{sid}*.pt")))
        return hits[0] if hits else None

    def load(self, sid: str) -> Optional[FusedScene]:
        fp = self.feature_path(sid)
        if fp is None:
            return None
        sp = load_scene_any(self.base.scene_3d_path(sid))
        feats, mask = load_fused_features(fp, len(sp.xyz))
        return FusedScene(feats, mask, sp.xyz, sp.label)

    def make_scene_batch_with_features(self, sid: str):
        """(SceneBatch, f2d [max_points, C]) — fused features row-aligned to
        the batch's deterministic point subsample + padding, ready to feed
        stage1_loss as the frozen 2D-teacher input (the `--fused-features`
        training mode; ≙ the reference's FusedFeatureLoader consumption,
        dataset/feature_loader.py:169-236)."""
        from geopurify_tpu.data.loaders import deterministic_keep

        fused = self.load(sid)
        if fused is None:
            return None
        # fused features replace the lift, so scenes without 2D views are fine
        batch = self.base.make_scene_batch(sid, require_views=False)
        if batch is None:
            return None
        P = self.cfg.data.max_points
        keep = deterministic_keep(sid, len(fused.xyz), P)
        feats = fused.point_feats[keep]
        padded = np.zeros((P, feats.shape[1]), np.float32)
        padded[: len(feats)] = feats
        return batch, padded

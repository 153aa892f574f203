"""Detectron2-style 2D prediction drawing, dependency-light (numpy + PIL).

Rebuild of the overlay/label-text subset of the reference's Visualizer
(reference third_party/X-Decoder/xdecoder/utils/visualizer.py:331-1231):
semantic-segmentation region fills with boundary contours and class text at
the region's center of mass (draw_sem_seg, :447-482), per-instance colored
masks with score text and boxes (draw_instance_predictions/overlay_instances,
:384-860), and the text/box/mask primitives they compose (draw_text :861,
draw_box :908, draw_binary_mask :1046). matplotlib and detectron2 structures
are replaced by direct pixel compositing + PIL text so the module runs in the
zero-dependency eval image.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from geopurify_tpu.utils.visualization import class_palette


def _mask_boundary(mask: np.ndarray) -> np.ndarray:
    """Boundary pixels of a bool mask (4-neighborhood erosion difference)."""
    m = mask.astype(bool)
    er = m.copy()
    er[1:] &= m[:-1]
    er[:-1] &= m[1:]
    er[:, 1:] &= m[:, :-1]
    er[:, :-1] &= m[:, 1:]
    return m & ~er


def _text_anchor(mask: np.ndarray) -> Tuple[int, int]:
    """Center of mass of the mask's largest occupied row band — cheap stand-in
    for the reference's largest-connected-component median (:1068-1088)."""
    ys, xs = np.nonzero(mask)
    return int(np.median(xs)), int(np.median(ys))


def _brightness(color: np.ndarray, factor: float) -> np.ndarray:
    """± lightness shift, ≙ _change_color_brightness (:1192-1215)."""
    c = color.astype(np.float32)
    if factor >= 0:
        return c + (255.0 - c) * factor
    return c * (1.0 + factor)


class Visualizer2D:
    """Draw predictions onto one RGB image (values 0..255, HWC uint8)."""

    def __init__(
        self,
        image: np.ndarray,
        class_names: Optional[Sequence[str]] = None,
        palette: Optional[np.ndarray] = None,
        font_size: Optional[int] = None,
    ):
        self.img = np.ascontiguousarray(image).astype(np.float32)
        self.H, self.W = self.img.shape[:2]
        self.class_names = list(class_names) if class_names else None
        n = max(len(self.class_names) if self.class_names else 0, 64)
        self.palette = palette if palette is not None else class_palette(n)
        self.font_size = font_size or max(
            int(np.sqrt(self.H * self.W) // 40), 10
        )
        self._texts: List[Tuple[str, int, int, Tuple[int, int, int]]] = []

    # ------------------------------------------------------------------
    # primitives
    # ------------------------------------------------------------------

    def draw_binary_mask(
        self,
        mask: np.ndarray,
        color: np.ndarray,
        alpha: float = 0.65,
        text: Optional[str] = None,
        draw_boundary: bool = True,
    ) -> "Visualizer2D":
        m = mask.astype(bool)
        if not m.any():
            return self
        c = np.asarray(color, np.float32)
        self.img[m] = (1 - alpha) * self.img[m] + alpha * c
        if draw_boundary:
            b = _mask_boundary(m)
            self.img[b] = _brightness(c, -0.7)
        if text:
            x, y = _text_anchor(m)
            self._texts.append((text, x, y, tuple(
                int(v) for v in _brightness(c, 0.7)
            )))
        return self

    def draw_box(
        self, box_xyxy: Sequence[float], color: np.ndarray, width: int = 2
    ) -> "Visualizer2D":
        x0, y0, x1, y1 = [int(round(v)) for v in box_xyxy]
        x0, x1 = np.clip([x0, x1], 0, self.W - 1)
        y0, y1 = np.clip([y0, y1], 0, self.H - 1)
        c = np.asarray(color, np.float32)
        for w in range(width):
            self.img[np.clip(y0 + w, 0, self.H - 1), x0:x1 + 1] = c
            self.img[np.clip(y1 - w, 0, self.H - 1), x0:x1 + 1] = c
            self.img[y0:y1 + 1, np.clip(x0 + w, 0, self.W - 1)] = c
            self.img[y0:y1 + 1, np.clip(x1 - w, 0, self.W - 1)] = c
        return self

    def draw_text(
        self, text: str, x: int, y: int,
        color: Tuple[int, int, int] = (255, 255, 255),
    ) -> "Visualizer2D":
        self._texts.append((text, int(x), int(y), color))
        return self

    # ------------------------------------------------------------------
    # prediction-level API (≙ draw_sem_seg / draw_instance_predictions)
    # ------------------------------------------------------------------

    def draw_sem_seg(
        self,
        sem_seg: np.ndarray,               # [H, W] int class ids
        area_threshold: int = 0,
        alpha: float = 0.65,
        ignore_label: int = 255,
    ) -> "Visualizer2D":
        ids, areas = np.unique(sem_seg, return_counts=True)
        order = np.argsort(-areas)          # large regions first (:458)
        for k in order:
            cid = int(ids[k])
            if cid == ignore_label or areas[k] <= area_threshold:
                continue
            name = (
                self.class_names[cid]
                if self.class_names and cid < len(self.class_names)
                else str(cid)
            )
            self.draw_binary_mask(
                sem_seg == cid, self.palette[cid % len(self.palette)],
                alpha=alpha, text=name,
            )
        return self

    def draw_instance_predictions(
        self,
        masks: np.ndarray,                 # [N, H, W] bool
        classes: Sequence[int],
        scores: Optional[Sequence[float]] = None,
        boxes: Optional[np.ndarray] = None,  # [N, 4] xyxy
        alpha: float = 0.55,
    ) -> "Visualizer2D":
        order = np.argsort([-m.sum() for m in masks])  # big first (:700-704)
        for i in order:
            cid = int(classes[i])
            color = self.palette[(cid * 7 + i) % len(self.palette)]
            name = (
                self.class_names[cid]
                if self.class_names and cid < len(self.class_names)
                else str(cid)
            )
            label = name if scores is None else f"{name} {scores[i]:.0%}"
            self.draw_binary_mask(masks[i], color, alpha=alpha, text=label)
            if boxes is not None:
                self.draw_box(boxes[i], _brightness(color, -0.3))
        return self

    def draw_panoptic_seg(
        self,
        panoptic_seg: np.ndarray,          # [H, W] int segment ids, 0 = void
        category_ids: Sequence[int],       # per segment id (1-based indexing)
        isthing: Sequence[bool],
        alpha: float = 0.6,
    ) -> "Visualizer2D":
        """≙ Visualizer.draw_panoptic_seg (reference utils/visualizer.py:
        draw_panoptic_seg_predictions): stuff segments use the class palette
        color, thing instances get distinct jittered colors; every segment is
        labeled at its mass center. ``category_ids[s-1]`` / ``isthing[s-1]``
        describe segment id ``s``."""
        ids, areas = np.unique(panoptic_seg, return_counts=True)
        order = np.argsort(-areas)
        for k in order:
            sid = int(ids[k])
            if sid == 0 or sid - 1 >= len(category_ids):
                continue
            cid = int(category_ids[sid - 1])
            base = self.palette[cid % len(self.palette)]
            color = (
                _brightness(base, 0.25 * (sid % 3 - 1))
                if isthing[sid - 1]
                else base
            )
            name = (
                self.class_names[cid]
                if self.class_names and cid < len(self.class_names)
                else str(cid)
            )
            self.draw_binary_mask(panoptic_seg == sid, color, alpha=alpha,
                                  text=name)
        return self

    # ------------------------------------------------------------------

    def get_image(self) -> np.ndarray:
        """Composite + rasterize queued text; returns HWC uint8."""
        out = np.clip(self.img, 0, 255).astype(np.uint8)
        if not self._texts:
            return out
        from PIL import Image, ImageDraw, ImageFont

        pil = Image.fromarray(out)
        draw = ImageDraw.Draw(pil)
        try:
            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
                self.font_size,
            )
        except OSError:
            font = ImageFont.load_default()
        for text, x, y, color in self._texts:
            # dark halo for contrast (≙ the reference's text path effects)
            for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                draw.text((x + dx, y + dy), text, fill=(0, 0, 0), font=font,
                          anchor="mm")
            draw.text((x, y), text, fill=color, font=font, anchor="mm")
        return np.asarray(pil)

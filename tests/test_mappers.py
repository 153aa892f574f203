"""Dataset-mapper transform bodies (VERDICT r4 next #5): semantics tests
for every mapper kind in data/registry_catalog.py — the registry's mapper
kinds stop being labels. ≙ xdecoder/datasets/dataset_mappers/*."""

import numpy as np
import pytest

from geopurify_tpu.data import mappers as M
from geopurify_tpu.models.lang import HashTokenizer


def _rng(seed=0):
    return np.random.default_rng(seed)


def _image(h=48, w=64, seed=1):
    return _rng(seed).integers(0, 255, (h, w, 3), dtype=np.uint8)


def _sem(h=48, w=64):
    sem = np.full((h, w), 255, np.uint8)        # ignore background
    sem[5:20, 5:30] = 2
    sem[25:45, 10:50] = 7
    sem[30:40, 52:60] = 11
    return sem


def test_rgb2id_roundtrip():
    ids = np.array([[0, 1, 255], [256, 65536, 16777215]], np.int32)
    assert np.array_equal(M.rgb2id(M.id2rgb(ids)), ids)


def test_semantic_mapper():
    dd = {"image_np": _image(), "sem_seg_np": _sem()}
    out = M.SemanticMapper(ignore_label=255, size_divisibility=64,
                           min_sizes=(48,), max_size=1333)(dd, _rng())
    assert out["image"].shape == (64, 64, 3)        # padded to divisibility
    assert out["sem_seg"].shape == (64, 64)
    inst = out["instances"]
    assert set(inst["gt_classes"]) == {2, 7, 11}
    # the per-class masks partition exactly the non-ignore pixels
    union = inst["gt_masks"].any(0)
    assert np.array_equal(union, out["sem_seg"] != 255)
    for c, m in zip(inst["gt_classes"], inst["gt_masks"]):
        assert np.array_equal(m, out["sem_seg"] == c)
    # padding used the ignore label
    assert (out["sem_seg"][:, 64 - 1] == 255).all()


def test_panoptic_mapper_mask_former_mode():
    h = w = 48
    pan_id = np.zeros((h, w), np.int32)
    pan_id[4:20, 4:24] = 9001
    pan_id[26:44, 8:40] = 42
    dd = {
        "image_np": _image(h, w),
        "pan_seg_np": M.id2rgb(pan_id),
        "segments_info": [
            {"id": 9001, "category_id": 3, "iscrowd": 0},
            {"id": 42, "category_id": 5, "iscrowd": 0},
            {"id": 7, "category_id": 1, "iscrowd": 1},   # filtered
        ],
    }
    out = M.PanopticMapper(min_sizes=(48,), max_size=1333)(dd, _rng())
    inst = out["instances"]
    assert list(inst["gt_classes"]) == [3, 5]
    assert inst["gt_masks"].shape[0] == 2
    assert inst["gt_masks"][0].sum() > 0 and inst["gt_masks"][1].sum() > 0
    # boxes tightly enclose masks
    for m, b in zip(inst["gt_masks"], inst["gt_boxes"]):
        ys, xs = np.nonzero(m)
        assert b[0] == xs.min() and b[2] == xs.max() + 1
        assert b[1] == ys.min() and b[3] == ys.max() + 1


def test_panoptic_mapper_new_baseline_fixed_size():
    h, w = 40, 72
    pan_id = np.zeros((h, w), np.int32)
    pan_id[8:30, 10:50] = 1234
    dd = {
        "image_np": _image(h, w),
        "pan_seg_np": M.id2rgb(pan_id),
        "segments_info": [{"id": 1234, "category_id": 2, "iscrowd": 0}],
    }
    out = M.PanopticMapper(mode="new_baseline", image_size=32)(dd, _rng(3))
    assert out["image"].shape == (32, 32, 3)        # jitter + fixed crop
    assert out["instances"]["gt_masks"].shape[1:] == (32, 32)


def test_instance_mapper_all_segm_formats():
    h = w = 48
    square = [8.0, 8.0, 24.0, 8.0, 24.0, 24.0, 8.0, 24.0]
    arr_mask = np.zeros((h, w), bool)
    arr_mask[30:40, 30:44] = True
    # uncompressed RLE: column-major runs — 10 rows set in column band
    rle = {"size": [h, w], "counts": [48 * 20 + 2, 12, 48 - 12]}
    dd = {
        "image_np": _image(h, w),
        "annotations": [
            {"segmentation": [square], "category_id": 1},
            {"segmentation": rle, "category_id": 2},
            {"segmentation": arr_mask, "category_id": 3},
            {"segmentation": [square], "category_id": 9, "iscrowd": 1},
        ],
    }
    out = M.InstanceMapper(min_sizes=(48,), max_size=1333)(dd, _rng())
    inst = out["instances"]
    assert list(inst["gt_classes"]) == [1, 2, 3]     # iscrowd filtered
    assert inst["gt_masks"].shape == (3, h, w)
    assert all(m.sum() > 0 for m in inst["gt_masks"])
    for m, b in zip(inst["gt_masks"], inst["gt_boxes"]):
        ys, xs = np.nonzero(m)
        assert (xs >= b[0]).all() and (xs < b[2]).all()


def test_interactive_mapper_spatial_query_and_grounding():
    h, w = 64, 64
    pan_id = np.zeros((h, w), np.int32)
    pan_id[6:30, 6:34] = 11
    pan_id[36:60, 20:56] = 22
    dd = {
        "image_np": _image(h, w),
        "pan_seg_np": M.id2rgb(pan_id),
        "segments_info": [
            {"id": 11, "category_id": 0, "iscrowd": 0},
            {"id": 22, "category_id": 1, "iscrowd": 0},
        ],
        "captions": ["a room with a chair"],
        "height": h, "width": w,
    }
    out = M.InteractiveMapper(
        image_size=64, min_scale=1.0, max_scale=1.0,
        class_names=["wall", "chair"], retrieval=True,
        tokenizer=HashTokenizer(context_length=16),
    )(dd, _rng(5))
    sq = out["spatial_query"]
    assert set(sq) >= {"gt_masks", "rand_shape", "types"}
    assert sq["rand_shape"].dtype == bool
    assert sq["rand_shape"].shape[0] == len(sq["types"])
    g = out["groundings"]
    assert g["mode"] == "class"
    assert len(g["texts"]) == len(g["masks"]) == len(g["hash"])
    assert out["tokens"]["input_ids"].shape == (1, 16)
    assert out["captions_noun"] is None            # documented asset gap


def test_refcoco_mapper_train_and_eval():
    h = w = 48
    square = [4.0, 4.0, 20.0, 4.0, 20.0, 20.0, 4.0, 20.0]
    gi = [{
        "segmentation": [square],
        "sentences": [{"raw": "The Red Chair"}, {"raw": "a chair"}],
        "bbox": [4, 4, 16, 16],
    }]
    dd = {"image_np": _image(h, w), "height": h, "width": w,
          "grounding_info": gi}
    tr = M.RefCOCOMapper(is_train=True, image_size=32)(dd, _rng(2))
    assert tr["groundings"]["mode"] == "text"
    assert len(tr["groundings"]["texts"]) == 1
    assert tr["groundings"]["texts"][0] in ("the red chair", "a chair")
    assert tr["groundings"]["masks"].shape == (1, 32, 32)
    ev = M.RefCOCOMapper(is_train=False, min_size_test=48)(dd, _rng(2))
    assert ev["groundings"]["texts"][0] == ["the red chair", "a chair"]
    assert ev["groundings"]["masks"].shape == (1, h, w)  # native resolution
    assert ev["groundings"]["boxes"].shape == (1, 4)


def test_vlp_mapper():
    dd = {"image_np": _image(40, 72),
          "captions": ["a photo of a room", "the kitchen"]}
    out = M.VLPMapper(image_size=32, tokenizer=HashTokenizer(context_length=12),
                      max_token_num=12)(dd)
    assert out["image"].shape == (32, 32, 3)
    assert out["tokens"]["input_ids"].shape == (2, 12)
    assert out["tokens"]["attention_mask"].sum() > 0


def test_eval_semseg_and_pano_mappers():
    dd = {"image_np": _image(40, 60), "sem_seg_np": _sem(40, 60)}
    out = M.EvalSemSegMapper(min_size_test=20)(dd)
    assert min(out["image"].shape[:2]) == 20
    assert out["semseg"].shape == (40, 60)          # gt stays native
    pan_id = np.zeros((40, 60), np.int32)
    pan_id[5:20, 5:30] = 77
    out2 = M.PanoEvalMapper(min_size_test=20)(
        {"image_np": _image(40, 60), "pan_seg_np": M.id2rgb(pan_id)})
    assert (out2["pan_seg"] == 77).sum() == 15 * 25


def test_imagenet_mapper_center_crop():
    out = M.ImageNetMapper(size_crop=32, size_test=24)(
        {"image_np": _image(50, 80)})
    assert out["image"].shape == (24, 24, 3)


def test_pascalvoc_ix_mapper():
    h = w = 48
    inst_raster = np.zeros((h, w), np.uint8)
    inst_raster[6:26, 6:30] = 1
    inst_raster[30:46, 20:44] = 2
    inst_raster[0:3, 0:3] = 255                     # ignore region
    sem = np.zeros((h, w), np.uint8)
    sem[inst_raster == 1] = 1
    sem[inst_raster == 2] = 3
    dd = {"image_np": _image(h, w), "inst_np": inst_raster,
          "semseg_np": sem, "objects_ids": [1, 2]}
    out = M.PascalVOCIXMapper(
        min_size_test=48, sampler_cfg=M.StrokeSamplerConfig(eval_mode="best"),
        mode="Point", class_names=["aeroplane", "bicycle", "bird"],
    )(dd, _rng(4))
    assert out["instances"]["gt_masks"].shape[0] == 2
    assert out["spatial_query"]["rand_shape"].shape[0] == 2
    assert out["gt_masks_orisize"].shape == (2, h, w)
    assert (out["gt_masks_orisize"][:, 0:3, 0:3] == -1).all()
    assert out["classes"][0] == "aeroplane." and out["classes"][1] == "bird."


def test_catalog_mapper_kinds_all_buildable():
    """Every mapper kind the registry catalog declares resolves to a working
    mapper class — the kinds stop being labels."""
    from geopurify_tpu.data import registry
    from geopurify_tpu.data.registry_catalog import register_catalog

    register_catalog()
    kinds = set()
    for name in registry.list_datasets():
        meta = registry.metadata(name)
        k = meta.extra.get("mapper") if meta.extra else None
        if k:
            kinds.add(k)
    missing = {k for k in kinds if k not in M.MAPPER_KINDS}
    assert not missing, f"catalog mapper kinds without bodies: {missing}"
    for k in sorted(kinds):
        assert callable(M.build_mapper(k))

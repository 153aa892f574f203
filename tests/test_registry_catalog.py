"""Dataset-registry catalog vs the reference's 17 registration modules
(VERDICT r3 item #9): names, class tables/counts, ignore labels, evaluator
wiring, mapper kinds.

Reference: third_party/X-Decoder/xdecoder/datasets/registration/*.py (17
files) + dataset_mappers/ (15 mappers).
"""

import pytest

from geopurify_tpu.data import registry
from geopurify_tpu.data.registry_catalog import (
    BDD_PANO,
    BDD_SEM,
    FAMILY_MODULES,
    SCAN_20,
    SCAN_37,
    SCAN_40,
    ExternalDataset,
)


def _catalog_metas():
    return [
        registry.metadata(n)
        for n in registry.list_datasets()
        if "registration_module" in registry.metadata(n).extra
    ]


def test_all_17_families_registered():
    assert len(FAMILY_MODULES) == 17
    covered = {m.extra["registration_module"] for m in _catalog_metas()}
    assert covered == set(FAMILY_MODULES)


def test_registered_names_match_reference():
    names = set(registry.list_datasets())
    # spot-pin the exact registered names per reference module
    for expect in (
        "ade20k_full_sem_seg_val",            # register_ade20k_full.py:950
        "ade20k_instance_val",                # register_ade20k_instance.py:21
        "ade20k_panoptic_val",
        "bdd10k_40_panoptic_val",
        "bdd10k_val_sem_seg",
        "coco_2017_train_panoptic_filtall_with_sem_seg_caption_grounding_lvis",
        "coco_2017_val_panoptic_with_sem_seg_caption",
        "coco_2017_train_panoptic_with_sem_seg_caption_grounding",
        "coco_2017_val_panoptic_with_sem_seg",
        "coco_2017_train_stuff_10k_sem_seg",  # register_coco_stuff_10k.py:209
        "imagenet_val",
        "pascalvoc_val_Point", "pascalvoc_val_Box",
        "refcocog_val_umd",
        "scannet_21_panoptic_val",
        "scannet_41_val_seg", "scannet_38_val_seg", "scannet_21_val_seg",
        "sunrgbd_37_val_seg",
        "vlp_captioning_val", "vlp_val2017",
    ):
        assert expect in names, expect


def test_class_tables_and_counts():
    # verbatim tables (reference utils/constants.py:7-17)
    assert len(SCAN_20) == 20 and len(SCAN_37) == 37 and len(SCAN_40) == 40
    assert len(BDD_SEM) == 19 and len(BDD_PANO) == 40
    m = registry.metadata("scannet_21_val_seg")
    assert m.class_names == SCAN_20
    assert registry.metadata("sunrgbd_37_val_seg").class_names == SCAN_37
    # big-catalog counts (names carried by count, reference asserts them)
    assert registry.metadata("ade20k_full_sem_seg_val").extra["num_classes"] == 847
    assert registry.metadata("coco_2017_train_stuff_10k_sem_seg").extra["num_classes"] == 171
    assert registry.metadata("coco_2017_val_panoptic_with_sem_seg").extra["num_classes"] == 133
    assert registry.metadata("ade20k_panoptic_val").extra["num_classes"] == 150
    assert registry.metadata("imagenet_val").extra["num_classes"] == 1000


def test_ignore_labels():
    # 16-bit TIFF gt (register_ade20k_full.py ignore_label=65535)
    assert registry.metadata("ade20k_full_sem_seg_val").ignore_label == 65535
    assert registry.metadata("ade20k_panoptic_val").ignore_label == 255
    assert registry.metadata("coco_2017_val_panoptic_with_sem_seg").ignore_label == 255


def test_evaluator_wiring():
    # reference evaluator_type strings preserved; our dispatch family mapped
    cases = {
        "scannet_21_val_seg": ("sem_seg", "sem_seg"),
        "scannet_21_panoptic_val": ("scannet_panoptic_seg", "panoptic"),
        "bdd10k_40_panoptic_val": ("bdd_panoptic_pano", "panoptic"),
        "coco_2017_val_panoptic_with_sem_seg": ("coco_panoptic_seg", "panoptic"),
        "ade20k_panoptic_val": ("ade20k_panoptic_seg", "panoptic"),
        "imagenet_val": ("classification", "classification"),
        "pascalvoc_val_Point": ("interactive", "interactive"),
        "refcocog_val_umd": ("grounding_refcoco", "grounding"),
        "vlp_val": ("retrieval", "retrieval"),
        "vlp_captioning_val": ("captioning", "captioning"),
        "ade20k_instance_val": ("instance", "instance"),
    }
    for name, (ref_t, fam) in cases.items():
        m = registry.metadata(name)
        assert m.extra["ref_evaluator_type"] == ref_t, name
        assert m.evaluator_type == fam, name


def test_build_evaluator_dispatch_covers_catalog():
    # every catalog entry's evaluator family constructs through the registry
    for m in _catalog_metas():
        ev = registry.build_evaluator(m.name)
        assert ev is not None, m.name


def test_mapper_kinds_are_reference_mappers():
    ref_mappers = {
        "bdd_semseg_dataset_mapper", "coco_instance_new_baseline_dataset_mapper",
        "coco_panoptic_interactive_dataset_mapper",
        "coco_panoptic_new_baseline_dataset_mapper", "imagenet_dataset_mapper",
        "mask_former_instance_dataset_mapper", "mask_former_panoptic_dataset_mapper",
        "mask_former_semantic_dataset_mapper", "pascalvoc_dataset_mapper_ix",
        "refcoco_dataset_mapper", "scannet_dataset_mapper",
        "scannet_pano_dataset_mapper", "sunrgbd_dataset_mapper",
        "vlp_dataset_mapper",
    }
    for m in _catalog_metas():
        assert m.extra["mapper"] in ref_mappers, m.name


def test_external_factory_raises_without_data():
    ds = registry.get("scannet_21_val_seg")
    assert isinstance(ds, ExternalDataset)
    with pytest.raises(FileNotFoundError, match="scannet_frames_25k"):
        ds.resolve()


def test_external_factory_resolves_with_root(tmp_path):
    (tmp_path / "sun_rgbd").mkdir()
    ds = registry.get("sunrgbd_37_val_seg", root=str(tmp_path))
    assert ds.resolve().endswith("sun_rgbd")

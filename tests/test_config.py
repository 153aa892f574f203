import pytest

from geopurify_tpu.config import GeoPurifyConfig, load_config, parse_overrides


def test_default_config_hyperparams_match_reference():
    cfg = GeoPurifyConfig()
    # parity-defining constants (BASELINE.md)
    assert cfg.data.voxel_size == 0.02
    assert cfg.pooling.knn_k == 96
    assert cfg.pooling.sharpen == 20.0
    assert cfg.pooling.num_iterations == 19
    assert cfg.contrastive.num_anchors == 4096
    assert cfg.contrastive.num_macro_negatives == 48
    assert cfg.contrastive.num_micro_negatives == 15
    assert cfg.contrastive.temperature == 0.07
    assert cfg.student.input_dim == 518


@pytest.mark.parametrize(
    "preset,n_cls,ignore",
    [
        ("scannet", 19, (19, 20)),
        ("scannet200", 200, (200,)),
        ("matterport", 21, (255,)),
        ("matterport40", 40, (255,)),
        ("matterport80", 80, (255,)),
        ("matterport160", 160, (255,)),
    ],
)
def test_presets_label_spaces(preset, n_cls, ignore):
    cfg = load_config(preset)
    assert len(cfg.data.all_label) == n_cls
    assert cfg.data.test_classes == n_cls
    assert cfg.data.test_ignore_label == ignore
    base, novel = set(cfg.data.base_category), set(cfg.data.novel_category)
    assert not base & novel
    assert max(base | novel) < n_cls


def test_overrides():
    cfg = load_config("scannet", overrides=["data.voxel_size=0.04", "train.epochs=3"])
    assert cfg.data.voxel_size == 0.04
    assert cfg.train.epochs == 3
    with pytest.raises(KeyError):
        load_config("scannet", overrides=["data.nonexistent=1"])


def test_parse_overrides_literals():
    tree = parse_overrides(["a.b=[1,2]", "a.c=hello", "d=1.5"])
    assert tree == {"a": {"b": [1, 2], "c": "hello"}, "d": 1.5}

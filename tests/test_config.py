"""Config loading: our YAMLs and the reference's own experiment files must
both produce the expected static config."""

import os

import pytest

from fvp_tpu.config import FVPConfig, load_config

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_panoptic_yaml():
    cfg = load_config(os.path.join(HERE, "configs/panoptic/jln64.yaml"))
    assert cfg.num_views == 5
    assert cfg.space_size == (8000.0, 8000.0, 2000.0)
    assert cfg.space_center == (0.0, -500.0, 800.0)
    assert cfg.voxels_per_axis == (80, 80, 20)
    assert cfg.heatmap_size == (240, 128)
    assert cfg.min_score == 0.3
    assert cfg.root_joint_id == (2,)
    assert cfg.fine_voxels_per_axis == (253, 253, 64)
    hash(cfg)   # must stay hashable (jit static arg)


def test_load_shelf_yaml():
    cfg = load_config(os.path.join(HERE, "configs/shelf/jln64.yaml"))
    assert cfg.num_joints == 17
    assert cfg.root_joint_id == (11, 12)
    assert cfg.train_dataset == "synthetic"
    assert cfg.test_heatmap_src == "pred"
    assert cfg.ori_image_size == (1032, 776)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/configs/campus/jln64.yaml"),
    reason="reference repo not mounted")
def test_load_reference_yaml_directly():
    cfg = load_config("/root/reference/configs/campus/jln64.yaml")
    assert cfg.num_views == 3
    assert cfg.space_size == (12000.0, 12000.0, 2000.0)
    assert cfg.synthetic_max_people == 5
    assert cfg.sigma == 4.0


def test_override_kwargs():
    cfg = load_config(os.path.join(HERE, "configs/panoptic/jln64.yaml"),
                      batch_size=2, max_people=4)
    assert cfg.batch_size == 2 and cfg.max_people == 4


def test_defaults_roundtrip():
    cfg = FVPConfig()
    cfg2 = cfg.replace(num_views=3)
    assert cfg2.num_views == 3 and cfg.num_views == 5


def test_gen_config_roundtrip(tmp_path):
    """gen_config (reverse YAML dump; reference lib/core/config.py:191-198):
    load_config(gen_config(cfg)) == cfg, for defaults and for a config with
    schema-expressible and framework-extension fields changed."""
    from fvp_tpu.config import gen_config

    for cfg in (
        FVPConfig(),
        FVPConfig(num_views=3, heatmap_size=(120, 64),
                  voxels_per_axis=(48, 48, 12), root_joint_id=(11, 12),
                  lr_decay_epochs=(55, 70), device_render=True,
                  backbone_head="pallas", synthetic_scene_file="/tmp/x.pkl",
                  train_dataset="synthetic", data_augmentation=True,
                  init_scheme="reference"),
    ):
        p = str(tmp_path / "dump.yaml")
        gen_config(cfg, p)
        assert load_config(p) == cfg


def test_gen_config_default_dump_is_reference_schema(tmp_path):
    """A default-config dump contains only sections/keys the REFERENCE
    loader itself accepts (lib/core/config.py:15-144) — extension keys are
    elided at their defaults, so reference users can consume the file."""
    import yaml

    from fvp_tpu.config import gen_config

    p = str(tmp_path / "dump.yaml")
    gen_config(FVPConfig(), p)
    with open(p) as f:
        doc = yaml.safe_load(f)
    assert "RESNET" not in doc
    for sec, keys in (("DATASET", {"DEVICE_RENDER"}),
                      ("TRAIN", {"LR_DECAY_EPOCHS", "LR_DECAY_FACTOR",
                                 "INIT_SCHEME"}),
                      ("SYNTHETIC", {"SCENE_FILE"}),
                      ("NETWORK", {"JLN_BAND_HEIGHT", "WHOLE_BAND_HEIGHT"})):
        assert not keys & set(doc[sec]), (sec, keys & set(doc[sec]))

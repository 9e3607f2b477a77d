"""Cross-framework A/B protocol invariants (tools/ab_*).

The A/B's validity rests on two facts these tests pin:
  1. the two arm configs (configs/test/ab_cross_{ref,fvp}.yaml) agree on
     every shared protocol key — the arms differ only in framework
     extensions (DEVICE_RENDER, SCENE_FILE, DEVICE/WORKERS/MODEL);
  2. SCENE_FILE mode feeds the fvp arm byte-identical records to the
     export the torch arm consumes.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_YAML = os.path.join(REPO, "configs", "test", "ab_cross_ref.yaml")
FVP_YAML = os.path.join(REPO, "configs", "test", "ab_cross_fvp.yaml")

# keys that legitimately differ between the arms (framework extensions /
# runtime plumbing with no protocol meaning)
ARM_ONLY = {
    ("MODEL",), ("DEVICE",), ("WORKERS",), ("OUTPUT_DIR",), ("TEST",),
    ("TRAIN", "VISUALIZATION"),
    ("DATASET", "DEVICE_RENDER"),
    ("SYNTHETIC", "SCENE_FILE"),
}


def _flat(doc, prefix=()):
    out = {}
    for k, v in doc.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_arm_configs_share_protocol_keys():
    with open(REF_YAML) as f:
        ref = _flat(yaml.safe_load(f))
    with open(FVP_YAML) as f:
        fvp = _flat(yaml.safe_load(f))

    shared = set(ref) & set(fvp)
    for key in sorted(shared):
        if key in ARM_ONLY or key[:1] in ARM_ONLY:
            continue
        assert ref[key] == fvp[key], f"protocol key {key} differs"

    for key in set(ref) ^ set(fvp):
        assert key in ARM_ONLY or key[:1] in ARM_ONLY, \
            f"unexpected arm-only key {key}"

    # the protocol-defining keys must be in the shared set
    for key in [("CAPTURE_SPEC", "VOXELS_PER_AXIS"),
                ("SYNTHETIC", "NUM_DATA"),
                ("SYNTHETIC", "DATA_AUGMENTATION"),
                ("TRAIN", "END_EPOCH"), ("TRAIN", "LR"),
                ("DATASET", "HEATMAP_SIZE")]:
        assert key in shared


def test_scene_file_roundtrip(tmp_path):
    from fvp_tpu.config import load_config
    from fvp_tpu.data.synthetic import SyntheticDataset
    from fvp_tpu.geometry.cameras import default_ring_rig

    cfg = load_config(FVP_YAML, synthetic_num_data=4,
                      synthetic_scene_file="")
    rig = default_ring_rig(cfg.num_views, cfg.space_center,
                           cfg.ori_image_size)
    src = SyntheticDataset(cfg, rig, seed=3, is_train=True)
    payload = {"train": src.records, "test": src.records[:2]}
    pkl = tmp_path / "scenes.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(payload, f)

    cfg2 = cfg.replace(synthetic_scene_file=str(pkl))
    loaded = SyntheticDataset(cfg2, rig, seed=99, is_train=True)
    assert len(loaded.records) == len(src.records)
    for a, b in zip(loaded.records, src.records):
        assert a["seq"] == b["seq"]
        for ja, jb in zip(a["joints_3d"], b["joints_3d"]):
            np.testing.assert_array_equal(ja, jb)

    test_split = SyntheticDataset(cfg2, rig, seed=99, is_train=False)
    assert len(test_split.records) == 2
    assert test_split.has_evaluate_function


def test_r5_arm_config_matches_protocol():
    """The round-5 fvp arm (ab_cross_fvp_r5.yaml) must differ from the
    pinned fvp arm ONLY in OUTPUT_DIR and the round-5 fidelity knobs
    (ACCUMULATION_QUIRK, INIT_SCHEME) — the protocol numbers stay
    identical."""
    r5_yaml = os.path.join(REPO, "configs", "test", "ab_cross_fvp_r5.yaml")
    with open(FVP_YAML) as f:
        fvp = _flat(yaml.safe_load(f))
    with open(r5_yaml) as f:
        r5 = _flat(yaml.safe_load(f))

    allowed = {("OUTPUT_DIR",), ("TRAIN", "ACCUMULATION_QUIRK"),
               ("TRAIN", "INIT_SCHEME")}
    for key in set(fvp) | set(r5):
        if key in allowed:
            continue
        assert key in fvp and key in r5, f"key {key} missing from one arm"
        assert fvp[key] == r5[key], f"protocol key {key} differs"
    assert r5[("TRAIN", "ACCUMULATION_QUIRK")] is True
    assert r5[("TRAIN", "INIT_SCHEME")] == "reference"

"""Shipped configs/dataset_params/*.yaml presets parse through the dataset
camera loader (reference tier-3 config surface: per-dataset camera YAML,
config/dataset_params/* — SURVEY.md §5)."""

import glob
import os

import numpy as np
import pytest
import yaml

from stvo_pl_tpu.utils import dataset

PRESET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "configs", "dataset_params")
PRESETS = sorted(glob.glob(os.path.join(PRESET_DIR, "*.yaml")))


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p)
                                               for p in PRESETS])
def test_preset_parses(path):
    with open(path) as f:
        params = yaml.safe_load(f)
    calib = dataset.calib_from_yaml(params)
    cam = calib.cam
    assert cam.width > 0 and cam.height > 0
    assert cam.fx > 0 and cam.b > 0
    if "Kl" in params["cam0"]:
        # unrectified presets must produce rectification maps of image shape
        assert calib.map_l is not None and calib.map_r is not None
        assert calib.map_l.shape[:2] == (cam.height, cam.width)
        assert np.isfinite(calib.map_l).all()
    assert "images_subfolder_l" in params and "images_subfolder_r" in params


def test_kitti_presets_match_known_intrinsics():
    with open(os.path.join(PRESET_DIR, "kitti00-02.yaml")) as f:
        p = yaml.safe_load(f)["cam0"]
    assert abs(p["cam_fx"] - 718.856) < 1e-6
    assert abs(p["cam_bl"] - 0.537165719) < 1e-9

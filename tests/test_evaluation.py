"""Evaluation metric tests: Chamfer / normals / IoU sanity on analytic meshes."""

import numpy as np

from sv3d_tpu.evaluation.metrics import eval_mesh, eval_pointcloud
from tests.test_preprocessing import _box_mesh


def test_eval_identical_mesh():
    mesh = _box_mesh()
    out = eval_mesh(mesh, mesh, -0.5, 0.5, n_points=5000)
    assert out["chamfer_l2"] < 1e-4
    assert out["iou"] > 0.95
    assert out["normals"] > 0.95


def test_eval_shifted_mesh():
    a = _box_mesh()
    b = _box_mesh().apply_translation([0.1, 0, 0])
    out = eval_mesh(a, b, -0.5, 0.5, n_points=5000)
    assert out["chamfer_l2"] > 1e-4
    assert out["iou"] < 0.8
    # mostly parallel faces keep normal consistency fairly high
    assert out["normals"] > 0.7


def test_eval_pointcloud_exact():
    rng = np.random.default_rng(0)
    pc = rng.random((1000, 3)).astype(np.float32)
    out = eval_pointcloud(pc, pc)
    assert out["chamfer_l2"] == 0
    assert out["completeness"] == 0 and out["accuracy"] == 0


def test_eval_smaller_box_iou():
    big = _box_mesh(-0.3, 0.3)
    small = _box_mesh(-0.15, 0.15)
    out = eval_mesh(small, big, -0.5, 0.5, n_points=3000)
    # IoU = vol(small)/vol(big) = (0.3/0.6)^3 = 0.125
    assert 0.08 < out["iou"] < 0.18

"""Serving CLI tests: sv3d_tpu.inference.predict (image -> mesh, no trainer).

The reference's only inference entry is trainer --test over a processed data
tree (reference trainer_scene_net.py:234-240); predict serves raw
rgb.png / distance.exr + intrinsic.txt directly.  Uses a random-init
checkpoint saved through the real CheckpointManager and the overfit fixture,
at scale_factor=8 for CPU speed.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE_DATA = Path(__file__).parent.parent / ".fixture_data"
FIXTURE_RAW = FIXTURE_DATA / "raw" / "overfit" / "00000"

pytestmark = pytest.mark.skipif(
    not FIXTURE_RAW.exists(), reason="overfit fixture not prepared"
)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """Random-init SceneNet state saved with the real checkpoint machinery."""
    from sv3d_tpu.inference import predict as pr
    from sv3d_tpu.training.checkpoint import CheckpointManager

    args = pr.build_parser().parse_args(
        ["--checkpoint", "unused", "--rgb", "x", "--scale_factor", "8",
         "--intrinsics", str(FIXTURE_RAW / "intrinsic.txt")]
    )
    ckdir = tmp_path_factory.mktemp("ck")
    import jax
    import jax.numpy as jnp

    from sv3d_tpu.config import Config
    from sv3d_tpu.geometry.camera import read_intrinsics
    from sv3d_tpu.geometry.frustum import FrustumGrid
    from sv3d_tpu.models.scene_net import SceneNet
    from sv3d_tpu.training.optim import build_optimizer
    from sv3d_tpu.training.state import create_train_state

    config = Config(scale_factor=8)
    intr = read_intrinsics(FIXTURE_RAW / "intrinsic.txt")
    frustum = FrustumGrid.create(intr, voxel_size=0.05 * 8)
    model = SceneNet(config, intr, frustum)
    variables = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 240, 320, 3)), jnp.full((1, 240, 320), 2.0),
            jnp.zeros((1, 8, 3)), train=False,
        )
    )(jax.random.PRNGKey(0))
    state = create_train_state(
        model, variables, build_optimizer(config.lr, variables["params"])
    )
    CheckpointManager(ckdir, top_k=0).save(state, step=0)
    return ckdir / "last"


def test_predict_rgb_to_mesh(tiny_checkpoint, tmp_path):
    from sv3d_tpu.inference.predict import main

    out = tmp_path / "pred"
    main([
        "--checkpoint", str(tiny_checkpoint),
        "--rgb", str(FIXTURE_RAW / "rgb.png"),
        "--intrinsics", str(FIXTURE_RAW / "intrinsic.txt"),
        "--scale_factor", "8",
        "--out", str(out),
        "--dump_depth",
    ])
    objs = list(out.glob("*.obj"))
    assert objs, "no mesh written"
    from sv3d_tpu.io.mesh import load_obj

    mesh = load_obj(objs[0])
    assert len(mesh.vertices) > 0 and len(mesh.faces) > 0
    assert (out / "00000_depth.png").exists() or list(out.glob("*_depth.png"))


def test_predict_distance_gt_depth_pipeline(tiny_checkpoint, tmp_path):
    """--distance serves the reference's --skip_unet (GT depth) pipeline."""
    from sv3d_tpu.inference.predict import main

    out = tmp_path / "pred_gt"
    main([
        "--checkpoint", str(tiny_checkpoint),
        "--distance", str(FIXTURE_RAW / "distance.exr"),
        "--intrinsics", str(FIXTURE_RAW / "intrinsic.txt"),
        "--scale_factor", "8",
        "--out", str(out),
    ])
    objs = list(out.glob("*.obj"))
    assert objs, "no mesh written"


def test_predict_rejects_ambiguous_inputs(tmp_path):
    from sv3d_tpu.inference.predict import main

    with pytest.raises(SystemExit):
        main(["--checkpoint", "x"])  # neither --rgb nor --distance

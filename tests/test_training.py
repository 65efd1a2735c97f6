"""Trainer smoke tests: loss goes down on the overfit fixture, checkpoints
save/restore, warm start filters the unet subtree.

Shapes are kept tiny (large scale_factor, few points) because tests run on a
single-core CPU backend; the persistent compilation cache (conftest) makes
reruns fast.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from sv3d_tpu.config import Config

FIXTURE_DATA = Path(__file__).parent.parent / ".fixture_data"

pytestmark = pytest.mark.skipif(
    not FIXTURE_DATA.exists(),
    reason="run scripts/prepare_overfit.py --out .fixture_data first",
)


def _synthetic_implicit_tree(root: Path, dims, n_items=2):
    """Synthetic processed samples for the IF-Net-only trainer at given dims."""
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        sp = root / "splits" / "synth"
        sp.mkdir(parents=True, exist_ok=True)
        (sp / f"{split}.txt").write_text(
            "\n".join(f"{i:05d}" for i in range(n_items)) + "\n"
        )
    for i in range(n_items):
        d = root / "processed" / "synth" / f"{i:05d}"
        d.mkdir(parents=True, exist_ok=True)
        grid = (rng.random(dims) > 0.97).astype(np.float32)
        np.savez_compressed(d / "depth_grid", grid=grid)
        for sigma in ("0.10", "0.01"):
            pts = rng.uniform(-0.5, 0.5, size=(500, 3)).astype(np.float32)
            occ = (pts[:, 0] > 0).astype(np.float32)
            np.savez(
                d / f"occupancy_{sigma}",
                points=pts, occupancies=occ, grid_coords=2 * pts[:, ::-1],
            )
    return root


def test_ifnet_trainer_overfits(tmp_path):
    from sv3d_tpu.training.trainer_ifnet import ImplicitRefinementTrainer

    cfg = Config(
        datasetdir=str(tmp_path / "data"),
        splitsdir="synth",
        scale_factor=8,
        num_points=32,
        batch_size=2,
        max_epoch=1,
        seed=0,
        sanity_steps=1,
        experiment="test_ifnet",
        net_res=32,
    )
    assert cfg.dims == (17, 13, 14)
    _synthetic_implicit_tree(tmp_path / "data", dims=cfg.dims)

    trainer = ImplicitRefinementTrainer(cfg, experiment_dir=tmp_path / "exp")
    state = trainer.fit(max_steps=6)
    metrics_log = (tmp_path / "exp" / "logs" / "metrics.jsonl").read_text().splitlines()
    first = json.loads(metrics_log[0])
    assert np.isfinite(first["train_ce_loss"])
    # checkpoint written
    assert (tmp_path / "exp" / "checkpoints" / "last").exists()

    # resume restores step counter
    from sv3d_tpu.training.checkpoint import load_state_from_checkpoint

    state2 = trainer.build_state(trainer._next_rng())
    state2 = load_state_from_checkpoint(state2, tmp_path / "exp" / "checkpoints" / "last")
    assert int(state2.step) == int(state.step)


def test_scene_net_trainer_smoke(tmp_path):
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(
        datasetdir=str(FIXTURE_DATA),
        splitsdir="overfit",
        scale_factor=4,
        num_points=16,
        batch_size=1,
        max_epoch=1,
        seed=0,
        sanity_steps=0,
        skip_unet=True,
        experiment="test_scene",
        net_res=32,
        val_check_interval=1000,
    )
    trainer = SceneNetTrainer(cfg, experiment_dir=tmp_path / "exp")
    trainer.fit(max_steps=3)
    log = (tmp_path / "exp" / "logs" / "metrics.jsonl").read_text().splitlines()
    rec = json.loads(log[0])
    assert np.isfinite(rec["train_ce_loss"])
    assert np.isfinite(rec["train_mse_depth_loss"])
    assert "sigma_x" in rec


def test_scene_net_default_monitor_is_point_iou(tmp_path):
    """The flagship trainer must NOT default to the reference's val_ce_loss
    monitor (reference trainer_scene_net.py:217): measured in r4, best-val-CE
    selects a constant base-rate predictor (held-out IoU 0.006 vs 0.24+).
    Default = val_point_iou ranked max; the manifest records both, and a bare
    `--monitor val_ce_loss` (no mode) must re-infer mode=min."""
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(
        datasetdir=str(FIXTURE_DATA),
        splitsdir="overfit",
        scale_factor=4,
        num_points=16,
        batch_size=1,
        max_epoch=1,
        seed=0,
        sanity_steps=0,
        skip_unet=True,
        experiment="test_monitor",
        net_res=32,
        val_check_interval=2,
        val_check_percent=1.0,
    )
    trainer = SceneNetTrainer(cfg, experiment_dir=tmp_path / "exp")
    assert trainer.monitor == "val_point_iou"
    assert trainer.monitor_mode == "max"
    trainer.fit(max_steps=4)
    manifest = json.loads(
        (tmp_path / "exp" / "checkpoints" / "manifest.json").read_text()
    )
    assert manifest["monitor"] == "val_point_iou"
    assert manifest["mode"] == "max"
    scores = [m for m, _ in manifest["scores"]]
    assert scores == sorted(scores, reverse=True)  # ranked best(=highest) first

    # reference-parity escape hatch: monitor override without an explicit
    # mode infers the ranking direction from the metric name
    import dataclasses

    t2 = SceneNetTrainer(
        dataclasses.replace(cfg, monitor="val_ce_loss"),
        experiment_dir=tmp_path / "exp2",
    )
    assert t2.monitor == "val_ce_loss"
    assert t2.monitor_mode == "min"


def test_unet_warm_start(tmp_path):
    """use_pretrained_unet analog: only the unet subtree is overwritten
    (reference trainer_scene_net.py:204-212)."""
    import jax
    import jax.numpy as jnp

    from sv3d_tpu.training.checkpoint import CheckpointManager, load_pretrained_unet
    from sv3d_tpu.training.optim import build_optimizer
    from sv3d_tpu.training.state import create_train_state

    # build a tiny fake "scene net"-shaped state: unet + ifnet subtrees
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = nn.Dense(4, name="dense")(x)
            return a

    class Wrapper(nn.Module):
        def setup(self):
            self.unet = Tiny()
            self.ifnet = Tiny()

        def __call__(self, x):
            return self.unet(x) + self.ifnet(x)

    model = Wrapper()
    v1 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    v2 = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4)))
    s1 = create_train_state(model, v1, build_optimizer(1e-3, v1["params"]))
    s2 = create_train_state(model, v2, build_optimizer(1e-3, v2["params"]))

    ckpt = CheckpointManager(tmp_path / "ck")
    ckpt.save(s1, metric=1.0)
    s2b = load_pretrained_unet(s2, tmp_path / "ck" / "last")
    # unet now equals s1's, ifnet untouched
    np.testing.assert_allclose(
        s2b.params["unet"]["dense"]["kernel"], s1.params["unet"]["dense"]["kernel"]
    )
    np.testing.assert_allclose(
        s2b.params["ifnet"]["dense"]["kernel"], s2.params["ifnet"]["dense"]["kernel"]
    )


def test_checkpoint_manifest_reload(tmp_path):
    """Top-k checkpoint state survives a manager restart and stale step dirs
    are pruned (the reference's PL ModelCheckpoint keeps best_k_models across
    resume, trainer_scene_net.py:217)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from sv3d_tpu.training.checkpoint import CheckpointManager
    from sv3d_tpu.training.optim import build_optimizer
    from sv3d_tpu.training.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(x)

    model = Tiny()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    state = create_train_state(model, v, build_optimizer(1e-3, v["params"]))

    ckpt = CheckpointManager(tmp_path / "ck", top_k=2)
    ckpt.save(state, metric=3.0, step=1)
    ckpt.save(state, metric=1.0, step=2)
    ckpt.save(state, metric=2.0, step=3)  # evicts step_1 (worst of 3)
    assert not (tmp_path / "ck" / "step_1").exists()
    scores_before = [(m, str(p)) for m, p in ckpt._scores]

    # a stale dir (crash between step save and manifest write) is pruned
    (tmp_path / "ck" / "step_99").mkdir()
    ckpt2 = CheckpointManager(tmp_path / "ck", top_k=2)
    assert [(m, str(p)) for m, p in ckpt2._scores] == scores_before
    assert not (tmp_path / "ck" / "step_99").exists()
    assert ckpt2.best_path().endswith("step_2")

    # eviction after reload still removes the correct (worst) checkpoint
    ckpt2.save(state, metric=0.5, step=4)
    assert not (tmp_path / "ck" / "step_3").exists()
    assert (tmp_path / "ck" / "step_2").exists()
    assert (tmp_path / "ck" / "step_4").exists()

    # re-saving the SAME step (epoch-end save + end-of-fit save) replaces the
    # score entry instead of duplicating it
    ckpt2.save(state, metric=0.4, step=4)
    assert [p for _, p in ckpt2._scores].count(str(tmp_path / "ck" / "step_4")) == 1
    assert len(ckpt2._scores) == 2


def test_checkpoint_mode_max_ranks_high_best(tmp_path):
    """mode='max' (e.g. monitor=val_point_iou) keeps the HIGHEST-metric
    checkpoints, evicts the lowest, and survives a manager restart with the
    manifest still ordered best-first (readers never need the mode)."""
    import json

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from sv3d_tpu.training.checkpoint import CheckpointManager
    from sv3d_tpu.training.optim import build_optimizer
    from sv3d_tpu.training.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(x)

    model = Tiny()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    state = create_train_state(model, v, build_optimizer(1e-3, v["params"]))

    ckpt = CheckpointManager(tmp_path / "ck", top_k=2, mode="max")
    ckpt.save(state, metric=0.1, step=1)
    ckpt.save(state, metric=0.5, step=2)
    ckpt.save(state, metric=0.3, step=3)  # evicts step_1 (lowest of 3)
    assert not (tmp_path / "ck" / "step_1").exists()
    assert ckpt.best_path().endswith("step_2")

    manifest = json.loads((tmp_path / "ck" / "manifest.json").read_text())
    assert [m for m, _ in manifest["scores"]] == [0.5, 0.3]  # best-first

    ckpt2 = CheckpointManager(tmp_path / "ck", top_k=2, mode="max")
    assert ckpt2.best_path().endswith("step_2")
    ckpt2.save(state, metric=0.7, step=4)  # evicts step_3 (now lowest)
    assert not (tmp_path / "ck" / "step_3").exists()
    assert ckpt2.best_path().endswith("step_4")


def test_point_iou_metric_rejects_constant_predictor():
    """scene_losses' point_iou is 1 for a perfect predictor, 0 for a constant
    all-negative one, even when the constant predictor has LOWER CE — the
    measured failure mode of monitoring val_ce_loss (a base-rate predictor
    won best-val at CE 0.268 yet meshed to held-out IoU 0.006)."""
    import jax.numpy as jnp

    from sv3d_tpu.config import Config
    from sv3d_tpu.training.trainer_scene_net import scene_losses

    cfg = Config(sanity_steps=0)
    occ = jnp.array([[1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    depth = jnp.zeros((1, 4, 4))
    params = {"project": {"sigma": jnp.ones(3)}}

    perfect = jnp.where(occ > 0.5, 8.0, -8.0)
    _, m = scene_losses(cfg, perfect, occ, depth, depth, params)
    assert float(m["point_iou"]) == 1.0

    # constant logit at the base rate: sigmoid(p)=0.25 -> CE == H(0.25), which
    # UNDERCUTS a noisy real model's CE, but predicts nothing -> IoU 0
    base = jnp.log(0.25 / 0.75)
    _, m_const = scene_losses(cfg, jnp.full_like(occ, base), occ, depth, depth, params)
    assert float(m_const["point_iou"]) == 0.0

    noisy = jnp.where(occ > 0.5, 0.4, -0.4) + jnp.array(
        [[1.1, -1.2, 0.9, -0.8, 1.3, -0.7, 1.0, -1.0]]
    )
    _, m_noisy = scene_losses(cfg, noisy, occ, depth, depth, params)
    assert float(m_const["ce_loss"]) < float(m_noisy["ce_loss"])
    assert float(m_noisy["point_iou"]) > 0.0


def test_val_check_interval_batches(tmp_path):
    """Integer val_check_interval means 'every N training batches' (PL 1.1
    semantics, reference trainer_scene_net.py:228)."""
    import json as _json

    from sv3d_tpu.training.trainer_ifnet import ImplicitRefinementTrainer

    cfg = Config(
        datasetdir=str(tmp_path / "data"),
        splitsdir="synth",
        scale_factor=8,
        num_points=16,
        batch_size=2,
        max_epoch=5,
        seed=0,
        sanity_steps=0,
        experiment="test_vci",
        net_res=32,
        val_check_interval=2,
    )
    _synthetic_implicit_tree(tmp_path / "data", dims=cfg.dims)
    trainer = ImplicitRefinementTrainer(cfg, experiment_dir=tmp_path / "exp")
    trainer.fit(max_steps=5)

    log = (tmp_path / "exp" / "logs" / "metrics.jsonl").read_text().splitlines()
    val_steps = [
        _json.loads(line)["step"]
        for line in log
        if "val_ce_loss" in _json.loads(line)
    ]
    assert val_steps == [2, 4]


def test_scene_net_test_empty_loader(tmp_path):
    """SceneNetTrainer.test must not crash when the test split is empty
    (reference --test entry, trainer_scene_net.py:234-240)."""
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(
        datasetdir=str(FIXTURE_DATA),
        splitsdir="overfit",
        scale_factor=8,
        num_points=8,
        batch_size=1,
        seed=0,
        skip_unet=True,
        experiment="test_empty",
        net_res=32,
    )
    trainer = SceneNetTrainer(cfg, experiment_dir=tmp_path / "exp")
    state = trainer.build_state(trainer._next_rng())
    trainer.ckpt.save(state)

    class Empty:
        def __len__(self):
            return 0

        def __getitem__(self, i):
            raise IndexError(i)

    trainer.test_dataset = lambda: Empty()
    metrics = trainer.test(str(tmp_path / "exp" / "checkpoints" / "last"))
    assert metrics == {}


def test_writers_disabled_on_non_main(tmp_path):
    """Non-main processes (multi-host) must not touch the filesystem: logger
    and checkpoint manager are constructed with enabled=False."""
    from sv3d_tpu.training.checkpoint import CheckpointManager
    from sv3d_tpu.training.logging import MetricLogger

    lg = MetricLogger(tmp_path / "logs", enabled=False)
    lg.log({"a": 1.0}, 1)
    lg.close()
    assert not (tmp_path / "logs").exists()

    ck = CheckpointManager(tmp_path / "ck", enabled=False)

    class S:
        step = 1
        params = {}
        batch_stats = {}
        opt_state = {}

    ck.save(S(), metric=1.0)
    assert not (tmp_path / "ck").exists()


def test_vis_splits_consumed(tmp_path):
    """Validation-time visualization reads the dedicated train_vis/val_vis
    splits (reference trainer_scene_net.py:57-67,170-188) and dumps the
    projected point cloud alongside grid/mesh/depth artifacts."""
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(
        datasetdir=str(FIXTURE_DATA),
        splitsdir="overfit",
        scale_factor=8,
        num_points=8,
        batch_size=1,
        max_epoch=1,
        seed=0,
        sanity_steps=0,
        skip_unet=True,
        experiment="test_vis",
        net_res=32,
        val_check_interval=2,
        visualize=True,
    )
    trainer = SceneNetTrainer(cfg, experiment_dir=tmp_path / "exp")
    assert set(trainer.vis_datasets()) == {"train_vis", "val_vis"}
    trainer.fit(max_steps=2)
    for split in ("train_vis", "val_vis"):
        names = [f.name for f in (tmp_path / "exp" / "vis" / "00000" / split).glob("*")]
        assert any(n.endswith("_projected_pc.obj") for n in names), names
        assert any(n.endswith("_voxelized.obj") for n in names), names

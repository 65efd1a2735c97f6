"""Worker process for the 2-process multi-host integration test
(tests/test_multihost.py).  Not collected by pytest.

Runs SceneNetTrainer.fit for a few steps on a dp=nproc mesh whose devices
span all processes (1 CPU device per process), then writes a JSON fingerprint
of the final replicated state so the parent can compare runs bit-for-bit.
With --nproc 1 it produces the single-process baseline on the same global
mesh shape (2 local virtual devices).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--fixture", required=True)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--dp", type=int, default=2)
    p.add_argument("--subsample", type=int, default=0,
                   help="subsample_points: projected-cloud host labeling "
                   "mid-step — each process labels its LOCAL batch rows "
                   "(local_batch_rows) and the global occupancies are "
                   "reassembled from process-local data")
    p.add_argument(
        "--cycle_restore_dir",
        default=None,
        help="after the first save, rebuild a FRESH state, restore the "
        "checkpoint from this directory (the primary process's exp dir), "
        "and continue training 2 more steps + a second save — the orbax "
        "collective-barrier path that only exists when process_count > 1",
    )
    args = p.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))
    if args.nproc == 1:
        # single-process baseline: same dp-mesh over local virtual devices
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.dp}"
            ).strip()
    # NO persistent compile cache here: a cache hit on one process and a miss
    # on the other skews their arrival at the first collective past Gloo's
    # 30 s context-init window (observed), and cross-machine AOT entries can
    # SIGILL.  Both processes compiling from scratch stay in lockstep.
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nproc > 1:
        from sv3d_tpu.parallel.multihost import initialize_distributed

        assert initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
        )
        assert jax.process_count() == args.nproc
        assert jax.device_count() == args.nproc  # 1 CPU device per process

        # establish the Gloo collective context NOW, while both processes are
        # seconds apart, with a trivial psum — not during the minutes-long
        # train-step compile where arrival skew can exceed the 30 s window
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        import numpy as _np

        warm_mesh = Mesh(_np.asarray(jax.devices()).reshape(-1), ("w",))
        s = NamedSharding(warm_mesh, P("w"))
        g = jax.make_array_from_process_local_data(s, _np.ones((1,), _np.float32))
        assert float(jax.jit(lambda x: x.sum())(g)) == float(args.nproc)

    import numpy as np

    from sv3d_tpu.config import Config
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(
        datasetdir=args.fixture,
        splitsdir="overfit",
        scale_factor=8,
        num_points=16,
        batch_size=4,
        max_epoch=1,
        seed=0,
        sanity_steps=0,
        skip_unet=True,
        net_res=32,
        val_check_interval=1000,
        experiment="test_multihost",
        dp=args.dp,
        sp=1,
        subsample_points=args.subsample,
    )
    trainer = SceneNetTrainer(cfg, experiment_dir=Path(args.exp_dir))

    # drive the real loop machinery step by step so per-step losses can be
    # compared across runs (fit() only logs every 10 steps)
    state = trainer._put_state(trainer.build_state(trainer._next_rng()))
    loader = trainer._loader(trainer.train_dataset(), shuffle=True, drop_last=True)
    losses = []
    it = iter(loader)
    for _ in range(args.steps):
        batch = next(it)
        state, metrics = trainer.train_step(state, trainer._put(batch), trainer._next_rng())
        losses.append(float(metrics["train_ce_loss"]))
    trainer.ckpt.save(state, metric=losses[-1])
    trainer.logger.log({"train_ce_loss": losses[-1]}, args.steps)

    cycle = {}
    if args.cycle_restore_dir:
        # save -> restore -> continue: every process participates in the
        # restore and the second save (orbax runs global sync barriers when
        # process_count > 1; any process skipping a call would deadlock the
        # rest).  The fresh state starts from a DIFFERENT rng so the restore
        # provably overwrites it.
        from sv3d_tpu.training.checkpoint import load_state_from_checkpoint

        fresh = trainer._put_state(trainer.build_state(jax.random.PRNGKey(999)))
        restored = load_state_from_checkpoint(
            fresh, Path(args.cycle_restore_dir) / "last"
        )
        cycle["restored_step"] = int(restored.step)
        restored = trainer._put_state(restored)
        cycle_losses = []
        for _ in range(2):
            batch = next(it)
            restored, metrics = trainer.train_step(
                restored, trainer._put(batch), trainer._next_rng()
            )
            cycle_losses.append(float(metrics["train_ce_loss"]))
        trainer.ckpt.save(restored, metric=cycle_losses[-1])
        cycle["cycle_losses"] = cycle_losses
        cycle["cycle_step"] = int(restored.step)
        state = restored

    # state is fully replicated -> every process can read it locally;
    # fingerprint = per-leaf float64 sums of params + final step
    leaves = jax.tree.leaves(jax.tree.map(lambda x: np.asarray(x), state.params))
    checksum = [float(np.asarray(l, np.float64).sum()) for l in leaves]
    out = {
        "pid": args.pid,
        "step": int(state.step),
        "losses": losses,
        "checksum": checksum,
        "process_count": jax.process_count(),
        **cycle,
    }
    Path(args.out).write_text(json.dumps(out))
    print(f"[worker {args.pid}] done: step={out['step']} losses={losses}", flush=True)


if __name__ == "__main__":
    main()

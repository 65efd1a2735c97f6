"""Checkpoint save/restore (orbax) + UNet-only warm start.

Mirrors the reference's checkpointing behavior (SURVEY.md §5): top-k + last
checkpoints monitored on a validation metric, resume support, and the partial
warm start that loads only unet.* weights from a depth-regressor checkpoint
(reference trainer/trainer_scene_net.py:204-212).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Saves {params, batch_stats, opt_state, step} trees; keeps the best k by
    a monitored metric plus 'last' (reference ModelCheckpoint(save_top_k=2,
    save_last=True, monitor='val_ce_loss'), trainer_scene_net.py:217)."""

    def __init__(
        self,
        directory: str | Path,
        top_k: int = 2,
        keep_last: bool = True,
        enabled: bool = True,
        primary: bool = True,
        mode: str = "min",
        monitor: str = "",
    ):
        """enabled=False makes save() a fully inert no-op.

        primary=False is the multi-host mode for non-main processes: they
        PARTICIPATE in every orbax save (ocp.Checkpointer.save runs global
        sync barriers when jax.process_count() > 1 — a process that skipped
        the call would deadlock the primary) but do none of the filesystem
        bookkeeping (mkdir, manifest, top-k pruning).  restore stays
        available on every process."""
        self.directory = Path(directory)
        self.enabled = enabled
        self.primary = primary
        if enabled and primary:
            self.directory.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.keep_last = keep_last
        # mode="min" ranks lower-is-better metrics (losses); "max" ranks
        # higher-is-better ones (e.g. val_point_iou).  The manifest's scores
        # list is always written best-first, so readers never need the mode.
        assert mode in ("min", "max"), mode
        self.mode = mode
        # provenance: the metric name behind the scores list, written into
        # the manifest so artifacts record WHICH monitor ranked them (the
        # r4 32-scene QUALITY artifact couldn't answer that question)
        self.monitor = monitor
        self._ckpt = ocp.PyTreeCheckpointer()
        self._scores: list = []  # (metric, path)
        if enabled and primary:
            self._load_manifest()

    def _load_manifest(self):
        """Restore top-k state from a previous run's manifest so best-k
        tracking survives a resume (the reference's PL ModelCheckpoint keeps
        its best_k_models across restarts).  Stale step_* dirs that dropped
        out of the manifest (or predate it) are pruned."""
        manifest = self.directory / "manifest.json"
        if not manifest.exists():
            return
        try:
            data = json.loads(manifest.read_text())
        except (json.JSONDecodeError, OSError):
            return
        self._scores = [
            (float(m), str(p))
            for m, p in data.get("scores", [])
            if Path(p).exists()
        ]
        self._scores.sort(key=self._rank_key)
        keep = {Path(p).name for _, p in self._scores}
        for d in self.directory.glob("step_*"):
            if d.is_dir() and d.name not in keep:
                shutil.rmtree(d, ignore_errors=True)

    def _rank_key(self, entry):
        m = entry[0]
        return m if self.mode == "min" else -m

    def _save_tree(self, path: Path, tree):
        # primary prunes any stale dir BEFORE entering orbax's save (whose
        # initial sync barrier keeps non-primary processes from racing it)
        if self.primary and path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path.absolute(), _tree_to_numpy(tree))

    def save(self, state, metric: Optional[float] = None, step: Optional[int] = None):
        if not self.enabled:
            return
        step = int(state.step) if step is None else step
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": step,
        }
        if self.keep_last:
            self._save_tree(self.directory / "last", tree)
        if metric is not None and self.top_k != 0:
            path = self.directory / f"step_{step}"
            self._save_tree(path, tree)
            if not self.primary:
                return
            # re-saving the same step (epoch-end save followed by end-of-fit
            # save) must replace its score entry, not duplicate it
            self._scores = [s for s in self._scores if s[1] != str(path)]
            self._scores.append((float(metric), str(path)))
            self._scores.sort(key=self._rank_key)
            if self.top_k > 0:
                while len(self._scores) > self.top_k:
                    _, worst = self._scores.pop()
                    shutil.rmtree(worst, ignore_errors=True)
        if not self.primary:
            return
        (self.directory / "manifest.json").write_text(
            json.dumps(
                {
                    "scores": self._scores,
                    "last_step": step,
                    "monitor": self.monitor,
                    "mode": self.mode,
                }
            )
        )

    def restore(self, name: str = "last") -> dict:
        return self._ckpt.restore((self.directory / name).absolute())

    def best_path(self) -> Optional[str]:
        return self._scores[0][1] if self._scores else None


def restore_tree(path: str | Path) -> dict:
    return ocp.PyTreeCheckpointer().restore(Path(path).absolute())


def _restore_like(template, restored):
    """Rebuild `restored` (whose containers orbax may have turned into lists/
    dicts) with the exact pytree structure and dtypes of `template`."""
    leaves_t, treedef = jax.tree.flatten(template)
    leaves_r = jax.tree.leaves(restored)
    if len(leaves_t) != len(leaves_r):
        raise ValueError(
            f"checkpoint structure mismatch: {len(leaves_r)} leaves vs "
            f"{len(leaves_t)} expected — the model architecture flags "
            "(net_res / skip_unet / resize_input / W) must match the ones "
            "the checkpoint was trained with"
        )
    coerced = [
        np.asarray(r).astype(t.dtype) if hasattr(t, "dtype") else r
        for t, r in zip(leaves_t, leaves_r)
    ]
    return jax.tree.unflatten(treedef, coerced)


def load_state_from_checkpoint(state, path: str | Path):
    """Full resume: restore params/batch_stats/opt_state/step into `state`."""
    tree = restore_tree(path)
    return state.replace(
        params=_restore_like(state.params, tree["params"]),
        batch_stats=_restore_like(state.batch_stats, tree["batch_stats"]),
        opt_state=_restore_like(state.opt_state, tree["opt_state"]),
        step=int(tree.get("step", 0)),
    )


def load_pretrained_unet(state, path: str | Path):
    """Warm start: overwrite ONLY the unet parameter/batch-stat subtrees from a
    checkpoint (any trainer's), leaving project/ifnet untouched
    (reference trainer/trainer_scene_net.py:204-212)."""
    tree = restore_tree(path)
    # a scene-net checkpoint nests the unet under 'unet'; a depth-regressor
    # checkpoint (training/trainer_unet.py) IS the unet at top level
    src_params = tree["params"].get("unet", tree["params"])
    src_stats = (tree.get("batch_stats") or {}).get("unet", tree.get("batch_stats") or {})
    params = dict(state.params)
    stats = dict(state.batch_stats)
    params["unet"] = _restore_like(state.params["unet"], src_params)
    if src_stats:
        stats["unet"] = _restore_like(state.batch_stats["unet"], src_stats)
    return state.replace(params=params, batch_stats=stats)

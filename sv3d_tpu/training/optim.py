"""Optimizer construction with per-module learning-rate groups.

The end-to-end trainer gives the projection module's learnable sigma a 10x
learning rate (reference trainer/trainer_scene_net.py:45-55); implemented here
with optax.multi_transform over top-level parameter subtrees.
"""

from __future__ import annotations

import optax


def build_optimizer(lr: float, params, project_lr_scale: float = 10.0):
    """Adam with torch-default hyperparameters; the 'project' subtree (if any)
    gets project_lr_scale * lr."""
    top_keys = set(params.keys())
    if "project" not in top_keys:
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    def label_fn(p):
        return {k: ("project" if k == "project" else "base") for k in p.keys()}

    return optax.multi_transform(
        {
            "base": optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
            "project": optax.adam(lr * project_lr_scale, b1=0.9, b2=0.999, eps=1e-8),
        },
        label_fn,
    )

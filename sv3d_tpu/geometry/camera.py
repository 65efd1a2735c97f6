"""Camera intrinsics and depth conversions.

Unifies the duplicated math of the reference (model/projection.py:200-218 and
data_processing/distance_to_depth.py:6-26,105-114) into one canonical module.
Host-side setup is numpy; the batched per-pixel transforms are pure jnp and
jittable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Intrinsics:
    """Pinhole camera intrinsics (4x4 homogeneous matrix)."""

    matrix: tuple  # 4x4 nested tuple, hashable so it can be a static jit arg

    @property
    def np(self) -> np.ndarray:
        return np.asarray(self.matrix, dtype=np.float32)

    @property
    def focal_length(self) -> float:
        return float(self.matrix[0][0])

    @property
    def cx(self) -> float:
        return float(self.matrix[0][2])

    @property
    def cy(self) -> float:
        return float(self.matrix[1][2])

    @property
    def inverse(self) -> np.ndarray:
        return np.linalg.inv(self.np)


def parse_intrinsics(text: str) -> Intrinsics:
    """Parse the reference's intrinsic.txt format: a printed 4x4 matrix like
    ``[[277.128, 0., 159.5, 0.], [0., 277.128, 119.5, 0.], ...]``.

    The reference parses this with brittle string slicing
    (data_processing/distance_to_depth.py:105-114); here we extract all floats
    and reshape.
    """
    values = [float(v) for v in re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", text)]
    if len(values) < 16:
        raise ValueError(f"expected >=16 numbers in intrinsics text, got {len(values)}")
    m = np.asarray(values[:16], dtype=np.float64).reshape(4, 4)
    # Rebuild the canonical intrinsic layout used throughout the reference:
    # [[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]].
    f, cx, cy = m[0, 0], m[0, 2], m[1, 2]
    mat = ((f, 0.0, cx, 0.0), (0.0, f, cy, 0.0), (0.0, 0.0, 1.0, 0.0), (0.0, 0.0, 0.0, 1.0))
    return Intrinsics(matrix=mat)


def read_intrinsics(path: str | Path) -> Intrinsics:
    return parse_intrinsics(Path(path).read_text())


def distance_to_depth(distance: jnp.ndarray, focal_length: float) -> jnp.ndarray:
    """Convert a per-pixel *euclidean distance* map to a *planar depth* map.

    depth[r, c] = dist[r, c] / sqrt(((r - H//2)^2 + (c - W//2)^2) / f^2 + 1)

    Matches reference data_processing/distance_to_depth.py:6-26 exactly,
    including its use of integer half-resolution centers (H//2, W//2) rather
    than the intrinsic principal point.  Works on (H, W) or batched (B, H, W).
    """
    h, w = distance.shape[-2], distance.shape[-1]
    rs = jnp.arange(h, dtype=distance.dtype) - (h // 2)
    cs = jnp.arange(w, dtype=distance.dtype) - (w // 2)
    rr = rs[:, None] ** 2 + cs[None, :] ** 2
    return jnp.sqrt(distance**2 / (rr / (focal_length**2) + 1.0))


def depth_to_camera(depth: jnp.ndarray, f: float, cx: float, cy: float) -> jnp.ndarray:
    """Back-project a depth map into camera-space points.

    X = (u - cx) * d / f,  Y = -(v - cy) * d / f,  Z = d
    with u over columns and v over rows (reference model/projection.py:200-206).

    depth: (..., H, W) -> returns (..., H*W, 3) camera-space points.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (u - cx) * depth / f
    y = -((v - cy) * depth) / f
    pts = jnp.stack([x, y, depth], axis=-1)
    return pts.reshape(*depth.shape[:-2], h * w, 3)

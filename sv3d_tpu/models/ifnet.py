"""IF-Net implicit occupancy network (TPU-native flax rebuild of reference
model/ifnet.py).

Two architecture variants, selected by IFNetConfig.net_res (reference
model/ifnet.py:16-29):
  * 128-res: 6 feature levels (input + conv stages of 16/32/64/128/128
    channels with maxpool-2 between stages), displacement 0.0722,
    align_corners=False sampling, MLP 2583 -> 256 -> 256 -> 256 -> 1.
  * 32-res: 4 feature levels (input + 64/128/128), displacement 0.035,
    align_corners=True sampling, MLP 2247 -> 512 -> 256 -> 256 -> 1.

TPU-native design decisions:
  * Convs run in NDHWC; query features flow CHANNEL-MAJOR (B, C, N) so the
    query-point dimension N stays on the 128-lane axis (see
    sv3d_tpu/ops/grid_sample.py for why (B, N, C) layouts OOM on TPU).
  * The per-point MLP is a stack of 1x1 "point convs" — einsum('hf,bfn->bhn')
    MXU contractions over the feature axis, exactly the shape the reference's
    Conv1d(k=1) decoder has (model/ifnet.py:19-35).
  * encode() and query() are SEPARATE.  The reference recomputes the whole
    conv pyramid for every point chunk during dense-grid inference (reference
    model/ifnet.py:222-225); here the pyramid is encoded once and only the
    query sweeps over point tiles.
  * TWO query paths:
      query()          — arbitrary points, gather-based (training supervision
                         points; a few thousand per step).
      query_lattice()  — dense regular lattices (inference sweeps); trilinear
                         interpolation of a lattice is a separable resize, so
                         each level is interpolated with three small banded
                         matmuls (sv3d_tpu/ops/lattice.py) — no gathers, pure
                         MXU.  XLA's per-point gathers measure ~0.5M pts/s on
                         v5e; the lattice path replaces them entirely.
  * Query points use the framework convention: (B, N, 3) in [-0.5, 0.5] with
    points[..., i] addressing grid axis i.  No axis swap exists (the reference
    needs one at model/ifnet.py:94-95 purely for torch's reversed grid_sample
    indexing).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sv3d_tpu.config import IFNetConfig
from sv3d_tpu.ops.grid_sample import (
    Pyramid,
    displacement_axes,
    flatten_grid,
    sample_trilinear_flat,
)
from sv3d_tpu.ops.lattice import (
    axis_matrices,
    axis_taps_triple,
    displaced_resizes_cm,
    displaced_resizes_take,
)


class _ConvBlock(nn.Module):
    """Conv3d(k3 p1) + ReLU pair(s) + BatchNorm, one pyramid stage."""

    features: Sequence[int]
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        for f in self.features:
            x = nn.relu(
                nn.Conv(f, (3, 3, 3), padding=((1, 1),) * 3, dtype=self.dtype)(x)
            )
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return x


_point_conv_init = nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal", in_axis=1, out_axis=0
)


def _query_fused_impl(
    cfg: IFNetConfig, kernels, biases, levels: Pyramid, points: jnp.ndarray,
    interpret: bool | None, tile: int | None, bands: int | None = None,
    col_shift: bool = False,
) -> jnp.ndarray:
    """Single-device body of IFNet.query_fused (standalone so it can run as
    the per-shard function of a shard_map — shard_map wants explicit array
    arguments, not flax method closures).

    bands (fine axis-1 columns per bucket band): opt into the 2-D bucketed
    kernel, which cuts issued matmul FLOPs ~2x at full dims (ARCHITECTURE.md
    §9).  INFERENCE-ONLY — the banded level kernel has no VJP."""
    from sv3d_tpu.ops.pallas.point_query import (
        bucket_queries,
        bucket_queries_2d,
        default_interpret,
        level_fc0_banded,
    )
    from sv3d_tpu.ops.pallas.point_query_bwd import level_features_diff

    if interpret is None:
        interpret = default_interpret()
    b, n, _ = points.shape
    if tile is None:
        tile = 128  # measured flat vs 256 at 65k pts; 512 exceeds VMEM
    p0, p1, p2 = (2.0 * points[..., i] for i in range(3))
    g0_fine = levels.dims[0][0]
    g1_fine = levels.dims[0][1]
    # fc0 as per-level partial contractions: the concatenated feature tensor
    # (B, P, 7*sumC) is never materialized — at 262k queries it was ~2.7 GB
    # of f32 HBM traffic for the write, the concat copy, and the bf16 cast,
    # all of which the profile showed dominating the non-kernel time.  w0's
    # columns are displacement-major (d*sumC + c_global); each level's
    # (H, 7*C_l) block is sliced in the kernel's
    # displacement-major-within-level order (banded path: the block is
    # passed INTO the kernel, which emits the (B, P, H) fc0 partial and the
    # features never touch HBM at all).
    chans = cfg.feature_channels
    sum_c = sum(chans)
    w0 = kernels[0]

    def w0_level(li, c):
        cg = sum(chans[:li])
        cols = np.asarray(
            [d * sum_c + cg + cc for d in range(7) for cc in range(c)],
            np.int32,
        )
        return w0[:, jnp.asarray(cols)].astype(jnp.bfloat16)

    h = biases[0][None, None, :].astype(jnp.float32)
    if bands:
        q0, q1, q2, pos, tile_slab, tile_band, tile_used = bucket_queries_2d(
            p0, p1, p2, g0_fine, g1_fine, cfg.align_corners, bands, tile=tile
        )
        for li, ((flat, dims), c) in enumerate(
            zip(levels, cfg.feature_channels)
        ):
            vol = jnp.moveaxis(flat.reshape(b, c, *dims), 1, -1)
            h = h + level_fc0_banded(
                vol, w0_level(li, c).T, q0, q1, q2, tile_slab, tile_band,
                tile_used, dims, g0_fine, g1_fine, cfg.align_corners,
                cfg.displacement, bands, tile, interpret, col_shift,
            ).astype(jnp.float32)
    else:
        q0, q1, q2, pos, tile_slab, tile_used = bucket_queries(
            p0, p1, p2, g0_fine, cfg.align_corners, tile=tile
        )
        for li, ((flat, dims), c) in enumerate(
            zip(levels, cfg.feature_channels)
        ):
            vol = jnp.moveaxis(flat.reshape(b, c, *dims), 1, -1)
            feat = level_features_diff(
                vol, q0, q1, q2, tile_slab, tile_used, dims, g0_fine,
                cfg.align_corners, cfg.displacement, tile, interpret,
            )
            h = h + jnp.einsum(
                "hf,bpf->bph", w0_level(li, c),
                feat.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    h = nn.relu(h)
    for kernel, bias in zip(kernels[1:], biases[1:]):
        h = jnp.einsum(
            "hf,bpf->bph", kernel.astype(jnp.bfloat16),
            h.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        ) + bias[None, None, :]
        if kernel.shape[0] > 1:
            h = nn.relu(h)
    logits_padded = h[..., 0]  # (B, P)
    return jnp.take_along_axis(logits_padded, pos, axis=1)  # (B, N)


class IFNet(nn.Module):
    """Multi-scale implicit occupancy network.

    __call__(grid, points) -> (B, N) occupancy logits, or use
    encode(grid) -> pyramid / query(pyramid, points) separately.
    grid: (B, D0, D1, D2, 1) channels-last occupancy volume.
    points: (B, N, 3) in [-0.5, 0.5].

    mesh: optional jax.sharding.Mesh with ("dp", "sp") axes.  When set, the
    fused Pallas query path runs under shard_map (batch over dp, points over
    sp) so the kernel composes with GSPMD training/inference instead of being
    silently replicated — see query_fused.
    """

    config: IFNetConfig = IFNetConfig()
    dtype: object = None  # e.g. jnp.bfloat16 for mixed precision (params stay f32)
    mesh: object = None  # jax.sharding.Mesh (static, hashable)

    def setup(self):
        cfg = self.config
        dt = self.dtype
        # remat each conv stage: the full-res low-channel activations live in
        # lane-padded layouts on TPU (C=16 pads 8x to the 128-lane tile) and
        # holding them for the backward pass OOM'd B=8 full-scale train steps;
        # recomputing them is far cheaper than 6 GB of padded HBM residency
        block = nn.remat(_ConvBlock, static_argnums=(2,))
        if cfg.net_res == 128:
            # reference model/ifnet.py:126-142
            self.stages = [
                block([16], dt),
                block([32, 32], dt),
                block([64, 64], dt),
                block([128, 128], dt),
                block([128, 128], dt),
            ]
            hidden = (cfg.hidden_dim, cfg.hidden_dim, cfg.hidden_dim)
        elif cfg.net_res == 32:
            # reference model/ifnet.py:69-80
            self.stages = [
                block([32, 64], dt),
                block([128, 128], dt),
                block([128, 128], dt),
            ]
            hidden = (cfg.hidden_dim * 2, cfg.hidden_dim, cfg.hidden_dim)
        else:
            raise ValueError(f"net_res must be 128 or 32, got {cfg.net_res}")
        # The decoder MLP is held as raw params (not submodules) so both the
        # XLA einsum path and the fused Pallas kernel can consume them.
        # fc0's feature order is DISPLACEMENT-MAJOR: index = d * sum(C) + c
        # (d = displacement copy, c = global channel across levels).  Both
        # query paths then build the feature tensor from contiguous concats
        # only — no interleaving reshapes, which on TPU force layout copies
        # that dominate the matmul.  (The reference's Conv1d weight order is
        # channel-major; irrelevant here since training is from scratch.)
        sizes = (self.feature_size,) + tuple(hidden) + (1,)
        names = ("fc0", "fc1", "fc2", "fc_out")
        kernels, biases = [], []
        for name, f_in, f_out in zip(names, sizes[:-1], sizes[1:]):
            kernels.append(
                self.param(f"{name}_kernel", _point_conv_init, (f_out, f_in))
            )
            biases.append(
                self.param(f"{name}_bias", nn.initializers.zeros_init(), (f_out,))
            )
        self.mlp_kernels = kernels
        self.mlp_biases = biases

    @property
    def fc0_kernel(self):
        return self.mlp_kernels[0]

    @property
    def fc0_bias(self):
        return self.mlp_biases[0]

    def encode(self, grid: jnp.ndarray, train: bool = True) -> Pyramid:
        """Run the conv pyramid once and flatten each level into the
        channel-major gather layout.  Returns a Pyramid (level 0 is the raw
        input grid); its dims are static so it can cross jit boundaries."""
        levels = [flatten_grid(grid)]
        x = grid
        for i, stage in enumerate(self.stages):
            x = stage(x, train)
            flat, dims = flatten_grid(x)
            levels.append((flat, dims))
            if i < len(self.stages) - 1:
                # pool from the CHANNEL-MAJOR copy, not the NDHWC activation:
                # this leaves the (..., C) tensor a single consumer, so its
                # backward produces ONE lane-padded cotangent instead of the
                # padded select_and_scatter + transpose pair (6.2 GB each at
                # B=8 full scale — the difference between fitting and OOM)
                b, c = flat.shape[:2]
                vol = flat.reshape(b, c, *dims)
                if min(dims) == 1:
                    # floor pooling would produce an EMPTY level (1 -> 0) at
                    # degenerate test scales; pad size-1 dims with -inf so
                    # every pooled dim stays >= 1 (identity at real scales,
                    # where the deepest level is 8x6x7 — reference
                    # model/ifnet.py never hits this)
                    vol = jnp.pad(
                        vol,
                        ((0, 0), (0, 0))
                        + tuple((0, int(d == 1)) for d in dims),
                        constant_values=-jnp.inf,
                    )
                pooled = jax.lax.reduce_window(
                    vol, -jnp.inf, jax.lax.max,
                    (1, 1, 2, 2, 2), (1, 1, 2, 2, 2), "VALID",
                )
                x = jnp.moveaxis(pooled, 1, -1)
        return Pyramid([f for f, _ in levels], [d for _, d in levels])

    def _mlp_tail(self, h: jnp.ndarray) -> jnp.ndarray:
        """Hidden layers after fc0: (B, H, N) -> (B, N) logits."""
        h = nn.relu(h)
        for kernel, bias in zip(self.mlp_kernels[1:], self.mlp_biases[1:]):
            h = jnp.einsum("hf,bfn->bhn", kernel, h) + bias[None, :, None]
            if kernel.shape[0] > 1:
                h = nn.relu(h)
        return h[:, 0, :]

    def query(self, levels: Pyramid, points: jnp.ndarray) -> jnp.ndarray:
        """Evaluate occupancy logits at ARBITRARY query points (gather path)."""
        cfg = self.config
        b, n, _ = points.shape
        # [-0.5, 0.5] -> [-1, 1] per-axis coords, then 7 displaced copies
        p_axes = (2.0 * points[..., 0], 2.0 * points[..., 1], 2.0 * points[..., 2])
        pd = displacement_axes(p_axes, cfg.displacement)  # three (B, 7N)

        feats = [
            sample_trilinear_flat(flat, dims, pd, align_corners=cfg.align_corners)
            for flat, dims in levels
        ]  # each (B, C_l, 7N)
        f = jnp.concatenate(feats, axis=1)  # (B, sumC, 7N)
        # displacement-major feature order (see setup): (B, sumC, 7, N) ->
        # (B, 7, sumC, N) -> (B, 7*sumC, N); index = d*sumC + c
        sum_c = f.shape[1]
        f = jnp.swapaxes(f.reshape(b, sum_c, 7, n), 1, 2).reshape(b, 7 * sum_c, n)

        h = jnp.einsum("hf,bfn->bhn", self.fc0_kernel, f) + self.fc0_bias[None, :, None]
        return self._mlp_tail(h)

    def query_fused(
        self, levels: Pyramid, points: jnp.ndarray, interpret: bool | None = None,
        tile: int | None = None, mesh: object = None, bands: int | None = None,
        col_shift: bool = False,
    ) -> jnp.ndarray:
        """MXU-fused arbitrary-point query (Pallas; inference fast path).

        Same semantics as query() but routed through the bucketed slab-matmul
        kernel (sv3d_tpu/ops/pallas/point_query.py): queries are counting-
        bucketed by axis-0 slab, each pyramid level is interpolated with two
        MXU contractions per displacement copy, and the decoder MLP runs on
        the padded layout with fc0's columns permuted from displacement-major
        to the kernel's level-major feature order.  Compute is bfloat16 with
        float32 accumulation (~1e-2 relative feature error vs query()).

        mesh routing (None = use self.mesh; "local" = force single-device):
        pallas_call cannot be partitioned by GSPMD — under a plain jit over a
        mesh it silently replicates.  With a ("dp", "sp") mesh the body runs
        under shard_map instead: batch over dp, points over sp, pyramid and
        params replicated along sp.  Each shard buckets and interpolates its
        own point slice; no collectives in the forward, psums of the param/
        pyramid cotangents in the backward (shard_map transpose).  Falls back
        to the single-device body when shapes don't divide the mesh (e.g.
        B=1 init traces).
        """
        if mesh is None:
            mesh = self.mesh
        kernels = tuple(self.mlp_kernels)
        biases = tuple(self.mlp_biases)
        cfg = self.config
        # f32 interface: a bf16 pyramid (precision=16 encoder convs) is cast
        # back here so the kernel's custom VJP sees f32 operands/cotangents;
        # the cast's transpose returns the cotangent to bf16 for the conv
        # backward.  The kernel re-casts to bf16 internally for compute, so
        # this costs one elementwise pass, not accuracy.
        if any(f.dtype != jnp.float32 for f in levels.flats):
            levels = Pyramid(
                [f.astype(jnp.float32) for f in levels.flats], levels.dims
            )
        points = points.astype(jnp.float32)
        b, n, _ = points.shape
        if mesh is not None and mesh != "local":
            dp, sp = mesh.shape["dp"], mesh.shape["sp"]
            if dp * sp > 1 and b % dp == 0 and n % sp == 0:
                from jax.sharding import PartitionSpec as P

                fn = jax.shard_map(
                    lambda k, bi, lv, p: _query_fused_impl(
                        cfg, k, bi, lv, p, interpret, tile, bands, col_shift
                    ),
                    mesh=mesh,
                    in_specs=(P(), P(), P("dp"), P("dp", "sp")),
                    out_specs=P("dp", "sp"),
                    check_vma=False,  # pallas out_shapes carry no vma info
                )
                return fn(kernels, biases, levels, points)
        return _query_fused_impl(
            cfg, kernels, biases, levels, points, interpret, tile, bands,
            col_shift,
        )

    def _slab_axis0(
        self, flat, dims, ch8, r, r0p, slab_rows, row_offset,
        compute_dtype, axis0_window,
    ):
        """Channel-pad one pyramid level and slice its axis-0 input-row
        window + interpolation matrices for the current slab (see the
        axis0_window note in query_lattice).  Returns (vol, mats0) with vol
        (B, ch8, win, g1, g2) and mats0 three (slab_rows, win) matrices."""
        cfg = self.config
        b, c, _ = flat.shape
        vol = flat.reshape(b, c, *dims).astype(compute_dtype)
        if ch8 != c:
            vol = jnp.pad(vol, ((0, 0), (0, ch8 - c), (0, 0), (0, 0), (0, 0)))
            c = ch8
        # per-axis interpolation matrices (numpy constants)
        m0c_full, m0m_full, m0p_full = axis_matrices(
            r[0], dims[0], cfg.align_corners, cfg.displacement
        )
        pad0 = ((0, r0p - r[0]), (0, 0))
        mats0_padded = tuple(
            jnp.asarray(np.pad(m, pad0), dtype=compute_dtype)
            for m in (m0c_full, m0m_full, m0p_full)
        )

        # static input-row window for this level (see query_lattice docstring)
        g0 = dims[0]
        a_aff = 0.5 * (g0 - 1) if cfg.align_corners else 0.5 * g0
        b_aff = 0.5 * (g0 - 1)
        step = 2.0 / max(r[0] - 1, 1)  # [-1, 1] units per output row
        disp_rows = cfg.displacement * a_aff
        span = a_aff * step * max(slab_rows - 1, 0)
        win = int(np.ceil(span + 2.0 * disp_rows + 4.0))
        if axis0_window and win < g0:
            # first input row any displaced hat of this slab can touch,
            # minus margin; row_offset may be traced
            lo_f = a_aff * (step * row_offset - 1.0) + b_aff - (disp_rows + 1.5)
            lo = jnp.clip(jnp.floor(lo_f).astype(jnp.int32), 0, g0 - win)
            vol = jax.lax.dynamic_slice(
                vol, (0, 0, lo, 0, 0), (b, c, win, dims[1], dims[2])
            )
            mats0 = tuple(
                jax.lax.dynamic_slice(m, (row_offset, lo), (slab_rows, win))
                for m in mats0_padded
            )
        else:
            mats0 = tuple(
                jax.lax.dynamic_slice(m, (row_offset, 0), (slab_rows, g0))
                for m in mats0_padded
            )
        return vol, mats0

    def _w0_block(self, li: int, compute_dtype) -> jnp.ndarray:
        """fc0 columns for one pyramid level as a (H, 7*C8_l) block.

        fc0's stored feature order is displacement-major over GLOBAL channels
        (d * sumC + c_global, see setup); the fused sweep kernel wants
        per-level blocks, displacement-major over the level's 8-padded
        channels (d * C8_l + c), zero columns for the channel padding."""
        chans = list(self.config.feature_channels)
        c = chans[li]
        c8 = max(-(-c // 8) * 8, 8)
        sum_c = sum(chans)
        cg = sum(chans[:li])
        w = self.fc0_kernel
        cols = np.asarray(
            [d * sum_c + cg + cc for d in range(7) for cc in range(c)], np.int32
        )
        keep = np.asarray(
            [d * c8 + cc for d in range(7) for cc in range(c)], np.int32
        )
        blk = jnp.zeros((w.shape[0], 7 * c8), compute_dtype)
        return blk.at[:, jnp.asarray(keep)].set(
            w[:, jnp.asarray(cols)].astype(compute_dtype)
        )

    def _query_lattice_fused(
        self, levels: Pyramid, r, r0p, slab_rows, row_offset,
        compute_dtype, axis0_window, interpret: bool, ta: int = 8,
    ) -> jnp.ndarray:
        """Fused-tail dense sweep: per level build only the axis-0/1 resized
        partial products (plus, for deep levels, their fc0 pre-contraction)
        and hand them to the fused Pallas kernel
        (sv3d_tpu/ops/pallas/sweep.py) that finishes axis-2 + the MLP with
        all intermediates in VMEM.  Returns (1, slab_rows, r1, r2) logits.

        Replaces the f-tensor materialization that profiled at ~300 ms of
        the 390 ms full-scale sweep (see sweep.py docstring)."""
        from sv3d_tpu.ops.lattice import interp_matrix, lattice_coords
        from sv3d_tpu.ops.pallas.sweep import (
            fused_sweep_tail,
            round8,
            sweep_level_is_shallow,
        )

        cfg = self.config
        h_dim = self.fc0_kernel.shape[0]
        a_rows = slab_rows * r[1]
        a_pad = -(-a_rows // ta) * ta
        r2p = -(-r[2] // 128) * 128

        v01_list, m2_list, specs, w0sh_blocks = [], [], [], []
        for li, (flat, dims) in enumerate(levels):
            c = cfg.feature_channels[li]
            c8 = max(-(-c // 8) * 8, 8)
            g2 = dims[2]
            g2p = round8(g2)
            shallow = sweep_level_is_shallow(c8, g2, r[2], h_dim)

            vol, mats0 = self._slab_axis0(
                flat, dims, c8, r, r0p, slab_rows, row_offset,
                compute_dtype, axis0_window,
            )
            if shallow and g2p != g2:
                # zero k-columns so the in-kernel dot rhs rows line up with
                # the zero-padded m2 rows (sublane-aligned slices)
                vol = jnp.pad(
                    vol, ((0, 0),) * 4 + ((0, g2p - g2),)
                )
            mats1 = tuple(
                jnp.asarray(m, dtype=compute_dtype)
                for m in axis_matrices(
                    r[1], dims[1], cfg.align_corners, cfg.displacement
                )
            )
            c0, m0, p0 = mats0
            c1, m1, p1 = mats1
            ax0 = lambda m, v: jnp.einsum("ai,bcijk->bcajk", m, v)
            v0c, v0m, v0p = ax0(c0, vol), ax0(m0, vol), ax0(p0, vol)

            # axis-2 resize matrices, transposed + variant-stacked:
            # m2all[v*g2p + k, y] = M2_v[y, k]
            x2 = lattice_coords(r[2])
            m2all = np.zeros((3 * g2p, r2p), np.float32)
            for vi, dx in enumerate((0.0, -cfg.displacement, cfg.displacement)):
                m2all[vi * g2p : vi * g2p + g2, : r[2]] = interp_matrix(
                    x2 + dx, g2, cfg.align_corners
                ).T
            m2_list.append(jnp.asarray(m2all, compute_dtype))

            if shallow:
                # (B, slab, r1, C, g2p) per branch; stack branches on the
                # (sublane-aligned) channel dim, merge (slab, r1) -> A
                ax1s = lambda m, v: jnp.einsum("xj,bcajk->baxck", m, v)
                v5 = jnp.concatenate(
                    [
                        ax1s(c1, v0c), ax1s(c1, v0m), ax1s(c1, v0p),
                        ax1s(m1, v0c), ax1s(p1, v0c),
                    ],
                    axis=3,
                )  # (B, slab, r1, 5C8, g2p)
                v5 = v5.reshape(a_rows, 5 * c8, g2p)
                if a_pad != a_rows:
                    v5 = jnp.pad(v5, ((0, a_pad - a_rows), (0, 0), (0, 0)))
                v01_list.append(v5.astype(compute_dtype))
                w0sh_blocks.append(self._w0_block(li, compute_dtype))
            else:
                # fc0 pre-contraction at coarse g2: branch-stack on the
                # channel dim, contract with the level's fc0 block, variant-
                # concat on the (8-padded) k dim -> (A, 3*g2p, H)
                ax1d = lambda m, v: jnp.einsum("xj,bcajk->bckax", m, v)
                v5 = jnp.concatenate(
                    [
                        ax1d(c1, v0c), ax1d(c1, v0m), ax1d(c1, v0p),
                        ax1d(m1, v0c), ax1d(p1, v0c),
                    ],
                    axis=1,
                )  # (B, 5C8, g2, slab, r1)
                v5 = v5.reshape(1, 5 * c8, g2, a_rows)
                w0d = self._w0_block(li, compute_dtype)
                gc = jnp.einsum(
                    "hc,bcka->bakh", w0d[:, : 5 * c8], v5,
                    preferred_element_type=jnp.float32,
                )
                gm = jnp.einsum(
                    "hc,bcka->bakh", w0d[:, 5 * c8 : 6 * c8], v5[:, :c8],
                    preferred_element_type=jnp.float32,
                )
                gp = jnp.einsum(
                    "hc,bcka->bakh", w0d[:, 6 * c8 : 7 * c8], v5[:, :c8],
                    preferred_element_type=jnp.float32,
                )
                kpad = ((0, 0), (0, 0), (0, g2p - g2), (0, 0))
                gcat = jnp.concatenate(
                    [jnp.pad(g, kpad) for g in (gc, gm, gp)], axis=2
                )  # (B, A, 3*g2p, H)
                gcat = gcat.reshape(a_rows, 3 * g2p, h_dim)
                if a_pad != a_rows:
                    gcat = jnp.pad(gcat, ((0, a_pad - a_rows), (0, 0), (0, 0)))
                v01_list.append(gcat.astype(compute_dtype))
            specs.append((c8, g2p, shallow))

        w0sh = (
            jnp.concatenate(w0sh_blocks, axis=1) if w0sh_blocks else None
        )
        k, bia = self.mlp_kernels, self.mlp_biases
        out = fused_sweep_tail(
            tuple(v01_list), tuple(m2_list), w0sh,
            bia[0], k[1], bia[1], k[2], bia[2], k[3], bia[3],
            specs=tuple(specs), ta=ta, r2p=r2p, interpret=interpret,
            dtype=compute_dtype,
        )
        return out[:a_rows, : r[2]].reshape(1, slab_rows, r[1], r[2])

    def query_lattice(
        self,
        levels: Pyramid,
        resolution,
        res_increase: int = 1,
        slab_rows: int = 4,
        row_offset=0,
        compute_dtype=jnp.bfloat16,
        use_pallas_mlp: bool | None = None,
        stop_stage: str | None = None,
        axis0_window: bool = True,
        resize_mode: str = "matmul",
        fused_tail: bool | None = None,
    ) -> jnp.ndarray:
        """Evaluate occupancy logits on a slab of the DENSE LATTICE over
        [-0.5, 0.5]^3 (rows [row_offset, row_offset+slab_rows) of lattice
        axis 0) — the separable-resize fast path for dense-grid inference.

        Returns (B, slab_rows, r1, r2) logits where r_i = resolution[i] *
        res_increase.  row_offset may be a traced scalar (one compilation
        serves every slab).

        Performance notes: resizes and fc0 run in compute_dtype (bf16 by
        default — the MXU accumulates in f32 regardless).  fc0's feature order
        is displacement-major (see setup), so the feature tensor is built from
        contiguous concats only (levels within a displacement, then
        displacements) and the whole first layer is ONE layout-clean K=2583
        matmul; interleaved (c*7+d) orders force layout copies that measured
        8x slower.  Keep slab_rows small (2-4) so the concatenated feature
        tensor stays a few hundred MB.

        axis0_window exploits the bandedness of the axis-0 interpolation
        matrix: a slab's output rows only read a small static window of input
        rows (slab span + displacement shift + hat support), so the volume is
        dynamic-sliced to that window before the contraction instead of
        contracting densely over all of axis 0.  Without it every slab
        re-reads every level's FULL volume — profiled at 96% of the sweep
        time at full scale (scripts/profile_sweep.py: the resize stage alone
        ran at 17.7 Mpts/s while fc0 + the whole MLP added ~4%).  Dropped
        columns carry exactly-zero hat weights, so results are unchanged up
        to f32 summation order."""
        cfg = self.config
        r = tuple(int(x) * res_increase for x in resolution)
        r0p = -(-r[0] // slab_rows) * slab_rows  # padded row count
        n_slab = slab_rows * r[1] * r[2]

        # Fused-tail fast path (sv3d_tpu/ops/pallas/sweep.py): skip the f
        # tensor entirely.  Auto on TPU for the unbatched sweep; tests opt
        # in explicitly (interpreter mode off-TPU).
        if fused_tail is None:
            fused_tail = (
                jax.default_backend() == "tpu"
                and stop_stage is None
                and levels.flats[0].shape[0] == 1
                and all(min(d) >= 1 for d in levels.dims)
            )
        if fused_tail:
            from sv3d_tpu.ops.pallas.mlp import default_interpret

            return self._query_lattice_fused(
                levels, r, r0p, slab_rows, row_offset, compute_dtype,
                axis0_window, interpret=default_interpret(),
            )

        # Sublane-align the feature concat: pieces are stacked along the
        # (8-tiled) channel axis, and the C=1 raw-grid level at the front of
        # each displacement block puts EVERY later piece at an offset 1 mod 8
        # — profiled at 451 ms of a 790 ms full-scale sweep (the concat
        # degenerates into sublane-realignment copies).  Padding that level
        # to 8 zero channels aligns all pieces (all other C are multiples of
        # 8) and pads fc0 with matching zero columns — exact same logits.
        chans = list(cfg.feature_channels)
        chans8 = [max(-(-ch // 8) * 8, 8) for ch in chans]
        sum_c, sum_c8 = sum(chans), sum(chans8)
        if sum_c8 != sum_c:
            cols = []
            for d in range(7):
                off8 = 0
                for ch, ch8 in zip(chans, chans8):
                    cols.extend(d * sum_c8 + off8 + cc for cc in range(ch))
                    off8 += ch8
            w1 = (
                jnp.zeros((self.fc0_kernel.shape[0], 7 * sum_c8), compute_dtype)
                .at[:, jnp.asarray(np.asarray(cols, np.int32))]
                .set(self.fc0_kernel.astype(compute_dtype))
            )
        else:
            w1 = self.fc0_kernel.astype(compute_dtype)

        # feats[d][l]: (B, C8_l, n_slab) resized features per displacement/level
        feats = [[] for _ in range(7)]
        for (flat, dims), ch8 in zip(levels, chans8):
            vol, mats0 = self._slab_axis0(
                flat, dims, ch8, r, r0p, slab_rows, row_offset,
                compute_dtype, axis0_window,
            )
            b, c = vol.shape[:2]
            if resize_mode == "take":
                taps1 = axis_taps_triple(
                    r[1], dims[1], cfg.align_corners, cfg.displacement
                )
                taps2 = axis_taps_triple(
                    r[2], dims[2], cfg.align_corners, cfg.displacement
                )
                vols7 = displaced_resizes_take(vol, mats0, taps1, taps2)
            else:
                mats1 = tuple(
                    jnp.asarray(m, dtype=compute_dtype)
                    for m in axis_matrices(r[1], dims[1], cfg.align_corners, cfg.displacement)
                )
                mats2 = tuple(
                    jnp.asarray(m, dtype=compute_dtype)
                    for m in axis_matrices(r[2], dims[2], cfg.align_corners, cfg.displacement)
                )
                vols7 = displaced_resizes_cm(vol, mats0, mats1, mats2)
            for d, vd in enumerate(vols7):
                feats[d].append(vd.reshape(b, c, n_slab))

        # displacement-major contiguous concat: (B, 7*sumC, n_slab)
        f = jnp.concatenate([x for d in feats for x in d], axis=1)

        if stop_stage == "resizes":
            # diagnostic truncation (scripts/profile_sweep.py): cost of the
            # displaced resizes + concat alone, reduced to keep shapes tiny
            return jnp.sum(f.astype(jnp.float32), axis=1).reshape(
                -1, slab_rows, r[1], r[2]
            )

        if use_pallas_mlp is None:
            # default: real kernel on TPU only; the interpreter emulation off
            # TPU is far slower than the XLA einsum path
            use_pallas_mlp = jax.default_backend() == "tpu"
        if stop_stage == "fc0":
            h = jnp.einsum("hf,bfn->bhn", w1, f, preferred_element_type=jnp.float32)
            return jnp.sum(h, axis=1).reshape(-1, slab_rows, r[1], r[2])

        if use_pallas_mlp and f.shape[0] == 1:
            from sv3d_tpu.ops.pallas.mlp import default_interpret, fused_point_mlp

            tile = 1024
            n_pad = (-n_slab) % tile
            ff = jnp.pad(f[0], ((0, 0), (0, n_pad))) if n_pad else f[0]
            k, bia = self.mlp_kernels, self.mlp_biases
            logits = fused_point_mlp(
                ff, w1, bia[0], k[1], bia[1], k[2], bia[2], k[3], bia[3],
                tile=tile, interpret=default_interpret(),
            )[None, :n_slab]
        else:
            h = jnp.einsum("hf,bfn->bhn", w1, f, preferred_element_type=jnp.float32)
            h = h + self.fc0_bias[None, :, None]
            logits = self._mlp_tail(h.astype(jnp.float32))  # (B, n_slab)
        return logits.reshape(-1, slab_rows, r[1], r[2])

    def __call__(self, grid: jnp.ndarray, points: jnp.ndarray, train: bool = True):
        levels = self.encode(grid, train)
        if self.config.fused_query:
            return self.query_fused(levels, points)
        return self.query(levels, points)

    @property
    def feature_size(self) -> int:
        return sum(self.config.feature_channels) * 7

"""Pallas TPU kernel: fused lattice axis-2 resize + IF-Net decoder MLP.

The dense-lattice sweep (IFNet.query_lattice) previously materialized the
full feature tensor f = (7*sumC, n_slab) in HBM between the displaced
separable resizes and the decoder MLP.  Profiling the 33 M pts/s sweep
(scripts/profile_sweep.py) showed ~300 ms of its 390 ms full-scale wall time
was exactly that materialization: vols7 reshape/copy traffic plus the 42-way
concat, not matmul work.  This kernel deletes the f tensor: it receives the
axis-0/1 resized partial products per pyramid level and finishes the axis-2
resize, fc0, and the whole MLP tail per point tile with every intermediate
resident in VMEM.  HBM traffic becomes one read of the small partials and one
write of the logit tile.

Two per-level contraction orders, chosen statically by a FLOP count
(reference analog: the chunked re-encoding loop at reference
model/ifnet.py:215-229 has no such choice — it recomputes the conv pyramid
per chunk):

  * SHALLOW (order-1, resize -> fc0): the partials arrive as
    (A, 5*C8, g2p) — five axis-0/1 displacement branches stacked
    channel-major.  Per ta-row the kernel resizes axis 2 with three dots
    (the five center-axis2 displacements share one grouped dot; -d2/+d2 are
    per-branch-0 dots) into a t scratch, then one fc0 dot per ta-row over
    the level-major scratch rows.  Wins when C is small: fc0's K-dim work
    7*C*H*r2 is cheap, and resizing first keeps the big fc0 contraction at
    full r2 width.
  * DEEP (order-2, fc0 -> resize): XLA pre-contracts the fc0 block with the
    partials while the axis-2 dim is still the COARSE g2 (7*C*H*g2 flops
    instead of 7*C*H*r2), producing G = (A, 3*g2p, H) — the three axis-2
    variants (center/-d2/+d2 already weighted by their fc0 blocks and summed
    over displacement groups) concatenated on the k axis.  The kernel's
    whole per-ta job is one transposed-lhs dot with the variant-concatenated
    resize matrix (3*g2p, r2p).  Wins when C*H is large and g2 << r2: at
    full scale the three deepest levels drop 9-18x in flops.

Layout rules that make every in-kernel reshape free (Mosaic tiles the last
two dims of every VMEM block: the trailing "lane" dim pads to a multiple of
128 and the second-to-last "sublane" dim to a multiple of 8, so any reshape
that would split or merge across a tile boundary materializes a relayout —
see ARCHITECTURE.md "Environment gotchas"):

  * r2 is padded to a 128 multiple (r2p) so (X, Ta, r2p) <-> (X, Ta*r2p)
    merges never cross lanes; the padded output columns hold bias-only
    garbage and are trimmed by the caller.
  * The A axis is tiled on the OUTERMOST dim of every input block, so no
    BlockSpec ever slices a lane dim (A-tiles of 8 on a lane dim would pad
    16x).  All dots are 2-D (Mosaic-native) in a static per-ta loop.
  * Per-variant k blocks are padded to 8 (g2p) so the G concat and the m2
    row-slices stay sublane-aligned.

Inference-only (the dense sweep runs under no-grad semantics); no VJP.
Falls back to interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def round8(x: int) -> int:
    return -(-x // 8) * 8


def sweep_level_is_shallow(c8: int, g2: int, r2: int, h: int) -> bool:
    """Static order choice for one pyramid level: True = resize-then-fc0.

    Effective (unpadded) flops per output row of r2 points:
      order-1: 7*C*g2*r2 (axis-2 resizes) + 7*C*H*r2 (fc0 at fine width)
      order-2: 7*C*H*g2 (fc0 at coarse width) + 3*H*g2*r2 (variant resizes)
    """
    o1 = 7 * c8 * g2 * r2 + 7 * c8 * h * r2
    o2 = 7 * c8 * h * g2 + 3 * h * g2 * r2
    return o1 <= o2


def _make_kernel(specs, h_dim, ta, r2p, r_sh, dtype):
    n_lv = len(specs)

    def kernel(*refs):
        pos = 0
        v_refs = refs[pos : pos + n_lv]
        pos += n_lv
        m_refs = refs[pos : pos + n_lv]
        pos += n_lv
        w0sh_ref = None
        if r_sh:
            w0sh_ref = refs[pos]
            pos += 1
        b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref = refs[
            pos : pos + 7
        ]
        pos += 7
        out_ref = refs[pos]
        pos += 1
        t_ref = refs[pos] if r_sh else None

        dt = dtype
        f32 = jnp.float32

        # shallow levels: axis-2 resize into the t scratch (level-major rows)
        off = 0
        for li, (c8, g2p, shallow) in enumerate(specs):
            if not shallow:
                continue
            m2 = m_refs[li][...]  # (3*g2p, r2p)
            for t in range(ta):
                vt = v_refs[li][t]  # (5*c8, g2p)
                tc = jnp.dot(vt, m2[0:g2p], preferred_element_type=f32)
                t_ref[t, off : off + 5 * c8, :] = tc.astype(dt)
                vc = vt[0:c8]
                tm = jnp.dot(vc, m2[g2p : 2 * g2p], preferred_element_type=f32)
                t_ref[t, off + 5 * c8 : off + 6 * c8, :] = tm.astype(dt)
                tp = jnp.dot(
                    vc, m2[2 * g2p : 3 * g2p], preferred_element_type=f32
                )
                t_ref[t, off + 6 * c8 : off + 7 * c8, :] = tp.astype(dt)
            off += 7 * c8

        # fc0 over the scratch (or zero-init when every level is deep)
        if r_sh:
            hs = [
                jnp.dot(w0sh_ref[...], t_ref[t], preferred_element_type=f32)
                for t in range(ta)
            ]
        else:
            hs = [jnp.zeros((h_dim, r2p), f32) for _ in range(ta)]

        # deep levels: one transposed-lhs dot per ta-row against the
        # variant-concatenated resize matrix
        for li, (c8, g2p, shallow) in enumerate(specs):
            if shallow:
                continue
            m2 = m_refs[li][...]  # (3*g2p, r2p)
            for t in range(ta):
                g = v_refs[li][t]  # (3*g2p, H)
                u = jax.lax.dot_general(
                    g, m2, (((0,), (0,)), ((), ())), preferred_element_type=f32
                )  # (H, r2p)
                hs[t] = hs[t] + u

        # MLP tail, hiddens in VMEM/registers
        for t in range(ta):
            h = jnp.maximum(hs[t] + b0_ref[...], 0.0).astype(dt)
            h = jnp.dot(w1_ref[...], h, preferred_element_type=f32)
            h = jnp.maximum(h + b1_ref[...], 0.0).astype(dt)
            h = jnp.dot(w2_ref[...], h, preferred_element_type=f32)
            h = jnp.maximum(h + b2_ref[...], 0.0).astype(dt)
            o = jnp.dot(w3_ref[...], h, preferred_element_type=f32)
            out_ref[t] = (o + b3_ref[...])[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("specs", "ta", "r2p", "interpret", "dtype")
)
def fused_sweep_tail(
    v01s: tuple,
    m2s: tuple,
    w0sh,
    b0,
    w1,
    b1,
    w2,
    b2,
    w3,
    b3,
    *,
    specs: tuple,
    ta: int,
    r2p: int,
    interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """Fused axis-2 resize + decoder MLP over one lattice slab.

    v01s: per level — shallow: (Apad, 5*C8, g2p) bf16 axis-0/1 partials
          (branch order center,-d0,+d0,-d1,+d1 stacked on the channel dim);
          deep: (Apad, 3*g2p, H) bf16 fc0-contracted partials G (variant
          order center,-d2,+d2 stacked on the k dim).
    m2s:  per level (3*g2p, r2p) bf16 — m2s[l][v*g2p + k, y] = M2_v[y, k]
          (transposed axis-2 interpolation matrices, zero rows as k padding).
    w0sh: (H, R_sh) bf16 — level-major concat of the shallow levels' fc0
          blocks, each block displacement-major (d*C8 + c); None if every
          level is deep.
    b0:   (H, 1) f32;  w1/w2: (H, H) bf16;  w3: (1, H) bf16;  b*: f32 cols.
    specs: static tuple of (C8, g2p, shallow) per level.
    Returns (Apad, r2p) f32 logits; caller trims A padding and r2p -> r2.
    """
    a_pad = v01s[0].shape[0]
    assert a_pad % ta == 0
    h_dim = b0.shape[0]
    r_sh = sum(7 * c8 for c8, _, sh in specs if sh)

    in_specs = []
    for (c8, g2p, shallow), v in zip(specs, v01s):
        rows = 5 * c8 if shallow else 3 * g2p
        assert v.shape == (a_pad, rows, g2p if shallow else h_dim), (
            v.shape, (a_pad, rows, g2p, h_dim, shallow))
        in_specs.append(
            pl.BlockSpec(
                (ta, rows, v.shape[2]),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    for (c8, g2p, shallow), m in zip(specs, m2s):
        assert m.shape == (3 * g2p, r2p), (m.shape, (3 * g2p, r2p))
        in_specs.append(
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    args = list(v01s) + list(m2s)
    if r_sh:
        assert w0sh.shape == (h_dim, r_sh)
        in_specs.append(
            pl.BlockSpec(w0sh.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(w0sh)
    cols = lambda b: jnp.asarray(b, jnp.float32).reshape(-1, 1)
    dt = dtype
    tail = [
        cols(b0),
        w1.astype(dt), cols(b1),
        w2.astype(dt), cols(b2),
        w3.astype(dt).reshape(1, -1), cols(b3),
    ]
    for x in tail:
        in_specs.append(
            pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    args += tail

    scratch = []
    if r_sh:
        scratch.append(pltpu.VMEM((ta, r_sh, r2p), dtype))

    flops = 0
    for c8, g2p, shallow in specs:
        if shallow:
            flops += 2 * 7 * c8 * g2p * r2p + 2 * 7 * c8 * h_dim * r2p
        else:
            flops += 2 * h_dim * 3 * g2p * r2p
    flops += 2 * h_dim * (w1.shape[0] + w2.shape[0] + 1)
    flops *= a_pad

    out = pl.pallas_call(
        _make_kernel(specs, h_dim, ta, r2p, r_sh, dtype),
        grid=(a_pad // ta,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ta, r2p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((a_pad, r2p), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(v.size * 2 for v in v01s)
            + a_pad * r2p * 4,
            transcendentals=0,
        ),
    )(*args)
    return out

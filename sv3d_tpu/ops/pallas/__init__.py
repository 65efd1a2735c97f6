from sv3d_tpu.ops.pallas.mlp import fused_point_mlp

__all__ = ["fused_point_mlp"]

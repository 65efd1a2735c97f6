from sv3d_tpu.inference.dense_grid import evaluate_on_grid, implicit_to_mesh

__all__ = ["evaluate_on_grid", "implicit_to_mesh"]

from floodgan_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch

__all__ = ["make_mesh", "replicate_tree", "shard_batch"]

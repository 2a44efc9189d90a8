from floodgan_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch, shard_images

__all__ = ["make_mesh", "replicate_tree", "shard_batch", "shard_images"]

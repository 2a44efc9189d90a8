from floodgan_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch, shard_images
from floodgan_tpu.parallel.multihost import MultiHostBatchLoader, process_stripe

__all__ = [
    "make_mesh",
    "replicate_tree",
    "shard_batch",
    "shard_images",
    "MultiHostBatchLoader",
    "process_stripe",
]

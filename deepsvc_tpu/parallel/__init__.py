from .mesh import make_mesh, replicate, shard_leading_axis, shard_spatial
from .train import make_dp_cascade_step

__all__ = [
    "make_mesh",
    "replicate",
    "shard_leading_axis",
    "shard_spatial",
    "make_dp_cascade_step",
]

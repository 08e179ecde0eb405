from .mesh import make_mesh, replicate, shard_leading_axis
from .train import make_dp_cascade_step

__all__ = ["make_mesh", "replicate", "shard_leading_axis", "make_dp_cascade_step"]

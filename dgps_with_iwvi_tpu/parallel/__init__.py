"""Multi-chip execution: ('dp', 'k') mesh, shard_map training, collectives.

New TPU-native capability (the reference is single-process; SURVEY.md §2.0):
minibatch-gradient allreduce and cross-chip IW logsumexp over ICI.
"""

from . import distributed
from .mesh import make_mesh
from .sharding import make_parallel_trainer, replicate, shard_arrays

__all__ = ["distributed", "make_mesh", "make_parallel_trainer", "replicate", "shard_arrays"]

"""Multi-chip scaling: device meshes and corpus-sharded retrieval.

The reference is single-process/single-node with no distributed anything
(SURVEY.md section 2.3), so everything here is net-new TPU design: the
corpus is sharded row-wise across a ``jax.sharding.Mesh``, each chip scores
its shard and selects a local top-k, and only ``k`` candidates per chip
cross the ICI to be merged — the retrieval analogue of "exchange candidates,
not scores".
"""

from .mesh import default_mesh, mesh_2d
from .sharded import sharded_score_topk
from .pairwise_sharded import sharded_pairwise_topk
from . import multihost

__all__ = [
    "default_mesh",
    "mesh_2d",
    "sharded_score_topk",
    "sharded_pairwise_topk",
    "multihost",
]

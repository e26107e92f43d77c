"""Multi-chip sharding for map construction.

The reference has no distributed backend at all (SURVEY.md §2.6: its only
device parallelism is an unused nn.DataParallel).  The TPU design:

* frames are data-parallel across the mesh for the LSeg forward (the FLOPs),
* the voxel grid is sharded by top-down rows; each device owns gs/D rows of
  ``occupied_ids`` and its own slot arrays (independent allocators — no
  cross-device sequencing),
* after per-device point extraction, the compact point payload is
  all-gathered over ICI and every device fuses only the points landing in
  its row range.
"""

from avlmaps_tpu.parallel.sharded import (
    ShardedFusion, make_mesh, export_sharded, sharded_score_argmax,
)

__all__ = ["ShardedFusion", "make_mesh", "export_sharded",
           "sharded_score_argmax"]

"""T2 layer: device mesh, shardings, collectives, resumable grids.

The reference has no distributed execution of any kind (SURVEY.md §2
"Distributed communication backend: none"); everything here is new
capability mandated by the north star (BASELINE.json:5): data-parallel
row-partitioning of MRSI voxel batches across hosts/chips, the
amplitude-RHS exchange via collectives overlapped with solve compute, and
resumable pod-scale sweeps.
"""
from .mesh import auto_mesh, make_mesh, distributed_init
from .grid import fit_grid, fit_grid_sharded, refine_grid_timesharded
from .checkpoint import GridRunner, shard_manifest

__all__ = [
    "auto_mesh", "make_mesh", "distributed_init",
    "fit_grid", "fit_grid_sharded", "refine_grid_timesharded",
    "GridRunner", "shard_manifest",
]

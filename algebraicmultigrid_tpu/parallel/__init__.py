from .dist import (
    build_sharded_hierarchy,
    make_row_mesh,
    shard_hierarchy,
    solve_sharded,
)
from .halo import lat2d_spmv_halo, shard_slab

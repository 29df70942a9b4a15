from nsparse_tpu.parallel.mesh import make_mesh
from nsparse_tpu.parallel.partition import PartitionedCSR, partition_rows
from nsparse_tpu.parallel.spmv import spmv_dist
from nsparse_tpu.parallel.spgemm import (spgemm_dist, rap_dist,
                                          gather_partitioned)
from nsparse_tpu.parallel.halo import (
    BandedPartitionedCSR,
    partition_banded,
    shard_x,
    spmv_halo,
)
from nsparse_tpu.parallel.spgemm_halo import (
    HaloSpgemmPlan,
    rap_halo,
    spgemm_halo,
    spgemm_halo_plan,
)
from nsparse_tpu.parallel.spgemm_window import (
    DistWindowPlan,
    spgemm_numeric_dist_window,
    spgemm_plan_dist_window,
)

__all__ = [
    "make_mesh",
    "PartitionedCSR",
    "partition_rows",
    "spmv_dist",
    "spgemm_dist",
    "rap_dist",
    "gather_partitioned",
    "BandedPartitionedCSR",
    "partition_banded",
    "shard_x",
    "spmv_halo",
    "HaloSpgemmPlan",
    "rap_halo",
    "spgemm_halo",
    "spgemm_halo_plan",
    "DistWindowPlan",
    "spgemm_plan_dist_window",
    "spgemm_numeric_dist_window",
]

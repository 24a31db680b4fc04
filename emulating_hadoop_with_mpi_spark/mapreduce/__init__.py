from emulating_hadoop_with_mpi_spark.mapreduce.api import map_reduce, map_reduce_by_key
from emulating_hadoop_with_mpi_spark.mapreduce.matmul import (
    matmul_auto,
    matmul_block,
    matmul_broadcast,
    matmul_coo,
    matmul_mapreduce,
)

__all__ = [
    "map_reduce",
    "map_reduce_by_key",
    "matmul_auto",
    "matmul_block",
    "matmul_broadcast",
    "matmul_coo",
    "matmul_mapreduce",
]

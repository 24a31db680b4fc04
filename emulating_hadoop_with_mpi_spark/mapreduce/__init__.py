from emulating_hadoop_with_mpi_spark.mapreduce.api import map_reduce, map_reduce_by_key
from emulating_hadoop_with_mpi_spark.mapreduce.matmul import (
    matmul_coo,
    matmul_mapreduce,
    matmul_broadcast,
)

__all__ = [
    "map_reduce",
    "map_reduce_by_key",
    "matmul_coo",
    "matmul_mapreduce",
    "matmul_broadcast",
]

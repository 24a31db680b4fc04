from emulating_hadoop_with_mpi_spark.sources.tables import TABLES, load_table, load_tables, register_views
from emulating_hadoop_with_mpi_spark.sources.matrix import (
    matrix_dims_from_name,
    read_matrix_coo,
    write_matrix_dat,
)
from emulating_hadoop_with_mpi_spark.sources.datagen import generate_matrix_df, generate_matrix_file

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "matrix_dims_from_name",
    "read_matrix_coo",
    "write_matrix_dat",
    "generate_matrix_df",
    "generate_matrix_file",
]

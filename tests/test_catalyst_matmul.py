"""Plan-level tests for the JVM Catalyst matmul extension (jvm/src/).

The physical multiply strategy (broadcast-hash vs shuffled join) must be
chosen by the injected optimizer rule from Catalyst's size statistics —
no Python dispatcher, no driver-side counts (VERDICT r2 item 6).

The extension needs its own SparkSession (spark.jars +
spark.sql.extensions are start-time confs), so the checks run in a
subprocess instead of the shared session fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "emulating_hadoop_with_mpi_spark", "jvm", "matmul-extensions.jar")

_DRIVER = r"""
import sys, tempfile
import numpy as np

sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from emulating_hadoop_with_mpi_spark.plans.catalyst_matmul import (
    extension_confs, matmul_catalyst,
)
from emulating_hadoop_with_mpi_spark.sources.datagen import generate_matrix_df

builder = SparkSession.builder.master("local[4]").appName("catalyst-matmul-test")
for k, v in extension_confs().items():
    builder = builder.config(k, v)
spark = builder.config("spark.sql.shuffle.partitions", "8").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

d = tempfile.mkdtemp()
generate_matrix_df(spark, 64, 64, seed=1).write.parquet(d + "/A")
generate_matrix_df(spark, 64, 48, seed=2).write.parquet(d + "/B")
A = spark.read.parquet(d + "/A")
B = spark.read.parquet(d + "/B")


def to_np(df, r, c):
    M = np.zeros((r, c), dtype=np.int64)
    for row in df.collect():
        M[row[0], row[1]] = row[2]
    return M


An, Bn = to_np(A, 64, 64), to_np(B, 64, 48)

# 1. stats say both sides are tiny -> rule pins a broadcast hint
C = matmul_catalyst(A, B)
plan = C._jdf.queryExecution().executedPlan().toString()
assert "BroadcastHashJoin" in plan, plan
assert (An @ Bn == to_np(C, 64, 48)).all()

# 2. self-multiply (duplicate exprIds on both sides) stays correct
G = matmul_catalyst(A, A)
assert (An @ An == to_np(G, 64, 64)).all()

# 3. matmul_auto with unknown dims defers to the extension (no driver jobs)
from emulating_hadoop_with_mpi_spark.mapreduce.matmul import matmul_auto

Cauto = matmul_auto(A, B)
plan_auto = Cauto._jdf.queryExecution().executedPlan().toString()
assert "BroadcastHashJoin" in plan_auto, plan_auto
assert (An @ Bn == to_np(Cauto, 64, 48)).all()

# 4. threshold off -> same logical node plans as a shuffled join
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
C2 = matmul_catalyst(A, B)
plan2 = C2._jdf.queryExecution().executedPlan().toString()
assert "BroadcastHashJoin" not in plan2, plan2
assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2, plan2
assert (An @ Bn == to_np(C2, 64, 48)).all()
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

# 5. JVM-side .dat decode (jvm/src/MatrixSource.scala): with the jar loaded,
# read_matrix_coo must route to the JVM reader (no Python/Arrow stage in the
# plan) and agree cell-for-cell with numpy AND with the forced mapInPandas
# fallback — including a shape whose rows don't divide evenly into splits.
from emulating_hadoop_with_mpi_spark.sources import matrix as M

rng = np.random.default_rng(11)
D = rng.integers(-(2**31), 2**31 - 1, size=(67, 29), dtype=np.int64).astype(np.int32)
dat = M.write_matrix_dat(D, d, 9)
jdf = M.read_matrix_coo(spark, dat)
jplan = jdf._jdf.queryExecution().executedPlan().toString()
assert "MapInPandas" not in jplan, jplan
got = to_np(jdf, 67, 29)
assert (got == D).all()

_orig = M._read_matrix_coo_jvm
M._read_matrix_coo_jvm = lambda *a, **k: None
try:
    pdf = M.read_matrix_coo(spark, dat)
    pplan = pdf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in pplan, pplan
    assert (to_np(pdf, 67, 29) == got).all()
finally:
    M._read_matrix_coo_jvm = _orig

# empty matrix short-circuits on both paths
empty = M.write_matrix_dat(np.zeros((0, 5), dtype=np.int32), d, 10)
assert M.read_matrix_coo(spark, empty).count() == 0

spark.stop()
print("CATALYST_MATMUL_OK")
"""


@pytest.mark.skipif(not os.path.exists(JAR), reason="extension jar not built (jvm/build.sh)")
def test_catalyst_matmul_dispatch_by_stats():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "CATALYST_MATMUL_OK" in proc.stdout

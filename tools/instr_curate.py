"""Instrument q85's eager plan-construction calls (round 18, VERDICT
r17 item 2): wraps every curate anchor lookup, ranged-total bounds
collect, mixture rate aggregate, bpe_train and decontaminate build, and
times q85 fn-construction vs final execution separately.  Findings in
OPTIMIZATION_r18.md section 8 (the ~5 s bounds premise refuted: bounds
are ~0.9 s; anchors/plan-construction dominate).

Usage: SPARK_GRAFT_CPUS=32 python tools/instr_curate.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from pyspark.sql import functions as F

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="instr_curate", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
spark.sparkContext.setLogLevel("ERROR")

from emulating_hadoop_with_mpi_spark.functions import pipeline as P
from emulating_hadoop_with_mpi_spark.functions import sampling as S
from emulating_hadoop_with_mpi_spark.functions import text as T
from emulating_hadoop_with_mpi_spark.registry import all_queries

events = []

def wrap(mod, name, label=None):
    orig = getattr(mod, name)
    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        events.append((label or name, round(time.perf_counter() - t0, 3)))
        return out
    setattr(mod, name, timed)
    return orig

wrap(P._CURATE_CACHE, "lookup", "curate_anchor")
from emulating_hadoop_with_mpi_spark.functions import bpe as B
wrap(B, "bpe_train")
wrap(P, "curate_frames", "curate_frames(total)")
wrap(P, "decontaminate")
wrap(S, "ranged_running_total", "ranged_total(build+bounds)")
wrap(S, "mixture_rate_values", "mixture_rates")
wrap(T._QSCORE_CACHE, "lookup", "qscore_cache")
wrap(T._PACK_CACHE, "lookup", "pack_cache")
# percentile bounds collect inside ranged_running_total is part of its time;
# also time pack_sequences' own bounds via its agg? covered by final exec.

sf_dir = "/root/testdata/sf0.1"
docs = load_table(spark, sf_dir, "documents")
docs.count()

q85 = all_queries()["q85_chunk_documents"]

for rep in range(2):
    spark.catalog.clearCache()
    P.release_curate_cache()
    events.clear()
    import gc; gc.collect()
    t0 = time.perf_counter()
    df = q85.fn(spark, sf_dir)
    t_construct = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t_exec = round(time.perf_counter() - t0, 3)
    print(f"REP {rep}: construct={t_construct} exec={t_exec} total={round(t_construct+t_exec,3)}")
    for lbl, dt in events:
        print(f"   {dt:7.3f}  {lbl}")
spark.stop()

"""Command-line parity with the reference's three binaries.

The reference ships three programs (SURVEY §3):
- ``filecreation``  — write a random matrix ``.dat`` file (``filecreation.c:30-38``)
- ``program``       — ``mpirun program A.dat B.dat`` → reducer_output.txt
                      ("(i,k):sum" lines) + final_result.txt (dense render)
                      (``program.c:479-514``)
- ``checking``      — serial oracle run on the same inputs (``checking.c:108-115``)

Equivalent here (one spark-submit-able module instead of mpirun):

    python -m emulating_hadoop_with_mpi_spark.cli generate 64 32 --seed 7 --out DIR
    python -m emulating_hadoop_with_mpi_spark.cli multiply A.dat B.dat --out DIR
    python -m emulating_hadoop_with_mpi_spark.cli check A.dat B.dat DIR

``multiply`` writes both of the reference's outputs: ``reducer_output/``
(the "(i,k):sum" line format, per-partition part files replacing the MPI
shared file pointer) and ``final_result/`` (whitespace-separated dense rows).
``check`` re-reads ``reducer_output`` and compares against NumPy ``A @ B`` —
exactly the checking.c workflow, automated.

Beyond the reference trio, ``pipeline`` runs the LLM-corpus curation
composition (functions/pipeline.py) over a testdata directory:

    python -m emulating_hadoop_with_mpi_spark.cli pipeline /root/testdata/sf0.01 --out DIR
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _spark():
    from emulating_hadoop_with_mpi_spark import get_spark

    return get_spark(app_name="emulating-hadoop-with-mpi-spark-cli")


def cmd_generate(args: argparse.Namespace) -> int:
    from emulating_hadoop_with_mpi_spark.sources.datagen import generate_matrix_file

    path = generate_matrix_file(args.out, args.rows, args.cols, seed=args.seed, file_id=args.id)
    print(path)
    return 0


def cmd_multiply(args: argparse.Namespace) -> int:
    from emulating_hadoop_with_mpi_spark.mapreduce.matmul import (
        matmul_render_dense,
        multiply_dat_files,
    )
    from emulating_hadoop_with_mpi_spark.sources.sinks import write_kv_text

    spark = _spark()
    c = multiply_dat_files(spark, args.file_a, args.file_b).cache()
    write_kv_text(c, f"{args.out}/reducer_output")
    # dense whitespace-separated render (program.c:465-476)
    from pyspark.sql import functions as F

    dense = matmul_render_dense(c)
    value_cols = [col for col in dense.columns if col != "i"]
    (
        dense.select(
            F.concat_ws(" ", *[F.col(col).cast("string") for col in value_cols]).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(f"{args.out}/final_result")
    )
    print(f"{args.out}/reducer_output {args.out}/final_result")
    return 0


def cmd_check(args: argparse.Namespace) -> int:
    from emulating_hadoop_with_mpi_spark.sources.matrix import (
        coo_to_numpy,
        matrix_dims_from_name,
    )
    from emulating_hadoop_with_mpi_spark.sources.sinks import read_kv_text

    l, m1 = matrix_dims_from_name(args.file_a)
    m2, n = matrix_dims_from_name(args.file_b)
    a = np.fromfile(args.file_a, dtype="<i4").reshape(l, m1)
    b = np.fromfile(args.file_b, dtype="<i4").reshape(m2, n)
    spark = _spark()
    got = coo_to_numpy(read_kv_text(spark, f"{args.out}/reducer_output"), l, n)
    expect = a.astype(np.int64) @ b.astype(np.int64)
    if np.array_equal(got, expect):
        print("OK: distributed result matches serial oracle")
        return 0
    bad = int((got != expect).sum())
    print(f"MISMATCH: {bad} cells differ", file=sys.stderr)
    return 1


def _parse_mixture(spec: str) -> dict[str, int]:
    """argparse type for --mixture 'lang=weight,...': tolerant of spaces,
    loud on malformed entries (ArgumentTypeError → clean usage error,
    not a traceback)."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        key, sep, val = part.partition("=")
        key = key.strip()
        if not sep or not key:
            raise argparse.ArgumentTypeError(
                f"bad mixture entry {part!r}: expected 'stratum=integer_weight'"
            )
        try:
            weight = int(val.strip())
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"bad mixture weight in {part!r}: weights are integers"
            ) from None
        if weight <= 0:
            raise argparse.ArgumentTypeError(
                f"bad mixture weight in {part!r}: weights must be positive"
            )
        out[key] = weight
    if not out:
        raise argparse.ArgumentTypeError("empty mixture spec")
    return out


def cmd_pipeline(args: argparse.Namespace) -> int:
    """Curate a documents table end-to-end (quality gate -> dedup ->
    chunk -> pack -> split -> shards) and print a one-line JSON summary."""
    import json

    from pyspark.sql import functions as F

    from emulating_hadoop_with_mpi_spark.functions.pipeline import (
        curate_corpus,
        write_curated_shards,
    )
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    spark = _spark()
    docs = load_table(spark, args.sf_dir, "documents")
    # --benchmark: any readable text source with a `text` column; flagged
    # docs are anti-joined out between the quality gate and dedup
    benchmark = None
    if args.benchmark:
        benchmark = (
            spark.read.text(args.benchmark).withColumnRenamed("value", "text")
            if args.benchmark.endswith(".txt")
            else spark.read.parquet(args.benchmark).select("text")
        )
    curated = curate_corpus(
        docs,
        min_quality=args.min_quality,
        budget=args.budget,
        benchmark=benchmark,
        cut_span_ngram=args.cut_span_ngram,
        redact=args.redact,
        dsir_target=(
            F.col("lang") == args.dsir_target_lang
            if args.dsir_target_lang
            else None
        ),
        dsir_keep_frac=args.dsir_keep_frac,
        lm_keep_frac=args.lm_keep_frac,
        mixture=args.mixture,
        token_budget=args.token_budget,
    ).cache()
    write_curated_shards(
        curated,
        args.out,
        bins_per_shard=args.bins_per_shard,
        shuffle_seed=args.shuffle_seed,
    )
    summary = {
        "docs_in": docs.count(),
        "docs_kept": curated.select("doc_id").distinct().count(),
        "chunks": curated.count(),
        "bins": curated.select("split", "bin_id").distinct().count(),
        "by_split": {
            r["split"]: r["n"]
            for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="emulating_hadoop_with_mpi_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a deterministic random matrix .dat file")
    g.add_argument("rows", type=int)
    g.add_argument("cols", type=int)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--id", default="1")
    g.add_argument("--out", default=".")
    g.set_defaults(fn=cmd_generate)

    m = sub.add_parser("multiply", help="distributed C = A x B from .dat files")
    m.add_argument("file_a")
    m.add_argument("file_b")
    m.add_argument("--out", default="./matmul_out")
    m.set_defaults(fn=cmd_multiply)

    c = sub.add_parser("check", help="compare reducer_output against NumPy A @ B")
    c.add_argument("file_a")
    c.add_argument("file_b")
    c.add_argument("out")
    c.set_defaults(fn=cmd_check)

    pl = sub.add_parser(
        "pipeline", help="curate documents: quality->dedup->chunk->pack->split->shards"
    )
    pl.add_argument("sf_dir")
    pl.add_argument("--out", default="./curated")
    pl.add_argument("--min-quality", type=float, default=0.2)
    pl.add_argument("--budget", type=int, default=256)
    pl.add_argument("--bins-per-shard", type=int, default=64)
    pl.add_argument(
        "--benchmark",
        default=None,
        help="eval-set path (.txt lines or parquet with a text column); "
        "docs sharing token n-grams with it are decontaminated out",
    )
    pl.add_argument(
        "--cut-span-ngram",
        type=int,
        default=None,
        help="cut corpus-duplicated n-token spans (keep-first) after exact "
        "dedup — substring-level boilerplate removal",
    )
    pl.add_argument(
        "--redact",
        action="store_true",
        help="mask PII (email/IP/card/SSN/phone) after dedup, before chunking",
    )
    pl.add_argument(
        "--dsir-target-lang",
        default=None,
        help="DSIR selection: keep the top --dsir-keep-frac of docs scoring "
        "highest against the lang=<X> subset as the target corpus",
    )
    pl.add_argument("--dsir-keep-frac", type=float, default=0.5)
    pl.add_argument(
        "--shuffle-seed",
        type=int,
        default=None,
        help="deterministic training-order shuffle: scatter bins across "
        "shards and shuffle bin order inside each shard by this seed",
    )
    pl.add_argument(
        "--lm-keep-frac",
        type=float,
        default=None,
        help="LM-perplexity selection: keep this fraction of docs with the "
        "LOWEST cross-entropy under the corpus bigram LM (CCNet filter)",
    )
    pl.add_argument(
        "--mixture",
        type=_parse_mixture,
        default=None,
        help="data-mixture resampling: 'lang=weight,...' integer target "
        "proportions by characters of surviving text (e.g. 'en=2,es=1'); "
        "strata not listed are dropped; weights naming absent strata fail "
        "loudly at rate derivation",
    )
    pl.add_argument(
        "--token-budget",
        type=int,
        default=None,
        help="keep best-quality documents until this many tokens survive "
        "(counted over post-span-cut text)",
    )
    pl.set_defaults(fn=cmd_pipeline)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

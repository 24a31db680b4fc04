#!/usr/bin/env bash
# Build the Catalyst matmul extension jar against the Spark jars shipped
# inside the installed pyspark wheel.  No network, no dependency manager:
# the Scala 2.13 compiler ships in pyspark/jars too (sbt at /opt/sbt works
# as well, but this is hermetic).
#
#   bash build.sh        -> emulating_hadoop_with_mpi_spark/jvm/matmul-extensions.jar
set -euo pipefail
cd "$(dirname "$0")"

SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
CLASSES=target/classes
rm -rf "$CLASSES" && mkdir -p "$CLASSES"

# resolve the wheel's scala toolchain jars by glob — version-agnostic
SCALA_CP=$(ls "$SPARK_JARS"/scala-compiler-*.jar "$SPARK_JARS"/scala-library-*.jar "$SPARK_JARS"/scala-reflect-*.jar | paste -sd:)
java -cp "$SCALA_CP" \
  scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" \
  -d "$CLASSES" \
  src/*.scala

jar cf matmul-extensions.jar -C "$CLASSES" .
echo "built $(pwd)/matmul-extensions.jar"

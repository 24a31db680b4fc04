/*
 * JVM-side decoder for the reference's headerless binary matrix format
 * (filecreation.c:19-28 / program.c:45-72): dense row-major little-endian
 * int32, dims encoded in the file name.  This is the JVM twin of
 * sources/matrix.py::read_matrix_coo — same split contract (row-aligned
 * byte ranges sized like FileScan splits), but the decode never crosses
 * the Python boundary: each task does one positioned Hadoop FS read of its
 * range and emits COO (i, j, v) rows straight from a little-endian
 * IntBuffer.  The Python reader stays as the jar-absent fallback.
 *
 * Scale notes: splits are planned driver-side as a tiny RDD of row starts
 * (one per ~maxPartitionBytes), so a 100 TB matrix is just more splits;
 * access goes through the path's own Hadoop FileSystem so hdfs://-style
 * URIs work unchanged.  Streams are closed via a task-completion listener.
 */
package emulatinghadoop.spark.matmul

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** One COO cell; Encoders.product gives the (i INT, j INT, v INT) schema
  * matching sources/matrix.py::COO_SCHEMA. */
case class CooCell(i: Int, j: Int, v: Int)

object MatrixSource {

  /** Read a .dat matrix into a COO DataFrame (i INT, j INT, v INT).
    *
    * @param rowsPerSplit rows per read split — the caller derives it from
    *   spark.sql.files.maxPartitionBytes exactly as the Python reader does,
    *   keeping both paths' physical split plans identical.
    */
  def readCoo(
      session: CSparkSession,
      path: String,
      rows: Int,
      cols: Int,
      rowsPerSplit: Int
  ): CDataset[Row] = {
    val recordLen = cols * 4
    if (rows.toLong * cols == 0) {
      return session.createDataset(Seq.empty[CooCell])(Encoders.product[CooCell]).toDF()
    }
    val starts = (0 until rows by math.max(1, rowsPerSplit)).toSeq
    val rdd = session.sparkContext.parallelize(starts, starts.length)
    val ds = session.createDataset(rdd)(Encoders.scalaInt)
    ds.mapPartitions { iter =>
      // Per-task Configuration: fine for local/HDFS-default clusters; a
      // deployment with per-session FS credentials would broadcast the
      // session's hadoopConfiguration instead.
      val fsPath = new Path(path)
      val fs = fsPath.getFileSystem(new Configuration())
      val in = fs.open(fsPath)
      val tc = TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
      iter.flatMap { rowStart =>
        val rowEnd = math.min(rowStart + rowsPerSplit, rows)
        val n = rowEnd - rowStart
        val buf = new Array[Byte](n * recordLen)
        in.readFully(rowStart.toLong * recordLen, buf, 0, buf.length)
        val ints = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
        (0 until n).iterator.flatMap { r =>
          val i = rowStart + r
          val base = r * cols
          (0 until cols).iterator.map(j => CooCell(i, j, ints.get(base + j)))
        }
      }
    }(Encoders.product[CooCell]).toDF()
  }
}

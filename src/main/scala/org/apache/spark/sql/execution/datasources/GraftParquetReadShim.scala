package org.apache.spark.sql.execution.datasources

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** The one `private[sql]` seam graft's storage-partitioned (bucketed)
  * scan needs, re-exported from inside the package (same shim pattern
  * as [[org.apache.spark.sql.GraftSparkInternals]], which documents the
  * rule: every other Spark touchpoint goes through public APIs).
  *
  * [[ParquetFileFormat.buildReaderWithPartitionValues]] is exactly the
  * machinery `FileSourceScanExec` ships to executors: built ON THE
  * DRIVER (it captures SQLConf — field-id resolution, rebase modes,
  * vectorization — at build time), the returned closure is serializable
  * and reads one file with column pruning + parquet row-group filter
  * pushdown. Graft's native DSv2 bucket scan (GraftBucketScan) needs a
  * per-file InternalRow reader because a V1Scan bridge cannot report
  * `KeyGroupedPartitioning` — and re-implementing a parquet decoder
  * would be both slower and wrong.
  */
object GraftParquetReadShim {

  /** Build the serializable per-file reader. When the session's
    * vectorized reader is enabled the closure yields ColumnarBatch
    * objects disguised as InternalRow (the FileFormat contract that
    * whole-stage codegen exploits); this wrapper unwraps them back to
    * rows, so callers always see true InternalRows. */
  def buildReader(spark: SparkSession,
                  dataSchema: StructType,
                  requiredSchema: StructType,
                  filters: Seq[Filter]): PartitionedFile => Iterator[InternalRow] = {
    val fmt = new ParquetFileFormat()
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val readFile = fmt.buildReaderWithPartitionValues(
      sparkSession = classic,
      dataSchema = dataSchema,
      partitionSchema = new StructType(),
      requiredSchema = requiredSchema,
      filters = filters,
      // rows, never ColumnarBatch: this reader feeds a row-based
      // PartitionReader (the vectorized decoder still runs underneath;
      // it just hands rows off the batch)
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = classic.sessionState.newHadoopConfWithOptions(Map.empty))
    file =>
      readFile(file).flatMap {
        case b: ColumnarBatch => b.rowIterator().asScala
        case r: InternalRow => Iterator.single(r)
      }
  }

  def mkFile(path: String, length: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      0L, length, Array.empty, 0L, length)
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.Tuning

/** Small-files compaction — the unglamorous operator every 100 TB ingest
  * pipeline needs: streaming sinks and hourly batch drops leave thousands
  * of KB-scale parquet files per partition, and scan planning cost plus
  * per-file overhead then dominates reads. Compact rewrites a directory to
  * ceil(bytes / target) files via coalesce (no shuffle: existing
  * partitions are merged, not redistributed; pass repartition = true when
  * output skew matters more than the shuffle cost).
  */
object Compaction {

  /** Number of output files for `bytes` of input at the target file size. */
  def targetFileCount(bytes: Long,
      targetBytes: Long = Tuning.TargetPartitionBytes): Int =
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

  /** Rewrite `inDir` (parquet) into `outDir` with size-targeted files.
    * Returns the file count written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = Tuning.TargetPartitionBytes,
      repartition: Boolean = false): Int = {
    val p = new Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = targetFileCount(bytes, targetBytes)
    val df = spark.read.parquet(inDir)
    val out = if (repartition) df.repartition(n) else df.coalesce(n)
    out.write.mode("overwrite").parquet(outDir)
    n
  }
}

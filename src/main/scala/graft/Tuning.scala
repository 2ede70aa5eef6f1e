package graft

import org.apache.spark.sql.SparkSession

/** Shuffle/scan sizing heuristics for the target data scale — the knobs
  * that decide whether a 100 TB run spills or flows (SURVEY §2.7-adjacent;
  * the reference tunes the YARN equivalents in yarn-site.xml).
  *
  * Rules of thumb encoded here:
  *  - a shuffle partition should hold ~128 MB of pre-shuffle data so the
  *    sorter works in memory (post-compression partitions land well under
  *    executor memory);
  *  - partition count should never drop below total cores (else cores
  *    idle), and for large inputs should be a small multiple of cores so
  *    stragglers amortize;
  *  - scan splits (`maxPartitionBytes`) follow the same target size.
  */
object Tuning {

  val TargetPartitionBytes: Long = 128L * 1024 * 1024

  /** Recommended shuffle partition count for a stage shuffling roughly
    * `shuffleBytes` of data on a cluster with `totalCores` slots.
    */
  def shufflePartitions(shuffleBytes: Long, totalCores: Int): Int = {
    val bySize = math.ceil(shuffleBytes.toDouble / TargetPartitionBytes).toInt
    math.max(totalCores, bySize)
  }

  /** On-disk bytes under a dataset directory — the volume signal the
    * harness feeds `configureForInput` (at cluster scale the same walk is
    * one FileSystem.getContentSummary call).
    */
  def dirBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  /** Volume-scaled session sizing from an input directory: shuffled bytes
    * are estimated as `expansion` × the on-disk (compressed) input —
    * snappy parquet typically decompresses ~3× and the widest stages
    * shuffle a projection of comparable size. Oversizing is safe under
    * AQE (it coalesces down); undersizing is what spills a 100× run in a
    * small heap.
    */
  def configureForInput(spark: SparkSession, dir: String,
      expansion: Double = 3.0): Unit =
    configure(spark, (dirBytes(dir) * expansion).toLong)

  /** Apply the sizing to a session (shuffle width + scan split size).
    * With AQE on (our default), `spark.sql.shuffle.partitions` acts as the
    * initial/maximum width and AQE coalesces down — so sizing UP for the
    * data scale is safe, while undersizing is not recoverable.
    */
  def configure(spark: SparkSession, expectedShuffleBytes: Long): Unit = {
    val cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions",
      shufflePartitions(expectedShuffleBytes, cores).toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes", TargetPartitionBytes.toString)
  }
}

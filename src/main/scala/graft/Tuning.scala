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

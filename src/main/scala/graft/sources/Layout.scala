package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side data layout — the half of scan pruning that happens at
  * ingestion time. Predicate pushdown can only skip what the layout
  * isolated: a time filter prunes nothing if every file spans every day,
  * and a key filter reads every row group if keys are scattered. These
  * writers put the isolation in place; the reads then prune with ZERO
  * query-side machinery (Catalyst partition pruning + parquet min/max
  * stats do the rest).
  *
  * At 100 TB this is the difference between "scan 100 TB and filter" and
  * "open the one partition the predicate names": a date-partitioned
  * events table answers a trailing-hour query from one directory, and a
  * range-clustered corpus answers a doc_id probe from one file's row
  * groups. Layout is chosen ONCE per table for its dominant access path;
  * secondary predicates still benefit from within-file min/max stats.
  */
object Layout {

  /** Date-partitioned append layout for event streams: one directory per
    * UTC day (`day=YYYY-MM-DD`). Time-ranged reads prune at the CATALOG
    * level — Catalyst resolves the day predicate against directory names
    * and never lists, opens, or footers the other days (plan-asserted in
    * LayoutSpec as PartitionFilters). Low-cardinality by construction
    * (one dir per day, not per key), so small-file explosion is bounded
    * by days x shuffle partitions.
    */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Range-clustered layout for key-probed tables: range-repartition on
    * the key then sort within partitions, so every output file covers a
    * DISJOINT key interval and row groups inside a file are ordered.
    * A key equality/range read then skips whole files on parquet
    * footer min/max alone (and row groups within the one file that
    * matches). LayoutSpec proves the property the skipping relies on:
    * per-file [min, max] intervals are pairwise disjoint.
    *
    * `nFiles` sizes the layout explicitly — at scale this is set from
    * target file size (e.g. 1 GiB), not task count.
    */
  def writeRangeClustered(df: DataFrame, path: String, key: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Read back a date-partitioned table for one day — the pruned access
    * path (the `day` predicate is a partition filter, not a data filter).
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)
}

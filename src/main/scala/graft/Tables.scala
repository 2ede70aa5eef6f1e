package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All tables are Parquet; Spark's vectorized reader + Catalyst
  * pushdown/pruning apply automatically. At cluster scale the same loaders
  * work against a directory of many files — nothing here assumes a single
  * file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions reading `events` must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see `configure`):
    * events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; with the flag it arrives as raw nanos and is floor-converted
    * here to Spark's microsecond TimestampType (identical to DuckDB's
    * ns->us floor). The flag lives at session build, not here — a loader
    * mutating global session state per call is a correctness hazard under
    * concurrent queries.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** The session settings every graft entry point builds with. Extensions
    * ride along (injected functions + the TokenCountRewrite optimizer
    * rule): `spark.sql.extensions` is a static conf read at context
    * creation, so attaching at the builder is the route that works for
    * programmatic sessions too.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

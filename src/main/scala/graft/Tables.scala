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

  /** `events.ts` has shipped in three parquet encodings across testdata
    * generations, so the loader normalizes by the OBSERVED read type rather
    * than assuming one: (a) TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` (set
    * in `configure`) surfaces it as raw nano longs — floor-converted here to
    * microsecond TimestampType, identical to DuckDB's ns->us floor; (b)
    * TIMESTAMP(MICROS) without the UTC-adjustment flag, which Spark 4 infers
    * as TIMESTAMP_NTZ — cast to TimestampType under the session's UTC zone,
    * the same instant DuckDB assigns the naive value; (c) already
    * TimestampType, passed through. The session flags live at session
    * build, not here — a loader mutating global session state per call is a
    * correctness hazard under concurrent queries.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _                => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** The session settings every graft entry point builds with. Extensions
    * ride along (injected functions + the TokenCountRewrite optimizer
    * rule): `spark.sql.extensions` is a static conf read at context
    * creation, so attaching at the builder is the route that works for
    * programmatic sessions too.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Surface parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) as plain
      // TIMESTAMP instead of TIMESTAMP_NTZ (under the UTC session zone the
      // two are the same instant): the NTZ fallback in `load` would wrap
      // ts in a cast, and a cast on the scan column blocks parquet
      // predicate pushdown for every time-range filter over events — at
      // 100 TB that is the difference between pruning row groups by
      // min/max ts and reading them all.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Drop a managed table AND its on-disk location. A previous JVM may
    * have left files under the warehouse dir that this session's
    * in-memory catalog has no entry for — then `DROP TABLE IF EXISTS` is a
    * no-op and a later managed CREATE fails with LOCATION_ALREADY_EXISTS.
    *
    * The location is resolved from CATALOG METADATA while the entry still
    * exists — hard-coding `<warehouse>/<name>` deletes the wrong path for
    * a table in a non-default database or with a custom LOCATION (ADVICE
    * r8). EXTERNAL tables keep their files by Spark's own contract: only
    * the entry is dropped. The warehouse-path convention remains only as
    * the fallback for catalog-less orphans, which nothing else can name.
    * Physical deletion goes through the Hadoop FileSystem API so the same
    * code works against any warehouse filesystem.
    */
  def dropManagedTable(spark: SparkSession, name: String): Unit = {
    import org.apache.hadoop.fs.Path
    val catalog = spark.sessionState.catalog
    val id = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val toDelete: Option[Path] =
      if (catalog.tableExists(id)) {
        val meta = catalog.getTableMetadata(id)
        if (meta.tableType ==
            org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
          Some(new Path(meta.location)) // the table's REAL location
        else None // external: never delete user data
      } else
        Some(new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
          name.toLowerCase)) // orphaned files from a previous JVM
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    toDelete.foreach { p => // idempotent: DROP already removed managed files
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source/sink — the interchange format
  * training corpora actually ship in. Thin, deliberate wrappers over
  * Spark's json reader/writer that pin the settings that matter for
  * corpus work:
  *
  *  - writes are uncompressed-by-default OVERRIDABLE via codec (gzip
  *    JSONL is the common distribution form; zstd for hot storage);
  *  - reads take an explicit schema — schema inference re-scans the
  *    corpus once per load and silently widens types on dirty data, both
  *    wrong at 100 TB;
  *  - `mode=PERMISSIVE` with a corrupt-record column, so a malformed line
  *    quarantines instead of killing an ingest job (the
  *    `_corrupt_record` column is the audit trail).
  */
object JsonLines {

  final val CorruptCol = "_corrupt_record"

  def write(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode("errorifexists")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read with a required schema; malformed lines land in
    * `_corrupt_record` (added to the schema here) instead of failing the
    * job or being silently dropped.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The well-formed rows only: DROPMALFORMED skips bad lines at parse
    * time (Spark disallows filtering a raw scan on the corrupt column
    * alone, so the quarantine view and the clean view are separate
    * reads).
    */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch word count — the reference's entire batch surface re-expressed
  * Spark-first (reference: stock Hadoop WordCount invoked at
  * cluster/tools/run_fault_tests.py:25-30; counter evidence in
  * cluster/shared/reports/fault_test_20251115-181926.job.log).
  *
  * Physical shape Catalyst produces: FileScan -> Project/Generate (explode)
  * -> partial HashAggregate (the "combiner") -> Exchange(hash word) ->
  * final HashAggregate -> Sort. Identical dataflow to the reference's
  * map/combine/shuffle/reduce, with whole-stage codegen fusing the map side.
  */
object WordCount {

  /** StringTokenizer-equivalent tokenization: maximal non-whitespace runs
    * (SURVEY §2.2 P1/P3), via the native single-pass byte-scan expression
    * (graft.functions.WhitespaceTokens) — semantically identical to
    * `filter(split(text, "\\s+"), t -> length(t) > 0)` but with no regex
    * engine and no empty tokens ever materialized; differential-tested
    * against java.util.StringTokenizer and the split-based spelling.
    */
  def tokens(text: Column): Column =
    graft.functions.WhitespaceTokens(text)

  /** The built-ins-only spelling of `tokens` (identical output), kept as
    * the no-custom-code fallback and differential check.
    */
  def tokensBuiltins(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** word -> count over a text column; sorted by word to match the
    * reference's reducer output ordering (SURVEY §2.4: MapReduce sorts by
    * key for free, Spark needs the explicit orderBy).
    */
  def wordCount(lines: DataFrame, textCol: String): DataFrame =
    lines
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Streaming-pipeline normalization applied batch-side: uppercase before
    * counting (docs/README.md:257 "convertidas para maiúsculas"), top-k by
    * frequency (the word-cloud reading of the lab spec, SURVEY §2.4).
    * Total order: count desc, then word asc (tie-break, SURVEY §7 risk 6).
    */
  def topWords(lines: DataFrame, textCol: String, k: Int): DataFrame =
    lines
      .select(explode(tokens(col(textCol))).as("w"))
      .select(upper(col("w")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(k)

  /** Recursive text scan (SURVEY §2.1 S1): every text file under `dir`,
    * any nesting depth, one record per line — the reference's
    * `mapreduce.input.fileinputformat.input.dir.recursive=true` scan
    * (cluster/tools/run_fault_tests.py:28).
    */
  def readTextDir(spark: SparkSession, dir: String): Dataset[String] =
    spark.read.option("recursiveFileLookup", "true").textFile(dir)

  /** Sorted tab-separated text sink (SURVEY §2.1 S2): `word\tcount` lines,
    * the reference's TextOutputFormat contract
    * (…fault_test_20251115-181926.job.log:176). `counts` ends in
    * `orderBy("word")`, so the write range-partitions on word and part files
    * are globally sorted in file-name order — same contract as the
    * reference's single sorted reduce output, without forcing one task.
    * Default mode errors if the path exists (S3 output-exists guard, the
    * reference's FileAlreadyExistsException behavior); pass
    * overwrite = true for the harness's pre-delete semantics.
    */
  def writeTsv(counts: DataFrame, path: String, overwrite: Boolean = false): Unit =
    counts
      .select(concat_ws("\t", col("word"), col("cnt")).as("value"))
      .write.mode(if (overwrite) "overwrite" else "errorifexists")
      .text(path)
}

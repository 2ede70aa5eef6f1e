package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus fixtures reproducing the reference's synthetic
  * WordCount data (cluster/shared/generate_wordcount_data.sh:15: 13
  * whitespace-separated tokens per line — 11 fixed Portuguese words plus
  * idx<file> and linha<line>).
  *
  * Generated distributively from spark.range (no driver-side loop), so the
  * same generator scales from the 3x1000-line test fixture to the
  * reference's 12x3M corpus and beyond. Expected counts are closed-form
  * (FIXTURES.md A1): fixed words -> files*linesPerFile, idx<k> ->
  * linesPerFile, linha<i> -> files.
  */
object CorpusGenerator {

  val FixedWords: Seq[String] = Seq(
    "hadoop", "tolerancia", "falhas", "desempenho", "wordcount", "texto",
    "dado", "experimento", "resiliencia", "throughput", "latencia")

  /** One line per (file idx, line i), reference token order: 6 fixed words,
    * idx<k>, 5 fixed words, linha<i>.
    */
  def referenceCorpus(spark: SparkSession, files: Int, linesPerFile: Int): Dataset[String] = {
    import spark.implicits._
    val head = FixedWords.take(6).mkString(" ")
    val tail = FixedWords.drop(6).mkString(" ")
    spark.range(files.toLong * linesPerFile)
      .select(concat_ws(" ",
        lit(head),
        concat(lit("idx"), (col("id") / linesPerFile).cast("long")),
        lit(tail),
        concat(lit("linha"), col("id") % linesPerFile)).as("value"))
      .as[String]
  }

  /** Closed-form expected word counts for `referenceCorpus`. */
  def expectedCounts(files: Int, linesPerFile: Int): Map[String, Long] = {
    val n = files.toLong * linesPerFile
    val fixed = FixedWords.map(_ -> n)
    val idx = (0 until files).map(k => s"idx$k" -> linesPerFile.toLong)
    val linha = (0 until linesPerFile).map(i => s"linha$i" -> files.toLong)
    (fixed ++ idx ++ linha).toMap
  }
}

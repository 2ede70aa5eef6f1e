package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only A/B harness for the searchBm25 spelling decision (r16):
  * the old four-tokenize-scan derivation vs the shipped single
  * tagged-token-scan derivation, alternating on one session, min-of-N.
  * Usage: tools/run.sh graft.tools.Bm25Ab [sfDir] [reps]
  */
object Bm25Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tuning.configureForInput(spark, sfDir)
    val terms = Seq("spark", "hash", "merge") // the declared query's terms
    val (k, k1, b) = (20, 1.2, 0.75)

    def oldSpelling(): DataFrame = {
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val tk = docs.select(col("doc_id"),
        explode(graft.core.WordCount.tokens(col("text"))).as("term"))
      val dlen = tk.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val avg = dlen.agg(
        (sum(col("len")).cast("double") / count(lit(1))).as("avglen"))
      val perDoc = tk.filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = perDoc.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      perDoc
        .join(broadcast(dfT), Seq("term"))
        .join(dlen, Seq("doc_id"))
        .crossJoin(broadcast(n.crossJoin(avg)))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("w",
          col("idf") * (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avglen"))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          round(sum(col("w").cast(DecimalType(18, 12))).cast("double"), 6).as("score"))
        .select("doc_id", "n_terms", "score")
        .orderBy(col("score").desc, col("doc_id"))
        .limit(k)
    }

    def newSpelling(): DataFrame = graft.functions.TextAnalysis.searchBm25(
      graft.Tables.load(spark, sfDir, "documents"), terms, k)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(oldSpelling _); time(newSpelling _)
    val os = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ns = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => os += time(oldSpelling _); ns += time(newSpelling _) }
    println(f"[bm25ab] old min=${os.min}%.3f runs=${os.map(v => f"$v%.3f").mkString(",")}")
    println(f"[bm25ab] new min=${ns.min}%.3f runs=${ns.map(v => f"$v%.3f").mkString(",")}")
    spark.stop()
  }
}

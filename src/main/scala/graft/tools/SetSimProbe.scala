package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: stage-by-stage cost split of dedup_setsim_pairs, to find
  * where the prefix-filter pipeline spends its time before optimizing.
  */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val threshold = 0.5

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sets = docs
      .withColumn("tokens", graft.core.WordCount.tokens(col("text")))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles",
        expr("transform(sequence(1, size(tokens) - 2), i -> concat_ws(' ', slice(tokens, i, 3)))"))
      .select(col("doc_id"), array_distinct(col("shingles")).as("sset"))
    timed("sets count")(println("  n=" + sets.count()))
    println("  avg set size: " + sets.select(avg(size(col("sset")))).head().getDouble(0))

    val ex = sets.select(col("doc_id"), size(col("sset")).as("sz"), explode(col("sset")).as("s"))
    timed("exploded count")(println("  n=" + ex.count()))
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    timed("dfreq count")(println("  n=" + dfreq.count()))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("s"), col("doc_id"), col("sz"))
    timed("prefix count")(println("  n=" + prefix.count()))
    val cand = prefix.alias("a")
      .join(prefix.hint("shuffle_hash").alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(threshold) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    timed("cand pre-distinct count")(println("  n=" + cand.count()))
    val dcand = cand.distinct()
    timed("cand distinct count")(println("  n=" + dcand.count()))
    timed("full query")(
      graft.operators.Dedup.setSimilarityPairs(docs, threshold)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

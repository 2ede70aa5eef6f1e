package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase timings for dedup_semantic — separates the k-means fit,
  * the cell assignment, and the within-cell pair join, so optimization
  * effort lands on the phase that actually dominates. `assign-composed`
  * keeps the pre-r6 composed literal-array spelling alive as a timing
  * differential against the native `CellScores` path (the r6 fix for the
  * huge-method JIT bailout — see CellScores scaladoc). Usage:
  * SemBench [sfDir] [cpus]; best-of-2 per phase like graft.Bench.
  */
object SemBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val nCells = graft.operators.Similarity.cellsFor(n)
    println(s"n=$n nCells=$nCells")

    def time2(label: String)(body: => Unit): Unit = {
      def once: Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val a = once; val b = once
      println(f"$label%-16s ${math.min(a, b)}%.3f s (runs $a%.3f / $b%.3f)")
    }

    time2("fit") {
      graft.operators.Similarity.fitCentroids(emb, nCells)
    }
    val cents = graft.operators.Similarity.fitCentroids(emb, nCells)
    time2("assign-composed") {
      import graft.functions.VectorDot
      val scores = array(cents.map(c =>
        lit(c.foldLeft(0.0)((a, x) => a + x * x)) - lit(2.0) * VectorDot(col("v"),
          array(c.map(lit).toSeq: _*))).toSeq: _*)
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(VectorDot(col("v"), col("v"))))
        .withColumn("scores", scores)
        .withColumn("cell", expr("cast(array_position(scores, array_min(scores)) as int)"))
        .select("vec_id", "v", "nrm", "cell")
        .write.format("noop").mode("overwrite").save()
    }
    time2("assign-native") {
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(graft.functions.VectorDot(col("v"), col("v"))))
        .withColumn("scores", graft.functions.CellScores(col("v"), cents))
        .withColumn("cell", expr("cast(array_position(scores, array_min(scores)) as int)"))
        .select("vec_id", "v", "nrm", "cell")
        .write.format("noop").mode("overwrite").save()
    }
    time2("pairs") {
      graft.operators.Similarity.semanticNearDupPairs(emb, cents)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: stage timing for dedup_clusters — candidate pairs vs the
  * connected-components loop.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    graft.operators.Dedup.ngramJaccardPairsRaw(docs, 0.01).count() // warm
    var t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.ngramJaccardPairsRaw(docs, 0.01)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val n = graft.operators.Dedup.connectedComponents(pairs).count()
    val tCc = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val full = graft.operators.Dedup.nearDupClusters(docs).count()
    val tFull = (System.nanoTime() - t0) / 1e9
    println(f"pairs=$nPairs%d in $tPairs%.2fs; cc rows=$n%d in $tCc%.2fs; full query rows=$full%d in $tFull%.2fs")
    spark.stop()
  }
}

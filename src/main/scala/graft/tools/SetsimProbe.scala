package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Threshold-tuning probe for the set-similarity lookup: for each requested
  * threshold, times the ad-hoc (`setSimilarityLookup`) and the persisted-
  * index (`buildSetSimIndex` + `setSimilarityLookupIndexed`) paths over the
  * benched batch/corpus split (doc_id % 31) and prints row counts — the
  * evidence behind the benched entry's threshold choice (ADVICE r7: the
  * sf1 gate answer must be nonzero for the hash match to prove anything).
  * Usage: SetsimProbe <sfDir> <t1> [<t2> ...]
  */
object SetsimProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val ts = args.tail.map(_.toDouble)
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    val m = pmod(col("doc_id"), lit(31L))
    val batch = docs.filter(m === 0)
    val corpus = docs.filter(m =!= 0)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (t <- ts) {
      val (nAdhoc, sAdhoc) = time(Dedup.setSimilarityLookup(batch, corpus, t).count())
      Seq("probe_ss_postings", "probe_ss_df", "probe_ss_sets")
        .foreach(graft.Tables.dropManagedTable(spark, _))
      val (_, sBuild) = time(Dedup.buildSetSimIndex(corpus, "probe_ss", t))
      val (nIdx, sServe) = time(Dedup.setSimilarityLookupIndexed(batch, "probe_ss", t).count())
      println(f"t=$t%.2f rows_adhoc=$nAdhoc rows_indexed=$nIdx " +
        f"adhoc=${sAdhoc}%.2fs build=${sBuild}%.2fs serve=${sServe}%.2fs " +
        (if (nAdhoc == nIdx) "PARITY" else "MISMATCH"))
    }
    spark.stop()
  }
}

package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.{MisraGries, PolyHash}

/** Streaming heavy hitters — the incremental twin of the `MisraGries`
  * batch aggregate: dominant words of an unbounded token stream with
  * BOUNDED state, no per-word streaming aggregation (whose state grows
  * with the vocabulary), and no retention horizon.
  *
  * Words hash into `nBuckets` substreams; each bucket's state is one
  * Misra–Gries k-counter summary (the SAME `MisraGries.stepIn` kernel as
  * the batch aggregate), so total state is nBuckets × k counters forever.
  * Because a given word's entire mass lands in one bucket, the per-bucket
  * guarantee applies to its true global count: every word with
  * c(w) > n_bucket/(k+1) is reported, and each estimate e(w) satisfies
  * c(w) - n_bucket/(k+1) <= e(w) <= c(w) — TIGHTER than one global MG of
  * the same k, since n_bucket << n. Each micro-batch emits a snapshot row
  * per touched bucket; the latest snapshot per bucket (max n_items — it
  * is monotone) is the current sketch, and bucket summaries stay
  * independently correct, so readers merge or filter them without
  * coordination.
  */
object StreamHeavyHitters {

  final case class WordArrival(bucket: Int, word: String)

  /** Snapshot of one bucket's sketch after a micro-batch: arrivals seen
    * so far and the current counters (count-descending, word tiebreak).
    */
  final case class BucketSummary(bucket: Int, n_items: Long,
      words: Seq[String], estimates: Seq[Long])

  /** (bucket, word) arrivals for a streaming or batch documents frame —
    * pure per-row projection (tokenize + hash), identical on both.
    */
  def arrivals(docs: DataFrame, nBuckets: Int = 16): Dataset[WordArrival] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(graft.core.WordCount.tokens(col("text"))).as("word"))
      .select(pmod(PolyHash(col("word")), lit(nBuckets)).cast("int").as("bucket"),
        col("word"))
      .as[WordArrival]
  }

  /** Per-bucket MG summaries over a streaming documents frame. */
  def summaries(docs: DataFrame, k: Int = 8,
      nBuckets: Int = 16): Dataset[BucketSummary] = {
    val spark = docs.sparkSession
    import spark.implicits._
    arrivals(docs, nBuckets)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[(Long, Map[String, Long]), BucketSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (bucket, it, state) =>
        val (n0, m0) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
        val buf = mutable.HashMap.from(m0)
        var n = n0
        it.foreach { a => MisraGries.stepIn(buf, a.word, k); n += 1 }
        state.update((n, buf.toMap))
        val sorted = buf.toSeq.sortBy { case (w, c) => (-c, w) }
        Iterator(BucketSummary(bucket, n, sorted.map(_._1), sorted.map(_._2)))
      }
  }
}

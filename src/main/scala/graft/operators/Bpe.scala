package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.WordCount

/** Distributed BPE merge training (Sennrich et al., ACL 2016): learn the
  * first `nMerges` byte-pair-encoding merges from a corpus — the
  * tokenizer-construction step of a training-data pipeline.
  *
  * Scale shape: BPE iterates on the WORD-FREQUENCY table, not the corpus —
  * one corpus scan builds (word, count), and every round after that is
  * (a) one hash aggregation of adjacent symbol pairs weighted by word
  * count, (b) a 1-row argmax collected to the driver (count desc, then
  * pair lexicographic — fully deterministic), and (c) a per-row merge
  * projection. Driver state is just the merge table (`nMerges` rows);
  * the vocabulary stays distributed. `localCheckpoint` per round stops
  * lineage growth (the iterative-algorithm rule used by nearDupClusters).
  *
  * Symbol sequences ride as space-joined strings ("l o w </w>"), and a
  * merge (a,b) applies as a regex replace of "a b" with word-boundary
  * guards — Java's regexp_replace substitutes LEFT-TO-RIGHT and
  * NON-OVERLAPPING, which is exactly BPE's merge rule ("a a a" under
  * merge (a,a) yields "aa a", not "a aa"). Differential-tested against a
  * single-threaded reference implementation in OperatorsSpec.
  */
object Bpe {

  /** The learned merge table: (rank, left, right, pair_count). */
  def merges(docs: DataFrame, nMerges: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(WordCount.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", concat(
        concat_ws(" ", expr(
          "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")),
        lit(" </w>")))
      .select("syms", "n")
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val best = vocab
        .select(col("n"), split(col("syms"), " ").as("s"))
        // fully-merged words (one symbol) pair with nothing — and must be
        // dropped BEFORE the transform: sequence(1, 0) is the DESCENDING
        // [1, 0], not empty, and s[1] then faults under ANSI indexing
        .filter(size(col("s")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(s) - 1), i -> struct(s[i-1] AS a, s[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case None => exhausted = true // single-symbol vocab: nothing to pair
        case Some((a, b, cnt)) =>
          learned += ((rank, a, b, cnt))
          val pat = "(?<=^|[ ])" + Pattern.quote(a) + " " + Pattern.quote(b) + "(?=[ ]|$)"
          val applied = vocab.withColumn("syms", regexp_replace(col("syms"),
            lit(pat), lit(Matcher.quoteReplacement(a + b))))
          // checkpoint every third round: a ≤3-projection lineage re-runs
          // cheaply inside the next round's aggregation, while each
          // materialization is a whole extra job — the per-round overhead
          // that dominates wall time when the vocabulary is small
          if (rank % 3 == 2) {
            val next = applied.localCheckpoint(true)
            // next is materialized: the superseded round's blocks are dead
            org.apache.spark.sql.graft.ColumnBridge.checkpointedRdd(vocab)
              .foreach(_.unpersist(blocking = false))
            vocab = next
          } else vocab = applied
          rank += 1
      }
    }
    learned.result().toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }
}

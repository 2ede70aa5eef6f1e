package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.WordCount

/** Distributed BPE merge training (Sennrich et al., ACL 2016): learn the
  * first `nMerges` byte-pair-encoding merges from a corpus — the
  * tokenizer-construction step of a training-data pipeline.
  *
  * Scale shape: BPE iterates on the WORD-FREQUENCY table, not the corpus —
  * one corpus scan builds (word, count), and everything after that runs on
  * the vocabulary. The naive formulation launches one aggregation job per
  * merge (the argmax must see counts that reflect every earlier merge), so
  * at thousands of merges the per-job overhead dominates. This
  * implementation is EXACTLY equivalent to the sequential algorithm but
  * learns the whole merge table from a handful of jobs:
  *
  *  1. ONE aggregation job counts adjacent pairs and collects the
  *     top-(K+1) slice. The slice head is the exact global argmax; the
  *     (K+1)-th count is a ceiling `theta` on every pair outside the
  *     slice.
  *  2. A HYPOTHESIS merge sequence (initially: the slice in order — the
  *     order natural counts usually follow) is simulated per word in one
  *     typed-flatMap job, emitting the EXACT pair-count delta each step
  *     causes. The delta universe is tiny — new pairs must involve a
  *     merged symbol, so it is bounded by the symbol alphabet, not the
  *     vocabulary.
  *  3. The driver replays sequential BPE over slice + deltas: at each step
  *     it takes the argmax (count desc, then pair lexicographic) over the
  *     exactly-known counts and CERTIFIES no pair outside the slice can
  *     beat it (an unseen pair is ≤ theta + its observed delta; ties with
  *     unseen pairs fail certification). While the certified argmax
  *     matches the hypothesis, steps are accepted. On a mismatch the
  *     winner itself is still exact, so it is accepted, spliced into the
  *     hypothesis, and ONLY the simulation job re-runs — from the same
  *     checkpointed vocabulary, with no recount and no re-materialization.
  *     Every re-simulation extends the accepted prefix by at least one
  *     merge, so the loop terminates in ≤ nMerges jobs (natural text: the
  *     hypothesis survives long stretches, so a 12-merge table costs ~3
  *     simulations).
  *  4. Only if certification itself fails (the argmax sinks to the theta
  *     ceiling, i.e. the slice went stale) does the algorithm apply the
  *     accepted merges to the vocabulary, re-checkpoint, and recount — the
  *     same two jobs as round one. For nMerges ≪ K this epoch restart is
  *     the rare path, and at thousands of merges it doubles as the
  *     re-checkpoint cadence that keeps per-word re-simulation bounded.
  *
  * Differential-tested against a single-threaded reference in
  * OperatorsSpec: adversarial tie-heavy corpora degrade to more simulation
  * rounds or an epoch restart, never to a different merge table. The
  * word-level simulation is a typed flatMap — the per-partition imperative
  * exception, justified because applying a fixed merge PROGRAM to one word
  * is inherently sequential and word-local; CHOOSING the program is the
  * global, distributed part.
  */
object Bpe {

  /** One left-to-right, non-overlapping merge pass — the exact rule of the
    * reference algorithm ("a a a" under (a,a) gives "aa a"). Returns the
    * input array UNCHANGED (reference-equal) when the pair never occurs,
    * so callers can cheaply detect no-ops.
    */
  private[operators] def mergeStep(syms: Array[String], a: String, b: String): Array[String] = {
    var i = 0
    var hit = false
    while (i + 1 < syms.length && !hit) {
      if (syms(i) == a && syms(i + 1) == b) hit = true else i += 1
    }
    if (!hit) return syms
    val out = Array.newBuilder[String]
    out ++= syms.take(i)
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def pairsInto(
      syms: Array[String],
      acc: scala.collection.mutable.Map[(String, String), Long],
      w: Long): Unit = {
    var i = 0
    while (i + 1 < syms.length) {
      val k = (syms(i), syms(i + 1))
      acc(k) = acc.getOrElse(k, 0L) + w
      i += 1
    }
  }

  /** The learned merge table: (rank, left, right, pair_count). */
  def merges(docs: DataFrame, nMerges: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val debug = sys.env.contains("GRAFT_BPE_DEBUG")
    var tLap = System.nanoTime()
    def lap(tag: String): Unit = if (debug) {
      println(f"[bpe] $tag: ${(System.nanoTime() - tLap) / 1e9}%.3f s")
      tLap = System.nanoTime()
    }
    var vocab: Dataset[(String, Long)] = docs
      .select(explode(WordCount.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", concat(
        concat_ws(" ", expr(
          "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")),
        lit(" </w>")))
      .select($"syms", $"n").as[(String, Long)]
      // lazy: the first recount materializes the checkpoint blocks, so the
      // build does not pay a separate job
      .localCheckpoint(false)

    val K = 256
    lap("vocab build")
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    // ---- outer epochs: recount only when the slice goes stale ----------
    while (rank < nMerges && !exhausted) {
      // pair counts over the current vocabulary; head = true argmax
      val top: Array[(String, String, Long)] = vocab.toDF("syms", "n")
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
        .limit(K + 1)
        .as[(String, String, Long)].collect()
      lap(s"recount at rank $rank")

      if (top.isEmpty) { exhausted = true } // single-symbol vocab: nothing to pair
      else {
        val epochBudget = nMerges - rank
        val complete = top.length <= K // the slice IS the whole pair table
        val slice = if (complete) top else top.take(K)
        // any pair outside the slice has baseline count <= theta
        val theta = if (complete) 0L else top(K)._3
        val pairOrd = Ordering.Tuple2(Ordering.String, Ordering.String)

        var hypothesis: Vector[(String, String)] =
          slice.take(epochBudget).map { case (a, b, _) => (a, b) }.toVector
        var epochAccepted = Vector.empty[(String, String, Long)]
        var epochDone = false
        // each simulation extends the accepted prefix by >= 1, so this
        // inner loop runs at most epochBudget times
        while (!epochDone) {
          // ---- simulation job: exact per-step deltas of the hypothesis
          val candSeq = hypothesis
          val byStep: Map[Int, Array[(Int, String, String, Long)]] =
            (if (candSeq.length <= 1) Array.empty[(Int, String, String, Long)]
             else vocab.flatMap { case (s, n) =>
               var cur = s.split(' ')
               val out = List.newBuilder[(Int, String, String, Long)]
               var t = 0
               while (t < candSeq.length) {
                 val (a, b) = candSeq(t)
                 val next = mergeStep(cur, a, b)
                 if (!(next eq cur)) {
                   val diff = scala.collection.mutable.Map.empty[(String, String), Long]
                   pairsInto(cur, diff, -n)
                   pairsInto(next, diff, n)
                   diff.foreach { case ((x, y), d) => if (d != 0L) out += ((t, x, y, d)) }
                   cur = next
                 }
                 t += 1
               }
               out.result()
             }
               .toDF("t", "a", "b", "d")
               .groupBy("t", "a", "b").agg(sum("d").as("d"))
               .as[(Int, String, String, Long)].collect()
            ).groupBy(_._1)
          lap(s"simulate ${candSeq.length} steps")

          // ---- driver replay of sequential BPE over slice + deltas -----
          val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          slice.foreach { case (a, b, c) => counts((a, b)) = c }
          // pairs whose BASELINE is unknown (only bounded by theta); their
          // `counts` entry holds the applied delta alone
          val uncertain = scala.collection.mutable.Set.empty[(String, String)]
          val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          var t = 0
          var offScript = false
          var certFailed = false
          while (t < candSeq.length && !offScript && !certFailed &&
            accepted.size < epochBudget) {
            val step: Option[(String, String, Long)] =
              if (t == 0) Some((slice(0)._1, slice(0)._2, slice(0)._3))
              else {
                // exact counts: slice pairs always; delta-only pairs when
                // the slice is the complete table (baseline exactly 0)
                val certain = counts.iterator.collect {
                  case (p, c) if c > 0L && (complete || !uncertain(p)) => (p, c)
                }.toArray
                if (certain.isEmpty) None
                else {
                  val (w, cw) = certain.minBy { case ((a, b), c) => (-c, a, b) }
                  // certify: nothing outside the exactly-known set can win.
                  // Unseen-and-undelta'd pairs are <= theta; an uncertain
                  // delta pair q is <= theta + delta(q). A tie loses only
                  // if the winner is lexicographically smaller —
                  // unknowable for unseen pairs, so ties fail.
                  val ok = complete || (cw > theta && counts.forall {
                    case (q, dq) =>
                      !uncertain(q) || theta + dq < cw ||
                        (theta + dq == cw && pairOrd.lt(w, q))
                  })
                  if (!ok) None else Some((w._1, w._2, cw))
                }
              }
            step match {
              case None => certFailed = true
              case Some((a, b, c)) =>
                accepted += ((a, b, c))
                if ((a, b) != candSeq(t)) offScript = true // exact, but the
                // remaining deltas assumed the hypothesis — stop here
                else {
                  byStep.getOrElse(t, Array.empty).foreach { case (_, x, y, d) =>
                    val k = (x, y)
                    if (!counts.contains(k) && !complete) uncertain += k
                    counts(k) = counts.getOrElse(k, 0L) + d
                  }
                  t += 1
                }
            }
          }

          epochAccepted = accepted.toVector
          if (epochAccepted.size >= epochBudget || certFailed) {
            // budget filled, or the slice went stale (restart recounts)
            epochDone = true
          } else {
            // off-script (or hypothesis ran dry) with budget left: splice
            // the accepted prefix, re-guess the rest from current counts
            val acceptedSet = epochAccepted.map { case (a, b, _) => (a, b) }.toSet
            val guess = counts.iterator.collect {
              case (p, c) if c > 0L && (complete || !uncertain(p)) &&
                !acceptedSet(p) => (p, c)
            }.toArray
              .sortBy { case ((a, b), c) => (-c, a, b) }
              .take(epochBudget - epochAccepted.size)
              .map(_._1).toVector
            if (guess.isEmpty) epochDone = true // nothing certain to try:
            // restart the epoch with a fresh recount
            else hypothesis =
              epochAccepted.map { case (a, b, _) => (a, b) } ++ guess
          }
        }

        if (epochAccepted.isEmpty) exhausted = true // nothing certifiable
        else {
          epochAccepted.foreach { case (a, b, c) =>
            learned += ((rank, a, b, c)); rank += 1
          }
          if (rank < nMerges) {
            // epoch restart: materialize the accepted merges, recount
            val ms = epochAccepted.map { case (a, b, _) => (a, b) }
            val prev = vocab
            // lazy: the next epoch's recount materializes it; the old
            // blocks are unpersisted right after (the one re-derivation
            // rides the recount job)
            vocab = prev.map { case (s, n) =>
              var cur = s.split(' ')
              ms.foreach { case (a, b) => cur = mergeStep(cur, a, b) }
              (cur.mkString(" "), n)
            }.localCheckpoint(false)
            vocab.count() // materialize before dropping the parent blocks
            org.apache.spark.sql.graft.ColumnBridge.checkpointedRdd(prev)
              .foreach(_.unpersist(blocking = false))
          }
        }
      }
    }
    learned.result().toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** Encode a word with a fixed merge program: characters + `</w>`, then
    * every merge in rank order, each as the same left-to-right
    * non-overlapping pass the trainer used — the standard BPE encoder
    * (Sennrich ACL'16 §3.2: "we apply the learned operations in the order
    * they were learned").
    */
  private[operators] def encodeWord(w: String, ms: Array[(String, String)]): Array[String] = {
    var syms = new Array[String](w.length + 1)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    syms(w.length) = "</w>"
    var m = 0
    while (m < ms.length) {
      syms = mergeStep(syms, ms(m)._1, ms(m)._2)
      m += 1
    }
    syms
  }

  /** APPLY a learned merge table: one row per (doc_id, pos, symbol), the
    * tokenized corpus a training pipeline feeds downstream.
    *
    * Scale shape: the merge table is bounded by construction (nMerges
    * rows), so it collects and broadcasts as the per-executor merge
    * program; encoding is then a pure per-row map — zero shuffle, no
    * vocabulary join on the token stream. Applying a FIXED program to one
    * word is inherently sequential and word-local (the same justified
    * typed-map exception as the trainer's simulation step); everything
    * corpus-sized stays distributed.
    */
  def encode(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms: Array[(String, String)] = mergeTable.orderBy("rank")
      .select("left", "right").as[(String, String)].collect()
    val bc = spark.sparkContext.broadcast(ms)
    docs.select(col("doc_id"), WordCount.tokens(col("text")).as("words"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, words) =>
        val prog = bc.value
        var pos = 0
        words.iterator.flatMap { w =>
          encodeWord(w, prog).iterator.map { s =>
            val r = (id, pos, s); pos += 1; r
          }
        }
      }
      .toDF("doc_id", "pos", "symbol")
  }

  /** Per-document encoding statistics under a learned merge table:
    * word count, BPE token count, and fertility (tokens per word — THE
    * tokenizer-quality number). Same per-row shape as `encode` with the
    * counts folded in place, so the stats never shuffle the token stream.
    */
  def encodeStats(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms: Array[(String, String)] = mergeTable.orderBy("rank")
      .select("left", "right").as[(String, String)].collect()
    val bc = spark.sparkContext.broadcast(ms)
    docs.select(col("doc_id"), WordCount.tokens(col("text")).as("words"))
      .as[(Long, Seq[String])]
      .map { case (id, words) =>
        val prog = bc.value
        var nTok = 0L
        words.foreach { w => nTok += encodeWord(w, prog).length }
        (id, words.length.toLong, nTok)
      }
      .toDF("doc_id", "n_words", "n_tokens")
      .withColumn("fertility",
        when(col("n_words") > 0, col("n_tokens").cast("double") / col("n_words")))
      .orderBy("doc_id")
  }
}

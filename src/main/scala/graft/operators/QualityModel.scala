package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.WordCount
import graft.functions.TextAnalysis

/** Distributed training of a logistic quality classifier — the
  * model-distillation step of a CCNet/fastText-style curation pipeline:
  * hand-written quality heuristics provide weak labels, a linear model
  * learns to reproduce them as a smooth score, and the model (not the
  * rule) scores the corpus.
  *
  * Scale shape: batch gradient descent where EACH ITERATION IS ONE
  * AGGREGATION JOB over the checkpointed feature frame — the only thing
  * that ever reaches the driver is the (dim+1)-value gradient/loss row
  * (bounded by construction, like the k-means centroid pulls in
  * Similarity). Iterations are inherently sequential (each gradient
  * depends on the previous weights); the per-iteration work is fully
  * distributed and the feature scan is paid once.
  *
  * Determinism (the part that makes the sbt differential EXACT): every
  * per-row gradient/loss term is a double computed in a fixed expression
  * order, then cast to DECIMAL(38,18) before summing — decimal addition
  * is associative and commutative, so the distributed sum equals a
  * single-threaded sum bit-for-bit regardless of partitioning, and the
  * weight update is one deterministic double expression on the driver.
  * (A raw double sum would depend on Spark's partial-merge order and no
  * exact differential could exist.)
  */
object QualityModel {

  /** Feature dimension: bias + 5 quality signals. */
  val Dim = 6

  /** Per-document feature vector and weak label. Features are the quality
    * signals (one token pass, per-row only), each capped into a bounded
    * range so decimal gradient accumulation cannot overflow; the weak
    * label is the hand rule's own verdict (quality >= 0.5).
    */
  def features(docs: DataFrame): DataFrame =
    TextAnalysis.withQualitySignals(
      docs.withColumn("tokens", WordCount.tokens(col("text"))))
      .select(col("doc_id"),
        array(
          lit(1.0),
          least(col("n_tokens").cast("double") / 50.0, lit(4.0)),
          col("punct_ratio"),
          col("stop_ratio"),
          col("digit_ratio"),
          least(col("avg_token_len") / 10.0, lit(3.0))).as("x"),
        (col("quality") >= 0.5).cast("double").as("y"))

  /** w·x as a left-to-right fold — the same order the SQL oracle spells
    * out, so the logit is cross-engine exact.
    */
  private def logit(w: Array[Double]): Column =
    aggregate(zip_with(col("x"), array(w.map(lit(_)): _*), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v)

  private def dec(c: Column): Column = c.cast(DecimalType(38, 18))

  /** Loss-term clamp: Spark's `log` returns NULL (not -Inf) for non-positive
    * input, so a sigmoid saturated to exactly 0.0 or 1.0 in double would
    * silently DROP that row's loss term from the decimal sum. Clamping p
    * into [eps, 1-eps] keeps every row's term finite and summed; the sbt
    * single-threaded reference applies the identical clamp so the exact
    * differential holds on saturated inputs too. Gradients use the raw p
    * (no log there).
    */
  val LossEps = 1e-12

  /** Train `iters` rounds of batch GD from w = 0. Returns the weight
    * trajectory: one entry per iteration with the mean log-loss BEFORE
    * the step and the weights AFTER it.
    */
  def trainHistory(docs: DataFrame, iters: Int = 12,
      lr: Double = 2.0): Seq[(Int, Double, Array[Double])] =
    fitHistory(features(docs), Dim, iters, lr)

  /** The GD loop itself, dimension-generic: `feats` must carry
    * `x: array<double>` of length `dim` and `y: double`. Each iteration is
    * one aggregation job producing dim+1 decimal sums; everything else
    * (expression order, decimal casts, clamp) is byte-identical to what
    * `trainHistory` always did, so the 6-feature fit's committed oracle
    * literals are unchanged by this refactor.
    */
  def fitHistory(featFrame: DataFrame, dim: Int, iters: Int,
      lr: Double): Seq[(Int, Double, Array[Double])] = {
    val feats = featFrame.select("x", "y").localCheckpoint(true)
    try {
      val n = feats.count().toDouble
      var w = Array.fill(dim)(0.0)
      val hist = Seq.newBuilder[(Int, Double, Array[Double])]
      for (t <- 0 until iters) {
        val z = logit(w)
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val pc = least(greatest(p, lit(LossEps)), lit(1.0 - LossEps))
        val err = p - col("y")
        val gradAggs = (0 until dim).map(j =>
          sum(dec(err * element_at(col("x"), j + 1))).as(s"g$j"))
        val lossAgg = sum(dec(-(col("y") * log(pc) +
          (lit(1.0) - col("y")) * log(lit(1.0) - pc)))).as("loss")
        val row = feats.agg(gradAggs.head, (gradAggs.tail :+ lossAgg): _*).head()
        val loss = row.getDecimal(dim).doubleValue / n
        w = Array.tabulate(dim)(j => w(j) - lr * row.getDecimal(j).doubleValue / n)
        hist += ((t, loss, w.clone()))
      }
      hist.result()
    } finally
      // always release the checkpoint, including when an aggregation throws
      org.apache.spark.sql.graft.ColumnBridge.checkpointedRdd(feats)
        .foreach(_.unpersist(blocking = false))
  }

  /** Final trained weights (deterministic: same corpus -> same weights). */
  def trainedWeights(docs: DataFrame, iters: Int = 12,
      lr: Double = 2.0): Array[Double] =
    trainHistory(docs, iters, lr).last._3

  /** A (possibly pre-computed) training trajectory as a query result:
    * (iter, loss, weights...). Split from the fit itself so a model
    * registry can train once and serve both the trajectory query and the
    * scorer from the same fit.
    */
  def historyDF(spark: org.apache.spark.sql.SparkSession,
      hist: Seq[(Int, Double, Array[Double])]): DataFrame = {
    import spark.implicits._
    hist
      .map { case (t, loss, w) => (t, loss, w(0), w(1), w(2), w(3), w(4), w(5)) }
      .toDF("iter", "loss", "w_bias", "w_len", "w_punct", "w_stop",
        "w_digit", "w_tok_len")
      .orderBy("iter")
  }

  /** The training trajectory as a query result: (iter, loss, weights...).
    * Rows-only for the driver (an iterative fit is not single-statement
    * SQL); the exact single-threaded differential lives in OperatorsSpec.
    */
  def trainQuery(docs: DataFrame, iters: Int = 12, lr: Double = 2.0): DataFrame =
    historyDF(docs.sparkSession, trainHistory(docs, iters, lr))

  /** Score the corpus with a trained model: sigmoid(w·x) rounded to 6
    * decimals (libm exp is 1-ulp, not bit-exact, across engines — the
    * rounding rule every score-emitting query here follows) and the keep
    * decision as z >= 0, which needs no exp and is cross-engine exact.
    */
  def scoreWith(docs: DataFrame, w: Array[Double]): DataFrame =
    features(docs)
      .withColumn("z", logit(w))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("model_score"),
        (col("z") >= 0.0).as("keep"))
      .orderBy("doc_id")

  // ---- hashed n-gram model (verdict r12 item 5): fastText/CCNet-style ----

  /** Hashed-feature bucket count (small by design: the whole point of the
    * hashing trick is a FIXED model size regardless of vocabulary — Joulin
    * et al. '16 use 10M for production fastText; 32 keeps the dynamic
    * oracle's literal trajectory and the per-iteration gradient row tiny
    * while exercising the identical shape). Feature vector length is
    * NgramDim + 1 (bias first).
    */
  val NgramBucketCount = 32
  val NgramDim: Int = NgramBucketCount + 1

  /** Per-document hashed unigram+bigram feature vector: bias 1.0, then
    * each bucket's count normalized by the document's total feature count
    * (fastText's mean-of-embeddings normalization specialized to count
    * features: every x_j lands in [0, 1] and sums to 1, which bounds the
    * decimal gradient terms and makes the learning rate corpus-length
    * independent). One shuffle-free NgramBuckets scan builds the counts;
    * the empty-token-array guard scores x = bias-only instead of 0/0 NaNs.
    */
  def ngramFeatures(docs: DataFrame): DataFrame =
    TextAnalysis.withQualitySignals(
      docs.withColumn("tokens", WordCount.tokens(col("text"))))
      .withColumn("bc", graft.functions.NgramBuckets(col("tokens"), NgramBucketCount))
      .withColumn("tot", aggregate(col("bc"), lit(0L), (a, c) => a + c).cast("double"))
      .select(col("doc_id"),
        concat(
          array(lit(1.0)),
          when(col("tot") === 0.0,
            array_repeat(lit(0.0), NgramBucketCount))
            .otherwise(transform(col("bc"), c => c.cast("double") / col("tot"))))
          .as("x"),
        (col("quality") >= 0.5).cast("double").as("y"))

  /** Hashed n-gram fit: same weak label, same decimal-exact GD, 33-dim
    * hashed feature space. Fewer iterations than the hand-feature fit —
    * each trajectory row exports NgramDim + 1 literals to the dynamic
    * oracle, and 8 rounds already show the loss descending.
    */
  def trainHistoryNgram(docs: DataFrame, iters: Int = 8,
      lr: Double = 2.0): Seq[(Int, Double, Array[Double])] =
    fitHistory(ngramFeatures(docs), NgramDim, iters, lr)

  /** The n-gram training trajectory in LONG form — (iter, loss, j, w):
    * one row per weight per iteration, because 33 weight columns would be
    * unreadable and the driver's hash compare is row-shape agnostic.
    * j = 0 is the bias, j = b + 1 is hash bucket b.
    */
  def ngramHistoryDF(spark: org.apache.spark.sql.SparkSession,
      hist: Seq[(Int, Double, Array[Double])]): DataFrame = {
    import spark.implicits._
    hist.flatMap { case (t, loss, w) =>
      w.zipWithIndex.map { case (wj, j) => (t, loss, j, wj) }
    }.toDF("iter", "loss", "j", "w").orderBy("iter", "j")
  }

  /** Score with a trained n-gram model: identical contract to `scoreWith`
    * (rounded sigmoid + exp-free keep flag), features from the hashed
    * bucket space. The oracle recomputes the BUCKET COUNTS independently
    * in DuckDB (the PolyHash fold is cross-engine exact), so this query
    * verifies the featurizer end to end, not just the fit's determinism.
    */
  def scoreWithNgram(docs: DataFrame, w: Array[Double]): DataFrame =
    ngramFeatures(docs)
      .withColumn("z", logit(w))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("model_score"),
        (col("z") >= 0.0).as("keep"))
      .orderBy("doc_id")
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for the multi-consumer cut spelling (r16):
  * localCheckpoint(false) (r15, lineage-truncating) vs FreshPersist
  * (lineage-preserving) on the session_overlap session frame — the most
  * expensive of the swapped paths. Alternating, min-of-N, one session.
  * Usage: tools/run.sh graft.tools.PersistAb [sfDir] [reps]
  */
object PersistAb {
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
    val (gapMs, windowMs) = (30 * 60 * 1000L, 3600 * 1000L)

    // the two spellings differ ONLY in the session-frame cut
    def overlap(cut: DataFrame => DataFrame): DataFrame = {
      val ev = graft.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ms"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val sessions = cut(ev
        .withColumn("prev_ms", lag(col("ms"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(w))
        .groupBy("user_id", "sess_id")
        .agg(min(col("ms")).as("start_ms"), (max(col("ms")) + 1).as("end_ms")))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("ms").as("i_start"))
        .withColumn("i_end", col("i_start") + windowMs)
      val vals = sessions.select(explode(array(
          struct(lit(0).as("k"), col("start_ms").as("v")),
          struct(lit(1).as("k"), col("end_ms").as("v")))).as("s"))
        .select(col("s.k").as("k"), col("s.v").as("v"))
      val qs = incidents.select(col("incident_id"), explode(array(
          struct(lit(0).as("k"), col("i_end").as("t")),
          struct(lit(1).as("k"), (col("i_start") + 1).as("t")))).as("s"))
        .select(col("incident_id").as("qid"), col("s.k").as("k"), col("s.t").as("t"))
      graft.queries.Events.rankJoinKeyed(vals, qs)
        .groupBy(col("qid").as("incident_id"))
        .agg(sum(when(col("k") === 0, col("n_below"))
          .otherwise(-col("n_below"))).as("n_sessions"))
        .orderBy("incident_id")
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val lc = () => overlap(_.localCheckpoint(false))
    val fp = () => overlap(graft.core.FreshPersist.apply)
    time(lc); time(fp)
    val ls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ps = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => ls += time(lc); ps += time(fp) }
    println(f"[persistab] localckpt min=${ls.min}%.3f runs=${ls.map(v => f"$v%.3f").mkString(",")}")
    println(f"[persistab] freshpers min=${ps.min}%.3f runs=${ps.map(v => f"$v%.3f").mkString(",")}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale generator for the scaling-curve bench: emits every
  * driver table at `multiplier` x the sf0.1 row counts, with the same
  * schemas and comparable value distributions (segment/type/priority
  * vocabularies, date ranges, join-key fan-ins, document token mix). All
  * values derive from xxhash64 over the row id, so any scale regenerates
  * bit-identically, fully distributed, with no driver-side data. The two
  * fixed dims (region, nation) are copied verbatim from the base dir.
  *
  * Purpose: BENCH_sf1 vs a generated sf0.1 twin measures how each query's
  * time grows with a true 10x data step — the empirical check that catches
  * quadratic behavior static plan audits reason about (`tools/scale_curve.sh`).
  *
  * Usage: GenScale <outDir> <multiplier> [baseDir]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val m = args(1).toInt
    val baseDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def h(salt: Int): Column = abs(xxhash64(col("id"), lit(salt)))
    def pick(salt: Int, vals: Seq[String]): Column =
      element_at(array(vals.map(lit): _*), (h(salt) % vals.size + 1).cast("int"))
    def money(salt: Int, maxCents: Long): Column =
      round((h(salt) % maxCents) / 100.0, 2)
    def ntzDate(salt: Int, start: String, spanDays: Int): Column =
      date_add(to_date(lit(start)), (h(salt) % spanDays).cast("int"))
        .cast("timestamp_ntz")
    def gen(n: Long, parts: Int)(build: DataFrame => DataFrame): DataFrame =
      build(spark.range(0, n, 1, parts).toDF("id"))
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[genscale] wrote $name")
    }

    // fixed-size dims: verbatim copies
    for (dim <- Seq("region", "nation"))
      write(dim, spark.read.parquet(s"$baseDir/$dim.parquet"))

    val nCust = 15000L * m
    val nSupp = 1000L * m
    val nPart = 20000L * m
    val nOrders = 150000L * m

    write("customer", gen(nCust, 4 * m)(df => df.select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      (h(1) % 25).cast("int").as("c_nationkey"),
      money(2, 1000000).as("c_acctbal"),
      pick(3, Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"))
        .as("c_mktsegment"))))

    write("supplier", gen(nSupp, 2)(df => df.select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      (h(4) % 25).cast("int").as("s_nationkey"),
      money(5, 1000000).as("s_acctbal"))))

    write("part", gen(nPart, 4 * m)(df => df.select(
      col("id").as("p_partkey"),
      concat_ws(" ",
        pick(6, Seq("large", "hot", "small", "cold", "plated", "dim")),
        pick(7, Seq("ring", "bolt", "washer", "gear", "cap", "rod"))).as("p_name"),
      concat(lit("Brand#"), (h(8) % 25).cast("int")).as("p_brand"),
      pick(9, Seq("PROMO BURNISHED", "PROMO PLATED", "LARGE BRUSHED",
        "ECONOMY ANODIZED", "STANDARD POLISHED", "SMALL PLATED", "MEDIUM BURNISHED"))
        .as("p_type"),
      (h(10) % 50 + 1).cast("int").as("p_size"),
      (lit(900.0) + (h(11) % 10000) / 100.0).as("p_retailprice"))))

    write("orders", gen(nOrders, 8 * m)(df => df.select(
      col("id").as("o_orderkey"),
      (h(12) % nCust).as("o_custkey"),
      pick(13, Seq("O", "F", "P")).as("o_orderstatus"),
      money(14, 50000000).as("o_totalprice"),
      ntzDate(15, "1995-01-01", 1460).as("o_orderdate"),
      pick(16, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .as("o_orderpriority"))))

    write("lineitem", gen(600000L * m, 16 * m)(df => df.select(
      (h(17) % nOrders).as("l_orderkey"),
      (h(18) % nPart).as("l_partkey"),
      (h(19) % nSupp).as("l_suppkey"),
      (h(20) % 7 + 1).cast("int").as("l_linenumber"),
      (h(21) % 50 + 1).cast("double").as("l_quantity"),
      (lit(1000.0) + (h(22) % 9000000) / 100.0).as("l_extendedprice"),
      ((h(23) % 11) / 100.0).as("l_discount"),
      ((h(24) % 9) / 100.0).as("l_tax"),
      pick(25, Seq("N", "A", "R")).as("l_returnflag"),
      pick(26, Seq("O", "F")).as("l_linestatus"),
      ntzDate(27, "1995-01-01", 2500).as("l_shipdate"))))

    // events.ts is LONG nanoseconds, matching how the TIMESTAMP(NANOS)
    // driver table arrives through Tables.load's nanosAsLong session flag
    val baseNanos = 1709251200L * 1000000000L // 2024-03-01 UTC
    write("events", gen(100000L * m, 8 * m)(df => df.select(
      col("id").as("event_id"),
      (lit(baseNanos) + (h(28) % (30L * 86400 * 1000)) * 1000000L).as("ts"),
      (h(29) % (150L * m)).as("user_id"),
      pick(30, Seq("view", "click", "purchase", "scroll", "login", "error")).as("event_type"),
      money(31, 10000).as("value"),
      format_string("{\"k\": %d}", h(32) % 100).as("props"))))

    // documents: sentences over per-language vocabularies (stopword-bearing
    // so langid/quality/dedup have realistic work), 20-99 tokens per doc
    val vocabs = Map(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "batch", "part",
        "spark", "line", "column", "order", "small", "sort", "fast", "value",
        "scan", "hash", "slow", "group", "query", "agg", "table", "stream",
        "filter", "big", "merge", "join", "window", "key", "data", "customer",
        "vector"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "datos", "tabla",
        "consulta", "flujo", "rapido", "lento", "clave", "grupo", "valor"),
      "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "donnee",
        "table", "rapide", "flux", "cle", "groupe", "valeur", "requete"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "daten",
        "tabelle", "schnell", "langsam", "gruppe", "wert", "anfrage"),
      "zh" -> Seq("数据", "表", "查询", "流",
        "快", "慢", "排序", "分组", "键",
        "值"))
    val langCol = when(h(33) % 10 < 6, "en").otherwise(pick(34, Seq("es", "fr", "de", "zh")))
    val sentence = vocabs.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("array(", ",", ")")
      lang -> (s"concat_ws(' ', transform(sequence(1, cast(20 + abs(xxhash64(id, 35)) % 80 as int)), " +
        s"i -> element_at($arr, cast(abs(xxhash64(id * 131 + i, 36)) % ${words.size} as int) + 1)))")
    }
    write("documents", gen(5000L * m, 4 * m)(df => df
      .withColumn("lang", langCol)
      .withColumn("text",
        when(col("lang") === "en", expr(sentence("en")))
          .when(col("lang") === "es", expr(sentence("es")))
          .when(col("lang") === "fr", expr(sentence("fr")))
          .when(col("lang") === "de", expr(sentence("de")))
          .otherwise(expr(sentence("zh"))))
      .select(
        col("id").as("doc_id"), col("text"), col("lang"),
        concat(lit("src"), h(37) % 20).as("source"),
        length(col("text")).cast("long").as("n_chars"))))

    write("embeddings", gen(2000L * m, 2 * m)(df => df.select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> cast((abs(xxhash64(id * 67 + d, 38)) % 2001 - 1000) / 1000.0 as float))")
        .as("embedding"),
      (h(39) % 10).cast("int").as("label"))))

    spark.stop()
  }
}

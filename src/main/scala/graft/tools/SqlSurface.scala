package graft.tools

import org.apache.spark.sql.SparkSession

/** Dual-surface parity probe: the DuckDB oracle SQL for each query is, for
  * the most part, plain ANSI — so it should ALSO run on Spark itself over
  * the registered table views (`Tables.registerAll`) and produce the same
  * frame as the DataFrame implementation. Every query where that holds is
  * direct evidence the engine exposes a working `spark.sql` surface, not
  * just the Scala API (reference's users drive Spark through notebooks:
  * /root/reference/docs/README.md:257).
  *
  * Prints one line per query: MATCH (verbatim), XLATE (matches after the
  * mechanical dialect mapping below), DIFF, or NOSQL, plus summary counts.
  */
object SqlSurface {

  /** Mechanical DuckDB→Spark dialect mapping, purely textual. Only
    * function-name spellings with IDENTICAL semantics are mapped —
    * anything subtler (0- vs 1-based indexing, `range` upper-bound
    * exclusivity, `//` on doubles) is deliberately left untranslated and
    * surfaces as NOSQL. Parity of every translated query is verified
    * against the DataFrame result, so a wrong mapping cannot pass
    * silently.
    */
  def toSparkSql(sql: String): String = {
    var s = sql
    // DuckDB string literals keep backslashes verbatim; Spark's parser
    // treats them as escapes. Doubling reproduces DuckDB's reading of
    // every embedded regex ('\s+', '\d', ...) exactly.
    s = s.replace("\\", "\\\\")
    // strftime(expr, fmt): DuckDB %-codes → java.time pattern letters.
    s = s.replace("strftime(", "date_format(")
    s = s.replace("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss")
      .replace("%Y-%m-%d %H:%M", "yyyy-MM-dd HH:mm")
      .replace("%Y-%m-%d", "yyyy-MM-dd")
    s = s.replace("epoch_ms(", "unix_millis(")
    s = s.replace("string_split_regex(", "split(")
    s = s.replace("list_filter(", "filter(")
      .replace("list_transform(", "transform(")
      .replace("list_contains(", "array_contains(")
      .replace("list_distinct(", "array_distinct(")
      .replace("list_sort(", "array_sort(")
    // both engines: explode/unnest in SELECT position yields one row per
    // element; inclusive-bounds generate_series == Spark sequence
    s = s.replace("unnest(", "explode(")
      .replace("generate_series(", "sequence(")
    // DuckDB len() on lists == Spark size(); word-bounded to avoid
    // touching identifiers containing "len"
    s = """\blen\(""".r.replaceAllIn(s, "size(")
    // exact interpolated percentile; JSON path string extraction; day
    // difference with identical (start, end) argument order
    s = s.replace("quantile_cont(", "percentile(")
      .replace("json_extract_string(", "get_json_object(")
      .replace("date_diff('day',", "timestampdiff(DAY,")
    // DuckDB struct literal {'k': v, ...} → named_struct('k', v, ...).
    // Field access (x.k), struct max/comparison order, and NULL struct
    // handling agree between the engines; the quoted-key pattern cannot
    // collide with regex quantifiers ({2,}) inside string literals.
    // Only the key-value separator colon is rewritten (keyed on the
    // quoted-identifier prefix) so a colon INSIDE a value — e.g. a time
    // string '10:00:00' — survives untouched.
    s = """\{('[A-Za-z_]+'\s*:\s*[^,{}]+(?:,\s*'[A-Za-z_]+'\s*:\s*[^,{}]+)*)\}""".r
      .replaceAllIn(s, m =>
        "named_struct(" +
          """('[A-Za-z_]+')\s*:""".r.replaceAllIn(m.group(1), "$1,") + ")")
    s
  }

  /** The driver's comparison frame: columns sorted by name, values
    * stringified (doubles at 9 significant digits — enough to expose any
    * real divergence, immune to the final-bit formatting noise of two
    * distinct physical plans), rows sorted.
    */
  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => f"$d%.9g"
        case f: Float => f"$f%.6g"
        case x => x.toString
      }.mkString("|")).toSeq.sorted
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("graft-sql-surface")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, dir)

    val all = (graft.SparkEntry.oracleSql ++
      graft.SparkEntry.oracleSqlDynamic(spark, dir)).toSeq.sortBy(_._1)
    var matched, xlated, diff, nosql = List.empty[String]
    for ((name, sql) <- all) {
      def run(q: String): Option[Seq[String]] =
        try Some(canon(spark.sql(q))) catch { case _: Throwable => None }
      val verbatim = run(sql)
      val (viaSql, tag) = verbatim match {
        case Some(v) => (Some(v), "verbatim")
        case None => (run(toSparkSql(sql)), "xlate")
      }
      viaSql match {
        case None => nosql ::= name
        case Some(s) =>
          val viaDf =
            try canon(graft.SparkEntry.queries(name)(spark, dir))
            catch { case e: Throwable => Seq(s"DF-ERR ${e.getMessage}") }
          if (s == viaDf) { if (tag == "verbatim") matched ::= name else xlated ::= name }
          else {
            diff ::= name
            println(s"DIFF  $name ($tag)  sql=${s.size} rows df=${viaDf.size} rows")
            s.diff(viaDf).take(2).foreach(r => println(s"  sql-only: $r"))
            viaDf.diff(s).take(2).foreach(r => println(s"  df-only:  $r"))
          }
      }
    }
    println(s"MATCH ${matched.size}: ${matched.sorted.mkString(" ")}")
    println(s"XLATE ${xlated.size}: ${xlated.sorted.mkString(" ")}")
    println(s"NOSQL ${nosql.size}: ${nosql.sorted.mkString(" ")}")
    println(s"DIFF  ${diff.size}: ${diff.sorted.mkString(" ")}")
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Write-side layout: the properties scan pruning relies on, proven on
  * the actual written files.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("date-partitioned events: a day read is a partition filter, not a data filter") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-days").toString
    Layout.writeDatePartitioned(events, dir)
    val day = events.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(min("day")).as[String].collect().head
    val read = Layout.readDay(spark, dir, day)
    // the day predicate resolves against directory names (catalog-level
    // pruning), leaving NO post-scan data filter on day
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(Seq("isnotnull(day", "(day").exists(m =>
      plan.split("PartitionFilters", 2)(1).takeWhile(_ != ']').contains(m)))
    // correctness: identical rows to filtering the unpartitioned table
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(read.count() === expected && expected > 0)
    // and only that day's files were read: the executed scan's file
    // metric is below the table's total (inputFiles on the DataFrame
    // reports the unpruned relation, so the metric is the honest signal)
    val allFiles = spark.read.parquet(dir).inputFiles.length
    val scan = read.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numFiles").value < allFiles)
  }

  test("range-clustered corpus: file key intervals are pairwise disjoint") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-range").toString
    Layout.writeRangeClustered(docs, dir, "doc_id", nFiles = 4)
    val files = spark.read.parquet(dir).inputFiles
    assert(files.length === 4)
    // per-file [min, max] — the footer stats a key probe skips on
    val ranges = files.map { f =>
      spark.read.parquet(f).agg(min("doc_id"), max("doc_id"))
        .as[(Long, Long)].collect().head
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA < loB)
      case _ =>
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(dir).count() === docs.count())
  }
}

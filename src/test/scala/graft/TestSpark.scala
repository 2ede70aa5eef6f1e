package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark_guide: one per suite via
  * lazy val; sbt runs suites in one forked JVM so this is one per run).
  */
object TestSpark {
  lazy val spark: SparkSession = graft.Tables.configure(SparkSession.builder())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // Streaming state lives in RocksDB — the 100 TB state backend (the
    // default HDFS-backed in-memory store keeps every key's state on the
    // executor heap; at scale the executors OOM on STATE, not data). All
    // stateful streaming suites therefore exercise the production
    // provider; StreamingSpec additionally soaks it for bounded state
    // under sustained keys.
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .getOrCreate()
}

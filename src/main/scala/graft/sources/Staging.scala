package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Dataset staging / file management mirroring the harness's HDFS ops
  * (cluster/tools/run_fault_tests.py:98 `mkdir -p`, :105-113 idempotent
  * test-then-put prep, :109-113 `put -f`, :120 `rm -r -f`), expressed via
  * the Hadoop FileSystem API so the identical code targets the local FS in
  * tests and HDFS/S3A on a cluster — the path's scheme picks the
  * implementation.
  */
object Staging {

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(conf(spark))

  /** `mkdir -p`: true if the dir exists afterwards. */
  def ensureDir(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    fs(spark, p).mkdirs(p)
  }

  /** `test -d` / `test -e`. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fs(spark, p).exists(p)
  }

  /** `put -f`: recursive copy src -> dest, overwriting. */
  def stage(spark: SparkSession, src: String, dest: String): Unit = {
    val (s, d) = (new Path(src), new Path(dest))
    FileUtil.copy(fs(spark, s), s, fs(spark, d), d,
      /* deleteSource = */ false, /* overwrite = */ true, conf(spark))
  }

  /** `rm -r -f`: true if something was deleted. */
  def clear(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fs(spark, p).delete(p, /* recursive = */ true)
  }

  /** `ls`: immediate child names (not paths), sorted. */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    fs(spark, p).listStatus(p).map(_.getPath.getName).toSeq.sorted
  }

  /** Idempotent dataset prep (run_fault_tests.py:105-113): stage src into
    * dest only when dest is missing; returns true when a copy happened.
    */
  def prepDataset(spark: SparkSession, src: String, dest: String): Boolean =
    if (exists(spark, dest)) false
    else { stage(spark, src, dest); true }
}

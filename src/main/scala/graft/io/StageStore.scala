package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet stage store with retention and a "latest" pointer.
  *
  * Reference: `ServiceAlertBase.py:170-202` writes each run under a
  * timestamped key, prunes to the newest 5, and refreshes a `current/`
  * convenience copy (SURVEY.md Op-5). Spark-native form: one parquet write
  * per version directory + filesystem-level retention; the latest pointer is
  * a re-write (object stores have no atomic rename, so serving readers list
  * `latest/` — same contract as the reference's copy).
  */
class StageStore(spark: SparkSession, root: String, retain: Int = 5) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write one version; returns its path. `versionId` must be monotonically
    * increasing (the caller injects the clock — deterministic in tests). */
  def write(df: DataFrame, versionId: Long): String = {
    val dir = s"$root/v=$versionId"
    df.write.mode("overwrite").parquet(dir)
    df.write.mode("overwrite").parquet(s"$root/latest")
    prune()
    dir
  }

  /** Newest-first version ids present. */
  def versions(): Seq[Long] = {
    val p = new Path(root)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted(Ordering[Long].reverse)
  }

  /** Op-5 retention: drop all but the newest `retain` versions. */
  def prune(): Unit =
    versions().drop(retain).foreach { v =>
      fs.delete(new Path(s"$root/v=$v"), true)
    }

  def readLatest(): DataFrame = spark.read.parquet(s"$root/latest")

  def read(versionId: Long): DataFrame = spark.read.parquet(s"$root/v=$versionId")
}

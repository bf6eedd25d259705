package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Per-row blob writer (SURVEY.md Op-7): each row becomes one object under
  * `root`, named by `nameCol`, with `bodyCol` as its bytes — the engine's
  * form of the reference's per-email/per-image object-store uploads
  * (ServiceAlertEmailer.py:820-826, ServiceAlertAugmenter.py:452-475).
  *
  * Executed with foreachPartition: every partition opens ONE filesystem
  * handle and streams its rows out, so the write parallelism is the data's
  * partitioning and nothing is collected to the driver. Writes are
  * idempotent per name (overwrite), matching the reference's replay-safe
  * upload loop.
  */
object BlobSink {

  /** Write each row's `bodyCol` (string) to `root/<nameCol>`. Returns the
    * number of blobs written. */
  def write(df: DataFrame, root: String, nameCol: String, bodyCol: String): Long = {
    val counter = df.sparkSession.sparkContext.longAccumulator("blobs_written")
    df.select(col(nameCol).cast("string"), col(bodyCol).cast("string"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        if (it.hasNext) {
          // fresh default Configuration per partition: Hadoop's Configuration
          // is not serializable, and the sink targets a plain fs URI
          val fs = new Path(root).getFileSystem(
            new org.apache.hadoop.conf.Configuration())
          it.foreach { row =>
            val name = row.getString(0)
            val body = row.getString(1)
            // fail deterministically with the offending row BEFORE touching
            // the filesystem: fs.create(overwrite) truncates first, so any
            // late failure (null body) would destroy a previously-good blob
            require(name != null && name.nonEmpty,
              "BlobSink: null/empty object name")
            val child = new Path(name)
            require(!child.isAbsolute && child.toUri.getScheme == null &&
              !name.split("/").contains(".."),
              s"BlobSink: object name escapes the sink root: '$name'")
            require(body != null, s"BlobSink: null body for object '$name'")
            val out = fs.create(new Path(root, name), true)
            try out.write(body.getBytes(StandardCharsets.UTF_8))
            finally out.close()
            counter.add(1L)
          }
        }
      }
    counter.value
  }
}

package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** JSON document sink: serialise a (small, serving-layer) DataFrame to one
  * JSON array document — the reference's `orient='records'` S3 PUT
  * (`ServiceAlertBroadcaster.py:100-114`, SURVEY.md Op-6).
  *
  * The collect here is deliberate and bounded: these are the final API
  * artifacts (24 documents of already-filtered alerts), not a data path. At
  * 100 TB the inputs upstream stay distributed; only the post-filter
  * serving rows (thousands) pass through the driver. For large exports use
  * `df.write.json` instead.
  */
object JsonDocumentSink {

  /** Render as a single JSON array string (records orient, ISO dates). */
  def renderDocument(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** Filename contract mirroring ServiceAlertOutputFileConfig
    * (ServiceAlertBroadcaster.py:24-40): {version}/{prefix}-{window}-
    * {planned}.json. */
  def documentName(version: String, prefix: String, window: String,
                   planned: Boolean): String = {
    val p = if (planned) "planned" else "unplanned"
    s"$version/$prefix-$window-$p.json"
  }

  /** Write one document under `rootDir` (local/posix path; object-store
    * deployments swap in their client here). Returns the full path. */
  def write(df: DataFrame, rootDir: String, name: String): String = {
    val path = Paths.get(rootDir, name)
    Files.createDirectories(path.getParent)
    Files.write(path, renderDocument(df).getBytes(StandardCharsets.UTF_8))
    path.toString
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-checksum machinery (the reference's incremental-processing key).
  *
  * Reference: `ServiceAlertBase.py:21-53` — per-row
  * `md5("".join(str(v) for v in row) + salt)`, parallelised over a process
  * pool. In Spark the checksum is one codegen'd expression evaluated inside
  * the scan stage, so partition parallelism subsumes the pool (SURVEY.md
  * §2.2 Op-9/Op-10) and the cost is a single pass with no extra shuffle.
  */
object Checksum {

  val ChecksumCol = "InputChecksum"

  /** Deterministic per-row md5 over the given columns (in the given order)
    * plus a salt. NULLs are rendered as the empty string via `concat_ws`;
    * callers that need Python `str(nan)` parity should pre-coalesce. */
  def rowChecksum(cols: Seq[Column], salt: String = ""): Column =
    md5(concat_ws("", (cols.map(_.cast("string")) :+ lit(salt)): _*))

  /** Attach the checksum column over all current columns, sorted by name so
    * the checksum is stable under column reordering. */
  def withChecksum(df: DataFrame, salt: String = ""): DataFrame =
    df.withColumn(ChecksumCol,
      rowChecksum(df.columns.sorted.toIndexedSeq.map(col), salt))
}

package graft.serve

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Targeted-notification query layer (the reference's Emailer).
  *
  * Reference: `ServiceAlertEmailer.py:45-826` — ~120 per-recipient configs,
  * each a predicate over the augmented alerts (SQL-ish query strings,
  * ward-membership array checks, service-area equality), an idempotency
  * registry of sent mail, and row→HTML rendering with null-field pruning
  * (SURVEY.md §2.7 Ops 48-52 + Op-31).
  */
object Emailer {

  /** One recipient config: a named predicate surface. `predicateSql` is a
    * Spark SQL boolean expression string — the engine's equivalent of the
    * reference's pandas query strings (Op-48a); `rowFilter` covers the
    * callable form (Op-48b). */
  case class EmailConfig(
      name: String,
      receivers: Seq[String],
      predicateSql: Option[String] = None,
      rowFilter: Option[Row => Boolean] = None)

  /** Op-52: stable config identity = sha256 over receivers+focus. */
  def configKey(cfg: EmailConfig): Column =
    sha2(lit(cfg.receivers.sorted.mkString(",") + "|" + cfg.name), 256)

  /** Op-48: apply one config's predicates. */
  def filterFor(alerts: DataFrame, cfg: EmailConfig): DataFrame = {
    val bySql = cfg.predicateSql.fold(alerts)(alerts.filter)
    cfg.rowFilter.fold(bySql)(f => bySql.filter(f))
  }

  /** Op-49: ward-membership config predicate builder. */
  def wardPredicate(ward: String): String =
    s"array_contains(inferred_wards, '$ward') AND (area_type IS NULL OR area_type <> 'Citywide')"

  /** Op-50: service-area config predicate builder. */
  def serviceAreaPredicate(area: String): String = s"service_area = '$area'"

  /** Op-31: idempotency — drop alert×config pairs already sent. The sent
    * registry holds keys `sha256(config)_status_Id`. */
  def unsent(alerts: DataFrame, cfg: EmailConfig, sentKeys: DataFrame): DataFrame = {
    val key = concat_ws("_", configKey(cfg), col("status"), col("id").cast("string"))
    graft.operators.Dedup.notYetDone(
      alerts.withColumn("__sent_key", key), sentKeys, col("__sent_key"), col("sent_key"))
      .drop("__sent_key")
  }

  /** Op-51: row→document rendering with null-field pruning and array
    * joining — pure column expression so rendering stays distributed;
    * only the final (small) document set is collected by the sink. */
  def renderColumn(statusCol: Column, titleCol: Column, areaCol: Column,
                   wardsCol: Column): Column =
    concat_ws(" | ",
      concat(lit("subject="),
        when(statusCol === "Closed", lit("RESOLVED: ")).otherwise(lit("ALERT: ")),
        titleCol),
      when(areaCol.isNotNull, concat(lit("area="), areaCol)),
      when(wardsCol.isNotNull && size(wardsCol) > 0,
        concat(lit("wards="), array_join(wardsCol, ", "))))

  /** Full pass: for every config, the unsent matching alerts with their
    * rendered documents and idempotency keys. One cached scan fans out to
    * all configs (the reference loops ~120 configs over one frame). */
  def fanOut(alerts: DataFrame, configs: Seq[EmailConfig],
             sentKeys: DataFrame): Map[String, DataFrame] =
    configs.map { cfg =>
      cfg.name -> unsent(filterFor(alerts, cfg), cfg, sentKeys)
    }.toMap
}

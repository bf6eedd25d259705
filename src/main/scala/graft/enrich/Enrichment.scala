package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Row-wise effectful enrichment stages (the reference's LLM/geocoder ops).
  *
  * Reference: `ServiceAlertAugmenter.py:226-409` — per-row chat-API calls
  * drafting tweet text (≤280 chars, retries with temperature escalation,
  * endpoint fallback) and extracting candidate locations (JSON shape
  * repair); SURVEY.md §2.8 Ops 53-57.
  *
  * Engine shape: each external service sits behind a pure trait; the stage
  * is a `mapPartitions` (per-partition client init + connection reuse,
  * bounded concurrency by partition count), NOT a UDF — so retries, rate
  * limits and fallbacks live in the client, outside the query plan, and the
  * planner can't multiply side effects by re-evaluating an expression.
  * Deterministic stubs stand in for the real services in tests and queries:
  * the container has no network egress, and the *plumbing* (work-limiting,
  * join-back, column contracts) is what the engine owns.
  */
object Enrichment {

  /** Op-53: the drafting service boundary. */
  trait Drafter extends Serializable {
    def draft(id: Long, title: String, description: String): Option[String]
  }

  /** Deterministic stub with the reference's output contract: ≤280 chars,
    * never a single char, None on empty input (LLM failure analogue). */
  object StubDrafter extends Drafter {
    val CharLimit = 280
    def draft(id: Long, title: String, description: String): Option[String] = {
      val body = s"$title: $description"
      if (body.trim.length < 2) None
      else Some(body.substring(0, math.min(body.length, CharLimit)))
    }
  }

  /** Retry with escalation then fallback — the reference's 3×retry +
    * temperature bump + endpoint fallback (ServiceAlertAugmenter.py:385-396)
    * as a generic combinator the real client plugs into. */
  def withRetries[T](attempts: Int)(primary: Int => Option[T])(
      fallback: => Option[T]): Option[T] = {
    var i = 0
    while (i < attempts) {
      primary(i) match {
        case some @ Some(_) => return some
        case None => i += 1
      }
    }
    fallback
  }

  /** Op-53 stage: draft social text for (id, title, description) rows.
    * Output joins back on id so the enrichment never widens the scan.
    *
    * `broadcastJoinBack`: the typed mapPartitions output carries NO size
    * stats, so size-based planning cannot pick a broadcast for the
    * join-back and falls to a sort-merge join — two exchanges for a frame
    * that, in the reference's use, is bounded by DRAFT_LIMIT. Pass true
    * when the input is work-limited (parameter-bounded, the Augmenter
    * contract); leave false for unbounded corpora (q53 drafts every
    * document). */
  def draftStage(df: DataFrame, drafter: Drafter,
                 broadcastJoinBack: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val drafted = df.select(col("id").cast("long"), col("title"), col("description"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // per-partition client init goes here (one connection per partition)
        it.map { case (id, t, d) => (id, drafter.draft(id, t, d)) }
      }
      .toDF("id", "tweet_text")
    df.join(if (broadcastJoinBack) broadcast(drafted) else drafted,
      Seq("id"), "left")
  }

  /** Op-54: toot = tweet + hashtag(service_area) + " #CapeTown" — pure
    * column expression, no service involved. */
  def tootColumn(tweet: org.apache.spark.sql.Column,
                 hashtag: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(tweet.isNotNull,
      concat(tweet, lit("\n"), coalesce(hashtag, lit("#CityAlert")), lit(" #CapeTown")))

  /** Op-55: the location-extraction service boundary — returns candidate
    * location suggestion groups (the reference's list-of-list-of-str after
    * shape repair). */
  trait Locator extends Serializable {
    def locate(description: String): Seq[Seq[String]]
  }

  /** Deterministic stub: first two capitalised tokens as one suggestion
    * group (shape-compatible with the reference contract). */
  object StubLocator extends Locator {
    def locate(description: String): Seq[Seq[String]] = {
      val caps = "\\b[A-Z][a-z]+\\b".r.findAllIn(Option(description).getOrElse(""))
        .toSeq.distinct.take(2)
      if (caps.isEmpty) Seq.empty else Seq(caps)
    }
  }

  /** Op-55 shape repair (ServiceAlertAugmenter.py:258-279): unwrap
    * triple-nested arrays, wrap flat arrays, reject non-string content. */
  def normalizeLocationResponse(raw: Any): Seq[Seq[String]] = raw match {
    case s: Seq[_] if s.forall(_.isInstanceOf[String]) =>
      if (s.isEmpty) Seq.empty else Seq(s.map(_.toString))
    case s: Seq[_] if s.forall(_.isInstanceOf[Seq[_]]) =>
      val inner = s.map(_.asInstanceOf[Seq[_]])
      if (inner.forall(_.forall(_.isInstanceOf[String])))
        inner.map(_.map(_.toString))
      else if (inner.forall(_.forall(_.isInstanceOf[Seq[_]])))
        // triple-nested: unwrap one level
        inner.flatten.map(_.asInstanceOf[Seq[_]].map(_.toString))
      else Seq.empty
    case _ => Seq.empty
  }

  /** Op-55 stage: extract candidate location groups per row.
    * `broadcastJoinBack` as in [[draftStage]] — the typed output has no
    * stats, so opt in when the input is work-limited. */
  def locateStage(df: DataFrame, locator: Locator,
                  broadcastJoinBack: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val located = df.select(col("id").cast("long"), col("description"))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, d) => (id, locator.locate(d)) })
      .toDF("id", "location_suggestions")
    df.join(if (broadcastJoinBack) broadcast(located) else located,
      Seq("id"), "left")
  }
}

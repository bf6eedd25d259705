package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  /** Op-55 shape repair, the reference's EXACT misconstruction ladder
    * (ServiceAlertAugmenter.py:258-279):
    *
    *   1. a singleton list whose single element is a singleton list of a
    *      list unwraps ONE layer (`[[[..]]]` → `[[..]]`) — a wider triple
    *      nest is NOT unwrapped and fails validation below;
    *   2. OTHERWISE (python's elif: never after a len-1 list, even one the
    *      unwrap didn't touch — so a single-string flat array `["a"]` is
    *      rejected, a reference quirk preserved here) a flat all-string
    *      list of ≥2 wraps into a singleton;
    *   3. validation: a list, of lists, of strings — anything else is the
    *      assertion-failure path (empty result). */
  def normalizeLocationResponse(raw: Any): Seq[Seq[String]] = raw match {
    case s: Seq[_] =>
      val transformed = s match {
        case Seq(inner: Seq[_])
          if inner.length == 1 && inner.head.isInstanceOf[Seq[_]] => inner
        case _ if s.length >= 2 && s.forall(_.isInstanceOf[String]) => Seq(s)
        case _ => s
      }
      if (transformed.forall(e => e.isInstanceOf[Seq[_]] &&
          e.asInstanceOf[Seq[_]].forall(_.isInstanceOf[String])))
        transformed.map(_.asInstanceOf[Seq[_]].map(_.toString))
      else Seq.empty
    case _ => Seq.empty
  }

  /** Op-55 shape repair as a COLUMN over raw JSON payloads — the query-
    * surface form of [[normalizeLocationResponse]], so the repair is
    * oracle-checkable end-to-end (q55_shape_repair). Implements the
    * reference's misconstruction ladder (ServiceAlertAugmenter.py:258-279)
    * with `from_json` probes at the three plausible depths:
    *
    *   1. an empty array validates as-is (no suggestions);
    *   2. a CLEAN 3-level parse (every element non-null at every depth)
    *      means the model triple-nested; unwrap one layer iff both outer
    *      layers are singletons AND the unwrapped leaves are genuine
    *      strings, else the payload fails validation (a WIDER triple nest
    *      is rejected, as the reference's len-1 guard does);
    *   3. else a clean 2-level parse with genuine string leaves is the
    *      expected shape, taken as-is;
    *   4. else a clean 1-level parse of ≥2 genuine strings is a flat
    *      array, wrapped — the reference's elif never wraps a singleton
    *      (a quirk preserved here and in [[normalizeLocationResponse]]);
    *   5. anything else (invalid JSON, mixed depths, non-string leaves) is
    *      NULL — the reference's assertion failure path.
    *
    * "Genuine string" is probed via Jackson's raw-passthrough (a
    * structured element parsed as StringType yields its raw JSON text), so
    * a leaf that is itself an array/object rejects the payload exactly as
    * the reference's all-strings assertion does. Boundary: leaf strings
    * that genuinely start with '[' or '{', and JSON number leaves (raw
    * text is indistinguishable from a numeric string), would be
    * misclassified — location names are neither. */
  def repairLocationJson(payload: Column): Column = {
    import org.apache.spark.sql.types.DataType.fromDDL
    val t3 = from_json(payload, fromDDL("array<array<array<string>>>"))
    val t2 = from_json(payload, fromDDL("array<array<string>>"))
    val t1 = from_json(payload, fromDDL("array<string>"))
    val clean1 = t1.isNotNull && forall(t1, x => x.isNotNull)
    val clean2 = t2.isNotNull &&
      forall(t2, x => x.isNotNull && forall(x, y => y.isNotNull))
    val clean3 = t3.isNotNull && forall(t3, x => x.isNotNull &&
      forall(x, y => y.isNotNull && forall(y, z => z.isNotNull)))
    def rawStructured(x: Column) = x.rlike("^\\s*[\\[{]")
    val reject = lit(null).cast("array<array<string>>")
    when(t1.isNotNull && size(t1) === 0, typedlit(Seq.empty[Seq[String]]))
      .when(clean3,
        when(size(t3) === 1 && size(t3.getItem(0)) === 1 &&
            !exists(flatten(t3.getItem(0)), rawStructured), t3.getItem(0))
          .otherwise(reject))
      .when(clean2 && !exists(flatten(t2), rawStructured), t2)
      .when(clean1 && !exists(t1, rawStructured) && size(t1) >= 2, array(t1))
      .otherwise(reject)
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

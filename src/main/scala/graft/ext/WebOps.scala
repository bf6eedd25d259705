package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus URL handling: canonicalization for crawl dedup. A crawl sees
  * the same page as `HTTP://Example.com:80/a?b=2&a=1&utm_source=x#top` and
  * `http://example.com/a?a=1&b=2` — URL-keyed dedup, frontier seen-sets,
  * and per-site aggregation all need ONE canonical spelling first.
  *
  * Everything is pure string/regex expressions (RE2-compatible patterns,
  * no lookaround — the [[TextOps]] PII convention), so the identical
  * transformation runs codegen'd in Spark and verbatim in the DuckDB
  * oracle: no UDF, no URI library whose quirks the other engine can't
  * mirror. Map-only at any corpus size. */
object WebOps {

  private val TrackingParams = "(utm_[a-z0-9]+|fbclid|gclid|msclkid)"

  /** Staged form of [[canonicalizeUrl]] — the one to use on a corpus:
    * each pipeline stage (fragment drop, scheme/host lowering, tracking
    * scrub, query sort) is materialised in its OWN projection, so no
    * stage's regex chain is re-evaluated by the references the next stage
    * makes (the [[TextOps]] CollapseProject discipline: the single-Column
    * form nests ~12 references to the defragmented string, each
    * re-deriving it — ~3× the regex work per row). Appends `outCol`;
    * same result as the Column form (spec-locked equal). */
  def canonicalized(df: org.apache.spark.sql.DataFrame, url: Column,
                    outCol: String = "canon_url"): org.apache.spark.sql.DataFrame = {
    val scratch = Set("__cu", "__sch", "__hp", "__rest", "__qs")
    require(!df.columns.exists(c => scratch(c) || c == outCol),
      s"canonicalized: input must not already carry $outCol or the " +
        s"scratch names ${scratch.mkString(", ")}")
    val others = df.columns.map(col).toSeq
    val s = col("__cu")
    val scheme = lower(regexp_extract(s, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    df.select(others :+ regexp_replace(trim(url), "#.*$", "").as("__cu"): _*)
      .select(others :+ s :+ scheme.as("__sch") :+
        lower(regexp_extract(s, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
          .as("__hp") :+
        regexp_extract(s, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
          .as("__rest"): _*)
      .select(others :+ when(col("__sch") =!= "",
          concat(col("__sch"), lit("://"),
            when(col("__sch") === "http",
              regexp_replace(col("__hp"), ":80$", ""))
              .when(col("__sch") === "https",
                regexp_replace(col("__hp"), ":443$", ""))
              .otherwise(col("__hp")),
            col("__rest")))
          .otherwise(s).as("__cu"): _*)
      .select(others :+ regexp_replace(
          regexp_replace(
            regexp_replace(s, s"&$TrackingParams=[^&#]*", ""),
            s"\\?$TrackingParams=[^&#]*&", "?"),
          s"\\?$TrackingParams=[^&#]*$$", "").as("__cu"): _*)
      .select(others :+ s :+
        regexp_extract(s, "^[^?]*\\?(.*)$", 1).as("__qs"): _*)
      .select(others :+ when(col("__qs") === "", s)
        .otherwise(concat(regexp_extract(s, "^([^?]*)", 1), lit("?"),
          array_join(array_sort(split(col("__qs"), "&")), "&")))
        .as(outCol): _*)
  }

  /** Host of an already-CANONICAL URL (lowercased, default port gone —
    * run [[canonicalized]] first); empty string when no scheme://host
    * shape matches. */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** Per-host crawl accounting over canonical URLs — the dashboard row a
    * crawl scheduler reads (politeness budgets, duplicate-fetch waste per
    * site): (host, n_fetches, n_pages distinct canonical URLs, dup_rate).
    * One partial-aggregated shuffle on host. The exact distinct keeps
    * per-host state proportional to the host's page count — when that
    * outgrows the aggregate buffer (a 10⁹-page host), use
    * [[hostStatsKmv]]: same schema, k-bounded sketch state. */
  def hostStats(canonDf: org.apache.spark.sql.DataFrame,
                canonUrl: Column): org.apache.spark.sql.DataFrame =
    canonDf.select(hostOf(canonUrl).as("host"), canonUrl.as("__cu2"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_fetches"),
        countDistinct(col("__cu2")).as("n_pages"))
      .select(col("host"), col("n_fetches"), col("n_pages"),
        round(lit(1.0) - col("n_pages") / col("n_fetches").cast("double"), 4)
          .as("dup_rate"))

  /** Sketch-backed [[hostStats]] — the 100-TB form: per-host distinct
    * pages via the KMV sketch ([[graft.functions.KmvAgg]]: the k smallest
    * distinct 60-bit URL hashes, a k-BOUNDED buffer merged map-side), so
    * a host with 10⁹ pages costs the same aggregate state as one with
    * 10³ — `count(DISTINCT url)`'s exact per-group distinct set never
    * materialises. Same output schema as [[hostStats]].
    *
    * Below k distinct pages the sketch saw every value and n_pages is
    * EXACT (modulo 60-bit hash collisions — negligible below ~10⁸ pages
    * per host), which is what makes the declared query oracle-checkable
    * against the exact form on testdata; above k it switches to the
    * (k−1)·2⁶⁰/u₍ₖ₎ estimator (±1/√(k−2) relative — WebOpsSpec's
    * hot-host fixture exercises that path). dup_rate inherits n_pages'
    * exact-below-k / estimated-above-k contract. */
  def hostStatsKmv(canonDf: org.apache.spark.sql.DataFrame,
                   canonUrl: Column, k: Int = 1024): org.apache.spark.sql.DataFrame =
    canonDf.select(hostOf(canonUrl).as("host"),
        SketchOps.hash60(canonUrl).as("__h"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_fetches"),
        graft.functions.SketchFunctions.kmv_agg(col("__h"), k).as("__kmv"))
      .select(col("host"), col("n_fetches"),
        when(org.apache.spark.sql.functions.size(col("__kmv")) < k,
          org.apache.spark.sql.functions.size(col("__kmv")).cast("long"))
          .otherwise(round(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
            element_at(col("__kmv"), k), 0).cast("long")).as("n_pages"))
      .select(col("host"), col("n_fetches"), col("n_pages"),
        round(lit(1.0) - col("n_pages") / col("n_fetches").cast("double"), 4)
          .as("dup_rate"))

  /** RFC-3986-lite canonical form (single-Column convenience — for a
    * corpus-sized pass prefer [[canonicalized]], which stages the
    * pipeline across projections instead of nesting it):
    *   1. trim; drop the `#fragment` (never sent to the server);
    *   2. lowercase the scheme and the host (path/query stay case-exact);
    *   3. drop the scheme's default port (`:80` http, `:443` https);
    *   4. drop tracking parameters (utm_*, fbclid, gclid, msclkid);
    *   5. sort the remaining query parameters (order never reaches the
    *      resource) and drop a now-empty `?`.
    * Non-URL-shaped strings pass through steps 1/4/5 harmlessly (no
    * scheme/host match → nothing rewritten). */
  def canonicalizeUrl(url: Column): Column = {
    val t = trim(url)
    val noFrag = regexp_replace(t, "#.*$", "")
    // scheme://host[:port] prefix, lowered; rest (path?query) untouched
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val hostNoDefault = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val lowered = when(scheme =!= "", concat(scheme, lit("://"), hostNoDefault, rest))
      .otherwise(noFrag)
    // strip tracking params in three passes that keep separators sound:
    // (1) any "&trk=v" mid-list; (2) a leading "?trk=v&" promotes the next
    // param to first; (3) a lone "?trk=v" drops the query entirely
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(lowered, s"&$TrackingParams=[^&#]*", ""),
        s"\\?$TrackingParams=[^&#]*&", "?"),
      s"\\?$TrackingParams=[^&#]*$$", "")
    // sort the query parameters; rebuild only when a query exists
    val path = regexp_extract(scrubbed, "^([^?]*)", 1)
    val qs = regexp_extract(scrubbed, "^[^?]*\\?(.*)$", 1)
    when(qs === "", scrubbed)
      .otherwise(concat(path, lit("?"),
        array_join(array_sort(split(qs, "&")), "&")))
  }
}

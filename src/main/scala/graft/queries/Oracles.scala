package graft.queries

/** DuckDB oracle SQL for every SQL-expressible query in [[RefQueries]] /
  * [[ExtQueries]]. The driver runs these against the same parquet tables and
  * hash-compares with the Spark results, so every computed column is (a)
  * aliased identically on both sides, (b) explicitly cast where the engines'
  * natural types diverge (DuckDB sum(int)→HUGEINT vs Spark long, len()→BIGINT
  * vs size()→int), and (c) rounded before any ordering decision when floats
  * are involved.
  */
object Oracles {

  /** Canonical tokeniser, shared by all text oracles (mirrors TextOps.tokens). */
  private val TOK =
    "list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' +'), x -> x <> '')"

  /** Canonical UNICODE tokeniser over an arbitrary text expression
    * (mirrors TextOps.tokensUnicode: NFC → lower → \p{L}\p{N} property
    * classes — the identical RE2-compatible class regex on both engines;
    * nfc_normalize is utf8proc, an independent implementation of the
    * Unicode standard vs the JDK normalizer the Spark side runs). */
  private def tokUni(texpr: String): String =
    s"list_filter(string_split_regex(regexp_replace(lower(nfc_normalize($texpr)), " +
      s"'[^\\p{L}\\p{N}]+', ' ', 'g'), ' +'), x -> x <> '')"

  /** The multilingual fixture text (mirrors ExtQueries.multiDocs —
    * suffixes interpolated from the SAME Scala constants). */
  private lazy val MULTI_TEXT: String = {
    val x = graft.queries.ExtQueries.MultiSuffixes
    s"(CASE WHEN doc_id % 11 = 0 THEN text || '${x(0)}' " +
      s"WHEN doc_id % 11 = 1 THEN text || '${x(1)}' " +
      s"WHEN doc_id % 11 = 2 THEN text || '${x(2)}' " +
      s"WHEN doc_id % 11 = 3 THEN text || '${x(3)}' ELSE text END)"
  }

  private val EN_STOPS = "['the','and','of','to','in','is','that','with']"

  /** The composed-pipeline multilingual fixture (mirrors
    * ExtQueries.xCurationUni — full ru/zh replacement sentences with
    * fixed stop ratios for residues 0/1, appended suffixes for 2/3; all
    * text interpolated from the SAME Scala constants). */
  private lazy val UNI_TEXT: String = {
    val x = graft.queries.ExtQueries.MultiSuffixes
    s"(CASE WHEN doc_id % 11 = 0 THEN '${graft.queries.ExtQueries.UniRuSentence}' " +
      s"WHEN doc_id % 11 = 1 THEN '${graft.queries.ExtQueries.UniZhSentence}' " +
      s"WHEN doc_id % 11 = 2 THEN text || '${x(2)}' " +
      s"WHEN doc_id % 11 = 3 THEN text || '${x(3)}' ELSE text END)"
  }

  /** A DuckDB list literal from a stopword seq (quotes escaped). */
  private def listLit(ws: Seq[String]): String =
    ws.map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")

  /** The x_lin_classify scored corpus joined with the lang label — the
    * shared front of the eval oracles (x_auc, x_confusion,
    * x_calibration); mirrors ExtQueries.scoredDocs. */
  private lazy val SCORED_CTES =
    s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents
       |  WHERE text IS NOT NULL),
       |ng AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
       |  i -> array_to_string(tk[i:i+1], ' '))) AS ng FROM toks),
       |hb AS (SELECT doc_id, ${hex32("h", 1)} % 1024 AS bucket
       |  FROM (SELECT doc_id, md5(ng) AS h FROM ng)),
       |wt AS (SELECT b AS bucket, ((b * 37 + 11) % 201 - 100) / 100.0 AS w
       |  FROM (SELECT unnest(range(0, 1024)) AS b)),
       |sc AS (SELECT doc_id, count(*) AS F, sum(coalesce(w, 0)) AS sw
       |  FROM hb LEFT JOIN wt USING (bucket) GROUP BY doc_id),
       |scored AS (SELECT s.doc_id,
       |    round(1 / (1 + exp(-(-0.05 + sw / F))), 6) AS score, d.lang
       |  FROM sc s JOIN documents d USING (doc_id)
       |  WHERE d.lang IS NOT NULL)""".stripMargin

  // hex[k..k+7] of an md5 digest as a 32-bit integer (no conv() in DuckDB)
  private def hex32(col: String, start: Int): String =
    (0 until 8).map { k =>
      val coef = math.pow(16, 7 - k).toLong
      s"(strpos('0123456789abcdef', substr($col, ${start + k}, 1)) - 1) * $coef"
    }.mkString("(", " + ", ")")

  // Greedy longest-match subword segmentation as a recursive CTE — an
  // INDEPENDENT implementation of graft.functions.BpeEncode's rule (per
  // token: repeatedly take the longest vocab piece matching the remaining
  // suffix, single-char fallback), sharing only the piece-vocabulary
  // fixture verbatim. seg rows with pp >= 0 are the emitted pieces; the
  // pp = -1 seed row carries the scan position.
  private lazy val BPE_SEG_CTES = bpeSegCtes(TOK)

  /** The UNROLLED Sennrich learn loop (mirrors TextOps.bpeLearnMerges):
    * w0 = the word-type table as both-side-delimited symbol strings
    * ("|t||i||n||g|", the x_bpe_merge_encode encoding); per round r,
    * p_r counts every ADJACENT symbol occurrence weighted by word
    * frequency, m_r takes the (cnt DESC, a, b) argmax — the exact Spark
    * tie-break — and w_r applies the merge as ONE non-overlapping
    * delimited replace (resume-after-match IS the left-to-right skip).
    * The CASE guards keep the chain total if a round exhausts (no pairs
    * left), matching the Spark loop's early stop. Leaves `merges`
    * (rank, left, right, merged, cnt) and m1..mN defined. */
  private def bpeLearnCtes(nMerges: Int): String = {
    // AS MATERIALIZED on every per-round CTE: DuckDB inlines CTEs by
    // default, and each w_r is referenced twice (p_{r+1}, w_{r+1}) while
    // each m_r is referenced ~6 times — inlined, the chain expands
    // exponentially (observed: thousands of parquet re-opens at 8 rounds)
    val w0 =
      s"""w0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS s, n FROM
         |  (SELECT w, CAST(count(*) AS BIGINT) AS n FROM
         |    (SELECT unnest($TOK) AS w FROM documents WHERE text IS NOT NULL)
         |   GROUP BY w))""".stripMargin
    val rounds = (1 to nMerges).map { r =>
      s"""p$r AS MATERIALIZED (SELECT sy[i+1] AS a, sy[i+2] AS b, sum(n) AS cnt FROM
         |  (SELECT sy, n, unnest(range(0, len(sy) - 1)) AS i FROM
         |    (SELECT string_split(trim(s, '$PIPE'), '$PIPE$PIPE') AS sy, n
         |     FROM w${r - 1}))
         |  GROUP BY a, b),
         |m$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |w$r AS MATERIALIZED (SELECT CASE WHEN (SELECT count(*) FROM m$r) = 0 THEN s
         |  ELSE replace(s,
         |    '$PIPE' $CC (SELECT a FROM m$r) $CC '$PIPE$PIPE' $CC
         |      (SELECT b FROM m$r) $CC '$PIPE',
         |    '$PIPE' $CC (SELECT a FROM m$r) $CC (SELECT b FROM m$r) $CC
         |      '$PIPE') END AS s, n FROM w${r - 1})""".stripMargin
    }
    val ranks = (1 to nMerges).map { r =>
      s"""SELECT $r AS rank, a AS "left", b AS "right",
         |  a $CC b AS merged, cnt FROM m$r""".stripMargin
    }.mkString("\nUNION ALL ")
    (Seq(w0) ++ rounds).mkString(",\n") +
      s",\nmerges AS (\n$ranks)"
  }

  // SQL fragments kept out of stripMargin templates: a line-leading '||'
  // (concat) or '|' (delimiter literal) would be eaten by an OUTER
  // stripMargin when this text is interpolated into another template
  private val PIPE = "|"
  private val CC = "||"

  /** The greedy-segmentation CTE chain over an arbitrary token-array
    * expression (the ASCII [[TOK]] for the fixture surface; a
    * [[tokUni]] stream for the multilingual one — DuckDB's substr/length
    * are code-point units, so the same SQL is unicode-correct). */
  private def bpeSegCtes(tokExpr: String): String = {
    // '' -escape each piece: the fixture is alphanumeric today, but the
    // documented upgrade path swaps in a learned merge table whose pieces
    // could carry quotes — which would otherwise silently break (or
    // inject into) the oracle query.
    val vocabValues = graft.ext.TextOps.defaultBpeVocab
      .map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    s"""vocab(piece) AS (VALUES $vocabValues),
       |toksb AS (SELECT doc_id, $tokExpr AS tk FROM documents WHERE text IS NOT NULL),
       |tokb AS (SELECT doc_id, CAST(i AS INT) AS tp, tk[i+1] AS w
       |  FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM toksb)),
       |seg(doc_id, tp, w, pos, pp, piece) AS (
       |  SELECT doc_id, tp, w, 1, -1, CAST(NULL AS VARCHAR) FROM tokb
       |  UNION ALL
       |  SELECT doc_id, tp, w, pos + length(nxt), pp + 1, nxt
       |  FROM (SELECT doc_id, tp, w, pos, pp,
       |      coalesce((SELECT v.piece FROM vocab v
       |          WHERE v.piece = substr(w, pos, length(v.piece))
       |          ORDER BY length(v.piece) DESC LIMIT 1),
       |        substr(w, pos, 1)) AS nxt
       |    FROM seg WHERE pos <= length(w)))""".stripMargin
  }

  /** [[bpeSegCtes]] with BYTE FALLBACK: where no vocab piece matches (the
    * coalesce arm), the single code point is expanded to its UTF-8 bytes
    * as `<0xXX>` pieces — `hex(encode(cp))` is utf8proc's UTF-8 encoder,
    * independent of the JVM encoder the Spark expression uses. The
    * expansion is emitted as ONE concatenated string per step (the
    * recursion advances one code point either way); consumers split it
    * back into byte pieces with `regexp_extract_all`. */
  private def bpeSegBytesCtes(tokExpr: String): String = {
    val vocabValues = graft.ext.TextOps.defaultBpeVocab
      .map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    s"""vocab(piece) AS (VALUES $vocabValues),
       |toksb AS (SELECT doc_id, $tokExpr AS tk FROM documents WHERE text IS NOT NULL),
       |tokb AS (SELECT doc_id, CAST(i AS INT) AS tp, tk[i+1] AS w
       |  FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM toksb)),
       |seg(doc_id, tp, w, pos, pp, piece) AS (
       |  SELECT doc_id, tp, w, 1, -1, CAST(NULL AS VARCHAR) FROM tokb
       |  UNION ALL
       |  SELECT doc_id, tp, w, pos + coalesce(length(nxt), 1), pp + 1,
       |    coalesce(nxt, regexp_replace(hex(encode(substr(w, pos, 1))),
       |      '(..)', '<0x\\1>', 'g'))
       |  FROM (SELECT doc_id, tp, w, pos, pp,
       |      (SELECT v.piece FROM vocab v
       |          WHERE v.piece = substr(w, pos, length(v.piece))
       |          ORDER BY length(v.piece) DESC LIMIT 1) AS nxt
       |    FROM seg WHERE pos <= length(w)))""".stripMargin
  }

  // Content-defined chunk boundaries (TextOps.cdcChunks' mirror): md5-mod
  // gates over k=3 shingles, sequential start selection (first gate vs the
  // forced maxLen=20 split) as a recursive CTE. Shared by x_cdc_chunks,
  // x_cdc_dedup, and (over the frontier-survivor subset) x_web_pipeline.
  private def cdcSegCtes(src: String, tokExpr: String = TOK): String =
    s"""toksc AS (SELECT doc_id, $tokExpr AS tk FROM $src),
       |dc AS (SELECT doc_id, tk, len(tk) AS n FROM toksc WHERE len(tk) > 0),
       |gh AS (SELECT doc_id, i AS p,
       |    md5(array_to_string(tk[i-2:i], ' ')) AS h
       |  FROM (SELECT doc_id, tk, unnest(range(1, n)) AS i FROM dc)
       |  WHERE i >= 3),
       |g AS (SELECT doc_id, p, ${hex32("h", 1)} % 8 = 0 AS gate FROM gh),
       |seg(doc_id, chunk_id, s, n) AS (
       |  SELECT doc_id, 0, 1, n FROM dc
       |  UNION ALL
       |  SELECT q.doc_id, q.chunk_id + 1, q.nb + 1, q.n FROM (
       |    SELECT seg.doc_id, seg.chunk_id, seg.n,
       |      least(coalesce((SELECT min(g.p) FROM g
       |          WHERE g.doc_id = seg.doc_id AND g.p >= seg.s AND g.gate),
       |        seg.s + 19), seg.s + 19) AS nb
       |    FROM seg WHERE seg.s <= seg.n - 1) q
       |  WHERE q.nb <= q.n - 1)""".stripMargin

  private lazy val CDC_SEG_CTES =
    cdcSegCtes("documents WHERE text IS NOT NULL")

  // The staged regex canonicalization (WebOps.canonicalized's mirror) as
  // chained CTEs: from `in` (carrying `keep` columns + url) to a CTE
  // `canon` (keep + url + canon_url). Shared by x_url_canon and
  // x_web_pipeline so the regex pipeline exists ONCE in oracle SQL.
  private def urlCanonCtes(in: String, keep: String): String =
    s"""uc1 AS (SELECT $keep, url,
       |  regexp_replace(trim(url), '#.*$$', '') AS s FROM $in),
       |uc2 AS (SELECT $keep, url,
       |  CASE WHEN regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) <> ''
       |    THEN concat(
       |      lower(regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)),
       |      '://',
       |      (CASE lower(regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |         WHEN 'http' THEN regexp_replace(lower(regexp_extract(s,
       |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':80$$', '')
       |         WHEN 'https' THEN regexp_replace(lower(regexp_extract(s,
       |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':443$$', '')
       |         ELSE lower(regexp_extract(s,
       |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) END),
       |      regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$$', 1))
       |    ELSE s END AS s FROM uc1),
       |uc3 AS (SELECT $keep, url, regexp_replace(regexp_replace(
       |    regexp_replace(s,
       |      '&(utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*', '', 'g'),
       |    '\\?(utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*&', '?'),
       |    '\\?(utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*$$', '') AS s
       |  FROM uc2),
       |canon AS (SELECT $keep, url,
       |  CASE WHEN regexp_extract(s, '^[^?]*\\?(.*)$$', 1) = '' THEN s
       |    ELSE concat(regexp_extract(s, '^([^?]*)', 1), '?',
       |      array_to_string(list_sort(string_split(
       |        regexp_extract(s, '^[^?]*\\?(.*)$$', 1), '&')), '&')) END
       |  AS canon_url FROM uc3)""".stripMargin

  // first 15 hex digits as a 60-bit integer (SketchOps.hash60's mirror)
  private def hex60(col: String): String =
    (0 until 15).map { d =>
      val coef = math.pow(16, 14 - d).toLong
      s"(strpos('0123456789abcdef', substr($col, ${1 + d}, 1)) - 1) * $coef"
    }.mkString("(", " + ", ")")

  // SCD2 type-2 history over the events log (shared by x_scd2_history and
  // x_scd2_merge — the merge oracle IS the full rebuild, by the invariant)
  private val SCD2_SQL =
    """WITH lg AS (SELECT user_id, event_type, ts, event_id FROM events),
      |w AS (SELECT *, lag(event_type) OVER
      |  (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |  row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM lg),
      |op AS (SELECT user_id, event_type, ts, event_id FROM w
      |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
      |v AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
      |  lead(epoch_us(ts)) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us FROM op)
      |SELECT user_id, event_type, valid_from_us, valid_to_us,
      |  valid_to_us IS NULL AS is_current FROM v""".stripMargin

  // shingle CTEs shared by minhash/jaccard (k=3, 12 hashes via
  // Kirsch–Mitzenmacher double hashing, 4 bands) — mirrors DedupOps
  /** The 3-shingle → 12-minhash → 4-band → candidate-pair chain over an
    * arbitrary tokenizer expression and source relation (mirrors
    * DedupOps.minhashSignature/lshBands/lshCandidates). */
  private def shingleCtes(tokExpr: String, src: String): String =
    s"""toks AS (SELECT doc_id, $tokExpr AS tk FROM $src),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM
       |  (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2, 0)+1),
       |     i -> array_to_string(tk[i:i+2], ' '))) AS shingle FROM toks)),
       |hv AS (SELECT doc_id, ${hex32("h", 1)} AS h1, ${hex32("h", 9)} AS h2
       |  FROM (SELECT doc_id, md5(shingle) AS h FROM sh)),
       |sig AS (SELECT doc_id, seed, min((h1 + seed * h2) % 4294967296) AS mh
       |  FROM hv CROSS JOIN (SELECT unnest(range(0, 12)) AS seed) seeds
       |  GROUP BY doc_id, seed),
       |bands AS (SELECT doc_id, seed//3 AS band,
       |  md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS bkey
       |  FROM sig GROUP BY doc_id, seed//3),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |""".stripMargin

  private val SHINGLE_CTES =
    shingleCtes(TOK, "documents WHERE text IS NOT NULL")

  /** The composed web pipeline (url canon → first-win → CDC-chunk
    * dedup stats → weighted Bernoulli) over an arbitrary text expression
    * and token stream — `x_web_pipeline` (ASCII) and
    * `x_web_pipeline_uni` (multilingual) share everything but those. */
  private def webPipelineSql(textExpr: String, tokExpr: String): String =
    s"""WITH RECURSIVE uw AS (SELECT doc_id, n_chars, $textExpr AS text,
      |    ((CASE WHEN doc_id % 4 = 1 THEN 'HTTPS://WWW.Site.Example.COM:443'
      |           ELSE 'https://www.site.example.com' END) ||
      |     '/page/' || (doc_id % 250) ||
      |     CASE WHEN doc_id % 4 = 1 THEN '?b=2&a=1' ELSE '?a=1&b=2' END ||
      |     CASE WHEN doc_id % 4 = 2 THEN '&utm_campaign=x' ELSE '' END ||
      |     CASE WHEN doc_id % 4 = 3 THEN '#top' ELSE '' END) AS url
      |  FROM documents WHERE text IS NOT NULL),
      |${urlCanonCtes("uw", "doc_id, n_chars, text")}
      |, fwin AS (SELECT canon_url, min(doc_id) AS doc_id
      |  FROM canon GROUP BY canon_url),
      |surv AS (SELECT c.doc_id, c.n_chars, c.text, c.canon_url
      |  FROM canon c JOIN fwin USING (canon_url, doc_id)),
      |${cdcSegCtes("surv", tokExpr)},
      |chw AS (SELECT e.doc_id, e.chunk_id AS chunk_idx,
      |    array_to_string(t.tk[e.s:e.e], ' ') AS chunk
      |  FROM (SELECT seg.*, coalesce(lead(s) OVER (PARTITION BY doc_id
      |      ORDER BY chunk_id) - 1, n) AS e FROM seg) e
      |  JOIN toksc t USING (doc_id)),
      |wwin AS (SELECT chunk, min(doc_id*1048576 + chunk_idx) AS w
      |  FROM chw GROUP BY chunk),
      |stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |    CAST(sum(CASE WHEN doc_id*1048576 + chunk_idx = w
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |  FROM chw JOIN wwin USING (chunk) GROUP BY doc_id),
      |joined AS (SELECT s.doc_id, s.canon_url, st.n_chunks, st.n_kept,
      |    s.n_chars, md5(CAST(s.doc_id AS VARCHAR)) AS h
      |  FROM surv s JOIN stats st USING (doc_id)),
      |m AS (SELECT max(n_chars) AS wmax FROM joined)
      |SELECT doc_id, canon_url, n_chunks, n_kept, n_chars
      |FROM joined, m
      |WHERE n_chars > 0
      |  AND ${hex32("h", 1)} * wmax < n_chars * 4294967296""".stripMargin

  /** The NFC-variant planted corpus (mirrors ExtQueries.uniVariantDocs) —
    * shared by x_dedup_exact_uni and x_dedup_minhash_uni. */
  private lazy val UNI_ALLV: String = {
    val a = graft.queries.ExtQueries.UniVariantA
    val b = graft.queries.ExtQueries.UniVariantB
    s"""base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |sel AS (SELECT doc_id, text FROM base WHERE doc_id % 17 = 0),
       |allv AS (SELECT doc_id, text FROM base
       |  UNION ALL SELECT doc_id + 1000000000, text || '$a' FROM sel
       |  UNION ALL SELECT doc_id + 2000000000, text || '$b' FROM sel)""".stripMargin
  }

  // simhash CTEs: 32-bit signature from md5 hex nibbles (mirrors DedupOps.simhash)
  private val SIMHASH_SQL: String = {
    val terms = (0 until 32).map { j =>
      val digit = j / 4
      val p = 1 << (j % 4)
      s"CAST(sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, ${digit + 1}, 1)) - 1) % ${2 * p}) >= $p THEN 1 ELSE -1 END) AS BIGINT) AS s_$j"
    }.mkString(", ")
    val bits = (0 until 32)
      .map(j => s"(CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
       |tok AS (SELECT DISTINCT doc_id, unnest(tk) AS tkn FROM toks),
       |h AS (SELECT doc_id, md5(tkn) AS h FROM tok),
       |s AS (SELECT doc_id, $terms FROM h GROUP BY doc_id),
       |sims AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM s)
       |""".stripMargin
  }

  private val COS =
    "round(list_dot_product(av, bv) / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv))), 6)"

  // language-ID scoring SQL, shared by x_langid and x_pipeline (mirrors
  // TextOps.languageId over ExtQueries.langProfiles)
  private val LANG_SELECT_SCORES =
    ExtQueries.langProfiles.map(p => s"score_${p._1}").mkString(", ")
  private val LANG_PRED = ExtQueries.langProfiles.map { case (l, _) =>
    s"WHEN score_$l = m AND m > 0 THEN '$l'"
  }.mkString("CASE ", " ", " ELSE 'und' END")
  /** doc_id, score_*, m (max score) per document. */
  private val LANG_SCORED: String = {
    val scoreCols = ExtQueries.langProfiles.map { case (l, stops) =>
      val lst = stops.map(w => s"'$w'").mkString("[", ",", "]")
      s"CAST(len(list_filter(tk, x -> list_contains($lst, x))) AS BIGINT) AS score_$l"
    }.mkString(", ")
    val maxExpr = ExtQueries.langProfiles.map(p => s"score_${p._1}")
      .mkString("greatest(", ", ", ")")
    s"""SELECT doc_id, $LANG_SELECT_SCORES, $maxExpr AS m FROM
       |(SELECT doc_id, $scoreCols FROM (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL))""".stripMargin
  }

  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))),6)"

  private def l2Sql(a: String, b: String): String =
    s"round(list_dot_product($a,$a)+list_dot_product($b,$b)-2*list_dot_product($a,$b),6)"

  /** PQ chain over the CTE named `src` (mirrors PqOps: m=4 subspaces of 16
    * dims, ksub=16 md5-sampled seeds, one Lloyd round of rounded means,
    * lexicographic (distance, code) argmin). Leaves `enc` (vec_id, sub,
    * code), `dtab` and `adc` (vec_id, adc_dist) defined; internal names are
    * pq-prefixed so the chain composes with ivfChainCtes (whose asg1/upd1
    * would otherwise collide). Expects `qv` (the query vector) defined. */
  private def pqCtes(src: String): String =
    s"""${pqTrainCtes(src)},
       |dtab AS (SELECT k.sub, k.code, ${l2Sql("q.sv", "k.w")} AS d2 FROM
       |  (SELECT sub, v[sub*16+1:(sub+1)*16] AS sv FROM qv, subs) q
       |  JOIN pqcb1 k ON k.sub = q.sub),
       |adc AS (SELECT vec_id, round(sum(d2), 6) AS adc_dist
       |  FROM enc JOIN dtab USING (sub, code) GROUP BY vec_id)""".stripMargin

  /** The training/encoding half of [[pqCtes]] (codebook + `enc`, no query
    * distance table) — the piece the residual-IVFADC oracles compose with
    * their own per-cell tables. */
  private def pqTrainCtes(src: String): String =
    s"""subs AS (SELECT unnest(range(0, 4)) AS sub),
       |pqsamp AS (SELECT row_number() OVER (ORDER BY vec_id) AS code, v FROM
       |  (SELECT vec_id, v FROM $src ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
       |pqcb0 AS (SELECT sub, code, v[sub*16+1:(sub+1)*16] AS w FROM pqsamp, subs),
       |pqsv AS (SELECT vec_id, sub, v[sub*16+1:(sub+1)*16] AS sv FROM $src, subs),
       |pqasg1 AS (SELECT vec_id, sub, code, sv FROM (
       |  SELECT s.vec_id, s.sub, k.code, s.sv, row_number() OVER (PARTITION BY s.vec_id, s.sub
       |    ORDER BY ${l2Sql("s.sv", "k.w")} ASC, k.code) AS rn
       |  FROM pqsv s JOIN pqcb0 k ON k.sub = s.sub) WHERE rn = 1),
       |pqupd1 AS (SELECT sub, code, list(mv ORDER BY i) AS w FROM
       |  (SELECT sub, code, i, round(avg(sv[i+1]), 6) AS mv FROM
       |    (SELECT sub, code, sv, unnest(range(0, len(sv))) AS i FROM pqasg1)
       |   GROUP BY sub, code, i) GROUP BY sub, code),
       |pqcb1 AS (SELECT k.sub, k.code, coalesce(u.w, k.w) AS w FROM pqcb0 k
       |  LEFT JOIN pqupd1 u ON u.sub = k.sub AND u.code = k.code),
       |enc AS (SELECT vec_id, sub, code FROM (
       |  SELECT s.vec_id, s.sub, k.code, row_number() OVER (PARTITION BY s.vec_id, s.sub
       |    ORDER BY ${l2Sql("s.sv", "k.w")} ASC, k.code) AS rn
       |  FROM pqsv s JOIN pqcb1 k ON k.sub = s.sub) WHERE rn = 1)""".stripMargin

  /** Residual chain shared by the IVFADC oracles: `res` (per-row residual
    * v − centroid[cell] against the final centroids `ctrN`), the PQ
    * codebook/encoding trained ON the residuals, and `adcr` — per-cell ADC
    * restricted to the cells present in the probe CTE named `probeCte`
    * (single-query form; expects `qv`). */
  private def pqResCtes(finalCtr: String, probeCte: String): String =
    s"""res AS (SELECT a.vec_id, a.centroid_id,
       |  list_transform(range(0, len(a.v)), i -> a.v[i+1] - k.c[i+1]) AS v
       |  FROM asgF a JOIN $finalCtr k USING (centroid_id)),
       |${pqTrainCtes("res")},
       |qres AS (SELECT k.centroid_id,
       |  list_transform(range(0, len(q.v)), i -> q.v[i+1] - k.c[i+1]) AS v
       |  FROM qv q CROSS JOIN $finalCtr k
       |  JOIN $probeCte p ON p.centroid_id = k.centroid_id),
       |dtabr AS (SELECT r.centroid_id, k.sub, k.code,
       |  ${l2Sql("r.v[k.sub*16+1:(k.sub+1)*16]", "k.w")} AS d2
       |  FROM qres r CROSS JOIN pqcb1 k),
       |adcr AS (SELECT e.vec_id, round(sum(d2), 6) AS adc_dist
       |  FROM enc e JOIN res r ON r.vec_id = e.vec_id
       |  JOIN dtabr t ON t.centroid_id = r.centroid_id
       |    AND t.sub = e.sub AND t.code = e.code
       |  GROUP BY e.vec_id)""".stripMargin

  /** The rest/qv split shared by every single-query ANN oracle. */
  private val REST_QV =
    """rest AS (SELECT vec_id, v FROM corpus WHERE vec_id <> 0),
      |qv AS (SELECT v FROM corpus WHERE vec_id = 0),""".stripMargin

  private val PQ_CTES = s"$REST_QV\n${pqCtes("rest")}"

  // planted ANN corpus (mirrors ExtQueries.plantedEmbeddings): exact copies
  // of every 25th vector, 20 md5-jittered near-clones of vector 0
  private val PLANTED_CTES =
    s"""e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |clones AS (SELECT 20000 + j AS vec_id,
       |  list_transform(range(0, len(q.v)), i -> q.v[i+1] +
       |    (${hex32("md5('nd:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR))", 1)} / 4294967296.0 - 0.5) * 0.01) AS v
       |  FROM (SELECT v FROM e0 WHERE vec_id = 0) q, (SELECT unnest(range(1, 21)) AS j)),
       |corpus AS (SELECT vec_id, v FROM e0
       |  UNION ALL SELECT vec_id + 10000, v FROM e0 WHERE vec_id % 25 = 0
       |  UNION ALL SELECT vec_id, v FROM clones)
       |""".stripMargin

  /** Banded SRP signature CTEs (planes/expl/dots/bands over the CTE named
    * `corpus`) — mirrors SimilarityOps.srpBands: md5-derived plane matrix,
    * `bandBits`-bit bands (= numPlanes/numBands on the Spark side; pass it
    * explicitly — a hardcoded width would silently diverge from any query
    * using a different plane/band geometry), 6-dp-rounded sign decision.
    * Shared by the pair and batch-probe oracle forms. */
  private def srpCtes(planes: Int, bandBits: Int = 4): String = {
    require(planes % bandBits == 0, "bandBits must divide planes")
    srpCtes(planes.toString, bandBits.toString)
  }

  /** Overload for AUTO-sized banding: `planes`/`bandBits` may be any
    * scalar-legal SQL (e.g. a subquery against the `lshsz` sizing CTE) —
    * the x_semdedup_auto nlist convention, so one oracle text tracks
    * every scale. */
  private def srpCtes(planes: String, bandBits: String): String = {
    s"""planes AS (SELECT p.p, d.d,
       |  ${hex32("md5('plane' || CAST(p.p AS VARCHAR) || ':' || CAST(d.d AS VARCHAR))", 1)} / 4294967296.0 * 2.0 - 1.0 AS comp
       |  FROM (SELECT unnest(range(0, $planes)) AS p) p,
       |       (SELECT unnest(range(0, (SELECT max(len(v)) FROM corpus))) AS d) d),
       |expl AS (SELECT vec_id, i AS d, v[i+1] AS x FROM
       |  (SELECT vec_id, v, unnest(range(0, len(v))) AS i FROM corpus)),
       |dots AS (SELECT vec_id, p, sum(x * comp) AS dt FROM expl JOIN planes ON planes.d = expl.d GROUP BY vec_id, p),
       |bands AS (SELECT vec_id, p // $bandBits AS band,
       |  sum(CASE WHEN round(dt, 6) > 0 THEN CAST(1 AS BIGINT) << (p % $bandBits) ELSE 0 END) AS bkey
       |  FROM dots GROUP BY vec_id, p // $bandBits)""".stripMargin
  }

  /** Query set, banded-probe candidates, scored + ranked top-k CTEs
    * (mirrors ExtQueries.xAnnLshBatch: queries are vec_id%100==1). */
  private val LSH_BATCH_CTES =
    s"""qids AS (SELECT vec_id AS qid FROM corpus WHERE vec_id % 100 = 1),
       |cand AS (SELECT DISTINCT q.qid, b.vec_id FROM qids q
       |  JOIN bands a ON a.vec_id = q.qid
       |  JOIN bands b ON b.band = a.band AND b.bkey = a.bkey AND b.vec_id <> q.qid),
       |scored AS (SELECT c.qid, c.vec_id, ${cosSql("a.v", "b.v")} AS cos_sim
       |  FROM cand c JOIN corpus a ON a.vec_id = c.qid JOIN corpus b ON b.vec_id = c.vec_id),
       |topk AS (SELECT qid, vec_id, cos_sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)""".stripMargin

  /** IVF CTE chain (mirrors SimilarityOps.ivfTopK with kmeansIters Lloyd
    * rounds): md5-sampled centroids, per-round rounded-mean updates, rounded
    * argmax assignment (ties to the smallest centroid id), probe LIMIT
    * nprobe, top-k LIMIT k. Appends CTEs `rest`, `qv`, `asgF`, `probe`,
    * `ivf` to PLANTED_CTES. */
  /** Centroid-sample + Lloyd-round + final-assignment CTE chain over the
    * CTE named `src`; leaves `ctr<iters>` (final centroids) and `asgF`
    * (final assignment) defined. */
  private def ivfChainCtes(src: String, kmeansIters: Int, nlist: Int): String =
    ivfChainCtes(src, kmeansIters, nlist.toString)

  /** `nlistSql` may be any LIMIT-legal scalar expression — the auto-sized
    * oracle derives it from count(*) so it tracks the corpus at every SF. */
  private def ivfChainCtes(src: String, kmeansIters: Int,
                           nlistSql: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""ctr0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id, v AS c FROM
         |  (SELECT vec_id, v FROM $src ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nlistSql)),
         |""".stripMargin)
    for (it <- 1 to kmeansIters) {
      val prev = s"ctr${it - 1}"
      sb.append(
        s"""asg$it AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT r.vec_id, r.v, k.centroid_id, row_number() OVER (PARTITION BY r.vec_id
           |    ORDER BY ${cosSql("r.v", "k.c")} DESC, k.centroid_id) AS rn FROM $src r, $prev k) WHERE rn = 1),
           |upd$it AS (SELECT centroid_id, list(m ORDER BY i) AS c FROM
           |  (SELECT centroid_id, i, round(avg(v[i+1]), 6) AS m FROM
           |   (SELECT centroid_id, v, unnest(range(0, len(v))) AS i FROM asg$it) GROUP BY centroid_id, i)
           |  GROUP BY centroid_id),
           |ctr$it AS (SELECT k.centroid_id, coalesce(u.c, k.c) AS c
           |  FROM $prev k LEFT JOIN upd$it u ON u.centroid_id = k.centroid_id),
           |""".stripMargin)
    }
    val fin = s"ctr$kmeansIters"
    sb.append(
      s"""asgF AS (SELECT vec_id, v, centroid_id FROM (
         |  SELECT r.vec_id, r.v, k.centroid_id, row_number() OVER (PARTITION BY r.vec_id
         |    ORDER BY ${cosSql("r.v", "k.c")} DESC, k.centroid_id) AS rn FROM $src r, $fin k) WHERE rn = 1),
         |""".stripMargin)
    sb.toString
  }

  private def ivfCtes(kmeansIters: Int, nlist: Int, nprobe: Int, k: Int): String = {
    val fin = s"ctr$kmeansIters"
    s"""rest AS (SELECT vec_id, v FROM corpus WHERE vec_id <> 0),
       |qv AS (SELECT v FROM corpus WHERE vec_id = 0),
       |${ivfChainCtes("rest", kmeansIters, nlist)}probe AS (SELECT centroid_id FROM (SELECT k.centroid_id, ${cosSql("q.v", "k.c")} AS s
       |  FROM qv q, $fin k) ORDER BY s DESC, centroid_id LIMIT $nprobe),
       |ivf AS (SELECT a.vec_id, ${cosSql("a.v", "q.v")} AS cos_sim
       |  FROM asgF a JOIN probe p ON p.centroid_id = a.centroid_id, qv q
       |  ORDER BY cos_sim DESC, a.vec_id LIMIT $k)
       |""".stripMargin
  }

  private def ivfBatchCtes(kmeansIters: Int, nlist: Int, nprobe: Int, k: Int): String = {
    val fin = s"ctr$kmeansIters"
    s"""${ivfChainCtes("corpus", kmeansIters, nlist)}qset AS (SELECT vec_id AS qid, v AS q FROM corpus WHERE vec_id % 100 = 1),
       |probes AS (SELECT qid, centroid_id FROM (
       |  SELECT q.qid, k.centroid_id, row_number() OVER (PARTITION BY q.qid
       |    ORDER BY ${cosSql("q.q", "k.c")} DESC, k.centroid_id) AS rn FROM qset q, $fin k) WHERE rn <= $nprobe),
       |cand AS (SELECT q.qid, a.vec_id, ${cosSql("a.v", "q.q")} AS cos_sim
       |  FROM asgF a JOIN probes p ON p.centroid_id = a.centroid_id
       |  JOIN qset q ON q.qid = p.qid WHERE a.vec_id <> q.qid),
       |topk AS (SELECT qid, vec_id, cos_sim FROM (
       |  SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos_sim DESC, vec_id) AS rn FROM cand) WHERE rn <= $k)
       |""".stripMargin
  }

  // geo world model (mirrors GeoQueries): customers are unit squares at
  // ((7k mod 100)/10, (13k mod 100)/10); nations are 2×2 cells tiling
  // [0,10]². Same IEEE arithmetic as the Spark side (integer mod, cast,
  // divide by 10.0), so box bounds are bit-identical doubles.
  private val GEO_CTES =
    """cust AS (SELECT c_custkey,
      |  CAST((c_custkey*7)%100 AS DOUBLE)/10.0 AS px,
      |  CAST((c_custkey*13)%100 AS DOUBLE)/10.0 AS py
      |  FROM customer WHERE c_custkey <= 500),
      |cells AS (SELECT n_nationkey, n_name,
      |  CAST(n_nationkey%5 AS DOUBLE)*2.0 AS cx,
      |  CAST(n_nationkey//5 AS DOUBLE)*2.0 AS cy FROM nation)
      |""".stripMargin

  // residual IVFADC, single query — shared by x_ivfpq_res (in-memory) and
  // x_ivfpq_stored (serve path), which must produce identical answers
  private val ivfPqResSql: String = {
    val iters = 1 // must track the Scala side's kmeansIters
    s"""WITH $PLANTED_CTES,
       |$REST_QV
       |${ivfChainCtes("rest", kmeansIters = iters, nlist = 16)}probe AS (SELECT centroid_id FROM (SELECT k.centroid_id, ${cosSql("q.v", "k.c")} AS s
       |  FROM qv q, ctr$iters k) ORDER BY s DESC, centroid_id LIMIT 4),
       |${pqResCtes(s"ctr$iters", "probe")}
       |SELECT vec_id, adc_dist FROM adcr ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin
  }

  // append path: centroids + codebook derived from the EVEN half only
  // (the frozen quantizers of the stored build), everything encoded with
  // them — mirrors IvfPqIndex.build(evens) + append(odds) + topK
  private val ivfPqAppendSql: String = {
    val iters = 1
    s"""WITH $PLANTED_CTES,
       |$REST_QV
       |bld AS (SELECT vec_id, v FROM rest WHERE vec_id % 2 = 0),
       |apnd AS (SELECT vec_id, v FROM rest WHERE vec_id % 2 <> 0),
       |${ivfChainCtes("bld", kmeansIters = iters, nlist = 16)}asgA AS (SELECT vec_id, v, centroid_id FROM (
       |  SELECT r.vec_id, r.v, k.centroid_id, row_number() OVER (PARTITION BY r.vec_id
       |    ORDER BY ${cosSql("r.v", "k.c")} DESC, k.centroid_id) AS rn FROM apnd r, ctr$iters k) WHERE rn = 1),
       |resB AS (SELECT a.vec_id, a.centroid_id,
       |  list_transform(range(0, len(a.v)), i -> a.v[i+1] - k.c[i+1]) AS v
       |  FROM asgF a JOIN ctr$iters k USING (centroid_id)),
       |${pqTrainCtes("resB")},
       |resA AS (SELECT a.vec_id, a.centroid_id,
       |  list_transform(range(0, len(a.v)), i -> a.v[i+1] - k.c[i+1]) AS v
       |  FROM asgA a JOIN ctr$iters k USING (centroid_id)),
       |psvA AS (SELECT vec_id, centroid_id, sub, v[sub*16+1:(sub+1)*16] AS sv FROM resA, subs),
       |encA AS (SELECT vec_id, sub, code FROM (
       |  SELECT s.vec_id, s.sub, k.code, row_number() OVER (PARTITION BY s.vec_id, s.sub
       |    ORDER BY ${l2Sql("s.sv", "k.w")} ASC, k.code) AS rn
       |  FROM psvA s JOIN pqcb1 k ON k.sub = s.sub) WHERE rn = 1),
       |encU AS (SELECT * FROM enc UNION ALL SELECT * FROM encA),
       |resU AS (SELECT vec_id, centroid_id FROM resB
       |  UNION ALL SELECT vec_id, centroid_id FROM resA),
       |probe AS (SELECT centroid_id FROM (SELECT k.centroid_id, ${cosSql("q.v", "k.c")} AS s
       |  FROM qv q, ctr$iters k) ORDER BY s DESC, centroid_id LIMIT 4),
       |qres AS (SELECT k.centroid_id,
       |  list_transform(range(0, len(q.v)), i -> q.v[i+1] - k.c[i+1]) AS v
       |  FROM qv q CROSS JOIN ctr$iters k
       |  JOIN probe p ON p.centroid_id = k.centroid_id),
       |dtabr AS (SELECT r.centroid_id, k.sub, k.code,
       |  ${l2Sql("r.v[k.sub*16+1:(k.sub+1)*16]", "k.w")} AS d2
       |  FROM qres r CROSS JOIN pqcb1 k),
       |adcrU AS (SELECT e.vec_id, round(sum(d2), 6) AS adc_dist
       |  FROM encU e JOIN resU r ON r.vec_id = e.vec_id
       |  JOIN dtabr t ON t.centroid_id = r.centroid_id
       |    AND t.sub = e.sub AND t.code = e.code
       |  GROUP BY e.vec_id)
       |SELECT vec_id, adc_dist FROM adcrU ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin
  }

  // batch residual IVFADC over the FULL planted corpus: per-query probes,
  // per-(query, cell) residual tables, self-matches excluded, top-5 per
  // query — shared by x_ivfpq_batch (in-memory) and x_ivfpq_stored_batch
  private val ivfPqBatchSql: String = {
    val iters = 1
    s"""WITH $PLANTED_CTES,
       |${ivfChainCtes("corpus", kmeansIters = iters, nlist = 16)}res AS (SELECT a.vec_id, a.centroid_id,
       |  list_transform(range(0, len(a.v)), i -> a.v[i+1] - k.c[i+1]) AS v
       |  FROM asgF a JOIN ctr$iters k USING (centroid_id)),
       |${pqTrainCtes("res")},
       |qset AS (SELECT vec_id AS qid, v AS q FROM corpus WHERE vec_id % 100 = 1),
       |probes AS (SELECT qid, centroid_id FROM (
       |  SELECT q.qid, k.centroid_id, row_number() OVER (PARTITION BY q.qid
       |    ORDER BY ${cosSql("q.q", "k.c")} DESC, k.centroid_id) AS rn
       |  FROM qset q, ctr$iters k) WHERE rn <= 4),
       |qres AS (SELECT p.qid, p.centroid_id,
       |  list_transform(range(0, len(q.q)), i -> q.q[i+1] - k.c[i+1]) AS v
       |  FROM probes p JOIN qset q ON q.qid = p.qid
       |  JOIN ctr$iters k ON k.centroid_id = p.centroid_id),
       |dtabb AS (SELECT r.qid, r.centroid_id, k.sub, k.code,
       |  ${l2Sql("r.v[k.sub*16+1:(k.sub+1)*16]", "k.w")} AS d2
       |  FROM qres r CROSS JOIN pqcb1 k),
       |adcb AS (SELECT c.qid, c.vec_id, round(sum(d2), 6) AS adc_dist FROM
       |  (SELECT p.qid, e.vec_id, e.sub, e.code, r.centroid_id
       |   FROM enc e JOIN res r ON r.vec_id = e.vec_id
       |   JOIN probes p ON p.centroid_id = r.centroid_id
       |   WHERE e.vec_id <> p.qid) c
       |  JOIN dtabb t ON t.qid = c.qid AND t.centroid_id = c.centroid_id
       |    AND t.sub = c.sub AND t.code = c.code
       |  GROUP BY c.qid, c.vec_id)
       |SELECT qid, vec_id, adc_dist FROM (
       |  SELECT qid, vec_id, adc_dist, row_number() OVER (PARTITION BY qid
       |    ORDER BY adc_dist, vec_id) AS rn FROM adcb) WHERE rn <= 5""".stripMargin
  }

  val all: Map[String, String] = Map(
    "q_tpch1" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS sum_base_price,
        |round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
        |round(avg(l_quantity),4) AS avg_qty, CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch3" ->
      """SELECT l_orderkey, round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch5" ->
      """SELECT n_name, round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |JOIN customer ON o_custkey=c_custkey AND c_nationkey=s_nationkey
        |WHERE r_name='ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q_tpch6" ->
      """SELECT round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_tpch9" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0, 2) AS profit
        |FROM lineitem JOIN part ON p_partkey=l_partkey
        |JOIN orders ON o_orderkey=l_orderkey
        |JOIN supplier ON s_suppkey=l_suppkey
        |JOIN nation ON n_nationkey=s_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,

    // correlated scalar subquery, verbatim — DuckDB decorrelates it with
    // its own rewrite, so the agreement checks Spark's
    // RewriteCorrelatedScalarSubqueries end to end
    "q_tpch17" ->
      """SELECT round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 700.0, 2) AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#17' AND p_size < 15
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // double-correlated EXISTS / NOT EXISTS, verbatim — DuckDB
    // decorrelates the same text independently (see RefQueries.tpch21)
    "q_tpch21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // same adaptation as the Spark side: late line = shipment-lag proxy
    "q_tpch4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // same adaptations: cntrycode = custkey % 10, dormant-since-2000
    // anti-join, exact-integer cents threshold (no float avg)
    "q_tpch22" ->
      """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS totacctbal
        |FROM (
        |  SELECT c_custkey % 10 AS cntrycode,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer c,
        |       (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
        |               count(*) AS n
        |        FROM customer WHERE c_acctbal > 0.0) t
        |  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * t.n > t.s
        |    AND NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = c.c_custkey
        |                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,

    // verbatim Q13 shape: ON-clause filter, count(col) null semantics
    "q_tpch13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // verbatim Q19 shape: disjunctive join condition, common-factor equi key
    "q_tpch19" ->
      """SELECT round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem, part
        |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
        |       AND p_size BETWEEN 1 AND 5  AND l_quantity >= 1  AND l_quantity <= 11)
        |   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
        |       AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_partkey = l_partkey AND p_brand = 'Brand#15'
        |       AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    // verbatim Q15 shape: CTE referenced twice, exact-integer revenue so the
    // max equality can't knife-edge between engines
    "q_tpch15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS total_rev_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |       round(CAST(total_rev_e4 AS DOUBLE) / 10000, 2) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // verbatim Q16 shape: NOT IN (three-valued) + count(DISTINCT)
    "q_tpch16" ->
      """SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#5'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    // verbatim Q2 shape: correlated `= min` with tie preservation
    "q_tpch2" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey
        |  AND s_suppkey = l_suppkey
        |  AND p_size = 15
        |  AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,

    // verbatim Q20 shape: IN inside IN with a correlated scalar threshold
    "q_tpch20" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l1.l_suppkey FROM lineitem l1
        |  WHERE l1.l_partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'red%')
        |    AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l1.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    AND l1.l_quantity > (SELECT 0.5 * avg(l2.l_quantity)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,

    // verbatim Q7 shape: OR over BOTH nation copies rides above the joins
    "q_tpch7" ->
      """SELECT supp_nation, cust_nation, l_year, round(CAST(sum(volume) AS DOUBLE) / 10000.0, 2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             year(l_shipdate) AS l_year,
        |             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT) AS volume
        |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // verbatim Q8 shape: 8-relation join, exact-integer share
    "q_tpch8" ->
      """SELECT o_year,
        |       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
        |             / CAST(sum(v) AS DOUBLE), 4) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |               * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT) AS v,
        |             n2.n_name AS nation
        |      FROM part, supplier, lineitem, orders, customer,
        |           nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |        AND p_type = 'ECONOMY') all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    // verbatim Q10 shape: exact-integer top-k with a total-order tiebreak
    "q_tpch10" ->
      """SELECT c_custkey, c_name,
        |       round(CAST(rev_e4 AS DOUBLE) / 10000, 2) AS revenue, n_name
        |FROM (SELECT c_custkey, c_name, n_name,
        |             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |                 * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS rev_e4
        |      FROM customer, orders, lineitem, nation
        |      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |        AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |      GROUP BY c_custkey, c_name, n_name) t
        |ORDER BY rev_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // verbatim Q11 shape: exact cross-multiplied mean threshold
    "q_tpch11" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)) AS v
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3'
        |  GROUP BY l_partkey),
        |tot AS (SELECT sum(v) AS s, count(*) AS n FROM val)
        |SELECT l_partkey, round(CAST(v AS DOUBLE) / 100, 2) AS stock_value
        |FROM val, tot
        |WHERE v * tot.n > tot.s
        |ORDER BY v DESC, l_partkey""".stripMargin,

    // verbatim Q12 shape: cross-side 90-day residual + CASE counts
    "q_tpch12" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // verbatim Q14 shape: exact-integer promo share
    "q_tpch14" ->
      """SELECT round(100.0
        |         * CAST(sum(CASE WHEN p_type = 'PROMO' THEN v ELSE 0 END) AS DOUBLE)
        |         / CAST(sum(v) AS DOUBLE), 4) AS promo_revenue
        |FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |               * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT) AS v,
        |             l_partkey
        |      FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00') l, part
        |WHERE l_partkey = p_partkey""".stripMargin,

    "q_tpch18" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, round(b.sq,2) AS sum_qty
        |FROM orders JOIN (SELECT l_orderkey, sum(l_quantity) AS sq FROM lineitem
        |GROUP BY l_orderkey HAVING sum(l_quantity) > 150) b ON o_orderkey=b.l_orderkey""".stripMargin,

    "q02_json_flatten" ->
      "SELECT event_id, CAST(json_extract_string(props,'$.k') AS INT) AS k FROM events",

    "q03_scan_prune" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-06-01 00:00:00'",

    "q09_checksum" ->
      """SELECT n_nationkey, md5(concat_ws('', n_name, CAST(n_nationkey AS VARCHAR),
        |CAST(n_regionkey AS VARCHAR), 'g')) AS "InputChecksum" FROM nation""".stripMargin,

    "q11_cache_diff" ->
      """WITH data AS (SELECT o_orderkey, md5(concat_ws('', o_orderstatus, o_orderpriority)) AS ck FROM orders),
        |cache AS (SELECT o_orderkey, md5(concat_ws('', CASE WHEN o_orderkey%7=0 THEN 'X' ELSE o_orderstatus END, o_orderpriority)) AS ck FROM orders)
        |SELECT d.o_orderkey FROM data d WHERE NOT EXISTS
        |(SELECT 1 FROM cache c WHERE c.o_orderkey=d.o_orderkey AND c.ck=d.ck)""".stripMargin,

    "q12_cache_retain" ->
      """WITH data AS (SELECT o_orderkey, md5(concat_ws('', o_orderstatus, o_orderpriority)) AS ck FROM orders),
        |cache AS (SELECT o_orderkey, md5(concat_ws('', CASE WHEN o_orderkey%7=0 THEN 'X' ELSE o_orderstatus END, o_orderpriority)) AS ck FROM orders)
        |SELECT d.o_orderkey FROM data d WHERE EXISTS
        |(SELECT 1 FROM cache c WHERE c.o_orderkey=d.o_orderkey AND c.ck=d.ck)""".stripMargin,

    "q13_work_limit" ->
      "SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 20",

    "q14_cache_merge" ->
      """WITH u AS (SELECT o_orderkey, 'fresh' AS src FROM orders WHERE o_orderkey%100=0
        |UNION ALL SELECT o_orderkey, 'kept' FROM orders WHERE o_orderkey%100<>0 AND o_orderkey%3=0)
        |SELECT src, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY src""".stripMargin,

    "q15_backfill_sample" ->
      """SELECT o_orderkey FROM (SELECT o_orderkey FROM orders WHERE o_orderstatus='F'
        |ORDER BY o_orderdate DESC, o_orderkey LIMIT 20)
        |ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 10""".stripMargin,

    "q16_zeropad" ->
      """WITH r AS (SELECT o_orderkey AS id,
        |CASE WHEN o_orderkey%3=0 THEN lpad(CAST(o_orderkey AS VARCHAR),10,'0')
        |WHEN o_orderkey%3=1 THEN CAST(o_orderkey AS VARCHAR) END AS nn_raw FROM orders)
        |SELECT id, nn_raw, CASE WHEN regexp_matches(nn_raw,'^[0-9]{10}$')
        |THEN lpad(nn_raw,12,'0') END AS notification_number FROM r""".stripMargin,

    "q17_enum_bool" ->
      """SELECT o_orderkey, CAST(CASE WHEN s='Planned' THEN true WHEN s='Unplanned' THEN false END AS VARCHAR) AS planned
        |FROM (SELECT o_orderkey, CASE WHEN o_orderstatus='O' THEN 'Planned'
        |WHEN o_orderstatus='F' THEN 'Unplanned' ELSE 'Unknown' END AS s FROM orders)""".stripMargin,

    "q18_parse_iso" ->
      """SELECT o_orderkey, iso, strptime(iso,'%Y-%m-%dT%H:%M:%S') AS parsed,
        |strptime(iso,'%Y-%m-%dT%H:%M:%S') + INTERVAL 2 HOUR AS sast_wall
        |FROM (SELECT o_orderkey, strftime(o_orderdate,'%Y-%m-%dT%H:%M:%S') AS iso FROM orders)""".stripMargin,

    "q19_expiry" ->
      "SELECT o_orderkey, o_orderdate + INTERVAL 1 DAY AS expiry FROM orders",

    "q20_duration" ->
      """SELECT l_orderkey, CAST(floor(epoch(max(l_shipdate))) AS BIGINT) -
        |CAST(floor(epoch(min(l_shipdate))) AS BIGINT) AS duration_sec
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q21_dirty_time" ->
      """WITH r AS (SELECT event_id, CASE WHEN event_id%13=0 THEN 'Select...'
        |WHEN event_id%7=0 THEN lpad(CAST(EXTRACT(hour FROM ts) AS VARCHAR),2,'0') || ':60'
        |ELSE lpad(CAST(EXTRACT(hour FROM ts) AS VARCHAR),2,'0') || ':' || lpad(CAST(EXTRACT(minute FROM ts) AS VARCHAR),2,'0') END AS raw FROM events),
        |c AS (SELECT event_id, raw, replace(replace(raw,'60','59'),'Select...','00:00') AS cleaned FROM r)
        |SELECT event_id, raw, cleaned, CASE WHEN regexp_matches(cleaned,'^[0-9]{2}:[0-9]{2}$')
        |AND CAST(substr(cleaned,1,2) AS INT) <= 23 AND CAST(substr(cleaned,4,2) AS INT) <= 59
        |THEN CAST(substr(cleaned,1,2) AS BIGINT)*60 + CAST(substr(cleaned,4,2) AS BIGINT) END AS minutes FROM c""".stripMargin,

    "q22_guarded_parse" ->
      // TRY_CAST in the guard conjuncts, not CAST: DuckDB does not
      // guarantee AND short-circuit order (adaptive expression reordering
      // flipped it at sf0.1 row counts and evaluated CAST('ju') first);
      // identical semantics since the regexp admits only digits
      """WITH r AS (SELECT event_id, CASE WHEN event_id%5=0 THEN NULL WHEN event_id%5=1 THEN 'junk'
        |WHEN event_id%5=2 THEN '7:30' WHEN event_id%5=3 THEN '25:99'
        |ELSE lpad(CAST(EXTRACT(hour FROM ts) AS VARCHAR),2,'0') || ':' || lpad(CAST(EXTRACT(minute FROM ts) AS VARCHAR),2,'0') END AS raw FROM events)
        |SELECT event_id, raw, CASE WHEN regexp_matches(raw,'^[0-9]{2}:[0-9]{2}$')
        |AND TRY_CAST(substr(raw,1,2) AS INT) <= 23 AND TRY_CAST(substr(raw,4,2) AS INT) <= 59
        |THEN CAST(substr(raw,1,2) AS BIGINT)*60 + CAST(substr(raw,4,2) AS BIGINT) END AS minutes FROM r""".stripMargin,

    "q23_combine_datetime" ->
      """SELECT o_orderkey, strptime(strftime(o_orderdate,'%Y-%m-%d') || ' ' ||
        |lpad(CAST(o_orderkey%24 AS VARCHAR),2,'0') || ':' || lpad(CAST(o_custkey%60 AS VARCHAR),2,'0'),
        |'%Y-%m-%d %H:%M') AS start_ts FROM orders""".stripMargin,

    "q24_rollover" ->
      """WITH r AS (SELECT o_orderkey,
        |strptime(strftime(o_orderdate,'%Y-%m-%d') || ' ' || lpad(CAST(o_orderkey%24 AS VARCHAR),2,'0') || ':' || lpad(CAST(o_custkey%60 AS VARCHAR),2,'0'), '%Y-%m-%d %H:%M') AS s,
        |strptime(strftime(o_orderdate,'%Y-%m-%d') || ' ' || lpad(CAST(o_custkey%24 AS VARCHAR),2,'0') || ':' || lpad(CAST(o_orderkey%60 AS VARCHAR),2,'0'), '%Y-%m-%d %H:%M') AS e FROM orders)
        |SELECT o_orderkey, s AS start_ts, CASE WHEN e <= s THEN e + INTERVAL 1 DAY ELSE e END AS end_fixed FROM r""".stripMargin,

    "q25_prefix_coalesce" ->
      """WITH r AS (SELECT doc_id, text AS des,
        |CASE WHEN doc_id%4=0 THEN substr(text,1,30) WHEN doc_id%4=1 THEN 'somewhere else' END AS loc,
        |'area-' || lang AS fb FROM documents)
        |SELECT doc_id, CASE WHEN loc IS NOT NULL AND des IS NOT NULL
        |AND substr(loc,1,length(des)) <> substr(des,1,length(loc)) THEN loc
        |WHEN loc IS NOT NULL AND des IS NULL THEN loc ELSE fb END AS location FROM r""".stripMargin,

    "q26_rename_project" ->
      "SELECT l_orderkey AS alert_id, l_returnflag AS status, l_shipdate AS publish_date FROM lineitem WHERE l_linenumber=1",

    "q27_nulldrop" ->
      """SELECT prio, CAST(count(*) AS BIGINT) AS n FROM
        |(SELECT nullif(o_orderpriority,'1-URGENT') AS prio FROM orders)
        |WHERE prio IS NOT NULL GROUP BY prio""".stripMargin,

    "q28_lookup_join" ->
      "SELECT o_orderkey, c_name, c_mktsegment FROM orders LEFT JOIN customer ON o_custkey=c_custkey",

    "q29_keep_last" ->
      """WITH u AS (SELECT o_orderkey AS id, o_orderstatus AS status, 0 AS pri FROM orders
        |UNION ALL SELECT o_orderkey, 'X', 1 FROM orders WHERE o_orderkey%5=0),
        |r AS (SELECT id, status, row_number() OVER (PARTITION BY id ORDER BY pri DESC, id DESC) AS rn FROM u)
        |SELECT id, status FROM r WHERE rn=1""".stripMargin,

    "q30_cdc_antijoin" ->
      """WITH c AS (SELECT min(ts) + INTERVAL 7 DAY AS cutoff FROM events),
        |prev AS (SELECT DISTINCT user_id, event_type FROM events, c WHERE ts < cutoff),
        |cur AS (SELECT user_id, event_type FROM events, c WHERE ts >= cutoff)
        |SELECT cur.user_id, cur.event_type, CAST(count(*) AS BIGINT) AS n FROM cur
        |WHERE NOT EXISTS (SELECT 1 FROM prev WHERE prev.user_id=cur.user_id AND prev.event_type=cur.event_type)
        |GROUP BY cur.user_id, cur.event_type""".stripMargin,

    "q31_sent_registry" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM
        |(SELECT DISTINCT md5(concat_ws(':', CAST(user_id AS VARCHAR), event_type)) AS rkey
        |FROM events WHERE user_id%3=0) r
        |WHERE r.rkey = md5(concat_ws(':', CAST(e.user_id AS VARCHAR), e.event_type)))
        |GROUP BY event_type""".stripMargin,

    "q32_map_lookup" ->
      """SELECT n_name, r_name, CASE r_name WHEN 'AFRICA' THEN '#africa' WHEN 'AMERICA' THEN '#americas'
        |WHEN 'ASIA' THEN '#asia' WHEN 'EUROPE' THEN '#europe' WHEN 'MIDDLE EAST' THEN '#mideast' END AS hashtag
        |FROM nation JOIN region ON n_regionkey=r_regionkey""".stripMargin,

    "q35_fuzzy_match" ->
      """WITH cand(cand) AS (VALUES ('Brand#1'),('Brand#23'),('Brnd#32'),('Brand#55x'),('Nomatch#9')),
        |b AS (SELECT DISTINCT p_brand FROM part),
        |j AS (SELECT cand, p_brand, CAST(levenshtein(cand, p_brand) AS BIGINT) AS dist
        |FROM cand CROSS JOIN b WHERE levenshtein(cand, p_brand) <= 2),
        |r AS (SELECT cand, p_brand, dist, row_number() OVER (PARTITION BY cand ORDER BY dist, p_brand) AS rn FROM j)
        |SELECT cand, p_brand AS best_brand, dist FROM r WHERE rn=1""".stripMargin,

    "q36_global_min" ->
      "SELECT min(o_orderdate) - INTERVAL 1 DAY AS cutoff FROM orders",

    "q37_group_collect" ->
      """SELECT l_orderkey, string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS parts
        |FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey""".stripMargin,

    "q39_null_scan" ->
      """WITH v AS (SELECT CASE WHEN event_id%5=0 THEN NULL ELSE value END AS v FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_total,
        |CAST(count(CASE WHEN v IS NULL THEN 1 END) AS BIGINT) AS n_null,
        |count(CASE WHEN v IS NULL THEN 1 END) > 0 AS any_null,
        |count(CASE WHEN v IS NULL THEN 1 END) = count(*) AS all_null FROM v""".stripMargin,

    "q40_uniques" -> "SELECT DISTINCT event_type FROM events",

    "q41_sort_desc" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",

    "q43_sample" ->
      "SELECT o_orderkey FROM orders ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 50",

    "q44_serve_current" ->
      """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n FROM orders
        |WHERE o_orderdate + INTERVAL 30 DAY > TIMESTAMP '1999-01-01 00:00:00' AND o_orderkey%2=0
        |GROUP BY o_orderstatus""".stripMargin,

    "q45_serve_7days" ->
      """SELECT o_orderkey AS id, o_orderstatus AS status FROM orders
        |WHERE o_orderdate + INTERVAL 30 DAY > TIMESTAMP '1999-01-01 00:00:00' - INTERVAL 7 DAY
        |AND o_orderkey%2<>0""".stripMargin,

    "q46_versioned_projection" ->
      """SELECT o_orderkey AS id, o_orderpriority AS title,
        |'Alert ' || CAST(o_orderkey AS VARCHAR) AS tweet_text,
        |'Alert ' || CAST(o_orderkey AS VARCHAR) || ' #CapeTown' AS toot_text,
        |CASE WHEN o_orderkey%3=0 THEN 'Citywide' ELSE 'Suburb' END AS area_type,
        |CAST(NULL AS VARCHAR) AS geospatial_footprint, o_orderstatus AS status
        |FROM orders WHERE o_orderkey <= 5000""".stripMargin,

    "q47_bok_fanout" ->
      """WITH base AS (SELECT o_orderdate + INTERVAL 30 DAY AS expiry, o_orderkey%2=0 AS planned FROM orders),
        |wins(w) AS (VALUES ('all'),('7days'),('current')),
        |pls(p) AS (VALUES (true),(false)),
        |vers(v, nc) AS (VALUES ('v0', 2),('v1', 4),('v1.1', 6),('v1.2', 7)),
        |cnt AS (SELECT w, p, CAST(count(*) AS BIGINT) AS n FROM base, wins, pls
        |  WHERE planned = p AND ((w = 'all')
        |    OR (w = '7days' AND expiry > TIMESTAMP '1999-01-01 00:00:00' - INTERVAL 7 DAY)
        |    OR (w = 'current' AND expiry > TIMESTAMP '1999-01-01 00:00:00'))
        |  GROUP BY w, p)
        |SELECT w AS "window", p AS planned, v AS version, n AS n_rows, CAST(nc AS BIGINT) AS n_cols
        |FROM cnt, vers""".stripMargin,

    // ---- geo (box world model; closed-interval intersects like the kernel:
    // boundary touch counts, hence >= 0 on the overlap widths) ----

    "g33_overlay_join" ->
      s"""WITH $GEO_CTES,
         |pairs AS (SELECT c.c_custkey, l.n_name,
         |  greatest(least(c.px+1.0,l.cx+2.0)-greatest(c.px,l.cx),0)
         |    * greatest(least(c.py+1.0,l.cy+2.0)-greatest(c.py,l.cy),0) AS inter
         |  FROM cust c JOIN cells l
         |  ON least(c.px+1.0,l.cx+2.0)-greatest(c.px,l.cx) >= 0
         |  AND least(c.py+1.0,l.cy+2.0)-greatest(c.py,l.cy) >= 0)
         |SELECT c_custkey, string_agg(n_name, ',' ORDER BY n_name) AS inferred_cells
         |FROM pairs WHERE inter/4.0 > 0.045 OR inter/1.0 > 0.045
         |GROUP BY c_custkey""".stripMargin,

    "g34_spatial_semijoin" ->
      s"""WITH $GEO_CTES
         |SELECT c_custkey FROM cust c WHERE EXISTS (SELECT 1 FROM cells l
         |  WHERE l.n_nationkey%2=0
         |  AND least(c.px+1.0,l.cx+2.0)-greatest(c.px,l.cx) >= 0
         |  AND least(c.py+1.0,l.cy+2.0)-greatest(c.py,l.cy) >= 0)""".stripMargin,

    // union area by exact 0.1-cell rasterisation (all box edges lie on the
    // 0.1 grid) — an independent integer-arithmetic check of the dissolve
    // kernel's sweep, not a mirror of it
    "g38_union_agg" ->
      s"""WITH $GEO_CTES,
         |boxes AS (SELECT c_custkey % 25 AS cell,
         |  CAST(round(px*10) AS INT) AS ix0, CAST(round(py*10) AS INT) AS iy0 FROM cust),
         |cov AS (SELECT DISTINCT cell, ix0+i.i AS ix, iy0+j.j AS iy
         |  FROM boxes, (SELECT unnest(range(0,10)) AS i) i, (SELECT unnest(range(0,10)) AS j) j),
         |u AS (SELECT cell, count(*) AS nc FROM cov GROUP BY cell),
         |np AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_parts FROM boxes GROUP BY cell)
         |SELECT np.cell, np.n_parts, round(u.nc/100.0, 4) AS union_area
         |FROM np JOIN u ON u.cell = np.cell""".stripMargin,

    // gridless overlap join — independently validates GridJoin's cell
    // bucketing + first-common-cell dedup (closed intervals, touch counts)
    "g63_grid_join" ->
      """WITH c AS (SELECT c_custkey,
        |  CAST((c_custkey*7)%100 AS DOUBLE)/10.0 AS x0,
        |  CAST((c_custkey*13)%100 AS DOUBLE)/10.0 AS y0 FROM customer),
        |o AS (SELECT o_orderkey,
        |  CAST((o_orderkey*11)%200 AS DOUBLE)/20.0 AS x0,
        |  CAST((o_orderkey*17)%200 AS DOUBLE)/20.0 AS y0
        |  FROM orders WHERE o_orderkey <= 5000)
        |SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_overlaps
        |FROM c JOIN o ON c.x0 <= o.x0+0.5 AND o.x0 <= c.x0+1.0
        |              AND c.y0 <= o.y0+0.5 AND o.y0 <= c.y0+1.0
        |GROUP BY c_custkey""".stripMargin,

    // cascade mirror: per step the footprint area is closed-form (cell 4.0,
    // geocoded buffer (2·0.02)², fallback buffer (2·0.01)²), so the oracle
    // checks step routing + area without a WKT formatter
    "g56_geocode_cascade" ->
      """WITH cust AS (SELECT c_custkey,
        |  CASE WHEN c_custkey%3=0 THEN 'NATION#' || CAST(c_custkey%25 AS VARCHAR)
        |       WHEN c_custkey%3=1 THEN 'NATIN#' || CAST(c_custkey%25 AS VARCHAR)
        |       ELSE 'unknown place ' || CAST(c_custkey AS VARCHAR) END AS loc_text
        |  FROM customer WHERE c_custkey <= 500),
        |layer AS (SELECT 'NATION#' || CAST(n_nationkey AS VARCHAR) AS layer_name FROM nation),
        |ex AS (SELECT c.c_custkey, c.loc_text, l.layer_name FROM cust c
        |  LEFT JOIN layer l ON c.loc_text = l.layer_name),
        |fz AS (SELECT c_custkey, loc_text, layer_name AS fname FROM (
        |  SELECT e.c_custkey, e.loc_text, l.layer_name,
        |    row_number() OVER (PARTITION BY e.c_custkey
        |      ORDER BY levenshtein(e.loc_text, l.layer_name), l.layer_name) AS rn
        |  FROM (SELECT * FROM ex WHERE layer_name IS NULL) e
        |  LEFT JOIN layer l ON levenshtein(e.loc_text, l.layer_name) <= 2) WHERE rn = 1)
        |SELECT c_custkey, 'exact' AS resolution, 4.0 AS fp_area FROM ex WHERE layer_name IS NOT NULL
        |UNION ALL SELECT c_custkey, 'fuzzy', 4.0 FROM fz WHERE fname IS NOT NULL
        |UNION ALL SELECT c_custkey, 'geocoded', 0.0016 FROM fz WHERE fname IS NULL AND c_custkey%2=0
        |UNION ALL SELECT c_custkey, 'fallback', 0.0004 FROM fz WHERE fname IS NULL AND c_custkey%2<>0""".stripMargin,

    "q59_image_filename" ->
      """WITH k AS (SELECT o_orderkey, concat_ws('_', o_orderstatus, o_orderpriority,
        |CAST(o_orderkey AS VARCHAR)) AS key FROM orders),
        |b AS (SELECT o_orderkey, key, base64(CAST(substr(key,1,48) AS BLOB)) AS b64 FROM k)
        |SELECT o_orderkey, CASE WHEN length(b64) > 22 THEN sha256(key) ELSE b64 END AS image_filename FROM b""".stripMargin,

    "q48_predicate_string" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (regexp_matches(lower(text),'stream') OR strpos(text,'spark') > 0) AND lang <> 'fr'""".stripMargin,

    "q49_array_filter" ->
      s"""SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM
         |(SELECT doc_id, lang, $TOK AS tk FROM documents)
         |WHERE list_contains(tk, 'spark') AND lang <> 'de'""".stripMargin,

    "q51_doc_render" ->
      s"""SELECT doc_id, concat_ws(' | ', 'id=' || CAST(doc_id AS VARCHAR), 'lang=' || lang,
         |CASE WHEN n_chars > 100 THEN 'long' END,
         |'head=' || array_to_string(tk[1:3], ' ')) AS rendered
         |FROM (SELECT doc_id, lang, n_chars, $TOK AS tk FROM documents)""".stripMargin,

    "q50_service_area" ->
      """SELECT doc_id, service_area FROM (SELECT doc_id,
        |CASE WHEN lang='en' THEN 'Water' WHEN lang='es' THEN 'Energy' ELSE 'Roads' END AS service_area
        |FROM documents) WHERE service_area = 'Water'""".stripMargin,

    "q51b_html_render" ->
      // esc() mirrors Emailer.htmlEscape (&, <, > — & first); the synthetic
      // fields here contain none of them, so esc is semantically inert for
      // this data but keeps the mirror faithful to the expression
      """WITH r AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey%3=0 THEN 'Open' WHEN o_orderkey%3=1 THEN 'Closed' ELSE 'In Progress' END AS status,
        |  o_orderpriority AS title,
        |  'Area-' || CAST(o_custkey%10 AS VARCHAR) AS area,
        |  CASE WHEN o_orderkey%4=0 THEN 'Suburb' WHEN o_orderkey%4=1 THEN 'Official Planning Suburb'
        |       WHEN o_orderkey%4=2 THEN 'Citywide' END AS area_type,
        |  CASE WHEN o_orderkey%5<>0 THEN ['sub-' || CAST(o_orderkey%7 AS VARCHAR), 'sub-' || CAST(o_custkey%7 AS VARCHAR)] END AS suburbs,
        |  ['ward ' || CAST(o_orderkey%11 AS VARCHAR)] AS wards,
        |  CASE WHEN o_orderkey%6<>0 THEN 'Alert ' || CAST(o_orderkey AS VARCHAR) END AS post
        |  FROM orders WHERE o_orderkey <= 2000),
        |x AS (SELECT o_orderkey, status, area, post,
        |  CASE WHEN status='Open' THEN 'Service Alert - ' ELSE 'Updated Service Alert - ' END || title || ' in ' || area AS subject,
        |  CASE WHEN area_type IS NULL OR area_type NOT IN ('Official Planning Suburb','Citywide')
        |    THEN array_to_string(suburbs, ', ') END AS subv,
        |  CASE WHEN area_type IS NULL OR area_type <> 'Citywide' THEN array_to_string(wards, ', ') END AS wardv
        |  FROM r)
        |SELECT o_orderkey,
        |  concat_ws('_', sha256('a@x|render-test'), replace(lower(status),' ','-'),
        |    CAST(o_orderkey AS VARCHAR)) || '.html' AS email_filename,
        |  concat_ws('', '<html><body><h2>', subject, '</h2><table>',
        |    CASE WHEN status IS NOT NULL THEN '<tr><td>status</td><td>' || status || '</td></tr>' END,
        |    CASE WHEN area IS NOT NULL THEN '<tr><td>area</td><td>' || area || '</td></tr>' END,
        |    CASE WHEN subv IS NOT NULL THEN '<tr><td>suburbs</td><td>' || subv || '</td></tr>' END,
        |    CASE WHEN wardv IS NOT NULL THEN '<tr><td>wards</td><td>' || wardv || '</td></tr>' END,
        |    '</table><p>', coalesce(post, ''), '</p></body></html>') AS html
        |FROM x""".stripMargin,

    "q52_hashing" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha,
        |base64(CAST(substr(text,1,48) AS BLOB)) AS h_b64 FROM documents WHERE doc_id < 100""".stripMargin,

    "q53_llm_draft" ->
      """SELECT doc_id AS id, CASE WHEN length(trim(lang || ': ' || text)) < 2 THEN NULL
        |ELSE substr(lang || ': ' || text, 1, 280) END AS tweet_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,

    "q54_toot" ->
      """SELECT doc_id AS id, substr(lang || ': ' || text, 1, 280) || chr(10) ||
        |coalesce(CASE lang WHEN 'en' THEN '#water' WHEN 'es' THEN '#energia' WHEN 'fr' THEN '#eau'
        |WHEN 'de' THEN '#wasser' WHEN 'zh' THEN '#shui' END, '#CityAlert') || ' #CapeTown' AS toot_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,

    "q61_change_stream" ->
      """WITH c AS (SELECT min(ts) + INTERVAL 7 DAY AS cutoff FROM events),
        |p AS (SELECT user_id, event_type, min(ts) AS first_seen FROM events GROUP BY user_id, event_type)
        |SELECT user_id, event_type, first_seen FROM p, c WHERE first_seen >= cutoff""".stripMargin,

    // Op-55 shape repair: the reference's misconstruction ladder mirrored
    // with json_transform (DuckDB's from_json analogue — same null-on-
    // mismatch and raw-JSON-text-for-scalar semantics), exploded to one row
    // per repaired token; rejected payload classes (3, 4, 5) emit nothing
    "q55_shape_repair" ->
      """WITH base AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_custkey*13%100 AS VARCHAR) AS x,
        |    CAST(c_custkey*29%100 AS VARCHAR) AS y
        |  FROM customer WHERE c_custkey <= 300),
        |pay AS (SELECT id,
        |  CASE CAST(id%6 AS INT)
        |    WHEN 0 THEN '[["P'||x||'","Q'||y||'"]]'
        |    WHEN 1 THEN '[[["R'||x||'"]]]'
        |    WHEN 2 THEN '["S'||x||'","T'||y||'"]'
        |    WHEN 3 THEN 'junk '||x
        |    WHEN 4 THEN '[[["A'||x||'"],["B'||y||'"]]]'
        |    ELSE '["U'||x||'",["V'||y||'"]]'
        |  END AS p FROM base),
        |parsed AS (SELECT id,
        |  CASE WHEN json_valid(p) THEN json_transform(p, '[[["VARCHAR"]]]') END AS t3,
        |  CASE WHEN json_valid(p) THEN json_transform(p, '[["VARCHAR"]]') END AS t2,
        |  CASE WHEN json_valid(p) THEN json_transform(p, '["VARCHAR"]') END AS t1
        |  FROM pay),
        |rep AS (SELECT id,
        |  CASE
        |    WHEN t1 IS NOT NULL AND len(t1) = 0 THEN CAST([] AS VARCHAR[][])
        |    WHEN t3 IS NOT NULL
        |         AND COALESCE(len(list_filter(t3, x -> x IS NULL)), 1) = 0
        |         AND COALESCE(len(list_filter(flatten(t3), x -> x IS NULL)), 1) = 0
        |         AND COALESCE(len(list_filter(flatten(flatten(t3)), x -> x IS NULL)), 1) = 0
        |      THEN CASE WHEN len(t3) = 1 AND len(t3[1]) = 1
        |                     AND COALESCE(len(list_filter(flatten(t3[1]), x -> regexp_matches(x, '^\s*[\[{]'))), 1) = 0
        |                THEN t3[1] END
        |    WHEN t2 IS NOT NULL
        |         AND COALESCE(len(list_filter(t2, x -> x IS NULL)), 1) = 0
        |         AND COALESCE(len(list_filter(flatten(t2), x -> x IS NULL)), 1) = 0
        |         AND COALESCE(len(list_filter(flatten(t2), x -> regexp_matches(x, '^\s*[\[{]'))), 1) = 0
        |      THEN t2
        |    WHEN t1 IS NOT NULL
        |         AND COALESCE(len(list_filter(t1, x -> x IS NULL)), 1) = 0
        |         AND COALESCE(len(list_filter(t1, x -> regexp_matches(x, '^\s*[\[{]'))), 1) = 0
        |         AND len(t1) >= 2
        |      THEN [t1]
        |  END AS r FROM parsed),
        |g AS (SELECT id, unnest(r) AS grp, generate_subscripts(r, 1) AS gi
        |  FROM rep WHERE r IS NOT NULL),
        |tkn AS (SELECT id, gi, unnest(grp) AS token, generate_subscripts(grp, 1) AS ti FROM g)
        |SELECT id, CAST(gi - 1 AS BIGINT) AS gi, CAST(ti - 1 AS BIGINT) AS ti, token
        |FROM tkn""".stripMargin,

    // Op-5 versioned store: v1 pruned by retain=2, so the surviving
    // versions are exactly the v2/v3 slices; n_versions locks the retention
    "q05_versioned_store" ->
      """WITH v2 AS (SELECT c_custkey AS id, 'X'||c_mktsegment AS seg
        |  FROM customer WHERE c_custkey > 100 AND c_custkey <= 300),
        |v3 AS (SELECT c_custkey AS id, lower(c_mktsegment) AS seg
        |  FROM customer WHERE c_custkey > 200 AND c_custkey <= 400)
        |SELECT CAST(2 AS BIGINT) AS version, id, seg, CAST(2 AS BIGINT) AS n_versions FROM v2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), id, seg, CAST(2 AS BIGINT) FROM v3""".stripMargin,

    // Op-6 JSON document sink round trip: the read-back rows must equal the
    // filtered serving rows, tagged with the reference filename contract
    "q06_json_doc_sink" ->
      """WITH alerts AS (SELECT o_orderkey AS Id,
        |  CASE WHEN o_orderstatus='O' THEN 'Open' WHEN o_orderstatus='F' THEN 'Closed'
        |       ELSE 'Pending' END AS status,
        |  o_orderkey % 2 = 0 AS planned
        |  FROM orders WHERE o_orderkey <= 200)
        |SELECT 'v1/alerts-all-planned.json' AS doc, Id, status FROM alerts WHERE planned
        |UNION ALL
        |SELECT 'v1/alerts-all-unplanned.json', Id, status FROM alerts WHERE NOT planned""".stripMargin,

    // Op-62 versioned fan-out, read back under the full schema: columns a
    // version drops come back NULL
    "q62_versioned_fanout" ->
      """WITH alerts AS (SELECT c_custkey AS Id,
        |  CASE WHEN c_custkey%3=0 THEN 'Open' ELSE 'Closed' END AS status,
        |  CASE WHEN c_custkey%2=0 THEN 'Suburb' ELSE 'Ward' END AS area_type,
        |  'POINT ('||CAST(c_custkey*7%100 AS VARCHAR)||' '||CAST(c_custkey*13%100 AS VARCHAR)||')' AS geospatial_footprint
        |  FROM customer WHERE c_custkey <= 200)
        |SELECT 'v1' AS version, Id, CAST(NULL AS VARCHAR) AS status,
        |  CAST(NULL AS VARCHAR) AS area_type, CAST(NULL AS VARCHAR) AS geospatial_footprint FROM alerts
        |UNION ALL
        |SELECT 'v1.1', Id, CAST(NULL AS VARCHAR), area_type, geospatial_footprint FROM alerts
        |UNION ALL
        |SELECT 'v1.2', Id, status, area_type, geospatial_footprint FROM alerts""".stripMargin,

    // closed-form box difference/erosion: ward cells are disjoint, so the
    // area of square \ (dissolved wards) is 1 − Σ per-cell overlaps; the
    // erosion of a unit box by d is (1−2d)² (zero when 2d ≥ 1)
    "g_diff_erode" ->
      s"""WITH $GEO_CTES,
         |ov AS (SELECT c.c_custkey,
         |  sum(greatest(0, least(c.px+1, l.cx+2) - greatest(c.px, l.cx)) *
         |      greatest(0, least(c.py+1, l.cy+2) - greatest(c.py, l.cy))) AS cov
         |  FROM cust c, cells l WHERE l.n_nationkey%2=0 GROUP BY c.c_custkey)
         |SELECT c.c_custkey,
         |  round(1.0 - o.cov, 4) AS diff_area,
         |  round(1.0 - o.cov, 4) AS diff_area_fast,
         |  round(power(greatest(0.0, 1.0 - 2*(CAST(c.c_custkey%3 AS DOUBLE)+1.0)/10.0), 2), 4) AS erode_area
         |FROM cust c JOIN ov o ON o.c_custkey = c.c_custkey""".stripMargin,

    // EP-2 composed pipeline: the per-op oracle fragments of q16-q27, q28,
    // q29 and q44-46 chained through CTEs in the same order the Spark query
    // chains the operators — so a pass here is evidence the COMPOSITION is
    // right, not just each stage.
    "q_ep2_pipeline" ->
      """WITH raw AS (SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus, o_orderdate,
        |  CASE WHEN o_orderkey%3=0 THEN lpad(CAST(o_orderkey AS VARCHAR),10,'0')
        |       WHEN o_orderkey%3=1 THEN CAST(o_orderkey AS VARCHAR) END AS nn_raw,
        |  CASE WHEN o_orderstatus='O' THEN 'Planned' WHEN o_orderstatus='F' THEN 'Unplanned'
        |       ELSE 'Unknown' END AS planned_raw,
        |  strftime(o_orderdate,'%Y-%m-%dT%H:%M:%S') AS iso,
        |  CASE WHEN o_orderkey%13=0 THEN 'Select...'
        |       WHEN o_orderkey%7=0 THEN lpad(CAST(o_custkey%24 AS VARCHAR),2,'0') || ':60'
        |       ELSE lpad(CAST(o_custkey%24 AS VARCHAR),2,'0') || ':' || lpad(CAST(o_orderkey%60 AS VARCHAR),2,'0') END AS start_raw,
        |  lpad(CAST(o_orderkey%24 AS VARCHAR),2,'0') || ':' || lpad(CAST(o_custkey%60 AS VARCHAR),2,'0') AS end_raw,
        |  CASE WHEN o_orderkey%4=0 THEN substr(o_orderpriority,1,8)
        |       WHEN o_orderkey%4=1 THEN 'somewhere else' END AS loc_raw
        |  FROM orders),
        |f1 AS (SELECT o_orderkey AS id, o_custkey, o_orderpriority AS title, o_orderstatus AS status,
        |  CASE WHEN regexp_matches(nn_raw,'^[0-9]{10}$') THEN lpad(nn_raw,12,'0') END AS notification_number,
        |  CASE WHEN planned_raw='Planned' THEN true WHEN planned_raw='Unplanned' THEN false END AS planned,
        |  strptime(iso,'%Y-%m-%dT%H:%M:%S') + INTERVAL 1 DAY AS expiry_date,
        |  replace(replace(start_raw,'60','59'),'Select...','00:00') AS start_clean,
        |  end_raw, loc_raw, o_orderdate
        |  FROM raw),
        |f2 AS (SELECT *,
        |  CASE WHEN regexp_matches(start_clean,'^[0-9]{2}:[0-9]{2}$')
        |    AND CAST(substr(start_clean,1,2) AS INT) <= 23 AND CAST(substr(start_clean,4,2) AS INT) <= 59
        |    THEN CAST(substr(start_clean,1,2) AS BIGINT)*60 + CAST(substr(start_clean,4,2) AS BIGINT) END AS start_minutes,
        |  strptime(strftime(o_orderdate,'%Y-%m-%d') || ' ' || start_clean, '%Y-%m-%d %H:%M') AS start_ts,
        |  strptime(strftime(o_orderdate,'%Y-%m-%d') || ' ' || end_raw, '%Y-%m-%d %H:%M') AS end_ts
        |  FROM f1),
        |f3 AS (SELECT id, o_custkey, title, status, notification_number, planned, expiry_date,
        |  start_minutes, start_ts,
        |  CASE WHEN end_ts <= start_ts THEN end_ts + INTERVAL 1 DAY ELSE end_ts END AS end_fixed,
        |  CASE WHEN loc_raw IS NOT NULL AND substr(loc_raw,1,length(title)) <> substr(title,1,length(loc_raw))
        |       THEN loc_raw ELSE 'area-' || CAST(o_custkey%10 AS VARCHAR) END AS location
        |  FROM f2 WHERE planned IS NOT NULL),
        |j AS (SELECT f3.*, CAST(floor(epoch(end_fixed)) AS BIGINT) - CAST(floor(epoch(start_ts)) AS BIGINT) AS duration_sec,
        |  c_name, c_mktsegment
        |  FROM f3 LEFT JOIN customer ON o_custkey=c_custkey),
        |u AS (SELECT id, title, status, notification_number, planned, expiry_date, start_minutes,
        |    start_ts, end_fixed, duration_sec, location, c_name, c_mktsegment, 0 AS pri FROM j
        |  UNION ALL
        |  SELECT id, 'UPDATED', status, notification_number, planned, expiry_date, start_minutes,
        |    start_ts, end_fixed, duration_sec, location, c_name, c_mktsegment, 1 FROM j WHERE id%5=0),
        |m AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY pri DESC, id DESC) AS rn FROM u)
        |SELECT id, title, status, notification_number, start_minutes, start_ts, end_fixed,
        |  duration_sec, location, c_name, c_mktsegment
        |FROM m WHERE rn=1 AND expiry_date > TIMESTAMP '1995-06-01 00:00:00' AND planned = true""".stripMargin,

    // EP-3 composed pipeline: the Augmenter chain's per-op oracle fragments
    // (q09/q11/q13 incremental load, q53 draft, q54 toot, g56 cascade,
    // g33 overlay+collect, q59 image filename, q12/q14 merge) chained in
    // the same order the Spark query chains the operators.
    "q_ep3_pipeline" ->
      """WITH base AS (SELECT c_custkey AS id, c_name, c_mktsegment
        |  FROM customer WHERE c_custkey <= 500),
        |cur AS (SELECT id, c_name, c_mktsegment,
        |  md5(concat_ws('', CASE WHEN id%7=0 THEN 'X' ELSE c_mktsegment END, c_name)) AS ck,
        |  (id*37)%1000 AS publish_ord FROM base),
        |cache AS (SELECT id, md5(concat_ws('', c_mktsegment, c_name)) AS ck,
        |  'cached:' || CAST(id AS VARCHAR) AS tweet_text FROM base),
        |work AS (SELECT * FROM cur c WHERE NOT EXISTS
        |   (SELECT 1 FROM cache k WHERE k.id=c.id AND k.ck=c.ck)
        |  ORDER BY publish_ord DESC, id LIMIT 40),
        |tooted AS (SELECT id, c_mktsegment AS title, tweet_text,
        |  CASE WHEN tweet_text IS NOT NULL THEN tweet_text || chr(10) ||
        |    coalesce(CASE c_mktsegment WHEN 'BUILDING' THEN '#Building'
        |      WHEN 'MACHINERY' THEN '#Machinery' WHEN 'HOUSEHOLD' THEN '#Household' END,
        |      '#CityAlert') || ' #CapeTown' END AS toot_text
        |  FROM (SELECT id, c_mktsegment,
        |    CASE WHEN length(trim(c_mktsegment || ': ' || c_name)) < 2 THEN NULL
        |      ELSE substr(c_mktsegment || ': ' || c_name, 1, 280) END AS tweet_text
        |    FROM work)),
        |loc AS (SELECT id,
        |  CASE WHEN id%3=0 THEN 'NATION#' || CAST(id%25 AS VARCHAR)
        |       WHEN id%3=1 THEN 'NATIN#' || CAST(id%25 AS VARCHAR)
        |       ELSE 'unknown place ' || CAST(id AS VARCHAR) END AS loc_text
        |  FROM work),
        |cells AS (SELECT n_nationkey, n_name,
        |  CAST(n_nationkey%5 AS DOUBLE)*2.0 AS cx,
        |  CAST(n_nationkey//5 AS DOUBLE)*2.0 AS cy FROM nation),
        |layer AS (SELECT 'NATION#' || CAST(n_nationkey AS VARCHAR) AS layer_name,
        |  n_nationkey FROM nation),
        |ex AS (SELECT lc.id, lc.loc_text, l.layer_name, l.n_nationkey FROM loc lc
        |  LEFT JOIN layer l ON lc.loc_text = l.layer_name),
        |fz AS (SELECT id, loc_text, fname, fn FROM (
        |  SELECT e.id, e.loc_text, l.layer_name AS fname, l.n_nationkey AS fn,
        |    row_number() OVER (PARTITION BY e.id
        |      ORDER BY levenshtein(e.loc_text, l.layer_name), l.layer_name) AS rn
        |  FROM (SELECT * FROM ex WHERE layer_name IS NULL) e
        |  LEFT JOIN layer l ON levenshtein(e.loc_text, l.layer_name) <= 2) WHERE rn = 1),
        |fp AS (
        |  SELECT e.id, 'exact' AS resolution,
        |    CAST(e.n_nationkey%5 AS DOUBLE)*2.0 AS x0,
        |    CAST(e.n_nationkey//5 AS DOUBLE)*2.0 AS y0,
        |    CAST(e.n_nationkey%5 AS DOUBLE)*2.0+2.0 AS x1,
        |    CAST(e.n_nationkey//5 AS DOUBLE)*2.0+2.0 AS y1
        |  FROM ex e WHERE e.layer_name IS NOT NULL
        |  UNION ALL
        |  SELECT f.id, 'fuzzy', CAST(f.fn%5 AS DOUBLE)*2.0, CAST(f.fn//5 AS DOUBLE)*2.0,
        |    CAST(f.fn%5 AS DOUBLE)*2.0+2.0, CAST(f.fn//5 AS DOUBLE)*2.0+2.0
        |  FROM fz f WHERE f.fname IS NOT NULL
        |  UNION ALL
        |  SELECT f.id, 'geocoded',
        |    CAST((f.id*3)%100 AS DOUBLE)/10.0-0.02, CAST((f.id*11)%100 AS DOUBLE)/10.0-0.02,
        |    CAST((f.id*3)%100 AS DOUBLE)/10.0+0.02, CAST((f.id*11)%100 AS DOUBLE)/10.0+0.02
        |  FROM fz f WHERE f.fname IS NULL AND f.id%2=0
        |  UNION ALL
        |  SELECT f.id, 'fallback',
        |    CAST((f.id*7)%100 AS DOUBLE)/10.0-0.01, CAST((f.id*13)%100 AS DOUBLE)/10.0-0.01,
        |    CAST((f.id*7)%100 AS DOUBLE)/10.0+0.01, CAST((f.id*13)%100 AS DOUBLE)/10.0+0.01
        |  FROM fz f WHERE f.fname IS NULL AND f.id%2<>0),
        |inferred AS (SELECT id, string_agg(n_name, ',' ORDER BY n_name) AS inferred_cells
        |  FROM (SELECT f.id, c.n_name,
        |    greatest(least(f.x1,c.cx+2.0)-greatest(f.x0,c.cx),0)
        |      * greatest(least(f.y1,c.cy+2.0)-greatest(f.y0,c.cy),0) AS inter,
        |    (f.x1-f.x0)*(f.y1-f.y0) AS fpa
        |  FROM fp f JOIN cells c
        |  ON least(f.x1,c.cx+2.0)-greatest(f.x0,c.cx) >= 0
        |  AND least(f.y1,c.cy+2.0)-greatest(f.y0,c.cy) >= 0)
        |  WHERE inter/4.0 > 0.045 OR inter/fpa > 0.045
        |  GROUP BY id),
        |imk AS (SELECT f.id, f.resolution,
        |  round((f.x1-f.x0)*(f.y1-f.y0), 6) AS fp_area, i.inferred_cells,
        |  concat_ws('_', 'map', f.resolution, CAST(f.id AS VARCHAR)) AS key
        |  FROM fp f LEFT JOIN inferred i ON i.id = f.id),
        |fresh AS (SELECT t.id, 'fresh' AS src, t.tweet_text, t.toot_text,
        |  k.resolution, k.fp_area, k.inferred_cells,
        |  CASE WHEN length(base64(CAST(substr(k.key,1,48) AS BLOB))) > 22
        |    THEN sha256(k.key) ELSE base64(CAST(substr(k.key,1,48) AS BLOB)) END
        |    AS image_filename
        |  FROM tooted t JOIN imk k ON k.id = t.id),
        |kept AS (SELECT k.id, 'kept' AS src, k.tweet_text,
        |  CAST(NULL AS VARCHAR) AS toot_text, CAST(NULL AS VARCHAR) AS resolution,
        |  CAST(NULL AS DOUBLE) AS fp_area, CAST(NULL AS VARCHAR) AS inferred_cells,
        |  CAST(NULL AS VARCHAR) AS image_filename
        |  FROM cache k WHERE EXISTS (SELECT 1 FROM cur c WHERE c.id=k.id AND c.ck=k.ck))
        |SELECT id, src, tweet_text, toot_text, resolution, fp_area,
        |  inferred_cells, image_filename FROM fresh
        |UNION ALL SELECT * FROM kept""".stripMargin,

    // ---- ext ----

    "x_tokens" ->
      s"""SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |CAST(coalesce(list_sum(list_transform(tk, x -> CAST(ceil(length(x)/4.0) AS BIGINT))), 0) AS BIGINT) AS n_subwords
         |FROM (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL)""".stripMargin,

    "x_quality" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(tk) AS BIGINT) AS n_tokens,
         |round(CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS DOUBLE) / greatest(len(tk), 1), 4) AS mean_tok_len,
         |round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 4) AS punct_ratio,
         |round(CAST(len(list_filter(tk, x -> list_contains($EN_STOPS, x))) AS DOUBLE) / greatest(len(tk), 1), 4) AS stop_ratio
         |FROM (SELECT doc_id, text, $TOK AS tk FROM documents WHERE text IS NOT NULL)""".stripMargin,

    "x_langid" ->
      s"""SELECT doc_id, $LANG_SELECT_SCORES, $LANG_PRED AS pred_lang FROM ($LANG_SCORED)""",

    "x_tokens_unicode" ->
      s"""SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(j, '[\\x00-\\x7f]', '', 'g')) AS BIGINT)
         |    AS n_nonlatin_chars,
         |  md5(j) AS tok_digest
         |FROM (SELECT doc_id, tk, array_to_string(tk, ' ') AS j
         |  FROM (SELECT doc_id, ${tokUni(MULTI_TEXT)} AS tk
         |        FROM documents WHERE text IS NOT NULL))""".stripMargin,

    "x_langid_uni" -> {
      val profs = graft.queries.ExtQueries.uniProfiles
      val scoreCols = profs.map { case (l, stops) =>
        val lst = stops.map(w => s"'$w'").mkString("[", ",", "]")
        s"CAST(len(list_filter(tk, x -> list_contains($lst, x))) AS BIGINT) AS score_$l"
      }.mkString(", ")
      val names = profs.map(p => s"score_${p._1}").mkString(", ")
      val maxExpr = profs.map(p => s"score_${p._1}")
        .mkString("greatest(", ", ", ")")
      val pred = profs.map { case (l, _) =>
        s"WHEN score_$l = m AND m > 0 THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      val x = graft.queries.ExtQueries.MultiSuffixes
      val mtext = s"(CASE WHEN doc_id % 11 = 0 THEN '${x(0)}' " +
        s"WHEN doc_id % 11 = 1 THEN '${x(1)}' ELSE text END)"
      s"""SELECT doc_id, $names, $pred AS pred_lang FROM
         |(SELECT doc_id, $names, $maxExpr AS m FROM
         |  (SELECT doc_id, $scoreCols FROM
         |    (SELECT doc_id, ${tokUni(mtext)} AS tk
         |     FROM documents WHERE text IS NOT NULL)))""".stripMargin
    },

    "x_dedup_exact_uni" ->
      s"""WITH $UNI_ALLV
         |SELECT md5(array_to_string(tk, ' ')) AS content_hash,
         |  min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
         |FROM (SELECT doc_id, ${tokUni("text")} AS tk FROM allv)
         |GROUP BY 1""".stripMargin,

    // banded MinHash over the unicode shingle stream of the NFC-variant
    // corpus — the same signature/band machinery, tokenized NFC-first so
    // variant spellings shingle identically
    "x_dedup_minhash_uni" ->
      s"""WITH $UNI_ALLV,
         |${shingleCtes(tokUni("text"), "allv")}
         |SELECT doc_a, doc_b FROM pairs""".stripMargin,

    // add-alpha unigram LM over the multilingual stream, reference = the
    // en-language slice (whose fixture suffixes put non-Latin tokens IN
    // the vocabulary); per-occurrence avg ≡ the Spark side's weighted
    // form after 6-dp rounding
    "x_lm_score_uni" ->
      s"""WITH toks AS (SELECT doc_id, lang, ${tokUni(MULTI_TEXT)} AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |cnts AS (SELECT tok, count(*) AS cnt FROM
         |  (SELECT unnest(tk) AS tok FROM toks WHERE lang = 'en') GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T,
         |  CAST(count(*) AS DOUBLE) AS V FROM cnts),
         |lp AS (SELECT doc_id, ln((coalesce(cnt, 0) + 0.1) / (T + 0.1 * (V + 1))) AS lp
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) dtok
         |  LEFT JOIN cnts USING (tok) CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  round(avg(lp), 6) AS avg_logp,
         |  round(exp(-round(avg(lp), 6)), 4) AS ppl
         |FROM lp GROUP BY doc_id""".stripMargin,

    "x_subword_uni" ->
      s"""WITH RECURSIVE ${bpeSegCtes(tokUni(MULTI_TEXT))}
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(p.np, 0) AS BIGINT) AS n_subwords
         |FROM toksb t LEFT JOIN (SELECT doc_id, count(*) AS np
         |  FROM seg WHERE pp >= 0 GROUP BY doc_id) p USING (doc_id)""".stripMargin,

    // vocab pieces are alphanumeric and \p{L}\p{N} tokens carry no '<',
    // so the LIKE arm matches exactly the byte-fallback expansions
    "x_bpe_bytes" ->
      s"""WITH RECURSIVE ${bpeSegBytesCtes(tokUni(MULTI_TEXT))}
         |SELECT piece, CAST(count(*) AS BIGINT) AS n FROM (
         |  SELECT unnest(CASE WHEN piece LIKE '<0x%' THEN
         |      regexp_extract_all(piece, '<0x[0-9A-F]{2}>')
         |    ELSE [piece] END) AS piece
         |  FROM seg WHERE pp >= 0)
         |GROUP BY piece""".stripMargin,

    // the multilingual composed pipeline: one unicode tokenization feeds
    // langid (first-wins argmax over the profile order), the union-stop
    // quality ratio, the per-LANGUAGE gate (n>=10 AND round-4 mean < 0.01
    // evicts — exactly the und stratum), and the per-stratum A-ES top-5
    // weighted by token count
    "x_curation_uni" -> {
      val profs = graft.queries.ExtQueries.uniProfiles
      val unionStops = listLit(profs.flatMap(_._2))
      val scores = profs.map { case (l, ws) =>
        s"len(list_filter(tk, x -> list_contains(${listLit(ws)}, x))) AS score_$l"
      }.mkString(",\n  ")
      val mx = profs.map(p => s"score_${p._1}").mkString("greatest(", ", ", ")")
      val pred = profs.map { case (l, _) =>
        s"WHEN score_$l = $mx THEN '$l'"
      }.mkString(s"CASE WHEN $mx = 0 THEN 'und' ", " ", "END")
      s"""WITH t AS (SELECT doc_id, ${tokUni(UNI_TEXT)} AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, len(tk) AS nt,
         |  $scores,
         |  round(CAST(len(list_filter(tk, x -> list_contains($unionStops, x))) AS DOUBLE)
         |    / greatest(len(tk), 1), 4) AS stop_ratio FROM t),
         |p AS (SELECT doc_id, nt, stop_ratio, $pred AS pred_lang FROM s),
         |st AS (SELECT pred_lang, count(*) AS n,
         |  round(avg(stop_ratio), 4) AS src_mean FROM p GROUP BY pred_lang),
         |g AS (SELECT p.doc_id, p.pred_lang, p.nt, st.src_mean
         |  FROM p JOIN st USING (pred_lang)
         |  WHERE NOT (st.n >= 10 AND coalesce(st.src_mean < 0.01, false)))
         |SELECT doc_id, pred_lang, src_mean FROM (
         |  SELECT doc_id, pred_lang, src_mean, row_number() OVER (
         |    PARTITION BY pred_lang
         |    ORDER BY round(-ln(greatest(
         |      ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0,
         |      1e-12)) / CAST(greatest(nt, 1) AS DOUBLE), 6), doc_id) AS rk
         |  FROM g)
         |WHERE rk <= 5""".stripMargin
    },

    // x_char_entropy over the multilingual fixture — string_split('')
    // steps code points, so non-Latin characters carry their own counts
    "x_char_entropy_uni" ->
      s"""WITH ch AS (SELECT doc_id,
         |    unnest(list_filter(string_split($MULTI_TEXT, ''), c -> c <> '')) AS ch
         |  FROM documents WHERE $MULTI_TEXT IS NOT NULL
         |    AND length($MULTI_TEXT) > 0),
         |cc AS (SELECT doc_id, ch, count(*) AS n FROM ch GROUP BY doc_id, ch)
         |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars_counted,
         |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy
         |FROM cc GROUP BY doc_id""".stripMargin,

    // the Gopher battery over the unicode token stream; len() is
    // code-point length, matching Spark's numChars-based length()
    "x_gopher_uni" ->
      s"""WITH toks AS (SELECT doc_id, ${tokUni(MULTI_TEXT)} AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |m AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
         |  len(array_to_string(tk, '')) AS nc FROM toks)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct,
         |  round(nc / CAST(greatest(n, 1) AS DOUBLE), 4) AS mean_tok_len,
         |  round((n - nd) / CAST(greatest(n, 1) AS DOUBLE), 4) AS dup_tok_frac,
         |  (n >= 15 AND n <= 1000 AND nc * 10 >= n * 40 AND nc * 10 <= n * 50
         |   AND (n - nd) * 100 <= n * 55 AND n > 0) AS keep
         |FROM m""".stripMargin,

    // byte-fallback counts through the packing consumer: each recursion
    // step's piece is either one vocab/char piece (cost 1) or a
    // CONCATENATED byte expansion (cost = number of <0xXX> pieces), so
    // the per-doc subword count prices unknown code points at their true
    // UTF-8 byte length; then the shared md5-bucket packing tail
    "x_bpe_pack_bytes" ->
      s"""WITH RECURSIVE ${bpeSegBytesCtes(tokUni(MULTI_TEXT))},
         |cnt AS (SELECT doc_id, CAST(sum(CASE WHEN piece LIKE '<0x%'
         |    THEN len(regexp_extract_all(piece, '<0x[0-9A-F]{2}>'))
         |    ELSE 1 END) AS BIGINT) AS n_sub
         |  FROM seg WHERE pp >= 0 GROUP BY doc_id),
         |t AS (SELECT tb.doc_id, coalesce(cnt.n_sub, 0) AS n_tokens,
         |    md5(CAST(tb.doc_id AS VARCHAR)) AS ord_key
         |  FROM (SELECT DISTINCT doc_id FROM toksb) tb
         |  LEFT JOIN cnt USING (doc_id)),
         |b AS (SELECT doc_id, n_tokens, ord_key,
         |  ${hex32("ord_key", 1)} % 8 AS bucket FROM t),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY bucket ORDER BY ord_key, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM b)
         |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin, n_tokens
         |FROM c""".stripMargin,

    "x_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS fingerprint
         |FROM (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL)""".stripMargin,

    // the full composed chain: wrap → extraction → stop-ratio on the
    // extracted text → source gate (n>=10 AND round-4 mean < 0.026) →
    // per-source top-5 by the A-ES key weighted by extracted length
    "x_curation_pipeline" ->
      s"""WITH ex AS (SELECT doc_id, source, trim(regexp_replace(
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    '<html><head><style>body{color:red}</style></head><body><h1>'
         |      || source ||
         |    '</h1><script type="text/javascript">var x = 1 &amp;&amp; 2;</script><p>'
         |      || text ||
         |    '</p><div class="footer">&copy; &amp; &lt;fin&gt;&nbsp;ok</div></body></html>',
         |    '(?is)<(script|style)\\b[^>]*>.*?</(script|style)>', ' ', 'g'),
         |    '(?s)<[^>]*>', ' ', 'g'),
         |    '&nbsp;', ' ', 'g'),
         |    '&lt;', '<', 'g'),
         |    '&gt;', '>', 'g'),
         |    '&quot;', '"', 'g'),
         |    '&#39;', '''', 'g'),
         |    '&amp;', '&', 'g'),
         |  '\\s+', ' ', 'g')) AS extracted
         |FROM documents WHERE text IS NOT NULL),
         |sc AS (SELECT doc_id, source, extracted,
         |  round(CAST(len(list_filter(tk, x -> list_contains($EN_STOPS, x))) AS DOUBLE)
         |    / greatest(len(tk), 1), 4) AS stop_ratio
         |  FROM (SELECT doc_id, source, extracted,
         |    list_filter(string_split_regex(lower(regexp_replace(extracted, '[^a-zA-Z0-9 ]', ' ', 'g')), ' +'), x -> x <> '') AS tk
         |    FROM ex)),
         |st AS (SELECT source, count(*) AS src_n,
         |  round(avg(stop_ratio), 4) AS src_mean FROM sc GROUP BY source),
         |gated AS (SELECT sc.doc_id, sc.source, sc.extracted, st.src_mean
         |  FROM sc JOIN st ON sc.source IS NOT DISTINCT FROM st.source
         |  WHERE NOT (st.src_n >= 10 AND coalesce(st.src_mean < 0.026, false)))
         |SELECT doc_id, source, src_mean FROM (
         |  SELECT doc_id, source, src_mean, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY round(-ln(greatest(
         |      ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0,
         |      1e-12)) / CAST(length(extracted) AS DOUBLE), 6), doc_id) AS rk
         |  FROM gated)
         |WHERE rk <= 5""".stripMargin,

    // same wrap, same strip chain (script/style with content, then tags,
    // then nbsp, then entities with &amp; LAST), same whitespace collapse
    "x_html_extract" ->
      """SELECT doc_id, md5(extracted) AS extract_md5,
        |  CAST(length(extracted) AS BIGINT) AS n_chars
        |FROM (SELECT doc_id, trim(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    '<html><head><style>body{color:red}</style></head><body><h1>'
        |      || source ||
        |    '</h1><script type="text/javascript">var x = 1 &amp;&amp; 2;</script><p>'
        |      || text ||
        |    '</p><div class="footer">&copy; &amp; &lt;fin&gt;&nbsp;ok</div></body></html>',
        |    '(?is)<(script|style)\b[^>]*>.*?</(script|style)>', ' ', 'g'),
        |    '(?s)<[^>]*>', ' ', 'g'),
        |    '&nbsp;', ' ', 'g'),
        |    '&lt;', '<', 'g'),
        |    '&gt;', '>', 'g'),
        |    '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'),
        |    '&amp;', '&', 'g'),
        |  '\s+', ' ', 'g')) AS extracted
        |FROM documents WHERE text IS NOT NULL)""".stripMargin,

    // winnowing (k=3, w=4): integer-encoded window minima mirror
    // TextOps.winnow's hash*2^17 + (2^17-1-pos) rightmost-tie encoding
    "x_winnow" -> {
      val h32 = hex32("md5(u.sh)", 1)
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |sh AS (SELECT doc_id, u.pos AS pos, $h32 * 131072 + (131071 - u.pos) AS enc FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2, 0)+1),
         |    i -> struct_pack(pos := i-1, sh := array_to_string(tk[i:i+2], ' ')))) AS u FROM toks)),
         |win AS (SELECT doc_id, count(*) OVER fr AS n, min(enc) OVER fr AS mn
         |  FROM sh WINDOW fr AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
         |sel AS (SELECT DISTINCT doc_id, mn // 131072 AS fph FROM win WHERE n = 4)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         |md5(string_agg(CAST(fph AS VARCHAR), ',' ORDER BY fph)) AS fp_digest
         |FROM sel GROUP BY doc_id""".stripMargin
    },

    "x_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        |FROM documents WHERE text IS NOT NULL GROUP BY md5(text)""".stripMargin,

    "x_dedup_minhash" ->
      s"WITH $SHINGLE_CTES SELECT doc_a, doc_b FROM pairs",

    // transitive closure (WITH RECURSIVE) — an independent algorithm for
    // the same clusters the Spark side derives by min-label propagation
    "x_dedup_clusters" ->
      s"""WITH RECURSIVE $SHINGLE_CTES,
         |docs AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lab AS (SELECT d.doc_id,
         |  least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
         |  FROM docs d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id)
         |SELECT doc_id, cluster_id FROM lab""".stripMargin,

    "x_dedup_jaccard" ->
      s"""WITH $SHINGLE_CTES,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_inter FROM pairs p
         |  JOIN sh a ON a.doc_id = p.doc_a JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
         |  GROUP BY p.doc_a, p.doc_b)
         |SELECT p.doc_a, p.doc_b,
         |round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / (sa.sz + sb.sz - coalesce(i.n_inter, 0)), 4) AS jaccard
         |FROM pairs p LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |JOIN sizes sa ON sa.doc_id = p.doc_a JOIN sizes sb ON sb.doc_id = p.doc_b""".stripMargin,

    // chunk windows rebuilt by direct list slicing (1-based inclusive in
    // DuckDB, start+length in Spark — same 32-token window every 24)
    "x_chunks" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |nz AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
         |c AS (SELECT doc_id, i AS chunk_id,
         |  array_to_string(tk[i*24+1 : i*24+32], ' ') AS chunk,
         |  least(n - i*24, 32) AS n_tokens
         |  FROM nz, unnest(range(0,
         |    1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT))) AS t(i))
         |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |  md5(chunk) AS chunk_md5, CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,

    // the naive cross-split exact join — no prefix filter — over the same
    // increment/registry split as x_incr_dedup
    "x_setsim_rs" ->
      s"""WITH $SHINGLE_CTES,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS l_id, b.doc_id AS r_id, CAST(count(*) AS BIGINT) AS ni
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.doc_id % 5 = 3 AND b.doc_id % 5 <> 3
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i.l_id, i.r_id,
         |  round(CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni), 4) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.l_id
         |JOIN sizes sb ON sb.doc_id = i.r_id
         |WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.5""".stripMargin,

    // naive cross-split containment — intersection over |left set|
    "x_contain_join" ->
      s"""WITH $SHINGLE_CTES,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS l_id, b.doc_id AS r_id, CAST(count(*) AS BIGINT) AS ni
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.doc_id % 5 = 3 AND b.doc_id % 5 <> 3
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i.l_id, i.r_id,
         |  round(CAST(ni AS DOUBLE) / sa.sz, 4) AS containment
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.l_id
         |WHERE CAST(ni AS DOUBLE) / sa.sz >= 0.7""".stripMargin,

    // incremental dedup vs the registry: SHINGLE_CTES' sig/bands cover all
    // docs; candidates keep only cross-split (new x registry) band hits,
    // verified at Jaccard >= 0.5; the exact tier is a content-hash join
    "x_incr_dedup" ->
      s"""WITH $SHINGLE_CTES,
         |nd AS (SELECT doc_id, md5(text) AS h FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 5 = 3),
         |reg AS (SELECT DISTINCT md5(text) AS h FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 5 <> 3),
         |ex AS (SELECT DISTINCT nd.doc_id FROM nd JOIN reg ON nd.h = reg.h),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id % 5 = 3 AND b.doc_id % 5 <> 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS ni
         |  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b),
         |near AS (SELECT DISTINCT i.doc_a AS doc_id FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.doc_a
         |  JOIN sizes sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.5)
         |SELECT nd.doc_id, ex.doc_id IS NOT NULL AS exact_dup,
         |  near.doc_id IS NOT NULL AS near_dup,
         |  ex.doc_id IS NULL AND near.doc_id IS NULL AS kept
         |FROM nd LEFT JOIN ex ON ex.doc_id = nd.doc_id
         |LEFT JOIN near ON near.doc_id = nd.doc_id""".stripMargin,

    // the NAIVE exact algorithm (no prefix filter): every co-occurring
    // pair's shared-shingle count — zero-intersection pairs have J=0 < theta
    // and need no row, so no cross join is required even naively
    "x_setsim_join" ->
      s"""WITH $SHINGLE_CTES,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS ni
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i.doc_a, i.doc_b,
         |  round(CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni), 4) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
         |JOIN sizes sb ON sb.doc_id = i.doc_b
         |WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.6""".stripMargin,

    // blocking recall: NAIVE quadratic ground truth vs the rank-window
    // candidates, both computed independently in SQL
    "x_blocking_recall" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM d a JOIN d b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |  AND abs(a.n_chars - b.n_chars) <= 2),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS rk FROM d),
        |sn AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM r a JOIN r b ON a.source = b.source
        |    AND b.rk - a.rk BETWEEN 1 AND 3),
        |fnd AS (SELECT e.id_a, e.id_b FROM ex e
        |  JOIN sn ON sn.id_a = e.id_a AND sn.id_b = e.id_b)
        |SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
        |  CAST((SELECT count(*) FROM fnd) AS BIGINT) AS n_found,
        |  round((SELECT count(*) FROM fnd) * 1.0
        |    / (SELECT count(*) FROM ex), 4) AS recall""".stripMargin,

    // sorted-neighborhood candidates via the NAIVE rank-difference join
    "x_sorted_nbr" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rk
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM r a JOIN r b ON a.source = b.source
        |  AND b.rk - a.rk BETWEEN 1 AND 3""".stripMargin,

    // LSH recall vs the exact >= 0.6 pairs — both sides computed
    // independently inside the oracle too (bands vs the naive join)
    "x_minhash_recall" ->
      s"""WITH $SHINGLE_CTES,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
         |  FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS ni
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |exact AS (SELECT i.doc_a, i.doc_b FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.doc_a
         |  JOIN sizes sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.6),
         |found AS (SELECT e.doc_a, e.doc_b FROM exact e
         |  JOIN pairs p ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b)
         |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
         |  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
         |  round((SELECT count(*) FROM found) * 1.0
         |    / (SELECT count(*) FROM exact), 4) AS recall""".stripMargin,

    "x_dedup_simhash" ->
      s"$SIMHASH_SQL SELECT doc_id, simhash FROM sims",

    "x_simhash_pairs" -> {
      // pigeonhole-complete banding for maxHamming=3: 4 blocks of 8 bits
      // (mirrors DedupOps.simhashPairs)
      val blocks = (0 until 4).map(b =>
        s"(simhash // ${1L << (8 * b)}) % 256 AS h$b").mkString(", ")
      val branches = (0 until 4).map(b =>
        s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sim_a, b.simhash AS sim_b
           |  FROM w a JOIN w b ON a.h$b = b.h$b AND a.doc_id < b.doc_id""".stripMargin)
        .mkString("\n  UNION\n  ")
      s"""$SIMHASH_SQL,
         |w AS (SELECT doc_id, simhash, $blocks FROM sims),
         |p AS ($branches)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(sim_a, sim_b)) <= 3""".stripMargin
    },

    "x_embed_topk" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS bv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT vec_id, $COS AS cos_sim FROM
         |(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS av FROM embeddings WHERE vec_id <> 0), q)
         |SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    // JL projection: identical md5 plane derivation as the SRP mirror,
    // dot per (vector, plane), sqrt(3/16) variance-absorbing scale
    "x_rp_project" ->
      s"""WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |planes AS (SELECT p.p, d.d,
         |  ${hex32("md5('plane' || CAST(p.p AS VARCHAR) || ':' || CAST(d.d AS VARCHAR))", 1)} / 4294967296.0 * 2.0 - 1.0 AS comp
         |  FROM (SELECT unnest(range(0, 16)) AS p) p,
         |       (SELECT unnest(range(0, 64)) AS d) d),
         |expl AS (SELECT vec_id, i AS d, v[i+1] AS x FROM
         |  (SELECT vec_id, v, unnest(range(0, len(v))) AS i FROM corpus)),
         |dots AS (SELECT vec_id, p, sum(x * comp) AS dt FROM expl
         |  JOIN planes ON planes.d = expl.d GROUP BY vec_id, p)
         |SELECT vec_id, CAST(p AS INT) AS comp,
         |  round(dt * sqrt(3.0 / 16), 6) AS y FROM dots""".stripMargin,

    // covariance via the NAIVE exploded self-join (the Spark side builds
    // pairs in-row) with the identical TWO-PASS centered arithmetic:
    // per-dim means rounded to 6 dp first, then E[(x-mu_i)(y-mu_j)] —
    // centering keeps every summand O(sigma^2) so the 6-dp round is
    // portable across summation orders (the one-pass E[xy]-E[x]E[y] form
    // cancellation-amplified engine noise into the 6th decimal)
    "x_embed_cov" ->
      """WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |expl AS (SELECT vec_id, i AS d, v[i+1] AS x FROM
        |  (SELECT vec_id, v, unnest(range(0, len(v))) AS i FROM corpus)),
        |mu AS (SELECT d, round(avg(x), 6) AS m FROM expl GROUP BY d),
        |cx AS (SELECT vec_id, expl.d, x - m AS xc
        |  FROM expl JOIN mu ON mu.d = expl.d),
        |pr AS (SELECT a.d AS i, b.d AS j, a.xc AS xi, b.xc AS xj
        |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id AND a.d <= b.d),
        |cv AS (SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  round(sum(xi * xj) / count(*), 6) AS c0
        |FROM pr GROUP BY i, j)
        |SELECT i, j,
        |  CASE WHEN c0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE c0 END AS cov
        |FROM cv""".stripMargin,

    // PCA invariants: every expected value is a CONSTANT (orthonormal axes,
    // zero eigen residual, sorted eigenvalues, centred projections whose
    // per-component variance is the eigenvalue) — so the oracle is a pure
    // VALUES surface and needs no eigen solver; x_embed_cov separately
    // proves the covariance matrix the solve ran on
    "x_pca_invariants" ->
      """WITH ks AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS p),
        |ortho AS (SELECT 'ortho' AS "check", a.p AS p, b.p AS q,
        |    CAST(CASE WHEN a.p = b.p THEN 1.0 ELSE 0.0 END AS DOUBLE) AS "val"
        |  FROM ks a JOIN ks b ON a.p <= b.p),
        |resid AS (SELECT 'eig_resid' AS "check", p, p AS q,
        |  CAST(0.0 AS DOUBLE) AS "val" FROM ks),
        |ord AS (SELECT 'lambda_order' AS "check", p, p + 1 AS q,
        |  CAST(1.0 AS DOUBLE) AS "val" FROM ks WHERE p < 3),
        |pm AS (SELECT 'proj_mean' AS "check", p, p AS q,
        |  CAST(0.0 AS DOUBLE) AS "val" FROM ks),
        |pv AS (SELECT 'proj_var_err' AS "check", p, p AS q,
        |  CAST(0.0 AS DOUBLE) AS "val" FROM ks)
        |SELECT * FROM ortho UNION ALL SELECT * FROM resid
        |UNION ALL SELECT * FROM ord UNION ALL SELECT * FROM pm
        |UNION ALL SELECT * FROM pv""".stripMargin,

    // PCA projection check surface: per-component aggregates of the actual
    // projection have CONSTANT expected values (centred mean 0, variance =
    // eigenvalue), so the oracle needs no eigen solver — only the corpus
    // row count ties it to the table
    "x_pca_project" ->
      """WITH ks AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS comp)
        |SELECT comp,
        |  (SELECT count(*) FROM embeddings) AS n_rows,
        |  CAST(0.0 AS DOUBLE) AS mean_y,
        |  CAST(0.0 AS DOUBLE) AS var_err
        |FROM ks""".stripMargin,

    // per-source median + MAD outlier flags (quantile_cont mirrors Spark's
    // exact interpolated percentile)
    "x_mad_outlier" ->
      """WITH base AS (SELECT doc_id, source AS stratum,
        |    CAST(n_chars AS DOUBLE) AS x
        |  FROM documents WHERE n_chars IS NOT NULL),
        |m1 AS (SELECT stratum, quantile_cont(x, 0.5) AS med
        |  FROM base GROUP BY stratum),
        |dv AS (SELECT doc_id, stratum, x, med, abs(x - med) AS dev
        |  FROM base JOIN m1 USING (stratum)),
        |m2 AS (SELECT stratum, quantile_cont(dev, 0.5) AS mad
        |  FROM dv GROUP BY stratum)
        |SELECT doc_id, stratum, x, round(med, 4) AS med,
        |  round(mad, 4) AS mad, (dev > 3 * mad) AS is_outlier
        |FROM dv JOIN m2 USING (stratum)""".stripMargin,

    // per-dimension z-score: parallel unnests zip the (0-based) dim index
    // with the element stream; population stddev, constant dims → 0
    "x_embed_norm" ->
      """WITH ex AS (SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
        |  FROM embeddings),
        |st AS (SELECT dim, avg(x) AS mu, stddev_pop(x) AS sd
        |  FROM ex GROUP BY dim)
        |SELECT vec_id, CAST(dim AS INT) AS dim,
        |  CASE WHEN sd > 0 THEN round((x - mu) / sd, 6) ELSE 0.0 END AS z
        |FROM ex JOIN st USING (dim)""".stripMargin,

    // per-pair round-6 cosine then max — the same order as the Spark side's
    // array_max over rounded transform (round is monotone, so either
    // order agrees; mirrored anyway)
    "x_embed_decontam" ->
      """WITH ev AS (SELECT CAST(embedding AS DOUBLE[]) AS v
        |            FROM embeddings WHERE vec_id % 100 = 7),
        |tr AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings WHERE vec_id % 100 <> 7)
        |SELECT tr.vec_id,
        |  max(round(list_dot_product(tr.v, ev.v) /
        |    (sqrt(list_dot_product(tr.v, tr.v)) *
        |     sqrt(list_dot_product(ev.v, ev.v))), 6)) AS max_eval_sim,
        |  max(round(list_dot_product(tr.v, ev.v) /
        |    (sqrt(list_dot_product(tr.v, tr.v)) *
        |     sqrt(list_dot_product(ev.v, ev.v))), 6)) >= 0.35 AS contaminated
        |FROM tr LEFT JOIN ev ON true GROUP BY tr.vec_id""".stripMargin,

    "x_embed_neardup" ->
      s"""WITH $PLANTED_CTES
         |SELECT id_a, id_b, cos_sim FROM
         |(SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.v", "b.v")} AS cos_sim
         |FROM corpus a, corpus b WHERE a.vec_id < b.vec_id)
         |WHERE cos_sim >= 0.99""".stripMargin,

    // full SRP mirror: 16 planes from the same md5 derivation, 4 bands of 4
    // sign bits, candidates share any band key, then exact cosine verify
    "x_ann_lsh" ->
      s"""WITH $PLANTED_CTES, ${srpCtes(16)},
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos_sim FROM
         |  (SELECT id_a, id_b, ${cosSql("a.v", "b.v")} AS cos_sim
         |   FROM cand JOIN corpus a ON a.vec_id = id_a JOIN corpus b ON b.vec_id = id_b)
         |WHERE cos_sim >= 0.99""".stripMargin,

    // corpus-sized banding: bits/band = smallest b with 64*2^b >= n
    // (integer shift-and-compare on BOTH engines — no float log2
    // knife-edge), planes = 4*bits; otherwise the x_ann_lsh mirror.
    // coalesce(min(b), 32) mirrors Scala autoBandBits' b<=32 cap: with no
    // satisfying b in [1,32] (n > 64*2^32) min() would be NULL and the
    // oracle SQL would break exactly where the engine caps instead.
    "x_ann_lsh_auto" ->
      s"""WITH $PLANTED_CTES,
         |lshsz AS (SELECT coalesce(min(b), 32) AS bits FROM range(1, 33) t(b)
         |  WHERE (CAST(64 AS BIGINT) << b) >= (SELECT count(*) FROM corpus)),
         |${srpCtes("((SELECT bits FROM lshsz) * 4)", "(SELECT bits FROM lshsz)")},
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos_sim FROM
         |  (SELECT id_a, id_b, ${cosSql("a.v", "b.v")} AS cos_sim
         |   FROM cand JOIN corpus a ON a.vec_id = id_a JOIN corpus b ON b.vec_id = id_b)
         |WHERE cos_sim >= 0.99""".stripMargin,

    // banded probe: a query's candidates share any band key with it
    "x_ann_lsh_batch" ->
      s"""WITH $PLANTED_CTES, ${srpCtes(16)}, $LSH_BATCH_CTES
         |SELECT qid, vec_id, cos_sim FROM topk WHERE rn <= 10""".stripMargin,

    // corpus-sized banded probe: same lshsz sizing CTE as x_ann_lsh_auto
    "x_ann_lsh_batch_auto" ->
      s"""WITH $PLANTED_CTES,
         |lshsz AS (SELECT coalesce(min(b), 32) AS bits FROM range(1, 33) t(b)
         |  WHERE (CAST(64 AS BIGINT) << b) >= (SELECT count(*) FROM corpus)),
         |${srpCtes("((SELECT bits FROM lshsz) * 4)", "(SELECT bits FROM lshsz)")}, $LSH_BATCH_CTES
         |SELECT qid, vec_id, cos_sim FROM topk WHERE rn <= 10""".stripMargin,

    "x_ann_lsh_recall" ->
      s"""WITH $PLANTED_CTES, ${srpCtes(16)}, $LSH_BATCH_CTES,
         |lsh AS (SELECT qid, vec_id FROM topk WHERE rn <= 10),
         |bscored AS (SELECT q.qid, b.vec_id, ${cosSql("a.v", "b.v")} AS cos_sim
         |  FROM qids q JOIN corpus a ON a.vec_id = q.qid, corpus b
         |  WHERE b.vec_id <> q.qid),
         |brute AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM bscored) WHERE rn <= 10)
         |SELECT CAST(count(*) AS BIGINT) AS n_true, CAST(count(l.vec_id) AS BIGINT) AS n_found,
         |round(count(l.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall
         |FROM brute b LEFT JOIN lsh l ON l.qid = b.qid AND l.vec_id = b.vec_id""".stripMargin,

    // the x_ann_lsh_recall mirror with the corpus-sized banding (lshsz
    // CTE) — the recall-honesty row for the auto forms
    "x_ann_lsh_auto_recall" ->
      s"""WITH $PLANTED_CTES,
         |lshsz AS (SELECT coalesce(min(b), 32) AS bits FROM range(1, 33) t(b)
         |  WHERE (CAST(64 AS BIGINT) << b) >= (SELECT count(*) FROM corpus)),
         |${srpCtes("((SELECT bits FROM lshsz) * 4)", "(SELECT bits FROM lshsz)")}, $LSH_BATCH_CTES,
         |lsh AS (SELECT qid, vec_id FROM topk WHERE rn <= 10),
         |bscored AS (SELECT q.qid, b.vec_id, ${cosSql("a.v", "b.v")} AS cos_sim
         |  FROM qids q JOIN corpus a ON a.vec_id = q.qid, corpus b
         |  WHERE b.vec_id <> q.qid),
         |brute AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM bscored) WHERE rn <= 10)
         |SELECT CAST(count(*) AS BIGINT) AS n_true, CAST(count(l.vec_id) AS BIGINT) AS n_found,
         |round(count(l.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall
         |FROM brute b LEFT JOIN lsh l ON l.qid = b.qid AND l.vec_id = b.vec_id""".stripMargin,

    // recall-TARGETED auto sizing: bits from the lshsz shift-and-compare,
    // then the band count r is the smallest with S-curve recall
    // 1-(1-q^bits)^r >= 0.95 at theta=0.9, replayed in the SAME 6-dp
    // fixed-point integer recurrence as Scala recallBands — two recursive
    // CTEs of (x*y + 500000) // 1000000 multiply-rounds, never power()
    // (pow is only within-1-ulp cross-engine; a last-ulp disagreement at
    // the miss <= 50000 boundary would size DIFFERENT geometries). The
    // only float is round(acos*1e6) where the fraction sits at .707,
    // nowhere near the rounding boundary. Verified bit-identical to the
    // Scala recurrence at both fixture scales: (bits 5, pb 460754,
    // bands 5) at n=2000, (9, 247881, 11) at n=20000.
    "x_ann_lsh_recall_target" ->
      s"""WITH RECURSIVE $PLANTED_CTES,
         |lshsz AS (SELECT coalesce(min(b), 32) AS bits FROM range(1, 33) t(b)
         |  WHERE (CAST(64 AS BIGINT) << b) >= (SELECT count(*) FROM corpus)),
         |qmic AS (SELECT CAST(round((1 - acos(0.9)/pi()) * 1000000) AS BIGINT) AS q),
         |pbit(i, pb) AS (
         |  SELECT 0, CAST(1000000 AS BIGINT)
         |  UNION ALL
         |  SELECT i + 1, (pb * (SELECT q FROM qmic) + 500000) // 1000000
         |  FROM pbit WHERE i < (SELECT bits FROM lshsz)),
         |pbv AS (SELECT pb FROM pbit WHERE i = (SELECT bits FROM lshsz)),
         |bandit(r, miss) AS (
         |  SELECT 1, 1000000 - (SELECT pb FROM pbv)
         |  UNION ALL
         |  SELECT r + 1, (miss * (1000000 - (SELECT pb FROM pbv)) + 500000) // 1000000
         |  FROM bandit WHERE miss > 50000 AND r < 64),
         |bandsz AS (SELECT min(r) AS r FROM bandit WHERE miss <= 50000),
         |${srpCtes("((SELECT bits FROM lshsz) * (SELECT r FROM bandsz))", "(SELECT bits FROM lshsz)")},
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
         |found AS (SELECT id_a, id_b FROM
         |  (SELECT id_a, id_b, ${cosSql("a.v", "b.v")} AS cos_sim
         |   FROM cand JOIN corpus a ON a.vec_id = id_a JOIN corpus b ON b.vec_id = id_b)
         |  WHERE cos_sim >= 0.9),
         |brute AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM corpus a, corpus b WHERE a.vec_id < b.vec_id
         |    AND ${cosSql("a.v", "b.v")} >= 0.9)
         |SELECT CAST((SELECT bits FROM lshsz) AS INT) AS bits,
         |  CAST((SELECT r FROM bandsz) AS INT) AS bands,
         |  (SELECT count(*) FROM cand) AS n_cand,
         |  (SELECT count(*) FROM brute) AS n_true,
         |  (SELECT count(*) FROM found) AS n_found,
         |  round((SELECT count(*) FROM found) / CAST((SELECT count(*) FROM brute) AS DOUBLE), 4) AS recall""".stripMargin,

    // query-side recall target (the batch-serve symmetric of the pairs
    // row): identical integer sizing recurrences, then the batch
    // candidate join + per-query top-25 window; truth is (query,
    // neighbor>=theta) pairs from brute force, both directions of the
    // id_a<id_b pair table
    "x_ann_topk_recall_target" ->
      s"""WITH RECURSIVE $PLANTED_CTES,
         |lshsz AS (SELECT coalesce(min(b), 32) AS bits FROM range(1, 33) t(b)
         |  WHERE (CAST(64 AS BIGINT) << b) >= (SELECT count(*) FROM corpus)),
         |qmic AS (SELECT CAST(round((1 - acos(0.9)/pi()) * 1000000) AS BIGINT) AS q),
         |pbit(i, pb) AS (
         |  SELECT 0, CAST(1000000 AS BIGINT)
         |  UNION ALL
         |  SELECT i + 1, (pb * (SELECT q FROM qmic) + 500000) // 1000000
         |  FROM pbit WHERE i < (SELECT bits FROM lshsz)),
         |pbv AS (SELECT pb FROM pbit WHERE i = (SELECT bits FROM lshsz)),
         |bandit(r, miss) AS (
         |  SELECT 1, 1000000 - (SELECT pb FROM pbv)
         |  UNION ALL
         |  SELECT r + 1, (miss * (1000000 - (SELECT pb FROM pbv)) + 500000) // 1000000
         |  FROM bandit WHERE miss > 50000 AND r < 64),
         |bandsz AS (SELECT min(r) AS r FROM bandit WHERE miss <= 50000),
         |${srpCtes("((SELECT bits FROM lshsz) * (SELECT r FROM bandsz))", "(SELECT bits FROM lshsz)")},
         |qset AS (SELECT vec_id AS qid FROM corpus
         |  WHERE vec_id % 50 = 0 AND vec_id < 10000),
         |brute AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM corpus a, corpus b WHERE a.vec_id < b.vec_id
         |    AND round(${cosSql("a.v", "b.v")}, 6) >= 0.9),
         |truep AS (SELECT qid, id_b AS nid FROM brute JOIN qset ON id_a = qid
         |  UNION ALL SELECT qid, id_a AS nid FROM brute JOIN qset ON id_b = qid),
         |qb AS (SELECT qid, band, bkey FROM bands JOIN qset ON bands.vec_id = qset.qid),
         |cand AS (SELECT DISTINCT qid, c.vec_id AS nid
         |  FROM qb JOIN bands c USING (band, bkey) WHERE c.vec_id <> qid),
         |scored AS (SELECT cand.qid, cand.nid, round(${cosSql("a.v", "b.v")}, 6) AS cos_sim
         |  FROM cand JOIN corpus a ON a.vec_id = cand.qid
         |  JOIN corpus b ON b.vec_id = cand.nid),
         |topk AS (SELECT qid, nid FROM (SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rn
         |  FROM scored) WHERE rn <= 25),
         |found AS (SELECT t.qid, t.nid FROM truep t JOIN topk ON topk.qid = t.qid AND topk.nid = t.nid)
         |SELECT CAST((SELECT bits FROM lshsz) AS INT) AS bits,
         |  CAST((SELECT r FROM bandsz) AS INT) AS bands,
         |  (SELECT count(*) FROM cand) AS n_cand,
         |  (SELECT count(*) FROM truep) AS n_true,
         |  (SELECT count(*) FROM found) AS n_found,
         |  round((SELECT count(*) FROM found) / CAST((SELECT count(*) FROM truep) AS DOUBLE), 4) AS recall""".stripMargin,

    "x_ann_ivf" ->
      s"""WITH $PLANTED_CTES, ${ivfCtes(kmeansIters = 2, nlist = 16, nprobe = 4, k = 20)}
         |SELECT vec_id, cos_sim FROM ivf""".stripMargin,

    // filtered ANN: chain trained on the FULL rest (one index, many
    // filters), candidates restricted to label = 1 BEFORE the top-k
    "x_ann_filtered" -> {
      val iters = 2
      s"""WITH corpus AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |rest AS (SELECT vec_id, v FROM corpus WHERE vec_id <> 0),
         |qv AS (SELECT v FROM corpus WHERE vec_id = 0),
         |${ivfChainCtes("rest", kmeansIters = iters, nlist = 16)}probe AS (SELECT centroid_id FROM (SELECT k.centroid_id, ${cosSql("q.v", "k.c")} AS s
         |  FROM qv q, ctr$iters k) ORDER BY s DESC, centroid_id LIMIT 4),
         |flt AS (SELECT a.vec_id, a.v, a.centroid_id FROM asgF a
         |  JOIN corpus c ON c.vec_id = a.vec_id WHERE c.label = 1)
         |SELECT vec_id, cos_sim FROM (
         |  SELECT f.vec_id, ${cosSql("f.v", "q.v")} AS cos_sim
         |  FROM flt f JOIN probe USING (centroid_id), qv q
         |  ORDER BY cos_sim DESC, f.vec_id LIMIT 10)""".stripMargin
    },

    "x_ann_ivf_batch" ->
      s"""WITH $PLANTED_CTES, ${ivfBatchCtes(kmeansIters = 2, nlist = 16, nprobe = 4, k = 10)}
         |SELECT qid, vec_id, cos_sim FROM topk""".stripMargin,

    "x_ann_recall" ->
      s"""WITH $PLANTED_CTES, ${ivfCtes(kmeansIters = 2, nlist = 16, nprobe = 4, k = 20)},
         |brute AS (SELECT a.vec_id, ${cosSql("a.v", "q.v")} AS cos_sim
         |  FROM rest a, qv q ORDER BY cos_sim DESC, a.vec_id LIMIT 20)
         |SELECT CAST(count(*) AS BIGINT) AS n_true, CAST(count(i.vec_id) AS BIGINT) AS n_found,
         |round(count(i.vec_id) / 20.0, 4) AS recall
         |FROM brute b LEFT JOIN ivf i ON i.vec_id = b.vec_id""".stripMargin,

    "x_mm_decode" ->
      """SELECT doc_id, CAST(n % 640 AS INT) AS width, CAST(n % 480 AS INT) AS height,
        |CASE WHEN n % 2 = 0 THEN 'png' ELSE 'jpg' END AS format, CAST(n AS BIGINT) AS n_bytes
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents WHERE text IS NOT NULL)""".stripMargin,

    "x_mm_decode_stage" ->
      """SELECT doc_id, CAST(n % 640 AS INT) AS width, CAST(n % 480 AS INT) AS height,
        |CASE WHEN n % 2 = 0 THEN 'png' ELSE 'jpg' END AS format, CAST(n AS BIGINT) AS n_bytes
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents WHERE text IS NOT NULL)""".stripMargin,

    "x_mm_resize" ->
      """WITH d AS (SELECT doc_id, CAST(n % 640 AS INT) AS w, CAST(n % 480 AS INT) AS h
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents WHERE text IS NOT NULL))
        |SELECT doc_id, w AS width, h AS height,
        |CASE WHEN w = 0 OR h = 0 THEN NULL
        |     WHEN w <= 256 AND h <= 256 THEN w
        |     WHEN w * 256 <= h * 256 THEN greatest(1, CAST(floor(w * 256 / CAST(h AS DOUBLE)) AS INT))
        |     ELSE 256 END AS out_width,
        |CASE WHEN w = 0 OR h = 0 THEN NULL
        |     WHEN w <= 256 AND h <= 256 THEN h
        |     WHEN w * 256 <= h * 256 THEN 256
        |     ELSE greatest(1, CAST(floor(h * 256 / CAST(w AS DOUBLE)) AS INT)) END AS out_height
        |FROM d""".stripMargin,

    "x_mm_features" -> {
      // DuckDB md5 takes VARCHAR only; the payload is the UTF-8 bytes of
      // text, so md5(text) is byte-identical to Spark's md5(binary payload).
      // One row per component (scalar columns only — the driver compare
      // cannot sort an array column).
      val comp = hex32("md5(md5(text) || ':' || CAST(i AS VARCHAR))", 1)
      s"""SELECT doc_id, CAST(i AS INT) AS feat_idx,
         |  round($comp / 4294967296.0 * 2.0 - 1.0, 6) AS feature
         |FROM documents, (SELECT unnest(range(0, 8)) AS i)
         |WHERE text IS NOT NULL""".stripMargin
    },

    "x_mm_frames" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |CAST(floor(n * i / 4.0) AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents WHERE text IS NOT NULL),
        |(SELECT unnest(range(0, 4)) AS i)""".stripMargin,

    // plain join — the salt must be invisible in the result
    "x_skew_join" ->
      """WITH dim AS (SELECT DISTINCT event_type, '#' || event_type AS tag FROM events)
        |SELECT tag, CAST(count(*) AS BIGINT) AS n
        |FROM events e JOIN dim d ON d.event_type = e.event_type
        |GROUP BY tag""".stripMargin,

    // the stream-stream attribution condition, verbatim as a batch join
    "x_click_attrib" ->
      """SELECT v.event_id AS view_id, c.event_id AS click_id,
        |       v.user_id AS user_id
        |FROM events v, events c
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |  AND v.user_id = c.user_id
        |  AND c.ts >= v.ts
        |  AND c.ts <= v.ts + INTERVAL 600 SECOND""".stripMargin,

    // plain inequality join — bucketing + first-common-bucket dedup are
    // result-invariant
    "x_interval_join" ->
      """WITH s AS (SELECT event_id AS signup_id, user_id, ts AS st,
        |             ts + INTERVAL 24 HOUR AS en
        |           FROM events WHERE event_type = 'signup'),
        |er AS (SELECT event_id AS error_id, user_id, ts AS st,
        |         ts + INTERVAL 6 HOUR AS en
        |       FROM events WHERE event_type = 'error')
        |SELECT s.signup_id, er.error_id, s.user_id
        |FROM s JOIN er ON s.user_id = er.user_id
        |  AND s.st < er.en AND er.st < s.en""".stripMargin,

    // plain inequality join — the bucketed equi-rewrite is result-invariant
    "x_range_join" ->
      """WITH s AS (SELECT event_id AS signup_id, user_id, ts AS st,
        |             ts + INTERVAL 24 HOUR AS en
        |           FROM events WHERE event_type = 'signup'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, s.signup_id, p.user_id
        |FROM p JOIN s ON p.user_id = s.user_id
        |  AND p.ts >= s.st AND p.ts < s.en""".stripMargin,

    // change-point compaction + lead() close-out; micros out so the
    // compare is tz-free
    "x_scd2_history" -> SCD2_SQL,

    // the rebuild invariant: merge(history(<cutoff), >=cutoff batch) must
    // equal history(whole log), so the oracle is the SAME SQL — the split
    // is invisible by construction and the merge path is what's under test
    "x_scd2_merge" -> SCD2_SQL,

    // snapshot at T == the latest pre-T state per key, independently
    // reconstructed as a per-key argmax (not via the interval algebra)
    "x_scd2_snapshot" ->
      """WITH pre AS (SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'),
        |w AS (SELECT user_id, event_type, ts, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS rn FROM pre),
        |op AS (SELECT user_id, event_type, ts, event_id FROM w
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |sel AS (SELECT user_id, event_type, ts, row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM op)
        |SELECT user_id, event_type, epoch_us(ts) AS valid_from_us
        |FROM sel WHERE rk = 1""".stripMargin,

    // k1=1.2, b=0.75, idf = ln((N-df+.5)/(df+.5)+1); round the summed
    // score BEFORE ranking (house rule), ties to smallest doc_id
    "x_bm25" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |d AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, tk FROM toks),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM d)
         |  WHERE tok IN ('join', 'vector', 'window') GROUP BY doc_id, dl, tok),
         |dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS dfq FROM tf GROUP BY tok),
         |sc AS (SELECT tf.doc_id,
         |  ln((st.n - dfq.dfq + 0.5) / (dfq.dfq + 0.5) + 1.0) * (tf.tf * 2.2) /
         |  (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl)) AS s
         |  FROM tf JOIN dfq USING (tok), st)
         |SELECT doc_id, round(sum(s), 4) AS bm25 FROM sc GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    // the same two member rankings rebuilt independently, fused on ranks
    "x_rrf" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |d AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, tk FROM toks),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM d)
         |  WHERE tok IN ('join', 'vector', 'window') GROUP BY doc_id, dl, tok),
         |dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS dfq FROM tf GROUP BY tok),
         |sc AS (SELECT tf.doc_id,
         |  ln((st.n - dfq.dfq + 0.5) / (dfq.dfq + 0.5) + 1.0) * (tf.tf * 2.2) /
         |  (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl)) AS s
         |  FROM tf JOIN dfq USING (tok), st),
         |bmtop AS (SELECT doc_id, round(sum(s), 4) AS bm25 FROM sc GROUP BY doc_id
         |  ORDER BY bm25 DESC, doc_id LIMIT 20),
         |bmrank AS (SELECT doc_id,
         |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bmtop),
         |h0 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
         |  WHERE tok IN ('join', 'vector', 'window') GROUP BY doc_id
         |  ORDER BY n_hits DESC, doc_id LIMIT 20),
         |hrank AS (SELECT doc_id,
         |  row_number() OVER (ORDER BY n_hits DESC, doc_id) AS rank FROM h0),
         |u AS (SELECT doc_id, 1.0 / (60 + rank) AS s FROM bmrank
         |  UNION ALL SELECT doc_id, 1.0 / (60 + rank) FROM hrank)
         |SELECT doc_id, round(sum(s), 6) AS rrf, CAST(count(*) AS BIGINT) AS n_lists
         |FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // skip-gram pairs: the naive positional form (the Spark side builds
    // pairs in-row — zero joins; the oracle is the position unnest)
    "x_skipgram" ->
      s"""WITH d AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |pos AS (SELECT doc_id, i, tk, tk[i+1] AS w FROM
         |  (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM d))
         |SELECT doc_id, w AS center, tk[i+1+j] AS context,
         |  CAST(j AS INT) AS dist
         |FROM (SELECT doc_id, i, tk, w, unnest(range(1, 4)) AS j FROM pos)
         |WHERE i + 1 + j <= len(tk)""".stripMargin,

    // GloVe co-occurrence: canonical unordered pair, weight 1/dist
    "x_cooc" ->
      s"""WITH d AS (SELECT $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |pos AS (SELECT i, tk, tk[i+1] AS w FROM
         |  (SELECT tk, unnest(range(0, len(tk))) AS i FROM d)),
         |pr AS (SELECT least(w, tk[i+1+j]) AS a, greatest(w, tk[i+1+j]) AS b,
         |    CAST(1.0 AS DOUBLE) / j AS wt
         |  FROM (SELECT i, tk, w, unnest(range(1, 4)) AS j FROM pos)
         |  WHERE i + 1 + j <= len(tk))
         |SELECT a, b, CAST(count(*) AS BIGINT) AS n_cooc,
         |  round(sum(wt), 6) AS x_ab
         |FROM pr GROUP BY a, b""".stripMargin,

    // deterministic negative sampling: identical md5-uniform inversion of
    // the unigram^0.75 cumulative distribution — ^0.75 as sqrt(sqrt(c^3))
    // (IEEE sqrt is correctly rounded, pow is not), QUANTIZED to integer
    // weights round(w*2^16) so the cumulative boundaries are association-
    // independent: this sequential scan is bit-identical to the Spark
    // side's two-level ScanOps.cumSum by integer associativity
    "x_neg_sample" ->
      s"""WITH d AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |vc AS (SELECT tok, count(*) AS c FROM
         |  (SELECT unnest(tk) AS tok FROM d) GROUP BY tok),
         |cum AS (SELECT tok AS negative,
         |    CAST(round(sqrt(sqrt(CAST(c * c * c AS DOUBLE))) * 65536, 0)
         |      AS BIGINT) AS w,
         |    sum(CAST(round(sqrt(sqrt(CAST(c * c * c AS DOUBLE))) * 65536, 0)
         |      AS BIGINT))
         |      OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING) AS hi
         |  FROM vc),
         |ci AS (SELECT negative, CAST(hi - w AS DOUBLE) AS lo,
         |    CAST(hi AS DOUBLE) AS hi FROM cum),
         |z AS (SELECT max(hi) AS z FROM ci),
         |pos AS (SELECT doc_id, i, tk, tk[i+1] AS w FROM
         |  (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM d)),
         |pr AS (SELECT doc_id, w AS center, tk[i+1+j] AS context,
         |    CAST(j AS INT) AS dist
         |  FROM (SELECT doc_id, i, tk, w, unnest(range(1, 3)) AS j FROM pos)
         |  WHERE i + 1 + j <= len(tk)),
         |ph AS (SELECT doc_id, center, context, dist,
         |    md5(center || ':' || context || ':' || CAST(dist AS VARCHAR)
         |      || ':0') AS h
         |  FROM pr),
         |probes AS (${(0 until 2).map(s =>
              s"""SELECT doc_id, center, context, dist, CAST($s AS INT) AS slot,
                 |    CAST(${hex32("h", 1 + 8 * (s % 4))} AS DOUBLE)
                 |      / 4294967296 * z AS u
                 |  FROM ph CROSS JOIN z""".stripMargin)
             .mkString("\n  UNION ALL ")})
         |SELECT doc_id, center, context, dist, slot, negative
         |FROM probes JOIN ci ON u >= lo AND u < hi""".stripMargin,

    // KMV distinct sketch: the oracle computes the k minima DIRECTLY from
    // the whole corpus (row_number over distinct 60-bit hashes), while the
    // Spark side merges two half-corpus states — agreement proves the
    // merge; the estimator is one double division, bit-identical
    "x_kmv_distinct" ->
      s"""WITH d AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL AND lang IS NOT NULL),
         |tokrows AS (SELECT lang, unnest(tk) AS tok FROM d),
         |dt AS (SELECT DISTINCT lang, tok FROM tokrows),
         |dh AS (SELECT lang, ${hex60("h")} AS u
         |  FROM (SELECT lang, md5(tok) AS h FROM dt)),
         |du AS (SELECT DISTINCT lang, u FROM dh),
         |rn AS (SELECT lang, u,
         |    row_number() OVER (PARTITION BY lang ORDER BY u) AS r FROM du),
         |st AS (SELECT lang, count(*) AS cnt,
         |    sum(CASE WHEN r <= 256 THEN 1 ELSE 0 END) AS kused,
         |    max(CASE WHEN r <= 256 THEN u END) AS kth
         |  FROM rn GROUP BY lang),
         |ex AS (SELECT lang, count(DISTINCT tok) AS n_exact
         |  FROM tokrows GROUP BY lang)
         |SELECT st.lang AS stratum, CAST(kused AS INT) AS k_used,
         |  CASE WHEN cnt < 256 THEN CAST(cnt AS BIGINT)
         |    ELSE CAST(round(255 * 1152921504606846976.0 / kth, 0) AS BIGINT)
         |  END AS n_distinct_est,
         |  CAST(n_exact AS BIGINT) AS n_exact
         |FROM st JOIN ex ON ex.lang = st.lang""".stripMargin,

    // Unicode NFC: DuckDB's utf8proc nfc_normalize vs the JDK normalizer —
    // independent Unicode implementations; chr(769) = the combining acute
    "x_nfc_norm" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || 'e' || chr(769)
        |         ELSE text END AS t
        |  FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, t, nfc_normalize(t) AS nn FROM d)
        |SELECT doc_id, nn <> t AS changed, md5(nn) AS norm_hash FROM n""".stripMargin,

    // PMI over ALL-bigram totals (Σ(len-1), not the minCount survivors);
    // round before ranking, lexicographic (a, b) ties
    "x_pmi" ->
      s"""WITH toks AS (SELECT $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |uni AS (SELECT tok, count(*) AS c FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY tok),
         |bg AS (SELECT tk[r] AS a, tk[r+1] AS b FROM
         |  (SELECT tk, unnest(range(1, greatest(len(tk), 1))) AS r FROM toks)),
         |bi AS (SELECT a, b, count(*) AS n_ab FROM bg GROUP BY a, b HAVING count(*) >= 5),
         |tot AS (SELECT CAST((SELECT sum(c) FROM uni) AS DOUBLE) AS nu,
         |        CAST((SELECT sum(greatest(len(tk) - 1, 0)) FROM toks) AS DOUBLE) AS nb),
         |r AS (SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
         |  round(ln((n_ab / nb) / ((ua.c / nu) * (ub.c / nu))), 4) AS pmi
         |  FROM bi JOIN uni ua ON ua.tok = a JOIN uni ub ON ub.tok = b, tot)
         |SELECT a, b, n_ab, pmi FROM r ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin,

    // gaps-and-islands on the µs axis; event_id is unique so the ROWS
    // running sum equals Spark's default RANGE frame
    "x_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tu FROM events),
        |w AS (SELECT *, CASE WHEN tu - lag(tu) OVER
        |    (PARTITION BY user_id ORDER BY tu, event_id) > 1800000000
        |  THEN 1 ELSE 0 END AS ns FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tu, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM w""".stripMargin,

    // INTERVAL RANGE frame == Spark's µs-axis numeric range frame
    // (inclusive both ends, peers included)
    "x_rolling" ->
      """SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
        |  AS avg_1h
        |FROM events""".stripMargin,

    // two directed ASOF passes + the closest-wins (ties backward) pick
    "x_asof_nearest" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS tu, max(value) AS v
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)),
        |p AS (SELECT event_id, user_id, epoch_us(ts) AS tu FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.tu,
        |  CASE WHEN bk.tu IS NULL THEN fw.tu
        |       WHEN fw.tu IS NULL THEN bk.tu
        |       WHEN p.tu - bk.tu <= fw.tu - p.tu THEN bk.tu
        |       ELSE fw.tu END AS v_ts_us,
        |  CASE WHEN bk.tu IS NULL THEN fw.v
        |       WHEN fw.tu IS NULL THEN bk.v
        |       WHEN p.tu - bk.tu <= fw.tu - p.tu THEN bk.v
        |       ELSE fw.v END AS v_value
        |FROM p
        |ASOF LEFT JOIN b bk ON p.user_id = bk.user_id AND p.tu >= bk.tu
        |ASOF LEFT JOIN b fw ON p.user_id = fw.user_id AND p.tu <= fw.tu""".stripMargin,

    // rank over the (hour, type) aggregate; lexicographic ties
    "x_trending" ->
      """WITH a AS (SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts))
        |    AS hour_us, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY hour_us ORDER BY n DESC, event_type) AS rank FROM a)
        |SELECT hour_us, event_type, n, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 2""".stripMargin,

    // posting-list intersection: ALL terms present
    "x_bool_and" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOK) AS tok
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM tok WHERE tok IN ('join', 'vector', 'window')
         |GROUP BY doc_id HAVING count(DISTINCT tok) = 3""".stripMargin,

    // OLS trend from the whole log in one pass — the Spark side goes
    // split-state-merge, so agreement checks the sums' merge invariance
    "x_trend" ->
      """WITH p AS (SELECT event_type,
        |  CASE WHEN ts IS NOT NULL AND value IS NOT NULL
        |    THEN (epoch_us(ts) - 1704067200000000) / 86400000000.0 END AS x,
        |  CASE WHEN ts IS NOT NULL AND value IS NOT NULL
        |    THEN value END AS y
        |  FROM events),
        |st AS (SELECT event_type, CAST(count(x) AS BIGINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
        |  FROM p GROUP BY event_type)
        |SELECT event_type, n,
        |  CASE WHEN n > 1 AND n*sxx - sx*sx <> 0
        |    THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) END AS slope,
        |  CASE WHEN n > 1 AND n*sxx - sx*sx <> 0
        |    THEN round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4)
        |    END AS intercept
        |FROM st""".stripMargin,

    // histogram quantiles computed DIRECTLY from the whole log's binned
    // counts — the Spark side goes through split-state-merge, so agreement
    // checks the sketch's merge invariance (width 5 = 600/120)
    "x_hist_quantile" -> {
      def p(q: String, name: String) =
        s"""max(CASE WHEN cum - n < $q * tot AND $q * tot <= cum
           |  THEN round(0.0 + 5.0 * (bin + ($q * tot - (cum - n)) / n), 4)
           |  END) AS $name""".stripMargin
      s"""WITH b AS (SELECT event_type,
         |  least(greatest(CAST(floor(value / 5.0) AS BIGINT), 0), 119) AS bin,
         |  CAST(count(*) AS BIGINT) AS n
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |c AS (SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         |  sum(n) OVER (PARTITION BY event_type) AS tot FROM b)
         |SELECT event_type, ${p("0.5", "p50")}, ${p("0.9", "p90")},
         |  ${p("0.99", "p99")}
         |FROM c GROUP BY event_type""".stripMargin
    },

    // decayed popularity: same per-row decay column, grouped — power()
    // and the double division are IEEE on both engines
    "x_decay" ->
      """SELECT event_type,
        |  round(sum(value * power(0.5,
        |    (1706659200000000 - epoch_us(ts)) / 604800000000.0)), 4)
        |    AS decayed_score,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    // co-visitation via the NAIVE per-user self-join — an independent
    // algorithm for the array-pair construction
    "x_covisit" ->
      """WITH ui AS (SELECT DISTINCT user_id AS k, event_type AS i
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |marg AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM ui GROUP BY i),
        |p AS (SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM ui a JOIN ui b ON a.k = b.k AND a.i < b.i GROUP BY a.i, b.i)
        |SELECT item_a, item_b, n_ab,
        |  round(n_ab / sqrt(ma.n * mb.n), 4) AS cosine
        |FROM p JOIN marg ma ON ma.i = item_a
        |JOIN marg mb ON mb.i = item_b""".stripMargin,

    // PageRank: the identical power-method recurrence UNROLLED (5 rounds,
    // damping 0.85, dangling mass redistributed) — agreement proves the
    // Spark side's relational iteration reproduces the recurrence exactly
    "x_pagerank" -> {
      // each r_i is referenced twice by round i+1 — materialized so DuckDB
      // cannot inline-compound the recurrence (the x_kcore lesson)
      val rounds = (1 to 5).map { i =>
        val p = s"r${i - 1}"
        s"""d$i AS MATERIALIZED (SELECT coalesce(sum(r.pr), 0) AS dm FROM $p r
           |  LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
           |c$i AS MATERIALIZED (SELECT nm.dst AS node, sum(r.pr * nm.p) AS c
           |  FROM nm JOIN $p r ON r.node = nm.src GROUP BY nm.dst),
           |r$i AS MATERIALIZED (SELECT nd.node,
           |    (1 - 0.85) / N + 0.85 * (coalesce(c.c, 0) + d$i.dm / N) AS pr
           |  FROM nd CROSS JOIN nn CROSS JOIN d$i
           |  LEFT JOIN c$i c ON c.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events WHERE user_id IS NOT NULL),
         |ed AS (SELECT k AS src,
         |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM seq WHERE k IS NOT NULL),
         |e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
         |  FROM ed WHERE dst IS NOT NULL GROUP BY src, dst),
         |ow AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e GROUP BY src),
         |nm AS MATERIALIZED (SELECT e.src, e.dst, e.w / ow.ow AS p
         |  FROM e JOIN ow USING (src)),
         |nd AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS N FROM nd),
         |r0 AS MATERIALIZED (SELECT node, 1.0 / N AS pr FROM nd CROSS JOIN nn),
         |$rounds
         |SELECT node, round(pr, 6) AS pagerank FROM r5""".stripMargin
    },

    // triangles via the NAIVE id-ordered 3-way self-join (the Spark side
    // runs the degree-ordered wedge algorithm); corners exploded per node
    "x_triangles" ->
      """WITH seq AS (SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE user_id IS NOT NULL),
        |ed AS (SELECT k AS src,
        |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM seq WHERE k IS NOT NULL),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM corners GROUP BY node""".stripMargin,

    // per-column profile: one UNION ALL branch per column
    "x_profile" -> {
      val branches = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice").map { c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM orders"""
          .stripMargin
      }
      branches.mkString("\nUNION ALL\n")
    },

    // the gate's four constraints, each as its own direct aggregate
    "x_dq_check" ->
      """SELECT 'not_null(o_custkey)' AS "constraint",
        |  CAST(count(*) - count(o_custkey) AS BIGINT) AS n_violations
        |FROM orders
        |UNION ALL
        |SELECT 'unique(o_orderkey)',
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'range(o_totalprice,0.0,1000000.0)',
        |  CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
        |    AND (o_totalprice < 0 OR o_totalprice > 1000000)
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'foreign_key(o_custkey)', CAST(count(*) AS BIGINT)
        |FROM orders o WHERE o_custkey IS NOT NULL AND NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,

    // k-core: the identical peel UNROLLED 5 rounds (degree >= 3 keeps).
    // Every e_i is referenced 3× by round i+1; WITHOUT AS MATERIALIZED
    // DuckDB inlines the references and re-evaluation compounds 3^rounds
    // over the window-over-events base (measured: 265 s → 0.1 s)
    "x_kcore" -> {
      val rounds = (1 to 5).map { i =>
        val p = s"e${i - 1}"
        s"""d$i AS MATERIALIZED (SELECT node, count(*) AS dg FROM
           |  (SELECT a AS node FROM $p UNION ALL SELECT b FROM $p)
           |  GROUP BY node),
           |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE dg >= 3),
           |e$i AS MATERIALIZED (SELECT e.a, e.b FROM $p e
           |  JOIN k$i ka ON ka.node = e.a JOIN k$i kb ON kb.node = e.b)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events WHERE user_id IS NOT NULL),
         |ed AS (SELECT k AS src,
         |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM seq WHERE k IS NOT NULL),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
         |    greatest(src, dst) AS b
         |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
         |$rounds
         |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
         |  (SELECT a AS node FROM e5 UNION ALL SELECT b FROM e5)
         |GROUP BY node""".stripMargin
    },

    // label propagation: the identical synchronous vote/argmax recurrence
    // UNROLLED 3 rounds (argmax via row_number count desc, label asc)
    "x_label_prop" -> {
      val rounds = (1 to 3).map { i =>
        val p = s"l${i - 1}"
        s"""v$i AS (SELECT s.node, l.label, count(*) AS n FROM sym s
           |  JOIN $p l ON l.node = s.nbr GROUP BY s.node, l.label),
           |w$i AS (SELECT node, label FROM (SELECT node, label,
           |    row_number() OVER (PARTITION BY node ORDER BY n DESC, label)
           |      AS rn FROM v$i) WHERE rn = 1),
           |l$i AS (SELECT nd.node, coalesce(w$i.label, $p.label) AS label
           |  FROM nd LEFT JOIN w$i USING (node) JOIN $p USING (node))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events WHERE user_id IS NOT NULL),
         |ed AS (SELECT k AS src,
         |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM seq WHERE k IS NOT NULL),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
         |sym AS (SELECT a AS node, b AS nbr FROM und
         |  UNION ALL SELECT b, a FROM und),
         |nd AS (SELECT DISTINCT node FROM sym),
         |l0 AS (SELECT node, node AS label FROM nd),
         |$rounds
         |SELECT node, label AS community FROM l3""".stripMargin
    },

    // connected components: 5 hash-min rounds unrolled — the same
    // synchronous min-propagation recurrence as the Spark side
    "x_concomp" -> {
      val rounds = (1 to 5).map { i =>
        val p = s"c${i - 1}"
        s"""m$i AS (SELECT s.node, min(l.component) AS mn FROM sym s
           |  JOIN $p l ON l.node = s.nbr GROUP BY s.node),
           |c$i AS (SELECT p.node,
           |    least(p.component, coalesce(m$i.mn, p.component)) AS component
           |  FROM $p p LEFT JOIN m$i USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events WHERE user_id IS NOT NULL),
         |ed AS (SELECT k AS src,
         |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM seq WHERE k IS NOT NULL),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
         |sym AS (SELECT a AS node, b AS nbr FROM und
         |  UNION ALL SELECT b, a FROM und),
         |nd AS (SELECT DISTINCT node FROM sym),
         |c0 AS (SELECT node, node AS component FROM nd),
         |$rounds
         |SELECT node, component FROM c5""".stripMargin
    },

    // deterministic random walks: replay every step — the md5 neighbour
    // choice (rank = hex32(md5(walk:step:node)) mod degree) is pure
    // arithmetic, so the oracle walks the identical paths
    "x_random_walk" -> {
      val steps = (1 to 5).map { t =>
        val p = if (t == 1) "s0" else s"s${t - 1}"
        s"""h$t AS (SELECT walk_id, cur,
           |    md5(walk_id || ':$t:' || CAST(cur AS VARCHAR)) AS h FROM $p),
           |s$t AS (SELECT f.walk_id, a.nbr AS cur FROM h$t f JOIN adj a
           |  ON a.node = f.cur AND a.rk = ${hex32("f.h", 1)} % a.deg)"""
          .stripMargin
      }.mkString(",\n")
      val out = (0 to 5).map(t =>
        s"SELECT walk_id, CAST($t AS INT) AS step, cur AS node FROM s$t")
        .mkString("\nUNION ALL ")
      s"""WITH seq AS (SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events WHERE user_id IS NOT NULL),
         |ed AS (SELECT k AS src,
         |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM seq WHERE k IS NOT NULL),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
         |sym AS (SELECT a AS node, b AS nbr FROM und
         |  UNION ALL SELECT b, a FROM und),
         |adj AS (SELECT node, nbr,
         |    CAST(row_number() OVER (PARTITION BY node ORDER BY nbr) - 1
         |      AS BIGINT) AS rk,
         |    count(*) OVER (PARTITION BY node) AS deg FROM sym),
         |nd AS (SELECT DISTINCT node FROM sym),
         |s0 AS (SELECT CAST(node AS VARCHAR) || '#' || CAST(w.w AS VARCHAR)
         |    AS walk_id, node AS cur
         |  FROM nd CROSS JOIN (SELECT unnest(range(0, 2)) AS w) w),
         |$steps
         |$out""".stripMargin
    },

    // exact connected components: the oracle does NOT replay the
    // pointer-jumping rounds — the component-min labelling is
    // round-count-independent, so a recursive-CTE transitive closure
    // (min reachable id per node) verifies it directly
    "x_concomp_exact" ->
      """WITH RECURSIVE seq AS (SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE user_id IS NOT NULL),
        |ed AS (SELECT k AS src,
        |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM seq WHERE k IS NOT NULL),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
        |sym AS (SELECT a AS node, b AS nbr FROM und
        |  UNION ALL SELECT b, a FROM und),
        |nd AS (SELECT DISTINCT node FROM sym),
        |reach(node, m) AS (
        |  SELECT node, node FROM nd
        |  UNION
        |  SELECT s.node, r.m FROM sym s JOIN reach r ON r.node = s.nbr)
        |SELECT node, min(m) AS component FROM reach GROUP BY node""".stripMargin,

    // two-sample KS over document length: cumulative CDF gap on the
    // DISTINCT-value table, gap rounded BEFORE the argmax, smallest value
    // wins ties — fully deterministic (integer cumulative counts / totals)
    "x_ks_drift" ->
      """WITH d AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |rc AS (SELECT v, count(*) AS cr FROM d WHERE doc_id % 2 = 0 GROUP BY v),
        |cx AS (SELECT v, count(*) AS c2 FROM d WHERE doc_id % 2 = 1 GROUP BY v),
        |t AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM rc) AS nr,
        |             (SELECT CAST(sum(c2) AS DOUBLE) FROM cx) AS nc),
        |m AS (SELECT coalesce(rc.v, cx.v) AS v, coalesce(cr, 0) AS cr,
        |    coalesce(c2, 0) AS c2
        |  FROM rc FULL OUTER JOIN cx ON rc.v = cx.v),
        |cdf AS (SELECT v, sum(cr) OVER (ORDER BY v) AS sr,
        |    sum(c2) OVER (ORDER BY v) AS sc FROM m),
        |g AS (SELECT v, round(abs(sr / nr - sc / nc), 6) AS gap
        |  FROM cdf CROSS JOIN t)
        |SELECT CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
        |  gap AS d_stat, v AS at_val
        |FROM g CROSS JOIN t ORDER BY gap DESC, v ASC LIMIT 1""".stripMargin,

    // Jensen-Shannon divergence between the halves' unigram distributions
    // (natural log; one-sided tokens contribute p*ln 2 — finite, no
    // smoothing needed)
    "x_js_div" ->
      s"""WITH d AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |rt AS (SELECT tok, count(*) AS c FROM
         |  (SELECT unnest(tk) AS tok FROM d WHERE doc_id % 2 = 0) GROUP BY tok),
         |ct AS (SELECT tok, count(*) AS c FROM
         |  (SELECT unnest(tk) AS tok FROM d WHERE doc_id % 2 = 1) GROUP BY tok),
         |t AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM rt) AS nr,
         |             (SELECT CAST(sum(c) AS DOUBLE) FROM ct) AS nc),
         |j AS (SELECT coalesce(rt.tok, ct.tok) AS tok,
         |    coalesce(rt.c, 0) AS cr, coalesce(ct.c, 0) AS cc
         |  FROM rt FULL OUTER JOIN ct ON rt.tok = ct.tok)
         |SELECT (SELECT CAST(sum(c) AS BIGINT) FROM rt) AS n_ref_tokens,
         |  (SELECT CAST(sum(c) AS BIGINT) FROM ct) AS n_cur_tokens,
         |  count(*) AS vocab_union,
         |  round(sum(
         |    CASE WHEN cr > 0 THEN (cr / nr) *
         |      ln((cr / nr) / ((cr / nr + cc / nc) / 2)) ELSE 0 END +
         |    CASE WHEN cc > 0 THEN (cc / nc) *
         |      ln((cc / nc) / ((cr / nr + cc / nc) / 2)) ELSE 0 END) / 2, 6)
         |    AS jsd
         |FROM j CROSS JOIN t""".stripMargin,

    // per-source midrank AUC — the PARTITION BY form of the x_auc math
    "x_auc_stratum" ->
      s"""$SCORED_CTES,
         |sc2 AS (SELECT s.doc_id, s.score, s.lang, d.source FROM scored s
         |  JOIN documents d USING (doc_id) WHERE d.source IS NOT NULL),
         |by_s AS (SELECT source AS g, score AS s, count(*) AS n,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
         |  FROM sc2 GROUP BY source, score),
         |r AS (SELECT g, s, n, np, coalesce(sum(n) OVER (PARTITION BY g
         |    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS bf FROM by_s),
         |m AS (SELECT g, n, np, bf + (n + 1.0) / 2 AS midrank FROM r)
         |SELECT g AS stratum, CAST(sum(np) AS BIGINT) AS n_pos,
         |  CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
         |  CASE WHEN sum(np) = 0 OR sum(n) - sum(np) = 0 THEN NULL
         |    ELSE round((sum(midrank * np) - sum(np) * (sum(np) + 1) / 2.0)
         |      / (sum(np) * (sum(n) - sum(np))), 6) END AS auc
         |FROM m GROUP BY g""".stripMargin,

    // confusion at threshold 0.5 over the same scored corpus
    "x_confusion" ->
      s"""$SCORED_CTES,
         |cm AS (SELECT
         |    CAST(sum(CASE WHEN score >= 0.5 AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score >= 0.5 AND lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score < 0.5 AND lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |    CAST(sum(CASE WHEN score < 0.5 AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS fn
         |  FROM scored)
         |SELECT tp, fp, tn, fn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |    ELSE round(tp / (tp + fp), 6) END AS precision,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |    ELSE round(tp / (tp + fn), 6) END AS recall,
         |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
         |    ELSE round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
         |FROM cm""".stripMargin,

    // reliability bins: equal-width cells, score 1.0 clamped to the top
    "x_calibration" ->
      s"""$SCORED_CTES
         |SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  round(avg(score), 6) AS mean_score,
         |  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6)
         |    AS frac_pos
         |FROM scored GROUP BY 1""".stripMargin,

    // Mann-Whitney midrank AUC over the classifier's scored corpus —
    // scores from the x_lin_classify chain, label lang='en'
    "x_auc" ->
      s"""$SCORED_CTES,
         |by_s AS (SELECT score AS s, count(*) AS n,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
         |  FROM scored GROUP BY score),
         |r AS (SELECT s, n, np, coalesce(sum(n) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf
         |  FROM by_s),
         |m AS (SELECT s, n, np, bf + (n + 1.0) / 2 AS midrank FROM r)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         |  CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
         |  round((sum(midrank * np) - sum(np) * (sum(np) + 1) / 2.0)
         |    / (sum(np) * (sum(n) - sum(np))), 6) AS auc
         |FROM m""".stripMargin,

    // PR-AUC: threshold-step average precision over distinct scores
    // descending — same cumulative arithmetic as the Spark window
    "x_pr_auc" ->
      s"""$SCORED_CTES,
         |by_s AS (SELECT score AS s, count(*) AS n,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
         |  FROM scored GROUP BY score),
         |c AS (SELECT s, n, np,
         |    sum(np) OVER (ORDER BY s DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         |    sum(n) OVER (ORDER BY s DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tot
         |  FROM by_s)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         |  CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
         |  CASE WHEN sum(np) > 0 AND sum(n) - sum(np) > 0 THEN
         |    round(sum(np * tp / CAST(tot AS DOUBLE)) / sum(np), 6)
         |  END AS pr_auc
         |FROM c""".stripMargin,

    // Brier score: one mean-squared-error aggregate over the scored corpus
    "x_brier" ->
      s"""$SCORED_CTES
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  round(avg((score - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
         |    * (score - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)), 6)
         |    AS brier
         |FROM scored""".stripMargin,

    // scene-change detection: per-frame window aHashes replayed via the
    // hex-digit arithmetic; hamming via DuckDB's own bit_count(xor(..)) —
    // an INDEPENDENT popcount vs Spark's unrolled shift-and-mask
    "x_mm_scenes" ->
      """WITH base AS (SELECT doc_id, CAST(text AS BLOB) AS payload
        |  FROM documents WHERE text IS NOT NULL),
        |fr AS (SELECT doc_id, payload, octet_length(payload) AS n
        |  FROM base WHERE payload IS NOT NULL AND octet_length(payload) > 0),
        |off AS (SELECT doc_id, payload, CAST(i AS INT) AS frame_idx,
        |    CAST(floor(n * i / 6.0) AS BIGINT) AS o
        |  FROM (SELECT doc_id, payload, n, unnest(range(0, 6)) AS i FROM fr)),
        |hx AS (SELECT doc_id, frame_idx,
        |    regexp_extract_all(substr(hex(payload), 2 * o + 1, 64), '(..)', 1)
        |      AS prs FROM off),
        |bt AS (SELECT doc_id, frame_idx, list_transform(prs, c ->
        |    (strpos('0123456789ABCDEF', c[1:1]) - 1) * 16 +
        |    (strpos('0123456789ABCDEF', c[2:2]) - 1)) AS bs
        |  FROM hx WHERE len(prs) > 0),
        |mn AS (SELECT doc_id, frame_idx, bs,
        |    list_sum(bs) * 1.0 / len(bs) AS mean FROM bt),
        |sg AS (SELECT doc_id, frame_idx, CAST(list_sum(list_transform(
        |    range(1, len(bs) + 1), i ->
        |    CASE WHEN bs[i] > mean THEN power(2.0, i - 1) ELSE 0.0 END))
        |  AS BIGINT) AS ahash FROM mn),
        |lg AS (SELECT doc_id, frame_idx, ahash,
        |    lag(ahash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        |  FROM sg)
        |SELECT doc_id, frame_idx, ahash,
        |  CASE WHEN prev IS NULL THEN NULL
        |    ELSE CAST(bit_count(xor(ahash, prev)) AS BIGINT) END AS hamming,
        |  coalesce(bit_count(xor(ahash, prev)) > 8, TRUE) AS is_scene_start
        |FROM lg""".stripMargin,

    // byte-level aHash near-dup: signatures recomputed independently via
    // the same hex-digit arithmetic, pairs via the NAIVE quadratic join
    "x_mm_ahash" ->
      """WITH base AS (SELECT doc_id, CAST(text AS BLOB) AS payload
        |  FROM documents WHERE text IS NOT NULL),
        |pl AS (SELECT doc_id, payload FROM base
        |  UNION ALL SELECT doc_id + 100000, payload FROM base
        |  WHERE doc_id % 50 = 7),
        |hx AS (SELECT doc_id,
        |    regexp_extract_all(hex(payload), '(..)', 1)[1:32] AS prs
        |  FROM pl WHERE payload IS NOT NULL AND octet_length(payload) > 0),
        |bt AS (SELECT doc_id, list_transform(prs, c ->
        |    (strpos('0123456789ABCDEF', c[1:1]) - 1) * 16 +
        |    (strpos('0123456789ABCDEF', c[2:2]) - 1)) AS bs FROM hx),
        |mn AS (SELECT doc_id, bs,
        |    list_sum(bs) * 1.0 / len(bs) AS mean FROM bt),
        |sg AS (SELECT doc_id, CAST(list_sum(list_transform(
        |    range(1, len(bs) + 1), i ->
        |    CASE WHEN bs[i] > mean THEN power(2.0, i - 1) ELSE 0.0 END))
        |  AS BIGINT) AS sig FROM mn)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 1""".stripMargin,

    // clustering coefficient: the triangle oracle joined with degrees;
    // every node appears, zero-triangle nodes at coefficient 0
    "x_clustering_coef" ->
      """WITH seq AS (SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE user_id IS NOT NULL),
        |ed AS (SELECT k AS src,
        |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM seq WHERE k IS NOT NULL),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM ed WHERE dst IS NOT NULL AND src <> dst),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
        |  (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY node),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM corners GROUP BY node)
        |SELECT d.node, d.deg,
        |  CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN d.deg >= 2
        |    THEN round(2.0 * coalesce(tc.n_triangles, 0)
        |      / (d.deg * (d.deg - 1)), 6)
        |    ELSE 0.0 END AS clustering_coef
        |FROM deg d LEFT JOIN tc USING (node)""".stripMargin,

    // per-char counts → the ln(N) − Σ n·ln(n)/N identity, mirrored exactly
    "x_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ''), c -> c <> '')) AS ch
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |cc AS (SELECT doc_id, ch, count(*) AS n FROM ch GROUP BY doc_id, ch)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars_counted,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy
        |FROM cc GROUP BY doc_id""".stripMargin,

    // Luhn via right-position parity on the UNreversed digit list (the
    // Spark side reverses; (len - i) odd ≡ reversed 0-based index odd)
    "x_pii_luhn" ->
      """WITH c AS (SELECT o_orderkey,
        |    lpad(CAST(CAST(o_orderkey AS BIGINT) * 100003 + o_custkey
        |      AS VARCHAR), 16, '1') AS candidate
        |  FROM orders),
        |d AS (SELECT o_orderkey, candidate,
        |    list_filter(string_split(candidate, ''), x -> x <> '') AS r
        |  FROM c),
        |v AS (SELECT o_orderkey, candidate,
        |    list_sum(list_transform(range(1, len(r) + 1), i ->
        |      CASE WHEN (len(r) - i) % 2 = 1
        |        THEN CASE WHEN CAST(r[i] AS INT) * 2 > 9
        |          THEN CAST(r[i] AS INT) * 2 - 9
        |          ELSE CAST(r[i] AS INT) * 2 END
        |        ELSE CAST(r[i] AS INT) END)) AS s
        |  FROM d)
        |SELECT o_orderkey, candidate, (s % 10 = 0) AS luhn_valid FROM v""".stripMargin,

    // direct sliding-window scan over each doc's token list — an
    // independent algorithm for the positional phrase-AND (list is
    // 1-indexed; range(a, b) is [a, b), so i runs over valid anchors only)
    "x_phrase" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS (SELECT doc_id, len(list_filter(range(1, len(tk) - 1),
         |  i -> tk[i] = 'slow' AND tk[i+1] = 'hash' AND tk[i+2] = 'batch'))
         |    AS n_occ FROM toks)
         |SELECT doc_id, CAST(n_occ AS BIGINT) AS n_occ
         |FROM occ WHERE n_occ > 0""".stripMargin,

    // hourly grid per user + native ASOF; instant-ties pre-collapsed to
    // max(value) so the as-of pick is total in both engines
    "x_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, value FROM events),
        |b AS (SELECT user_id, tu, max(value) AS v FROM e GROUP BY user_id, tu),
        |bounds AS (SELECT user_id, min(tu) // 3600000000 AS h0,
        |  max(tu) // 3600000000 AS h1 FROM e GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr
        |  FROM bounds),
        |g AS (SELECT user_id, hr, (hr + 1) * 3600000000 - 1 AS pt FROM grid)
        |SELECT g.user_id, g.hr, b.v AS locf_value
        |FROM g ASOF LEFT JOIN b
        |  ON g.user_id = b.user_id AND g.pt >= b.tu""".stripMargin,

    // the rebuild invariant: the oracle is the DIRECT whole-log aggregate
    // with the identical naive-sumsq std (greatest-0-clamped, n>1 gated)
    "x_agg_merge" ->
      """WITH e AS (SELECT user_id, event_type,
        |  round(value * 100) AS c FROM events)
        |SELECT user_id, event_type, CAST(count(c) AS BIGINT) AS n,
        |  round(sum(c) / count(c), 4) AS mean,
        |  CASE WHEN count(c) > 1 THEN
        |    round(sqrt(greatest((sum(c * c) - sum(c) * sum(c) / count(c))
        |      / (count(c) - 1), 0.0)), 4) END AS sd,
        |  min(c) AS min_v, max(c) AS max_v
        |FROM e GROUP BY user_id, event_type""".stripMargin,

    // strictly-increasing first-occurrence chain; µs out
    "x_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
        |s1 AS (SELECT user_id, min(tu) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(tu) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND tu > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(tu) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND tu > t2 GROUP BY e.user_id)
        |SELECT s1.user_id, t1, t2, t3,
        |  CAST(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS BIGINT)
        |    AS depth
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    // epoch week index (integer // of µs) — calendar-free, engine-exact
    "x_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM act GROUP BY user_id)
        |SELECT c.cohort_week, wk - c.cohort_week AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM act JOIN c USING (user_id)
        |GROUP BY c.cohort_week, wk - c.cohort_week""".stripMargin,

    // lead() pairing per user; probabilities normalised over the
    // aggregated counts and rounded 4 dp
    "x_transition" ->
      """WITH p AS (SELECT event_type AS a, lead(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS b FROM events),
        |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM p
        |  WHERE b IS NOT NULL GROUP BY a, b)
        |SELECT a, b, n,
        |  round(n / sum(n) OVER (PARTITION BY a), 4) AS p
        |FROM c""".stripMargin,

    // z rounded to 4 dp BEFORE the gate in both engines; sd=0 is exact
    "x_anomaly" ->
      """WITH r AS (SELECT event_id, user_id, value,
        |  avg(value) OVER w AS mu, stddev_samp(value) OVER w AS sd,
        |  count(value) OVER w AS n
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, round((value - mu) / sd, 4) AS z
        |FROM r WHERE n >= 5 AND sd > 0
        |  AND abs(round((value - mu) / sd, 4)) > 2""".stripMargin,

    // same NULL subtotal markers both engines
    "x_rollup" ->
      """SELECT event_type, user_id % 10 AS cohort,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY ROLLUP(event_type, user_id % 10)""".stripMargin,

    // explicit value list, conditional-aggregation mirror
    "x_pivot" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    // the Morton interleave recomputed as plain bit arithmetic — the
    // range-repartition+sort on the Spark side is row-invariant
    "x_zorder" -> {
      val z = (0 until 4).map { i =>
        val even = 1L << (2 * i)
        val odd = 1L << (2 * i + 1)
        s"((ub >> $i) & 1) * $even + ((vb >> $i) & 1) * $odd"
      }.mkString(" + ")
      s"""WITH b AS (SELECT event_id, user_id % 16 AS ub,
         |  least(CAST(floor(value / 32) AS BIGINT), 15) AS vb
         |  FROM events WHERE value IS NOT NULL)
         |SELECT event_id, ub, vb, CAST($z AS BIGINT) AS zval FROM b""".stripMargin
    },

    "x_pipeline" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |cnt AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks),
         |lang AS (SELECT doc_id, $LANG_PRED AS pred_lang FROM ($LANG_SCORED)),
         |keep AS (SELECT min(doc_id) AS doc_id FROM documents WHERE text IS NOT NULL GROUP BY md5(text))
         |SELECT c.doc_id, c.n_tokens, l.pred_lang
         |FROM cnt c JOIN lang l ON l.doc_id = c.doc_id
         |WHERE c.n_tokens >= 5 AND l.pred_lang = 'en'
         |AND EXISTS (SELECT 1 FROM keep k WHERE k.doc_id = c.doc_id)""".stripMargin,

    "x_win_tumble" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1, 2""".stripMargin,

    "x_win_slide" ->
      """SELECT ws AS window_start, event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
        |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS ws, event_type, value FROM events)
        |GROUP BY ws, event_type""".stripMargin,

    "x_win_session" ->
      """WITH x AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events),
        |y AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |CAST(count(*) AS BIGINT) AS n FROM y GROUP BY user_id, sid""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN — an independent implementation of the
    // inclusive greatest-ts-≤ semantics the union-merge window computes
    "x_asof_join" ->
      """WITH b AS (SELECT user_id, ts, max(value) AS v_value, ts AS v_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, b.v_ts, b.v_value
        |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts""".stripMargin,

    // the naive join+window formulation is REWRITTEN onto the custom exec
    // (RewriteNaiveAsOf); the rewrite must be invisible in the result, so it
    // shares the native ASOF LEFT JOIN mirror too
    "x_asof_rewrite" ->
      """WITH b AS (SELECT user_id, ts, max(value) AS v_value, ts AS v_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, b.v_ts, b.v_value
        |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts""".stripMargin,

    // the custom-exec form computes the IDENTICAL semantics, so it shares
    // the native ASOF LEFT JOIN mirror
    "x_asof_exec" ->
      """WITH b AS (SELECT user_id, ts, max(value) AS v_value, ts AS v_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, b.v_ts, b.v_value
        |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts""".stripMargin,

    // keep is decided in INTEGER arithmetic on both sides (chars*10 vs
    // n*tenths, (n-nd)*100 vs n*pct) — never float-vs-threshold
    "x_quality_gopher" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |m AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
         |  len(array_to_string(tk, '')) AS nc FROM toks)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct,
         |  round(nc / CAST(greatest(n, 1) AS DOUBLE), 4) AS mean_tok_len,
         |  round((n - nd) / CAST(greatest(n, 1) AS DOUBLE), 4) AS dup_tok_frac,
         |  (n >= 15 AND n <= 1000 AND nc * 10 >= n * 40 AND nc * 10 <= n * 50
         |   AND (n - nd) * 100 <= n * 55 AND n > 0) AS keep
         |FROM m""".stripMargin,

    "x_top_token" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
         |cnt AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
         |r AS (SELECT doc_id, tok, c, sum(c) OVER (PARTITION BY doc_id) AS n,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn FROM cnt)
         |SELECT doc_id, tok AS top_tok, CAST(c AS BIGINT) AS top_cnt,
         |  round(c / CAST(n AS DOUBLE), 4) AS top_frac
         |FROM r WHERE rn = 1""".stripMargin,

    "x_pii_scrub" -> {
      val email = graft.ext.TextOps.EmailRe
      val phone = graft.ext.TextOps.PhoneRe
      val ip = graft.ext.TextOps.Ipv4Re
      s"""WITH p AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +2721400'
         |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |    || ' at 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.17' AS t
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS scrubbed
         |FROM p""".stripMargin
    },

    "x_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |sh AS (SELECT DISTINCT doc_id, shingle FROM
         |  (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2, 0)+1),
         |     i -> array_to_string(tk[i:i+2], ' '))) AS shingle FROM toks)),
         |common AS (SELECT shingle FROM (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle) WHERE c >= 3),
         |perdoc AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |hits AS (SELECT doc_id, count(*) AS n_boiler FROM sh JOIN common USING (shingle) GROUP BY doc_id)
         |SELECT p.doc_id, CAST(p.n_shingles AS BIGINT) AS n_shingles,
         |  CAST(coalesce(h.n_boiler, 0) AS BIGINT) AS n_boiler,
         |  round(coalesce(h.n_boiler, 0) / CAST(p.n_shingles AS DOUBLE), 4) AS boiler_frac
         |FROM perdoc p LEFT JOIN hits h ON h.doc_id = p.doc_id""".stripMargin,

    "x_strat_sample" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0 <
         |  CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.2
         |              WHEN 'src2' THEN 0.5 ELSE 0.3 END""".stripMargin,

    // same A-ES key, ranked within each source
    "x_weighted_stratum" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY round(-ln(greatest(
         |      ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0,
         |      1e-12)) / CAST(n_chars AS DOUBLE), 6), doc_id) AS rk
         |  FROM documents WHERE n_chars > 0)
         |WHERE rk <= 3""".stripMargin,

    // A-ES key mirrored exactly: same md5 uniform, same clamp, same
    // round-6-before-rank, same doc_id tie-break
    "x_weighted_sample" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    round(-ln(greatest(
         |      ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0,
         |      1e-12)) / CAST(n_chars AS DOUBLE), 6) AS esk
         |  FROM documents WHERE n_chars > 0)
         |ORDER BY esk, doc_id LIMIT 50""".stripMargin,

    // round BEFORE ranking (house rule); ln agrees to well under 4 dp
    // across libm implementations
    "x_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |tok AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
         |tf AS (SELECT doc_id, tok, count(*) AS tf_cnt FROM tok GROUP BY doc_id, tok),
         |dfreq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY tok),
         |n AS (SELECT count(*) AS n FROM toks),
         |r AS (SELECT tf.doc_id, tf.tok, tf.tf_cnt,
         |  round(tf.tf_cnt * ln(CAST(n.n AS DOUBLE) / dfq), 4) AS score
         |  FROM tf JOIN dfreq ON dfreq.tok = tf.tok, n),
         |rk AS (SELECT doc_id, tok, CAST(tf_cnt AS BIGINT) AS tf_cnt, score,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn FROM r)
         |SELECT doc_id, tok, tf_cnt, score FROM rk WHERE rn <= 5""".stripMargin,

    // the sketch is md5-deterministic: rebuild the identical depth×width
    // counters and min over rows — estimates hash-compare exactly
    // exact form of the distinct-count profiler; the HLL approx form is
    // engine-specific and locked by the spec's tolerance case instead
    "x_distinct" ->
      s"""WITH tok AS (SELECT lang, unnest($TOK) AS tok FROM documents WHERE text IS NOT NULL)
         |SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n,
         |CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
         |FROM tok GROUP BY lang""".stripMargin,

    "x_count_min" -> {
      val bkt = (k: String, r: String) =>
        s"${hex32(s"md5($k || ':' || CAST($r AS VARCHAR))", 1)} % 256"
      s"""WITH tok AS (SELECT unnest($TOK) AS tok FROM documents WHERE text IS NOT NULL),
         |exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM tok
         |  GROUP BY tok ORDER BY exact_cnt DESC, tok LIMIT 20),
         |rows_ AS (SELECT unnest(range(0, 4)) AS r),
         |sk AS (SELECT r, ${bkt("tok", "r")} AS bucket, count(*) AS cnt
         |  FROM tok, rows_ GROUP BY r, ${bkt("tok", "r")}),
         |qb AS (SELECT e.tok, rows_.r, ${bkt("e.tok", "rows_.r")} AS bucket
         |  FROM exact e, rows_),
         |est AS (SELECT qb.tok, min(coalesce(sk.cnt, 0)) AS cm_est
         |  FROM qb LEFT JOIN sk ON sk.r = qb.r AND sk.bucket = qb.bucket
         |  GROUP BY qb.tok)
         |SELECT e.tok, e.exact_cnt, CAST(est.cm_est AS BIGINT) AS cm_est
         |FROM exact e JOIN est ON est.tok = e.tok""".stripMargin
    },

    "x_contamination" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |sh AS (SELECT DISTINCT doc_id, shingle FROM
         |  (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2, 0)+1),
         |     i -> array_to_string(tk[i:i+2], ' '))) AS shingle FROM toks)),
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 7)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM sh JOIN ev USING (shingle)
         |WHERE doc_id % 100 <> 7
         |GROUP BY doc_id HAVING count(*) >= 2""".stripMargin,

    // content-defined chunking: gates replayed from the same md5-mod rule,
    // the sequential start selection as a recursive CTE (min of first gate
    // vs forced maxLen split), chunk text digested from the same slice
    "x_cdc_chunks" ->
      s"""WITH RECURSIVE $CDC_SEG_CTES
         |SELECT e.doc_id, CAST(e.chunk_id AS INT) AS chunk_id,
         |  CAST(e.s AS INT) AS start_tok,
         |  CAST(e.e - e.s + 1 AS BIGINT) AS n_tokens,
         |  md5(array_to_string(t.tk[e.s:e.e], ' ')) AS chunk_md5
         |FROM (SELECT seg.*, coalesce(lead(s) OVER (PARTITION BY doc_id
         |    ORDER BY chunk_id) - 1, n) AS e FROM seg) e
         |JOIN toksc t USING (doc_id)""".stripMargin,

    // CDC chunking over the unicode token stream of the multilingual
    // fixture — same recursive boundary selection, gate hashes over
    // NFC-normalized shingles
    "x_cdc_chunks_uni" ->
      s"""WITH RECURSIVE ${cdcSegCtes("documents WHERE text IS NOT NULL",
           tokUni(MULTI_TEXT))}
         |SELECT e.doc_id, CAST(e.chunk_id AS INT) AS chunk_id,
         |  CAST(e.s AS INT) AS start_tok,
         |  CAST(e.e - e.s + 1 AS BIGINT) AS n_tokens,
         |  md5(array_to_string(t.tk[e.s:e.e], ' ')) AS chunk_md5
         |FROM (SELECT seg.*, coalesce(lead(s) OVER (PARTITION BY doc_id
         |    ORDER BY chunk_id) - 1, n) AS e FROM seg) e
         |JOIN toksc t USING (doc_id)""".stripMargin,

    // shift-resistant span dedup: CDC chunk strings through the
    // x_chunk_dedup winner/reassembly SQL (same winner encoding)
    "x_cdc_dedup" ->
      s"""WITH RECURSIVE $CDC_SEG_CTES,
         |ch AS (SELECT e.doc_id, e.chunk_id AS chunk_idx,
         |    array_to_string(t.tk[e.s:e.e], ' ') AS chunk
         |  FROM (SELECT seg.*, coalesce(lead(s) OVER (PARTITION BY doc_id
         |      ORDER BY chunk_id) - 1, n) AS e FROM seg) e
         |  JOIN toksc t USING (doc_id)),
         |win AS (SELECT chunk, min(doc_id*1048576 + chunk_idx) AS w
         |  FROM ch GROUP BY chunk)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN doc_id*1048576 + chunk_idx = w
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
         |    FILTER (WHERE doc_id*1048576 + chunk_idx = w), '') AS clean_text
         |FROM ch JOIN win USING (chunk) GROUP BY doc_id""".stripMargin,

    // URL canonicalization: the identical planted construction and the
    // identical regex pipeline (RE2-compatible patterns run verbatim in
    // both engines; 'g' flag where Spark's replace is implicitly global)
    "x_url_canon" ->
      s"""WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'HTTPS://' END ||
        |     'WWW.' || upper(source) || '.Example.COM' ||
        |     CASE WHEN doc_id % 3 = 0 THEN ':80'
        |          WHEN doc_id % 3 = 1 THEN ':443' ELSE '' END ||
        |     '/Docs/' || doc_id ||
        |     CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&z=26&lang='
        |          ELSE '?z=26&lang=' END || lang ||
        |     CASE WHEN doc_id % 5 = 0 THEN '&fbclid=abc123' ELSE '' END ||
        |     CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents WHERE text IS NOT NULL),
        |${urlCanonCtes("u", "doc_id")}
        |SELECT doc_id, url, canon_url FROM canon""".stripMargin,

    // per-host crawl accounting: host from the canonical URL (shared
    // canonicalization CTEs), one group-by with exact distinct
    "x_host_stats" ->
      s"""WITH u AS (SELECT doc_id,
         |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'HTTPS://' END ||
         |     'WWW.' || upper(source) || '.Example.COM' ||
         |     CASE WHEN doc_id % 3 = 0 THEN ':80'
         |          WHEN doc_id % 3 = 1 THEN ':443' ELSE '' END ||
         |     '/Docs/' || doc_id ||
         |     CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&z=26&lang='
         |          ELSE '?z=26&lang=' END || lang ||
         |     CASE WHEN doc_id % 5 = 0 THEN '&fbclid=abc123' ELSE '' END ||
         |     CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END) AS url
         |  FROM documents WHERE text IS NOT NULL),
         |${urlCanonCtes("u", "doc_id")}
         |SELECT regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)
         |    AS host,
         |  CAST(count(*) AS BIGINT) AS n_fetches,
         |  CAST(count(DISTINCT canon_url) AS BIGINT) AS n_pages,
         |  round(1.0 - count(DISTINCT canon_url) /
         |    CAST(count(*) AS DOUBLE), 4) AS dup_rate
         |FROM canon GROUP BY 1""".stripMargin,

    // sketch-backed host stats: the oracle is the EXACT distinct form —
    // legitimate because every testdata host stays below the sketch's k,
    // where KMV degenerates to an exact distinct count (the buffer saw
    // every hash); the estimator path is spec-locked on a hot-host
    // fixture instead
    "x_host_stats_kmv" ->
      """WITH u AS (SELECT doc_id,
        |    'https://' || source || '.example.com/p/' || (doc_id % 40) ||
        |      '?lang=' || lang AS url
        |  FROM documents
        |  WHERE text IS NOT NULL AND source IS NOT NULL
        |    AND lang IS NOT NULL)
        |SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)
        |    AS host,
        |  CAST(count(*) AS BIGINT) AS n_fetches,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_pages,
        |  round(1.0 - count(DISTINCT url) / CAST(count(*) AS DOUBLE), 4)
        |    AS dup_rate
        |FROM u GROUP BY 1""".stripMargin,

    // composed web-corpus pipeline: plant colliding spelling variants,
    // canonicalize (shared CTEs), keep the FIRST fetch per canonical URL,
    // CDC-chunk-dedup the survivors (shared recursion, over the subset),
    // weighted-Bernoulli sample by n_chars over the stats-joined set
    "x_web_pipeline" -> webPipelineSql("text", TOK),

    // identical chain over the multilingual stream: only the text
    // expression and the chunker's token stream differ
    "x_web_pipeline_uni" -> webPipelineSql(MULTI_TEXT, tokUni("text")),


    // weighted Bernoulli: identical integer comparison h*W < w*2^32 —
    // no float anywhere, exact agreement by construction
    "x_weighted_bernoulli" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents WHERE text IS NOT NULL),
         |m AS (SELECT max(n_chars) AS wmax FROM d)
         |SELECT doc_id, n_chars FROM d, m
         |WHERE n_chars > 0
         |  AND ${hex32("h", 1)} * wmax < n_chars * 4294967296""".stripMargin,

    // tokenizer fertility by source: whitespace-token and subword-piece
    // sums from the same recursive segmentation, one division at the end
    "x_bpe_fertility" ->
      s"""WITH RECURSIVE $BPE_SEG_CTES,
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sub
         |  FROM seg WHERE pp >= 0 GROUP BY doc_id),
         |per AS (SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS nt,
         |    coalesce(cnt.n_sub, 0) AS ns
         |  FROM toksb t LEFT JOIN cnt USING (doc_id)),
         |agg AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(per.nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(per.ns) AS BIGINT) AS n_subwords
         |  FROM per JOIN documents d USING (doc_id) GROUP BY d.source)
         |SELECT source, n_docs, n_tokens, n_subwords,
         |  round(n_subwords / CAST(n_tokens AS DOUBLE), 4) AS fertility
         |FROM agg""".stripMargin,

    // greedy longest-match subword segmentation, re-derived as a recursive
    // CTE (see BPE_SEG_CTES) — piece-for-piece agreement with the native
    // expression is the cross-engine algorithm check
    "x_bpe_encode" ->
      s"""WITH RECURSIVE $BPE_SEG_CTES
         |SELECT doc_id, tp, CAST(pp AS INT) AS pp, piece
         |FROM seg WHERE pp >= 0""".stripMargin,

    // the learned merge table, re-derived end to end: 8 unrolled Sennrich
    // rounds over the word-type table (see bpeLearnCtes)
    "x_bpe_learn" ->
      s"""WITH ${bpeLearnCtes(8)}
         |SELECT CAST(rank AS INT) AS rank, "left", "right", merged,
         |  CAST(cnt AS BIGINT) AS pair_count FROM merges""".stripMargin,

    // learn -> apply -> aggregate as ONE oracle: the unrolled learn chain
    // above, then every corpus token instance pushed through the SAME
    // ranked delimited replaces, then per-(source, piece) counts
    "x_bpe_learned_pipeline" -> {
      // one MATERIALIZED CTE per applied rank (a nested 8-rank expression
      // exceeds the parser's tree-depth limit; chained CTEs are also the
      // shape that doesn't re-inline the learn chain per rank)
      val applied = (1 to 8).map { r =>
        s"""a$r AS MATERIALIZED (SELECT source,
           |  CASE WHEN (SELECT count(*) FROM m$r) = 0 THEN s
           |  ELSE replace(s,
           |    '$PIPE' $CC (SELECT a FROM m$r) $CC '$PIPE$PIPE' $CC
           |      (SELECT b FROM m$r) $CC '$PIPE',
           |    '$PIPE' $CC (SELECT a FROM m$r) $CC (SELECT b FROM m$r) $CC
           |      '$PIPE') END AS s FROM a${r - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH ${bpeLearnCtes(8)},
         |dlp AS (SELECT source, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |a0 AS (SELECT source, regexp_replace(tk[i+1], '(.)', '|\\1|', 'g') AS s
         |  FROM (SELECT source, tk, unnest(range(0, len(tk))) AS i FROM dlp)),
         |$applied,
         |enclp AS (SELECT source,
         |  string_split(trim(s, '$PIPE'), '$PIPE$PIPE') AS pieces FROM a8)
         |SELECT source, piece, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT source, unnest(pieces) AS piece FROM enclp)
         |GROUP BY source, piece""".stripMargin
    },

    // rank-ordered BPE merge inference: each rank is ONE non-overlapping
    // replace over a both-sides-delimited symbol string ("|t||i||n||g|")
    // — per-symbol delimiters make '|a||b|' match exactly adjacent WHOLE
    // symbols (never a char inside a longer symbol), and replace()'s
    // resume-after-match is precisely the left-to-right skip: '|a||a||a|'
    // -> '|aa||a|'. The merge table is shared verbatim with the Spark
    // side's in-row rank fold; nothing here is interpolated unescaped.
    "x_bpe_merge_encode" -> {
      val seed = "regexp_replace(w, '(.)', '|\\1|', 'g')"
      val folded = graft.ext.TextOps.defaultBpeMerges
        .foldLeft(seed) { case (acc, (a, b)) =>
          val ae = a.replace("'", "''"); val be = b.replace("'", "''")
          s"replace($acc, '|$ae||$be|', '|$ae$be|')"
        }
      s"""WITH d AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |tokm AS (SELECT doc_id, CAST(i AS INT) AS tp, tk[i+1] AS w
         |  FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM d)),
         |enc AS (SELECT doc_id, tp,
         |    string_split(trim($folded, '|'), '||') AS pieces FROM tokm)
         |SELECT doc_id, tp, CAST(i AS INT) AS pp, pieces[i+1] AS piece
         |FROM (SELECT doc_id, tp, pieces,
         |  unnest(range(0, len(pieces))) AS i FROM enc)""".stripMargin
    },

    // next-fit packing on TRUE subword counts: the x_pack_sequences
    // machinery with n_tokens = the recursive segmentation's piece count
    // (0 for token-less documents), budget 512
    "x_bpe_pack" ->
      s"""WITH RECURSIVE $BPE_SEG_CTES,
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sub
         |  FROM seg WHERE pp >= 0 GROUP BY doc_id),
         |t AS (SELECT tb.doc_id, coalesce(cnt.n_sub, 0) AS n_tokens,
         |    md5(CAST(tb.doc_id AS VARCHAR)) AS ord_key
         |  FROM (SELECT DISTINCT doc_id FROM toksb) tb
         |  LEFT JOIN cnt USING (doc_id)),
         |b AS (SELECT doc_id, n_tokens, ord_key,
         |  ${hex32("ord_key", 1)} % 8 AS bucket FROM t),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY bucket ORDER BY ord_key, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM b)
         |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin, n_tokens
         |FROM c""".stripMargin,

    // same md5 ordering, same ROWS-frame running sum, same start-offset
    // bin assignment
    "x_pack_sequences" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  md5(CAST(doc_id AS VARCHAR)) AS ord_key FROM toks),
         |b AS (SELECT doc_id, n_tokens, ord_key,
         |  ${hex32("ord_key", 1)} % 8 AS bucket FROM t),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY bucket ORDER BY ord_key, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM b)
         |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(floor((cum - n_tokens) / 256) AS BIGINT) AS bin, n_tokens
         |FROM c""".stripMargin,

    // quantile_cont is the same index·(n−1) linear interpolation Spark's
    // exact percentile uses
    "x_group_stats" ->
      """SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(CAST(n_chars AS DOUBLE)), 4) AS mean,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS p50,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4) AS p90
        |FROM documents WHERE text IS NOT NULL GROUP BY source""".stripMargin,

    // per-doc stop_ratio is x_quality's (same tokeniser, same 4-dp round);
    // the gate compares the ROUNDED per-source mean in both engines
    "x_source_gate" ->
      s"""WITH sc AS (
         |  SELECT doc_id, source,
         |    round(CAST(len(list_filter(tk, x -> list_contains($EN_STOPS, x))) AS DOUBLE)
         |      / greatest(len(tk), 1), 4) AS stop_ratio
         |  FROM (SELECT doc_id, source, $TOK AS tk
         |        FROM documents WHERE text IS NOT NULL)),
         |st AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS src_n,
         |    round(avg(stop_ratio), 4) AS src_mean
         |  FROM sc GROUP BY source)
         |SELECT sc.doc_id, sc.source, st.src_n, st.src_mean
         |FROM sc JOIN st ON sc.source IS NOT DISTINCT FROM st.source
         |WHERE NOT (st.src_n >= 10 AND coalesce(st.src_mean < 0.028, false))""".stripMargin,

    // same 8-token non-overlapping chunks, same doc_id*2^20+idx winner
    // encoding, same space-joined reassembly of surviving chunks
    "x_chunk_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL AND len($TOK) > 0),
         |ix AS (SELECT doc_id, tk, unnest(range(0, (len(tk)+7)//8)) AS chunk_idx FROM toks),
         |ch AS (SELECT doc_id, chunk_idx,
         |  array_to_string(tk[chunk_idx*8+1:(chunk_idx+1)*8], ' ') AS chunk FROM ix),
         |win AS (SELECT chunk, min(doc_id*1048576 + chunk_idx) AS w FROM ch GROUP BY chunk)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN doc_id*1048576 + chunk_idx = w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
         |    FILTER (WHERE doc_id*1048576 + chunk_idx = w), '') AS clean_text
         |FROM ch JOIN win USING (chunk) GROUP BY doc_id""".stripMargin,

    // ExactSubstr span dedup: overlapping 8-token shingles WITH positions;
    // non-first occurrences mark [pos, pos+8); gaps-and-islands merge
    // (running max of span end over preceding rows) mirrors the Spark fold
    "x_substr_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL AND len($TOK) > 0),
         |occ AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk)-7, 0))) AS pos FROM toks),
         |sh AS (SELECT doc_id, pos, array_to_string(tk[pos+1:pos+8], ' ') AS shg FROM occ),
         |win AS (SELECT shg, min(doc_id*1048576 + pos) AS w FROM sh GROUP BY shg),
         |dup AS (SELECT doc_id, pos FROM sh JOIN win USING (shg)
         |  WHERE doc_id*1048576 + pos <> w),
         |g AS (SELECT doc_id, pos, CASE WHEN pos >= coalesce(max(pos + 8) OVER
         |  (PARTITION BY doc_id ORDER BY pos
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) THEN 1 ELSE 0 END AS ns
         |  FROM dup),
         |si AS (SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM g),
         |spans AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 8 AS e
         |  FROM si GROUP BY doc_id, sid),
         |sp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(e - s) AS BIGINT) AS dup_tokens FROM spans GROUP BY doc_id),
         |cov AS (SELECT doc_id, unnest(range(s, e)) AS cp FROM spans),
         |tp AS (SELECT doc_id, i, tk[i+1] AS tok FROM
         |  (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM toks)),
         |kept AS (SELECT t.doc_id, t.i, t.tok FROM tp t
         |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.cp
         |  WHERE c.doc_id IS NULL),
         |cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sp.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(sp.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  coalesce(cl.clean_text, '') AS clean_text
         |FROM toks t LEFT JOIN sp ON t.doc_id = sp.doc_id
         |  LEFT JOIN cl ON t.doc_id = cl.doc_id""".stripMargin,

    // long-match span dedup: substrDedup's machinery at width 20 with the
    // shuffle key hashed (md5 of the space-joined window — byte-identical
    // string built on both engines); input plants the shared 22-token
    // boilerplate on every 17th doc, at a different offset per doc
    "x_longmatch_dedup" ->
      s"""WITH pl AS (SELECT doc_id,
         |    CASE WHEN doc_id % 17 = 3 THEN text ||
         |      ' subscribe to our newsletter for daily updates and breaking news delivered straight to your inbox every morning without fail thanks for reading'
         |    ELSE text END AS text
         |  FROM documents WHERE text IS NOT NULL),
         |toks AS (SELECT doc_id, $TOK AS tk FROM pl WHERE len($TOK) > 0),
         |occ AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk)-19, 0))) AS pos FROM toks),
         |sh AS (SELECT doc_id, pos, md5(array_to_string(tk[pos+1:pos+20], ' ')) AS shg FROM occ),
         |win AS (SELECT shg, min(doc_id*1048576 + pos) AS w FROM sh GROUP BY shg),
         |dup AS (SELECT doc_id, pos FROM sh JOIN win USING (shg)
         |  WHERE doc_id*1048576 + pos <> w),
         |g AS (SELECT doc_id, pos, CASE WHEN pos >= coalesce(max(pos + 20) OVER
         |  (PARTITION BY doc_id ORDER BY pos
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) THEN 1 ELSE 0 END AS ns
         |  FROM dup),
         |si AS (SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM g),
         |spans AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 20 AS e
         |  FROM si GROUP BY doc_id, sid),
         |sp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(e - s) AS BIGINT) AS dup_tokens FROM spans GROUP BY doc_id),
         |cov AS (SELECT doc_id, unnest(range(s, e)) AS cp FROM spans),
         |tp AS (SELECT doc_id, i, tk[i+1] AS tok FROM
         |  (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM toks)),
         |kept AS (SELECT t.doc_id, t.i, t.tok FROM tp t
         |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.cp
         |  WHERE c.doc_id IS NULL),
         |cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sp.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(sp.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  coalesce(cl.clean_text, '') AS clean_text
         |FROM toks t LEFT JOIN sp ON t.doc_id = sp.doc_id
         |  LEFT JOIN cl ON t.doc_id = cl.doc_id""".stripMargin,

    // overlapping token shingles counted WITH multiplicity (no DISTINCT —
    // unlike SHINGLE_CTES); char base = space-joined token stream
    "x_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL AND len($TOK) > 0),
         |base AS (SELECT doc_id, tk, len(array_to_string(tk, ' ')) AS tot FROM toks),
         |ng2 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
         |  i -> array_to_string(tk[i:i+1], ' '))) AS ng FROM base),
         |c2 AS (SELECT doc_id, ng, count(*) AS cnt FROM ng2 GROUP BY doc_id, ng),
         |t2 AS (SELECT doc_id, max(cnt*len(ng)) AS topchars FROM c2 GROUP BY doc_id),
         |ng5 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-4, 0)+1),
         |  i -> array_to_string(tk[i:i+4], ' '))) AS ng FROM base),
         |c5 AS (SELECT doc_id, ng, count(*) AS cnt FROM ng5 GROUP BY doc_id, ng),
         |d5 AS (SELECT doc_id, sum(CASE WHEN cnt > 1 THEN (cnt-1)*len(ng) ELSE 0 END) AS dupchars
         |  FROM c5 GROUP BY doc_id)
         |SELECT b.doc_id, CAST(tot AS BIGINT) AS tot_chars,
         |  round(coalesce(topchars, 0) / tot, 6) AS top_ngram_cov,
         |  round(coalesce(dupchars, 0) / tot, 6) AS dup_ngram_frac
         |FROM base b LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)""".stripMargin,

    // the deletion-neighbourhood candidate generation is result-invariant
    // (FastSS completeness + exact verify), so the oracle is the PLAIN
    // levenshtein join
    "x_fuzzy_join" ->
      """WITH l AS (SELECT c_custkey AS l_id, c_name AS l_str FROM customer
        |  WHERE c_custkey <= 1000),
        |r AS (SELECT c_custkey AS r_id,
        |  substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT)) ||
        |  substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2,
        |    length(c_name)) AS r_str
        |  FROM customer)
        |SELECT l_id, r_id, CAST(levenshtein(l_str, r_str) AS INT) AS dist
        |FROM l, r WHERE levenshtein(l_str, r_str) <= 1""".stripMargin,

    // the q-gram candidate generation is result-invariant (count-filter
    // completeness + exact verify), so the oracle is the PLAIN levenshtein
    // join at the same distance
    "x_fuzzy_qgram" ->
      """WITH base AS (SELECT doc_id AS id, substr(md5(text), 1, 24) AS name
        |  FROM documents WHERE text IS NOT NULL AND length(substr(md5(text), 1, 24)) >= 8),
        |l AS (SELECT id AS l_id, name AS l_str FROM base),
        |r0 AS (SELECT id, name, length(name) AS ln FROM base),
        |r1 AS (SELECT id, substr(name, 1, CAST(id % ln AS INT)) ||
        |  substr(name, CAST(id % ln AS INT) + 2, ln) AS n1, ln FROM r0),
        |r2 AS (SELECT id, substr(n1, 1, CAST(id * 7 % (ln - 1) AS INT)) ||
        |  substr(n1, CAST(id * 7 % (ln - 1) AS INT) + 2, ln - 1) AS n2, ln FROM r1),
        |r3 AS (SELECT id AS r_id, substr(n2, 1, CAST(id * 11 % (ln - 2) AS INT)) ||
        |  '#' || substr(n2, CAST(id * 11 % (ln - 2) AS INT) + 2, ln - 2) AS r_str FROM r2)
        |SELECT l_id, r_id, CAST(levenshtein(l_str, r_str) AS INT) AS dist
        |FROM l, r3 WHERE levenshtein(l_str, r_str) <= 5""".stripMargin,

    // the Bloom prune is result-invariant (no false negatives + exact
    // post-join), so the oracle is the plain semi-join
    "x_bloom_prune" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag""".stripMargin,

    // same md5-of-key rank within each source
    "x_rebalance" ->
      """SELECT doc_id, source FROM documents WHERE text IS NOT NULL
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 10""".stripMargin,

    "x_tok_hist" ->
      s"""WITH t AS (SELECT len($TOK) AS n FROM documents WHERE text IS NOT NULL)
         |SELECT CAST(n // 10 AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(n) AS BIGINT) AS min_tokens, CAST(max(n) AS BIGINT) AS max_tokens
         |FROM t GROUP BY 1""".stripMargin,

    // SemDeDup: same centroid chain as x_ann_ivf but over the FULL planted
    // corpus; in-cluster smaller-id near-dup (rounded cosine ≥ 0.99) drops
    // the row
    // PSI over the union of bins with add-0.5 smoothing; B = union bin
    // count; the full join is NULL-SAFE (IS NOT DISTINCT FROM) to mirror
    // the operator's <=> — a null bin on both sides is ONE bin
    "x_psi_drift" ->
      """WITH rc AS (SELECT source AS bin, count(*) AS nr FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 2 = 0 GROUP BY source),
        |cc AS (SELECT source AS bin, count(*) AS nc FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 2 = 1 GROUP BY source),
        |j AS (SELECT coalesce(rc.bin, cc.bin) AS bin,
        |  coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
        |  FROM rc FULL JOIN cc ON rc.bin IS NOT DISTINCT FROM cc.bin),
        |t AS (SELECT CAST(sum(nr) AS DOUBLE) AS Tr, CAST(sum(nc) AS DOUBLE) AS Tc,
        |  CAST(count(*) AS DOUBLE) AS B FROM j)
        |SELECT bin, CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
        |  round(((nc + 0.5) / (Tc + 0.5 * B) - (nr + 0.5) / (Tr + 0.5 * B)) *
        |    ln(((nc + 0.5) / (Tc + 0.5 * B)) / ((nr + 0.5) / (Tr + 0.5 * B))), 6)
        |    AS psi_contrib
        |FROM j, t""".stripMargin,

    // cumulative md5-uniform boundaries: [0,0.8) train, [0.8,0.9) val,
    // remainder test (the Spark side folds the same bounds into a CASE)
    "x_split" ->
      s"""SELECT split, CAST(count(*) AS BIGINT) AS n_docs FROM (
         |  SELECT CASE
         |    WHEN ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0 < 0.8 THEN 'train'
         |    WHEN ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0 < 0.9000000000000001 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM documents WHERE text IS NOT NULL) GROUP BY split""".stripMargin,

    // clusters via recursive-CTE closure (independent of the propagation),
    // then the identical md5 split on the cluster id
    "x_cluster_split" ->
      s"""WITH RECURSIVE $SHINGLE_CTES,
         |docs AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lab AS (SELECT d.doc_id,
         |  least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
         |  FROM docs d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id)
         |SELECT doc_id, cluster_id, CASE
         |  WHEN ${hex32("md5(CAST(cluster_id AS VARCHAR))", 1)} / 4294967296.0 < 0.8 THEN 'train'
         |  WHEN ${hex32("md5(CAST(cluster_id AS VARCHAR))", 1)} / 4294967296.0 < 0.9000000000000001 THEN 'val'
         |  ELSE 'test' END AS split
         |FROM lab""".stripMargin,

    "x_shuffle_export" ->
      s"""SELECT doc_id, bucket,
         |  CAST(row_number() OVER (PARTITION BY bucket
         |    ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rank
         |FROM (SELECT doc_id,
         |    ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} % 8 AS bucket
         |  FROM documents WHERE text IS NOT NULL)""".stripMargin,

    // temperature mixing: share per source ∝ sqrt(n); rate rounded 6 dp on
    // both engines before the md5-uniform compare
    "x_temp_sample" ->
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents
         |  WHERE text IS NOT NULL GROUP BY source),
         |z AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.5)) AS Z FROM c),
         |r AS (SELECT source, least(1.0, round(pow(CAST(n AS DOUBLE), 0.5) / Z
         |  * 300.0 / CAST(n AS DOUBLE), 6)) AS rate FROM c, z)
         |SELECT doc_id, source FROM documents d JOIN r USING (source)
         |WHERE d.text IS NOT NULL
         |  AND ${hex32("md5(CAST(doc_id AS VARCHAR))", 1)} / 4294967296.0 < rate""".stripMargin,

    // per-language ntile(3) over the x_lm_score perplexity (ties broken by
    // doc_id on both engines)
    "x_ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |cnts AS (SELECT tok, count(*) AS cnt FROM
         |  (SELECT unnest(tk) AS tok FROM toks WHERE lang = 'en') GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T,
         |  CAST(count(*) AS DOUBLE) AS V FROM cnts),
         |lp AS (SELECT doc_id, ln((coalesce(cnt, 0) + 0.1) / (T + 0.1 * (V + 1))) AS lp
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) dtok
         |  LEFT JOIN cnts USING (tok) CROSS JOIN tot),
         |ppl AS (SELECT doc_id, round(exp(-round(avg(lp), 6)), 4) AS ppl
         |  FROM lp GROUP BY doc_id),
         |b AS (SELECT d.lang, p.ppl,
         |  ntile(3) OVER (PARTITION BY d.lang ORDER BY p.ppl, p.doc_id) AS bucket
         |  FROM ppl p JOIN documents d USING (doc_id))
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(avg(ppl), 4) AS avg_ppl,
         |  round(min(ppl), 4) AS min_ppl, round(max(ppl), 4) AS max_ppl
         |FROM b GROUP BY lang, bucket""".stripMargin,

    // threshold-based CCNet bucketing: per-language quantile_cont thresholds
    // (same interpolation as Spark's exact percentile, both rounded 6 dp
    // before the compare), bucket = 1 + #{thresholds strictly below ppl} —
    // mirrors CorpusOps.quantileBuckets, no window anywhere
    "x_ccnet_approx" ->
      s"""WITH toks AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |cnts AS (SELECT tok, count(*) AS cnt FROM
         |  (SELECT unnest(tk) AS tok FROM toks WHERE lang = 'en') GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T,
         |  CAST(count(*) AS DOUBLE) AS V FROM cnts),
         |lp AS (SELECT doc_id, ln((coalesce(cnt, 0) + 0.1) / (T + 0.1 * (V + 1))) AS lp
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) dtok
         |  LEFT JOIN cnts USING (tok) CROSS JOIN tot),
         |ppl AS (SELECT doc_id, round(exp(-round(avg(lp), 6)), 4) AS ppl
         |  FROM lp GROUP BY doc_id),
         |sc AS (SELECT d.lang, p.ppl FROM ppl p JOIN documents d USING (doc_id)),
         |th AS (SELECT lang, round(quantile_cont(ppl, 1.0/3), 6) AS t1,
         |  round(quantile_cont(ppl, 2.0/3), 6) AS t2 FROM sc GROUP BY lang),
         |b AS (SELECT sc.lang, sc.ppl,
         |  1 + (CASE WHEN sc.ppl > t1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN sc.ppl > t2 THEN 1 ELSE 0 END) AS bucket
         |  FROM sc JOIN th ON th.lang IS NOT DISTINCT FROM sc.lang)
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(avg(ppl), 4) AS avg_ppl,
         |  round(min(ppl), 4) AS min_ppl, round(max(ppl), 4) AS max_ppl
         |FROM b GROUP BY lang, bucket""".stripMargin,

    "x_pq_topk" ->
      s"""WITH $PLANTED_CTES, $PQ_CTES
         |SELECT vec_id, adc_dist FROM adc ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin,

    // smallest id per comma-joined code signature (sub order), over the
    // same PQ chain x_pq_topk trains
    "x_code_dedup" ->
      s"""WITH $PLANTED_CTES, $PQ_CTES,
         |sig AS (SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS code_sig
         |  FROM enc GROUP BY vec_id)
         |SELECT min(vec_id) AS vec_id, code_sig FROM sig GROUP BY code_sig""".stripMargin,

    // IVF-PQ composition: cosine cells (ivf chain, 1 Lloyd round, nlist=16)
    // prune to the 4 probed cells; survivors score by PQ ADC on their codes
    "x_ivfpq" -> {
      val iters = 1 // must track the Scala side's kmeansIters
      s"""WITH $PLANTED_CTES,
         |$REST_QV
         |${ivfChainCtes("rest", kmeansIters = iters, nlist = 16)}probe AS (SELECT centroid_id FROM (SELECT k.centroid_id, ${cosSql("q.v", "k.c")} AS s
         |  FROM qv q, ctr$iters k) ORDER BY s DESC, centroid_id LIMIT 4),
         |${pqCtes("rest")},
         |cand AS (SELECT a.vec_id FROM asgF a JOIN probe p ON p.centroid_id = a.centroid_id)
         |SELECT vec_id, adc_dist FROM adc JOIN cand USING (vec_id)
         |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin
    },

    // residual IVFADC: same ivf chain, PQ trained on v − centroid[cell],
    // per-probed-cell query-residual tables (adcr already restricts to
    // probed cells via the dtabr join)
    "x_ivfpq_res" -> ivfPqResSql,

    // stored-index serve path: artefacts round-trip through parquet, so the
    // answer is REQUIRED to hash-match the in-memory x_ivfpq_res — same SQL
    "x_ivfpq_stored" -> ivfPqResSql,

    // append path: frozen-quantizer chain from the even half, all rows
    // encoded with it, served over the union
    "x_ivfpq_append" -> ivfPqAppendSql,

    "x_ivfpq_res_recall" -> {
      val iters = 1
      s"""WITH $PLANTED_CTES,
         |$REST_QV
         |${ivfChainCtes("rest", kmeansIters = iters, nlist = 16)}probe AS (SELECT centroid_id FROM (SELECT k.centroid_id, ${cosSql("q.v", "k.c")} AS s
         |  FROM qv q, ctr$iters k) ORDER BY s DESC, centroid_id LIMIT 4),
         |${pqResCtes(s"ctr$iters", "probe")},
         |pqr AS (SELECT vec_id FROM adcr ORDER BY adc_dist, vec_id LIMIT 10),
         |exact AS (SELECT vec_id FROM (SELECT a.vec_id, ${l2Sql("a.v", "q.v")} AS d2
         |  FROM rest a, qv q ORDER BY d2, a.vec_id LIMIT 10))
         |SELECT 10 AS k, CAST(count(*) AS BIGINT) AS n_overlap,
         |  round(count(*) / 10.0, 4) AS recall
         |FROM pqr JOIN exact USING (vec_id)""".stripMargin
    },

    // batch residual IVFADC over the FULL planted corpus: per-query probes
    // (the ivfBatchCtes window), per-(query, cell) residual tables,
    // self-matches excluded, top-5 per query
    "x_ivfpq_batch" -> ivfPqBatchSql,

    // stored-index batch serve — same hash-match contract as x_ivfpq_stored
    "x_ivfpq_stored_batch" -> ivfPqBatchSql,

    // serve-only forms: warm artefacts (the build is a memoized per-session
    // setup, not part of the query) — answers must STILL hash-match the
    // in-memory forms, so the oracles are shared verbatim
    "x_ivfpq_serve" -> ivfPqResSql,
    "x_ivfpq_serve_batch" -> ivfPqBatchSql,

    // cold serve: metadata caches dropped before serving — a latency
    // difference, never an answer difference, so the oracle is shared
    "x_ivfpq_serve_cold" -> ivfPqResSql,

    // build-only: every corpus vector (vec 0, the query, excluded — the
    // pqParts convention) is encoded exactly ONCE into the codes table,
    // so the row count equals the planted-corpus cardinality; checked
    // without replaying the quantizers (the serve oracles above already
    // hash-check the stored codes end-to-end)
    "x_ivfpq_build" ->
      s"""WITH $PLANTED_CTES
         |SELECT count(*) AS n_codes FROM corpus WHERE vec_id <> 0""".stripMargin,

    "x_pq_recall" ->
      s"""WITH $PLANTED_CTES, $PQ_CTES,
         |pq AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT 10),
         |exact AS (SELECT vec_id FROM (SELECT a.vec_id, ${l2Sql("a.v", "q.v")} AS d2
         |  FROM rest a, qv q ORDER BY d2, a.vec_id LIMIT 10))
         |SELECT 10 AS k, CAST(count(*) AS BIGINT) AS n_overlap,
         |  round(count(*) / 10.0, 4) AS recall
         |FROM pq JOIN exact USING (vec_id)""".stripMargin,

    // add-0.1 unigram LM trained on the English slice (CCNet shape);
    // ppl exponentiates the ROUNDED avg so both engines agree bit-for-bit
    "x_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |cnts AS (SELECT tok, count(*) AS cnt FROM
         |  (SELECT unnest(tk) AS tok FROM toks WHERE lang = 'en') GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T,
         |  CAST(count(*) AS DOUBLE) AS V FROM cnts),
         |lp AS (SELECT doc_id, ln((coalesce(cnt, 0) + 0.1) / (T + 0.1 * (V + 1))) AS lp
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) dtok
         |  LEFT JOIN cnts USING (tok) CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  round(avg(lp), 6) AS avg_logp,
         |  round(exp(-round(avg(lp), 6)), 4) AS ppl
         |FROM lp GROUP BY doc_id""".stripMargin,

    // interpolated bigram LM: pruned conditional bigram table + add-alpha
    // unigram backoff, both trained on the en slice — mirrors the Spark
    // side's minCount=2 prune with PRE-prune context totals
    "x_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |uni AS (SELECT tok, count(*) AS cnt FROM
         |  (SELECT unnest(tk) AS tok FROM toks WHERE lang = 'en') GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T,
         |  CAST(count(*) AS DOUBLE) AS V FROM uni),
         |bc AS (SELECT bg, count(*) AS c FROM
         |  (SELECT unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
         |     i -> array_to_string(tk[i:i+1], ' '))) AS bg
         |   FROM toks WHERE lang = 'en') GROUP BY bg),
         |ct AS (SELECT string_split(bg, ' ')[1] AS ctx,
         |  CAST(sum(c) AS DOUBLE) AS ctot FROM bc GROUP BY 1),
         |model AS (SELECT bg, c / ctot AS pbi FROM bc
         |  JOIN ct ON string_split(bg, ' ')[1] = ctx WHERE c >= 2),
         |dbg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
         |  i -> array_to_string(tk[i:i+1], ' '))) AS bg FROM toks),
         |lp AS (SELECT doc_id, ln(0.7 * coalesce(pbi, 0) +
         |    (1 - 0.7) * ((coalesce(cnt, 0) + 0.1) / (T + 0.1 * (V + 1)))) AS lp
         |  FROM dbg LEFT JOIN model USING (bg)
         |  LEFT JOIN uni ON uni.tok = string_split(dbg.bg, ' ')[2]
         |  CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(avg(lp), 6) AS avg_logp,
         |  round(exp(-round(avg(lp), 6)), 4) AS ppl
         |FROM lp GROUP BY doc_id""".stripMargin,

    // fastText-shaped linear classifier: same md5-hex32 % 1024 hashed
    // bigrams as x_dsir, deterministic weight fixture, mean-pooled sigmoid
    "x_lin_classify" ->
      s"""WITH toks AS (SELECT doc_id, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |ng AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
         |  i -> array_to_string(tk[i:i+1], ' '))) AS ng FROM toks),
         |hb AS (SELECT doc_id, ${hex32("h", 1)} % 1024 AS bucket
         |  FROM (SELECT doc_id, md5(ng) AS h FROM ng)),
         |wt AS (SELECT b AS bucket, ((b * 37 + 11) % 201 - 100) / 100.0 AS w
         |  FROM (SELECT unnest(range(0, 1024)) AS b)),
         |sc AS (SELECT doc_id, count(*) AS F, sum(coalesce(w, 0)) AS sw
         |  FROM hb LEFT JOIN wt USING (bucket) GROUP BY doc_id)
         |SELECT doc_id, CAST(F AS BIGINT) AS n_feats,
         |  round(1 / (1 + exp(-(-0.05 + sw / F))), 6) AS score,
         |  (round(1 / (1 + exp(-(-0.05 + sw / F))), 6) >= 0.5) AS pred
         |FROM sc""".stripMargin,

    // hashed-bigram DSIR: same md5-hex32 % 1024 bucketing; every bucket has
    // a ratio row (unseen buckets carry the smoothed constant, not zero)
    "x_dsir" ->
      s"""WITH toks AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL),
         |ng AS (SELECT doc_id, lang, unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
         |  i -> array_to_string(tk[i:i+1], ' '))) AS ng FROM toks),
         |hb AS (SELECT doc_id, lang, ${hex32("h", 1)} % 1024 AS bucket
         |  FROM (SELECT doc_id, lang, md5(ng) AS h FROM ng)),
         |tc AS (SELECT bucket, count(*) AS ct FROM hb WHERE lang = 'en' GROUP BY bucket),
         |rc AS (SELECT bucket, count(*) AS cr FROM hb GROUP BY bucket),
         |tt AS (SELECT CAST(sum(ct) AS DOUBLE) AS Tt FROM tc),
         |rt AS (SELECT CAST(sum(cr) AS DOUBLE) AS Tr FROM rc),
         |ratios AS (SELECT b.bucket,
         |  ln((coalesce(ct, 0) + 0.5) / (Tt + 0.5 * 1024)) -
         |  ln((coalesce(cr, 0) + 0.5) / (Tr + 0.5 * 1024)) AS lr
         |  FROM (SELECT unnest(range(0, 1024)) AS bucket) b
         |  LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
         |  CROSS JOIN tt CROSS JOIN rt)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |  round(sum(lr), 6) AS dsir_logw
         |FROM hb JOIN ratios USING (bucket) GROUP BY doc_id""".stripMargin,

    // full-outer snapshot diff with per-column change classification
    "x_snapshot_diff" ->
      """WITH oldv AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 13 <> 0),
        |newv AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice * 1.1, 2)
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |j AS (SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
        |    o.o_orderstatus AS os, n.o_orderstatus AS ns,
        |    o.o_totalprice AS op, n.o_totalprice AS np
        |  FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey),
        |c AS (SELECT coalesce(ko, kn) AS o_orderkey,
        |    CASE WHEN ko IS NULL THEN 'added'
        |         WHEN kn IS NULL THEN 'removed'
        |         WHEN os IS DISTINCT FROM ns OR op IS DISTINCT FROM np
        |           THEN 'changed' END AS change_type,
        |    concat_ws(',',
        |      CASE WHEN os IS DISTINCT FROM ns THEN 'o_orderstatus' END,
        |      CASE WHEN op IS DISTINCT FROM np THEN 'o_totalprice' END) AS cc
        |  FROM j)
        |SELECT o_orderkey, change_type,
        |  CASE WHEN change_type = 'changed' THEN cc END AS changed_cols
        |FROM c WHERE change_type IS NOT NULL""".stripMargin,

    // per-source p05/p95 winsorization; bounds rounded before the clamp
    "x_winsorize" ->
      """WITH base AS (SELECT doc_id, source AS stratum,
        |    CAST(n_chars AS DOUBLE) AS x FROM documents),
        |bounds AS (SELECT stratum AS ws,
        |    round(quantile_cont(x, 0.05), 6) AS lo,
        |    round(quantile_cont(x, 0.95), 6) AS hi
        |  FROM base WHERE x IS NOT NULL GROUP BY stratum)
        |SELECT doc_id, stratum, x, lo, hi,
        |  least(greatest(x, lo), hi) AS x_wins
        |FROM base LEFT JOIN bounds b ON base.stratum IS NOT DISTINCT FROM b.ws""".stripMargin,

    // sorted-neighborhood blocking + Jaro-Winkler verify: DuckDB's own
    // jaro_winkler_similarity vs the native Spark expression — two
    // independent comparator implementations agreeing on the rounded score
    "x_jw_resolve" ->
      """WITH base AS (SELECT c_custkey AS id, substr(md5(c_name), 1, 16) AS name
        |  FROM customer),
        |dirty AS (SELECT id + 10000000 AS id,
        |    substr(name, 1, p - 1) || substr(name, p + 1) AS name
        |  FROM (SELECT id, name, (id % 14) + 2 AS p FROM base)),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
        |ranked AS (SELECT id, name, substr(name, 1, 1) AS b,
        |  row_number() OVER (PARTITION BY substr(name, 1, 1)
        |                     ORDER BY name, id) AS r FROM u),
        |cand AS (SELECT a.id AS id_a, a.name AS na, c.id AS id_b, c.name AS nb
        |  FROM ranked a JOIN ranked c
        |  ON a.b = c.b AND c.r BETWEEN a.r + 1 AND a.r + 5)
        |SELECT id_a, id_b, round(jaro_winkler_similarity(na, nb), 6) AS jw
        |FROM cand WHERE round(jaro_winkler_similarity(na, nb), 6) >= 0.9""".stripMargin,

    // binary multinomial NB (label: lang = en): one counting pass trains,
    // lmScore-shaped join scores; priors from document counts
    "x_nb_classify" ->
      s"""WITH toks AS (SELECT doc_id, lang, $TOK AS tk FROM documents
         |  WHERE text IS NOT NULL AND lang IS NOT NULL),
         |dt AS (SELECT doc_id, tok, count(*) AS occ FROM
         |  (SELECT doc_id, unnest(tk) AS tok FROM toks) GROUP BY doc_id, tok),
         |cl AS (SELECT tok,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
         |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cn
         |  FROM (SELECT lang, unnest(tk) AS tok FROM toks) GROUP BY tok),
         |tot AS (SELECT CAST(sum(cp) AS DOUBLE) AS Tp, CAST(sum(cn) AS DOUBLE) AS Tn,
         |  CAST(count(*) AS DOUBLE) AS V FROM cl),
         |pr AS (SELECT ln(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) /
         |  sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)) AS prior FROM toks),
         |lr AS (SELECT tok, ln((cp + 0.1) / (Tp + 0.1 * (V + 1))) -
         |    ln((cn + 0.1) / (Tn + 0.1 * (V + 1))) AS lr
         |  FROM cl CROSS JOIN tot)
         |SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |  round(prior + sum(lr * occ), 6) AS log_odds,
         |  (round(prior + sum(lr * occ), 6) > 0) AS pred
         |FROM dt JOIN lr USING (tok) CROSS JOIN pr GROUP BY doc_id, prior""".stripMargin,

    // 3-iteration batch-GD logistic regression, trajectory unrolled with
    // the Spark side's rounding discipline (per-row sigmoid, gradient, and
    // weight all rounded to 6 dp); sigma(0) = 0.5 exactly at iteration 1
    "x_logreg" ->
      s"""WITH f AS MATERIALIZED (SELECT doc_id,
         |    1.0 AS x0, len(tk) / 100.0 AS x1,
         |    round(CAST(len(list_filter(tk, x -> list_contains($EN_STOPS, x))) AS DOUBLE)
         |      / greatest(len(tk), 1), 4) AS x2,
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
         |  FROM (SELECT doc_id, lang, $TOK AS tk FROM documents
         |        WHERE text IS NOT NULL AND lang IS NOT NULL)),
         |ga AS MATERIALIZED (SELECT round(avg((0.5 - y) * x0), 6) AS g0,
         |  round(avg((0.5 - y) * x1), 6) AS g1,
         |  round(avg((0.5 - y) * x2), 6) AS g2 FROM f),
         |wa AS MATERIALIZED (SELECT round(-0.5 * g0, 6) AS a0,
         |  round(-0.5 * g1, 6) AS a1, round(-0.5 * g2, 6) AS a2 FROM ga),
         |pb AS MATERIALIZED (SELECT doc_id, x0, x1, x2, y,
         |  round(1 / (1 + exp(-(a0 * x0 + a1 * x1 + a2 * x2))), 6) AS p
         |  FROM f CROSS JOIN wa),
         |gb AS MATERIALIZED (SELECT round(avg((p - y) * x0), 6) AS g0,
         |  round(avg((p - y) * x1), 6) AS g1,
         |  round(avg((p - y) * x2), 6) AS g2 FROM pb),
         |wb AS MATERIALIZED (SELECT round(a0 - 0.5 * g0, 6) AS b0,
         |  round(a1 - 0.5 * g1, 6) AS b1, round(a2 - 0.5 * g2, 6) AS b2
         |  FROM wa CROSS JOIN gb),
         |pc AS MATERIALIZED (SELECT doc_id, x0, x1, x2, y,
         |  round(1 / (1 + exp(-(b0 * x0 + b1 * x1 + b2 * x2))), 6) AS p
         |  FROM f CROSS JOIN wb),
         |gc AS MATERIALIZED (SELECT round(avg((p - y) * x0), 6) AS g0,
         |  round(avg((p - y) * x1), 6) AS g1,
         |  round(avg((p - y) * x2), 6) AS g2 FROM pc),
         |wc AS MATERIALIZED (SELECT round(b0 - 0.5 * g0, 6) AS c0,
         |  round(b1 - 0.5 * g1, 6) AS c1, round(b2 - 0.5 * g2, 6) AS c2
         |  FROM wb CROSS JOIN gc)
         |SELECT doc_id,
         |  round(1 / (1 + exp(-(c0 * x0 + c1 * x1 + c2 * x2))), 6) AS score,
         |  (round(1 / (1 + exp(-(c0 * x0 + c1 * x1 + c2 * x2))), 6) >= 0.5) AS pred
         |FROM f CROSS JOIN wc""".stripMargin,

    // the auto-sized form derives nlist from the corpus count EXACTLY as
    // the operator does (max(1, ceil(n/34)) in integer arithmetic), so the
    // oracle tracks every SF — at sf0.01 (540 vectors) it lands on the
    // same nlist=16 as x_semdedup; at sf0.1 it grows with the corpus
    "x_semdedup_auto" ->
      s"""WITH $PLANTED_CTES, ${ivfChainCtes("corpus", kmeansIters = 2,
            nlistSql = "(SELECT GREATEST(1, (count(*) + 33) // 34) FROM corpus)")}dup AS (
         |  SELECT DISTINCT a.vec_id FROM asgF a JOIN asgF b
         |  ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.99)
         |SELECT s.vec_id, CAST(s.centroid_id AS BIGINT) AS centroid_id
         |FROM asgF s WHERE s.vec_id NOT IN (SELECT vec_id FROM dup)""".stripMargin,

    "x_semdedup" ->
      s"""WITH $PLANTED_CTES, ${ivfChainCtes("corpus", kmeansIters = 2, nlist = 16)}dup AS (
         |  SELECT DISTINCT a.vec_id FROM asgF a JOIN asgF b
         |  ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= 0.99)
         |SELECT s.vec_id, CAST(s.centroid_id AS BIGINT) AS centroid_id
         |FROM asgF s WHERE s.vec_id NOT IN (SELECT vec_id FROM dup)""".stripMargin
  )
}

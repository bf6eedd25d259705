package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash of a token array in one native pass — the signature is
  * bit-identical to [[graft.ext.DedupOps.simhash]] (and to the DuckDB
  * oracle's md5-nibble form): per DISTINCT token, md5 once; hex digit j/4,
  * bit j%4 votes ±1 on signature bit j; a bit is set iff its vote sum is
  * positive. The first 8 hex chars of an md5 are its first 4 bytes, so the
  * per-token value is read straight from the digest without hex formatting.
  *
  * This exists for pure-map contexts (the streaming near-dup path): the
  * higher-order-function formulation of the same signature runs interpreted
  * lambdas per token×bit (~2 k rows/s); this loop is the [[SrpBandKeys]]
  * pattern applied to text. The batch [[graft.ext.DedupOps.simhash]] keeps
  * its codegen explode+aggregate form.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // per-thread digest: getInstance is a JCA provider lookup, too costly
  // per row; ThreadLocal because one deserialized expression instance can
  // serve several local-mode tasks concurrently
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // UTF8String has value equals/hashCode — no per-token String conversion
    val seen = new java.util.HashSet[AnyRef](math.max(16, n * 2))
    val votes = new Array[Int](32)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          md.reset()
          val d = md.digest(tok.getBytes)
          // first 4 digest bytes == first 8 hex chars, big-endian
          val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var j = 0
          while (j < 32) {
            // hex digit j/4 is nibble (7 - j/4) of hv; bit j%4 within it
            val bitpos = 28 - j + 2 * (j % 4)
            if (((hv >> bitpos) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaro-Winkler similarity in [0, 1] as one native pass — the classic
  * record-linkage comparator (Winkler 1990): Jaro similarity (matches
  * within a ⌊max(|a|,|b|)/2⌋−1 window, half-counted transpositions) plus
  * the prefix boost ℓ·0.1·(1−jaro) for a common prefix ℓ ≤ 4, applied only
  * when jaro > 0.7. Either side empty scores 0 (NOT 1 for two empties) —
  * the DuckDB `jaro_winkler_similarity` convention, verified case-by-case,
  * so oracles compare the raw double.
  *
  * Unlike edit distance, JW is asymmetric-length-tolerant and
  * prefix-weighted — the right comparator for person/street names where
  * FastSS's fixed edit budget under-matches long strings. It complements
  * the [[graft.operators.FuzzyJoin]] tiers: blocking produces candidate
  * pairs, this expression verifies them map-side.
  *
  * CodegenFallback with a primitive-loop eval (the [[DotProduct]]
  * rationale): the per-row cost is the O(|a|·window) flag scan, not
  * dispatch; the two scratch arrays are thread-local to keep the hot loop
  * allocation-free at any candidate-pair volume. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  // scratch match flags, grown geometrically; ThreadLocal because one
  // deserialized expression instance can serve several local-mode tasks
  @transient private lazy val scratch =
    ThreadLocal.withInitial[Array[Array[Boolean]]](() =>
      Array(new Array[Boolean](64), new Array[Boolean](64)))

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val b = r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    JaroWinkler.similarity(a, b, scratch.get())
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Pure computation, shared by the expression and the spec's reference
    * checks. `scratch` supplies two reusable flag arrays (may be null for
    * one-off calls). */
  private[functions] def similarity(a: String, b: String,
                                    scratch: Array[Array[Boolean]]): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val sc = if (scratch == null) Array(new Array[Boolean](la), new Array[Boolean](lb))
             else scratch
    if (sc(0).length < la) sc(0) = new Array[Boolean](math.max(la, sc(0).length * 2))
    if (sc(1).length < lb) sc(1) = new Array[Boolean](math.max(lb, sc(1).length * 2))
    val ma = sc(0); val mb = sc(1)
    java.util.Arrays.fill(ma, 0, la, false)
    java.util.Arrays.fill(mb, 0, lb, false)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var k = 0; var halfT = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    // rapidfuzz/DuckDB FLOOR the half-count (classic Winkler keeps the .5);
    // verified against jaro_winkler_similarity over 4000 random pairs
    val t = halfT / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    while (p < math.min(4, math.min(la, lb)) && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** One-off form (spec/reference use). */
  private[graft] def similarity(a: String, b: String): Double =
    similarity(a, b, null)
}

/** Unicode NFC normalization — the canonicalisation pass a multilingual
  * dedup pipeline MUST run before hashing: "é" arrives both precomposed
  * (U+00E9) and decomposed (e + U+0301), and every downstream content
  * hash, shingle, and fingerprint treats them as different documents
  * unless the corpus is normalized first. Spark has no built-in; this is
  * the ICU-free JDK normalizer as a native expression (CodegenFallback —
  * one library call per row; a Scala UDF would add Row boxing on top).
  * The DuckDB oracle is utf8proc's independent `nfc_normalize` — two
  * implementations of the Unicode standard agreeing. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType

  override def nullSafeEval(s: Any): Any = {
    val in = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost every
    // real-corpus string is already NFC — skip the rewrite (and the
    // UTF8String re-encode) for them
    if (java.text.Normalizer.isNormalized(in, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy longest-match subword segmentation of ONE word over a fixed
  * piece vocabulary — the tokenizer-inference pass (WordPiece-style; BPE
  * inference reduces to the same form once the merge table is flattened
  * into its implied piece vocabulary) that turns the whitespace-token
  * proxy counts into TRUE subword counts for packing and budget math.
  * At each position the longest vocab piece matching the remaining suffix
  * is taken; when none matches, the single character itself is emitted
  * (the byte-fallback analogue), so segmentation is total, deterministic,
  * and engine-portable — the DuckDB oracle re-implements the same
  * greedy rule as a recursive CTE over a VALUES vocabulary and must agree
  * piece-for-piece.
  *
  * Input: one word (the [[graft.ext.TextOps.tokens]] stream — [a-z0-9]+,
  * so with single characters in the vocabulary the fallback never fires
  * in practice). Output: array of pieces, concat = input (except under
  * `byteFallback`, below).
  *
  * `byteFallback = true` (SentencePiece's byte-fallback convention): a
  * position where NO vocab piece matches — not even the single code
  * point — emits the code point's UTF-8 bytes as `<0xXX>` pieces instead
  * of the raw character. With the 256 byte pieces implicitly always
  * representable, segmentation is TOTAL over arbitrary UTF-8 with any
  * vocabulary (the property a real multilingual corpus needs: the
  * single-char fallback otherwise declares every unseen CJK/Cyrillic
  * code point a "piece" of its own, which no downstream vocabulary id
  * space contains). Off by default: the fixture surfaces lock the
  * raw-char form.
  *
  * Fully CODEGEN'd (not CodegenFallback — this expression sits on every
  * subword-path row): doGenCode emits a direct call to [[encode]] on the
  * plan-referenced instance, so inside WholeStageCodegen the input
  * UTF8String flows straight into the primitive loop with no per-row
  * InternalRow boxing and no eval() dispatch (the costs the fallback
  * wrapper pays). The loop itself keeps the O(1) HashSet probe per
  * candidate length (the [[SimHash32]] rationale): per-word cost is
  * O(len · maxPieceLen) probes, independent of vocabulary size — a
  * 32k-piece production vocabulary costs the same per row as the test
  * fixture. The vocabulary is a constructor constant (driver-shipped once
  * per task like a broadcast literal), NOT a per-row child expression. */
case class BpeEncode(child: Expression, vocab: Seq[String],
                     byteFallback: Boolean = false)
    extends UnaryExpression {

  require(vocab.nonEmpty, "bpe_encode: vocabulary must not be empty")
  require(vocab.distinct.size == vocab.size,
    "bpe_encode: vocabulary contains duplicate pieces")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  @transient private lazy val pieceSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  // piece lengths are measured in CODE POINTS (the unit DuckDB's
  // substr/length use), so the greedy rule agrees cross-engine even when
  // vocabulary pieces carry non-BMP characters
  @transient private lazy val maxPieceLen: Int =
    vocab.map(p => p.codePointCount(0, p.length)).max

  /** Public (called from generated code): one word in, its pieces out.
    * Positions are CODE POINTS — the ASCII token contract takes the
    * unit==point fast path; non-ASCII input (the SQL surface, the unicode
    * tokenizer) is segmented on code-point boundaries so a surrogate pair
    * is never split and the greedy rule matches the DuckDB oracle's
    * code-point substr. */
  def encode(v: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val tok = v.toString
    val n = tok.length
    var ascii = true
    var k = 0
    while (ascii && k < n) { if (tok.charAt(k) >= 128) ascii = false; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(4, n / 2))
    if (ascii) {
      var pos = 0
      while (pos < n) {
        var l = math.min(maxPieceLen, n - pos)
        while (l > 1 && !pieceSet.contains(tok.substring(pos, pos + l))) l -= 1
        // l == 1: a vocab piece or the fallback — the raw character, or
        // under byteFallback its UTF-8 byte pieces when it's unknown
        val piece = tok.substring(pos, pos + l)
        if (l == 1 && byteFallback && !pieceSet.contains(piece))
          BpeEncode.emitBytePieces(piece, out)
        else out += org.apache.spark.unsafe.types.UTF8String.fromString(piece)
        pos += l
      }
    } else {
      // code-point start offsets (one extra slot holding n, so the slice
      // [starts(p), starts(p + l)) is valid for the final piece too)
      val cps = tok.codePointCount(0, n)
      val starts = new Array[Int](cps + 1)
      var i = 0
      var c = 0
      while (i < n) {
        starts(c) = i
        i += Character.charCount(tok.codePointAt(i))
        c += 1
      }
      starts(c) = n
      var pos = 0
      while (pos < cps) {
        var l = math.min(maxPieceLen, cps - pos)
        while (l > 1 &&
          !pieceSet.contains(tok.substring(starts(pos), starts(pos + l)))) l -= 1
        val piece = tok.substring(starts(pos), starts(pos + l))
        if (l == 1 && byteFallback && !pieceSet.contains(piece))
          BpeEncode.emitBytePieces(piece, out)
        else out += org.apache.spark.unsafe.types.UTF8String.fromString(piece)
        pos += l
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  // the 256 byte pieces, SentencePiece spelling ("<0xAB>", uppercase hex),
  // built once per JVM — fallback emission is table lookups, no formatting
  private val bytePieces: Array[org.apache.spark.unsafe.types.UTF8String] =
    (0 until 256).map(b => org.apache.spark.unsafe.types.UTF8String
      .fromString(f"<0x$b%02X>")).toArray

  /** Append the UTF-8 byte pieces of `piece` (one code point) to `out`. */
  private[functions] def emitBytePieces(piece: String,
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val bs = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bs.length) { out += bytePieces(bs(i) & 0xff); i += 1 }
  }
}

/** Rank-ordered BPE merge inference of ONE word over a fixed RANKED merge
  * table (Sennrich et al. 2016 applied as learned): the word starts as
  * single characters and every merge rule is applied in rank order, one
  * left-to-right skip pass per rank — a matched (a, b) consumes BOTH
  * symbols ("aaa" + (a,a) → [aa, a]). The semantics of
  * [[graft.ext.TextOps.bpeApplyMerges]]'s delimited-string fold, as a
  * native expression: one JVM pass per rank over a symbol array instead
  * of allocating a rewritten string per rank (~8× on the declared query),
  * with rule sides interned so the per-position check is two reference
  * probes. Fully codegen'd via the [[BpeEncode]] reference-object call.
  *
  * The merge table is a constructor constant (driver-shipped once per
  * task); per-row cost is O(ranks × word length) — intrinsic to
  * rank-order fidelity (each rank must see the previous rank's symbols).
  * BpeSpec locks bit-equality with the delimited-string fold, which
  * remains the form the DuckDB oracle replays. */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "bpe_apply_merges: merge table must be non-empty")
  require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty },
    "bpe_apply_merges: merge sides must be non-empty")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  // LOCAL canonical symbol table (not String.intern(): the JVM-global
  // intern table is a contended native hash — a probe per non-ASCII
  // character would be a hot-path lock the moment multilingual input
  // reaches this expression). Every symbol the encoder can produce — rule
  // sides, merge products, ASCII single chars — is pre-seeded to ONE
  // canonical instance, so the per-position rule match is reference
  // equality. ConcurrentHashMap because one deserialized expression
  // instance can serve several local-mode tasks; symbols not seeded
  // (non-ASCII single code points at the SQL surface) canonicalise on
  // first sight, bounded by the input's distinct code points.
  @transient private lazy val symTab
      : java.util.concurrent.ConcurrentHashMap[String, String] = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, String](
      merges.size * 4 + 300)
    (0 until 128).foreach { c =>
      val s = String.valueOf(c.toChar); m.put(s, s)
    }
    merges.foreach { case (a, b) =>
      m.putIfAbsent(a, a); m.putIfAbsent(b, b)
      val ab = a + b; m.putIfAbsent(ab, ab)
    }
    m
  }
  // rule sides resolved through the canonical table
  @transient private lazy val rules: Array[(String, String, String)] =
    merges.map { case (a, b) =>
      (symTab.get(a), symTab.get(b), symTab.get(a + b))
    }.toArray
  // canonical ASCII single-char fast path (no map probe per character on
  // the [a-z0-9] token contract)
  @transient private lazy val charTab: Array[String] =
    (0 until 128).map(c => symTab.get(String.valueOf(c.toChar))).toArray

  /** Public (called from generated code): one word in, its pieces out.
    * Symbols are CODE POINTS, not UTF-16 units — a non-BMP character is
    * one symbol, matching [[graft.ext.TextOps.bpeMergeFold]] / the DuckDB
    * oracle, whose regexp '(.)' consumes one code point (a surrogate
    * split here would diverge on astral-plane input). */
  def encode(v: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val tok = v.toString
    var n = tok.codePointCount(0, tok.length)
    val syms = new Array[String](n)
    var i = 0
    var ci = 0
    while (ci < tok.length) {
      val cp = tok.codePointAt(ci)
      val w = Character.charCount(cp)
      syms(i) =
        if (cp < 128) charTab(cp)
        else {
          val s = tok.substring(ci, ci + w)
          val prev = symTab.putIfAbsent(s, s)
          if (prev == null) s else prev
        }
      i += 1
      ci += w
    }
    var r = 0
    while (r < rules.length && n > 1) {
      val (a, b, ab) = rules(r)
      // left-to-right skip pass, in place: read cursor i, write cursor w
      var w = 0; i = 0
      while (i < n) {
        if (i < n - 1 && (syms(i) eq a) && (syms(i + 1) eq b)) {
          syms(w) = ab; i += 2
        } else { syms(w) = syms(i); i += 1 }
        w += 1
      }
      n = w
      r += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(syms(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref =
      ctx.addReferenceObj("bpeApply", this, classOf[BpeApplyMerges].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** 32-bit SimHash of a token array (see [[SimHash32]]); distinct-ness is
    * handled inside the expression. */
  def simhash32(toks: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(toks)))

  /** Jaro-Winkler similarity of two string columns (see [[JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Unicode NFC canonicalisation (see [[NfcNormalize]]). */
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(
      ColumnBridge.expression(s.cast("string"))))

  /** Greedy longest-match subword segmentation of one word over a fixed
    * piece vocabulary (see [[BpeEncode]]); `byteFallback = true` emits
    * `<0xXX>` UTF-8 byte pieces where no piece (not even the single code
    * point) is in the vocabulary. */
  def bpeEncode(word: Column, vocab: Seq[String],
                byteFallback: Boolean = false): Column =
    ColumnBridge.column(BpeEncode(
      ColumnBridge.expression(word.cast("string")), vocab, byteFallback))

  /** Rank-ordered BPE merge inference of one word over a fixed ranked
    * merge table (see [[BpeApplyMerges]]). */
  def bpeApplyMerges(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeApplyMerges(
      ColumnBridge.expression(word.cast("string")), merges))
}

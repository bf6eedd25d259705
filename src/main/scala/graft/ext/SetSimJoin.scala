package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Jaccard-threshold set-similarity self-join via prefix filtering
  * (the AllPairs/PPJoin family: Chaudhuri et al., ICDE'06; Bayardo et al.,
  * WWW'07). The exact complement to the MinHash-LSH path in [[DedupOps]]:
  * LSH is probabilistic (a true pair can miss every band), this join is
  * provably complete for `jaccard >= theta` — the form to reach for when a
  * dedup or linkage decision must not have false negatives.
  *
  * Why it scales where the naive form cannot: the naive exact join is an
  * all-pairs comparison (a disguised cross join — at 100 TB, game over).
  * Prefix filtering orders every element by ascending global document
  * frequency (rarest first) and keeps, per set x, only its first
  * `|x| - ceil(theta*|x|) + 1` elements. Any pair with Jaccard >= theta
  * shares an element inside BOTH prefixes (pigeonhole on the required
  * overlap `ceil(theta*max(|x|,|y|))`, using `|y| >= theta*|x|` which
  * Jaccard >= theta implies), so an equi-join on prefix elements loses
  * nothing — and because prefixes are each set's RAREST elements, the join
  * buckets are the smallest-frequency tail of the element distribution.
  * A size filter (`theta*|x| <= |y| <= |x|/theta`) prunes asymmetric
  * candidates before verification; only surviving candidate pairs pay the
  * exact intersection.
  *
  * Physical shape: one shuffle for the document-frequency aggregate, one
  * frequency join back (keyed on element), one per-set aggregate, one
  * prefix equi-join, map-side verification on the joined per-set arrays.
  * No stage is quadratic in the corpus; the candidate join carries the
  * [[graft.operators.FuzzyJoin]] maxBucket convention — a prefix element
  * shared by more than `maxBucket` sets raises loudly inside the consumed
  * join key (empty in any legal run, so the guard rides a broadcast left
  * join), because a hot prefix element is the cross-join failure mode that
  * low-entropy corpora (identical boilerplate everywhere) would otherwise
  * hit silently.
  */
object SetSimJoin {

  /** @param elems  exploded (doc_id, elem) rows, distinct per document
    *               (e.g. [[TextOps.explodeShingles]] output)
    * @param theta  Jaccard threshold in (0, 1]
    * @return (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    *         to 4 decimals, exactly the pairs with Jaccard >= theta
    */
  def selfJoin(elems: DataFrame, theta: Double,
               maxBucket: Int = 100000): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0, 1], got $theta")
    require(maxBucket > 0, "maxBucket must be positive")

    // global rarity order: ascending doc frequency, element text as the
    // deterministic tiebreak (any TOTAL order works for completeness; this
    // one minimises candidate counts and reproduces bit-for-bit anywhere)
    val df = elems.groupBy("elem").agg(count(lit(1)).as("__df"))

    // per-set sorted element array (rarest first) + set size — the struct
    // sort keys on (__df, elem), matching the order the prefix is cut from
    val sets = elems.join(df, "elem")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("__df"), col("elem"))))
             .as("__ord"),
           count(lit(1)).as("sz"))
      .select(col("doc_id"),
        transform(col("__ord"), x => x.getField("elem")).as("set"),
        col("sz"))

    // prefix = the first |x| - ceil(theta|x|) + 1 rarest elements
    val prefixLen = (col("sz") - ceil(col("sz") * lit(theta)) + 1).cast("int")
    val prefix = sets
      .select(col("doc_id"), col("sz"),
        explode(slice(col("set"), lit(1), prefixLen)).as("elem"))

    // hot-prefix-element guard: the offending set is empty in any legal
    // run, so the check is a broadcast left join, never a second shuffle
    val hot = prefix.groupBy("elem").agg(count(lit(1)).as("__psz"))
      .where(col("__psz") > maxBucket)
    val guarded = prefix.join(broadcast(hot), Seq("elem"), "left")
      .withColumn("elem",
        when(col("__psz").isNull, col("elem")).otherwise(raise_error(concat(
          lit(s"SetSimJoin: prefix element shared by more than " +
            s"maxBucket=$maxBucket sets — a disguised cross join; use " +
            "higher-entropy elements (longer shingles) or raise maxBucket; " +
            "group size = "), col("__psz").cast("string")))))
      .drop("__psz")

    // candidate generation: prefix equi-join + symmetric size filter
    // (Jaccard >= theta forces theta*|x| <= |y| <= |x|/theta)
    val a = guarded.select(col("elem"), col("doc_id").as("doc_a"),
      col("sz").as("__sza"))
    val b = guarded.select(col("elem").as("__elem_b"),
      col("doc_id").as("doc_b"), col("sz").as("__szb"))
    val cands = a.join(b,
        col("elem") === col("__elem_b") && col("doc_a") < col("doc_b") &&
          col("__szb") * lit(theta) <= col("__sza") &&
          col("__sza") * lit(theta) <= col("__szb"))
      .select("doc_a", "doc_b").distinct()

    // exact verification on the two per-set arrays — map-side after the
    // two 1:1 set joins; only candidates pay this, never all pairs
    val verified = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("__sa"),
        col("sz").as("__na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("__sb"),
        col("sz").as("__nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("__na"), col("__nb"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long")
          .as("__ni"))
      .withColumn("__j",
        col("__ni") / (col("__na") + col("__nb") - col("__ni")).cast("double"))
      .where(col("__j") >= theta)
    verified.select(col("doc_a"), col("doc_b"),
      round(col("__j"), 4).as("jaccard"))
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage for entity resolution: find pairs of records whose
  * names are within a small edit distance — the xref/cross-reference
  * discipline of investigative-data platforms (the reference lake's
  * entities carry exactly such name keys, cf.
  * `ftm_datalake/make.py` entity generation) and the entity-level
  * near-dup step of training-data pipelines (author/site dedup).
  *
  * Candidate generation is FastSS/SymSpell-style DELETION-NEIGHBORHOOD
  * blocking (Bocek et al. 2007, "Fast Similarity Search in Large
  * Dictionaries"): every string emits its ≤`maxDist`-deletion variants as
  * block keys; two strings within Levenshtein distance `d` share at least
  * one variant in their depth-`d` neighborhoods, so the blocking is
  * COMPLETE — the result is exactly "all pairs within `maxDist`", not a
  * recall heuristic. This matters on low-entropy keys: prefix/suffix
  * blocking degenerates into one hot block on id-styled names
  * (`Customer#000000042`), while deletion variants stay near-unique.
  *
  * 100 TB shape: variants are generated scan-side (array expression +
  * explode, all codegen'd built-ins) and exchanged as
  * (xxhash64(variant), id, name) — ONE full-data exchange whose row count
  * is (len+1)·rows at depth 1. Buckets are collected per variant hash and
  * pair-generated locally (no shuffle self-join); per-bucket blowup is
  * bounded by `bucketCeiling` with a loud failure naming the remedy
  * (collapse exact duplicates first — [[Dedup.exact]] — exactly as
  * FastSS prescribes a dictionary, not a multiset). Verification is the
  * banded 3-arg `levenshtein` (O(len·maxDist) per candidate, codegen'd);
  * the final DISTINCT runs over verified pairs only. A 64-bit variant-hash
  * collision creates a spurious CANDIDATE that verification then drops —
  * it can never corrupt the result.
  */
object Linkage {

  /** Name normalization for matching: lower, collapse whitespace, trim.
    * The same expression is one line of ANSI SQL for the oracle. */
  def normalizeName(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** All single-character deletions of `v` (empty string has none). */
  private def del1(v: Column): Column =
    when(length(v) > lit(0),
      transform(sequence(lit(1), length(v)),
        i => concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v) - i))))
      .otherwise(array().cast("array<string>"))

  /** The ≤`depth`-deletion neighborhood of `nm` (including `nm` itself),
    * distinct, as an array column. Depth 1 ⇒ len+1 variants; depth 2 ⇒
    * O(len²/2) — the documented FastSS index-size trade. */
  def deletionVariants(nm: Column, depth: Int): Column = {
    require(depth >= 1 && depth <= 2,
      s"deletion-neighborhood depth $depth outside [1,2]: depth tracks " +
        "maxDist, and edit distances > 2 need a different blocking " +
        "(q-gram / LSH) — the variant count grows as len^depth")
    var frontier = array(nm)
    var all = frontier
    for (_ <- 1 to depth) {
      frontier = array_distinct(flatten(transform(frontier, v => del1(v))))
      all = concat(all, frontier)
    }
    array_distinct(all)
  }

  /** (id, nm, vh) variant emission for one side: null ids/names dropped
    * (a null key can match nothing), names normalized unless disabled. */
  private def variantSide(df: DataFrame, idCol: String, nameCol: String,
                          maxDist: Int, normalize: Boolean): DataFrame = {
    val nm0 = if (normalize) normalizeName(col(nameCol)) else col(nameCol)
    df.filter(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), nm0.as("nm"))
      .select(col("id"), col("nm"),
        explode(deletionVariants(col("nm"), maxDist)).as("v"))
      .select(col("id"), col("nm"), xxhash64(col("v")).as("vh"))
  }

  private def ceilingGuard(recs: Column, ceiling: Int, what: String): Column =
    assert_true(size(recs) <= ceiling,
      concat(lit(s"graft fuzzy-match $what overflow: one deletion variant " +
          s"is shared by "), size(recs),
        lit(s" records (> bucketCeiling=$ceiling); pair generation would " +
          "be quadratic in one task. Collapse exact-duplicate names first " +
          "(Dedup.exact) or raise bucketCeiling deliberately.")))

  /** Self-match: all pairs (id_a < id_b) whose names are within `maxDist`
    * Levenshtein edits. Output `(id_a, id_b, dist)`, one row per pair.
    * Complete (not approximate) — see the object doc for why deletion
    * blocking guarantees this. */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 maxDist: Int = 1, normalize: Boolean = true,
                 bucketCeiling: Int = 1000): DataFrame = {
    val variants = variantSide(df, idCol, nameCol, maxDist, normalize)
    val buckets = variants
      .groupBy("vh")
      .agg(collect_list(struct(col("id"), col("nm"))).as("recs"))
      .filter(size(col("recs")) > 1)
      .withColumn("__guard", ceilingGuard(col("recs"), bucketCeiling, "bucket"))
      .filter(col("__guard").isNull).drop("__guard")
    // local (i<j by position) pair generation: two positional explodes —
    // per-bucket work is C(d,2) with d ≤ bucketCeiling, no second shuffle
    val pairs = buckets
      .select(col("recs"), posexplode(col("recs")).as(Seq("pi", "a")))
      .select(col("pi"), col("a"), posexplode(col("recs")).as(Seq("pj", "b")))
      .filter(col("pi") < col("pj") && col("a.id") =!= col("b.id"))
    val lo = when(col("a.id") <= col("b.id"), col("a")).otherwise(col("b"))
    val hi = when(col("a.id") <= col("b.id"), col("b")).otherwise(col("a"))
    // banded verify BEFORE the distinct, so the dedup exchange carries
    // only true matches (candidates outnumber matches ~len-fold)
    pairs
      .select(lo.getField("id").as("id_a"), hi.getField("id").as("id_b"),
        levenshtein(lo.getField("nm"), hi.getField("nm"), maxDist)
          .cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** Cross-corpus match (the `Against` form of the family): every
    * (new_id, ref_id, dist) with distance ≤ `maxDist`. The reference side
    * is collapsed into a variant-hash index (one exchange, ceiling-guarded
    * buckets); the new side exchanges once on the same key; AQE broadcasts
    * the index when the reference is dictionary-sized. */
  def fuzzyMatchAgainst(newDf: DataFrame, reference: DataFrame,
                        idCol: String, nameCol: String,
                        maxDist: Int = 1, normalize: Boolean = true,
                        bucketCeiling: Int = 1000): DataFrame = {
    val newV = variantSide(newDf, idCol, nameCol, maxDist, normalize)
      .withColumnsRenamed(Map("id" -> "new_id", "nm" -> "new_nm"))
    val refIndex = variantSide(reference, idCol, nameCol, maxDist, normalize)
      .groupBy("vh")
      .agg(collect_list(struct(col("id"), col("nm"))).as("recs"))
      .withColumn("__guard", ceilingGuard(col("recs"), bucketCeiling, "index"))
      .filter(col("__guard").isNull).drop("__guard")
    newV.join(refIndex, "vh")
      .select(col("new_id"), col("new_nm"), explode(col("recs")).as("r"))
      .select(col("new_id"), col("r.id").as("ref_id"),
        levenshtein(col("new_nm"), col("r.nm"), maxDist)
          .cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }
}

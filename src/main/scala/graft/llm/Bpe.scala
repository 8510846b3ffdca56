package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (the Sennrich et al. 2016
  * algorithm GPT-2/Llama-family tokenizers descend from) — the missing
  * piece between [[TextAnalysis.tokenCount]]'s whitespace estimate and a
  * real training pipeline's subword token accounting.
  *
  * Split of labor for 100 TB:
  *  - [[train]] reduces the corpus to its WORD-FREQUENCY table first —
  *    one partial-agg exchange, the [[Corpus.vocabulary]] shuffle — and
  *    runs the greedy merge loop driver-side over that table (the
  *    standard formulation: merge counts depend only on word
  *    frequencies, never on document boundaries, so the driver works on
  *    ≤ `maxWords` rows no matter how many petabytes produced them).
  *  - [[encode]] broadcasts the learned merge ranks inside a compiled
  *    expression ([[graft.expressions.GraftExpressions.BpeEncode]]) —
  *    encoding is a map-only projection inside the scan stage, zero
  *    shuffle, whole-stage-codegen friendly.
  *
  * Conventions: words are whitespace-split (the span-family discipline;
  * compose with [[TextAnalysis.normalizeText]] upstream for folding);
  * each word becomes its character symbols plus a final `</w>`
  * end-of-word symbol, so learned pieces distinguish "low…" from
  * "…low" — the classic formulation. Ties in pair counts break to the
  * lexicographically smallest pair: training is fully deterministic,
  * bit-identical on any partitioning.
  */
object Bpe {

  /** End-of-word symbol appended to every word's symbol sequence. */
  val EndOfWord = "</w>"

  /** A trained BPE model: the ordered merge rules. Rank = priority —
    * encode always applies the lowest-rank applicable merge first. */
  case class Model(merges: Seq[(String, String)]) {
    def size: Int = merges.length
    /** Distinct pieces reachable from the merges (the learned subword
      * vocabulary beyond single characters). */
    def pieces: Seq[String] = merges.map { case (a, b) => a + b }.distinct
  }

  /** Learn `numMerges` BPE merges from the corpus.
    *
    * The corpus collapses to its word-frequency table (one exchange),
    * capped at the `maxWords` most frequent words (freq desc, word asc —
    * deterministic boundary; Zipf makes the tail irrelevant to merge
    * counts). The driver-side loop then repeatedly merges the most
    * frequent adjacent symbol pair; cost is O(numMerges · Σ|word|) over
    * the capped table, independent of corpus size. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000): Model = {
    require(numMerges >= 0 && maxWords > 0)
    val wordFreq: Array[(String, Long)] = df
      .select(explode(
        when(trim(col(textCol)) === "", array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(wordFreq.toSeq, numMerges)
  }

  /** The driver-side greedy merge loop, exposed for testing and for
    * callers that already hold a word-frequency table. */
  def trainFromWordCounts(wordFreq: Seq[(String, Long)],
                          numMerges: Int): Model = {
    // each word as a mutable symbol buffer; frequency carried alongside.
    // Kernels.bpeWordSymbols is THE shared word→symbols convention, so a
    // trained model always reproduces its decomposition at encode time.
    var vocab: Array[(Array[String], Long)] = wordFreq.map { case (w, f) =>
      (graft.expressions.Kernels.bpeWordSymbols(w).toArray, f)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        var best: (String, String) = null
        var bestN = -1L
        counts.forEach { (pair, n) =>
          if (n > bestN || (n == bestN &&
              (pair._1 < best._1 ||
                (pair._1 == best._1 && pair._2 < best._2)))) {
            best = pair; bestN = n
          }
        }
        merges += best
        val merged = best._1 + best._2
        vocab = vocab.map { case (syms, f) =>
          if (!hasPair(syms, best)) (syms, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, f)
          }
        }
        r += 1
      }
    }
    val out = merges.result()
    // The encode kernel's rank table is putIfAbsent, so a DUPLICATE merge
    // pair would replay at its earliest rank while training applied it
    // again at the later round — encode could then diverge from the
    // trained decomposition. A pair can only re-form when a later merge
    // of multi-char symbols reconstructs it (e.g. 'a'+'bc' reachable
    // after 'ab'+'c' was merged away) — a pathological vocabulary. Fail
    // loudly instead of silently assuming train/encode equivalence.
    require(out.distinct.length == out.length,
      s"BPE training emitted a duplicate merge pair: " +
        out.groupBy(identity).collectFirst {
          case (p, occ) if occ.length > 1 => p }.get)
    Model(out)
  }

  private def hasPair(syms: Array[String], p: (String, String)): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == p._1 && syms(i + 1) == p._2) return true
      i += 1
    }
    false
  }

  /** Add `outCol` = the array of BPE pieces of `textCol` (each word's
    * pieces in order, end-of-word symbol merged as trained). Map-only:
    * the ranks ride inside the compiled expression. */
  def encode(df: DataFrame, textCol: String, model: Model,
             outCol: String = "pieces"): DataFrame =
    df.withColumn(outCol,
      graft.expressions.GraftExpressions.bpeEncode(col(textCol), model.merges))

  /** Lossless inverse of [[encode]]: concatenate each word's pieces (a
    * word closes at the trained `</w>` end-of-word symbol) and join
    * words with single spaces — so `decode(encode(text))` equals the
    * whitespace-normalized text for ANY model, trained or partial
    * (merges only regroup characters inside a word; they never create
    * or destroy them). That identity is the tokenizer-integrity gate
    * the `bpe_roundtrip` oracle checks end-to-end: a merge that leaked
    * across a word boundary, dropped a character, or misplace the
    * end-of-word symbol breaks it on some document. Map-only column
    * work, zero shuffle. (Degenerate caveat, documented: text
    * containing the literal symbol `</w>` would decode with it
    * space-replaced.) */
  def decode(df: DataFrame, piecesCol: String,
             outCol: String = "decoded"): DataFrame =
    df.withColumn(outCol,
      trim(regexp_replace(array_join(col(piecesCol), ""), EndOfWord, " ")))

  /** Add `outCol` = the subword token COUNT of `textCol` under the
    * model — the real-token-budget upgrade over
    * [[TextAnalysis.subwordCountEstimate]]. Count-only kernel: the
    * merge loop runs but no piece array or per-piece strings are
    * materialized (the corpus-accounting hot path). */
  def tokenCount(df: DataFrame, textCol: String, model: Model,
                 outCol: String = "n_bpe_tokens"): DataFrame =
    df.withColumn(outCol,
      graft.expressions.GraftExpressions.bpeCount(col(textCol), model.merges))

  /** Persist a model as a DataFrame (rank, left, right) — write it as
    * parquet next to the corpus it was trained on. */
  def modelToDF(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Rehydrate a model persisted with [[modelToDF]]. */
  def modelFromDF(df: DataFrame): Model =
    Model(df.select("rank", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq)
}

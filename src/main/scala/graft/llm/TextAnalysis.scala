package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data pipelines.
  *
  * Everything here is a pure `Column` expression (codegen'd, no UDF): at
  * 100 TB these run inside the parquet scan stage with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-boundary pieces + long-word
    * splits (a deterministic proxy for tokenizer cost, no vocab needed). */
  def subwordCountEstimate(text: Column, pieceLen: Int = 4): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / pieceLen).cast("long"))

  // ------------------------------------------------------------ quality
  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
        .cast("double") / length(text))

  /** Fraction of characters that are uppercase letters. */
  def upperRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[A-Z]", "")))
        .cast("double") / length(text))

  /** Fraction of alphabetic characters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[A-Za-z]", "")))
        .cast("double") / length(text))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this")

  /** Fraction of tokens that are stopwords — a classic fluency signal. */
  def stopwordRatio(text: Column, stops: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => lower(t).isin(stops: _*))).cast("double")
        / size(toks))
  }

  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double")
        / size(toks))
  }

  /** Composite quality score in [0,1]: length, stopword presence, casing and
    * punctuation sanity. Deterministic, documented, tunable weights. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val upperOk = when(upperRatio(text) < 0.3, 1.0).otherwise(0.0)
    round((lenScore * 0.4 + stopScore * 0.3 + punctOk * 0.15 + upperOk * 0.15), 6)
  }

  // ------------------------------------------------ line-level repetition
  /** Gopher-style LINE repetition signals (the line-granular complement
    * of [[repetitionStats]]' n-gram fractions): a struct of
    *
    *  - `n_lines`: newline-split line count (≥ 1 by split semantics),
    *  - `dup_line_frac`: fraction of lines that repeat an earlier line
    *    (`(n − distinct) / n`),
    *  - `dup_char_frac`: fraction of line characters belonging to
    *    repeat occurrences (`(Σ chars − Σ distinct-line chars) / Σ`).
    *
    * Pure column work over the line array — scan-stage, zero shuffle,
    * rounded to 6 places for cross-engine stability. */
  def lineStats(text: Column): Column = {
    val lines = split(text, "\n")
    val distinctLines = array_distinct(lines)
    val nl = size(lines)
    val chars = aggregate(lines, lit(0L), (a, x) => a + length(x))
    val dchars = aggregate(distinctLines, lit(0L), (a, x) => a + length(x))
    struct(
      nl.as("n_lines"),
      round((nl - size(distinctLines)).cast("double") / nl, 6)
        .as("dup_line_frac"),
      when(chars === 0, lit(0.0))
        .otherwise(round((chars - dchars).cast("double") / chars, 6))
        .as("dup_char_frac"))
  }

  // ----------------------------------------------- Gopher document gate
  /** The 8 "required words" of the Gopher stop-word rule. */
  val gopherRequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher/MassiveText document-level quality rules (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", §A1.1) as a struct of per-rule booleans plus the
    * composite `keep`:
    *
    *  - `wordcount_ok`: 50 ≤ words ≤ 100 000 (whitespace tokens)
    *  - `mean_len_ok`:  3 ≤ mean word length ≤ 10
    *  - `symbol_ok`:    (hash + ellipsis) / words ≤ 0.1
    *  - `bullet_ok`:    < 90% of lines start with a bullet (•, -, *)
    *  - `ellipsis_ok`:  ≤ 30% of lines end with an ellipsis (... or …)
    *  - `alpha_ok`:     ≥ 80% of words contain an alphabetic character
    *  - `stopword_ok`:  ≥ 2 distinct of the 8 required stop words occur
    *  - `keep`:         all of the above
    *
    * Pure column expressions over the token and line arrays — zero
    * shuffle, scan-stage work, and boolean-only output so cross-engine
    * comparison never touches float formatting. Empty/blank text fails
    * `wordcount_ok` (and every ratio rule is defined false at 0 words
    * rather than dividing by zero). */
  def gopherFlags(text: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): Column = {
    val toks = tokens(text)
    val nw = size(toks)
    val nwD = nw.cast("double")
    val lines = split(text, "\n")
    val nlD = size(lines).cast("double")
    val wordcountOk = nw >= minWords && nw <= maxWords
    val mwl = meanWordLength(text)
    val meanLenOk = nw > 0 && mwl >= minMeanLen && mwl <= maxMeanLen
    // '#' count + non-overlapping '...' count + '…' count, per the
    // paper's "symbol-to-word ratio" (hash or ellipsis)
    val hashes = length(text) - length(translate(text, "#", ""))
    val dots = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val uniEll = length(text) - length(translate(text, "…", ""))
    val symbolOk = nw > 0 &&
      (hashes + dots + uniEll).cast("double") / nwD <= maxSymbolRatio
    val bulletFrac = size(filter(lines,
      l => ltrim(l).rlike("^[•*-]"))).cast("double") / nlD
    val bulletOk = bulletFrac < maxBulletFrac
    val ellipsisFrac = size(filter(lines,
      l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nlD
    val ellipsisOk = ellipsisFrac <= maxEllipsisFrac
    val alphaOk = nw > 0 &&
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nwD >=
        minAlphaFrac
    val stopHits = gopherRequiredStops.map(sw =>
      when(exists(toks, t => lower(t) === sw), 1).otherwise(0))
      .reduce(_ + _)
    val stopwordOk = stopHits >= minStopHits
    struct(
      wordcountOk.as("wordcount_ok"), meanLenOk.as("mean_len_ok"),
      symbolOk.as("symbol_ok"), bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"), alphaOk.as("alpha_ok"),
      stopwordOk.as("stopword_ok"),
      (wordcountOk && meanLenOk && symbolOk && bulletOk && ellipsisOk &&
        alphaOk && stopwordOk).as("keep"))
  }

  /** Filter facade: rows passing every Gopher rule. */
  def gopherGate(df: org.apache.spark.sql.DataFrame,
                 textCol: String): org.apache.spark.sql.DataFrame =
    df.filter(gopherFlags(col(textCol)).getField("keep"))

  // ------------------------------------------------- C4 line-level clean
  /** C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", §2.2): keep only lines that end in terminal
    * punctuation (. ! ? ") AND carry at least `minLineWords` words;
    * drop the whole page when it has fewer than `minKeptLines`
    * surviving lines, contains a curly brace (code), or contains the
    * "lorem ipsum" placeholder. Returns the input columns plus
    * `n_lines_kept`, `keep`, and `clean_text` (surviving lines joined
    * with newlines — empty when none survive).
    *
    * Scan-stage column work only: the line split, the per-line word
    * count, and the joins all happen inside one projection — no
    * explode, no shuffle, nothing leaves the row. */
  def c4Clean(df: org.apache.spark.sql.DataFrame, textCol: String,
              minLineWords: Int = 5,
              minKeptLines: Int = 3): org.apache.spark.sql.DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(when(length(trim(l)) === 0, array().cast("array<string>"))
          .otherwise(split(trim(l), "\\s+"))) >= minLineWords)
    df.withColumn("n_lines_kept", size(kept))
      .withColumn("keep",
        col("n_lines_kept") >= minKeptLines &&
          !col(textCol).contains("{") &&
          !lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  // ------------------------------------------------------------ lang id
  /** Marker stopwords per language for the n-gram-free heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une"))

  /** Heuristic language ID: count marker-word hits per language, argmax with
    * alphabetical-first tie-break; no hits at all → "und" (undetermined).
    * A real system swaps in fastText/CLD — the engine surface (a derived
    * column over the documents table) is identical.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => lower(t).isin(markers: _*)))
    }
    val best = scores.foldLeft[Column](lit(null).cast("string")) {
      case (acc, (lang, score)) =>
        // earlier (alphabetically-first) languages win ties: strict > later
        val beatsAll = scores.filter(_._1 != lang).map {
          case (other, oscore) =>
            if (other < lang) score > oscore else score >= oscore
        }.reduce(_ && _)
        when(acc.isNull && beatsAll && score > 0, lit(lang)).otherwise(acc)
    }
    coalesce(best, lit("und"))
  }

  /** Count of characters matching a regex character class (chars, not
    * bytes — both engines' `length`/`regexp_replace` are code-point
    * aware): `len(text) − len(text with the class removed)`. */
  def charClassCount(text: Column, classPattern: String): Column =
    length(text) - length(regexp_replace(text, classPattern, ""))

  /** Per-document character-class / writing-system profile — the script
    * companion to the marker-word [[langId]] (which only speaks Latin
    * languages): counts of Latin letters, digits, whitespace, Han
    * ideographs, and other non-ASCII, plus a dominant-`script` label by
    * integer count comparison (han > latin → "han"; any latin →
    * "latin"; any non-ASCII remainder → "other"; else "none" — blank/
    * numeric-only docs). Mixed-script documents are a quality signal
    * (mojibake, spam) and a routing key for per-script tokenizers.
    *
    * Pure codegen'd column ops over each row — zero shuffle at any
    * scale. The character classes are in the Java-regex/RE2 common
    * subset (`\p{IsHan}` here ≡ `\p{Han}` in RE2 — oracle-checked on
    * real zh documents). */
  def scriptProfile(text: Column): Column = {
    val latin = charClassCount(text, "[A-Za-z]")
    val digit = charClassCount(text, "[0-9]")
    // explicit class, not \s: Java's \s includes vertical tab U+000B,
    // RE2's does not — the explicit list is identical in both engines
    val space = charClassCount(text, "[ \\t\\n\\u000B\\f\\r]")
    val han = charClassCount(text, "\\p{IsHan}")
    val ascii = charClassCount(text, "[\\x00-\\x7f]")
    val otherNonAscii = length(text) - ascii - han
    val script = when(han > latin, lit("han"))
      .when(latin > 0, lit("latin"))
      .when(otherNonAscii > 0, lit("other"))
      .otherwise(lit("none"))
    struct(latin.as("n_latin"), digit.as("n_digit"), space.as("n_space"),
      han.as("n_han"), otherNonAscii.as("n_other_nonascii"),
      script.as("script"))
  }

  // ----------------------------------------------------------- repetition
  /** Gopher-style repetition signals (the MassiveText quality-filter
    * family): a struct of duplicate-n-gram fraction `(total−distinct)/
    * total` and top-n-gram fraction `max_count/total` for n ∈ {1,2,3}
    * over the whitespace token stream. ONE compiled pass per document
    * ([[graft.expressions.GraftExpressions.RepetitionStats]]) — per-doc
    * state is document-local, so at 100 TB this computes inside the scan
    * stage with zero shuffle; the relational explode/groupBy formulation
    * is the correctness oracle, not the engine. Texts with fewer than n
    * tokens score 0.0 for that n. */
  def repetitionStats(text: Column): Column =
    graft.expressions.GraftExpressions.repetitionStats(text)

  /** High-repetition filter predicate: true when every repetition signal
    * is at or below its threshold (Gopher rejects above). */
  def repetitionOk(text: Column, maxDupUnigram: Double = 0.6,
                   maxTopBigram: Double = 0.4): Column = {
    val r = repetitionStats(text)
    r.getField("dup_unigram_frac") <= maxDupUnigram &&
      r.getField("top_bigram_frac") <= maxTopBigram
  }

  // -------------------------------------------------------------- chunking
  /** Split documents into overlapping fixed-size token chunks — the
    * standard embedding/training chunker: chunks of `size` tokens
    * advancing by `size − overlap`, the final chunk possibly short, a
    * chunk fully contained in its predecessor never emitted. Compiled
    * single-pass kernel + generator explode: at 100 TB the chunk rows are
    * born inside the scan stage partition-locally — no shuffle until
    * whatever consumes them. Returns (id, chunk_index, chunk, n_tokens). */
  def chunkDocuments(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, size: Int = 512,
                     overlap: Int = 64): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        posexplode(graft.expressions.GraftExpressions
          .wordChunks(col(textCol), size, overlap))
          .as(Seq("chunk_index", "chunk")))
      .withColumn("n_tokens", tokenCount(col("chunk")).cast("long"))

  /** Per-language corpus token statistics — the tokenizer-fertility table
    * multilingual corpus reports are built from (docs, whitespace tokens,
    * BPE-ish subword estimate, characters, and subwords-per-token
    * fertility for each [[langId]]-predicted language). Integer sums are
    * exact; the one ratio is computed from them at the end and null when a
    * language bucket has no tokens at all.
    *
    * One scan, one partial-aggregated exchange over the bounded language
    * domain (|langMarkers|+1 groups) — at 100 TB the map side reduces
    * every partition to ≤5 rows before anything moves. */
  def tokenStatsByLang(df: org.apache.spark.sql.DataFrame,
                       textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    df.groupBy(langId(t).as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(t).cast("long")).as("n_tokens"),
        sum(subwordCountEstimate(t)).as("n_subwords"),
        sum(length(t).cast("long")).as("n_chars"))
      .withColumn("fertility",
        when(col("n_tokens") > 0,
          round(col("n_subwords").cast("double") / col("n_tokens"), 6)))
  }

  /** Confusion matrix of [[langId]] predictions against a ground-truth
    * label column — the heuristic's own evaluation harness (run it on
    * any labeled slice before trusting langid gates on a new corpus):
    * one row per (label, prediction) pair with its count and the row's
    * share of that label (exact counts, ratio derived at the end).
    * Single scan, one partial-agg exchange over the bounded
    * label×prediction domain. */
  /** Per-LINE language mixture (the Dolma-style refinement of the
    * doc-level [[langId]]): predict each non-blank line's language and
    * roll up per document — (n_lines, dominant_lang, n_dominant,
    * mixed_frac). Web documents routinely interleave languages
    * (navigation chrome, quotes, code comments); a doc-level vote hides
    * that, while `mixed_frac` = share of lines disagreeing with the
    * dominant language is the filter signal monolingual-corpus recipes
    * cut on. Dominance ties break to the lexicographically smallest
    * language (deterministic); documents with no non-blank lines carry
    * no signal and drop (the surprisal empty-doc discipline).
    *
    * Scale shape: one scan + line explode, a (doc, lang) partial-agg
    * exchange, and a per-doc window over ≤ |language domain| aggregated
    * rows (bounded — never raw lines); the ratio derives from the two
    * exact counts at the end. */
  def langIdLines(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val lines = df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
    val perLang = lines
      .groupBy(col("doc_id"), langId(col("line")).as("lang_pred"))
      .agg(count(lit(1)).as("cnt"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    perLang
      .withColumn("__rn", row_number().over(
        wDoc.orderBy(col("cnt").desc, col("lang_pred"))))
      .withColumn("n_lines", sum("cnt").over(wDoc))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("n_lines"),
        col("lang_pred").as("dominant_lang"),
        col("cnt").as("n_dominant"),
        round((col("n_lines") - col("cnt")).cast("double") /
          col("n_lines"), 6).as("mixed_frac"))
  }

  def langIdConfusion(df: org.apache.spark.sql.DataFrame, textCol: String,
                      labelCol: String): org.apache.spark.sql.DataFrame = {
    val counts = df
      .groupBy(col(labelCol).as("label"), langId(col(textCol)).as("pred"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
    counts.withColumn("label_share",
      round(col("n").cast("double") / sum("n").over(w), 6))
  }

  // ------------------------------------------------------------ fingerprint
  /** Canonical content fingerprint: md5 over the sorted distinct token bag.
    * Robust to word order and repetition — the standard "fingerprint"
    * normalization for entity/document matching. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " "))

  /** Rolling hash over the token stream (order-sensitive complement to
    * [[fingerprint]]): rotate-left-5 ⊕ tokenhash per step. Pure bitwise ops
    * — no arithmetic overflow under ANSI mode, deterministic at any scale. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => {
      val rot = call_function("shiftleft", acc, lit(5))
        .bitwiseOR(call_function("shiftrightunsigned", acc, lit(59)))
      rot.bitwiseXOR(xxhash64(w))
    })

  // --------------------------------------------------------- normalization
  /** Canonical text normalization for dedup/fingerprint front-ends:
    * lowercase → strip everything outside `[a-z0-9 ]` → collapse runs of
    * whitespace → trim. Pure built-in column ops (codegen'd, engine-
    * portable regexes), deterministic at any scale. Aggressive by design —
    * accented characters drop rather than fold, which is the documented
    * trade-off of the ASCII-class approach. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** C4-style HTML-to-text for crawled corpora: drop script/style
    * subtrees, comments, then every remaining tag; decode the six
    * entities that actually occur at scale (`&lt; &gt; &quot; &#39;
    * &apos; &nbsp;`, with `&amp;` LAST so `&amp;lt;` correctly decodes
    * to the literal text `&lt;`); collapse whitespace. A heuristic
    * regex pass, not a parser — the standard trade for web-scale
    * preprocessing (malformed markup degrades to extra whitespace, and
    * numeric entities beyond `&#39;` pass through). Pure codegen'd
    * column ops in the RE2/Java common subset, zero shuffle, identical
    * expressions in the DuckDB oracle. */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val amp = regexp_replace(entities, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** URL canonicalization for URL-level dedup / domain rollups:
    * lowercase the scheme+authority (path and query case preserved),
    * strip the fragment, a leading `www.`, default ports (`:80` on
    * http, `:443` on https), and tracking parameters (`utm_*`,
    * `fbclid`), then repair the separators those removals orphan and
    * trim trailing slashes. One fixed sequence of RE2/Java-common
    * regex rewrites — no lookarounds (RE2 has none), group references
    * written `$n` here and `\n` in the DuckDB oracle (the two engines'
    * replacement syntaxes) — scan-side, zero shuffle. Non-URL input
    * passes through with only the generic cleanups.
    *
    * Userinfo (`user:pass@host`) is rare in corpus URLs and gets the
    * heuristic treatment: the port-strip patterns skip over it (an
    * optional `[^/@?#]*@` prefix, so `u:p@host:443` and `u:p@host`
    * canonicalize together), but the authority lowering folds its case
    * along with the host's — technically lossy (userinfo is
    * case-sensitive per RFC 3986) and accepted here like the other
    * documented trades: for dedup keys, folding two case-variant
    * spellings of the same credential is the useful direction. */
  def canonicalizeUrl(url: Column): Column = {
    val t = trim(url)
    val lowered = concat(
      lower(regexp_extract(t, "(?i)^(https?://[^/?#]*)", 1)),
      regexp_replace(t, "(?i)^https?://[^/?#]*", ""))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noWww = regexp_replace(noFrag, "^(https?://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww,
        "^(https://(?:[^/@?#]*@)?[^/:?#]*):443([/?#]|$)", "$1$2"),
      "^(http://(?:[^/@?#]*@)?[^/:?#]*):80([/?#]|$)", "$1$2")
    val noTrack = regexp_replace(noPort,
      "([?&])(utm_[a-z]+|fbclid)=[^&#]*", "$1")
    val sep1 = regexp_replace(noTrack, "\\?&", "?")
    val sep2 = regexp_replace(sep1, "&&+", "&")
    val sep3 = regexp_replace(sep2, "[?&]+$", "")
    regexp_replace(sep3, "/+$", "")
  }

  /** PII masking for training corpora: emails → `<EMAIL>`, dotted-quad
    * IPs → `<IP>`, standalone runs of ≥7 digits (phone/account numbers) →
    * `<NUM>`, applied in that order so an IP's octets are not re-masked
    * as numbers. The patterns are the common-denominator RE2/Java subset,
    * so the DuckDB oracle runs the identical expressions. */
  def maskPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{7,}\\b", "<NUM>")
  }

  // ------------------------------------------------------------- sampling
  /** Deterministic content-hash sampling predicate for corpus mixing:
    * keep a row iff the first 8 hex chars of `md5(key)` sort below the
    * rate's hex threshold. Reproducible across engines, partitionings,
    * and runs (no RNG, no per-partition seeds); sampling is by CONTENT,
    * so identical documents land on the same side of the cut — the
    * behavior corpus-mixing pipelines want. Lexicographic hex comparison
    * is exactly uniform, and the same predicate is one line of ANSI SQL
    * for the oracle. */
  def sampleByHash(key: Column, rate: Double): Column = {
    require(rate >= 0 && rate <= 1, s"rate $rate out of [0,1]")
    val threshold = f"${math.round(rate * 0xffffffffL)}%08x"
    substring(md5(key), 1, 8) < lit(threshold)
  }

  /** Weighted corpus-mixing predicate: a per-stratum [[sampleByHash]]
    * rate (training-data "mixture weights" as DOWN-sampling; up-weighting
    * is replication, a different op). Strata not named in `rates` keep
    * `defaultRate`. Pure column expression — the mixture applies inside
    * the scan with zero shuffle, deterministically by content, so
    * identical documents land on the same side of every cut and the
    * same predicate is plain ANSI SQL for the oracle. Rates nest: a
    * stratum's 0.5 sample strictly contains its 0.25 sample (same
    * monotone property as [[sampleByHash]]). */
  def mixCorpus(stratum: Column, key: Column, rates: Map[String, Double],
                defaultRate: Double = 1.0): Column =
    rates.toSeq.sortBy(_._1).foldLeft(sampleByHash(key, defaultRate)) {
      case (acc, (name, rate)) =>
        when(stratum === name, sampleByHash(key, rate)).otherwise(acc)
    }
}

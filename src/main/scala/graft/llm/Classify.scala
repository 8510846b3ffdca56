package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable text classification for corpus curation: the
  * fasttext-style quality/domain/topic gate of large-scale pipelines
  * (CCNet, GPT-3's WebText classifier, FineWeb-Edu) as a multinomial
  * Naive Bayes trained and scored entirely relationally — no MLlib, no
  * driver-side vectors, both phases plain aggregations Catalyst plans.
  *
  * Scores are computed in INTEGER micro-log units (each model weight is
  * `round(ln(·) · 10⁴)` as int64): per-document score sums are exact
  * integer arithmetic, so results are independent of partitioning and
  * addition order — a float log-prob sum would be run- and
  * engine-dependent in the last ulps, unverifiable against any oracle.
  * The quantization error (≤ 5·10⁻⁵ per term) is orders below the
  * log-prob gaps that decide a class.
  *
  * The smoothed likelihood `ln((cnt+1)/(tot_c+V))` is carried as the
  * algebraically equal `oov_c + ln(cnt+1)` with `oov_c = −ln(tot_c+V)`:
  * a document's score is `prior_c + n_tok·oov_c + Σ_matched ln(cnt+1)`,
  * so the model table only stores tokens SEEN in class c (the natural
  * sparse form) and out-of-vocabulary tokens cost exactly the smoothing
  * floor without a per-label anti-join.
  *
  * 100 TB shape: training is two exchanges over (label, token) /
  * (label) aggregates — model size is vocab·labels, not corpus. Scoring
  * explodes tokens scan-side, joins the sparse weight table on token
  * (AQE broadcasts a dictionary-sized model), and partial-aggregates
  * per (doc, label); the per-doc argmax is ONE `max(struct(...))`
  * aggregate with map-side combine and a pinned smallest-label
  * tie-break. The two driver-side scalars (N docs, vocab size V) are
  * bounded single-row collects.
  */
object Classify {

  /** Shared tokenization: lower, split on non-alphanumeric runs, drop
    * empties. Deliberately the common RE2/Java regex subset so the
    * DuckDB oracle tokenizes identically. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > lit(0))

  /** `round(ln(x)·10⁴)` as int64 — the model's fixed-point log unit.
    * Both engines round half away from zero; ln is irrational on every
    * input we feed it, so the boundary is never hit exactly. */
  private def microLog(x: Column): Column =
    round(log(x) * lit(10000d)).cast("long")

  /** Trained model: `tokenWeights` = (label, tok, w) for tokens seen in
    * the class (w = round(ln(cnt+1)·10⁴)); `labelStats` = (label,
    * prior_q, oov_q) with prior_q = round(ln(n_c/N)·10⁴), oov_q =
    * round(−ln(tot_c+V)·10⁴). */
  final case class NbModel(tokenWeights: DataFrame, labelStats: DataFrame)

  /** Train multinomial NB with Laplace smoothing over `(labelCol,
    * textCol)` rows. Labels must be integral; rows with null label or
    * text are ignored. */
  def nbTrain(labeled: DataFrame, labelCol: String,
              textCol: String): NbModel = {
    val base = labeled
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(labelCol).cast("long").as("label"),
        tokens(col(textCol)).as("toks"))
    val tok = base.select(col("label"), explode(col("toks")).as("tok"))
    val counts = tok.groupBy("label", "tok").agg(count(lit(1)).as("cnt"))
    val weights = counts.select(col("label"), col("tok"),
      microLog(col("cnt") + lit(1)).as("w"))
    // bounded driver scalars: corpus doc count and vocabulary size
    val nDocs = base.count()
    require(nDocs > 0, "graft nbTrain: empty training set")
    val vocab = tok.select("tok").distinct().count()
    val labelStats = base.groupBy("label")
      .agg(count(lit(1)).as("n_docs"))
      .join(tok.groupBy("label").agg(count(lit(1)).as("tot")), Seq("label"))
      .select(col("label"),
        microLog(col("n_docs").cast("double") / lit(nDocs.toDouble))
          .as("prior_q"),
        (lit(0L) - microLog(col("tot") + lit(vocab))).as("oov_q"))
    NbModel(weights, labelStats)
  }

  /** Per-(doc, label) scores in micro-log units: `prior_q + n_tok·oov_q
    * + Σ_matched w`. Every candidate label appears for every doc. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: NbModel): DataFrame = {
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("toks"))
    // labels are a bounded domain — the cross join is broadcast-scalar
    val floor = base
      .select(col("__id"), size(col("toks")).cast("long").as("n_tok"))
      .crossJoin(broadcast(model.labelStats))
      .select(col("__id"), col("label"),
        (col("prior_q") + col("n_tok") * col("oov_q")).as("base_q"))
    val matched = base
      .select(col("__id"), explode(col("toks")).as("tok"))
      .join(model.tokenWeights, Seq("tok"))
      .groupBy("__id", "label")
      .agg(sum(col("w")).as("delta_q"))
    floor.join(matched, Seq("__id", "label"), "left")
      .select(col("__id"), col("label"),
        (col("base_q") + coalesce(col("delta_q"), lit(0L))).as("score_q"))
  }

  /** Argmax classification: `(idCol, pred_label, score)` with the
    * smallest label winning exact ties (integer scores make the tie
    * test exact, not float-fuzzy). */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
                 model: NbModel): DataFrame =
    nbScore(docs, idCol, textCol, model)
      .groupBy("__id")
      .agg(max(struct(col("score_q"), (lit(0L) - col("label")).as("negl"),
        col("label"))).as("m"))
      .select(col("__id").as(idCol), col("m.label").as("pred_label"),
        col("m.score_q").as("score"))
}

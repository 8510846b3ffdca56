package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale evidence behind "designed for 100 TB": run the
  * dedup/LSH/text/rebuild/scan-agg query family at sf0.1 and at a
  * synthesized ~10× copy of it, and report the time ratios. A linear-path
  * query should cost ≤~12× at 10× data (linear work + scheduling
  * overhead); anything super-linear is a scale bug, not noise.
  *
  * The 10× corpus is NOT naive replication — that would be a trap, not a
  * probe: 10 verbatim copies of every document give each doc 10 exact
  * duplicates, so near-dup PAIR OUTPUT (and the inverted-index bucket
  * work behind it) grows quadratically in the copy count and the probe
  * would measure output explosion, not engine scaling. Instead each copy
  * k shifts ids by k·10⁷ and mutates content deterministically:
  *
  *   - documents: per-copy consonant/vowel rotation (`translate`) — the
  *     planted intra-copy near-dups survive untouched, while cross-copy
  *     shingle overlap drops below every dedup threshold;
  *   - embeddings: per-copy circular dimension rotation + hash-derived
  *     sign flips (deterministic, no RNG; norms and intra-copy geometry
  *     exactly preserved) — cross-copy cosine decorrelates (pure scaling
  *     would NOT work: cosine is scale-invariant);
  *   - lineitem: key shift only (scan-agg queries group by flags, so the
  *     group count is scale-free, as at real scale).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleBench
  * [srcDir] [workDir] [copies]"` — prints one JSON line; see
  * SCALEPROBE.md for reviewed results.
  */
object ScaleBench {

  val Offset = 10000000L

  /** The probe family: every linear-path query whose input tables the
    * synthesizer scales (documents / embeddings / lineitem). */
  val ProbeQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q6_forecast_revenue",
    "dedup_exact", "dedup_jaccard_pairs", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_pairs", "ann_cosine_topk",
    "text_tokens", "text_quality", "text_langid", "text_repetition",
    "dedup_spans", "decontam_hits",
    // per-benchmark attribution: same (hash, id) exchange shape as
    // decontam_hits with bench ids riding — expect ~decontam_hits
    "decontam_by_source", "ann_ivf_pq_topk",
    "a6_keep_latest", "u2_snapshot_diff",
    "pack_sequences", "vocab_top", "corpus_split", "doc_length_hist",
    "tfidf_keywords", "ev_asof_join", "ev_range_join",
    "dedup_strip_spans", "text_surprisal", "bpe_tokens",
    "text_gopher_gate", "text_line_stats", "text_c4_clean",
    "text_bigram_surprisal", "dedup_simhash_incremental",
    "corpus_budget_select", "text_importance",
    // round-10 additions: the substring-window exchange is the heaviest
    // new shuffle shape in the tree (hot windows concentrate by design),
    // the stratified sample must show O(k·strata) — not stratum-sorted —
    // growth; both were PlanShape-asserted but unprobed until round 11
    "dedup_substring", "corpus_stratified_sample",
    // round-11 additions: the against-index probe, the iterative-closure
    // operator (checkpointed pair list + O(log D) rounds), the
    // derived-marginal collocation scan, the data-derived mixture cut,
    // and the broadcast label-margin sweep
    "dedup_substring_incremental", "dedup_components",
    // star-compressed closure maintenance: pair generation dominates;
    // the incremental closure itself converges in O(1) rounds
    "dedup_components_incremental", "text_collocations",
    "corpus_temperature_mix", "emb_label_margin", "emb_knn_vote",
    "text_strip_html", "text_url_canonical", "corpus_report",
    // round-12 additions: the r11 probe straggler (its relational
    // span-text overflow join is the shape that most wants a probe) and
    // the per-group-k weighted sampler (must show O(Σk) — not
    // stratum-sorted — growth like its uniform sibling)
    "dedup_strip_spans_incremental", "corpus_stratified_weighted",
    // round-12 session-2 additions: the linkage family's candidate volume
    // tracks (len+1)·rows with near-unique buckets (the probe must show
    // pair output and wall both ~linear — customer ids shift per copy so
    // cross-copy names differ in >2 digits and stay unmatched), the NB
    // classifier is two agg exchanges + a sparse join, and the decontam
    // coverage join is the decontam_hits shape plus a scan-side total
    "link_fuzzy_pairs", "link_fuzzy_against", "text_nb_classify",
    "decontam_overlap",
    // round-12 session-3 additions: heavy hitters must show the bounded-
    // sketch exchange staying flat while the corpus grows (its whole
    // reason to exist vs vocab_top), drift rides one token-domain
    // exchange, and the ngram diversity exchange tracks the distinct
    // n-gram domain (sublinear in a real corpus, translate-inflated in
    // this probe like text_collocations)
    "vocab_heavy_hitters", "corpus_drift", "text_ngram_diversity",
    // scan-side projections — expected ~linear wall, zero exchange
    "emb_random_projection", "text_script_profile",
    // broadcast-query scored scan: wall tracks corpus×queries; queries
    // held fixed (vec_id < 100 spans only copy 0), so expected ~linear
    "emb_hard_negatives",
    // the phrase-mining sketch works the larger bigram domain — eviction
    // churn grows with unique-gram arrivals, amortized O(1)/row
    "vocab_heavy_bigrams",
    // three sketch scans + a counter-set merge whose input is ≤ 3·cap
    // rows at ANY corpus size — the merge cost must stay flat
    "vocab_sketch_merge",
    // BM25 postings join: candidates = Σ df over query terms. The query
    // set (doc_id % 25) grows linearly with copies, but the per-copy
    // translate rotation makes copy vocabularies disjoint, so each
    // copy's queries probe only that copy's postings — per-query work
    // stays flat; growth is the index-build stages (tokenize/tf/dfreq),
    // so expect sublinear wall (the fixed-query-log retrieval shape)
    "text_bm25_topk",
    // scan-side int8 quantization: ~linear wall, zero exchange
    "emb_scalar_quant",
    // BM25 serving form: the indexed base (4/5 of every id block) grows
    // with the corpus, the query batch is fixed copy-0 tail — same
    // sublinear fixed-query-log shape as text_bm25_topk
    "text_bm25_incremental",
    // coverage curve: the token-count exchange grows with the corpus
    // (translate-rotated vocab), the ranked window stays ≤ max(ks)
    "vocab_coverage",
    // HLL sketches: the slice exchange carries ≤ 16 KB per partial at
    // any corpus size; growth is the tokenize scan
    "vocab_distinct_sketch",
    // hybrid fusion: BM25 (fixed query log, sublinear) + dense cosine
    // over the growing corpus (broadcast queries) + a fixed-size fuse
    "text_hybrid_rrf",
    // eval metrics: the BM25 run grows sublinearly; the same-source
    // truth join grows with the corpus (25 → 250 docs per source)
    "retrieval_metrics",
    // merged halves must track the single-build cost (same subtrees ×2)
    "text_bm25_index_merge",
    // asymmetric SQ scan: broadcast queries over quantized corpus,
    // ~linear like ann_cosine
    "ann_sq_topk",
    // KLL sketches: per-row update cost, bounded exchange (the HLL
    // shape; compaction amortizes past the exact regime)
    "doc_len_quantile_sketch",
    // canonical-per-cluster: the components subtree tracks
    // dedup_components (pair-list growth); the selection itself only
    // shuffles the clustered slice on comp — expect ~the components
    // ratio, with the rank window flat per cluster
    "dedup_keep_representative",
    // bounded-domain (≤5 langs) rollup: partial agg collapses every
    // partition to ≤5 rows before the exchange — expect ~linear wall
    "text_token_stats_by_lang",
    // Bloom-routed exact dedup: sketch build is a scan + bounded-binary
    // exchange; the serve side routes ~half the new batch away from the
    // join scan-side — expect ~linear wall dominated by the two scans
    "dedup_exact_bloom",
    // baked-kernel assignment scan + one bounded (≤ nlist rows moved)
    // rollup exchange — expect ~linear wall
    "emb_cluster_profile",
    // assignment scan + O(k·nlist) TopKByKey exchange — expect ~linear
    // wall with flat output
    "emb_balanced_sample",
    // scan-side E-S priorities + TakeOrdered top-k: ~linear scan wall,
    // O(partitions·k) merge, flat output
    "corpus_weighted_sample",
    // train (word-freq reduce + driver merge loop over the bounded
    // vocab) + two map-only kernels — train dominates, ~flat with the
    // rotated-vocab inflation caveat of the bpe_tokens family
    "bpe_roundtrip",
    // one scan, 6 exact count-distincts through one Expand exchange,
    // 6-row stack — wall tracks the Expand (×cols data), ~linear
    "a8_table_profile",
    // bounded label×pred domain rollup + a ≤25-row share window
    "text_langid_confusion",
    // one orderkey repartition of the joined fact (3 cols) that the
    // (order,supplier) aggregate and the per-order windows both ride —
    // wall tracks that shuffle, ~linear; output capped at 100
    "q21_waiting_supplier",
    // Count–Min: the matrix exchange carries 256 KiB per partial at ANY
    // corpus size (the HLL shape); growth is the tokenize scan + one
    // md5 per occurrence
    "vocab_freq_sketch",
    // CCNet buckets: the text_surprisal shape plus a distinct-score
    // cumulative window (domain grows with docs — the documented exact-
    // mode cost; KLL mode is the bounded path) + broadcast assignment
    "text_perplexity_buckets",
    // PageRank: edge materialization + 5 x (src join + dst agg) over
    // the checkpointed list — expect ~linear wall in edges
    "graph_pagerank",
    // eval harness: dominated by the jaccard pair subtree (its ratio);
    // the scoring layers are pair-list-sized
    "dedup_eval",
    // label propagation: the pageRank shape with a bounded argmax
    // window per round — expect ~linear wall in edges
    "graph_label_prop",
    // funnel: two user-keyed joins over type-pruned event slices —
    // expect ~linear wall (per-copy user universes stay disjoint)
    "ev_funnel",
    // calendar anchor: identical join shape, expect ~ev_funnel
    "ev_funnel_calendar",
    // ANN recall gate: the brute + IVF scan costs dominate (queries
    // fixed at copy-0 ids), metrics joins are |queries|·k-bounded
    "ann_recall",
    // VectorIndex build+extend+serve: map-only encodes + probe-pruned
    // serving — expect ~linear wall in corpus vectors
    "ann_ivf_incremental",
    // bitext margin: fixed src side, tgt side grows with the corpus —
    // expect ~linear wall in tgt vectors
    "emb_bitext_margin",
    // Heaps curve: scan + token-domain agg — expect ~linear in tokens
    "vocab_growth_curve",
    // served anomaly screen: stats + flag join — expect ~ev_anomaly
    "ev_anomaly_incremental",
    // prototypes: scan + (group, dim) partial agg — expect ~linear
    "emb_label_prototypes",
    // NCM classify: prototype subtree + broadcast argmax — ~linear
    "emb_prototype_classify",
    // rank normalize: domain histogram + join back — ~linear
    "ev_rank_normalize",
    // retention: two user rollups + a user join + a calendar-bounded
    // cell rollup — expect ~linear wall in events
    "ev_retention",
    // line-mixture: synthesis joins + line explode + (doc,lang) agg —
    // expect ~linear wall in docs
    "text_langid_lines",
    // MAD screen: the value-domain histogram grows with distinct
    // values; windows stay domain-sized — expect ~linear wall
    "ev_anomaly",
    // sketch drift: growth is the two sketch-build scans; the compare
    // itself is capacity-bounded at any corpus size
    "corpus_drift_sketch",
    // round-14 additions: the steady-state splits (each gate contains
    // its own full-recompute baseline by construction — read ratios
    // against the one-shot siblings), the certification audits, and
    // the quarter rung's month-spread retention.
    // CDF trained on the even-id half + serve join — ~ev_rank_normalize
    "ev_rank_normalize_incremental",
    // activity union+distinct + triangle — ~ev_retention
    "ev_retention_incremental",
    // month-spread quarter cohorts — ~ev_retention (domain stays
    // calendar-bounded)
    "ev_retention_quarter",
    // |keys|-sized state rollup + batch-sized window — both user-keyed
    // exchanges over disjoint per-copy user universes, expect ~linear
    "st_sessionize_incremental",
    // certification audits: brute truth scan + probed serve over a
    // FIXED 8-query md5 sample — ~ann_recall; serve + rebuild = two
    // index subtrees — ~2× text_bm25_index_merge
    "ann_certify", "text_bm25_certify",
    // the rollup ledger: bootstrap rollup + state join + batch window
    // + per-key max windows, all user-keyed — expect ~st_sessionize
    "st_sessions_incremental",
    // the funnel steady state: 8 pruned slices (4 per half) + K
    // user-keyed chase joins — expect ~2× ev_funnel
    "ev_funnel_incremental",
    // the conversion report: the funnel plan + K-row windows — expect
    // ~ev_funnel flat; the feed gate: a 3-state chain with two deltas —
    // expect ~2-3× ev_funnel_incremental by construction
    "ev_funnel_summary", "ev_funnel_conversions",
    // latency quantiles: the funnel plan + a latency-domain ride —
    // expect ~ev_funnel; growth accounting: one user-keyed window over
    // the |user×period| frame — expect ~ev_retention flat; hybrid
    // against: BM25 index build + EXHAUSTIVE (oracle-mode) dense serve —
    // expect ~text_bm25_topk + linear dense growth (production serves
    // prune with nprobe ≪ nlist)
    "ev_funnel_latency", "ev_growth_accounting", "text_hybrid_against",
    // the activity frame's third report (one period rollup — flat) and
    // the session-length ride (the st_sessionize exchange + a
    // gap-bounded domain window)
    "ev_stickiness", "st_session_durations", "ev_engagement_hist",
    // round-15 session-4: the mutation half of the lake layout. Each
    // gate pays the full write-layout-then-mutate-then-scan cycle by
    // construction (like layout_zorder_scan): expect ~linear wall in
    // events — the delete is one table pass, the live scan splits so
    // only tombstoned files join. layout_upsert rides orders (key
    // uniqueness); the snapshot/rollback gates build two generations
    "layout_delete_scan", "layout_takedown", "layout_upsert",
    "layout_time_travel", "layout_rollback",
    // bloom-manifest point lookup: the gate pays layout write + bloom
    // manifest build + delete + probe; the probe itself is
    // manifest-sized (one sketch row per file) and the data read is
    // the kept files only — expect the build stages ~linear, the
    // lookup flat
    "layout_point_lookup",
    // change data feed: two generation builds + a delete + the
    // (0,1]-window feed — feed cost is window-sized (here the window
    // IS half the table, so expect ~the other layout gates)
    "layout_changes",
    // the corpus takedown composition: documents laid out, retraction
    // list tombstoned, downstream lang rollup off the live scan —
    // expect ~linear in docs (layout write + one delete pass + scan)
    "doc_takedown_rollup",
    // round-16: the equal-frequency layout (one KLL sketch aggregate +
    // broadcast CDF + log-time rank per row — expect ~the equal-width
    // gate layout_zorder_scan) and retention-preserving compaction
    // (two generation builds + delete + fold: base rewrite is one pass
    // over the sub-floor rows, kept generations byte-copy — expect
    // ~the other two-generation gates)
    "layout_zorder_eqfreq", "layout_compact_retain_live",
    // CDC consumption: source build (two generations + delete) + feed
    // + replica bootstrap + keyed apply — the apply itself is one
    // replica-key pass + one feed pass; growth is the by-construction
    // builds (~the other two-generation gates). The streamed form adds
    // the drain machinery (checkpoint + one micro-batch) on top
    "layout_replica_apply", "layout_replica_apply_stream",
    // round-17: the version-pointer protocol. scan_under_compact and
    // vacuum pay the same build+delete+compact cycle as layout_compact
    // plus the pointer flip (commit IO is file-count-bounded) and, for
    // vacuum, the zero-grace sweep (driver file ops) — expect ~the
    // layout_compact shape. takedown_bloom pays the build + manifest
    // + the NARROWED delete (the delete half reads only kept files;
    // growth is the by-construction build — the isolated delete-only
    // evidence is graft.tools.MaintenanceProbe's). evolve_scan is two
    // generation builds + a metadata-only commit + the union scan
    "layout_scan_under_compact", "layout_vacuum",
    "layout_takedown_bloom", "layout_evolve_scan",
    // feed-driven index maintenance gates: by-construction source
    // builds dominate (two generations + takedown + feed); the apply
    // itself is one index pass + one feed pass — the isolated
    // 1%-delta evidence is MaintenanceProbe's
    "ann_feed_maintain", "text_bm25_feed_maintain")

  private def rotate(s: String, k: Int): String = {
    val n = ((k % s.length) + s.length) % s.length
    s.drop(n) + s.take(n)
  }

  def synthesize(spark: SparkSession, srcDir: String, outDir: String,
                 copies: Int): Unit = {
    // events.parquet's ts encoding varies by testdata generation (int64
    // ns / µs NTZ); copy it through unchanged — Tables.load normalizes
    // every encoding it can produce
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TWO independent rotation axes so copy mutations stay distinct past
    // 10 copies: axis 1 rotates by k mod 10, axis 2 (disjoint consonant
    // set, identity when k < 10 — 10-copy probes reproduce the historic
    // numbers exactly) rotates by k div 10. A single 10-char alphabet
    // would make copies k and k+10 IDENTICAL text — every doc would gain
    // exact cross-copy duplicates and a 100× probe would measure pair
    // explosion, the exact trap the mutation scheme exists to avoid.
    val alpha = "aeioustnrl"
    val alpha2 = "bcdfghjkmp"
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until copies).map { k =>
      val m1 = if (k % 10 == 0) col("text")
        else translate(col("text"), alpha, rotate(alpha, k % 10))
      val m2 = if (k / 10 % 10 == 0) m1
        else translate(m1, alpha2, rotate(alpha2, k / 10 % 10))
      docs.select(
        (col("doc_id") + lit(k * Offset)).as("doc_id"),
        m2.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // per-copy circular dimension rotation + deterministic per-copy sign
    // flips: both preserve every norm and all INTRA-copy geometry exactly
    // (planted near-dup pairs survive, pair counts scale linearly), while
    // cross-copy vectors decorrelate. Rotation alone aliases (copies k,j
    // differ by the same relative shift, so any periodic structure leaks
    // cross-copy pairs); the hash-derived sign pattern breaks that. An
    // additive per-copy drift would be worse — a shared offset makes ALL
    // intra-copy pairs similar (measured: 14 pairs → 18M), i.e. output
    // explosion, not scale signal.
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until copies).map { k =>
      val shift = k * 7 % 64
      val rotated =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      val flipped =
        if (k == 0) rotated
        else transform(rotated, (x, i) =>
          when(pmod(xxhash64(lit(k), i), lit(2)) === 0, x).otherwise(-x)
            .cast("float"))
      emb.select((col("vec_id") + lit(k * Offset)).as("vec_id"),
        flipped.as("embedding"),
        // labels carry through unchanged: copies stay geometrically
        // decorrelated, so per-copy label structure scales the margin
        // sweep's work linearly without inventing new classes
        col("label"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    (0 until copies).map { k =>
      // user_id shifts per copy: keep-latest/diff group counts scale
      // linearly with the corpus (each copy is a disjoint user universe)
      ev.withColumn("event_id", col("event_id") + lit(k * Offset))
        .withColumn("user_id", col("user_id") + lit(k * Offset))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // customer: per-copy id shift + a DOUBLED-letter copy tag prepended
    // to the name. Prepending the same string to both members of any
    // intra-copy pair leaves their edit distance unchanged (linkage pair
    // structure scales exactly linearly); between two copies the tags
    // differ in ≥2 positions (each tag letter is written TWICE, so even
    // adjacent copy numbers cost 2 edits), keeping every cross-copy pair
    // beyond maxDist=1. A bare one-letter tag would put adjacent copies
    // at distance 1 and manufacture quadratic cross-copy matches — the
    // linkage analog of the verbatim-copy trap documented above.
    val az = "abcdefghijklmnopqrstuvwxyz"
    val cust = spark.read.parquet(s"$srcDir/customer.parquet")
    (0 until copies).map { k =>
      val tag =
        if (k == 0) ""
        else s"${az(k % 26)}${az(k % 26)}${az(k / 26 % 26)}${az(k / 26 % 26)} "
      cust.withColumn("c_custkey", col("c_custkey") + lit(k * Offset))
        .withColumn("c_name", concat(lit(tag), col("c_name")))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until copies).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * Offset))
        .withColumn("l_partkey", col("l_partkey") + lit(k * Offset))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * Offset))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // orders: id shifts only (the profile probe reads min/max/distincts;
    // shifted keys scale the distinct domains linearly, everything else
    // carries through so per-column value ranges stay comparable)
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    (0 until copies).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * Offset))
        .withColumn("o_custkey", col("o_custkey") + lit(k * Offset))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    // supplier: s_suppkey shifts in lockstep with lineitem's l_suppkey
    // so the q21 supplier join keeps every copy's rows; nation carries
    // through unchanged (bounded dim — real scale-ups grow facts, not
    // the nation list)
    val sup = spark.read.parquet(s"$srcDir/supplier.parquet")
    (0 until copies).map { k =>
      sup.withColumn("s_suppkey", col("s_suppkey") + lit(k * Offset))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    spark.read.parquet(s"$srcDir/nation.parquet")
      .write.mode("overwrite").parquet(s"$outDir/nation.parquet")
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Mode-pinned extras beyond the SparkEntry queries: the embedding
    * near-dup AUTO query switches exact→LSH at the 20k-row cutover, so
    * its 1×/10× ratio compares two algorithms; this pins LSH at both
    * scales for an apples-to-apples read. The SemDeDup probe runs the
    * library's AUTO cluster sizing (nClusters = 0 default → cluster
    * SIZE held at ~[[graft.llm.Similarity.SemDeDupTargetClusterSize]]
    * regardless of corpus scale) — no hand-scaling here; the timed ratio
    * includes the auto mode's own sizing count() job, so the probe
    * measures exactly what a default-parameter caller gets. The
    * fixed-nClusters oracle query would be quadratic at 10× by
    * construction, measuring the documented anti-pattern rather than
    * the engine. */
  private val pinned: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "dedup_embedding_lsh_pinned" -> ((s, dir) =>
        graft.llm.Dedup.embeddingNearDup(graft.Tables.load(s, dir, "embeddings"),
          threshold = 0.5, useLsh = Some(true))),
      "dedup_semantic_scaled" -> ((s, dir) =>
        graft.llm.Similarity.semanticNearDupPairs(
          graft.Tables.load(s, dir, "embeddings"),
          threshold = 0.3, trainIters = 0)),
      // cross-corpus SemDeDup under the same auto sizing (the sf-pinned
      // oracle query fixes nClusters = 16, which at 10× would measure
      // the documented anti-pattern, not the operator)
      "dedup_semantic_against_scaled" -> ((s, dir) => {
        val emb = graft.Tables.load(s, dir, "embeddings")
        graft.llm.Similarity.semanticNearDupPairsAgainst(
          emb.filter(org.apache.spark.sql.functions.col("vec_id") % 7 === 0),
          emb.filter(org.apache.spark.sql.functions.col("vec_id") % 7 =!= 0),
          threshold = 0.3, trainIters = 0)
      }),
      // STEADY-STATE serve probes: the index is built + compacted ONCE
      // per corpus dir (the warmup pass pays it — exactly the daily
      // maintenance cadence) and the TIMED runs measure serving from
      // the persisted artifact, which is what a deployment repeats.
      // text_bm25_index_merge times build+merge+serve each run (its
      // >2× ratio is index-build growth); this row isolates the serve.
      "text_bm25_compacted_serve" -> ((s, dir) => {
        val idx = compactedBm25.computeIfAbsent(dir, _ => {
          val docs = graft.Tables.load(s, dir, "documents")
          val c = org.apache.spark.sql.functions.col("doc_id")
          graft.llm.Retrieval.compactBm25Index(
            graft.llm.Retrieval.mergeBm25Indexes(Seq(
              graft.llm.Retrieval.bm25Index(docs.filter(c % 2 === 0)),
              graft.llm.Retrieval.bm25Index(docs.filter(c % 2 === 1)))),
            java.nio.file.Files.createTempDirectory("graft-bm25-compact")
              .toString)
        })
        graft.llm.Retrieval.bm25TopKAgainst(idx, probeQueries(s, dir), k = 5)
      }),
      // the deployment-shaped hybrid: BOTH indexes persisted (warmup
      // builds them), dense probed at nprobe=4 ≪ nlist=16 behind the
      // per-serve certification gate — the timed cost is gate +
      // serve + fuse, the real steady state (text_hybrid_against's
      // exhaustive probe is the oracle twin, not the deployment)
      "text_hybrid_real_nprobe" -> ((s, dir) => {
        val f = org.apache.spark.sql.functions
        val (bidx, vidx) = hybridIdx.computeIfAbsent(dir, _ => {
          val docs = graft.Tables.load(s, dir, "documents")
          val c = f.col("doc_id")
          (graft.llm.Retrieval.compactBm25Index(
            graft.llm.Retrieval.bm25Index(docs),
            java.nio.file.Files.createTempDirectory("graft-hyb-bm25")
              .toString),
            graft.llm.Similarity.buildVectorIndex(
              graft.Tables.load(s, dir, "embeddings")))
        })
        val emb = graft.Tables.load(s, dir, "embeddings")
        val q = probeQueries(s, dir).join(
          emb.select(f.col("vec_id").as("query_id"), f.col("embedding")),
          "query_id")
        graft.llm.Retrieval.hybridTopKAgainst(bidx, vidx, q, k = 5,
          nprobe = 4, minRecall = 0.2, sampleN = 8)
      }),
      // STEADY-STATE merge-on-read scan: the layout is written and a
      // ~1.4% takedown recorded ONCE per corpus dir (warmup pays it —
      // the takedown cadence); the timed runs pay what every reader
      // pays FOREVER after a delete: the split scan where clean files
      // stream through join-free and only tombstoned files ride the
      // broadcast anti-join. The oracle-mode layout_delete_scan gate
      // times the whole write+delete cycle; this row isolates the
      // serving cost, which must stay ~linear in the data and FLAT in
      // the debt
      "lakehouse_live_scan" -> ((s, dir) => {
        val f = org.apache.spark.sql.functions
        val root = lakehouseDir.computeIfAbsent(dir, _ => {
          val ev = graft.Tables.load(s, dir, "events")
            .filter(f.col("value").isNotNull)
            .select("event_id", "event_type", "value")
          val path = java.nio.file.Files
            .createTempDirectory("graft-lake-live").toString + "/events"
          graft.core.Layout.zorder(ev, Seq("value", "event_id"),
              bits = 8, partitions = 16)
            .write.parquet(path)
          graft.core.Lakehouse.deleteWhere(s, path,
            f.col("event_id") % 71 === 0)
          path
        })
        graft.core.Lakehouse.scan(s, root)
          .groupBy("event_type")
          .agg(f.count(f.lit(1)).as("n"),
            f.sum(f.col("value").cast("decimal(18,2)")).cast("double")
              .as("sum_value"))
      }))

  private val compactedBm25 =
    new java.util.concurrent.ConcurrentHashMap[String, graft.llm.Retrieval.Bm25Index]()
  private val hybridIdx =
    new java.util.concurrent.ConcurrentHashMap[String,
      (graft.llm.Retrieval.Bm25Index, graft.llm.Similarity.VectorIndex)]()
  private val lakehouseDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The standard fixed 20-query probe log (the text_bm25_topk set). */
  private def probeQueries(s: SparkSession, dir: String) = {
    val f = org.apache.spark.sql.functions
    val docs = graft.Tables.load(s, dir, "documents")
    docs.filter(f.col("doc_id") % 25 === 0 && f.col("doc_id") < 500)
      .select(f.col("doc_id").as("query_id"),
        f.array_join(f.slice(f.split(
          graft.llm.TextAnalysis.normalizeText(f.col("text")), " "),
          1, 6), " ").as("query_text"))
  }

  def allProbes: Seq[String] = ProbeQueries ++ pinned.keys.toSeq.sorted

  /** Best-of-`runs` wall time (and result rows) per probe query. */
  def measure(spark: SparkSession, dir: String, runs: Int,
              probes: Seq[String] = allProbes): Map[String, (Double, Long)] =
    probes.map { name =>
      val fn = pinned.getOrElse(name, graft.SparkEntry.queries(name))
      var rows = 0L
      val ts = (1 to runs).map { _ =>
        time { rows = fn(spark, dir).count() }
      }
      name -> ((ts.min, rows))
    }.toMap

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("scaleprobe").toString)
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated probe subset (targeted re-probes
    // skip re-timing the whole family; the synthesized corpus is reused
    // when workDir already holds one)
    val probes = args.lift(3).map(_.split(",").toSeq).getOrElse(allProbes)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // customer/orders are checked too: a workDir synthesized before the
    // linkage/profile probes existed must be re-synthesized, not
    // half-reused
    val alreadySynth = new java.io.File(s"$workDir/documents.parquet").exists() &&
      new java.io.File(s"$workDir/customer.parquet").exists() &&
      new java.io.File(s"$workDir/orders.parquet").exists() &&
      // nation is written LAST: its presence proves the whole synthesis
      // completed (a crash mid-run must re-synthesize, not half-reuse)
      new java.io.File(s"$workDir/nation.parquet").exists()
    val tSynth =
      if (alreadySynth) 0.0
      else time(synthesize(spark, srcDir, workDir, copies))
    // warmup pass (codegen + JIT) at 1× before any measurement
    measure(spark, srcDir, runs = 1, probes)
    val t1 = measure(spark, srcDir, runs = 2, probes)
    val rounds1 = graft.llm.Dedup.lastRounds
    val t10 = measure(spark, workDir, runs = 2, probes)
    val rounds10 = graft.llm.Dedup.lastRounds

    val items = probes.map { q =>
      val ((s1, r1), (s10, r10)) = (t1(q), t10(q))
      val ratio = s10 / s1
      s""""$q":{"t1":${f"$s1%.3f"},"t${copies}x":${f"$s10%.3f"},"ratio":${f"$ratio%.2f"},"rows1":$r1,"rows${copies}x":$r10}"""
    }
    // closure round counts ride along when the components query was
    // probed: the O(log D) claim wants measured rounds, not argument
    val rounds = if (probes.contains("dedup_components"))
      s""","cc_rounds_1x":$rounds1,"cc_rounds_${copies}x":$rounds10"""
    else ""
    println(s"""{"metric":"scaleprobe","copies":$copies,"synth_sec":${f"$tSynth%.1f"}$rounds,""" +
      s""""queries":{${items.mkString(",")}}}""")
    spark.stop()
  }
}

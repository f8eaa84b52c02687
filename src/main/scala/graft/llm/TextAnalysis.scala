package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * `Column` expressions (codegen'd, pushdown-friendly) — a 100 TB
  * corpus pass is one scan + map, no shuffle until the caller
  * aggregates.
  */
object TextAnalysis {

  /** Conf key (session conf or system property, double, default 0 =
    * off) loosening the pruned serve's cost-routing gate: when > 0, a
    * query whose min-df heuristic would route it straight to the full
    * scan still ATTEMPTS the prune iff `sliceM >= ratio * k` (the
    * cheap "k << sliceM" condition). Never a correctness knob — the
    * bound check still decides per query, both routes stay exact; it
    * trades slice-arm work on saturated batches for recall of
    * provable queries on heavy-tailed postings (steep in-slice decay
    * with no fully-covered term — the regime the min-df signal
    * misses; LlmSpec plants exactly that fixture). */
  val AttemptPruneRatioKey = "spark.graft.bm25.attemptPruneRatio"

  private def attemptPruneRatio(
      spark: org.apache.spark.sql.SparkSession): Double =
    spark.conf.getOption(AttemptPruneRatioKey)
      .orElse(sys.props.get(AttemptPruneRatioKey))
      .flatMap(_.toDoubleOption).getOrElse(0.0)

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Token count (whitespace segmentation). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation clusters
    * counted separately (a cheap proxy for tokenizer load without
    * shipping a vocab). */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      t => trim(t) =!= ""))

  /** One-pass text statistics struct (native kernel): n_chars,
    * n_tokens, n_token_chars, n_punct, n_upper. */
  def textStats(text: Column): Column =
    graft.functions.SketchExprs.textStats(text)

  /** One-pass Gopher repetition-signal struct (native kernel; see
    * [[graft.functions.SketchOps.gopherStats]]): n_lines,
    * dup_line_frac, dup_line_char_frac, top_{2,3,4}gram_frac,
    * dup_{5..10}gram_frac. Pure scan+map — the classic repetition
    * filter costs zero shuffles at any corpus size. */
  def gopherStats(text: Column): Column =
    graft.functions.SketchExprs.gopherStats(text)

  /** Gopher's published repetition thresholds (Rae et al. 2021,
    * Table A1): a doc is kept iff every fraction is <= its bound.
    * Field names match [[gopherStats]]'s struct. */
  val gopherThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_line_char_frac" -> 0.20,
    "top_2gram_frac" -> 0.20, "top_3gram_frac" -> 0.18,
    "top_4gram_frac" -> 0.16,
    "dup_5gram_frac" -> 0.15, "dup_6gram_frac" -> 0.14,
    "dup_7gram_frac" -> 0.13, "dup_8gram_frac" -> 0.12,
    "dup_9gram_frac" -> 0.11, "dup_10gram_frac" -> 0.10)

  /** Per-doc Gopher repetition report: id, n_lines, the 11 fractions
    * rounded to 6 decimals, and `kept` = the Gopher threshold gate
    * evaluated ON THE ROUNDED values (so the boolean replays exactly
    * in any engine that reproduces the rounding). One kernel call per
    * row — Catalyst's subexpression elimination shares the struct
    * across the field extracts. */
  def gopherRepetition(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val g = gopherStats(col(textCol))
    val fracs = gopherThresholds.map { case (f, _) =>
      round(g.getField(f), 6).as(f) }
    val kept = gopherThresholds
      .map { case (f, th) => col(f) <= lit(th) }
      .reduce(_ && _)
    docs.select(col(idCol) +: g.getField("n_lines").as("n_lines") +:
        fracs: _*)
      .withColumn("kept", kept)
  }

  /** Gopher repetition filter: the docs that pass every threshold,
    * original schema preserved. The gate is evaluated inline on the
    * kernel struct — a plain Filter over the scan, no join, no
    * shuffle, pushdown-friendly. */
  def gopherQualityFilter(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    val g = gopherStats(col(textCol))
    val gate = gopherThresholds
      .map { case (f, th) => round(g.getField(f), 6) <= lit(th) }
      .reduce(_ && _)
    docs.filter(gate)
  }

  /** Top-k characteristic terms per document by tf-idf
    * (`tf * ln(N/df)`, scores rounded to 6 decimals BEFORE ranking so
    * the order is reproducible across engines; ties break to the
    * lexicographically first term).
    *
    * Scale: term frequencies shuffle once on (doc, term) with
    * map-side combine; document frequencies are a vocab-sized
    * aggregate of that frame (vocab ≪ corpus — AQE broadcasts it back
    * onto the term join); the per-doc top-k window shuffles on the
    * doc key only. N is a lazy 1-row count aggregate cross-joined by
    * broadcast — no eager driver action, and for a raw unfiltered
    * parquet scan Spark serves it from footer row counts. */
  def tfidfTopTerms(docs: DataFrame, k: Int, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val nDf = docs.select(count(lit(1)).as("_n"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDf))
      .withColumn("score",
        round(col("tf") * log(col("_n").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** BM25 top-k lexical retrieval (Robertson/Lucene form): for each
    * query doc, the `k` highest-scoring corpus docs under
    * `idf·tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))` with
    * `idf = ln(1 + (N-df+0.5)/(df+0.5))`, summed over the query's
    * DISTINCT terms (set-query form, query term frequency ignored) —
    * the sparse-retrieval counterpart of the dense ANN ops. Per-term
    * contributions sum through DECIMAL(38,18) and the score rounds to
    * 6 decimals BEFORE ranking (ties to the lower doc id), so rankings
    * replay bit-exact in any ANSI engine.
    *
    * Scale: term frequencies shuffle once on (doc, term) with map-side
    * combine; the query term set is distinct-collapsed and joins the
    * postings by term (queries ≪ corpus — AQE broadcasts them, the
    * corpus never reshuffles for the match); df is a vocab-sized
    * aggregate; N/avgdl ride a 1-row broadcast; the per-(query, doc)
    * agg shuffles candidate pairs only, and top-k is a per-query
    * window over them. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id",
               queryIdCol: String = "query_id"): DataFrame =
    graft.cache.Pins.track(corpus.sparkSession,
      bm25TopKManaged(corpus, queries, k, k1, b, textCol, idCol,
        queryIdCol)).value

  /** [[bm25TopK]] with query-term-frequency weighting: each query
    * term contributes `qtf · idf · satur(tf)` instead of once per
    * DISTINCT term — the bag-query BM25 form, for long or repetitive
    * queries where term multiplicity carries signal. Same plan shape
    * as [[bm25TopK]] (the qtf rides the broadcast query side). */
  def bm25TopKWeighted(corpus: DataFrame, queries: DataFrame, k: Int,
                       k1: Double = 1.2, b: Double = 0.75,
                       textCol: String = "text", idCol: String = "doc_id",
                       queryIdCol: String = "query_id"): DataFrame =
    graft.cache.Pins.track(corpus.sparkSession,
      bm25Core(corpus, queries, k, k1, b, textCol, idCol, queryIdCol,
        weighted = true)).value

  /** [[bm25TopK]] with an explicit lifecycle for the persisted
    * postings relation — the same Managed/Pins discipline as the
    * dedup signature caches. */
  def bm25TopKManaged(corpus: DataFrame, queries: DataFrame, k: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      textCol: String = "text", idCol: String = "doc_id",
                      queryIdCol: String = "query_id")
      : graft.access.Split.Branches[DataFrame] =
    bm25Core(corpus, queries, k, k1, b, textCol, idCol, queryIdCol,
      weighted = false)

  private def bm25Core(corpus: DataFrame, queries: DataFrame, k: Int,
                       k1: Double, b: Double, textCol: String,
                       idCol: String, queryIdCol: String,
                       weighted: Boolean)
      : graft.access.Split.Branches[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    // One tokenize pass: explode feeds the (doc, term) aggregate, and
    // dl = Σ tf comes from a DOC-keyed window over it (safe: a doc's
    // postings are bounded by its length — a projection of size(toks)
    // would instead re-run the tokenizer, since a Generate operator
    // can't CSE with its input projection). df = |postings(term)| is a
    // map-side-combined per-term aggregate joined back by term: NOT a
    // count(*) over a term-partitioned window, because a stopword's
    // postings (billions of rows at corpus scale) would all land in
    // ONE window partition — windows can't skew-split, joins can (AQE
    // skew-join), and at bench scale the vocab-sized df table simply
    // broadcasts. The postings relation feeds both the df aggregate
    // and the match join, so it is PERSISTED — computed once, consumed
    // twice (at deployment scale this is the materialized postings/
    // index layer every lexical-retrieval engine keeps next to the
    // corpus; spill-safe here, parquet there).
    val tf = corpus
      .select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl",
        sum(col("tf")).over(Window.partitionBy(col(idCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = corpus.agg(count(lit(1)).as("_n"),
      sum(size(toks).cast("long")).as("_sumdl"))
    val result = bm25ScoreOverPostings(tf, stats, queries, k, k1, b,
      textCol, idCol, queryIdCol, weighted)
    graft.access.Split.Branches(result, tf)
  }

  /** The query-time half of BM25, factored over a PREPARED postings
    * relation `(term, idCol, tf, dl)` and a 1-row `( _n, _sumdl )`
    * stats frame — shared verbatim by the one-shot [[bm25TopK]] path
    * and the incremental [[bm25TopKFromPostings]] layer, so the two
    * serve bit-identical scores from the same inputs. */
  private def bm25ScoreOverPostings(tf: DataFrame, stats: DataFrame,
                                    queries: DataFrame, k: Int,
                                    k1: Double, b: Double,
                                    textCol: String, idCol: String,
                                    queryIdCol: String,
                                    weighted: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // set-query form: DISTINCT terms, each counted once. bag-query
    // form: terms carry their in-query frequency as a weight. Either
    // way the query side stays queries-sized and broadcasts.
    val qt =
      if (weighted)
        queries.select(col(queryIdCol), explode(toks).as("term"))
          .groupBy(col(queryIdCol), col("term"))
          .agg(count(lit(1)).as("qtf"))
      else
        queries.select(col(queryIdCol), explode(toks).as("term"))
          .distinct()
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val idf = log(lit(1.0) +
      (col("_n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val contrib = idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * (col("dl").cast("double") / avgdl)))
    // the per-posting contribution is query-independent: compute it
    // ONCE per (doc, term) before the query join, so the (query, doc,
    // term) match stream — up to |queries|x larger — carries one
    // precomputed decimal instead of redoing the formula per match
    // weighted mode keeps _s as a double and applies qtf per match
    // BEFORE the decimal cast (a decimal×bigint product would widen
    // differently engine-to-engine; double-then-cast replays exactly)
    val posting = tf
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col(idCol),
        (if (weighted) contrib
         else contrib.cast("decimal(38,18)")).as("_s"))
    val termSum =
      if (weighted)
        sum((col("_s") * col("qtf").cast("double")).cast("decimal(38,18)"))
      else sum(col("_s"))
    val scored = qt
      .join(posting, Seq("term"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(termSum.cast("double"), 6).as("score"))
    // Per-query top-k: logically a single rank window over the scored
    // stream, physically TWO-PHASE — Catalyst's InferWindowGroupLimit
    // (on by default, spark.sql.window.group.limit.threshold) splits
    // the rank<=k filter into a map-side `WindowGroupLimit Partial`
    // BELOW the exchange and a `Final` above it, so every map
    // partition ships at most k rows per query and the reduce-side
    // partition for a query holds <= k x numMapPartitions rows — never
    // the query's whole scored corpus. A hand-salted two-phase rank
    // would re-shuffle the full scored stream a second time for the
    // same bound; the native form is asserted by PlanSpec's
    // "WindowGroupLimit Partial below the exchange" gate instead.
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("score"))
  }

  /** Incremental BM25 postings layer — lexical-index maintenance in
    * the [[graft.streaming.IngestStream.cmsBatch]] pattern: each
    * (doc-disjoint) batch publishes its OWN `(term, idCol, tf, dl)`
    * postings plus a 1-row `(n_docs, sum_dl)` stats partition under
    * `ingest_batch=<id>` with overwrite, so at-least-once replay
    * REPLACES and never double-counts; postings are doc-local and
    * stats are additive, so the standing index is just the
    * concatenation + stat sum — no rebuild, and
    * [[graft.streaming.IngestStream.ingestLayerCompact]] applies to
    * both subdirs verbatim. */
  def bm25PostingsBatch(batch: DataFrame, indexDir: String,
                        batchId: Long, textCol: String = "text",
                        idCol: String = "doc_id"): Unit = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    val posting = batch.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl",
        sum(col("tf")).over(Window.partitionBy(col(idCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the stats write scans `batch` independently of the postings
    // chain, so it runs as a CONCURRENT Spark job (thread-safe on one
    // session; idle cores at every scale — a batch publish's wall
    // time is max(postings+termdf, stats), not their sum). The crash
    // window is unchanged: a partial publish was already possible
    // between the sequential writes and is repaired by the documented
    // at-least-once replay (each subdir write overwrites its own
    // ingest_batch partition).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val statsJob = Future {
      batch.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(size(toks).cast("long")), lit(0L)).as("sum_dl"))
        .write.mode("overwrite")
        .parquet(s"$indexDir/stats/ingest_batch=$batchId")
    }
    try {
      posting.write.mode("overwrite")
        .parquet(s"$indexDir/postings/ingest_batch=$batchId")
      // term->df DICTIONARY sidecar (every lexical engine's term
      // dictionary): vocab-sized, additive across doc-disjoint
      // batches like the stats rows, and what makes the pruned
      // serve's cost-routing gate a dictionary read instead of a
      // match-stream aggregate. Consumers may ONLY use it for cost
      // decisions: [[graft.llm.Takedown.bm25Takedown]] debits the
      // sidecar under the same commit marker as stats, but a
      // mixed-era layer (batches ingested pre-sidecar) under-counts
      // and an interrupted-era layer could over-count — either
      // direction can only mis-route a query, never corrupt a
      // result. Runs AFTER the postings write so the persisted
      // posting relation is materialized once, not raced.
      posting.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite")
        .parquet(s"$indexDir/termdf/ingest_batch=$batchId")
      Await.result(statsJob, scala.concurrent.duration.Duration.Inf)
    } finally {
      // no write may remain in flight when the caller sees a failure:
      // an at-least-once replay of this batch would otherwise start a
      // second overwrite writer against the SAME stats path while the
      // orphaned Future is still staging files, and two concurrent
      // overwrite writers on one parquet dir can delete each other's
      // staged output. Await COMPLETION only (ready, not result) so
      // the original exception — not the stats job's — propagates.
      try Await.ready(statsJob, scala.concurrent.duration.Duration.Inf)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt() }
      posting.unpersist(blocking = false)
    }
  }

  /** Serve BM25 top-k from a standing [[bm25PostingsBatch]] layer:
    * df/N/avgdl derive from the layer (stats partitions sum), and
    * the scoring half is the SAME code path as [[bm25TopK]] — the
    * layered index answers bit-identically to a from-scratch run
    * over the union corpus (spec + oracle proven). This is the
    * deployed shape the bm25 scaladoc promises: postings
    * materialized once next to the corpus, queries never pay the
    * tokenize/aggregate pass. */
  def bm25TopKFromPostings(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, queries: DataFrame,
                           k: Int, k1: Double = 1.2, b: Double = 0.75,
                           textCol: String = "text",
                           idCol: String = "doc_id",
                           queryIdCol: String = "query_id")
      : DataFrame = {
    val (tf, stats) = bm25LayerFrames(spark, indexDir, idCol)
    bm25ScoreOverPostings(tf, stats, queries, k, k1, b,
      textCol, idCol, queryIdCol, weighted = false)
  }

  /** The standing-layer inputs every serve face starts from: the
    * `(term, idCol, tf, dl)` postings relation and the 1-row
    * `(_n, _sumdl)` stats aggregate — one resolution point so the
    * set-query, bag-query and pruned serves read the SAME frames. */
  private def bm25LayerFrames(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String, idCol: String)
      : (DataFrame, DataFrame) = (
    spark.read.parquet(s"$indexDir/postings")
      .select(col(idCol), col("term"), col("tf"), col("dl")),
    spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).as("_n"),
        sum(col("sum_dl")).as("_sumdl")))

  /** [[bm25TopKWeighted]] served from a standing [[bm25PostingsBatch]]
    * layer — the bag-query (qtf-weighted) twin of
    * [[bm25TopKFromPostings]], bit-identical to the one-shot weighted
    * form over the union corpus (the scoring half is the same shared
    * code path). */
  def bm25TopKWeightedFromPostings(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id",
      queryIdCol: String = "query_id"): DataFrame = {
    val (tf, stats) = bm25LayerFrames(spark, indexDir, idCol)
    bm25ScoreOverPostings(tf, stats, queries, k, k1, b,
      textCol, idCol, queryIdCol, weighted = true)
  }

  /** Exact BM25 top-k over a standing [[bm25PostingsBatch]] layer
    * with MaxScore-family IMPACT PRUNING — the device that makes
    * lexical serving sublinear in the corpus for selective queries
    * (the round-14 ScaleBench finding: the plain layered serve grows
    * 3.9 → 9.8 s across 64x corpus growth because the match stream
    * is posting-bound; every production lexical engine answers with
    * impact ordering + upper bounds, WAND/MaxScore family — re-
    * expressed here relationally, PROVE-OR-FALL-BACK so the result
    * is ALWAYS exactly the full scan's top-k):
    *
    *  0. a COST-ROUTING pre-gate (one vocab-bounded df aggregate)
    *     sends queries whose every matched term has df > sliceM
    *     straight to the full scan: no term slice can cover its
    *     posting list there, so the bound is a sum of near-top
    *     contributions and the attempt would only ever fall back —
    *     routing skips the doomed candidate machinery (both routes
    *     are exact; this is a cost decision, never a correctness
    *     one; in a deployed layer term->df lives in the dictionary
    *     sidecar and the gate is free); a batch with NO prune-routed
    *     query short-circuits to the plain full scan — the slice
    *     machinery is never even planned;
    *  1. posting contributions are computed only for the prune-routed
    *     QUERY VOCABULARY (the distinct-term set broadcasts into the
    *     postings scan — the full-scan path computes a contribution
    *     for every posting row in the layer);
    *  2. per term, the TOP-`sliceM` postings by contribution form
    *     the impact slice (a rank window WITH a `<= sliceM` filter —
    *     Catalyst's WindowGroupLimit keeps a stopword's billion-row
    *     partition map-side-bounded); candidates = docs in ANY query
    *     term's slice, scored FULLY over their matched postings;
    *  3. soundness bound: a non-candidate doc sits outside EVERY
    *     query term's slice, so its score ≤ B_q = Σ_t tail(t) where
    *     tail(t) = min contribution inside t's slice when df_t >
    *     sliceM (docs beyond the slice score ≤ the slice minimum)
    *     and 0 otherwise (df_t ≤ sliceM means no doc is outside).
    *     If the candidate k-th score θ_q > round6(B_q) — rounding is
    *     monotone, ranking ties break low-id, so strict inequality
    *     is required — NO non-candidate can enter the top-k and the
    *     pruned answer is PROVEN exact;
    *  4. queries whose bound check fails (or with < k candidates)
    *     fall back to the full [[bm25TopKFromPostings]] scoring for
    *     exactly those queries — correctness never rests on the
    *     heuristic, only the speed does.
    *
    * Same output schema and values as [[bm25TopKFromPostings]]
    * (shared-oracle equivalence + spec-proven on a corpus where
    * pruning verifiably engages). At 100 TB: selective (rare-term)
    * queries touch `|T_q| * sliceM` candidate postings instead of
    * the match stream, and the bound tightens as the corpus grows
    * (rare-term idf grows with N while a stopword's tail stays
    * bounded). Saturated queries degrade gracefully to the full
    * path. [[bm25PruneStats]] is the observability face. */
  def bm25TopKFromPostingsPruned(spark: org.apache.spark.sql.SparkSession,
                                 indexDir: String, queries: DataFrame,
                                 k: Int, sliceM: Int = 0,
                                 k1: Double = 1.2, b: Double = 0.75,
                                 textCol: String = "text",
                                 idCol: String = "doc_id",
                                 queryIdCol: String = "query_id")
      : DataFrame =
    bm25PrunedCore(spark, indexDir, queries, k, sliceM, k1, b,
      textCol, idCol, queryIdCol, weighted = false)._1

  /** Impact-slice depth rule — the [[graft.llm.Similarity.ivfAutoCells]]
    * / lshAutoConfig geometry discipline applied to lexical pruning
    * (`sliceM = 0` on the pruned faces resolves here from the layer's
    * own doc count). Three forces, each visible in the formula:
    *
    *  - floor `max(64, 4k)`: a slice must seed the top-k with room to
    *    spare (candidates come from slice UNIONS, but a one-term query
    *    gets exactly one slice), and below ~64 rows the per-term rank
    *    window costs more to schedule than the rows it prunes;
    *  - `32 * ceil(log2(n/1000 + 2))` corpus growth: a term's tail
    *    bound is its sliceM-th best contribution — at a fixed depth
    *    the tail RISES as the corpus grows (more docs populate the top
    *    of every term's impact distribution), loosening the bound
    *    exactly when pruning matters most; deepening logarithmically
    *    keeps the bound tightening while slice cost stays O(log n);
    *  - cap 4096: per-query candidate mass is ≤ |T_q| * sliceM — the
    *    cap keeps it broadcast-scale at any corpus size (past it, the
    *    slice arm stops beating the scan it is meant to avoid).
    *
    * Correctness never depends on the choice — the bound check makes
    * every depth exact (prove-or-fall-back); sliceM only moves the
    * prune/fallback frontier and the slice arm's cost. */
  def bm25AutoSliceM(k: Int, nDocs: Long): Int = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val grow = 32 * math.ceil(
      math.log(nDocs.max(0L) / 1000.0 + 2.0) / math.log(2.0)).toInt
    // the k floor binds LAST: a caller asking for k > 4096 must still
    // get a slice that can seed the top-k (the core requires
    // sliceM >= k — an auto value below k would fail a requirement
    // the caller never chose)
    math.max(k, math.min(4096, math.max(math.max(64, 4 * k), grow)))
  }

  /** Per-query pruning observability for
    * [[bm25TopKFromPostingsPruned]]: `(queryIdCol, n_candidates,
    * theta, bound, pruned)` — `pruned = true` rows were answered
    * from the impact slices with the bound PROVING exactness;
    * `false` rows fell back to the full scan (rows the routing
    * pre-gate sent straight to the full scan carry zero candidates
    * and null theta/bound — the attempt was never made). */
  def bm25PruneStats(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String, queries: DataFrame,
                     k: Int, sliceM: Int = 0,
                     k1: Double = 1.2, b: Double = 0.75,
                     textCol: String = "text",
                     idCol: String = "doc_id",
                     queryIdCol: String = "query_id"): DataFrame =
    bm25PrunedCore(spark, indexDir, queries, k, sliceM, k1, b,
      textCol, idCol, queryIdCol, weighted = false)._2

  /** Results AND prune stats from ONE core run — the deployed
    * pairing (serve + log the verdicts). Calling the two single
    * faces separately would compute the whole pruned pipeline — and
    * pin its persisted frames — twice. */
  def bm25PrunedServeWithStats(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, k: Int, sliceM: Int = 0,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id", queryIdCol: String = "query_id")
      : (DataFrame, DataFrame) =
    bm25PrunedCore(spark, indexDir, queries, k, sliceM, k1, b,
      textCol, idCol, queryIdCol, weighted = false)

  /** Impact-pruned BAG-QUERY (qtf-weighted) BM25 serve — the
    * [[bm25TopKWeighted]] semantics under the same prove-or-fall-back
    * contract as [[bm25TopKFromPostingsPruned]], always bit-identical
    * to [[bm25TopKWeightedFromPostings]].
    *
    * The weighted soundness argument (the one extra step over the
    * unweighted scaladoc): slices are ranked by the RAW DOUBLE
    * contribution `_sd`, so a doc outside term t's slice has
    * `_sd ≤ _sdmin(t)` as IEEE doubles; its per-term score
    * contribution `cast18(_sd * qtf)` is then ≤ the per-(query, term)
    * tail `cast18(_sdmin(t) * qtf)` — IEEE multiply by the same
    * positive qtf and the decimal(38,18) cast are both monotone — and
    * the bound B_q = Σ_t tail sums those EXACT decimals (df ≤ sliceM
    * terms bound 0 as before). θ_q > round6(B_q) strict therefore
    * proves exactness by the same round-monotone argument; qtf never
    * loosens the proof because the tail is scaled by the SAME per-term
    * qtf the scores use, not a query-global max. */
  def bm25TopKFromPostingsPrunedWeighted(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, k: Int, sliceM: Int = 0,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id", queryIdCol: String = "query_id")
      : DataFrame =
    bm25PrunedCore(spark, indexDir, queries, k, sliceM, k1, b,
      textCol, idCol, queryIdCol, weighted = true)._1

  /** Weighted serve + prune verdicts from one core run (the weighted
    * [[bm25PrunedServeWithStats]]). */
  def bm25PrunedServeWithStatsWeighted(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, k: Int, sliceM: Int = 0,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id", queryIdCol: String = "query_id")
      : (DataFrame, DataFrame) =
    bm25PrunedCore(spark, indexDir, queries, k, sliceM, k1, b,
      textCol, idCol, queryIdCol, weighted = true)

  /** The query-vocabulary posting-contribution frame `(term, idCol,
    * _s)` the pruned serve slices — package-private so PlanSpec can
    * gate the un-persisted plan (the core persists it immediately). */
  private[graft] def bm25QueryVocabPostings(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      qt: DataFrame, k1: Double, b: Double, idCol: String)
      : DataFrame = {
    val (tf, stats) = bm25LayerFrames(spark, indexDir, idCol)
    bm25QueryVocabPostingsFrom(tf, stats, qt, k1, b, idCol)
  }

  /** [[bm25QueryVocabPostings]] over already-resolved layer frames —
    * the pruned core reads the layer once and shares the frames with
    * its routing pre-gate. */
  private def bm25QueryVocabPostingsFrom(
      tf: DataFrame, stats: DataFrame,
      qt: DataFrame, k1: Double, b: Double, idCol: String)
      : DataFrame = {
    // contributions for the QUERY VOCABULARY only — df per term is
    // the same count whether aggregated over the full layer or the
    // term's own restricted postings, so the restriction is free
    val qterms = qt.select(col("term")).distinct()
    val tfq = tf.join(broadcast(qterms), Seq("term"))
    val dfT = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val idf = log(lit(1.0) +
      (col("_n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val contrib = idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * (col("dl").cast("double") / avgdl)))
    // `_s` (decimal) drives the unweighted path verbatim; `_sd` (the
    // raw double) drives the weighted path, whose score arithmetic
    // multiplies by qtf BEFORE the decimal cast — codegen CSE shares
    // the one contribution computation across both columns
    tfq.join(dfT, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col(idCol),
        contrib.cast("decimal(38,18)").as("_s"),
        contrib.as("_sd"), col("df"))
  }

  /** The per-term impact slice: rank-filtered TERM-partitioned
    * window — ONLY safe because the `<= sliceM` filter makes
    * Catalyst's InferWindowGroupLimit bound every map partition at
    * sliceM rows per term (a stopword's postings never assemble in
    * one place); PlanSpec gates that shape. */
  private[graft] def bm25ImpactSlice(posting: DataFrame, sliceM: Int,
                                     idCol: String,
                                     orderCol: String = "_s")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wT = Window.partitionBy(col("term"))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    posting.withColumn("_r", row_number().over(wT))
      .filter(col("_r") <= sliceM)
  }

  private def bm25PrunedCore(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String, queries: DataFrame,
                             k: Int, sliceM0: Int, k1: Double, b: Double,
                             textCol: String, idCol: String,
                             queryIdCol: String, weighted: Boolean)
      : (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    // the layer frames resolve ONCE and feed the auto geometry, the
    // routing pre-gate and the slice arm's contribution scan alike
    val (tfL, statsL) = bm25LayerFrames(spark, indexDir, idCol)
    // sliceM = 0 resolves to the corpus-derived geometry; the 1-row
    // stats read is the same driver-side metadata touch every serve
    // already pays for N/avgdl (null-guarded: a stats dir holding
    // only empty partitions sums to null, which is an empty corpus)
    val sliceM =
      if (sliceM0 > 0) sliceM0
      else bm25AutoSliceM(k,
        Option(statsL.head.get(0))
          .map(_.asInstanceOf[Number].longValue).getOrElse(0L))
    require(sliceM >= k,
      s"need sliceM >= k (got k=$k, sliceM=$sliceM): a slice smaller " +
        "than k could not even seed the top-k")
    import org.apache.spark.sql.expressions.Window
    // bag-query mode carries the in-query term frequency; set-query
    // mode is the distinct-term set — same split as the scoring path
    val qtRaw = queries
      .select(col(queryIdCol), explode(tokens(col(textCol))).as("term"))
    val qtF =
      if (weighted)
        qtRaw.groupBy(col(queryIdCol), col("term"))
          .agg(count(lit(1)).as("qtf"))
      else qtRaw.distinct()
    // the query-term relation is QUERY-BATCH-sized by construction
    // (|queries| x |query terms|) and every arm of the serve reads it
    // — collect ONCE and replant as a LocalRelation (the r19
    // domainReweight move): downstream subtrees then embed a literal
    // relation instead of the tokenize+aggregate plan, the
    // persist/unpersist lifecycle disappears, and the slice arm's
    // semi-joins against it broadcast a local frame. Eager at
    // DataFrame-construction time, exactly like the routing collect
    // below (this serve face routes on the driver by contract).
    val qtRows = qtF.collect()
    // DRIVER-SIZE GUARD (VERDICT r20 #9 / ADVICE): the replant is
    // licensed by the serve's routing contract — query batches are
    // driver-sized. |queries| x |query terms| beyond this cap means a
    // caller handed a corpus-sized "query" set to the batch-serve
    // face; fail fast with the contract named instead of OOMing the
    // driver mid-collect chain.
    require(qtRows.length <= 5000000,
      s"bm25 pruned serve: query-term relation has ${qtRows.length} " +
        "rows (> 5e6). This face routes query batches on the driver " +
        "by contract; a corpus-sized query set belongs on the " +
        "distributed full-scan face (bm25TopKFromPostings)")
    val qt = spark.createDataFrame(
      java.util.Arrays.asList(qtRows: _*), qtF.schema)
    // COST-ROUTING pre-gate (never a correctness decision — both
    // routes are exact), a HEURISTIC not a proof: a term whose slice
    // covers its WHOLE posting list (df <= sliceM) bounds its tail at
    // 0, so min(df) <= sliceM is a strong prunability signal; a query
    // whose every matched term has df > sliceM gets a bound built
    // purely from near-top slice minima, which on flat contribution
    // distributions (uniform tf/dl — the planted specs, stopword-ish
    // vocabularies) always exceeds theta, so the prune attempt would
    // compute the full candidate machinery only to fall back. On
    // HEAVY-TAILED real text a steep in-slice decay CAN put theta
    // above a minima-built bound with no fully-covered term, so this
    // gate trades those (rarer) provable queries for never paying the
    // doomed-attempt cost on saturated ones; a deployment tuning for
    // recall of prunable queries opts in via AttemptPruneRatioKey
    // (attempt the prune whenever sliceM >= ratio * k — measured
    // provable on the planted heavy-tailed LlmSpec fixture, default
    // OFF because on the flat planted/stopword regimes the attempt
    // is pure doomed-arm cost). Routing straight
    // to the full scan costs one vocab-bounded df aggregate (map-side
    // combined, no dl/contribution arithmetic, nothing persisted)
    // instead of the match-stream-sized posting persist + slice +
    // candidate scoring the doomed attempt would pay. At 100 TB the
    // production form keeps term->df in the layer's dictionary
    // sidecar and routes for free; here the aggregate stands in.
    // Queries with NO matched terms route to the full scan too
    // (empty either way). df comes from the layer's term-DICTIONARY
    // sidecar when present (vocab-sized read — the gate is then free
    // at any corpus size); layers predating the sidecar fall back to
    // the match-stream aggregate. bm25Takedown debits the sidecar in
    // its commit-marker swap, but routing df can still be partial on
    // mixed-era layers (under-count) — any staleness is safe because
    // routing is a cost decision only: the prune arm recomputes
    // exact df and its bound check still proves or falls back per
    // query.
    val qterms = qt.select(col("term")).distinct()
    val termdfPath = new org.apache.hadoop.fs.Path(s"$indexDir/termdf")
    val dfQ =
      if (termdfPath.getFileSystem(
          spark.sparkContext.hadoopConfiguration).exists(termdfPath))
        spark.read.parquet(s"$indexDir/termdf")
          .join(broadcast(qterms), Seq("term"))
          .groupBy(col("term")).agg(sum(col("df")).as("df"))
      else
        tfL.join(broadcast(qterms), Seq("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // the per-query min-df frame is QUERY-BATCH-sized (one row per
    // query) — collect it and route ON THE DRIVER: one job covers the
    // df aggregate, the route decisions AND the saturated-batch
    // short-circuit, and the routes relation the slice arm semi-joins
    // against becomes a broadcast-free LocalRelation instead of a
    // persisted distributed frame with its own count() action
    // opt-in looser routing (AttemptPruneRatioKey): attempt the prune
    // on mindf-saturated queries too when sliceM >= ratio * k — a
    // driver-side constant folded into the same predicate, zero extra
    // jobs; queries with no matched terms still route to the full scan
    val attemptAnyway = {
      val r = attemptPruneRatio(spark)
      r > 0.0 && sliceM >= r * k
    }
    val routesF = qt.select(col(queryIdCol), col("term"))
      .join(dfQ, Seq("term"), "left")
      .groupBy(col(queryIdCol))
      .agg(min(col("df")).as("_mindf"))
      .withColumn("_prune",
        col("_mindf").isNotNull &&
          (col("_mindf") <= sliceM || lit(attemptAnyway)))
    val routesRows = routesF.collect()
    val routes = spark.createDataFrame(
      java.util.Arrays.asList(routesRows: _*), routesF.schema)
    // fully-saturated batches SHORT-CIRCUIT: when no query routes to
    // the prune arm, the entire slice machinery (posting persist,
    // slice window, candidate scoring, bound check — ~10 fixed job
    // launches at local scale) would only produce empty frames; skip
    // it and serve the whole batch from the full scan. With the
    // collected routes the decision is a free driver-side scan.
    val pruneIdx = routesF.schema.fieldIndex("_prune")
    val nPrune = routesRows.count(_.getBoolean(pruneIdx))
    if (nPrune == 0) {
      // the already-resolved layer frames serve the whole batch —
      // same plan as the public face, minus a duplicate parquet
      // resolution of the layer
      val served = bm25ScoreOverPostings(tfL, statsL, queries,
        k, k1, b, textCol, idCol, queryIdCol, weighted = weighted)
      val verdictR = routes
        .select(col(queryIdCol), lit(0L).as("n_candidates"),
          lit(null).cast("double").as("theta"),
          lit(null).cast("double").as("bound"),
          lit(false).as("pruned"))
      return (served, verdictR)
    }
    // the slice arm sees ONLY prune-routed queries: their (smaller)
    // vocabulary restricts the contribution scan, and a routed
    // query's terms can never leak candidates into the arm
    // qt and routes are both LOCAL rows — the prune-routed subset is
    // a driver-side filter, planted as a LocalRelation like its
    // parents (no semi-join job, no distributed qt in any subtree)
    val qidIdx = qtF.schema.fieldIndex(queryIdCol)
    // resolve the query-id position by NAME (ADVICE r20: a positional
    // _.get(0) silently mis-routes under any schema reorder)
    val routeQidIdx = routesF.schema.fieldIndex(queryIdCol)
    val pruneIds = routesRows.filter(_.getBoolean(pruneIdx))
      .map(_.get(routeQidIdx)).toSet
    val qtP = spark.createDataFrame(
      java.util.Arrays.asList(
        qtRows.filter(r => pruneIds.contains(r.get(qidIdx))): _*),
      qtF.schema)
    val posting = bm25QueryVocabPostingsFrom(tfL, statsL,
        qtP.select(col(queryIdCol), col("term")), k1, b, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.cache.Pins.track(spark, new AutoCloseable {
      def close(): Unit = posting.unpersist(blocking = false)
    })
    // weighted slices rank by the RAW DOUBLE `_sd`: the weighted score
    // term is cast18(_sd * qtf), and only double-ordered slices make
    // outside-doc ≤ slice-min survive the multiply EXACTLY (see the
    // weighted face's scaladoc); the unweighted path keeps its decimal
    // `_s` ordering verbatim
    val slice = bm25ImpactSlice(posting, sliceM, idCol,
        orderCol = if (weighted) "_sd" else "_s")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.cache.Pins.track(spark, new AutoCloseable {
      def close(): Unit = slice.unpersist(blocking = false)
    })
    // tail per term: docs beyond the slice score <= the slice minimum;
    // a term wholly inside its slice (df <= sliceM) has NO outside docs
    val tailT = slice.groupBy(col("term"))
      .agg(min(col(if (weighted) "_sd" else "_s")).as("_smin"),
        max(col("df")).as("df"))
    // candidates + their FULL scores over matched postings — the score
    // arithmetic is VERBATIM the full-scan path's (decimal sum of _s,
    // or decimal sum of cast18(_sd * qtf)), so served rows are
    // bit-identical to the fallback's by construction
    val cand = qtP.join(slice.select(col("term"), col(idCol)), Seq("term"))
      .select(col(queryIdCol), col(idCol)).distinct()
    val termScore =
      if (weighted)
        sum((col("_sd") * col("qtf").cast("double"))
          .cast("decimal(38,18)"))
      else sum(col("_s"))
    val candScores = qtP.join(posting, Seq("term"))
      .join(cand, Seq(queryIdCol, idCol), "left_semi")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(termScore.cast("double"), 6).as("score"))
    val wQ = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    val ranked = candScores
      .withColumn("rank", row_number().over(wQ).cast("long"))
      .filter(col("rank") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.cache.Pins.track(spark, new AutoCloseable {
      def close(): Unit = ranked.unpersist(blocking = false)
    })
    // theta = the k-th candidate score (null when fewer than k
    // candidates exist — then nothing is provable and the query
    // falls back); n_candidates counts BEFORE the top-k cut
    val thetaN = candScores.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("_ncand"))
      .join(ranked.filter(col("rank") === k)
        .select(col(queryIdCol), col("score").as("_theta")),
        Seq(queryIdCol), "left")
    // B_q over the query's terms; terms absent from the layer bound 0.
    // Weighted: the per-(query, term) tail is cast18(_smin * qtf) —
    // the same arithmetic shape as a score term, scaled by the SAME
    // qtf, summed exactly in decimal
    val termBound =
      if (weighted)
        when(col("df") > sliceM,
          (col("_smin") * col("qtf").cast("double"))
            .cast("decimal(38,18)"))
          .otherwise(lit(0).cast("decimal(38,18)"))
      else
        when(col("df") > sliceM, col("_smin"))
          .otherwise(lit(0).cast("decimal(38,18)"))
    val boundQ = qtP.join(tailT, Seq("term"), "left")
      .groupBy(col(queryIdCol))
      .agg(round(sum(coalesce(termBound,
        lit(0).cast("decimal(38,18)"))).cast("double"), 6).as("_bound"))
    // routed-to-full queries never entered the slice arm: their
    // verdict row reports zero candidates and null theta/bound —
    // `pruned = false` routes them into the fallback with the
    // bound-failed queries
    val verdictF = boundQ.join(thetaN, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        coalesce(col("_ncand"), lit(0L)).as("n_candidates"),
        col("_theta").as("theta"), col("_bound").as("bound"),
        (col("_theta").isNotNull && col("_ncand") >= k &&
          col("_theta") > col("_bound")).as("pruned"))
      .unionByName(routes.filter(!col("_prune"))
        .select(col(queryIdCol), lit(0L).as("n_candidates"),
          lit(null).cast("double").as("theta"),
          lit(null).cast("double").as("bound"),
          lit(false).as("pruned")))
    // the verdict is QUERY-BATCH-sized (exactly one row per query) —
    // collect and replant it like qt/routes above: okQ/failQ become
    // LocalRelations, so neither the served union nor the fallback
    // embeds the whole slice-arm subtree through a semi-join key, the
    // persist/unpersist pair disappears, and the one collect is the
    // action that materializes the slice arm's persisted frames. The
    // measured passes stay identical — this moves WHERE the
    // batch-sized rows live, not what is computed.
    val verdictRows = verdictF.collect()
    val verdict = spark.createDataFrame(
      java.util.Arrays.asList(verdictRows: _*), verdictF.schema)
    val okQ = verdict.filter(col("pruned")).select(col(queryIdCol))
    val failQ = verdict.filter(!col("pruned")).select(col(queryIdCol))
    val prunedPart = ranked
      .join(okQ, Seq(queryIdCol), "left_semi")
      .select(col(queryIdCol), col("rank"), col(idCol), col("score"))
    // fallback: the full-scan path, restricted to the failed queries
    // — served from the SAME resolved layer frames as the slice arm
    // (identical plan to the public face, one layer resolution per
    // serve instead of two)
    val fallback = bm25ScoreOverPostings(tfL, statsL,
      queries.join(failQ, Seq(queryIdCol), "left_semi"),
      k, k1, b, textCol, idCol, queryIdCol, weighted = weighted)
    (prunedPart.unionByName(fallback), verdict)
  }

  /** Quality features: every signal a length/punct/stopword-ratio
    * filter needs, derived from ONE text_stats kernel pass (whole-
    * stage codegen CSE shares the struct across the field columns). */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = textStats(col(textCol))
    val nChars = st.getField("n_chars")
    val nToks = st.getField("n_tokens")
    df.withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nToks)
      .withColumn("avg_token_len",
        when(nToks > 0, st.getField("n_token_chars").cast("double") /
          nToks.cast("double")).otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChars > 0, st.getField("n_punct").cast("double") /
          nChars.cast("double")).otherwise(0.0))
      .withColumn("upper_ratio",
        when(nChars > 0, st.getField("n_upper").cast("double") /
          nChars.cast("double")).otherwise(0.0))
  }

  /** Intra-document repetition: fraction of duplicate word n-grams
    * (1 - distinct/total) — the classic repetitive-text quality gate
    * (boilerplate, keyword stuffing, decode loops score high). Pure
    * Column expression; 0.0 for docs with fewer than n tokens. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val total = size(toks) - (n - 1)
    when(total > lit(0),
      lit(1.0) - size(Dedup.wordShingles(text, n)).cast("double") /
        total.cast("double"))
      .otherwise(0.0)
  }

  /** Canonical text normalization: unicode NFC, root-locale lowercase,
    * whitespace runs collapsed to one space, ends trimmed — the
    * standard canonicalization before exact/near dedup and
    * fingerprinting, as one codegen'd kernel pass (shuffle-free at any
    * corpus size). Deliberately NFC, not NFKC. */
  def normalizeText(text: Column): Column =
    graft.functions.SketchExprs.normalizeText(text)

  /** Accent fold (NFD + mark strip — strip_accents semantics): the
    * multilingual canonicalization step BEYOND [[normalizeText]],
    * for matching/dedup across accent variants (café == cafe).
    * Native codegen'd kernel; row-local. */
  def accentFold(text: Column): Column =
    graft.functions.SketchExprs.accentFold(text)

  /** Stopword ratio against a given list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val sw = array(stopwords.map(lit(_)): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks)).otherwise(0.0)
  }

  /** Language-ID by stopword-hit scoring: argmax over per-language
    * marker-word hit counts (n-gram-heuristic family; deterministic
    * and vocabulary-driven, so it ports to any marker lists). Returns
    * the language whose markers hit most, `und` when nothing hits. */
  def langId(text: Column,
             markers: Map[String, Seq[String]] = defaultMarkers): Column =
    // native kernel (one tokenize pass, hash-set marker lookup);
    // argmax ties -> the lexicographically LAST language name among
    // max hits, "und" when nothing hits (documented, oracle-matched)
    graft.functions.SketchExprs.langId(text, markers.toSeq.sortBy(_._1))

  val defaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se"),
    "fr" -> Seq("le", "la", "de", "et", "que", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  /** 60-bit content fingerprint: min of the base hash (XXH64 in
    * production, MD5 in oracle-verification mode — see
    * [[graft.functions.SketchOps]]) over word 4-grams — stable under
    * whitespace normalization, cheap to recompute incrementally
    * (winnowing-style). Native codegen'd kernel; short docs fall back
    * to the whole-text hash. */
  def fingerprint(text: Column, n: Int = 4): Column =
    graft.functions.SketchExprs.fingerprintText(text, n)

  // ---------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------

  /** PII patterns, applied in order (email before phone so the digits
    * of a mailbox name cannot be half-eaten by the phone rule; IPv4
    * before phone so dotted quads are not read as phone runs). RE2-
    * compatible (no lookaround) so the exact same patterns run in
    * engines like DuckDB/Go, keeping redaction oracle-replayable. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d().\\- ]{6,}\\d" -> "<PHONE>")

  /** Redact emails, IPv4 addresses and phone-number runs to typed
    * placeholder tokens — the anonymization pass of web-scale curation
    * pipelines. A chain of codegen'd `regexp_replace`s: shuffle-free
    * narrow projection, one scan at any corpus size. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  // ---------------------------------------------------------------
  // n-gram language-model scoring (perplexity-style quality filter)
  // ---------------------------------------------------------------

  /** Per-document average bigram log-probability under an add-alpha
    * bigram LM trained on `train` — the KenLM-perplexity quality gate
    * of web-scale curation pipelines (CCNet-style), with the LM kept
    * engine-replayable: `ln((c(w1,w2) + a) / (c(w1) + a*V))` averaged
    * over the doc's bigram instances, summed through DECIMAL(38,18)
    * so the average is partition-order-independent. Low scores =
    * improbable word sequences (gibberish, boilerplate soup);
    * `exp(-avg_logprob)` is the per-word perplexity.
    *
    * `maxBigrams` caps the LM table for scale (top-B by count, ties
    * lexicographic — deterministic); unseen bigrams back off to the
    * smoothing floor via the same formula with c=0. Docs with fewer
    * than 2 tokens produce no bigrams and are absent from the output.
    *
    * Scale: unigram/bigram counts ride (hashable token keys) with
    * map-side combine; V is a lazy 1-row broadcast (like
    * [[tfidfTopTerms]]'s N); the count tables join back onto the
    * instance stream (AQE broadcasts them while they fit, degrades to
    * shuffle joins when the LM outgrows that); the final per-doc agg
    * is one shuffle on the doc key. */
  def bigramLmScore(docs: DataFrame, train: DataFrame, alpha: Double = 0.5,
                    maxBigrams: Int = Int.MaxValue,
                    textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    def bigramInst(df: DataFrame, cols: Column*): DataFrame = {
      val tk = df.withColumn("_tk", tokens(col(textCol)))
        .filter(size(col("_tk")) >= 2)
      val n1 = size(col("_tk")) - 1
      tk.select(cols :+ explode(arrays_zip(
          slice(col("_tk"), lit(1), n1).as("w1"),
          zip_with(slice(col("_tk"), lit(1), n1),
            slice(col("_tk"), lit(2), n1),
            (a, b) => concat(a, lit(" "), b)).as("bg"))).as("z"): _*)
        .select(cols :+ col("z.w1") :+ col("z.bg"): _*)
    }
    val trainTokens = train.select(explode(tokens(col(textCol))).as("w"))
    val uni = trainTokens.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val vDf = uni.select(count(lit(1)).as("_v"))
    val bc0 = bigramInst(train)
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val bc =
      if (maxBigrams == Int.MaxValue) bc0
      else bc0.orderBy(col("cb").desc, col("bg").asc).limit(maxBigrams)
    val inst = bigramInst(docs, col(idCol))
    val lp = log((coalesce(col("cb"), lit(0L)).cast("double") + alpha) /
      (coalesce(col("cu"), lit(0L)).cast("double") +
        lit(alpha) * col("_v").cast("double")))
    inst
      .join(bc, Seq("bg"), "left")
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vDf))
      .select(col(idCol), lp.as("_lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_lp").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
  }

  /** Per-document average bigram log-probability under an
    * INTERPOLATED KNESER–NEY LM (Kneser & Ney 1995; the Chen &
    * Goodman 1999 formulation with a fixed absolute discount `d`) —
    * the smoothing real n-gram LMs (KenLM) actually use, upgrading
    * [[bigramLmScore]]'s add-alpha floor:
    * {{{
    *   P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·)
    *              + d·N1+(w1·)/c(w1·) · Pc(w2)
    * }}}
    * with `c(w1·)` the history's bigram-instance count, `N1+(w1·)`
    * its distinct-continuation count, and the continuation
    * distribution `Pc(w2) = (N1+(·w2)+1)/(N1+(··)+V)` — the KN
    * continuation probability with an add-one floor over the
    * vocabulary (V = train types + 1 OOV type), a deterministic,
    * engine-replayable choice that keeps every score finite: an
    * unseen history backs off to `Pc(w2)` alone, an unseen
    * continuation takes the `1/(N1+(··)+V)` floor. Emits
    * `(idCol, n_bigrams, avg_logprob, ppl)` with `ppl =
    * exp(−avg_logprob)` — the per-word perplexity gauge.
    *
    * Scale shape mirrors [[bigramLmScore]]: the bigram-type table is
    * the one train-side aggregate (pinned — four consumers: history
    * totals, continuation counts, type count, instance join); all
    * model relations are type-bounded, join back onto the instance
    * stream (AQE broadcasts them while they fit), and the per-doc
    * aggregate is one shuffle on the doc key with a decimal sum so
    * the average replays bit-exact. */
  def knLmScore(docs: DataFrame, train: DataFrame,
                discount: Double = 0.75, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    def biInst(df: DataFrame, cols: Column*): DataFrame = {
      val tk = df.withColumn("_tk", tokens(col(textCol)))
        .filter(size(col("_tk")) >= 2)
      val n1 = size(col("_tk")) - 1
      tk.select(cols :+ explode(arrays_zip(
          slice(col("_tk"), lit(1), n1).as("w1"),
          slice(col("_tk"), lit(2), n1).as("w2"))).as("z"): _*)
        .select(cols :+ col("z.w1").as("w1") :+ col("z.w2").as("w2"): _*)
    }
    val cb = biInst(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("_cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = cb.groupBy(col("w1"))
      .agg(sum(col("_cb")).as("_c1"), count(lit(1)).as("_n1f"))
    val n1b = cb.groupBy(col("w2")).agg(count(lit(1)).as("_n1b"))
    val nbb = cb.agg(count(lit(1)).as("_nbb"))
    val vDf = train.select(explode(tokens(col(textCol))).as("w"))
      .agg((countDistinct(col("w")) + lit(1L)).as("_v"))
    val pc = (coalesce(col("_n1b"), lit(0L)).cast("double") + lit(1.0)) /
      (col("_nbb").cast("double") + col("_v").cast("double"))
    val lp = when(col("_c1").isNull, log(pc))
      .otherwise(log(
        greatest(coalesce(col("_cb"), lit(0L)).cast("double")
            - lit(discount), lit(0.0)) / col("_c1").cast("double") +
          lit(discount) * col("_n1f").cast("double") /
            col("_c1").cast("double") * pc))
    val result = biInst(docs, col(idCol))
      .join(cb, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(n1b, Seq("w2"), "left")
      .crossJoin(broadcast(nbb))
      .crossJoin(broadcast(vDf))
      .select(col(idCol), lp.as("_lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_lp").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
      .withColumn("ppl", round(exp(-col("avg_logprob")), 6))
    graft.cache.Pins.track(docs.sparkSession,
      graft.access.Split.Branches(result, cb)).value
  }

  /** CCNet-style perplexity tiering: every document gets a
    * per-language quality bucket from an `ntile` over its
    * [[bigramLmScore]] average log-probability — bucket 1 = the
    * most-probable (head) slice, bucket `nBuckets` = tail. CCNet
    * keeps head/middle and drops or down-weights tail; emitting the
    * per-doc assignment (rather than a pre-filtered corpus) lets the
    * pipeline choose. Ties are broken by id, so the tiering is a pure
    * function of the corpus.
    *
    * Scale: the LM scoring is [[bigramLmScore]]'s bounded-table plan;
    * the ntile window shuffles one (id, lang, score) row per doc keyed
    * by language. A dominant language concentrates its ntile sort on
    * one partition — at 100 TB replace the exact ntile with quantile
    * cuts from the scored histogram (same downstream contract). */
  def pplBuckets(docs: DataFrame, train: DataFrame, nBuckets: Int = 3,
                 alpha: Double = 0.5, textCol: String = "text",
                 idCol: String = "doc_id", langCol: String = "lang")
      : DataFrame =
    pplBucketsScored(docs,
      bigramLmScore(docs, train, alpha, textCol = textCol, idCol = idCol),
      nBuckets, idCol, langCol)

  /** [[pplBuckets]] over a PRECOMPUTED [[bigramLmScore]] table — the
    * deployment shape: the LM scoring is a corpus-version artifact
    * (score once, persist the narrow per-doc table), and every tier /
    * filter consumer reads it instead of re-training the LM. */
  def pplBucketsScored(docs: DataFrame, scored: DataFrame,
                       nBuckets: Int = 3, idCol: String = "doc_id",
                       langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("avg_logprob").desc, col(idCol).asc)
    docs.select(col(idCol), col(langCol))
      .join(scored.select(col(idCol), col("avg_logprob")), Seq(idCol))
      .withColumn("ppl_bucket", ntile(nBuckets).over(w).cast("long"))
      .select(col(idCol), col(langCol), col("avg_logprob"),
        col("ppl_bucket"))
  }

  /** Quality-gate ensemble scorecard: the three independent
    * row-local gates of the curation stack — the Gopher repetition
    * gate ([[gopherRepetition]]'s full 12-signal rule), the classic
    * length/punctuation gate ([[qualityFeatures]]'s thresholds), and
    * the n-gram repetition gate ([[repetitionRatio]] `< repTau`) —
    * evaluated together per document with a majority `keep` verdict
    * (`n_pass >= 2`). Disagreement between gates is the signal a
    * curation review reads: a doc passing Gopher but failing the
    * punctuation gate is markup, one failing only repetition is
    * template spam. Output: `(doc_id, source, gopher_kept,
    * quality_ok, low_rep, n_pass, keep)`.
    *
    * Scale shape: ONE row-local projection over the corpus scan —
    * all three gates are pure expressions (two native kernel calls +
    * array ops), no join of separately-materialized verdict tables,
    * no shuffle, text never leaves the scan. */
  def qualityEnsemble(docs: DataFrame, minTokens: Int = 20,
                      punctTau: Double = 0.05, repTau: Double = 0.2,
                      textCol: String = "text", idCol: String = "doc_id",
                      srcCol: String = "source"): DataFrame = {
    val g = gopherStats(col(textCol))
    val gKept = gopherThresholds
      .map { case (f, th) => round(g.getField(f), 6) <= lit(th) }
      .reduce(_ && _)
    val st = textStats(col(textCol))
    val punct = when(st.getField("n_chars") > 0,
      st.getField("n_punct").cast("double") /
        st.getField("n_chars").cast("double")).otherwise(0.0)
    val qOk = st.getField("n_tokens") >= minTokens && punct < punctTau
    val rOk = round(repetitionRatio(col(textCol), 3), 6) < repTau
    docs.select(col(idCol), col(srcCol), gKept.as("gopher_kept"),
        qOk.as("quality_ok"), rOk.as("low_rep"))
      .withColumn("n_pass",
        (col("gopher_kept").cast("int") + col("quality_ok").cast("int")
          + col("low_rep").cast("int")).cast("long"))
      .withColumn("keep", col("n_pass") >= 2)
  }

  /** Per-source quality pass rates WITH uncertainty — the Wilson
    * score interval (the small-n-safe binomial CI) over
    * [[qualityEnsemble]]'s majority verdict: a 300-doc source at
    * 0.72 and a 3M-doc source at 0.72 are different facts, and
    * threshold decisions ("drop sources under 0.5") should compare
    * interval bounds, not point rates. One row per source:
    * `(source, n_docs, n_keep, rate, ci_lo, ci_hi)`, all arithmetic
    * from exact counts in fixed textual order (replays bit-exact).
    *
    * Scale: the ensemble's zero-shuffle scan + one |sources|-row
    * aggregate; the CI math is per-row arithmetic on the tiny
    * rollup. */
  def qualityCi(docs: DataFrame, z: Double = 1.96,
                textCol: String = "text", idCol: String = "doc_id",
                srcCol: String = "source"): DataFrame = {
    val agg = qualityEnsemble(docs, textCol = textCol, idCol = idCol,
        srcCol = srcCol)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    val n = col("n_docs").cast("double")
    val p = col("n_keep").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n))) / denom
    agg.select(col(srcCol), col("n_docs"), col("n_keep"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("ci_lo"),
      round(center + half, 6).as("ci_hi"))
  }

  /** Per-source excess-loss reweighting — the DoReMi-flavored
    * mixture adjustment (Xie et al. 2023, arXiv:2305.10429, reduced
    * to its one-shot deterministic core): sources whose documents a
    * reference LM finds HARD (high mean negative log-probability)
    * get upweighted relative to easy ones, mixing a uniform floor
    * with the excess term —
    * `raw_s = 1 + max(0, mean_loss_s - min_s mean_loss)`,
    * `weight_s = raw_s / sum raw` — so the easiest source anchors at
    * the floor and no source is zeroed. Consumes a PRECOMPUTED
    * per-doc score table (the [[pplBucketsScored]] deployment shape:
    * score once with [[knLmScore]] / [[bigramLmScore]], persist,
    * reweight many). Output one row per source:
    * `(source, n_docs, mean_loss, excess, weight)`.
    *
    * Determinism: mean loss sums the per-doc (already-rounded)
    * averages through DECIMAL(38,18); the min/sum/divide run over
    * the |sources|-row table in decimal, so the whole report replays
    * bit-exact in SQL.
    *
    * Scale shape: one narrow (id, source) ⋈ (id, score) join onto a
    * per-source aggregate — the corpus-sized work is in the scoring
    * pass, already paid; everything after the groupBy is
    * |sources|-row arithmetic (two broadcast scalars, no second
    * corpus shuffle).
    *
    * EAGER: the per-source rollup (and therefore the scoring join
    * over `docs ⋈ scored`) is materialized AT CONSTRUCTION TIME and
    * re-planted as a |sources|-row local relation — otherwise the
    * min/total/projection consumers each re-evaluate the rollup, and
    * with an unpersisted corpus-sized `scored` chain every
    * re-evaluation re-pays the whole scoring join (measured 4× on
    * llm_reweight_sample). Consequences callers must know: the job
    * runs even if the result is never consumed, input failures
    * surface here rather than at action time, and streaming inputs
    * are not supported. Callers who need laziness should persist
    * `scored` and inline the rollup themselves. */
  def domainReweight(docs: DataFrame, scored: DataFrame,
                     idCol: String = "doc_id",
                     srcCol: String = "source"): DataFrame = {
    val perPlan = docs.select(col(idCol), col(srcCol))
      .join(scored.select(col(idCol), col("avg_logprob")), Seq(idCol))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        round(-(sum(col("avg_logprob").cast("decimal(38,18)"))
          .cast("double")) / count(lit(1)), 6).as("mean_loss"))
    // materialize the |sources|-row rollup ONCE: the min / total /
    // final-projection consumers below each embed `per` in their own
    // plan, and when `scored` is an unpersisted corpus-sized chain
    // (the score-and-reweight one-shot) every re-evaluation re-pays
    // the whole scoring join — measured 4x on llm_reweight_sample
    // (ReweightDiag). Collecting the rollup and re-planting it as a
    // local relation makes the scaladoc's "|sources|-row arithmetic
    // after the groupBy" literally true; the downstream expressions
    // are unchanged, so the output is bit-identical.
    val per = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(perPlan.collect(): _*), perPlan.schema)
    val mn = per.agg(min(col("mean_loss")).as("_mn"))
    val raw = per.crossJoin(broadcast(mn))
      .withColumn("excess", round(col("mean_loss") - col("_mn"), 6))
      .withColumn("_raw", lit(1.0) + col("excess"))
    val tot = raw.agg(
      sum(col("_raw").cast("decimal(38,12)")).cast("double").as("_tot"))
    raw.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_docs"), col("mean_loss"),
        col("excess"),
        round(col("_raw") / col("_tot"), 6).as("weight"))
  }

  /** CCNet head/tail corpus filter: materialize the kept slice of the
    * corpus from [[pplBuckets]]'s per-language perplexity tiers —
    * original doc schema plus the `ppl_bucket` column, keeping buckets
    * `<= keepBuckets` (CCNet keeps head+middle and drops tail; pass 1
    * for head-only). Docs that produce no bigrams (< 2 tokens) have no
    * LM score and are dropped with the tail, matching [[pplBuckets]]'s
    * output domain.
    *
    * Scale: the tier table is one narrow row per doc; joining it back
    * keys on the id, so full text rides exactly one shuffle — or none
    * when AQE broadcasts the filtered tier side. */
  def ccnetFilter(docs: DataFrame, train: DataFrame, nBuckets: Int = 3,
                  keepBuckets: Int = 2, alpha: Double = 0.5,
                  textCol: String = "text", idCol: String = "doc_id",
                  langCol: String = "lang"): DataFrame =
    ccnetFilterScored(docs,
      bigramLmScore(docs, train, alpha, textCol = textCol, idCol = idCol),
      nBuckets, keepBuckets, idCol, langCol)

  /** [[ccnetFilter]] over a precomputed score table (see
    * [[pplBucketsScored]]). */
  def ccnetFilterScored(docs: DataFrame, scored: DataFrame,
                        nBuckets: Int = 3, keepBuckets: Int = 2,
                        idCol: String = "doc_id",
                        langCol: String = "lang"): DataFrame = {
    val kept = pplBucketsScored(docs, scored, nBuckets, idCol, langCol)
      .filter(col("ppl_bucket") <= keepBuckets)
      .select(col(idCol), col("ppl_bucket"))
    docs.join(kept, Seq(idCol))
  }

  /** Top-k collocations by pointwise mutual information:
    * `pmi(w1,w2) = ln( (c12/N2) / ((c1/N1)(c2/N1)) )` over bigram
    * instances, keeping pairs seen at least `minCount` times (PMI is
    * noise at low counts). Classic collocation extraction — finds
    * multi-word units worth protecting from tokenization/shuffling.
    *
    * Scale: two count aggregations (token keys, map-side combine),
    * a minCount cut BEFORE the unigram joins (the bigram table
    * shrinks to frequent pairs first), totals as 1-row broadcasts,
    * TakeOrdered top-k. */
  def pmiTopPairs(docs: DataFrame, k: Int, minCount: Long = 5,
                  textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.withColumn("_tk", tokens(col(textCol)))
      .filter(size(col("_tk")) >= 2)
    val n1 = size(col("_tk")) - 1
    val inst = tk.select(explode(arrays_zip(
        slice(col("_tk"), lit(1), n1).as("w1"),
        slice(col("_tk"), lit(2), n1).as("w2"))).as("z"))
      .select(col("z.w1").as("w1"), col("z.w2").as("w2"))
    val uni = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val nUni = uni.agg(sum(col("cu")).cast("double").as("n1t"))
    val bi = inst.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val nBi = inst.agg(count(lit(1)).cast("double").as("n2t"))
    val pmi = log((col("c12").cast("double") / col("n2t")) /
      ((col("c1").cast("double") / col("n1t")) *
        (col("c2").cast("double") / col("n1t"))))
    bi.join(uni.select(col("w").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c12"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("pmi").desc, col("w1").asc, col("w2").asc)).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("c12"), col("pmi"))
  }

  // ---------------------------------------------------------------
  // vocabulary / OOV
  // ---------------------------------------------------------------

  /** Corpus-wide top-`v` vocabulary by token frequency (ties broken
    * lexicographically): (rank, token, n_occurrences). The heavy agg
    * rides (token -> partial count) with map-side combine; the top-`v`
    * cut is a TakeOrdered, not a global sort. */
  def vocabulary(docs: DataFrame, v: Int, textCol: String = "text")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(v)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("n_occurrences").desc, col("token").asc)).cast("long"))
      .select(col("rank"), col("token"), col("n_occurrences"))
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over token
    * unigram distributions — `Σ_t p_s(t)·ln(p_s(t)/p(t))`, the
    * data-health check that flags a source whose token mix diverges
    * from the corpus (format change, spam influx, wrong decoder).
    * Always finite: the corpus distribution dominates every source by
    * construction, so no smoothing is needed. Per-term contributions
    * sum through DECIMAL(38,18) and round to 6 decimals — replayable
    * in any ANSI engine.
    *
    * Scale: one (source, token) count aggregation with map-side
    * combine is the only corpus-sized shuffle; corpus totals
    * re-aggregate that table (vocab×sources rows); the per-source and
    * grand totals are broadcast-sized. */
  /** Shared skeleton of the drift gauges: the (group, token) count
    * table `c` feeds FOUR consumers (itself, per-token totals,
    * per-group totals, the grand total) — without a persist each one
    * re-runs the corpus explode. The table itself is
    * vocab×groups-sized, so pinning it is cheap at any corpus size;
    * the pin rides the session's Pins registry and is attached to the
    * returned plan. `formula` receives `(ps, p)` — the per-group and
    * corpus-wide token probabilities, evaluated against the
    * c⋈ct⋈ns⋈nt joined row — and produces the per-group aggregate
    * columns. */
  private def driftOver(docs: DataFrame, groupCol: String,
                        textCol: String)(
      formula: (Column, Column) => Seq[Column]): DataFrame = {
    val c = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ct = c.groupBy(col("token")).agg(sum(col("c")).as("ct"))
    val ns = c.groupBy(col(groupCol)).agg(sum(col("c")).as("ns"))
    val nt = ct.agg(sum(col("ct")).as("nt"))
    val ps = col("c").cast("double") / col("ns").cast("double")
    val p = col("ct").cast("double") / col("nt").cast("double")
    val aggs = formula(ps, p)
    val result = c.join(ct, Seq("token")).join(broadcast(ns), Seq(groupCol))
      .crossJoin(broadcast(nt))
      .groupBy(col(groupCol), col("ns"))
      .agg(aggs.head, aggs.tail: _*)
    graft.cache.Pins.track(docs.sparkSession,
      graft.access.Split.Branches(result, c)).value
  }

  def sourceDrift(docs: DataFrame, groupCol: String = "source",
                  textCol: String = "text"): DataFrame =
    driftOver(docs, groupCol, textCol) { (ps, p) =>
      Seq(round(sum((ps * log(ps / p)).cast("decimal(38,18)"))
        .cast("double"), 6).as("kl"))
    }.select(col(groupCol), col("ns").as("n_tokens"), col("kl"))

  /** Per-source Jensen–Shannon drift vs the corpus token
    * distribution — the symmetric, [0, ln 2]-bounded companion of
    * [[sourceDrift]]'s KL: `JS(P_s‖P) = ½KL(P_s‖M) + ½KL(P‖M)`,
    * `M = (P_s+P)/2`. Because a source's tokens are a subset of the
    * corpus's, the sum splits exactly into the terms the source DOES
    * have plus a closed form for the rest: for every token absent
    * from the source, `p·ln(p/(p/2)) = p·ln 2`, so the absent mass
    * contributes `½·ln 2·(1 − Σ_{t∈s} p(t))` — no vocab×sources
    * cross join materializes, the join stays postings-shaped.
    * Same determinism discipline as the KL: per-term contributions
    * sum through DECIMAL(38,18), final arithmetic in doubles,
    * round 6.
    *
    * Scale: identical plan shape to [[sourceDrift]] — one
    * map-side-combined (source, token) aggregation is the only
    * corpus-sized shuffle. */
  def jsDrift(docs: DataFrame, groupCol: String = "source",
              textCol: String = "text"): DataFrame =
    driftOver(docs, groupCol, textCol) { (ps, p) =>
      val m = (ps + p) / lit(2.0)
      Seq(
        sum((lit(0.5) * (ps * log(ps / m) + p * log(p / m)))
          .cast("decimal(38,18)")).cast("double").as("_core"),
        sum(p.cast("decimal(38,18)")).cast("double").as("_covered"))
    }.select(col(groupCol), col("ns").as("n_tokens"),
      round(col("_core") +
        (lit(0.5) * log(lit(2.0))) * (lit(1.0) - col("_covered")), 6)
        .as("js"))

  /** BPE merge-pair statistics: corpus-wide counts of ADJACENT token
    * pairs — the quantity a byte-pair/word-piece tokenizer trainer
    * maximizes over at each merge step (Sennrich et al. 2016,
    * arXiv:1508.07909, counted here at whole-token granularity). Top
    * `k` pairs by count, ties broken lexicographically, with each
    * pair's document frequency alongside (a pair concentrated in few
    * docs is a memorization artifact, not a merge candidate).
    *
    * Scale: pair extraction is a row-local array zip over the token
    * array (no self-join on a position table — that would shuffle the
    * corpus twice); the only corpus-sized shuffle is the (a, b)
    * count aggregate, map-side combined to vocab² at worst and to the
    * observed-pair set in practice. Top-k is a single TakeOrdered. */
  def bpePairStats(docs: DataFrame, k: Int, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs
      .select(col(idCol).as("_doc"), tokens(col(textCol)).as("_tk"))
      .where(size(col("_tk")) >= 2)
      .select(col("_doc"), explode(expr(
        "transform(sequence(1, size(_tk) - 1), " +
          "i -> struct(_tk[i - 1] AS a, _tk[i] AS b))")).as("_p"))
      .select(col("_doc"), col("_p.a").as("a"), col("_p.b").as("b"))
    pairs
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("_doc")).as("n_docs"))
      .orderBy(col("n_pairs").desc, col("a").asc, col("b").asc)
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("n_pairs").desc, col("a").asc, col("b").asc)).cast("long"))
      .select(col("rank"), col("a"), col("b"), col("n_pairs"),
        col("n_docs"))
  }

  /** Blocklist / keyword scrub (the RefinedWeb-style URL+word
    * blocklist gate): per doc, the count and fraction of token
    * instances whose lowercase form exactly matches a blocklist
    * term, a document-level `blocked` verdict (`hit_frac >= tau` —
    * the page-removal rule), and the scrubbed text with every hit
    * removed (the word-level scrub for docs kept). Matching compiles
    * the whole list into ONE anchored literal alternation
    * (`^(?:t1|t2|…)$`, metachars escaped) — a single regex automaton
    * per task whose match cost is independent of list size, against
    * `lower(token)` so case rules replay identically in any engine.
    *
    * Scale shape: entirely row-local — the pattern ships inside the
    * plan (a blocklist is KBs), tokens never explode, text never
    * shuffles; the output is a narrow per-doc projection. */
  def blocklistScrub(docs: DataFrame, terms: Seq[String],
                     tau: Double = 0.1, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val pat = terms.map(escapeRegex).mkString("^(?:", "|", ")$")
    val toks = tokens(col(textCol))
    val kept = filter(toks, t => !lower(t).rlike(pat))
    docs.select(col(idCol), size(toks).cast("long").as("n_tokens"),
        kept.as("_kept"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("_kept"))).cast("long")
          .as("n_hits"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(round((col("n_tokens") - size(col("_kept")))
            .cast("double") / col("n_tokens").cast("double"), 6))
          .as("hit_frac"),
        array_join(col("_kept"), " ").as("text_clean"))
      .withColumn("blocked", col("hit_frac") >= tau)
  }

  /** C4 heuristic cleaning pack (Raffel et al. 2020 §2.2, the
    * "Colossal Clean Crawled Corpus" rules at their published
    * granularity): a LINE is kept iff it ends in a terminal
    * punctuation mark (`.` `!` `?` or a closing double quote), has
    * at least `minWordsPerLine` words, and does not mention
    * javascript; the DOC additionally reports the page-level kill
    * signals — any curly brace (code page) or the phrase
    * "lorem ipsum" (placeholder chrome) — and the final verdict
    * `kept` = at least `minKeptLines` surviving lines and no
    * page-level signal. Output: `(doc_id, n_lines, n_kept,
    * kept_frac, clean_chars, has_brace, has_lorem, kept)`.
    *
    * Scale shape: entirely row-local — one line split + ONE
    * projected filtered array per doc (projected once and reused,
    * the [[blocklistScrub]] no-recompute discipline, since HOFs are
    * CodegenFallback with no CSE); text never shuffles, nothing
    * explodes. Every predicate is ANSI-replayable (`trim` +
    * character-class regex + `lower`/`contains`), so the whole pack
    * oracle-checks line by line. */
  def c4Filter(docs: DataFrame, minWordsPerLine: Int = 3,
               minKeptLines: Int = 1, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keptL = filter(lines, l =>
      size(filter(split(trim(l), " "), w => w =!= "")) >=
        minWordsPerLine &&
      trim(l).rlike("[.!?\"]$") &&
      !lower(l).contains("javascript"))
    docs.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        keptL.as("_kept"),
        col(textCol).contains("{").as("has_brace"),
        lower(col(textCol)).contains("lorem ipsum").as("has_lorem"))
      .select(col(idCol), col("n_lines"),
        size(col("_kept")).cast("long").as("n_kept"),
        round(size(col("_kept")).cast("double") /
          col("n_lines").cast("double"), 6).as("kept_frac"),
        length(array_join(col("_kept"), "\n")).cast("long")
          .as("clean_chars"),
        col("has_brace"), col("has_lorem"),
        (size(col("_kept")) >= minKeptLines &&
          !col("has_brace") && !col("has_lorem")).as("kept"))
  }

  /** Escape every regex metacharacter with a backslash — the
    * portable literal-escaping (unlike `\Q…\E`) that Java regex and
    * RE2 read identically, so the alternation replays in DuckDB. */
  private[llm] def escapeRegex(s: String): String =
    s.flatMap { c =>
      if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else c.toString
    }

  /** BPE tokenizer TRAINER (Sennrich et al. 2016, arXiv:1508.07909):
    * `merges` rounds of (adjacent-pair count → argmax pair → greedy
    * leftmost merge) at character granularity over whitespace
    * tokens, completing the tokenizer story [[bpePairStats]] starts.
    * Returns the ordered merge table `(rank, sym_a, sym_b, n_occ)` —
    * `n_occ` the pair's corpus count AT merge time. Argmax ties
    * break lexicographically on (sym_a, sym_b); training stops early
    * once no adjacent pair remains.
    *
    * The working set is the DISTINCT-WORD table with counts (the
    * standard trainer compression): every round's pair aggregate and
    * merge run over vocab-sized data, however large the corpus — the
    * corpus is scanned exactly once, to build the word table. The
    * merge itself is a row-local string `replace` over a
    * U+0001-delimited symbol string (pattern `␁a␁␁b␁` →
    * `␁ab␁`): left-to-right non-overlapping replacement IS greedy
    * leftmost BPE merging, and the doubled delimiter keeps symbol
    * boundaries intact across consecutive merges — so the whole
    * round replays in any ANSI engine with a plain `replace`.
    * (Symbols therefore must not contain U+0001 — true of any text
    * a tokenizer would see.)
    *
    * Like centroids/codebooks, the merge list is a train-once
    * corpus-version artifact (k bounded rows) and rides the same
    * registry ([[Similarity.memoized]], canonicalized-plan key). */
  def bpeMerges(docs: DataFrame, merges: Int,
                textCol: String = "text")
      : Array[(Long, String, String, Long)] =
    Similarity.memoized(docs, s"bpeTrain:$merges:$textCol") {
      mergeTrainerLoop(docs, merges, textCol,
        argmax = words => words.where(size(col("_a")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(_a) - 1), " +
              "i -> struct(_a[i - 1] AS x, _a[i] AS y))")).as("_p"),
            col("_n"))
          .select(col("_p.x").as("x"), col("_p.y").as("y"), col("_n"))
          .groupBy(col("x"), col("y")).agg(sum(col("_n")).as("c"))
          .orderBy(col("c").desc, col("x").asc, col("y").asc)
          .limit(1).collect(),
        emit = (rank, row) =>
          (rank, row.getString(0), row.getString(1), row.getLong(2)))
    }

  /** The shared merge-trainer loop behind [[bpeMerges]] and
    * [[wordpieceMerges]]: ONE corpus scan builds the distinct-word
    * table (the standard trainer compression — every later round
    * runs over vocab-sized data), then `merges` rounds of
    * (argmax pair over the current symbol lists -> greedy leftmost
    * merge). `argmax` sees the `(_a: array<string>, _n: long)` words
    * table and returns 0-or-1 rows whose FIRST TWO fields are the
    * pair `(x, y)` (empty = trained dry, stop early); `emit` shapes
    * each round's output row. The merge itself is the row-local
    * doubled-U+0001 `replace` (left-to-right non-overlapping
    * replacement IS greedy leftmost merging), so every round replays
    * in any ANSI engine. */
  private def mergeTrainerLoop[T: scala.reflect.ClassTag](
      docs: DataFrame, merges: Int,
      textCol: String,
      argmax: DataFrame => Array[org.apache.spark.sql.Row],
      emit: (Long, org.apache.spark.sql.Row) => T): Array[T] = {
    import org.apache.spark.storage.StorageLevel
    val SEP = "\u0001"
    val D = SEP + SEP
    var words = docs
      .select(explode(tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .select(filter(split(col("_w"), ""), c => c =!= "").as("_a"),
        col("_n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prev: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer[T]()
    var i = 0
    var dry = false
    while (i < merges && !dry) {
      val top = argmax(words)
      // the previous round's table fed this action; release it now
      prev.foreach(_.unpersist()); prev = None
      if (top.isEmpty) dry = true
      else {
        val (x, y) = (top.head.getString(0), top.head.getString(1))
        out += emit(i + 1L, top.head)
        val merged = call_function("replace",
          concat(lit(D), array_join(col("_a"), D), lit(D)),
          lit(SEP + x + D + y + SEP), lit(SEP + x + y + SEP))
        val next = words
          .select(filter(split(merged, D), s => s =!= "").as("_a"),
            col("_n"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(words)
        words = next
      }
      i += 1
    }
    words.unpersist(); prev.foreach(_.unpersist())
    out.toArray
  }

  /** WordPiece tokenizer TRAINER (Schuster & Nakajima 2012; the BERT
    * tokenizer's training rule): the [[bpeMerges]] loop with the
    * LIKELIHOOD argmax — each round merges the adjacent pair
    * maximizing `count(xy) / (count(x)·count(y))` instead of the raw
    * pair count, so rare-but-exclusive pairs (always co-occurring
    * morphemes) win over merely-frequent ones. The score is compared
    * as the EXACT integer `(count(xy) · 10^9) div (count(x)·count(y))`
    * — decimal integral division, no floating point — so the argmax
    * (ties broken lexicographically on the pair) replays bit-for-bit
    * in any engine with integer division; the floored-score
    * granularity is part of the trainer's defined selection rule.
    * Returns `(rank, sym_a, sym_b, n_occ, score_scaled)`.
    *
    * Same scale discipline as BPE: one corpus scan builds the
    * distinct-word table; every round's pair count, symbol count,
    * and merge run over vocab-sized data. Memoized like its
    * sibling. */
  def wordpieceMerges(docs: DataFrame, merges: Int,
                      textCol: String = "text")
      : Array[(Long, String, String, Long, Long)] =
    Similarity.memoized(docs, s"wpTrain:$merges:$textCol") {
      mergeTrainerLoop(docs, merges, textCol,
        argmax = words => {
          val pairs = words.where(size(col("_a")) >= 2)
            .select(explode(expr(
              "transform(sequence(1, size(_a) - 1), " +
                "i -> struct(_a[i - 1] AS x, _a[i] AS y))")).as("_p"),
              col("_n"))
            .select(col("_p.x").as("x"), col("_p.y").as("y"), col("_n"))
            .groupBy(col("x"), col("y")).agg(sum(col("_n")).as("c"))
          val syms = words
            .select(explode(col("_a")).as("z"), col("_n"))
            .groupBy(col("z")).agg(sum(col("_n")).as("cs"))
          pairs
            .join(syms.select(col("z").as("x"), col("cs").as("ca")),
              Seq("x"))
            .join(syms.select(col("z").as("y"), col("cs").as("cb")),
              Seq("y"))
            .select(col("x"), col("y"), col("c"),
              expr("(CAST(c AS DECIMAL(28,0)) * 1000000000) div " +
                "(CAST(ca AS DECIMAL(28,0)) * CAST(cb AS DECIMAL(28,0)))")
                .as("score"))
            .orderBy(col("score").desc, col("x").asc, col("y").asc)
            .limit(1).collect()
        },
        emit = (rank, row) => (rank, row.getString(0), row.getString(1),
          row.getLong(2), row.getLong(3)))
    }

  /** [[wordpieceMerges]] as a DataFrame
    * `(rank, sym_a, sym_b, n_occ, score_scaled)`. */
  def wordpieceTrain(docs: DataFrame, merges: Int,
                     textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    wordpieceMerges(docs, merges, textCol).toSeq
      .toDF("rank", "sym_a", "sym_b", "n_occ", "score_scaled")
  }

  /** APPLY a trained WordPiece model with the tokenizer's REAL
    * inference rule — greedy LONGEST-MATCH-FIRST against the vocab
    * (the BERT `WordpieceTokenizer` loop), which differs from BPE's
    * merge-order replay: at each position the longest vocab symbol
    * matching the remaining word is consumed; a position with no
    * match makes the WHOLE word a single `[UNK]` piece. Vocab =
    * corpus alphabet + the `merges` trained merge outputs (both
    * model-sized; the merge table is memoized, the alphabet is one
    * distinct-char aggregate). Per doc: `(n_tokens, n_wp_tokens,
    * n_unk_words, fertility)`.
    *
    * Scale: encoding runs once per DISTINCT word (vocab-sized) with
    * the broadcast vocab in a partition-local loop; the corpus is
    * scanned once for term frequencies. */
  def wordpieceEncode(docs: DataFrame, merges: Int = 8,
                      textCol: String = "text",
                      idCol: String = "doc_id",
                      applyTo: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    val mergedSyms =
      wordpieceMerges(docs, merges, textCol).map(t => t._2 + t._3)
    // the MODEL (alphabet + merges) comes from the TRAINING docs;
    // held-out text with out-of-alphabet characters hits [UNK]
    val tok = applyTo.getOrElse(docs).select(col(idCol),
      explode(tokens(col(textCol))).as("_w"))
    val words = tok.select(col("_w")).distinct()
    // memoized next to the merges: the alphabet is part of the FROZEN
    // model, so a per-micro-batch caller (fertilityMonitor) must not
    // re-scan the training corpus every batch
    val alpha =
      Similarity.memoized(docs, s"wpAlphabet:$textCol") {
        docs.select(explode(tokens(col(textCol))).as("_tw"))
          .select(explode(filter(split(col("_tw"), ""), c => c =!= ""))
            .as("ch"))
          .distinct().collect().map(_.getString(0))
      }
    val vocab = (alpha ++ mergedSyms).toSet
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val bc = spark.sparkContext.broadcast((vocab, maxLen))
    val schema = StructType(Seq(
      StructField("_w", StringType, nullable = false),
      StructField("_np", LongType, nullable = false),
      StructField("_unk", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pieces = words.mapPartitions { it =>
      val (v, ml) = bc.value
      it.map { r =>
        val w = r.getString(0)
        var pos = 0; var np = 0L; var unk = false
        while (pos < w.length && !unk) {
          var l = math.min(ml, w.length - pos)
          var found = 0
          while (l >= 1 && found == 0) {
            if (v.contains(w.substring(pos, pos + l))) found = l
            l -= 1
          }
          if (found == 0) unk = true
          else { np += 1; pos += found }
        }
        if (unk) org.apache.spark.sql.Row(w, 1L, 1L)
        else org.apache.spark.sql.Row(w, np, 0L)
      }
    }(enc).toDF()
    tok.groupBy(col(idCol), col("_w"))
      .agg(count(lit(1)).as("_tf"))
      .join(pieces, Seq("_w"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_tf") * col("_np")).as("n_wp_tokens"),
        sum(col("_tf") * col("_unk")).as("n_unk_words"))
      .select(col(idCol), col("n_tokens"), col("n_wp_tokens"),
        col("n_unk_words"),
        round(col("n_wp_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("fertility"))
  }

  /** [[bpeMerges]] as a DataFrame `(rank, sym_a, sym_b, n_occ)` —
    * the `queries()` face of the trainer. */
  def bpeTrain(docs: DataFrame, merges: Int,
               textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeMerges(docs, merges, textCol).toSeq
      .toDF("rank", "sym_a", "sym_b", "n_occ")
  }

  /** APPLY a trained BPE model (the encode half of the tokenizer
    * story): per doc, the whitespace token count, the token count
    * under the `merges`-round [[bpeMerges]] model, and the
    * `fertility` (BPE tokens per word — the standard tokenizer-fit
    * gauge: high-fertility docs are out-of-domain for the trained
    * vocabulary). The merge list applies as `merges` chained
    * row-local string replaces in rank order — the exact training
    * replay, one codegen'd projection per (doc, word); no join, no
    * extra explode, text never shuffles. Docs with no tokens are
    * absent (nothing to encode). */
  def bpeEncode(docs: DataFrame, merges: Int = 8,
                textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val ms = bpeMerges(docs, merges, textCol)
    val SEP = "\u0001"
    val D = SEP + SEP
    val sym0: Column = concat(lit(D),
      array_join(filter(split(col("_w"), ""), c => c =!= ""), D),
      lit(D))
    val symK = ms.foldLeft(sym0) { case (s, (_, a, b, _)) =>
      call_function("replace", s,
        lit(SEP + a + D + b + SEP), lit(SEP + a + b + SEP))
    }
    docs.select(col(idCol),
        explode(tokens(col(textCol))).as("_w"))
      .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_tf"))
      .select(col(idCol), col("_tf"),
        size(filter(split(symK, D), s => s =!= "")).cast("long")
          .as("_nsym"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_tf") * col("_nsym")).as("n_bpe_tokens"))
      .select(col(idCol), col("n_tokens"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("fertility"))
  }

  /** Unigram-LM tokenizer trainer (Kudo 2018, arXiv:1804.10959 — the
    * SentencePiece unigram model), the probabilistic companion to the
    * greedy [[bpeMerges]] trainer. Simplified faithfully:
    *
    *  1. SEED: every positional substring (length ≤ `maxPieceLen`)
    *     of every word TYPE, weighted by corpus word count; the vocab
    *     keeps ALL single characters (so every word stays segmentable)
    *     plus the top multi-char pieces by (count desc, piece asc) up
    *     to `vocabSize`; initial `logp = ln(cnt / Σcnt)`.
    *  2. EM (`iters` rounds, fixed vocab): E-step Viterbi-segments
    *     each word type under the current piece log-probs (ties:
    *     fewer pieces, then lexicographically smallest U+0001-joined
    *     path — a suffix-monotonic rule, so the DP and a full
    *     enumeration agree); M-step re-estimates
    *     `logp = ln((c + 1) / (C + |V|))` (Laplace) from the
    *     count-weighted best segmentations. (The reference algorithm
    *     also PRUNES the vocab between rounds; fixed-vocab EM keeps
    *     the oracle replayable and is the documented simplification.)
    *
    * Scale: word types stay DISTRIBUTED — seeding is one explode +
    * sum aggregate, each E-step is a row-local Viterbi over the type
    * table with the ≤`vocabSize`-row model broadcast, each M-step one
    * sum aggregate; only the model (≤ vocabSize rows) ever reaches
    * the driver — the Lloyd-iteration / [[bpeMerges]] registry shape.
    * Returns `(piece, n_occ, logp)`: occurrences in the final E-step
    * and the post-final-M-step log-prob. */
  def unigramModel(docs: DataFrame, vocabSize: Int = 40,
                   maxPieceLen: Int = 4, iters: Int = 2,
                   textCol: String = "text")
      : Array[(String, Long, Double)] =
    unigramModelWith(docs, vocabSize, maxPieceLen, iters, textCol,
      prune = false)

  /** [[unigramModel]] with the reference algorithm's between-rounds
    * PRUNING (`prune = true`): after each E-step, multi-char pieces
    * that earned NO mass in the best segmentations are dropped from
    * the vocabulary before the M-step (singles always survive —
    * coverage is invariant), and the Laplace smoothing denominator
    * shrinks with the vocab. The fixed-vocab form remains the
    * default (and the simpler oracle); this is the
    * SentencePiece-faithful variant. */
  def unigramModelWith(docs: DataFrame, vocabSize: Int = 40,
                       maxPieceLen: Int = 4, iters: Int = 2,
                       textCol: String = "text", prune: Boolean = false)
      : Array[(String, Long, Double)] =
    Similarity.memoized(docs,
      s"unigramTrain:$vocabSize:$maxPieceLen:$iters:$textCol:$prune") {
      val spark = docs.sparkSession
      import spark.implicits._
      import org.apache.spark.storage.StorageLevel
      val wt = docs.select(explode(tokens(col(textCol))).as("_w"))
        .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val w = col("_w")
      val subs = flatten(transform(sequence(lit(0), length(w) - 1), i =>
        transform(
          sequence(lit(1), least(lit(maxPieceLen), length(w) - i)),
          l => w.substr(i + lit(1), l))))
      val seed = wt.select(explode(subs).as("piece"), col("_n"))
        .groupBy(col("piece")).agg(sum(col("_n")).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val singles = seed.filter(length(col("piece")) === 1).collect()
      val nMulti = math.max(vocabSize - singles.length, 0)
      val multi = seed.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(nMulti).collect()
      seed.unpersist()
      val vocab0 = (singles ++ multi)
        .map(r => r.getString(0) -> r.getLong(1))
      val total0 = vocab0.map(_._2).sum.toDouble
      var probs: Map[String, Double] =
        vocab0.map { case (p, c) =>
          p -> math.log(c.toDouble / total0)
        }.toMap
      var lastCounts: Map[String, Long] = Map.empty
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(probs)
        val ml = maxPieceLen
        val cm = wt.as[(String, Long)]
          .flatMap { case (word, n) =>
            viterbiPieces(word, bc.value, ml).map(p => (p, n))
          }
          .toDF("piece", "n")
          .groupBy(col("piece")).agg(sum(col("n")).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        lastCounts = cm
        val ctot = cm.values.sum.toDouble
        val kept =
          if (prune)
            probs.keySet.filter(p =>
              p.length == 1 || cm.getOrElse(p, 0L) > 0L)
          else probs.keySet
        probs = kept.iterator.map { p =>
          val c = cm.getOrElse(p, 0L).toDouble
          p -> math.log((c + 1.0) / (ctot + kept.size.toDouble))
        }.toMap
        bc.unpersist()
        it += 1
      }
      wt.unpersist()
      probs.toArray.sortBy(_._1).map { case (p, lp) =>
        (p, lastCounts.getOrElse(p, 0L), lp)
      }
    }

  /** Viterbi best segmentation of `word` under piece log-probs:
    * maximize Σ logp, ties to fewer pieces, then the smallest
    * U+0001-joined path. With equal piece counts the joined-string
    * order equals element-wise piece order (the separator sorts below
    * every corpus char), so the tie rule is suffix-monotonic and the
    * DP agrees with full enumeration — which is what makes the
    * trainer oracle-replayable. Prefix sums accumulate left-to-right
    * (the enumeration order), so double comparisons are bit-stable. */
  private[graft] def viterbiPieces(word: String,
                                 probs: Map[String, Double],
                                 maxLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val SEP = "\u0001"
    val lp = new Array[Double](n + 1)
    val np = new Array[Int](n + 1)
    val path = new Array[String](n + 1)
    path(0) = ""
    var i = 1
    while (i <= n) {
      var bl = Double.NegativeInfinity
      var bn = 0
      var bp: String = null
      val lmax = math.min(maxLen, i)
      var l = 1
      while (l <= lmax) {
        if (path(i - l) != null) {
          val piece = word.substring(i - l, i)
          probs.get(piece) match {
            case Some(plp) =>
              val clp = lp(i - l) + plp
              val cn = np(i - l) + 1
              val cp = if (path(i - l).isEmpty) piece
                       else path(i - l) + SEP + piece
              if (bp == null || clp > bl || (clp == bl &&
                  (cn < bn || (cn == bn && cp.compareTo(bp) < 0)))) {
                bl = clp; bn = cn; bp = cp
              }
            case None => ()
          }
        }
        l += 1
      }
      lp(i) = bl; np(i) = bn; path(i) = bp
      i += 1
    }
    if (path(n) == null) word.map(_.toString)  // uncovered: fall back
    else path(n).split(SEP, -1).toSeq
  }

  /** [[unigramModel]] as a DataFrame `(piece, n_occ, logp)` — the
    * `queries()` face of the trainer (the [[bpeTrain]] shape). */
  def unigramTrain(docs: DataFrame, vocabSize: Int = 40,
                   maxPieceLen: Int = 4, iters: Int = 2,
                   textCol: String = "text",
                   prune: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    unigramModelWith(docs, vocabSize, maxPieceLen, iters, textCol,
        prune).toSeq
      .toDF("piece", "n_occ", "logp")
      .select(col("piece"), col("n_occ"), round(col("logp"), 6).as("logp"))
  }

  /** APPLY the trained unigram model: per doc, whitespace token
    * count, Viterbi piece count, and fertility — the [[bpeEncode]]
    * gauge under the probabilistic tokenizer. Distinct words segment
    * once (broadcast model, row-local DP), then per-doc tf weights
    * the piece counts — text never shuffles, the join is
    * word-type-keyed. */
  def unigramEncode(docs: DataFrame, vocabSize: Int = 40,
                    maxPieceLen: Int = 4, iters: Int = 2,
                    textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val model = unigramModel(docs, vocabSize, maxPieceLen, iters,
      textCol)
    val probs = model.map(t => t._1 -> t._3).toMap
    val bc = spark.sparkContext.broadcast(probs)
    val ml = maxPieceLen
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("_w"))
      .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_tf"))
    val npieces = tf.select(col("_w")).distinct().as[String]
      .map(word => (word, viterbiPieces(word, bc.value, ml).length.toLong))
      .toDF("_w", "_np")
    tf.join(npieces, Seq("_w"))
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_tf") * col("_np")).as("n_pieces"))
      .select(col(idCol), col("n_tokens"), col("n_pieces"),
        round(col("n_pieces").cast("double") /
          col("n_tokens").cast("double"), 6).as("fertility"))
  }

  /** Feature-hashing document vectors, SPARSE form (Weinberger et
    * al. 2009, "Feature hashing for large scale multitask
    * learning"): each token lands in `pmod(h32(token), dim)` with a
    * hash-derived ±1 sign (bit 16 of the base hash — independent of
    * the bucket bits) debiasing collisions; `v = Σ sign·tf` per
    * (doc, bucket). The MODEL-FREE document embedding: no training,
    * no vocabulary table, pure hash arithmetic — the standard trick
    * for wiring text into the vector operators (ANN, SemDeDup,
    * outliers, k-means topics) when no learned embeddings exist.
    *
    * Everything up to `v` is EXACT integer arithmetic (the audit
    * query and oracle touch doubles only at the final norm/divide).
    * Scale: one token aggregate, then 8-byte (id, bucket) keys —
    * state per doc ≤ dim entries; text never shuffles. */
  def hashEmbedSparse(docs: DataFrame, dim: Int = 64,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val h = graft.functions.SketchOps.h32Column(col("_tok"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_tf"))
      .select(col(idCol), pmod(h, lit(dim.toLong)).as("bucket"),
        (when(shiftrightunsigned(h, 16).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)) * col("_tf")).as("_v"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("_v")).as("v"))
  }

  /** [[hashEmbedSparse]] densified to an L2-normalized
    * `array<double>` of length `dim` — drop-in for the `embedding`
    * column every vector operator consumes. All-zero vectors (a doc
    * whose signs cancel entirely) stay zero. */
  def hashEmbed(docs: DataFrame, dim: Int = 64,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val dense = hashEmbedSparse(docs, dim, textCol, idCol)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("v")))).as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          j => coalesce(element_at(col("_m"), j), lit(0L))
            .cast("double")).as("_raw"))
    dense.select(col(idCol),
      VectorOps.l2Normalize(col("_raw")).as("embedding"))
  }

  /** Text-only cosine top-k over the [[hashEmbedSparse]] vectors —
    * similarity search with NO model and NO dense scan: the sparse
    * dot product runs as a posting-style equi-join on the bucket key
    * (`Σ v_a·v_b` over shared buckets, exact integers), norms are
    * per-doc integer aggregates, and doubles appear only at the
    * final `dot/(|a||b|)`. Query docs are identified by id; `k`
    * results per query ranked by rounded cosine, ties to the
    * smaller doc id (the [[graft.llm.Similarity.bruteTopK]] rule).
    *
    * Sparse-retrieval semantics (the BM25 contract): only docs
    * sharing at least one bucket with the query are scored — a doc
    * with NO shared bucket (true cosine 0) is absent rather than
    * ranked, exactly like a lexical engine never returns a
    * zero-term-overlap doc.
    *
    * Scale: both sides shuffle 8-byte (bucket, id, v) rows; the
    * query side is queries-sized and broadcasts; the per-query rank
    * is the two-phase WindowGroupLimit shape. The dense
    * [[hashEmbed]] + brute path exists for parity, but THIS is the
    * plan you run at corpus scale. */
  def hashTopK(corpus: DataFrame, queries: DataFrame, k: Int,
               dim: Int = 64, textCol: String = "text",
               idCol: String = "doc_id",
               queryIdCol: String = "query_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the corpus-side sparse relation feeds BOTH the norm aggregate
    // and the dot-product join — persist it (Pins-tracked like the
    // bm25 postings) so the tokenize+hash pass over the corpus runs
    // once, not once per consumer subtree
    val c = hashEmbedSparse(corpus, dim, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.cache.Pins.track(corpus.sparkSession, new AutoCloseable {
      def close(): Unit = c.unpersist(blocking = false)
    })
    val q = hashEmbedSparse(
      queries.withColumnRenamed(queryIdCol, idCol), dim, textCol,
      idCol).select(col(idCol).as(queryIdCol),
        col("bucket"), col("v").as("_qv"))
    val cn = c.groupBy(col(idCol))
      .agg(sum(col("v") * col("v")).as("_cn2"))
    val qn = q.groupBy(col(queryIdCol))
      .agg(sum(col("_qv") * col("_qv")).as("_qn2"))
    val dots = c.join(broadcast(q), Seq("bucket"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("v") * col("_qv")).as("_dot"))
    val scored = dots
      .join(cn, Seq(idCol))
      .join(broadcast(qn), Seq(queryIdCol))
      .filter(col("_cn2") > 0 && col("_qn2") > 0)
      .withColumn("cosine", round(col("_dot").cast("double") /
        (sqrt(col("_cn2").cast("double")) *
          sqrt(col("_qn2").cast("double"))), 6))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("cosine"))
  }

  /** Distilled quality/language classifier: a fastText-style linear
    * model over the [[hashEmbedSparse]] bag-of-words features,
    * trained by `rounds` of FULL-BATCH gradient descent against a
    * binary teacher column (a heuristic gate, a language flag, a
    * labeled sample) — the standard way a cheap heuristic is
    * distilled into a score every 100 TB curation pipeline can
    * apply as one projection (CCNet/LLaMA-style quality filtering).
    *
    * Every step is DETERMINISTIC-REPLAYABLE, the trainer-oracle
    * discipline of the BPE/unigram/Lloyd chains: features are the
    * SIGNED PRESENCE values `x = sign(Σ ±tf) ∈ {-1,0,+1}` per bucket
    * plus a bias feature (exact integers end-to-end — see the
    * feature comment in the body for why magnitudes are deliberately
    * flattened), per-doc logits and per-bucket gradients are
    * DECIMAL(38,18)-cast sums (order-free), the weight update is a
    * fixed IEEE chain `w + lr·(g/N)`, and the link is the RATIONAL
    * sigmoid `0.5 + 0.5·z/(1+|z|)` — division and abs are exactly
    * rounded IEEE ops, so unlike exp the replayed training
    * trajectory is bit-identical in any engine, with no
    * round-and-pray step inside the loop. w starts at 0, so round
    * 1's residuals are exact halves. Weights are model-bounded
    * driver state (`dim` doubles per round — the kmeans/BPE
    * pattern); docs with no tokens score exactly 0.5 and never move
    * a gradient.
    *
    * Emits one row per doc: `(idCol, label, score, pred)` with
    * `score = round(σ(w_final·x), 6)` — the deployable artifact is
    * `weights` applied as a free projection on the export scan.
    *
    * Scale: one tokenize+hash pass builds the persisted feature
    * relation (≤ dim rows per doc, text never shuffles again); each
    * round is one dim-bounded aggregate plus one doc-keyed join with
    * map-side partials. Training cost is `rounds` passes over the
    * dim-wide features, not the text. */
  def qualityClassifier(docs: DataFrame, labelExpr: Column,
                        dim: Int = 64, rounds: Int = 16,
                        lr: Double = 32.0, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val (w, hv, lab) =
      trainGateCore(docs, labelExpr, dim, rounds, lr, textCol, idCol)
    lab.join(gateLogits(hv, w, idCol), Seq(idCol), "left")
      .select(col(idCol), col("label"),
        round(gateSigma(coalesce(col("_z"), lit(0.0))), 6).as("score"),
        (gateSigma(coalesce(col("_z"), lit(0.0))) > 0.5).cast("int")
          .as("pred"))
  }

  /** The trainer face alone: returns the `dim + 1` weight vector
    * (bias last) — the DEPLOYABLE artifact. Apply it to any corpus
    * with [[applyLinearGate]]: the standard split where the gate is
    * fit once on a labeled slice and scored over the 100 TB corpus
    * as a projection. */
  def trainLinearGate(docs: DataFrame, labelExpr: Column,
                      dim: Int = 64, rounds: Int = 16,
                      lr: Double = 32.0, textCol: String = "text",
                      idCol: String = "doc_id"): Array[Double] =
    trainGateCore(docs, labelExpr, dim, rounds, lr, textCol, idCol)._1

  /** Score a corpus with a trained gate's weights — no labels, no
    * training state: one feature pass and a dim-bounded literal dot
    * product, `(idCol, score, pred)` per row. The inference face of
    * [[qualityClassifier]]; bit-identical to the scores the combined
    * call emits (spec-proven). */
  def applyLinearGate(docs: DataFrame, weights: Array[Double],
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(weights.length >= 2,
      s"weights must be dim features + bias, got ${weights.length}")
    val dim = weights.length - 1
    val hv = gateFeatures(docs, dim, textCol, idCol)
    docs.select(col(idCol))
      .join(gateLogits(hv, weights, idCol), Seq(idCol), "left")
      .select(col(idCol),
        round(gateSigma(coalesce(col("_z"), lit(0.0))), 6).as("score"),
        (gateSigma(coalesce(col("_z"), lit(0.0))) > 0.5).cast("int")
          .as("pred"))
  }

  /** Threshold calibration for a trained gate: the full
    * precision/recall/F1 sweep over every DISTINCT score of a
    * labeled, scored frame (predict positive iff `score >= t`) —
    * picking the operating point instead of assuming 0.5, the step
    * every deployed filter needs after [[qualityClassifier]]. One
    * row per candidate threshold, descending, with exact-integer
    * tp/fp/fn and round-6 ratios.
    *
    * Scale: the sweep runs over the DISTINCT-SCORE relation, not the
    * corpus — scores are round-6, so it is bounded by 10^6 bins (in
    * practice far fewer); the one ordered cumulative window and the
    * 1-row total broadcast both ride that model-sized relation. */
  def gateThresholdSweep(scored: DataFrame,
                         scoreCol: String = "score",
                         labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = scored.groupBy(col(scoreCol))
      .agg(sum(col(labelCol).cast("long")).as("_p"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("_n"))
    val tot = scored.agg(
      sum(col(labelCol).cast("long")).as("_tpAll"))
    val w = Window.orderBy(col(scoreCol).desc)
    per.crossJoin(broadcast(tot))
      .withColumn("tp", sum(col("_p")).over(w))
      .withColumn("fp", sum(col("_n")).over(w))
      .select(col(scoreCol).as("threshold"), col("tp"), col("fp"),
        (col("_tpAll") - col("tp")).as("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("prec"),
        round(col("tp").cast("double") / col("_tpAll"), 6).as("rec"),
        round(lit(2.0) * col("tp") /
          (lit(2.0) * col("tp") + col("fp") +
            (col("_tpAll") - col("tp"))), 6).as("f1"))
  }

  /** The rational sigmoid `0.5 + 0.5·z/(1+|z|)`: exclusively
    * exactly-rounded IEEE ops (no libm exp), so the link replays
    * bit-identically in any engine. */
  private def gateSigma(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** SIGNED-PRESENCE features per hash bucket, x = sign(Σ ±tf) ∈
    * {-1, 0, +1} — O(1) scale regardless of document length or term
    * frequency, so every bucket competes on class correlation
    * rather than count magnitude (raw or length-normalized counts
    * leave discriminative buckets orders of magnitude below the
    * bulk-vocabulary ones and the link saturates before they are
    * heard). Bucket `dim` is the BIAS feature (x = 1 for every doc):
    * without an intercept a skewed base rate pushes every logit the
    * same way and the boundary cannot move off the origin. */
  private def gateFeatures(docs: DataFrame, dim: Int, textCol: String,
                           idCol: String): DataFrame = {
    val h = graft.functions.SketchOps.h32Column(col("_tok"))
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_tf"))
      .select(col(idCol), pmod(h, lit(dim.toLong)).as("bucket"),
        (when(shiftrightunsigned(h, 16).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)) * col("_tf")).as("_v"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("_v")).as("_sv"))
      .select(col(idCol), col("bucket"),
        signum(col("_sv")).as("x"))
      .unionByName(docs.select(col(idCol),
        lit(dim.toLong).as("bucket"), lit(1.0).as("x")))
  }

  /** Per-doc logit `z = Σ w[b]·x[b]` as a DECIMAL(38,18)-cast sum
    * (order-free). The weights ride a BROADCAST (dim+1)-row frame
    * rather than a plan literal: the generated code is then
    * identical for every GD round (only the broadcast data changes),
    * so the 16-round loop compiles its stage code once instead of
    * once per round — and the broadcast preserves hv's standing
    * id-partitioning for the exchange-free per-doc aggregate. */
  private def gateLogits(hv: DataFrame, w: Array[Double],
                         idCol: String): DataFrame = {
    val spark = hv.sparkSession
    import spark.implicits._
    val wDf = w.zipWithIndex
      .map { case (v, b) => (b.toLong, v) }.toSeq.toDF("bucket", "_w")
    hv.join(broadcast(wDf), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum((col("_w") * col("x")).cast("decimal(38,18)"))
        .as("_zd"))
      .select(col(idCol), col("_zd").cast("double").as("_z"))
  }

  /** The training-feature relation: [[gateFeatures]] with the
    * round-invariant `label` attached ONCE (an id-keyed join paid
    * inside the same exchange that builds the training cache) —
    * the frame every GD round re-reads. package-private so PlanSpec
    * can gate the round plan's exchanges. */
  private[graft] def gateTrainingFeatures(docs: DataFrame,
                                          labelExpr: Column, dim: Int,
                                          textCol: String,
                                          idCol: String): DataFrame =
    gateFeatures(docs, dim, textCol, idCol)
      .join(docs.select(col(idCol),
        labelExpr.cast("int").as("label")), Seq(idCol))

  /** One GD round's per-doc residual `label − σ(w·x)` from the
    * label-carrying feature relation: the logit is the same
    * DECIMAL(38,18)-cast sum as [[gateLogits]] and the label folds
    * into the SAME per-doc aggregate as a max (constant per doc), so
    * the round touches no frame beyond the cached features and the
    * (dim+1)-row broadcast weights — bit-identical residuals to the
    * former label-join form, with zero per-round label movement. */
  private[graft] def gateResiduals(hvl: DataFrame, w: Array[Double],
                                   idCol: String): DataFrame = {
    val spark = hvl.sparkSession
    import spark.implicits._
    val wDf = w.zipWithIndex
      .map { case (v, b) => (b.toLong, v) }.toSeq.toDF("bucket", "_w")
    hvl.join(broadcast(wDf), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum((col("_w") * col("x")).cast("decimal(38,18)"))
        .as("_zd"),
        max(col("label")).as("_lab"))
      .select(col(idCol),
        (col("_lab").cast("double")
          - gateSigma(col("_zd").cast("double"))).as("_r"))
  }

  /** One GD round's full gradient as a SINGLE fused pass over the
    * cached, id-partitioned feature relation (guide §2.4: the former
    * round ran TWO cached scans — the per-doc residual aggregate,
    * then an id-join + dim-keyed shuffle for the gradient — plus an
    * exchange, per round). A partition holds every row of its docs
    * (the standing `repartition(idCol)`), so one `mapPartitions`
    * accumulates per-doc logits, turns them into residuals, and folds
    * per-bucket gradient partials locally; the (dim+1)-row partials
    * combine on the driver. Zero exchanges, one job per round.
    *
    * BIT-IDENTICAL to the SQL round by construction: every arithmetic
    * step replicates the former plan exactly — per-term
    * `cast(w·x as decimal(38,18))` is `BigDecimal(Double.toString(v))
    * .setScale(18, HALF_UP)` (Spark's Cast double→decimal), decimal
    * sums are exact and order-free (so partition order cannot matter),
    * decimal→double is `BigDecimal.doubleValue`, and the rational
    * sigmoid chain runs in the same IEEE op order. The spec asserts
    * equality against the SQL round on a real corpus with nonzero
    * weights.
    *
    * Memory: the pass buffers its partition's feature rows (≤ dim+1
    * rows per doc; partition mass is bounded by the shuffle sizing
    * that built the cache, and the same rows already sit in the
    * block manager). */
  private[graft] def gateRoundGradient(hvl: DataFrame, w: Array[Double],
                                       dim: Int, idCol: String)
      : Map[Int, Double] = {
    val spark = hvl.sparkSession
    import spark.implicits._
    def dec(v: Double): java.math.BigDecimal =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(18, java.math.RoundingMode.HALF_UP)
    val partials = hvl
      .select(col(idCol).as("_id"), col("bucket"), col("x"),
        col("label"))
      .mapPartitions { it =>
        val zd = new java.util.HashMap[Any, java.math.BigDecimal]()
        // label boxed nullable: a NULL label (labelExpr null on the
        // doc) made the SQL round's residual null and its products
        // vanished from the decimal sums — replicate by skipping
        val labelOf = new java.util.HashMap[Any, Integer]()
        val ids = new scala.collection.mutable.ArrayBuffer[Any]()
        val buckets = new scala.collection.mutable.ArrayBuffer[Int]()
        val xs = new scala.collection.mutable.ArrayBuffer[Double]()
        while (it.hasNext) {
          val r = it.next()
          val id = r.get(0)
          val b = r.getLong(1).toInt
          val x = r.getDouble(2)
          zd.merge(id, dec(w(b) * x),
            (a: java.math.BigDecimal, c: java.math.BigDecimal) =>
              a.add(c))
          labelOf.put(id,
            if (r.isNullAt(3)) null else Integer.valueOf(r.getInt(3)))
          ids += id; buckets += b; xs += x
        }
        val g = Array.fill[java.math.BigDecimal](dim + 1)(
          java.math.BigDecimal.ZERO)
        var i = 0
        while (i < ids.length) {
          val lab = labelOf.get(ids(i))
          if (lab != null) {
            val z = zd.get(ids(i)).doubleValue
            val sig = 0.5 + (0.5 * z) / (1.0 + math.abs(z))
            val r = lab.toDouble - sig
            g(buckets(i)) = g(buckets(i)).add(dec(r * xs(i)))
          }
          i += 1
        }
        // zero partials drop out: a bucket whose decimal sum is 0
        // casts to 0.0 — exactly the absent-bucket default below
        (0 to dim).iterator.filter(b => g(b).signum != 0)
          .map(b => (b.toLong, g(b)))
      }
      .collect()
    partials.groupBy(_._1).map { case (b, vs) =>
      b.toInt -> vs.map(_._2).reduce(_.add(_)).doubleValue
    }
  }

  private def trainGateCore(docs: DataFrame, labelExpr: Column,
                            dim: Int, rounds: Int, lr: Double,
                            textCol: String, idCol: String)
      : (Array[Double], DataFrame, DataFrame) = {
    require(rounds >= 1 && dim >= 1 && lr > 0.0,
      s"need rounds >= 1, dim >= 1, lr > 0 (got $rounds, $dim, $lr)")
    val spark = docs.sparkSession
    // the feature relation carries the ROUND-INVARIANT label and is
    // partitioned by doc ONCE, kept for every round: the per-doc
    // logit aggregate and the residual join both reuse the standing
    // HashPartitioning(id), and because the label rides the features
    // no round ever moves a corpus-sized frame again — at 100 TB a
    // per-round broadcast of one-row-per-doc labels would exceed any
    // broadcast limit; here the attach is paid once, inside the same
    // exchange that builds the cache. Each GD round's only exchange
    // is the dim-bounded gradient reduce (rounds x corpus matters).
    val hv = gateTrainingFeatures(docs, labelExpr, dim, textCol, idCol)
      .repartition(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.cache.Pins.track(spark, new AutoCloseable {
      def close(): Unit = hv.unpersist(blocking = false)
    })
    // every doc owns exactly one bias row (bucket = dim), so the
    // (id, label) frame and the training count both ride the cache —
    // no second corpus-sized persist just to hold the labels
    val lab = hv.filter(col("bucket") === dim.toLong)
      .select(col(idCol), col("label"))
    val n = lab.count().toDouble
    var w = Array.fill(dim + 1)(0.0)
    (1 to rounds).foreach { t =>
      // FUSED round (r21, guide §2.4): residuals + gradient in one
      // mapPartitions pass over the cached id-partitioned features —
      // one job, zero exchanges per round, bit-identical decimals
      // (see [[gateRoundGradient]]; the former two-scan SQL round —
      // residual aggregate + id-join + dim-keyed shuffle — remains
      // spec-checked against this one for exact equality. A windowed
      // single-scan SQL variant had measured SLOWER; the fused pass
      // removes the second scan AND the shuffle without a window.)
      val g = gateRoundGradient(hv, w, dim, idCol)
      // 1/t learning-rate decay (Robbins-Monro): big first steps,
      // no late-round ringing — lrT is a driver-computed double the
      // oracle splices verbatim, so the schedule replays exactly
      val lrT = lr / t.toDouble
      w = w.indices.map(b =>
        w(b) + lrT * (g.getOrElse(b, 0.0) / n)).toArray
    }
    (w, hv, lab)
  }

  /** Per-group n-gram diversity: `distinct n-grams / total n-grams`
    * at each window size in `ns` — the self-repetition gauge that
    * flags templated / machine-generated / boilerplate-heavy sources
    * (natural text keeps bigram/trigram diversity high; generated or
    * mirrored content collapses it long before unigram stats notice).
    * One row per (group, n): total window count, distinct count, and
    * the round-6 ratio.
    *
    * Scale shape: per n, one pass — grams leave the scan as 60-bit
    * hashes from the positional kernel (text never shuffles), the
    * group aggregate moves (group, hash) rows with map-side
    * partials. `countDistinct` is exact (the oracle contract); at
    * 100 TB swap `approx_count_distinct` for the one-pass HLL — the
    * `llm_distinct_approx` verdict is the accuracy evidence for that
    * substitution. */
  def ngramDiversity(docs: DataFrame, ns: Seq[Int] = Seq(1, 2, 3),
                     groupCol: String = "source",
                     textCol: String = "text"): DataFrame =
    ns.map { n =>
      docs.select(col(groupCol),
          explode(graft.functions.SketchExprs
            .windowHashes(col(textCol), n)).as("_h"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_total"),
          countDistinct(col("_h")).as("n_distinct"))
        .select(col(groupCol), lit(n).as("n"), col("n_total"),
          col("n_distinct"),
          round(col("n_distinct").cast("double") /
            col("n_total").cast("double"), 6).as("diversity"))
    }.reduce(_ unionByName _)

  /** Per-group out-of-vocabulary rate: the fraction of token
    * INSTANCES not covered by `vocab` (a `vocabulary` result or any
    * frame with a `token` column). The vocab side is v rows —
    * broadcast; the corpus is one explode + agg, text never shuffles. */
  def oovRate(docs: DataFrame, vocab: DataFrame,
              groupCol: String = "lang", textCol: String = "text")
      : DataFrame =
    docs.select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"),
        lit(true).as("_in_vocab"))), Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(when(col("_in_vocab").isNull, 1.0).otherwise(0.0)), 6)
          .as("oov_rate"))

  /** Multinomial Naive-Bayes language classifier, trained in-engine —
    * the model-based upgrade of the [[langId]] heuristic (the
    * fastText-style classifier step of CCNet / FineWeb pipelines,
    * re-expressed as pure relational algebra so training AND scoring
    * are one Catalyst plan, SQL-replayable end to end). Trains
    * per-label token counts with add-`alpha` (Laplace) smoothing on
    * `train` and scores every `docs` row:
    * `score(d, l) = ln P(l) + Σ_t tf(d,t) · ln((c(l,t)+α)/(n_l+α·V))`
    * predicting the argmax label (ties to the lexicographically
    * smallest, scores rounded to 6 places first — the oracle-parity
    * rank key). Returns `(idCol, pred_lang, score)`; with
    * `withConfidence` also the softmax posterior of the predicted
    * label (`1/Σ_l exp(score_l − max)`, row-local over the per-label
    * columns, decimal-cast terms) — the input
    * [[graft.functions.Profile.calibrationReport]] grades.
    *
    * The model is SPARSE: only the observed (label, token) pairs are
    * materialized, each carrying its likelihood DELTA above the
    * label's smoothed floor `ln(α/(n_l+α·V))`; the floor itself is a
    * per-label CONSTANT, so the full score decomposes exactly as
    * `ln P(l) + T_d·floor_l + Σ_{(t,l) seen} tf·(ll − floor_l)` with
    * `T_d` the doc's in-vocab token total — algebraically identical
    * to the dense sum, but nothing |vocab|·|labels|-sized ever
    * exists. Tokens of `docs` outside the (capped) training vocab
    * are skipped entirely (the standard vocabulary-restricted NB
    * convention). `maxVocab` bounds the vocabulary to the top-V
    * tokens by corpus frequency (ties lexicographic — a TakeOrdered
    * cut, the [[vocabulary]] rule), so the model stays
    * vocab-bounded however large the corpus grows.
    *
    * Scale shape: training counts aggregate map-side on (label,
    * token) — the only corpus-sized shuffle on the training scan;
    * the capped count table is pinned (vocab-sized — cheap at any
    * corpus size) because the label totals, vocab size, and delta
    * table all derive from it. Scoring makes two linear passes over
    * `docs` (in-vocab token total; seen-pair delta sums), each a
    * map-side-combined aggregate — document text never rides a
    * shuffle, and the per-label constants join in as a broadcast
    * nested-loop against |docs| rows. The decimal-cast delta sum
    * keeps the per-doc log-likelihood order-free so the score
    * replays bit-exact in any ANSI engine. */
  def nbLangId(docs: DataFrame, train: DataFrame, alpha: Double = 0.5,
               textCol: String = "text", labelCol: String = "lang",
               idCol: String = "doc_id", maxVocab: Int = 1 << 16,
               carryCols: Seq[String] = Nil,
               withConfidence: Boolean = false): DataFrame = {
    val (seen, labels) = nbModel(train, alpha, textCol, labelCol,
      maxVocab)
    // the per-label constants are |labels| rows in a LocalRelation —
    // lifting them into per-label AGG COLUMNS makes scoring ONE
    // corpus shuffle: tf ⋈ (token → {label: dll} map, broadcast),
    // then a single per-doc aggregate with one decimal sum per label
    // (summand tf·(floor + dll_if_seen) — the dense model's own
    // per-token term), and a row-local struct-min argmax (score
    // negated so ties fall to the lexicographically smallest label,
    // the rank rule). No window, no per-label row explosion.
    val labArr = labels.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val keyCols = col(idCol) +: carryCols.map(col)
    if (labArr.isEmpty)
      return docs.select(keyCols :+ lit("").as("pred_lang")
        :+ lit(0.0).as("score"): _*).limit(0)
    val tokModel = seen.groupBy(col("token"))
      .agg(map_from_entries(collect_list(struct(col("_lang"),
        col("_dll")))).as("_lm"))
    val tf = docs.select(keyCols
        :+ explode(tokens(col(textCol))).as("token"): _*)
      .groupBy(keyCols :+ col("token"): _*)
      .agg(count(lit(1)).as("_tf"))
    val aggCols = labArr.zipWithIndex.map { case ((l, floor, _), i) =>
      sum((col("_tf").cast("double") *
          (lit(floor) + coalesce(element_at(col("_lm"), lit(l)),
            lit(0.0))))
        .cast("decimal(38,18)")).as(s"_s_$i")
    }
    val sums = tf.join(broadcast(tokModel), Seq("token"))
      .groupBy(keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val cand = labArr.zipWithIndex.map { case ((l, _, prior), i) =>
      struct((-round(lit(prior) + col(s"_s_$i").cast("double"), 6))
        .as("_m"), lit(l).as("_l"))
    }
    val best =
      if (cand.length == 1) cand.head else least(cand: _*)
    if (!withConfidence)
      sums.select(keyCols :+ best.as("_b"): _*)
        .select(keyCols :+ col("_b._l").as("pred_lang")
          :+ (-col("_b._m")).as("score"): _*)
    else {
      // softmax posterior of the PREDICTED label over the rounded
      // per-label scores: conf = 1/Σ_l exp(score_l − max) — a pure
      // row-local expression over the per-label columns (fixed label
      // order, decimal-cast terms so the sum is order-free and
      // oracle-replayable); numerator is exp(0) = 1 by construction
      val scores = labArr.zipWithIndex.map { case ((_, _, prior), i) =>
        round(lit(prior) + col(s"_s_$i").cast("double"), 6)
      }
      val mx = if (scores.length == 1) scores.head
        else greatest(scores: _*)
      val denom = scores.map(sc =>
        exp(sc - mx).cast("decimal(38,18)")).reduce(_ + _)
      sums.select(keyCols ++ Seq(best.as("_b"),
          round(lit(1.0) / denom.cast("double"), 6)
            .as("confidence")): _*)
        .select(keyCols ++ Seq(col("_b._l").as("pred_lang"),
          (-col("_b._m")).as("score"), col("confidence")): _*)
    }
  }

  /** Train the multinomial NB model on `train`. Returns `(seen,
    * labels)`: `seen(token, _lang, _dll)` holds ONLY the observed
    * (label, token) pairs (vocab-capped to the top-`maxVocab` tokens
    * by corpus frequency, ties lexicographic), `_dll` the likelihood
    * delta above the label's floor
    * `ln((c+α)/(n_l+α·V)) − ln(α/(n_l+α·V))`;
    * `labels(_lang, _floor, _prior)` the per-label smoothed floor
    * and log prior. A scorer reconstructs the exact dense-model sum
    * as `prior + T·floor + Σ tf·dll` (see [[nbLangId]]) — nothing
    * |vocab|·|labels|-sized ever exists, on the driver or off it.
    *
    * Driver/engine split follows the centroid/codebook convention:
    * the per-label CONSTANTS (token total, doc count, floor, prior —
    * |labels| rows, corpus-independent) are collected in one bounded
    * action; the vocab-sized `seen` table stays fully relational,
    * built from the pinned (label, token) count table (corpus-
    * sublinear, three consumers) joined to the broadcast constants.
    * Every label keeps its constants row even if the vocab cap cut
    * all its tokens (token total coalesces to 0, floor = ln(1/V) —
    * the dense formula's own nl=0 value). */
  def nbModel(train: DataFrame, alpha: Double = 0.5,
              textCol: String = "text", labelCol: String = "lang",
              maxVocab: Int = 1 << 16): (DataFrame, DataFrame) = {
    val spark = train.sparkSession
    import spark.implicits._
    val c = train.select(col(labelCol).as("_lang"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("_lang"), col("token"))
      .agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one bounded action: per-label doc counts + UNCAPPED per-label
    // token totals and vocab size. When the vocab already fits the
    // cap (the common case — vocab is corpus-sublinear), the cap is
    // an identity and its whole subplan (top-V cut, re-count,
    // re-total) is skipped; only a genuinely over-cap vocab pays a
    // second bounded action for the capped stats.
    val statsFull = train.groupBy(col(labelCol).as("_lang"))
      .agg(count(lit(1)).as("_ndl"))
      .join(c.groupBy(col("_lang")).agg(sum(col("_c")).as("_nl")),
        Seq("_lang"), "left")
      .crossJoin(c.agg(countDistinct(col("token")).as("_v")))
      .collect()
    val capped = statsFull.nonEmpty &&
      statsFull.head.getAs[Long]("_v") > maxVocab
    val vocabDf = c.groupBy(col("token")).agg(sum(col("_c")).as("_tot"))
      .orderBy(col("_tot").desc, col("token").asc).limit(maxVocab)
      .select(col("token"))
    val cc = if (!capped) c else c.join(vocabDf, Seq("token"))
    val stats =
      if (!capped) statsFull
      else train.groupBy(col(labelCol).as("_lang"))
        .agg(count(lit(1)).as("_ndl"))
        .join(cc.groupBy(col("_lang")).agg(sum(col("_c")).as("_nl")),
          Seq("_lang"), "left")
        // vocabDf is already distinct — a plain count, not a
        // countDistinct expand over the capped pair table
        .crossJoin(vocabDf.agg(count(lit(1)).as("_v")))
        .collect()
    val ndTot = stats.map(_.getAs[Long]("_ndl")).sum.toDouble
    val labels = stats.map { r =>
      val nl = if (r.isNullAt(r.fieldIndex("_nl"))) 0.0
               else r.getAs[Long]("_nl").toDouble
      val denom = nl + alpha * r.getAs[Long]("_v").toDouble
      (r.getAs[String]("_lang"), denom, math.log(alpha / denom),
        math.log(r.getAs[Long]("_ndl").toDouble / ndTot))
    }.sortBy(_._1).toSeq.toDF("_lang", "_denom", "_floor", "_prior")
    val seen = cc
      .join(broadcast(labels.select(col("_lang"), col("_denom"),
        col("_floor"))), Seq("_lang"))
      .select(col("token"), col("_lang"),
        (log((col("_c").cast("double") + lit(alpha)) / col("_denom"))
          - col("_floor")).as("_dll"))
    (graft.cache.Pins.track(spark,
      graft.access.Split.Branches(seen, c)).value,
      labels.select(col("_lang"), col("_floor"), col("_prior")))
  }

  /** Per-doc lexical-diversity quality signals (the RedPajama /
    * fastText-era signal-pack members NOT already covered by
    * [[textStats]] / [[gopherStats]]): type-token ratio, the mass
    * fraction of the single most frequent token, and unigram Shannon
    * entropy at both word and character granularity (natural log;
    * low-entropy docs are keyword stuffing / repeated boilerplate,
    * the classic gibberish gate). Whitespace is excluded from the
    * character alphabet.
    *
    * Entropy is computed by the order-free identity
    * `H = ln n − (Σ c·ln c)/n` so the per-doc sum is a plain decimal
    * aggregate — no per-term probability division, bit-exact replay
    * in any ANSI engine. Zero-token docs report 0 for every signal.
    *
    * Scale shape: one token explode and one char explode, each
    * aggregated per (doc, term) then per doc with map-side partials —
    * document text itself never rides a shuffle, the exploded streams
    * carry (id, short-term) rows. The two per-doc signal tables join
    * back to `docs` on the id (AQE broadcasts them against a big
    * corpus only if they fit; otherwise a co-partitioned shuffle
    * join on the same key both aggregates already used). */
  def qualitySignals(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    def entropyAgg(terms: DataFrame): DataFrame =
      terms.groupBy(col(idCol), col("_t"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col(idCol))
        .agg(sum(col("_c")).as("_n"), count(lit(1)).as("_u"),
          max(col("_c")).as("_mx"),
          sum((col("_c").cast("double") * log(col("_c").cast("double")))
            .cast("decimal(38,18)")).cast("double").as("_sclnc"))
        .select(col(idCol), col("_n"), col("_u"), col("_mx"),
          round(log(col("_n").cast("double")) -
            col("_sclnc") / col("_n").cast("double"), 6).as("_h"))
    val wordSig = entropyAgg(docs.select(col(idCol),
        explode(tokens(col(textCol))).as("_t")))
      .select(col(idCol), col("_n").as("n_tokens"),
        round(col("_u").cast("double") / col("_n").cast("double"), 6)
          .as("ttr"),
        round(col("_mx").cast("double") / col("_n").cast("double"), 6)
          .as("top_token_frac"),
        col("_h").as("token_entropy"))
    val charSig = entropyAgg(docs.select(col(idCol),
        explode(filter(split(col(textCol), ""), c => c =!= " "))
          .as("_t")))
      .select(col(idCol), col("_h").as("char_entropy"))
    docs.select(col(idCol))
      .join(wordSig, Seq(idCol), "left")
      .join(charSig, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("ttr"), lit(0.0)).as("ttr"),
        coalesce(col("top_token_frac"), lit(0.0)).as("top_token_frac"),
        coalesce(col("token_entropy"), lit(0.0)).as("token_entropy"),
        coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"))
  }

  /** Per-source corpus CARD — the one-row-per-source datasheet a
    * curation run publishes (Datasheets-for-Datasets distilled to the
    * relational facts): doc and token volume, the exact-duplicate
    * fraction, and the mean lexical-diversity signals
    * ([[qualitySignals]]'s ttr / token entropy averaged with
    * decimal-exact sums). The glanceable table that says which
    * sources are big, redundant, or templated before any deeper
    * audit runs.
    *
    * Scale: one [[qualitySignals]] pass (text never shuffles), one
    * 64-bit content-hash distinct per source, and a source-keyed
    * aggregate over per-doc narrow rows. */
  def sourceCard(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id",
                 groupCol: String = "source"): DataFrame = {
    val sig = qualitySignals(docs, textCol, idCol)
    docs.select(col(idCol), col(groupCol),
        xxhash64(col(textCol)).as("_h"))
      .join(sig, Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(lit(1.0) - countDistinct(col("_h")).cast("double") /
          count(lit(1)).cast("double"), 6).as("dup_frac"),
        round(sum(col("ttr").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 6).as("avg_ttr"),
        round(sum(col("token_entropy").cast("decimal(38,18)"))
          .cast("double") / count(lit(1)), 6).as("avg_token_entropy"))
  }

  /** In-engine quality classifier (the fastText-classifier analog of
    * the curation stack): a binary multinomial NB trained on the
    * corpus's own Gopher-repetition verdicts — the weak-supervision
    * bootstrap CCNet/FineWeb-style pipelines use when no hand labels
    * exist. Docs passing every [[gopherThresholds]] bound (evaluated
    * on round-6 fractions, the [[gopherRepetition]] rule) become
    * `pass` exemplars, the rest `fail`; [[nbLangId]]'s sparse model
    * then trains and scores in the SAME relational plan, yielding
    * per doc the weak label, the model's verdict, and its score —
    * disagreements (`pass`-labeled docs the token model rejects, and
    * vice versa) are exactly the curation review queue.
    *
    * Scale shape inherits [[nbLangId]]: the gate is a row-local
    * kernel call, training is one (label, token) aggregate, the
    * model is vocab-capped and broadcast, scoring is one corpus
    * shuffle. */
  def qualityNb(docs: DataFrame, alpha: Double = 0.5,
                textCol: String = "text", idCol: String = "doc_id",
                maxVocab: Int = 1 << 16): DataFrame = {
    val g = gopherStats(col(textCol))
    val gate = gopherThresholds
      .map { case (f, th) => round(g.getField(f), 6) <= lit(th) }
      .reduce(_ && _)
    val labeled = docs.withColumn("_q",
      when(gate, "pass").otherwise("fail"))
    nbLangId(labeled, labeled, alpha, textCol, labelCol = "_q",
        idCol, maxVocab, carryCols = Seq("_q"))
      .select(col(idCol), col("_q").as("gopher_label"),
        col("pred_lang").as("pred_label"), col("score"))
  }

  /** Mixed-language / code-switch detection: [[langId]] applied per
    * token CHUNK (the line stand-in, as in [[graft.llm.Dedup
    * .tokenChunks]]) and aggregated to a per-doc dominance report —
    * `purity` = share of chunks agreeing with the dominant language,
    * `is_mixed` flags below-`tau` docs (translations pasted mid-page,
    * boilerplate in another language, code-switched forums). The
    * doc-level [[langId]] can only name ONE language; this is the op
    * that notices when that answer is a blend.
    *
    * Ties on the dominant count resolve to the lexicographically
    * LAST language via a struct max — the same rule as [[langId]]'s
    * own argmax, so the whole report replays in SQL.
    *
    * Scale: chunking and per-chunk langid are row-local (one
    * tokenize pass per chunk through the native kernel); the only
    * shuffles are the (doc, lang) count and the per-doc fold —
    * chunk-bounded, text never leaves the scan. */
  def langPurity(docs: DataFrame, chunkTokens: Int = 10,
                 tau: Double = 0.8, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val perChunk = docs.select(col(idCol),
        explode(graft.llm.Dedup.tokenChunks(col(textCol), chunkTokens))
          .as("_c"))
      .select(col(idCol), langId(col("_c")).as("_l"))
    perChunk.groupBy(col(idCol), col("_l"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(idCol))
      .agg(sum(col("_n")).as("n_chunks"),
        max(struct(col("_n").as("n"), col("_l").as("l"))).as("_best"))
      .select(col(idCol), col("n_chunks"),
        col("_best").getField("l").as("dominant_lang"),
        round(col("_best").getField("n").cast("double") /
          col("n_chunks").cast("double"), 6).as("purity"))
      .withColumn("is_mixed", col("purity") < tau)
  }

  /** Zipf rank-frequency slope per group — the classic corpus-health
    * diagnostic: natural language sits near slope −1 on the log-log
    * rank/frequency line; generated or templated text bends it (flat
    * head = boilerplate saturation, steep tail = vocabulary
    * collapse). Fits OLS over the top `topV` ranks with count >=
    * `minCount` (the power-law region), via the explicit
    * `(nΣxy − ΣxΣy)/(nΣx² − (Σx)²)` form with every sum
    * decimal-exact — accumulation-order-free, so the slope replays
    * bit-identically in any engine (`regr_slope`'s float sums do
    * not).
    *
    * Scale: one (group, token) aggregate with map-side combine
    * (vocab-sized result); the rank window is per-group over vocab
    * rows and the `rank <= topV` cut runs as a per-partition group
    * limit; the fit itself aggregates topV rows per group. */
  def zipfSlope(docs: DataFrame, topV: Int = 100, minCount: Long = 2,
                groupCol: String = "source", textCol: String = "text")
      : DataFrame = {
    val counts = docs
      .select(col(groupCol).as("_g"),
        explode(tokens(col(textCol))).as("_t"))
      .groupBy(col("_g"), col("_t"))
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_c").desc, col("_t").asc)
    val xy = counts.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= topV)
      .select(col("_g"),
        log(col("_r").cast("double")).as("_x"),
        log(col("_c").cast("double")).as("_y"))
    xy.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(col("_x").cast("decimal(38,18)")).cast("double").as("_sx"),
        sum(col("_y").cast("decimal(38,18)")).cast("double").as("_sy"),
        sum((col("_x") * col("_y")).cast("decimal(38,18)"))
          .cast("double").as("_sxy"),
        sum((col("_x") * col("_x")).cast("decimal(38,18)"))
          .cast("double").as("_sxx"))
      // a 1-point group has no line (denominator 0: Spark NULL vs
      // IEEE NaN across engines) — a slope needs >= 2 ranks
      .filter(col("n_ranked") >= 2)
      .select(col("_g").as(groupCol), col("n_ranked"),
        round((col("n_ranked").cast("double") * col("_sxy") -
            col("_sx") * col("_sy")) /
          (col("n_ranked").cast("double") * col("_sxx") -
            col("_sx") * col("_sx")), 6).as("zipf_slope"))
  }

  /** Secret / credential scan — the entropy heuristic of code-corpus
    * secret scanners (truffleHog-family): a token is secret-like when
    * it is long (`>= minLen`), drawn from a key-ish charset
    * (base64/hex/url-safe), and has high character-level Shannon
    * entropy (`>= minEntropy` nats — 32-char hex keys cluster near
    * 2.68, the longest natural words stay under ~2.4). Returns per doc:
    * candidate count, secret-like count, max candidate entropy
    * (−1 when no candidate) and a `has_secret` verdict — the strip
    * gate a code/web curation pass runs before training.
    *
    * Scale shape: the length+charset gate is a row-local prefilter on
    * the token stream, so only the sparse candidate set (rare in
    * prose) explodes to characters; entropy uses the order-free
    * `ln n − (Σ c·ln c)/n` identity with the decimal-summed middle
    * term (engine-replayable, accumulation-order-free). For corpora
    * that are MOSTLY blobs (the gate stops being sparse), fold the
    * per-token loop into a native kernel like [[graft.functions
    * .SketchExprs.winnowPrints]] — same trade, different corpus. */
  def secretScan(docs: DataFrame, minLen: Int = 20,
                 minEntropy: Double = 2.5, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val cand = docs
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("_pos", "_t")))
      .filter(length(col("_t")) >= minLen &&
        col("_t").rlike("^[A-Za-z0-9+/=_.-]+$"))
    val ent = cand
      .select(col(idCol), col("_pos"),
        explode(filter(split(col("_t"), ""), c => c =!= ""))
          .as("_ch"))
      .groupBy(col(idCol), col("_pos"), col("_ch"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol), col("_pos"))
      .agg(sum(col("_c")).as("_n"),
        sum((col("_c").cast("double") * log(col("_c").cast("double")))
          .cast("decimal(38,18)")).cast("double").as("_sclnc"))
      .select(col(idCol),
        round(log(col("_n").cast("double")) -
          col("_sclnc") / col("_n").cast("double"), 6).as("_ent"))
    docs.join(
      ent.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_long_tokens"),
          sum(when(col("_ent") >= minEntropy, 1L).otherwise(0L))
            .as("n_secretish"),
          round(max(col("_ent")), 6).as("max_entropy")),
      Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_long_tokens"), lit(0L)).as("n_long_tokens"),
        coalesce(col("n_secretish"), lit(0L)).as("n_secretish"),
        coalesce(col("max_entropy"), lit(-1.0)).as("max_entropy"),
        (coalesce(col("n_secretish"), lit(0L)) > 0).as("has_secret"))
  }

  /** HTML/markup strip — the extraction kernel between a raw web
    * crawl and every text operator in this pack: drop tags
    * (`<[^>]+>` → space), decode the five ubiquitous entities
    * (`&lt; &gt; &quot; &#39;` first, `&amp;` LAST so
    * `&amp;lt;` correctly yields the literal `&lt;` rather than
    * double-decoding), collapse whitespace runs, and report
    * `(doc_id, tag_count, text_clean, markup_ratio, is_markup)` —
    * `markup_ratio` the char fraction the strip removed,
    * `is_markup` the page-level gate (`tag_count >= minTags`).
    * Every rule is a plain regex/literal replace, so the kernel
    * replays in any engine.
    *
    * Scale shape: pure row-local projection (chained codegen'd
    * regex/literal replaces, each stage projected once — the
    * no-recompute discipline); text never shuffles. */
  def htmlStrip(docs: DataFrame, minTags: Int = 2,
                textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    docs
      .select(col(idCol), length(col(textCol)).as("_n0"),
        size(expr(s"regexp_extract_all($textCol, '<[^>]+>', 0)"))
          .cast("long").as("tag_count"),
        regexp_replace(col(textCol), "<[^>]+>", " ").as("_t"))
      .select(col(idCol), col("_n0"), col("tag_count"),
        trim(regexp_replace(
          entities.foldLeft(col("_t")) { case (c, (e, r)) =>
            regexp_replace(c, e, r)
          }, "\\s+", " ")).as("text_clean"))
      .select(col(idCol), col("tag_count"), col("text_clean"),
        when(col("_n0") > 0,
          round(lit(1.0) -
            length(col("text_clean")).cast("double") /
              col("_n0").cast("double"), 6)).otherwise(0.0)
          .as("markup_ratio"),
        (col("tag_count") >= minTags).as("is_markup"))
  }

  /** Fused safety scan — the pre-release compliance sweep as ONE
    * report: per document the typed PII match counts (email / IPv4 /
    * phone, counted SEQUENTIALLY on the progressively-redacted text
    * so the same [[piiPatterns]] precedence that keeps [[redactPii]]
    * sound also keeps the counts disjoint — a dotted quad is never
    * double-counted as a phone run), the blocklist hit count (the
    * [[blocklistScrub]] anchored-alternation rule), the
    * [[secretScan]] verdict, and the rollup `flagged` = any signal
    * fired. The one-stop answer to "what must legal review before
    * this corpus ships".
    *
    * Scale shape: the PII/blocklist side is a pure row-local
    * projection (chained codegen'd regexes, text never shuffles);
    * the entropy side is [[secretScan]]'s sparse-candidate plan; the
    * two meet in one narrow per-doc join (id + 3 small columns) —
    * no second corpus shuffle, no text on any exchange. */
  def safetyScan(docs: DataFrame, blockTerms: Seq[String],
                 minLen: Int = 20, minEntropy: Double = 2.5,
                 textCol: String = "text", idCol: String = "doc_id",
                 srcCol: String = "source"): DataFrame = {
    require(blockTerms.nonEmpty, "blocklist must not be empty")
    val Seq((emailP, emailR), (ipP, ipR), (phoneP, _)) = piiPatterns
    val blockPat = blockTerms.map(escapeRegex)
      .mkString("^(?:", "|", ")$")
    val toks = tokens(col(textCol))
    // stepwise projection: each redaction stage is projected once
    // and reused (regexes are expensive; HOF-style recompute would
    // double every stage)
    docs.select(col(idCol), col(srcCol), col(textCol),
        size(regexp_extract_all(col(textCol), lit(emailP), lit(0)))
          .cast("long").as("n_email"),
        regexp_replace(col(textCol), emailP, emailR).as("_t1"),
        (size(toks) - size(filter(toks, t => !lower(t).rlike(blockPat))))
          .cast("long").as("n_blocked"))
      .select(col(idCol), col(srcCol), col("n_email"), col("n_blocked"),
        size(regexp_extract_all(col("_t1"), lit(ipP), lit(0)))
          .cast("long").as("n_ip"),
        regexp_replace(col("_t1"), ipP, ipR).as("_t2"))
      .select(col(idCol), col(srcCol), col("n_email"), col("n_ip"),
        size(regexp_extract_all(col("_t2"), lit(phoneP), lit(0)))
          .cast("long").as("n_phone"),
        col("n_blocked"))
      .join(secretScan(docs, minLen, minEntropy, textCol, idCol)
        .select(col(idCol), col("has_secret")), Seq(idCol))
      .select(col(idCol), col(srcCol), col("n_email"), col("n_ip"),
        col("n_phone"), col("n_blocked"), col("has_secret"),
        (col("n_email") + col("n_ip") + col("n_phone") +
          col("n_blocked") > 0 || col("has_secret")).as("flagged"))
  }

  /** Per-source corpus "data card" — the one-table release report a
    * training-data drop ships with: volume (docs/tokens, mean + p90
    * length), predicted language mix (majority [[langId]] language +
    * its share), exact-duplicate rate, and safety exposure (fraction
    * of docs carrying PII patterns / blocklist hits). Each column is
    * an existing audited operator's aggregate; this op just composes
    * them into one config-bindable artifact. Two passes over the
    * per-doc projection (volume aggregate + language mode) — the
    * report runs once per corpus release, so the second scan is
    * cheaper than holding the projection hot.
    *
    * Output, one row per source:
    * `(source, n_docs, n_tokens, mean_tokens, p90_tokens, top_lang,
    * top_lang_frac, exact_dup_frac, pii_doc_frac,
    * blocked_doc_frac)`; language-mode ties break on (count desc,
    * lang asc); the duplicate rate counts 64-bit content hashes
    * (collision odds negligible; the oracle counts distinct text —
    * the [[Dedup.exactGroups]] equivalence). */
  def corpusReport(docs: DataFrame, blockTerms: Seq[String],
                   textCol: String = "text",
                   srcCol: String = "source"): DataFrame = {
    require(blockTerms.nonEmpty, "blocklist must not be empty")
    val Seq((emailP, emailR), (ipP, ipR), (phoneP, _)) = piiPatterns
    val blockPat = blockTerms.map(escapeRegex).mkString("^(?:", "|", ")$")
    val toks = tokens(col(textCol))
    // NULL-text rows carry no measurable content and are EXCLUDED
    // (size(NULL) = -1 would corrupt the token sums, and a NULL text
    // is not a duplicate of anything) — documented population rule
    val perDoc = docs.filter(col(textCol).isNotNull)
      .select(col(srcCol).as("source"),
        tokenCount(col(textCol)).cast("long").as("_ntok"),
        coalesce(langId(col(textCol)), lit("und")).as("_lang"),
        xxhash64(col(textCol)).as("_h"),
        size(regexp_extract_all(col(textCol), lit(emailP), lit(0)))
          .cast("long").as("_ne"),
        regexp_replace(col(textCol), emailP, emailR).as("_t1"),
        (size(toks) - size(filter(toks, t => !lower(t).rlike(blockPat))))
          .cast("long").as("_nb"))
      .select(col("source"), col("_ntok"), col("_lang"), col("_h"),
        col("_nb"),
        (col("_ne") +
          size(regexp_extract_all(col("_t1"), lit(ipP), lit(0)))
            .cast("long")).as("_ne2"),
        regexp_replace(col("_t1"), ipP, ipR).as("_t2"))
      .select(col("source"), col("_ntok"), col("_lang"), col("_h"),
        col("_nb"),
        (col("_ne2") +
          size(regexp_extract_all(col("_t2"), lit(phoneP), lit(0)))
            .cast("long")).as("_npii"))
    val base = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_ntok")).as("n_tokens"),
      round(expr("percentile(CAST(_ntok AS DOUBLE), 0.9)"), 6)
        .as("p90_tokens"),
      count_distinct(col("_h")).as("_nh"),
      sum(when(col("_npii") > 0, 1L).otherwise(0L)).as("_npiid"),
      sum(when(col("_nb") > 0, 1L).otherwise(0L)).as("_nbd"))
    val topLang = perDoc.groupBy(col("source"), col("_lang"))
      .agg(count(lit(1)).as("_lc"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("_lc").desc, col("_lang").asc)))
      .filter(col("_rk") === 1)
      .select(col("source"), col("_lang").as("top_lang"), col("_lc"))
    base.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_tokens"),
        col("p90_tokens"),
        col("top_lang"),
        round(col("_lc").cast("double") /
          col("n_docs").cast("double"), 6).as("top_lang_frac"),
        round(lit(1.0) - col("_nh").cast("double") /
          col("n_docs").cast("double"), 6).as("exact_dup_frac"),
        round(col("_npiid").cast("double") /
          col("n_docs").cast("double"), 6).as("pii_doc_frac"),
        round(col("_nbd").cast("double") /
          col("n_docs").cast("double"), 6).as("blocked_doc_frac"))
  }

  /** Label-vs-prediction confusion matrix of [[nbLangId]] over a
    * labeled corpus: one row per observed (lang, pred_lang) with its
    * document count — the compact training-data QA artifact (the
    * diagonal mass is the classifier/label agreement rate). */
  def nbLangIdConfusion(docs: DataFrame, alpha: Double = 0.5,
                        textCol: String = "text",
                        labelCol: String = "lang",
                        idCol: String = "doc_id"): DataFrame =
    // the true label rides THROUGH the scorer (carryCols) — no
    // re-scan of docs and no id join just to re-attach it
    nbLangId(docs, docs, alpha, textCol, labelCol, idCol,
        carryCols = Seq(labelCol))
      .groupBy(col(labelCol), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-doc zlib compressibility — the classic cheap redundancy
    * gauge (boilerplate, keyboard-mash and template spam compress
    * far below prose; near-random noise barely compresses): output
    * `(idCol, byte_len, zlib_len, ratio)` with
    * `ratio = zlib_len / byte_len` rounded to 6 (empty docs report
    * ratio 1.0). Typical gate: drop the extreme tails on both ends.
    * DETERMINISTIC for a fixed JDK zlib level, but NOT
    * SQL-replayable (DuckDB has no deflate) — this op is
    * spec-verified (planted corpora with known compressibility
    * ordering), the same verification class as the streaming
    * family.
    *
    * Scale: partition-batched like [[graft.llm.Multimodal
    * .extractFeatures]] — ONE Deflater per task reset per row (the
    * expensive native allocation is amortized), iterator-to-
    * iterator, no shuffle; cost is a pure row-local scan. The
    * mapPartitions boundary does cost whole-stage-codegen fusion —
    * acceptable for a kernel that is itself native zlib. */
  def compressionRatio(docs: DataFrame, level: Int = 6,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(level >= 1 && level <= 9, s"zlib level $level")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("byte_len",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("zlib_len",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ratio",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](8192)
        it.map { row =>
          val bytes =
            if (row.isNullAt(1)) Array.empty[Byte]
            else row.getString(1)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var zlen = 0L
          if (bytes.nonEmpty) {
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            while (!deflater.finished()) zlen += deflater.deflate(buf)
          }
          val ratio =
            if (bytes.isEmpty) 1.0
            else BigDecimal(zlen.toDouble / bytes.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          org.apache.spark.sql.Row(row.getLong(0),
            bytes.length.toLong, zlen, ratio)
        }
      }(enc).toDF()
  }

  /** Cohen's κ between two categorical label columns — the
    * chance-corrected agreement gauge for labeler QA (two annotators,
    * a heuristic vs a model, a doc's own tag vs its source's
    * majority): `po` = observed agreement rate,
    * `pe = Σ_c pA(c)·pB(c)` = agreement expected from the marginals
    * alone, `κ = (po − pe)/(1 − pe)`. One output row
    * `(n, po, pe, kappa)`; the degenerate `pe = 1` case (both
    * columns constant — agreement carries no information) reports
    * `κ = 0` by convention. NULL labels count as a category of
    * their own is NOT done here — rows where either side is NULL
    * are excluded (unjudged), the standard treatment.
    *
    * Scale: one scan for the agreement count + two
    * |categories|-row marginal aggregates joined on category — the
    * 1-row results meet by broadcast cross-join (the repo's 1-row
    * aggregate device). Integer counts throughout; the double
    * division happens once on the driver-bound 1-row tail, rounded
    * to 6 (replay convention). */
  def cohenKappa(df: DataFrame, colA: String, colB: String)
      : DataFrame = {
    val d = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).cast("string").as("_a"),
        col(colB).cast("string").as("_b"))
    val base = d.agg(count(lit(1)).as("n"),
      sum(when(col("_a") === col("_b"), 1L).otherwise(0L)).as("_agree"))
    // decimal products/sums: n can be corpus-sized, so na·nb and
    // their sum must not ride 64-bit integers (overflow at ~3e9 n)
    val pe = d.groupBy(col("_a").as("_cat"))
      .agg(count(lit(1)).as("_na"))
      .join(d.groupBy(col("_b").as("_cat"))
        .agg(count(lit(1)).as("_nb")), Seq("_cat"))
      .agg(coalesce(sum(col("_na").cast("decimal(38,0)") *
          col("_nb").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("_pe_num"))
    base.crossJoin(broadcast(pe))
      .select(col("n"),
        round(col("_agree").cast("double") / col("n").cast("double"), 6)
          .as("po"),
        round(col("_pe_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6)
          .as("pe"))
      .select(col("n"), col("po"), col("pe"),
        round(when(col("pe") >= 1.0, lit(0.0))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))),
          6).as("kappa"))
  }
}

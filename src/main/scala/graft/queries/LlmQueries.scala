package graft.queries

import graft.llm._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LLM-data-pipeline operator pack as driver-checkable queries:
  * dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
  * cosine), similarity search (brute top-k / IVF / hyperplane-LSH),
  * text analysis (tokens, quality, lang-ID, fingerprints), multimodal
  * feature plumbing.
  *
  * Oracle policy: exact/SQL-expressible ops get a DuckDB oracle
  * (double-precision formulas that match Spark bit-for-bit after
  * round(…,6)); sketch-based ops (MinHash/SimHash/LSH/IVF) are
  * inherently not SQL-reproducible — they get rows-only checks here
  * and recall assertions against the brute-force ground truth in
  * LlmSpec.
  */
object LlmQueries {
  import Star.table

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup groups: representative + multiplicity per content.
    "llm_exact_dedup" -> ((s, dir) =>
      Dedup.exactGroups(table(s, dir, "documents"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))),

    // exact n-gram Jaccard near-dup pairs (brute-force ground truth).
    "llm_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairsBrute(table(s, dir, "documents"), n = 3,
          threshold = 0.2)
        .orderBy(col("id_a"), col("id_b"))),

    // MinHash+LSH near-dup pairs — the scale path (rows-only check;
    // recall vs brute force asserted in LlmSpec).
    "llm_minhash_pairs" -> ((s, dir) =>
      Dedup.minHashPairs(table(s, dir, "documents"), threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash near-dup pairs (rows-only; maxDist 3 is the regime the
    // 4x16-bit band join covers completely by pigeonhole).
    "llm_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(table(s, dir, "documents"), maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))),

    // near-dup clusters: LSH pairs -> connected components (rows-only;
    // transitive closure is not single-query SQL; planted-cluster
    // semantics asserted in LlmSpec).
    "llm_dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.minHashPairs(table(s, dir, "documents"), threshold = 0.35))
        .orderBy(col("id"))),

    // embedding-cosine near-dup pairs (brute-force ground truth).
    "llm_embedding_pairs" -> ((s, dir) =>
      Dedup.embeddingPairsBrute(table(s, dir, "embeddings"),
          threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // hyperplane-LSH bucketed cosine pairs — scale path (rows-only).
    "llm_lsh_cosine_pairs" -> ((s, dir) =>
      Similarity.lshCosinePairs(table(s, dir, "embeddings"),
          threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // exact cosine top-k: every 100th vector queries the corpus.
    "llm_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      Similarity.bruteTopK(emb, queries, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF cell-probed approximate top-k (rows-only; recall in LlmSpec).
    "llm_ivf_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      Similarity.ivfTopK(emb, queries, k = 10, nCells = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // per-language token statistics (integer-sum exact, then divide;
    // one text_stats kernel pass per row).
    "llm_token_stats" -> ((s, dir) => {
      val st = TextAnalysis.textStats(col("text"))
      table(s, dir, "documents")
        .select(col("lang"), st.getField("n_tokens").as("n_tok"),
          st.getField("n_token_chars").as("n_tok_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          (sum(col("n_tok_chars")).cast("double") /
            sum(col("n_tok"))).as("avg_token_len"))
        .orderBy(col("lang"))
    }),

    // quality features + filter: the classic length/punct gate.
    "llm_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(table(s, dir, "documents"))
        .filter(col("n_tokens") >= 20 && col("punct_ratio") < 0.05)
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_token_len"), 6).as("avg_token_len"),
          round(col("punct_ratio"), 6).as("punct_ratio"))
        .orderBy(col("doc_id"))),

    // language ID by marker-word argmax, aggregated.
    "llm_langid" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))),

    // content fingerprints (xxhash64-based; rows-only).
    "llm_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // multimodal plumbing with a verifiable projection: blob byte
    // length through the partition-batched extractor.
    "llm_mm_bytelen" -> ((s, dir) => {
      val blobs = Multimodal.asBlobs(table(s, dir, "documents"),
        "doc_id", "text", "image")
      Multimodal.extractFeatures(blobs)
        .select(col("media_id"), col("byte_len"))
        .orderBy(col("media_id"))
    }),

    // full multimodal feature extraction + frame-sampling schedule
    // (stub decoder -> rows-only).
    "llm_mm_features" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val blobs = Multimodal.asBlobs(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", "image")
        .unionByName(Multimodal.asBlobs(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", "video"))
      val feats = Multimodal.extractFeatures(blobs)
      val frames = Multimodal.sampleFrames(feats, stride = 10)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
      feats.join(frames, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("n_frames"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy(col("media_id"))
    })
  )

  // DuckDB shingle expression shared by the jaccard oracle
  private val shingleSql =
    """list_distinct(list_transform(
         generate_series(1, greatest(len(toks) - 2, 0)),
         i -> array_to_string(toks[i:i+2], ' ')))"""

  private val cosineSql =
    """round(
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
           t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(b.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"""

  val oracleSql: Map[String, String] = Map(
    "llm_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    "llm_jaccard_pairs" ->
      s"""WITH sh AS (
           SELECT doc_id, $shingleSql AS s
           FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(a.s || b.s)), 6) AS jaccard
         FROM sh a, sh b
         WHERE a.doc_id < b.doc_id
           AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(a.s || b.s)) >= 0.2
         ORDER BY id_a, id_b""",
    "llm_embedding_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosineSql AS cosine
         FROM embeddings a, embeddings b
         WHERE a.vec_id < b.vec_id AND $cosineSql >= 0.4
         ORDER BY id_a, id_b""",
    "llm_topk" ->
      s"""WITH scored AS (
           SELECT b.vec_id AS query_id, a.vec_id AS vec_id,
             $cosineSql AS cosine
           FROM embeddings a, embeddings b
           WHERE b.vec_id % 100 = 0)
         SELECT query_id, rank, vec_id, cosine FROM (
           SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, vec_id ASC) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "llm_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(list_sum(list_transform(toks, t -> strlen(t)))) AS DOUBLE)
             / SUM(len(toks)) AS avg_token_len
         FROM (SELECT lang,
                 list_filter(regexp_split_to_array(text, '\s+'),
                   t -> t <> '') AS toks
               FROM documents)
         GROUP BY lang ORDER BY lang""",
    "llm_quality" ->
      """SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round(CAST(list_sum(list_transform(toks, t -> strlen(t))) AS DOUBLE)
                 / len(toks), 6) AS avg_token_len,
           round(CAST(strlen(text) - strlen(regexp_replace(text,
                   '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
                 / strlen(text), 6) AS punct_ratio
         FROM (SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '\s+'),
                   t -> t <> '') AS toks
               FROM documents)
         WHERE len(toks) >= 20
           AND CAST(strlen(text) - strlen(regexp_replace(text,
                 '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / strlen(text) < 0.05
         ORDER BY doc_id""",
    "llm_langid" ->
      """WITH scored AS (
           SELECT list_max([
             {'hits': len(list_filter(toks, t -> list_contains(
                ['the','a','of','and','to','in','is','that'], t))), 'lang': 'en'},
             {'hits': len(list_filter(toks, t -> list_contains(
                ['el','la','de','y','que','en','los','se'], t))), 'lang': 'es'},
             {'hits': len(list_filter(toks, t -> list_contains(
                ['le','la','de','et','que','les','des','un'], t))), 'lang': 'fr'},
             {'hits': len(list_filter(toks, t -> list_contains(
                ['der','die','und','das','ist','nicht','ein','zu'], t))), 'lang': 'de'},
             {'hits': len(list_filter(toks, t -> list_contains(
                ['的','是','在','了','和','有','我','不'], t))), 'lang': 'zh'}
           ]) AS best
           FROM (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                   t -> t <> '') AS toks FROM documents))
         SELECT CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END
             AS lang_pred,
           COUNT(*) AS n
         FROM scored GROUP BY 1 ORDER BY lang_pred""",
    "llm_mm_bytelen" ->
      """SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS byte_len
         FROM documents ORDER BY media_id"""
  )
}

package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming near-duplicate ingest: the incremental-dedup operator
  * ([[graft.llm.Dedup.minHashPairsAgainst]]) run continuously.
  *
  * The ONLY state is the signature layer on disk — an append-only
  * parquet of `(id, sig)` rows. Each micro-batch (1) near-dup-dedups
  * within itself, (2) LSH-joins its signatures against the layer and
  * drops matches, (3) appends the survivors' documents to the corpus
  * sink and their signatures to the layer. No unbounded in-memory
  * state store: restart recovery is just re-reading the layer, and
  * the same layer serves any number of parallel readers.
  *
  * Scale: per batch, the corpus is touched only through its signature
  * layer (64 longs per document — ~0.5% of a 10 KB document), and the
  * batch side of the LSH join is small, so it broadcasts. At 100 TB
  * the layer is partitioned/bucketed by band hash so each ingest
  * prunes to colliding buckets.
  */
object IngestStream {

  /** The pluggable sketch behind the ingest: how a batch turns into
    * signature rows, and how two signature sets pair up. The replay /
    * ordering / cache-lifecycle machinery of [[ingestBatch]] is
    * sketch-agnostic — text MinHash and codec-free blob SimHash share
    * it verbatim. */
  trait SigScheme extends Serializable {
    /** `(id, …signature columns)`; docs too small to sketch emit no
      * row (they can never near-dup match — they always survive). */
    def signatures(batch: DataFrame, idCol: String): DataFrame
    /** `(id_new, id_corpus, …)` cross-side matches. */
    def pairs(newSigs: DataFrame, corpusSigs: DataFrame): DataFrame
  }

  object SigScheme {
    /** Text MinHash+LSH (the [[graft.llm.Dedup.minHashPairsAgainst]]
      * sketch). */
    final case class MinHash(threshold: Double = 0.7,
                             textCol: String = "text") extends SigScheme {
      def signatures(batch: DataFrame, idCol: String): DataFrame =
        Dedup.minHashSignatures(batch, textCol = textCol, idCol = idCol)
      def pairs(newSigs: DataFrame, corpusSigs: DataFrame): DataFrame =
        Dedup.minHashPairsFromSigs(newSigs, corpusSigs, threshold)
    }

    /** [[MinHash]] with the two-stage verify
      * ([[graft.llm.Dedup.verifiedNearDupPairs]]'s rule): LSH
      * candidates at the permissive `estThreshold`, then each pair
      * confirmed by thresholded Levenshtein under the per-pair bound
      * `floor(maxlen·(1−tau))` — an ingest that never drops a doc on
      * sketch evidence alone. `textOf` resolves `(id, text)` for any
      * id a pair can mention (the current batch plus the standing
      * corpus); it is invoked lazily at pair time, BEFORE this
      * batch's own writes, so it reads the pre-batch corpus. */
    final case class VerifiedMinHash(textOf: () => DataFrame,
                                     tau: Double = 0.8,
                                     estThreshold: Double = 0.35,
                                     textCol: String = "text")
        extends SigScheme {
      def signatures(batch: DataFrame, idCol: String): DataFrame =
        Dedup.minHashSignatures(batch, textCol = textCol, idCol = idCol)
      def pairs(newSigs: DataFrame, corpusSigs: DataFrame): DataFrame = {
        val cand =
          Dedup.minHashPairsFromSigs(newSigs, corpusSigs, estThreshold)
        val txt = textOf()
        val maxLen = greatest(length(col("_ta")), length(col("_tb")))
        val maxDist = floor(maxLen.cast("double") * lit(1.0 - tau))
          .cast("int")
        cand
          .join(txt.select(col("id").as("id_new"), col(textCol).as("_ta")),
            Seq("id_new"))
          .join(txt.select(col("id").as("id_corpus"),
            col(textCol).as("_tb")), Seq("id_corpus"))
          .filter(call_function("levenshtein", col("_ta"), col("_tb"),
            maxDist) >= 0)
          .select(col("id_new"), col("id_corpus"), col("est_jaccard"))
      }
    }

    /** Codec-free blob SimHash ([[graft.llm.Multimodal
      * .blobNearDupPairs]]'s sketch): one long per blob in the layer. */
    final case class BlobSimHash(maxDist: Int = 3,
                                 contentCol: String = "content")
        extends SigScheme {
      def signatures(batch: DataFrame, idCol: String): DataFrame =
        batch.select(col(idCol).as("id"),
          graft.functions.SketchExprs.simhashBytes(col(contentCol))
            .as("simhash"))
          .where(col("simhash").isNotNull)
      def pairs(newSigs: DataFrame, corpusSigs: DataFrame): DataFrame =
        Dedup.simHashPairsAcross(newSigs, corpusSigs, maxDist)
    }

    /** Perceptual image dHash ([[graft.llm.Multimodal.imagePhash]]'s
      * sketch, REAL-decoded pixels): re-encodes and near-identical
      * rasters collide even when their container bytes share no
      * windows — the layer a byte-level sketch cannot provide.
      * Undecodable blobs emit no signature (they always survive;
      * route them through [[BlobSimHash]] for codec-free cover). */
    final case class ImagePhash(maxDist: Int = 3,
                                contentCol: String = "content")
        extends SigScheme {
      def signatures(batch: DataFrame, idCol: String): DataFrame =
        graft.llm.Multimodal.imagePhash(batch, idCol, contentCol)
          .select(col(idCol).as("id"), col("phash").as("simhash"))
          .where(col("simhash").isNotNull)
      def pairs(newSigs: DataFrame, corpusSigs: DataFrame): DataFrame =
        Dedup.simHashPairsAcross(newSigs, corpusSigs, maxDist)
    }

    /** Acoustic fingerprint ([[graft.llm.Multimodal
      * .audioFingerprint]]'s sketch, REAL PCM): container re-encodes
      * (WAV/AIFF/AU of the same samples) collide at Hamming 0; short
      * or undecodable clips emit no signature. */
    final case class AudioFingerprint(maxDist: Int = 3,
                                      contentCol: String = "content")
        extends SigScheme {
      def signatures(batch: DataFrame, idCol: String): DataFrame =
        graft.llm.Multimodal.audioFingerprint(batch, idCol, contentCol)
          .select(col(idCol).as("id"), col("afp").as("simhash"))
          .where(col("simhash").isNotNull)
      def pairs(newSigs: DataFrame, corpusSigs: DataFrame): DataFrame =
        Dedup.simHashPairsAcross(newSigs, corpusSigs, maxDist)
    }
  }

  /** True when `dir` holds a readable parquet dataset. Uses an
    * actual read attempt rather than a top-level file listing, so
    * partitioned/bucketed layer layouts (subdirectories only at the
    * top level) are recognized too. */
  private def layerReadable(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Option[DataFrame] =
    try Some(spark.read.parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** One ingest step (batch semantics — unit-testable; the streaming
    * wrapper calls this per micro-batch). Appends surviving docs to
    * `corpusDir` and their signatures to `sigDir`.
    *
    * Signatures are computed ONCE per batch and shared by the
    * within-batch pairing and the layer join. Documents too short to
    * carry a signature (< 3 tokens) can never near-dup match, so they
    * always survive to the corpus (they are exact-dedup territory);
    * they simply contribute no signature rows.
    *
    * IDEMPOTENT REPLAY: `foreachBatch` is at-least-once — a crash
    * between the two output writes replays the whole batch under the
    * SAME `batchId`. With `batchId` set, both outputs land in
    * batch-keyed partition directories (`<dir>/ingest_batch=<id>`)
    * written with overwrite, so a replay REPLACES the previous
    * attempt's files instead of appending duplicates; and the layer
    * join EXCLUDES this batch's own `ingest_batch` partition, so a
    * replay whose first attempt already published signatures doesn't
    * self-match every survivor into oblivion. Readers of the corpus /
    * layer see one extra `ingest_batch` partition column. With
    * `batchId = None` (plain batch use) both writes are appends —
    * don't mix the two layouts under one directory (parquet partition
    * discovery rejects the mixture). */
  def ingestBatch(batch: DataFrame, corpusDir: String, sigDir: String,
                  threshold: Double = 0.7, textCol: String = "text",
                  idCol: String = "doc_id",
                  batchId: Option[Long] = None): Unit =
    ingestBatchWith(batch, corpusDir, sigDir,
      SigScheme.MinHash(threshold, textCol), idCol, batchId)

  /** [[ingestBatch]] generalized over the sketch ([[SigScheme]]) —
    * the replay contract, write ordering, and cache lifecycle are
    * identical for every scheme. */
  def ingestBatchWith(batch: DataFrame, corpusDir: String, sigDir: String,
                      scheme: SigScheme, idCol: String,
                      batchId: Option[Long] = None): Unit = {
    import org.apache.spark.storage.StorageLevel
    // the clustering path (connectedComponents driver union-find) and
    // the empty-layer stub are long-typed; fail fast on ids that
    // cannot widen, and widen integral ids up front rather than
    // crashing with a mid-job ClassCastException
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType)
        .contains(batch.schema(idCol).dataType),
      s"ingestBatch: $idCol must be an integral id column " +
        s"(got ${batch.schema(idCol).dataType}); hash string ids to " +
        "int64 first (e.g. xxhash64)")
    val spark = batch.sparkSession
    val b = batch.withColumn(idCol, col(idCol).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sigs = scheme.signatures(b, idCol)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // within-batch near-dup clusters: drop non-representatives.
        // Cross-pairing a side with itself emits both directions and
        // self pairs — restrict to the upper triangle first.
        val within = scheme.pairs(sigs, sigs)
          .filter(col("id_new") < col("id_corpus"))
          .select(col("id_new").as("id_a"), col("id_corpus").as("id_b"))
        val comps = Dedup.connectedComponents(within)
        // materialize the dropped-id set, then release comps: the
        // distributed CC branch returns a PERSISTED labels frame that
        // would otherwise leak one cache entry per micro-batch
        val dropWithin = comps.filter(col("id") =!= col("component"))
          .select(col("id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        dropWithin.count()
        comps.unpersist()
        val keptSigs = sigs.join(dropWithin, Seq("id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val dupIds = layerReadable(spark, sigDir) match {
            case Some(layer0) =>
              // replay guard: a prior attempt of THIS batch may have
              // already published its signature partition — joining
              // against it would self-match every survivor
              val layer = batchId match {
                case Some(bid) if layer0.columns.contains("ingest_batch") =>
                  layer0.filter(col("ingest_batch") =!= bid)
                case _ => layer0
              }
              scheme.pairs(keptSigs, layer)
                .select(col("id_new").as("id")).distinct()
                .persist(StorageLevel.MEMORY_AND_DISK)
            case None => spark.emptyDataFrame
              .withColumn("id", lit(0L)).limit(0)
          }
          try {
            val survivorSigs = keptSigs.join(dupIds, Seq("id"), "left_anti")
              .persist(StorageLevel.MEMORY_AND_DISK)
            try {
              // ORDER MATTERS: corpus first, signature layer last. The
              // survivors plan READS sigDir (the LSH anti-join), and
              // any write to sigDir invalidates every cached plan over
              // that path (Spark recacheByPath) — appending signatures
              // first would make the corpus write re-execute the
              // anti-join against a layer that now contains this
              // batch's own signatures, self-matching every survivor
              // to emptiness.
              val dropAll = dropWithin.unionByName(dupIds)
                .withColumnRenamed("id", idCol)
              val survivors = b.join(dropAll, Seq(idCol), "left_anti")
              batchId match {
                case Some(bid) =>
                  // batch-keyed overwrite: replay replaces, never appends
                  survivors.write.mode("overwrite")
                    .parquet(s"$corpusDir/ingest_batch=$bid")
                  survivorSigs.write.mode("overwrite")
                    .parquet(s"$sigDir/ingest_batch=$bid")
                case None =>
                  survivors.write.mode("append").parquet(corpusDir)
                  survivorSigs.write.mode("append").parquet(sigDir)
              }
            } finally { survivorSigs.unpersist(); () }
          } finally {
            dupIds match {
              case d if d.storageLevel != StorageLevel.NONE =>
                d.unpersist(); ()
              case _ => ()
            }
          }
        } finally { keptSigs.unpersist(); () }
      } finally { sigs.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** [[ingestBatch]] with the two-stage verify: candidates never drop
    * a doc on sketch evidence alone — each within-batch and
    * cross-layer pair is confirmed by thresholded edit distance
    * before it counts as a duplicate ([[SigScheme.VerifiedMinHash]]).
    * The text resolver unions the batch with the standing corpus
    * (pre-batch — pairs are built before this batch's writes) and
    * dedups on id so an at-least-once replay, whose first attempt
    * already published this batch's corpus partition, cannot double
    * pair rows. */
  def ingestBatchVerified(batch: DataFrame, corpusDir: String,
                          sigDir: String, tau: Double = 0.8,
                          estThreshold: Double = 0.35,
                          textCol: String = "text",
                          idCol: String = "doc_id",
                          batchId: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    val textOf = () => {
      val bt = batch.select(col(idCol).cast("long").as("id"),
        col(textCol))
      (layerReadable(spark, corpusDir) match {
        case Some(c) => bt.unionByName(
          c.select(col(idCol).cast("long").as("id"), col(textCol)))
        case None => bt
      }).dropDuplicates("id")
    }
    ingestBatchWith(batch, corpusDir, sigDir,
      SigScheme.VerifiedMinHash(textOf, tau, estThreshold, textCol),
      idCol, batchId)
  }

  /** The streaming wrapper: foreachBatch over a document stream. The
    * checkpoint (source offsets + batch ids) defaults to a hidden dir
    * under the signature layer — without one, every restart would
    * replay the whole source, re-appending the sub-3-token documents
    * that intentionally bypass the signature layer. The micro-batch id
    * flows into [[ingestBatch]], so both sinks use batch-keyed
    * overwrite publishing and an at-least-once replay is idempotent
    * (see ingestBatch's replay contract). */
  def nearDupIngest(docs: DataFrame, corpusDir: String, sigDir: String,
                    threshold: Double = 0.7, textCol: String = "text",
                    idCol: String = "doc_id",
                    checkpointDir: Option[String] = None,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$sigDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        ingestBatch(batch.toDF(), corpusDir, sigDir, threshold, textCol,
          idCol, batchId = Some(bid))
      }
      // AvailableNow by default (drain-and-stop, the batch-backfill
      // mode); pass ProcessingTime for a continuously running ingest
      .trigger(trigger)
      .start()

  /** [[nearDupIngest]] with the two-stage verify per micro-batch
    * ([[ingestBatchVerified]]) — same checkpoint/replay contract. */
  def nearDupIngestVerified(docs: DataFrame, corpusDir: String,
                            sigDir: String, tau: Double = 0.8,
                            estThreshold: Double = 0.35,
                            textCol: String = "text",
                            idCol: String = "doc_id",
                            checkpointDir: Option[String] = None,
                            trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$sigDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        ingestBatchVerified(batch.toDF(), corpusDir, sigDir, tau,
          estThreshold, textCol, idCol, batchId = Some(bid))
      }
      .trigger(trigger)
      .start()

  /** One novelty-scoring step (batch semantics — unit-testable; the
    * streaming wrapper calls this per micro-batch): score every doc
    * of the batch against the persisted GRAM layer
    * ([[graft.llm.Dedup.batchNovelty]]'s standing-corpus side as an
    * on-disk artifact of distinct 60-bit window-gram hashes), write
    * the per-doc novelty report, then publish the batch's novel
    * grams to the layer. The layer is the only state — restart
    * recovery is re-reading it, and it grows by NOVEL grams only, so
    * a crawl full of re-ingested content adds ~nothing.
    *
    * Same idempotent-replay contract as [[ingestBatch]]: `batchId`
    * is REQUIRED — both outputs are batch-keyed overwrite partitions
    * and the layer read excludes this batch's own partition, so an
    * at-least-once replay of the same id replaces rather than
    * doubles (an unkeyed append path would silently double the gram
    * layer under retry, so it is not offered). ORDER MATTERS: the
    * report is written FIRST — both plans read `gramDir`, and
    * publishing the grams first would recache the layer path and
    * score the report against a layer already containing this batch
    * (novelty would collapse to zero on replay-free runs too, via
    * recacheByPath). */
  def noveltyBatch(batch: DataFrame, gramDir: String, reportDir: String,
                  n: Int = 8, tau: Double = 0.5,
                  textCol: String = "text", idCol: String = "doc_id",
                  batchId: Long): Unit =
    noveltyBatchWith(
      batch.select(col(idCol), explode(array_distinct(
        graft.functions.SketchExprs.windowHashes(col(textCol), n)))
        .as("h")),
      batch.sparkSession, gramDir, reportDir, tau, idCol, batchId)

  /** [[noveltyBatch]] over CDC chunk keys instead of window grams —
    * the SAME novelty contract with a standing layer ~`div`× smaller
    * (one key per chunk, not per token position), and chunk
    * boundaries that re-synchronize after edits
    * ([[graft.llm.Dedup.cdcChunks]]), so a lightly-edited re-ingest
    * still scores near zero. The layer a continuously-deduped corpus
    * actually wants to carry at 100 TB. */
  def cdcNoveltyBatch(batch: DataFrame, chunkDir: String,
                      reportDir: String, n: Int = 4, div: Int = 16,
                      tau: Double = 0.5, textCol: String = "text",
                      idCol: String = "doc_id", batchId: Long): Unit =
    noveltyBatchWith(
      graft.llm.Dedup.cdcChunks(batch, n, div, textCol, idCol)
        .select(col(idCol), col("chunk_hash").as("h")).distinct(),
      batch.sparkSession, chunkDir, reportDir, tau, idCol, batchId)

  /** Shared novelty core: per-doc unseen-key fraction against the
    * standing key layer, batch-keyed overwrite publishing of both
    * the report and the layer's novel-key growth. */
  private def noveltyBatchWith(bg: DataFrame,
                               spark: org.apache.spark.sql.SparkSession,
                               gramDir: String, reportDir: String,
                               tau: Double, idCol: String,
                               batchId: Long): Unit = {
    import org.apache.spark.storage.StorageLevel
    val layer = layerReadable(spark, gramDir).map { l0 =>
      val l =
        if (l0.columns.contains("ingest_batch"))
          l0.filter(col("ingest_batch") =!= batchId)
        else l0
      l.select(col("h")).distinct()
    }
    // persist the JOINED stream (batch-sized): both outputs derive
    // from it, so the standing-layer scan + distinct + join run once
    // per micro-batch and both writes see one consistent layer
    // snapshot
    val seen = (layer match {
      case Some(l) =>
        bg.join(l.withColumn("_seen", lit(1)), Seq("h"), "left")
      case None => bg.withColumn("_seen", lit(null).cast("int"))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val report = graft.llm.Dedup.noveltyScore(seen, tau, idCol)
      val novelGrams = seen.filter(col("_seen").isNull)
        .select(col("h")).distinct()
      report.write.mode("overwrite")
        .parquet(s"$reportDir/ingest_batch=$batchId")
      novelGrams.write.mode("overwrite")
        .parquet(s"$gramDir/ingest_batch=$batchId")
    } finally { seen.unpersist(); () }
  }

  /** Streaming novelty monitor: [[noveltyBatch]] over a document
    * stream — the live gauge of how much of an ingest feed is new
    * content vs re-crawl, with the gram layer as the only (on-disk,
    * bounded-growth) state. Batch-keyed overwrite publishing makes
    * at-least-once replay idempotent. */
  def noveltyMonitor(docs: DataFrame, gramDir: String,
                     reportDir: String, n: Int = 8, tau: Double = 0.5,
                     textCol: String = "text", idCol: String = "doc_id",
                     checkpointDir: Option[String] = None,
                     trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$gramDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        noveltyBatch(batch.toDF(), gramDir, reportDir, n, tau,
          textCol, idCol, batchId = bid)
      }
      .trigger(trigger)
      .start()

  /** Streaming CDC-novelty monitor: [[cdcNoveltyBatch]] over a
    * document stream — [[noveltyMonitor]]'s contract with the
    * chunk-granularity layer. */
  def cdcNoveltyMonitor(docs: DataFrame, chunkDir: String,
                        reportDir: String, n: Int = 4, div: Int = 16,
                        tau: Double = 0.5, textCol: String = "text",
                        idCol: String = "doc_id",
                        checkpointDir: Option[String] = None,
                        trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$chunkDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        cdcNoveltyBatch(batch.toDF(), chunkDir, reportDir, n, div,
          tau, textCol, idCol, batchId = bid)
      }
      .trigger(trigger)
      .start()

  /** Per-batch safety rollup: [[graft.llm.TextAnalysis.safetyScan]]
    * over one micro-batch, aggregated to one row per source
    * (docs, typed-PII instances, blocklist hits, secret docs,
    * flagged docs) and published under `ingest_batch=<id>` — the
    * compliance gauge of a live ingest feed. Batch-keyed overwrite
    * keeps at-least-once replay idempotent (the [[noveltyBatch]]
    * contract). */
  def safetyBatch(batch: DataFrame, reportDir: String,
                  blockTerms: Seq[String], minLen: Int = 20,
                  minEntropy: Double = 2.5, textCol: String = "text",
                  idCol: String = "doc_id", srcCol: String = "source",
                  batchId: Long): Unit =
    graft.llm.TextAnalysis.safetyScan(batch, blockTerms, minLen,
        minEntropy, textCol, idCol, srcCol)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email") + col("n_ip") + col("n_phone")).as("n_pii"),
        sum(col("n_blocked")).as("n_blocked"),
        sum(when(col("has_secret"), 1L).otherwise(0L)).as("n_secret"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      .write.mode("overwrite")
      .parquet(s"$reportDir/ingest_batch=$batchId")

  /** One tokenizer-drift step: encode the micro-batch with a FROZEN
    * WordPiece model (trained once on `trainDocs` — the trainer is
    * memoized on the canonicalized corpus plan, so repeated batches
    * reuse it) and publish the batch's fit summary: fertility
    * creeping up or [UNK] words appearing means the incoming stream
    * is drifting away from the vocabulary the model was trained on —
    * the tokenizer-side early-warning a training pipeline wants
    * BEFORE the model sees the data. Batch-keyed overwrite partition
    * like every report layer (at-least-once replay idempotent). */
  def fertilityBatch(batch: DataFrame, trainDocs: DataFrame,
                     reportDir: String, merges: Int = 8,
                     textCol: String = "text", idCol: String = "doc_id",
                     batchId: Long): Unit =
    graft.llm.TextAnalysis.wordpieceEncode(trainDocs, merges, textCol,
        idCol, applyTo = Some(batch))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_wp_tokens")).as("n_wp_tokens"),
        sum(col("n_unk_words")).as("n_unk_words"),
        round(sum(col("n_wp_tokens")).cast("double") /
          sum(col("n_tokens")).cast("double"), 6).as("fertility"))
      .write.mode("overwrite")
      .parquet(s"$reportDir/ingest_batch=$batchId")

  /** Streaming tokenizer-drift monitor: [[fertilityBatch]] over a
    * document stream. Stateless (the frozen model is the only
    * standing artifact and it lives in the memo registry). */
  def fertilityMonitor(docs: DataFrame, trainDocs: DataFrame,
                       reportDir: String, merges: Int = 8,
                       textCol: String = "text",
                       idCol: String = "doc_id",
                       checkpointDir: Option[String] = None,
                       trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$reportDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        fertilityBatch(batch.toDF(), trainDocs, reportDir, merges,
          textCol, idCol, batchId = bid)
      }
      .trigger(trigger)
      .start()

  /** Streaming safety monitor: [[safetyBatch]] over a document
    * stream. STATELESS by design — every signal is row-local or
    * batch-local, so there is no standing layer, no state store and
    * no shuffle beyond the per-batch source rollup; the unbounded
    * feed is gated at scan speed. */
  def safetyMonitor(docs: DataFrame, reportDir: String,
                    blockTerms: Seq[String], minLen: Int = 20,
                    minEntropy: Double = 2.5, textCol: String = "text",
                    idCol: String = "doc_id", srcCol: String = "source",
                    checkpointDir: Option[String] = None,
                    trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$reportDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        safetyBatch(batch.toDF(), reportDir, blockTerms, minLen,
          minEntropy, textCol, idCol, srcCol, batchId = bid)
      }
      .trigger(trigger)
      .start()

  /** Streaming distilled-gate scoring: every micro-batch scored
    * under the FROZEN weight artifact persisted by the quality_gate
    * pipeline (or [[graft.llm.TextAnalysis.trainLinearGate]]) — the
    * `(id, score, pred)` rows land batch-keyed (`ingest_batch=<bid>`
    * overwrite ⇒ at-least-once replay replaces). The model is read
    * once at start (dim+1 doubles of driver state); a gate refresh
    * is a new run — the frozen-model drift-monitor discipline. */
  def gateMonitor(docs: DataFrame, weightsDir: String, outDir: String,
                  textCol: String = "text", idCol: String = "doc_id",
                  checkpointDir: Option[String] = None,
                  trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val spark = docs.sparkSession
    val w = spark.read.parquet(weightsDir).orderBy(col("bucket"))
      .collect().map(_.getDouble(1))
    require(w.length >= 2,
      s"$weightsDir is not a gate-weights layer (need dim+1 " +
        s"(bucket, w) rows, found ${w.length})")
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$outDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        graft.llm.TextAnalysis
          .applyLinearGate(batch.toDF(), w, textCol, idCol)
          .write.mode("overwrite")
          .parquet(s"$outDir/ingest_batch=$bid")
      }
      .trigger(trigger)
      .start()
  }

  /** Streaming near-identical-BLOB ingest: [[nearDupIngest]] with the
    * codec-free byte-SimHash sketch — the signature layer holds ONE
    * long per blob, so the standing corpus of a 100 TB media store is
    * consulted through a few GB of sketches. Same idempotent-replay
    * contract; within-batch duplicate groups keep their min-id
    * representative. */
  def blobNearDupIngest(blobs: DataFrame, corpusDir: String,
                        sigDir: String, maxDist: Int = 3,
                        idCol: String = "media_id",
                        contentCol: String = "content",
                        checkpointDir: Option[String] = None,
                        trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    blobs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$sigDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        ingestBatchWith(batch.toDF(), corpusDir, sigDir,
          SigScheme.BlobSimHash(maxDist, contentCol), idCol,
          batchId = Some(bid))
      }
      .trigger(trigger)
      .start()

  /** Streaming PERCEPTUAL media ingest: [[blobNearDupIngest]]
    * generalized over the sketch — pass
    * [[SigScheme.ImagePhash]] for an image stream or
    * [[SigScheme.AudioFingerprint]] for audio, and re-encoded /
    * near-identical media dedups against the standing corpus through
    * an 8-bytes-per-blob signature layer (a 100 TB media store's
    * layer is a few GB). Blobs the scheme cannot sign (undecodable,
    * too short) always survive — chain a [[SigScheme.BlobSimHash]]
    * pass for codec-free cover of those. Same idempotent-replay
    * contract as every ingest face. */
  def mediaNearDupIngest(blobs: DataFrame, corpusDir: String,
                         sigDir: String, scheme: SigScheme,
                         idCol: String = "media_id",
                         checkpointDir: Option[String] = None,
                         trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    blobs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$sigDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        ingestBatchWith(batch.toDF(), corpusDir, sigDir, scheme, idCol,
          batchId = Some(bid))
      }
      .trigger(trigger)
      .start()

  /** One streaming count-min step: the micro-batch's token stream
    * collapsed to its OWN `depth x width` sketch, published under
    * `ingest_batch=<id>` with overwrite — count-min sketches are
    * MERGEABLE (cell-wise sums, Agarwal et al. 2013), so the
    * standing corpus frequency summary is just the cell-wise sum of
    * the batch sketches ([[cmsLayerRead]]), the publishing is
    * idempotent under at-least-once replay (a replayed batch
    * REPLACES its own partition, never double-counts), and total
    * state is ≤ batches·depth·width rows — [[cmsCompact]] folds the
    * committed prefix back to d·w rows whenever convenient,
    * summation is associative. The streaming face of
    * [[graft.llm.HeavyHitters.cmsSketch]]. */
  def cmsBatch(batch: DataFrame, sketchDir: String, depth: Int = 4,
               width: Int = 16, seed: Long = 7L,
               textCol: String = "text", batchId: Long): Unit = {
    publishGeometry(batch.sparkSession, sketchDir, depth, width, seed)
    graft.llm.HeavyHitters.cmsSketch(
        batch.select(explode(
          graft.llm.TextAnalysis.tokens(col(textCol))).as("token")),
        "token", depth, width, seed)
      .write.mode("overwrite")
      .parquet(s"$sketchDir/ingest_batch=$batchId")
  }

  /** Publish the layer's `(depth, width, seed)` as a `_geometry.json`
    * sidecar (underscore-prefixed — invisible to parquet discovery).
    * A layer must be geometry-HOMOGENEOUS to be cell-wise summable,
    * so a second writer with different parameters fails fast here
    * instead of silently publishing unmergeable cells; readers
    * ([[cmsLayerGeometry]]) re-derive the probe parameters from the
    * sidecar instead of re-passing them (the mismatch ADVICE
    * documented: a layer written at non-default width, later probed
    * with defaults, underestimates and breaks one-sided error). */
  /** Serializes concurrent [[publishGeometry]] calls in this JVM —
    * two batch publishes of the SAME layer may run as concurrent
    * driver jobs (the overlapped-publish pattern), and an
    * unsynchronized exists-then-create let one thread open a
    * just-truncated sidecar (ADVICE r20). */
  private val geometryLock = new Object

  private def publishGeometry(spark: org.apache.spark.sql.SparkSession,
                              sketchDir: String, depth: Int,
                              width: Int, seed: Long): Unit =
    geometryLock.synchronized {
      val existing = cmsLayerGeometry(spark, sketchDir)
      existing match {
        case Some((d, w, s)) =>
          require(d == depth && w == width && s == seed,
            s"CMS layer $sketchDir was built with depth=$d width=$w " +
              s"seed=$s; refusing to publish a depth=$depth " +
              s"width=$width seed=$seed batch into it")
        case None =>
          // write-to-temp-then-rename: a reader (or a concurrent
          // writer in ANOTHER process) never observes a partially
          // written sidecar — it sees either no file or a complete one
          val p = new org.apache.hadoop.fs.Path(
            s"$sketchDir/_geometry.json")
          val tmp = new org.apache.hadoop.fs.Path(
            s"$sketchDir/._geometry.json.tmp-" +
              java.util.UUID.randomUUID().toString)
          val fs = p.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          val out = fs.create(tmp, true)
          try out.write(
            s"""{"depth":$depth,"width":$width,"seed":$seed}"""
              .getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, p)) {
            // another writer won the publish: keep theirs, verify ours
            // agrees (geometry homogeneity), drop the temp
            fs.delete(tmp, false)
            cmsLayerGeometry(spark, sketchDir) match {
              case Some((d, w, s)) =>
                require(d == depth && w == width && s == seed,
                  s"CMS layer $sketchDir was concurrently published " +
                    s"with depth=$d width=$w seed=$s; refusing a " +
                    s"depth=$depth width=$width seed=$seed batch")
              case None => throw new IllegalStateException(
                s"could not publish $p (rename failed, no sidecar)")
            }
          }
      }
    }

  /** Read a CMS layer's published `(depth, width, seed)` back from
    * its `_geometry.json` sidecar — the authoritative probe
    * parameters for [[graft.llm.HeavyHitters.cmsLookup]] /
    * `windowedTrending` over this layer. None when the layer has
    * never been written. */
  def cmsLayerGeometry(spark: org.apache.spark.sql.SparkSession,
                       sketchDir: String): Option[(Int, Int, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$sketchDir/_geometry.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def field(k: String): Long = {
        val m = java.util.regex.Pattern.compile(s""""$k":(-?\\d+)""")
          .matcher(txt)
        require(m.find(), s"malformed $p: $txt")
        m.group(1).toLong
      }
      Some((field("depth").toInt, field("width").toInt, field("seed")))
    }
  }

  /** The standing sketch: cell-wise sum over every published batch
    * sketch — `(row, bucket, cnt)`, ≤ depth·width rows, ready for
    * [[graft.llm.HeavyHitters.cmsLookup]] point estimates. Empty
    * (no published batches) reads as an empty sketch. */
  def cmsLayerRead(spark: org.apache.spark.sql.SparkSession,
                   sketchDir: String): DataFrame =
    layerReadable(spark, sketchDir) match {
      case Some(l) => l.groupBy(col("row"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      case None =>
        import spark.implicits._
        Seq.empty[(Int, Long, Long)].toDF("row", "bucket", "cnt")
    }

  /** Compact a CMS layer: fold every batch sketch at or below the
    * `watermark` batch id (including earlier compaction results)
    * into ONE summed sketch — state drops from `batches·d·w` rows
    * to `d·w + tail`, and the fold is exact because count-min cells
    * sum associatively. The result is published under the RESERVED
    * partition id `-(watermark+1)`: batch ids are non-negative, so a
    * compacted partition can never collide with a live or replayed
    * batch, and successive compactions at growing watermarks fold
    * prior compacts in turn (`-(w1+1)` is covered by any
    * `w2 >= w1`).
    *
    * REPLAY CONTRACT: pick `watermark` at or below the newest batch
    * id the stream's checkpoint shows COMMITTED minus any in-flight
    * tail — Structured Streaming only ever replays uncommitted
    * batches, whose ids are all above that, and their partitions are
    * untouched here, so replay-after-compaction keeps the exact
    * overwrite idempotency of [[cmsBatch]].
    *
    * CRASH SAFETY: the summed cells are written to an
    * underscore-prefixed temp dir (invisible to parquet discovery),
    * renamed into the reserved partition, and only then are the
    * source partitions deleted. A crash before the rename leaves
    * the layer exactly as it was (plus invisible garbage a rerun
    * clears); a crash after it leaves a temporarily double-counting
    * layer that the NEXT compaction repairs AT ANY WATERMARK — on
    * entry, every partition covered by an existing compact partition
    * is deleted first (the compact's existence is the proof its mass
    * already landed), so a later scheduled call at a larger watermark
    * folds each batch exactly once. Compaction is therefore
    * idempotent and recovery needs no watermark bookkeeping.
    *
    * Scale: the summed sketch is ≤ d·w rows — the fold's shuffle
    * moves at most that, and the driver materialization is the same
    * fixed-size state every CMS path already holds. */
  def cmsCompact(spark: org.apache.spark.sql.SparkSession,
                 sketchDir: String, watermark: Long): Unit =
    compactPartitions(spark, sketchDir, watermark) { covered =>
      covered.groupBy(col("row"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
        .coalesce(1)
    }

  /** [[cmsCompact]]'s protocol for the NON-summable ingest layers
    * (the signature layer and the corpus layer, whose per-batch
    * partitions accumulate exactly like the sketch's — the
    * small-files problem at 100 TB): fold every batch partition at
    * or below `watermark` into ONE partition holding the SAME rows,
    * rewritten as `targetFiles` right-sized files. Same reserved
    * negative partition id, same crash-safe rename protocol, same
    * replay contract — and the layer's replay guard
    * (`ingest_batch =!= bid`, ingestBatchWith:189) keeps working
    * because a compact partition's negative id never equals a batch
    * id. Size `targetFiles` from the layer's byte count over the
    * shard-size target (the `writeShardedBalanced` rule). */
  def ingestLayerCompact(spark: org.apache.spark.sql.SparkSession,
                         layerDir: String, watermark: Long,
                         targetFiles: Int = 1): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive")
    compactPartitions(spark, layerDir, watermark)(
      _.repartition(targetFiles))
  }

  /** AS-OF read of a batch-keyed layer — time travel to an ingest
    * horizon: the layer as it stood when batch `asOf` was the newest
    * committed batch (live partitions with id ≤ asOf, plus compacts
    * whose coverage fits entirely inside the horizon). Batch ids are
    * the clock, so a pinned `asOf` makes an experiment reproducible
    * against a layer that keeps ingesting — the corpus snapshot a
    * training run should record alongside its config.
    *
    * Partition selection is directory-level (nothing is read to
    * decide), and the `basePath` option keeps `ingest_batch` as a
    * column, so downstream pruning behaves exactly like a full-layer
    * read. A compact partition whose coverage extends PAST the
    * horizon (`-(k+1)` with k > asOf) folded post-horizon mass
    * irreversibly — the call fails fast with the scheduling fix
    * (keep compaction watermarks at or behind every horizon you
    * still need), the same alignment contract retention enforces. */
  def layerReadAsOf(spark: org.apache.spark.sql.SparkSession,
                    layerDir: String, asOf: Long): DataFrame = {
    require(asOf >= 0, s"asOf must be >= 0, got $asOf")
    val root = new org.apache.hadoop.fs.Path(layerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"layerReadAsOf: $layerDir is absent")
    val prefix = "ingest_batch="
    val parts = fs.listStatus(root).map(_.getPath)
      .flatMap(p =>
        if (p.getName.startsWith(prefix))
          p.getName.drop(prefix.length).toLongOption.map(p -> _)
        else None)
    parts.foreach { case (p, id) =>
      if (id < 0) require(-id - 1 <= asOf,
        s"layerReadAsOf: compact partition ${p.getName} folds " +
          s"batches <= ${-id - 1}, past the asOf=$asOf horizon — " +
          s"post-horizon mass is irreversibly mixed in; keep " +
          s"compaction watermarks at or behind every horizon you " +
          s"still need")
    }
    val keep = parts.collect {
      case (p, id) if (id >= 0 && id <= asOf) || id < 0 => p.toString
    }
    require(keep.nonEmpty,
      s"layerReadAsOf: no partition at or before asOf=$asOf")
    spark.read.option("basePath", layerDir)
      .parquet(keep.toIndexedSeq: _*)
  }

  /** Retention age-out for a batch-keyed layer: DELETE every batch
    * partition whose id is below `keepFrom` — the data-retention
    * compliance sibling of [[graft.llm.Takedown]] (takedown removes
    * named ids everywhere; retention removes everything older than a
    * cutoff). Batch ids are the retention clock: a stream that opens
    * one batch per ingest window makes `keepFrom` a time horizon.
    *
    * Scale: whole-partition deletes — no rewrite, no shuffle, no data
    * read; cost is a directory listing plus one row-count over the
    * dropped partitions for the audit (an empty-schema scan: row
    * counts come from parquet footers). At 100 TB this is the ONLY
    * affordable age-out shape, which is why the layers partition by
    * batch id in the first place.
    *
    * Compacted partitions: `-(k+1)` holds the folded mass of every
    * batch ≤ k. It is dropped iff `k < keepFrom` (entirely
    * pre-cutoff). If the cutoff STRADDLES a compact's coverage
    * (`0 < keepFrom <= k`), the pre-cutoff mass cannot be split back
    * out without a rebuild — the call fails fast BEFORE any delete,
    * with the fix in the message: compact at `watermark = keepFrom-1`
    * first, so compaction windows align with retention windows (the
    * schedule a retention-governed layer should run anyway).
    *
    * Crash safety needs no protocol: deletes of whole partitions are
    * idempotent, a rerun converges from any interruption point, and
    * the straddle guard re-evaluates on entry. Returns
    * (partitionsDropped, rowsDropped); (0, 0) when nothing is old
    * enough. Quiesce the writing stream first, as with any layer
    * maintenance. */
  def layerRetention(spark: org.apache.spark.sql.SparkSession,
                     layerDir: String, keepFrom: Long): (Long, Long) = {
    require(keepFrom >= 0, s"keepFrom must be >= 0, got $keepFrom")
    val root = new org.apache.hadoop.fs.Path(layerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root) || keepFrom == 0) return (0L, 0L)
    val prefix = "ingest_batch="
    def partId(p: org.apache.hadoop.fs.Path): Option[Long] =
      if (p.getName.startsWith(prefix))
        p.getName.drop(prefix.length).toLongOption
      else None
    val parts = fs.listStatus(root).map(_.getPath)
      .flatMap(p => partId(p).map(p -> _))
    parts.foreach { case (p, id) =>
      if (id < 0) {
        val k = -id - 1
        require(k < keepFrom,
          s"layerRetention: compact partition ${p.getName} folds " +
            s"batches <= $k, straddling the keepFrom=$keepFrom cutoff " +
            s"— its pre-cutoff mass cannot be split back out; compact " +
            s"at watermark = ${keepFrom - 1} first so compaction " +
            s"windows align with retention windows")
      }
    }
    val drop = parts.filter { case (_, id) =>
      if (id >= 0) id < keepFrom else true // straddle guard passed:
        // every surviving compact is entirely pre-cutoff
    }
    if (drop.isEmpty) return (0L, 0L)
    val rows = spark.read
      .parquet(drop.map(_._1.toString).toIndexedSeq: _*).count()
    drop.foreach { case (p, _) => fs.delete(p, true) }
    spark.catalog.refreshByPath(layerDir)
    (drop.length.toLong, rows)
  }

  private val compactLog =
    org.slf4j.LoggerFactory.getLogger("graft.streaming.compact")

  /** Name of the sidecar each compact partition carries recording the
    * exact source partitions its fold consumed — one line per file,
    * `dirName TAB relativePath TAB length` — so recovery can tell a
    * true crash leftover (content matches what the fold read) from
    * NEW mass that landed under a covered id afterwards (a batch
    * later than an ahead-of-stream watermark, or a checkpoint reset
    * reusing folded ids: parquet part-file names are per-job UUIDs,
    * so reused ids never collide with the recorded listing).
    * Underscore-prefixed, so parquet readers never see it; written
    * into the invisible temp dir, it travels with the rename, atomic
    * with the fold landing. */
  private[graft] val CompactSourcesMarker = "_COMPACT_SOURCES"

  /** Recursive (relativePath, length) listing of one partition dir —
    * the content identity the marker records and recovery compares.
    * Checksum shadows are already hidden by the FS layer. */
  private def fileSig(fs: org.apache.hadoop.fs.FileSystem,
                      dir: org.apache.hadoop.fs.Path)
      : Set[(String, Long)] = {
    val base = dir.toUri.getPath
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toUri.getPath.stripPrefix(base)
          .stripPrefix("/"), st.getLen))
      }
    walk(dir).toSet
  }

  private def writeSourcesMarker(fs: org.apache.hadoop.fs.FileSystem,
                                 dir: org.apache.hadoop.fs.Path,
                                 sources: Seq[(String, Set[(String, Long)])])
      : Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, CompactSourcesMarker), true)
    try out.write(sources.sortBy(_._1).flatMap { case (name, sig) =>
      sig.toSeq.sorted.map { case (rel, len) => s"$name\t$rel\t$len" }
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readSourcesMarker(fs: org.apache.hadoop.fs.FileSystem,
                                dir: org.apache.hadoop.fs.Path)
      : Option[Map[String, Set[(String, Long)]]] = {
    val p = new org.apache.hadoop.fs.Path(dir, CompactSourcesMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSeq
        .map { line =>
          val Array(name, rel, len) = line.split("\t", 3)
          (name, (rel, len.toLong))
        }.groupBy(_._1).map { case (n, xs) =>
          n -> xs.map(_._2).toSet
        })
      finally in.close()
    }
  }

  /** The shared compaction machinery: list `ingest_batch=` partitions
    * covered by the watermark (non-negative ids ≤ watermark, and
    * prior compacts `-(id)-1 ≤ watermark`), apply `fold` to their
    * union, land the result under the reserved id `-(watermark+1)`
    * via write-to-invisible-temp → rename → delete-sources. The
    * reserved partition's existence marks a completed fold, so a
    * rerun only finishes the deletes — see [[cmsCompact]]'s crash
    * matrix.
    *
    * Crash-leftover recovery is MARKER-EXACT: each compact partition
    * carries a [[CompactSourcesMarker]] sidecar naming the source
    * partitions its fold actually consumed, and recovery deletes
    * exactly the still-present named ones. A live partition covered
    * by a compact's watermark but absent from every marker is NOT a
    * leftover — it landed after a compaction ran with a watermark
    * ahead of it, or after a lost checkpoint restarted micro-batch
    * ids — and it survives to be folded by a later compaction
    * (reads stay correct throughout: serving unions compacts with
    * live batches). The pre-marker scheme deleted every live id
    * below the max coverage on entry, silently losing exactly that
    * late-landing mass. */
  private[graft] def compactPartitions(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, watermark: Long)
      (fold: DataFrame => DataFrame): Unit = {
    require(watermark >= 0, s"watermark must be >= 0, got $watermark")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val prefix = "ingest_batch="
    def partId(p: org.apache.hadoop.fs.Path): Option[Long] =
      if (p.getName.startsWith(prefix))
        p.getName.drop(prefix.length).toLongOption
      else None
    def covered(id: Long): Boolean =
      if (id >= 0) id <= watermark else -id - 1 <= watermark
    val targetId = -(watermark + 1)
    val target = new org.apache.hadoop.fs.Path(root, s"$prefix$targetId")
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"_compact_tmp_$watermark")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // INVARIANT RESTORATION (crash between a fold's rename and its
    // source deletes, at any earlier watermark): finish exactly the
    // deletes each landed compact's marker records. Markerless
    // (pre-upgrade) compacts coexisting with covered live partitions
    // are ambiguous — refuse loudly rather than guess.
    fs.listStatus(root).map(_.getPath)
      .filter(p => partId(p).exists(_ < 0)).foreach { cp =>
        readSourcesMarker(fs, cp) match {
          case Some(recorded) => recorded.foreach { case (n, sig) =>
            val p = new org.apache.hadoop.fs.Path(root, n)
            if (fs.exists(p)) {
              if (fileSig(fs, p) == sig) fs.delete(p, true)
              else compactLog.warn(
                s"compactPartitions: $dir/$n is covered by " +
                  s"${cp.getName} but its content differs from what " +
                  "that fold consumed — treating it as NEW mass " +
                  "(late landing or checkpoint-reset id reuse) and " +
                  "keeping it live for a later fold")
            }
          }
          case None =>
            val jcov = -partId(cp).get - 1
            val ambiguous = fs.listStatus(root).map(_.getPath)
              .filter(p => p.getName != cp.getName && partId(p).exists(
                id => if (id >= 0) id <= jcov else -id - 1 < jcov))
              .map(_.getName)
            require(ambiguous.isEmpty,
              s"compactPartitions: $dir has a markerless compact " +
                s"${cp.getName} coexisting with partitions it covers " +
                s"(${ambiguous.mkString(", ")}) — cannot tell crash " +
                "leftovers from late-landing batches; inspect with " +
                "layerDoctor and delete or re-key them manually")
        }
      }
    val sources = fs.listStatus(root).map(_.getPath)
      .filter(p => partId(p).exists(id => covered(id) && id != targetId))
    if (fs.exists(target)) {
      // a previous attempt already landed the fold — the marker
      // restoration above finished its deletes; a markerless target
      // is legacy, where every covered source was by construction
      // consumed by the fold that produced it
      if (readSourcesMarker(fs, target).isEmpty)
        sources.foreach(fs.delete(_, true))
    } else if (sources.nonEmpty) {
      val maxLive = sources.flatMap(partId).filter(_ >= 0)
        .foldLeft(-1L)(math.max)
      if (maxLive >= 0 && watermark > maxLive)
        compactLog.warn(
          s"compactPartitions: watermark $watermark is ahead of the " +
            s"newest landed batch $maxLive in $dir — batches landing " +
            s"in ($maxLive, $watermark] after this fold will stay " +
            "live until a later compaction covers them (correct, but " +
            "usually a scheduling bug)")
      // snapshot the source content identities BEFORE the fold reads
      // them — the marker must describe exactly what was consumed
      val sourceSigs = sources.map(p =>
        p.getName -> fileSig(fs, p)).toIndexedSeq
      fold(spark.read.parquet(sources.map(_.toString).toIndexedSeq: _*))
        .write.parquet(tmp.toString)
      writeSourcesMarker(fs, tmp, sourceSigs)
      require(fs.rename(tmp, target),
        s"compaction rename $tmp -> $target failed")
      sources.foreach(fs.delete(_, true))
    }
    spark.catalog.refreshByPath(dir)
  }

  /** Streaming lexical-index maintenance: each micro-batch publishes
    * its postings + stats partitions via
    * [[graft.llm.TextAnalysis.bm25PostingsBatch]] (batch-keyed
    * overwrite ⇒ at-least-once replay replaces), so the standing
    * index is ALWAYS serveable through
    * [[graft.llm.TextAnalysis.bm25TopKFromPostings]] and answers
    * bit-identically to a from-scratch build over everything
    * ingested. [[ingestLayerCompact]] bounds the file count on both
    * subdirs. The streaming face of the BM25 postings layer —
    * the cmsMonitor pattern for the lexical ranker. */
  def bm25Monitor(docs: DataFrame, indexDir: String,
                  textCol: String = "text", idCol: String = "doc_id",
                  checkpointDir: Option[String] = None,
                  trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        graft.llm.TextAnalysis.bm25PostingsBatch(batch.toDF(),
          indexDir, bid, textCol, idCol)
      }
      .trigger(trigger)
      .start()

  /** Live vector-index ingest: each micro-batch of embeddings lands
    * as one [[graft.llm.Similarity.ivfAppendBatch]] delta batch keyed
    * by the micro-batch id — at-least-once replay REPLACES the batch
    * partition (the same overwrite discipline as [[bm25Monitor]]'s
    * postings), so the serving union main ∪ delta never
    * double-counts; new vectors are searchable as soon as their batch
    * commits, with no main-partition rewrite on the hot path.
    * Schedule [[graft.llm.Similarity.ivfCompactDelta]] between runs
    * (quiesced) when the segment grows past its usefulness; the
    * checkpoint lives under the index's own `_checkpoints` by
    * default. The index must already exist with its centroid sidecar
    * — a stream cannot train the model it assigns under. */
  def ivfMonitor(vectors: DataFrame, indexDir: String,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 checkpointDir: Option[String] = None,
                 trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        graft.llm.Similarity.ivfAppendBatch(batch.sparkSession,
          indexDir, batch.toDF(), bid, idCol, vecCol): Unit
      }
      .trigger(trigger)
      .start()

  /** Index-drift monitor: per micro-batch of embeddings, the
    * [[graft.llm.Similarity.indexFitReport]] gauge against the
    * standing index's sidecar centroids, published batch-keyed
    * (overwrite ⇒ replay replaces) — rising `mean_sqdist` /
    * `frac_beyond` across batches is the measured signal to run the
    * refresh trilogy (kmeansUpdate → cellMigration → ivfPatchIndex)
    * BEFORE recall degrades. The monitor never retrains and never
    * touches the index itself — pure observation, one narrow pass
    * per batch, one row of state each. */
  def ivfFitMonitor(vectors: DataFrame, indexDir: String,
                    reportDir: String, tau: Double,
                    vecCol: String = "embedding",
                    checkpointDir: Option[String] = None,
                    trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$reportDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        val spark = batch.sparkSession
        val cents = graft.llm.Similarity
          .ivfIndexCentroids(spark, indexDir).getOrElse(
            throw new IllegalArgumentException(
              s"$indexDir has no centroid sidecar — the monitor " +
                "gauges fit against a standing ivfWriteIndex layout"))
        graft.llm.Similarity.indexFitReport(batch.toDF(), cents, tau,
            vecCol)
          .write.mode("overwrite")
          .parquet(s"$reportDir/ingest_batch=$bid")
      }
      .trigger(trigger)
      .start()
  }

  /** Codebook-drift monitor — [[ivfFitMonitor]]'s PQ sibling: per
    * micro-batch of embeddings, the
    * [[graft.llm.Similarity.pqFitReport]] quantization-error gauge
    * against the standing [[graft.llm.Similarity.pqWriteIndex]]
    * layout's `_books.txt` sidecar, published batch-keyed (overwrite
    * ⇒ replay replaces). Rising `mean_qerr` / `frac_beyond` is the
    * measured signal to retrain books and run
    * [[graft.llm.Similarity.pqPatchIndex]] BEFORE ADC ranking
    * quality degrades. Pure observation — never retrains, never
    * touches the code table; one narrow pass per batch, one row of
    * state each. */
  def pqFitMonitor(vectors: DataFrame, indexDir: String,
                   reportDir: String, tau: Double,
                   vecCol: String = "embedding",
                   checkpointDir: Option[String] = None,
                   trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$reportDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        val spark = batch.sparkSession
        val books = graft.llm.Similarity
          .pqIndexBooks(spark, indexDir).getOrElse(
            throw new IllegalArgumentException(
              s"$indexDir has no codebook sidecar — the monitor " +
                "gauges fit against a standing pqWriteIndex layout"))
        graft.llm.Similarity.pqFitReport(batch.toDF(), books, tau,
            vecCol)
          .write.mode("overwrite")
          .parquet(s"$reportDir/ingest_batch=$bid")
      }
      .trigger(trigger)
      .start()
  }

  /** Wide-geometry event-time trending: the SAME semantics as
    * [[graft.llm.HeavyHitters.windowedTrending]] — per tumbling
    * event-time window, flag tokens whose exact in-window count is ≥
    * `minRatio`× their count-min history estimate (and ≥ `minCount`)
    * — for sketches too wide to inline as a plan literal
    * (`depth·width` beyond the literal device's cap).
    *
    * Mechanics: the stateful windowed aggregation STAYS in the
    * streaming plan (watermark → window/token count, append mode, so
    * each window emits exactly once, finalized at the watermark —
    * real event-time semantics, late data folded in, nothing emitted
    * per-micro-batch-boundary); the history lookup moves to
    * foreachBatch, where the finalized `(window_start, token,
    * batch_cnt)` rows broadcast-join the sketch through the shared
    * [[graft.llm.HeavyHitters.trendingFromCounts]] kernel. Flagged
    * rows land batch-keyed (`ingest_batch=<bid>` overwrite), so
    * at-least-once replay REPLACES — the layer discipline every
    * streaming face here uses.
    *
    * Scale: state is one count per (open window, token), dropped at
    * the watermark; the sketch side of the lookup is ≤ depth·width
    * rows (a 10⁶-cell sketch is ~24 MB — comfortably broadcastable;
    * the corpus never rejoins). */
  def windowedTrendingWide(events: DataFrame, tsCol: String,
                           itemCol: String, windowDur: String,
                           sketch: DataFrame, outDir: String,
                           checkpointDir: Option[String] = None,
                           minCount: Long = 2L, minRatio: Double = 2.0,
                           depth: Int = 4, width: Int = 16,
                           seed: Long = 7L, watermark: String = "2 hours",
                           trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    require(events.isStreaming,
      "windowedTrendingWide is the streaming face — for a batch frame " +
        "use HeavyHitters.windowedTrending (small geometry) or " +
        "trendingFromCounts over a windowed aggregate (wide)")
    val counts = events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(itemCol))
      .agg(count(lit(1)).as("batch_cnt"))
      .select(col("window.start").as("window_start"), col(itemCol),
        col("batch_cnt"))
    counts.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$outDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        // the micro-batch frame feeds BOTH sides of the lookup join
        // (counts + probes) — pin it so the second consumer reads the
        // same rows instead of re-pulling the drained source
        val counts = batch.toDF().persist()
        try graft.llm.HeavyHitters.trendingFromCounts(counts, sketch,
            itemCol, minCount, minRatio, depth, width, seed)
          .select(col("window_start"), col(itemCol), col("batch_cnt"),
            col("hist_est"), col("ratio"))
          .write.mode("overwrite")
          .parquet(s"$outDir/ingest_batch=$bid")
        finally { counts.unpersist(); () }
      }
      .trigger(trigger)
      .start()
  }

  /** Streaming corpus-frequency monitor: [[cmsBatch]] over a
    * document stream — the live fixed-state token-frequency summary
    * (trending-term detection, drift gauges) whose state can never
    * grow into a 100 TB problem. */
  def cmsMonitor(docs: DataFrame, sketchDir: String, depth: Int = 4,
                 width: Int = 16, seed: Long = 7L,
                 textCol: String = "text",
                 checkpointDir: Option[String] = None,
                 trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$sketchDir/_checkpoints"))
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        cmsBatch(batch.toDF(), sketchDir, depth, width, seed,
          textCol, batchId = bid)
      }
      .trigger(trigger)
      .start()
}

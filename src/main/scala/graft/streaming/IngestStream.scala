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

  private def layerNonEmpty(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.getPath.getName.endsWith(".parquet"))
  }

  /** One ingest step (batch semantics — unit-testable; the streaming
    * wrapper calls this per micro-batch). Appends surviving docs to
    * `corpusDir` and their signatures to `sigDir`. */
  def ingestBatch(batch: DataFrame, corpusDir: String, sigDir: String,
                  threshold: Double = 0.7, textCol: String = "text",
                  idCol: String = "doc_id"): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // within-batch near-dup dedup (keep min-id representative)
      val deduped = Dedup.nearDupDedup(b, threshold, textCol, idCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val sigs = Dedup.minHashSignatures(deduped, textCol = textCol,
          idCol = idCol)
        val survivors =
          if (layerNonEmpty(spark, sigDir)) {
            val layer = spark.read.parquet(sigDir)
            val dupIds = Dedup
              .minHashPairsFromSigs(sigs, layer, threshold)
              .select(col("id_new").as("id")).distinct()
            sigs.join(dupIds, Seq("id"), "left_anti")
          } else sigs
        val survivorSigs = survivors
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // ORDER MATTERS: corpus first, signature layer last. The
          // survivors plan READS sigDir (the LSH anti-join), and any
          // write to sigDir invalidates every cached plan over that
          // path (Spark recacheByPath) — appending signatures first
          // would make the corpus write re-execute the anti-join
          // against a layer that now contains this batch's own
          // signatures, self-matching every survivor to emptiness.
          deduped.join(survivorSigs.select(col("id").as(idCol)), Seq(idCol))
            .write.mode("append").parquet(corpusDir)
          survivorSigs.write.mode("append").parquet(sigDir)
        } finally { survivorSigs.unpersist(); () }
      } finally { deduped.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** The streaming wrapper: foreachBatch over a document stream. */
  def nearDupIngest(docs: DataFrame, corpusDir: String, sigDir: String,
                    threshold: Double = 0.7, textCol: String = "text",
                    idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        ingestBatch(batch.toDF(), corpusDir, sigDir, threshold, textCol,
          idCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}

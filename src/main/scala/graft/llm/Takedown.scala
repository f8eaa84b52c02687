package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Takedown propagation — "right to be forgotten" over the engine's
  * persisted artifacts. A takedown id set (legal removal requests,
  * opt-outs, licensing pulls) must disappear from EVERY standing
  * layer a 100 TB pipeline serves from, not just the raw corpus:
  * the batch-keyed ingest layers (corpus, signatures, postings), the
  * dense indexes (IVF cell layout, PQ code layout), and the CMS
  * frequency layer. Rebuilding each from scratch is a full-corpus
  * pass per artifact; these operators rewrite ONLY the partitions
  * that actually contain a taken-down row (takedown lists are tiny
  * against the corpus, so the affected-partition set is too), and
  * every mutation runs under one crash-safe commit-marker protocol,
  * so a crash at any point either leaves the layer untouched or is
  * completed by the next entry — rows never half-vanish.
  *
  * Equivalence contract (oracle-proven per layer): after takedown,
  * serving from the patched artifact is indistinguishable from a
  * full rebuild over `corpus MINUS ids` — the llm_ivf_patch device
  * applied to deletion. Reference lifecycle analogue: porcupine
  * treats resource layers as rebindable persistent state
  * (porcupine-core/src/System/TaskPipeline/Run.hs:72-81); takedown
  * is the maintenance face of those layers.
  *
  * Protocol (the ivfPatchIndex marker protocol, generalized to
  * subdir-qualified partitions): fresh content for every affected
  * partition is written under an invisible `_takedown_tmp` while the
  * live layer stays readable; a `_TAKEDOWN_COMMIT` marker (one
  * `<hasFresh> <relativePartitionPath>` line per swap) is the commit
  * point; only then are live partitions swapped (delete live, rename
  * fresh in — a flag=0 entry means the partition lost every row and
  * legitimately disappears). Entry-time [[completePending]] replays
  * a committed tmp and clears an uncommitted one, so reruns converge
  * from any crash point. Untouched partitions keep their files
  * byte-for-byte.
  *
  * Scale: discovery is one semi-join of the layer against the
  * (broadcast) id set; rewrites are anti-joins over ONLY the
  * affected partition directories. Cost is proportional to the
  * affected partitions' row mass — a takedown touching 0.1% of
  * partitions rewrites 0.1% of the artifact. */
object Takedown {

  // shared with Similarity.ivfCompactDelta — the delta fold rides the
  // SAME tmp/marker/swap protocol (and therefore the same entry-time
  // recovery every maintenance face already runs)
  private[llm] val TmpName = "_takedown_tmp"
  private[llm] val MarkerName = "_TAKEDOWN_COMMIT"

  /** One completed layer mutation: partitions rewritten (or dropped)
    * and rows removed. (0, 0) means the id set did not intersect the
    * layer — the idempotent-rerun result. */
  type Audit = (Long, Long)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Normalize a caller id frame to one broadcastable distinct
    * column named `idCol` (first column wins). */
  private def idFrame(ids: DataFrame, idCol: String): DataFrame =
    broadcast(ids.select(col(ids.columns.head).as(idCol)).distinct())

  // ---------------------------------------------------------------
  // The shared swap protocol
  // ---------------------------------------------------------------

  private[llm] def writeMarker(fs: FileSystem, tmp: Path,
                               entries: Seq[(String, Boolean)]): Unit = {
    val out = fs.create(new Path(tmp, MarkerName), true)
    try out.write(entries.map { case (rel, hasFresh) =>
      s"${if (hasFresh) 1 else 0} $rel"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Execute (or re-execute) the swap for a COMMITTED takedown tmp.
    * Safe to rerun from any crash point: delete-live happens only
    * when the fresh replacement still sits in tmp (flag=1, fresh
    * present) or when the marker proves the partition's new content
    * is empty (flag=0); a flag=1 entry whose fresh dir is gone was
    * already renamed into place and is left alone. */
  private[llm] def applySwap(fs: FileSystem, root: Path, tmp: Path,
                             entries: Seq[(String, Boolean)]): Unit =
    entries.foreach { case (rel, hasFresh) =>
      val live = new Path(root, rel)
      val fresh = new Path(tmp, rel)
      if (hasFresh) {
        if (fs.exists(fresh)) {
          if (fs.exists(live)) fs.delete(live, true)
          require(fs.rename(fresh, live),
            s"takedown rename $fresh -> $live failed")
        } // else: already swapped by a prior (crashed) run
      } else if (fs.exists(live)) fs.delete(live, true)
    }

  /** Entry-time crash recovery: a leftover `_takedown_tmp` under
    * `dir` WITH its `_TAKEDOWN_COMMIT` marker is the authoritative
    * source for an interrupted swap — finish it before anything
    * reads or recomputes the layer. Without the marker the temp
    * write never completed and no live partition was touched: plain
    * garbage, cleared. Public so operators can force recovery before
    * serving after a suspected crash; every takedown entry point
    * calls it automatically. */
  def completePending(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    val tmp = new Path(root, TmpName)
    if (!fs.exists(tmp)) return
    val marker = new Path(tmp, MarkerName)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
        buf.toString("UTF-8")
      } finally in.close()
      val entries = text.split("\n").iterator.map(_.trim)
        .filter(_.nonEmpty).map { line =>
          val (flag, rel) = line.span(_ != ' ')
          (rel.drop(1), flag == "1")
        }.toSeq
      applySwap(fs, root, tmp, entries)
    }
    fs.delete(tmp, true)
    spark.catalog.refreshByPath(dir)
  }

  // ---------------------------------------------------------------
  // Batch-keyed ingest layers (corpus / signature / any
  // `ingest_batch=`-partitioned layer) and the dense indexes
  // ---------------------------------------------------------------

  /** Expand a takedown id set to FULL near-dup clusters: a removal
    * request names documents, but the obligation is usually to the
    * CONTENT — every near-duplicate copy of a requested doc must go
    * too, or the removed text survives verbatim under another id.
    * Joins the request against the corpus-version components
    * artifact ([[Dedup.connectedComponents]] over the MinHash pair
    * set — the table the dedup chain already pays for): any
    * component containing a requested id contributes all its
    * members; requested ids absent from the artifact (singletons —
    * no near-dups) pass through unchanged. The hit-component list is
    * ≤ \|ids\| rows and broadcasts; output feeds any takedown face
    * verbatim. */
  def expandToClusters(ids: DataFrame, components: DataFrame,
                       idCol: String = "doc_id"): DataFrame = {
    val idsB = idFrame(ids, idCol)
    val hit = components
      .join(idsB, components("id") === idsB(idCol), "left_semi")
      .select(col("component")).distinct()
    components.join(broadcast(hit), Seq("component"), "left_semi")
      .select(col("id").as(idCol))
      .unionByName(idsB)
      .distinct()
  }

  /** Layer doctor — read-only diagnosis of a standing layer's
    * maintenance state: classifies every protocol artifact the
    * engine's crash-safe swaps can leave behind (a COMMITTED temp is
    * recovery state the next maintenance entry will complete; an
    * UNCOMMITTED one is provably-untouched garbage), counts the
    * partition families (batch / cell / bucket, compact coverage),
    * and reports sidecar presence and `_delta` depth. Pure directory
    * listings — no data is read and NOTHING is mutated, so it is
    * safe to run against a live layer; cost is O(#partitions)
    * driver-side, dashboard-sized at any corpus scale. One row per
    * finding: (artifact, state, detail). */
  def layerDoctor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String)]
    if (!fs.exists(root)) {
      out += (("layer", "absent", dir))
      return out.toSeq.toDF("artifact", "state", "detail")
    }
    val names = fs.listStatus(root).map(_.getPath.getName).toSeq
    def classifyTmp(tmpName: String, markerName: String,
                    label: String): Unit =
      if (names.contains(tmpName)) {
        val committed =
          fs.exists(new Path(new Path(root, tmpName), markerName))
        out += ((label,
          if (committed) "pending-committed" else "uncommitted-garbage",
          if (committed)
            "recovery state: the next maintenance entry completes it"
          else "pre-commit leftovers: provably untouched layer, " +
            "cleared on the next entry"))
      }
    classifyTmp(TmpName, MarkerName, "takedown-swap")
    classifyTmp("_patch_tmp", "_PATCH_COMMIT", "index-patch")
    names.filter(_.startsWith("_compact_tmp_")).foreach { n =>
      out += (("compaction-temp", "uncommitted-garbage",
        s"$n: pre-rename fold output, cleared on the next compaction"))
    }
    def partIds(prefix: String): Seq[Long] = names
      .filter(_.startsWith(prefix))
      .flatMap(_.drop(prefix.length).toLongOption)
    val batches = partIds("ingest_batch=")
    if (batches.nonEmpty) {
      val (compacts, live) = batches.partition(_ < 0)
      out += (("batch-partitions", "present",
        s"${live.size} live" + (if (live.nonEmpty)
          s" (ids ${live.min}..${live.max})" else "") +
        (if (compacts.nonEmpty)
          s", ${compacts.size} compact (coverage <= ${
            compacts.map(c => -c - 1).max})" else "")))
      if (compacts.nonEmpty) {
        // each compact should carry the sources sidecar its fold
        // consumed — a markerless (pre-upgrade) compact makes
        // compaction refuse while covered live ids coexist
        val markerless = compacts.filterNot(c => fs.exists(
          new Path(new Path(root, s"ingest_batch=$c"),
            graft.streaming.IngestStream.CompactSourcesMarker)))
        out += (("compact-sources-markers",
          if (markerless.isEmpty) "present" else "missing",
          if (markerless.isEmpty)
            "every compact records the sources its fold consumed"
          else s"markerless compacts ${markerless.sorted.mkString(",")}" +
            ": compaction refuses while covered live ids coexist — " +
            "re-key or delete those live partitions manually"))
      }
    }
    Seq("cell_id=" -> "ivf-cells", "pq_bucket=" -> "pq-buckets")
      .foreach { case (p, label) =>
        val ids = partIds(p)
        if (ids.nonEmpty)
          out += ((label, "present", s"${ids.size} partitions"))
      }
    if (names.contains(Similarity.DeltaDirName)) {
      val deltaBatches = fs.listStatus(
          new Path(root, Similarity.DeltaDirName))
        .map(_.getPath.getName).count(_.startsWith("ingest_batch="))
      out += (("delta-segment", "present",
        s"$deltaBatches batches; fold before any centroid/codebook " +
          "patch"))
    }
    Seq("_centroids.txt" -> "centroid-sidecar",
        "_books.txt" -> "codebook-sidecar",
        "_geometry.json" -> "geometry-sidecar")
      .foreach { case (n, label) =>
        if (names.contains(n)) out += ((label, "present", n))
      }
    if (out.isEmpty) out += (("layer", "empty", dir))
    out.toSeq.toDF("artifact", "state", "detail")
  }

  /** DRY-RUN takedown audit — the legal-review step before
    * execution: report, per partition of a partition-keyed layer,
    * how many rows the id set would remove and how many would
    * remain, WITHOUT mutating anything. Exactly the discovery
    * semi-join [[layerTakedown]] pays (one broadcast-filtered scan);
    * the output is ≤ |partitions| rows, so the preview of a 100 TB
    * layer is a dashboard-sized table. Works on any layer the
    * executing takedown would (ingest layers, compacted negatives,
    * the dense-index layouts via `partCol`). */
  def takedownPreview(spark: SparkSession, layerDir: String,
                      ids: DataFrame, idCol: String,
                      partCol: String = "ingest_batch"): DataFrame = {
    val idsB = idFrame(ids, idCol)
    spark.read.parquet(layerDir)
      .join(idsB.withColumn("_m", lit(1L)), Seq(idCol), "left")
      .groupBy(col(partCol).cast("long").as(partCol))
      .agg(sum(coalesce(col("_m"), lit(0L))).as("n_removed"),
        (count(lit(1)) - sum(coalesce(col("_m"), lit(0L))))
          .as("n_remaining"))
      .filter(col("n_removed") > 0)
  }

  /** Remove `ids` rows from a partition-keyed layer: only partitions
    * that actually contain a takedown row are rewritten (anti-join
    * over that partition directory alone); everything else keeps its
    * files byte-for-byte. Works on live AND compacted ingest layers
    * (a compact's reserved negative partition id is just another
    * directory here) and on the dense-index layouts via the
    * `partCol` parameter. Returns (rowsRemoved, partitionsRewritten);
    * a rerun with the same ids is a (0, 0) no-op. */
  def layerTakedown(spark: SparkSession, layerDir: String,
                    ids: DataFrame, idCol: String,
                    partCol: String = "ingest_batch"): Audit = {
    val root = new Path(layerDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return (0L, 0L)
    completePending(spark, layerDir)
    val idsB = idFrame(ids, idCol)
    val layer = spark.read.parquet(layerDir)
    // partition-inference types the key as INT when values fit —
    // normalize to long so compacted layers' negative ids and the
    // dense indexes' long keys land in one code path
    val affected = layer.join(idsB, Seq(idCol), "left_semi")
      .groupBy(col(partCol).cast("long").as("_p"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    if (affected.isEmpty) return (0L, 0L)
    val tmp = new Path(root, TmpName)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // full post-takedown content of every affected partition, ONE
    // job, partition-keyed into tmp (an emptied partition writes no
    // dir — its flag comes out 0 and the live dir legitimately
    // disappears at swap)
    graft.Writes.clusterByPartitions(
        layer.filter(col(partCol).cast("long")
            .isin(affected.map(_._1): _*))
          .join(idsB, Seq(idCol), "left_anti"), partCol)
      .write.partitionBy(partCol).parquet(tmp.toString)
    val entries = affected.map { case (p, _) =>
      (s"$partCol=$p", fs.exists(new Path(tmp, s"$partCol=$p")))
    }
    writeMarker(fs, tmp, entries)
    applySwap(fs, root, tmp, entries)
    fs.delete(tmp, true)
    spark.catalog.refreshByPath(layerDir)
    (affected.map(_._2).sum, affected.length.toLong)
  }

  /** [[layerTakedown]] over an [[Similarity.ivfWriteIndex]] layout:
    * drop the taken-down vectors from their `cell_id=` partitions —
    * centroids are untouched (dropping rows does not move cells), so
    * the `_centroids.txt` sidecar stays authoritative and
    * [[Similarity.ivfTopKIndexedAuto]] serves the patched layout
    * directly. Completes any pending PATCH first (a committed
    * `_patch_tmp` would later swap pre-takedown content back in —
    * taken-down rows must never resurrect). */
  def ivfTakedown(spark: SparkSession, indexDir: String,
                  ids: DataFrame, idCol: String = "vec_id"): Audit = {
    val root = new Path(indexDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return (0L, 0L)
    Similarity.completePendingPatch(spark, fs, root, "cell_id")
    // the `_delta` side segment ([[Similarity.ivfAppendBatch]]) is
    // invisible to the main read — scrub it separately (batch-keyed,
    // like any ingest layer) so appended-then-taken-down vectors
    // cannot survive in the serving union
    val deltaDir = s"$indexDir/${Similarity.DeltaDirName}"
    val d =
      if (fs.exists(new Path(deltaDir)))
        layerTakedown(spark, deltaDir, ids, idCol,
          partCol = "ingest_batch")
      else (0L, 0L)
    val m = layerTakedown(spark, indexDir, ids, idCol,
      partCol = "cell_id")
    (d._1 + m._1, d._2 + m._2)
  }

  /** [[layerTakedown]] over a [[Similarity.pqWriteIndex]] layout
    * (`pq_bucket=` partitions of (id, codes)); codebooks untouched,
    * `_books.txt` sidecar stays authoritative. Completes any pending
    * PQ patch first, for the same resurrection reason as
    * [[ivfTakedown]]. */
  def pqTakedown(spark: SparkSession, indexDir: String,
                 ids: DataFrame, idCol: String = "vec_id"): Audit = {
    val root = new Path(indexDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return (0L, 0L)
    Similarity.completePendingPatch(spark, fs, root, "pq_bucket")
    // scrub the `_delta` segment ([[Similarity.pqAppendBatch]]) too —
    // same reasoning as [[ivfTakedown]]'s dual-face scrub
    val deltaDir = s"$indexDir/${Similarity.DeltaDirName}"
    val d =
      if (fs.exists(new Path(deltaDir)))
        layerTakedown(spark, deltaDir, ids, idCol,
          partCol = "ingest_batch")
      else (0L, 0L)
    val m = layerTakedown(spark, indexDir, ids, idCol,
      partCol = "pq_bucket")
    (d._1 + m._1, d._2 + m._2)
  }

  // ---------------------------------------------------------------
  // BM25 postings layer (postings + stats subdirs, coupled)
  // ---------------------------------------------------------------

  /** Takedown over a [[TextAnalysis.bm25PostingsBatch]] layer: the
    * affected `postings/ingest_batch=` partitions lose the
    * taken-down docs' rows AND the matching `stats/ingest_batch=`
    * partitions are debited by exactly those docs' (count, dl) mass
    * AND any `termdf/ingest_batch=` sidecar partitions are debited
    * by the removed docs' per-term presence — all swapped under ONE
    * commit marker, so a crash can never leave the three subdirs
    * disagreeing past recovery. Serving from the patched layer is
    * bit-identical to a rebuild over `corpus MINUS ids`
    * (oracle-proven), because postings are doc-local and stats /
    * termdf are additive; the debited sidecar keeps the pruned
    * serve's cost routing exact across compliance churn.
    *
    * Requires a stats partition with the SAME id as every affected
    * postings partition — true by construction for
    * [[TextAnalysis.bm25PostingsBatch]] /
    * [[graft.streaming.IngestStream.bm25Monitor]] layers, and
    * preserved by compaction when BOTH subdirs are compacted at the
    * same watermark (the documented
    * [[graft.streaming.IngestStream.ingestLayerCompact]] usage);
    * fails fast otherwise.
    *
    * Known edge, documented: a doc with ZERO tokens has no postings
    * rows, so its batch membership is invisible here — its n_docs
    * mass stays in the stats (the serve-side N is one high per such
    * doc). Lexically a zero-token doc has no presence to remove;
    * pipelines that ingest empty docs should take them down at the
    * corpus layer, where membership is row-explicit. */
  def bm25Takedown(spark: SparkSession, indexDir: String,
                   ids: DataFrame, idCol: String = "doc_id"): Audit = {
    val root = new Path(indexDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return (0L, 0L)
    completePending(spark, indexDir)
    val postDir = s"$indexDir/postings"
    if (!fs.exists(new Path(postDir))) return (0L, 0L)
    val idsB = idFrame(ids, idCol)
    val post = spark.read.parquet(postDir)
    // the removed docs' postings rows, computed ONCE and persisted:
    // takedown-batch-sized by construction (|removed docs| x their
    // terms), it feeds BOTH the per-batch debit rollup and the
    // termdf sidecar debit below — without it the full postings
    // table is scanned twice for the two aggregates, which at a
    // 100 TB layer is a whole extra postings pass per takedown
    val rm = post.join(idsB, Seq(idCol), "left_semi")
      .select(col("ingest_batch").cast("long").as("_b"), col(idCol),
        col("term"), col("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // per affected batch: the doc-count and doc-length mass leaving
    // it (dl is per-doc constant across its postings rows, so the
    // per-(batch, doc) rollup is exact) plus the postings row count
    // for the audit — one aggregation chain, collected at ≤
    // |affected batches| rows
    val debits = rm
      .groupBy(col("_b"), col(idCol))
      .agg(count(lit(1)).as("_rows"), max(col("dl")).as("_dl"))
      .groupBy(col("_b"))
      .agg(sum(col("_rows")).as("n_rows"),
        count(lit(1)).as("n_rm"),
        sum(col("_dl")).as("dl_rm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(_._1)
    if (debits.isEmpty) return (0L, 0L)
    val batches = debits.map(_._1)
    batches.foreach { b =>
      require(fs.exists(new Path(root, s"stats/ingest_batch=$b")),
        s"bm25Takedown: postings partition ingest_batch=$b has no " +
          s"matching stats partition — compact postings/ and stats/ " +
          s"at the same watermark so the subdirs stay id-aligned")
    }
    val tmp = new Path(root, TmpName)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // the three tmp writes below (postings / stats / termdf) read
    // disjoint live subdirs and write disjoint tmp subdirs, so they
    // run as CONCURRENT Spark jobs (thread-safe on one session; rm
    // is already materialized by the debits collect). The commit
    // marker still lands only after ALL of them complete — the crash
    // protocol is unchanged, an uncommitted tmp is recovered by
    // completePending either way.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    // fresh postings for every affected batch: ONE partition-keyed
    // anti-join write (an emptied batch writes no dir -> flag 0)
    val postJob = Future {
      graft.Writes.clusterByPartitions(
          post.filter(col("ingest_batch").cast("long")
              .isin(batches: _*))
            .join(idsB, Seq(idCol), "left_anti"), "ingest_batch")
        .write.partitionBy("ingest_batch")
        .parquet(new Path(tmp, "postings").toString)
    }
    // fresh stats: the live per-batch sums debited by exactly the
    // removed docs' (count, dl) mass — one row per affected batch
    val debitRows = debits.map { case (b, _, n, dl) => (b, n, dl) }
    import spark.implicits._
    val debitDf = debitRows.toSeq.toDF("_b", "_n_rm", "_dl_rm")
    val statsJob = Future {
      spark.read.parquet(s"$indexDir/stats")
        .filter(col("ingest_batch").cast("long").isin(batches: _*))
        .groupBy(col("ingest_batch").cast("long").as("_b"))
        .agg(sum(col("n_docs")).as("_n"), sum(col("sum_dl")).as("_s"))
        .join(broadcast(debitDf), Seq("_b"))
        .select((col("_n") - col("_n_rm")).cast("long").as("n_docs"),
          (col("_s") - col("_dl_rm")).cast("long").as("sum_dl"),
          col("_b").as("ingest_batch"))
        .write.partitionBy("ingest_batch")
        .parquet(new Path(tmp, "stats").toString)
    }
    // fresh term-df dictionary sidecar: batch-partitioned and
    // additive exactly like stats, so the removed docs' per-(batch,
    // term) posting count IS the df debit (one postings row per
    // (doc, term)); terms whose df reaches 0 drop out of the
    // partition. Only batches that HAVE a sidecar partition are
    // rewritten — mixed-era layers keep their documented under-count,
    // still routing-safe. Without this debit every takedown would
    // inflate sidecar df monotonically, silently degrading the pruned
    // serve's cost routing toward always-full-scan on churned layers.
    val tdBatches = batches.filter(b =>
      fs.exists(new Path(root, s"termdf/ingest_batch=$b")))
    val termdfJob = Future {
      if (tdBatches.nonEmpty) {
        // from the persisted removed-rows subset — no second postings
        // scan (one postings row per (doc, term), so count IS the df
        // debit)
        val tdDebit = rm
          .filter(col("_b").isin(tdBatches: _*))
          .groupBy(col("_b"), col("term"))
          .agg(count(lit(1)).as("_df_rm"))
        // per-(batch, term) SUM first: a compacted sidecar partition
        // concatenates its source batches' rows, so a term can hold
        // several additive rows — joining the debit row-wise would
        // apply it once per row
        graft.Writes.clusterByPartitions(
            spark.read.parquet(s"$indexDir/termdf")
              .filter(col("ingest_batch").cast("long")
                .isin(tdBatches: _*))
              .groupBy(col("ingest_batch").cast("long").as("_b"),
                col("term"))
              .agg(sum(col("df")).as("df"))
              .join(tdDebit, Seq("_b", "term"), "left")
              .select(col("term"),
                (col("df") - coalesce(col("_df_rm"), lit(0L)))
                  .cast("long").as("df"),
                col("_b").as("ingest_batch"))
              .filter(col("df") > 0L), "ingest_batch")
          .write.partitionBy("ingest_batch")
          .parquet(new Path(tmp, "termdf").toString)
      }
    }
    // await COMPLETION of all three writes before surfacing any
    // failure: Future.sequence fails fast on the first error while
    // sibling jobs keep writing into tmp, and a retried takedown
    // deletes tmp at the top — the orphan could then resurrect stale
    // subdirs under the retry's tmp that the marker commits. Lifting
    // each outcome into Success makes the barrier unconditional; the
    // first real failure is rethrown only after every job finished.
    val outcomes = Await.result(Future.sequence(
      Seq(postJob, statsJob, termdfJob)
        .map(_.transform(scala.util.Success(_)))),
      scala.concurrent.duration.Duration.Inf)
    outcomes.foreach(_.get)
    val entries = batches.map { b =>
      (s"postings/ingest_batch=$b",
        fs.exists(new Path(tmp, s"postings/ingest_batch=$b")))
    } ++ batches.map(b => (s"stats/ingest_batch=$b", true)) ++
      tdBatches.map { b =>
        (s"termdf/ingest_batch=$b",
          fs.exists(new Path(tmp, s"termdf/ingest_batch=$b")))
      }
    writeMarker(fs, tmp, entries.toSeq)
    applySwap(fs, root, tmp, entries.toSeq)
    fs.delete(tmp, true)
    spark.catalog.refreshByPath(postDir)
    spark.catalog.refreshByPath(s"$indexDir/stats")
    if (tdBatches.nonEmpty)
      spark.catalog.refreshByPath(s"$indexDir/termdf")
    (debits.map(_._2).sum, batches.length.toLong)
    } finally rm.unpersist(blocking = false)
  }

  // ---------------------------------------------------------------
  // CMS frequency layer (subtract-and-fold)
  // ---------------------------------------------------------------

  /** Takedown over a [[graft.streaming.IngestStream.cmsBatch]]
    * layer. Count-min cells are plain sums over disjoint doc sets,
    * so sketch(corpus MINUS ids) = sketch(corpus) − sketch(ids'
    * docs) CELL-WISE, exactly — the one-sided guarantee survives
    * because the result IS the sketch of the remaining multiset.
    * The removed docs' sketch is computed from the corpus layer
    * (the only place their text still lives — run this BEFORE the
    * corpus-layer takedown), negated, and folded together with
    * every existing batch partition into one compact partition via
    * the established [[graft.streaming.IngestStream.cmsCompact]]
    * crash protocol (reserved negative id, rename-then-delete).
    *
    * Fails fast (before any mutation) if any removed cell exceeds
    * its layer cell — the signature of ids that were never sketched
    * into this layer (wrong corpus dir, wrong geometry era), where
    * subtraction would corrupt the layer instead of cleaning it.
    *
    * Returns the removed-doc count (0 = no intersection, layer
    * untouched). Quiesce the writing stream first, as with any
    * layer maintenance. */
  def cmsTakedown(spark: SparkSession, sketchDir: String,
                  corpusDir: String, ids: DataFrame,
                  idCol: String = "doc_id",
                  textCol: String = "text"): Long = {
    import graft.streaming.IngestStream
    val geom = IngestStream.cmsLayerGeometry(spark, sketchDir)
    if (geom.isEmpty) return 0L
    val (depth, width, seed) = geom.get
    val root = new Path(sketchDir)
    val fs = fsOf(spark, root)
    val idsB = idFrame(ids, idCol)
    val removedDocs = spark.read.parquet(corpusDir)
      .join(idsB, Seq(idCol), "left_semi")
    val nRemoved = removedDocs.count()
    if (nRemoved == 0L) return 0L
    val removedSketch = HeavyHitters.cmsSketch(
      removedDocs.select(
        explode(TextAnalysis.tokens(col(textCol))).as("token")),
      "token", depth, width, seed)
    // pre-mutation guard: every removed cell must fit inside the
    // standing layer cell (≤ depth·width rows on each side)
    val over = removedSketch.as("r")
      .join(IngestStream.cmsLayerRead(spark, sketchDir).as("l"),
        Seq("row", "bucket"), "left")
      .filter(col("r.cnt") > coalesce(col("l.cnt"), lit(0L)))
      .count()
    require(over == 0L,
      s"cmsTakedown: $over removed cells exceed the layer's cells — " +
        s"these ids were never sketched into $sketchDir (wrong corpus " +
        s"dir or geometry era); refusing to subtract")
    // fold EVERYTHING (batches + prior compacts) minus the removed
    // sketch into one compact partition; pick the watermark that
    // covers every present partition, bumped past an already-present
    // compact target so the fold actually runs
    val prefix = "ingest_batch="
    val idsPresent = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(_.drop(prefix.length).toLongOption)
    if (idsPresent.isEmpty) return 0L
    var wm = idsPresent.map(i => if (i >= 0) i else -i - 1).max
    while (fs.exists(new Path(root, s"$prefix${-(wm + 1)}"))) wm += 1
    val neg = removedSketch.select(col("row"), col("bucket"),
      (-col("cnt")).as("cnt"))
    IngestStream.compactPartitions(spark, sketchDir, wm) { covered =>
      covered.select(col("row"), col("bucket"), col("cnt"))
        .union(neg)
        .groupBy(col("row"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
        .filter(col("cnt") > 0)
        .coalesce(1)
    }
    nRemoved
  }
}

package graft.streaming

import graft.sinks.DriveStore
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import scala.collection.mutable

/** Typed event row for the stateful operators. */
case class StreamEvent(event_id: Long, item_id: Long, event_type: String,
                       ts: java.sql.Timestamp, value: Double)

/** Running per-item state (A2/A3 as streaming state). */
case class ItemCounter(item_id: Long, n_events: Long, n_errors: Long, total_value: Double)

/** Typed input/state/output rows for streaming sessionization (top-level:
  * nested case classes break ExpressionEncoder derivation).
  */
case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
case class SessState(start_us: Long, end_us: Long, n: Long)
case class SessionOut(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

/** Typed arrival row for the streaming domain cap. */
case class DocArrival(doc_id: Long, source: String)

/** Typed admitted-page row of the streaming frontier. */
case class FrontierPage(doc_id: Long, url: String, canon_url: String,
                        domain: String, rank_ppm: Long)

/** Internal frontier-arrival row: a [[FrontierPage]] plus the event
  * time and the domain's robots Crawl-delay (ms, 0 = none) the
  * politeness gate consumes. `ts` stays the WATERMARKED column (the
  * event-time timeout requires the watermark annotation to survive
  * into the grouped input).
  */
case class FrontierArrival(doc_id: Long, url: String, canon_url: String,
                           domain: String, rank_ppm: Long,
                           delay_ms: Long, ts: java.sql.Timestamp) {
  def page: FrontierPage = FrontierPage(doc_id, url, canon_url, domain, rank_ppm)
  def tsUs: Long = ts.getTime * 1000L
}

/** Per-domain frontier state: lifetime admissions, the next politeness-
  * eligible event time (µs), and the deferred (NOT dropped) arrivals
  * still inside the delay window — bounded by the remaining cap.
  */
case class FrontierCapState(admitted: Long, next_us: Long,
                            pending: Seq[FrontierArrival])

/** Typed rows for the streaming funnel. */
case class FunnelEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
case class FunnelState(times_us: Seq[Long])
case class FunnelProgress(user_id: Long, stage_reached: Int, stage_times_us: Seq[Long])

/** S8/§2.11 — the webhook event stream as Structured Streaming.
  *
  * The reference is event-at-a-time with effectively at-most-once
  * delivery (failures swallowed, `app.py:101-102`); here the stream is
  * at-least-once (replayable source + foreachBatch), effects are
  * idempotent, and the processed-registry marker is recorded only
  * AFTER an effect succeeds — so redelivery re-applies, never skips,
  * and the result converges to exactly-once effects, strictly
  * stronger than the reference.
  *
  * Scale notes: the windowed aggregate shuffles on (window, type) with
  * watermark-bounded state; the idempotent sink works per partition
  * with no driver round-trip. Effect dedup is the persisted
  * [[ProcessedLedger]] (distributed anti-join over durable markers);
  * the in-memory [[Processed]] registry remains only where it stands
  * in for the EXTERNAL system's own idempotency (K3's oldest-wins
  * get-or-create, unique keys).
  */
object EventPipeline {

  /** File-source replay of a driver events table: `readStream` over the
    * parquet directory with the batch loader's schema — the offline
    * analog of the webhook source (S8). `ts` arrives as a raw long
    * (nanos) or TIMESTAMP_NTZ (micros) depending on the generator; it
    * is normalized identically to [[graft.Tables.events]].
    */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.table(spark, sfDir, "events").schema
    // The file source wants a DIRECTORY; select just the events file.
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    graft.Tables.normalizeTs(raw)
  }

  /** Watermarked tumbling-window counts (batch analog: q_window_events). */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     windowLen: String = "5 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("bucket_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Windowed distinct-cardinality sketch, STREAMING-LEGAL form:
    * `count(DISTINCT ...)` is not supported over a stream, and exact
    * per-window distinct state is unbounded anyway. The streaming shape
    * is the same bounded-state linear-counting occupancy as the batch
    * [[graft.operators.Sketches.distinctSketch]]: hash the key into a
    * fixed slot space, watermarked `dropDuplicates` on
    * (window, group, slot) — ≤ `bins` state rows per (window, group),
    * reclaimed when the watermark passes the window — then a plain
    * count. Identical arithmetic to the batch sketch, so the streaming
    * and batch answers are equal on equal data (StreamingSpec).
    */
  def windowedDistinctSketch(events: DataFrame, keyCol: String, bins: Int = 4096,
                             watermark: String = "10 minutes",
                             windowLen: String = "5 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .select(window(col("ts"), windowLen).as("_w"), col("event_type"),
        pmod(graft.functions.Hashing.stableHash60(col(keyCol).cast("string")),
          lit(bins.toLong)).as("_slot"))
      .dropDuplicates("_w", "event_type", "_slot")
      .groupBy(col("_w").getField("start").as("bucket_start"), col("event_type"))
      .agg(count(lit(1)).as("occupied"))

  /** Streaming Count-Min frequency sketch: because the sketch is
    * LINEAR (counters are plain sums — see
    * [[graft.operators.Sketches.cmSketch]]), its streaming form is
    * nothing more than a running aggregation over (row, bucket): state
    * is bounded at depth×width counters BY CONSTRUCTION, so no
    * watermark is needed and the query is complete/update-mode legal
    * forever. The stream's counters equal the batch sketch of
    * everything seen so far on any micro-batch boundary
    * (StreamingSpec proves final-state equality) — the property that
    * lets a long-running stream hand its counters to a batch job, or
    * several streams merge theirs by addition, with no rescan.
    */
  def streamingCmSketch(keys: DataFrame, keyCol: String, width: Int,
                        depth: Int = graft.operators.Sketches.CmDepth): DataFrame =
    keys.select(posexplode(array((0 until depth).map(r =>
        graft.operators.Sketches.cmBucket(col(keyCol), r, width)): _*))
        .as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))

  /** Streaming incremental near-dup: each micro-batch of arriving docs
    * is checked against a FROZEN reference corpus with
    * [[graft.operators.Dedup.incrementalNearDups]] and the surviving
    * pairs appended to `outPath` — the production crawl-ingest loop
    * (dedup every delta against everything already kept) as a stream.
    *
    * Because pairs are strictly delta × corpus and the stop-gram
    * statistics come from the corpus ALONE (a delta is too small to
    * define "stop"), the union of per-batch outputs EQUALS the one-shot
    * batch run over the concatenated delta: arrival slicing cannot
    * change the result (StreamingSpec proves stream-equals-batch over
    * any micro-batch split). At 100 TB the corpus side's shingle table
    * is a stable artifact — precompute and bucket it once; only the
    * delta is shingled per batch, so per-batch cost is proportional to
    * the batch, not the corpus.
    */
  def startIncrementalDedup(newDocs: DataFrame, corpus: DataFrame,
                            idCol: String, textCol: String, n: Int,
                            threshold: Double, maxShingleDf: Option[Int],
                            outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup
          .incrementalNearDups(batch, corpus, idCol, textCol, n, threshold, maxShingleDf)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming CCNet quality filter: score each arriving micro-batch
    * of documents against a FROZEN reference-corpus frequency table
    * ([[graft.operators.Curation.referenceRel]] — the "trained LM",
    * a stable artifact at 100 TB) and append the documents clearing
    * `minScorePpb` to `outPath`, carrying their scores.
    *
    * Because the reference table is frozen and scoring is per-document
    * (no cross-batch state), the union of per-batch outputs EQUALS the
    * one-shot batch scoring of the concatenated input: arrival slicing
    * cannot change the result (StreamingSpec proves it). Per-batch cost
    * is proportional to the batch — one word-key join against the
    * reference, never a rescan of anything historical.
    */
  def startQualityFilter(newDocs: DataFrame, rel: DataFrame, minScorePpb: Long,
                         outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Curation
          .scoreWithReference(batch, "doc_id", "text", rel)
          .filter(col("score_ppb") >= minScorePpb)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming code-corpus filter: each arriving micro-batch of
    * (path, content) files runs the SAME
    * [[graft.operators.CodeCuration.curate]] transform as the batch
    * capstone `q_code_pipeline` — detect language, route to the
    * matching extractor, measure, keep quality survivors — and appends
    * them to `outPath` with their language and extracted text.
    *
    * The transform is a pure per-row projection (no state, no join),
    * so the union of per-batch outputs EQUALS the one-shot batch run
    * on the concatenated input: arrival slicing cannot change the
    * result (StreamingSpec proves it), and per-batch cost is linear in
    * the batch.
    */
  def startCodeFilter(newFiles: DataFrame, maxLine: Long,
                      outPath: String): StreamingQuery =
    newFiles.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.CodeCuration.curate(batch, "path", "content", maxLine)
          .filter(col("kept"))
          .select(col("doc_id"), col("path"), col("lang"), col("text"),
            col("m.n_lines").as("n_lines"))
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming front door of the pretraining capstone: each arriving
    * micro-batch of (doc_id, payload) BINARY documents runs the SAME
    * per-document stages as `q_pretrain_corpus` — magic-byte dispatch
    * ([[graft.operators.CorpusIngest.dispatch]]), per-format text
    * extraction, and the Gopher quality rules — appending survivors
    * as (doc_id, format, text, n_words). Text-less or unparseable
    * payloads extract to null and drop at the quality join, the same
    * poison posture as the batch path. ([[streamingCorpus]] is the
    * metrics-only sibling: same dispatch, no quality filter, no
    * survivor text — the observability tap vs this, the ingest sink.)
    *
    * Per-document work only: the extraction is a per-row projection
    * and the Gopher aggregate is keyed by doc_id over the doc's OWN
    * words, so for UNIQUE doc_ids the union of per-batch outputs
    * EQUALS the one-shot batch run regardless of arrival slicing
    * (StreamingSpec proves it). Same-id rows WITHIN one micro-batch
    * collapse to a deterministic canonical row before the aggregate
    * (a doubled payload would otherwise double the word count and
    * fan out the join); CROSS-batch redelivery needs the ledgered
    * sibling below. The CROSS-document stages — exact dedup, domain
    * cap, packing — stay downstream batch compactions over the
    * appended survivors, the split a production ingest actually
    * runs: per-document curation at arrival, corpus-wide dedup at
    * compaction.
    */
  def startCorpusIngest(newDocs: DataFrame, minWords: Long,
                        outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        corpusIngestBatch(batch, minWords)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** The per-batch transform [[startCorpusIngest]] and
    * [[startLedgeredCorpusIngest]] share: dispatch → extract →
    * Gopher-quality keep, returning survivors
    * (doc_id, format, text, n_words).
    */
  private[streaming] def corpusIngestBatch(batch: DataFrame, minWords: Long): DataFrame = {
    val (format, text) = graft.operators.CorpusIngest.dispatch(col("payload"))
    val extracted = ProcessedLedger.canonicalPerKey(batch, "doc_id")
      .select(col("doc_id"), format.as("format"), text.as("text"))
    extracted.join(
      graft.operators.TextAnalysis
        .gopherRules(extracted, "doc_id", "text", minWords, 1000L, 2L, 20L, 2L, 0L)
        .filter(col("keep")).select(col("doc_id"), col("n_words")),
      "doc_id")
  }

  /** [[startCorpusIngest]] under the exactly-once ledger — the
    * at-least-once-source composition a production document ingest
    * runs: redelivered payloads anti-join away against the persisted
    * [[ProcessedLedger]] BEFORE the (expensive) extraction, survivors
    * write per-batch-overwrite (crash-window idempotent), and every
    * fresh doc — kept or quality-dropped — marks processed, so a
    * redelivery can neither duplicate the output nor re-extract a
    * rejected document. Same contract as
    * [[startLedgeredQualityFilter]], applied to the binary front door.
    */
  def startLedgeredCorpusIngest(newDocs: DataFrame, minWords: Long, checkpoint: String,
                                ledgerPath: String, outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val fresh = ProcessedLedger
          .fresh(ProcessedLedger.canonicalPerKey(batch.toDF(), "doc_id"), ledgerPath, "doc_id")
          .localCheckpoint(true)
        if (!fresh.isEmpty) {
          corpusIngestBatch(fresh, minWords)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
          ProcessedLedger.mark(fresh.select("doc_id"), ledgerPath, batchId, "doc_id")
        }
        ()
      }
      .start()

  /** [[startQualityFilter]] under the exactly-once ledger: redelivered
    * documents are anti-joined away against the persisted
    * [[ProcessedLedger]] BEFORE scoring, survivors append
    * per-batch-overwrite (crash-window idempotent), and every fresh
    * doc — passing or failing — is marked processed, so a redelivery
    * can neither duplicate output nor re-score a rejected doc. The
    * composition a production curation ingest actually runs: frozen
    * reference LM + at-least-once source + exactly-once effects.
    */
  def startLedgeredQualityFilter(newDocs: DataFrame, rel: DataFrame,
                                 minScorePpb: Long, checkpoint: String,
                                 ledgerPath: String, outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // same-id rows within one micro-batch: deterministic survivor
        // (dropDuplicates keeps an arbitrary row — the scored/persisted
        // content would differ across reruns of the same batch)
        val freshDocs = ProcessedLedger
          .fresh(ProcessedLedger.canonicalPerKey(batch.toDF(), "doc_id"), ledgerPath, "doc_id")
          .localCheckpoint(true)
        if (!freshDocs.isEmpty) {
          graft.operators.Curation
            .scoreWithReference(freshDocs, "doc_id", "text", rel)
            .filter(col("score_ppb") >= minScorePpb)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
          ProcessedLedger.mark(freshDocs.select("doc_id"), ledgerPath, batchId, "doc_id")
        }
        ()
      }
      .start()

  /** Classifier-routed ingest under the exactly-once ledger: each
    * micro-batch's ledger-fresh documents are scored against FROZEN
    * centroids ([[graft.operators.Classify.centroidClassify]]) and
    * land partitioned by predicted class inside a per-batch overwrite
    * directory — the route-crawl-docs-into-per-source-buckets shape a
    * labeling ingest runs. Idempotency: a retried batch overwrites its
    * own `batch_id=` directory wholesale (every pred partition of the
    * batch lives under it, so no partial-routing residue survives a
    * crash), and redeliveries in LATER batches are anti-joined away by
    * the ledger. Downstream readers see one row per doc across all
    * batch directories, already bucketed by class.
    */
  def startLedgeredClassifyRouter(newDocs: DataFrame, centroids: DataFrame,
                                  checkpoint: String, ledgerPath: String,
                                  outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val fresh = ProcessedLedger
          .fresh(ProcessedLedger.canonicalPerKey(batch.toDF(), "doc_id"), ledgerPath, "doc_id")
          .localCheckpoint(true)
        if (!fresh.isEmpty) {
          graft.operators.Classify
            .centroidClassify(fresh, "doc_id", "text", centroids)
            .join(fresh, Seq("doc_id"))
            .write.partitionBy("pred").mode("overwrite")
            .parquet(s"$outPath/batch_id=$batchId")
          ProcessedLedger.mark(fresh.select("doc_id"), ledgerPath, batchId, "doc_id")
        }
        ()
      }
      .start()

  /** Incremental span-scrub under the exactly-once ledger: each
    * micro-batch's ledger-fresh documents first APPEND their part-
    * owner rows to the persisted chunk-owner artifact, then are
    * rewritten against the MERGED owners (which now include their own
    * chunks — so within-batch repeats dedup too) into a per-batch
    * overwrite directory, then marked. Crash anywhere retries the same
    * fresh set: duplicate owner rows min-fold away in the loader, the
    * batch directory overwrites wholesale. Contract: arrivals are
    * doc-id-monotone across batches (crawl-time ids), so "first owner"
    * means the same thing sliced or one-shot — StreamingSpec proves
    * slicing + redelivery invariance under that contract.
    */
  def startLedgeredSpanScrub(newDocs: DataFrame, k: Int, checkpoint: String,
                             ledgerPath: String, ownersPath: String,
                             outPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val fresh = ProcessedLedger
          .fresh(ProcessedLedger.canonicalPerKey(batch.toDF(), "doc_id"), ledgerPath, "doc_id")
          .localCheckpoint(true)
        if (!fresh.isEmpty) {
          graft.operators.Artifacts
            .appendChunkOwnersDelta(fresh, "doc_id", "text", k, ownersPath)
          graft.operators.Rewrite
            .scrubWithOwners(fresh, "doc_id", "text", k,
              graft.operators.Artifacts.loadChunkOwners(fresh.sparkSession, ownersPath))
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
          ProcessedLedger.mark(fresh.select("doc_id"), ledgerPath, batchId, "doc_id")
        }
        ()
      }
      .start()

  /** Incremental BM25 index maintenance under the exactly-once ledger:
    * each micro-batch's ledger-fresh documents are tokenized ONCE and
    * appended to the [[graft.operators.Artifacts]] tf table, then
    * marked. The composition makes the artifact contract self-
    * enforcing: redelivered docs are anti-joined away (so delta
    * batches always carry NEW doc ids, as the index requires), and a
    * crash between append and mark retries the SAME fresh set — whose
    * exact-duplicate tf rows the loader's max-fold dedups. Scoring
    * runs read the index at their own cadence; the corpus-level
    * scalars re-derive there, so a delta can never mis-weight them.
    */
  def startLedgeredBm25Indexer(newDocs: DataFrame, checkpoint: String,
                               ledgerPath: String, indexPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val fresh = ProcessedLedger
          .fresh(ProcessedLedger.canonicalPerKey(batch.toDF(), "doc_id"), ledgerPath, "doc_id")
          .localCheckpoint(true)
        if (!fresh.isEmpty) {
          graft.operators.Artifacts.appendBm25Delta(fresh, "doc_id", "text", indexPath)
          ProcessedLedger.mark(fresh.select("doc_id"), ledgerPath, batchId, "doc_id")
        }
        ()
      }
      .start()

  /** Incremental LM reference maintenance under the exactly-once
    * ledger: fresh documents' word counts land in a per-batch
    * OVERWRITE directory ([[graft.operators.Artifacts.writeLmCountsBatch]]),
    * then the docs are marked. Counts are additive with NO idempotent
    * fold (unlike the BM25 tf max-merge), so the crash window between
    * write and mark is closed by the overwrite: a retried batch
    * recomputes the SAME fresh set (unchanged ledger) and replaces its
    * own directory. Redelivered docs in later batches are anti-joined
    * away. [[graft.operators.Artifacts.loadLmRel]] then serves the
    * merged reference at any point.
    */
  def startLedgeredLmCounter(newDocs: DataFrame, checkpoint: String,
                             ledgerPath: String, countsPath: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val fresh = ProcessedLedger
          .fresh(ProcessedLedger.canonicalPerKey(batch.toDF(), "doc_id"), ledgerPath, "doc_id")
          .localCheckpoint(true)
        if (!fresh.isEmpty) {
          graft.operators.Artifacts.writeLmCountsBatch(fresh, "text", countsPath, batchId)
          ProcessedLedger.mark(fresh.select("doc_id"), ledgerPath, batchId, "doc_id")
        }
        ()
      }
      .start()

  /** Custom streaming state via mapGroupsWithState: cumulative per-item
    * event/error counts and value totals across micro-batches — the
    * reference's per-item accounting (A2/A3) as managed, checkpointed
    * state instead of an external store. Use with OutputMode.Update.
    *
    * State is EVICTED by an ACTIVITY-HORIZON event-time timeout: once
    * the watermark passes an item's last activity plus `horizon`, the
    * counter emits one final snapshot and is removed — so state is
    * bounded by horizon × active-item rate, not by the lifetime item
    * cardinality (the `statefulDedup` treatment; a 100 TB-scale stream
    * accumulates unbounded distinct items over months). An item
    * reappearing past its horizon restarts from zero — callers needing
    * lifetime totals aggregate the emitted snapshots downstream.
    */
  def statefulItemCounters(events: Dataset[StreamEvent],
                           horizon: String = "7 days"): Dataset[ItemCounter] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", horizon)
      .groupByKey(_.item_id)
      .mapGroupsWithState[ItemCounter, ItemCounter](GroupStateTimeout.EventTimeTimeout) {
        (id: Long, evs: Iterator[StreamEvent], state: GroupState[ItemCounter]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last // final flush on eviction
          } else {
            var lastTs = Long.MinValue
            val next = evs.foldLeft(state.getOption.getOrElse(ItemCounter(id, 0L, 0L, 0.0))) {
              (acc, e) =>
                if (e.ts.getTime > lastTs) lastTs = e.ts.getTime
                ItemCounter(id, acc.n_events + 1,
                  acc.n_errors + (if (e.event_type == "error") 1 else 0),
                  acc.total_value + e.value)
            }
            state.update(next)
            // horizon anchors at the item's LAST activity
            if (lastTs != Long.MinValue) state.setTimeoutTimestamp(lastTs, horizon)
            next
          }
      }
  }

  /** Streaming per-domain admission cap: admit at most `k` documents
    * per domain over the stream's LIFETIME — the ingestion-time twin of
    * [[graft.operators.Curation.domainCap]] (batch keeps the best k in
    * hindsight; a live crawl must decide at arrival, so the streaming
    * rule is first-k). State is ONE counter per domain — bounded by
    * domain cardinality, not by stream length — and admission within a
    * micro-batch is by ascending doc id, so a given batch slicing
    * admits a deterministic set (StreamingSpec pins it). Selection is
    * the same single-pass bounded max-heap as [[admit]]'s no-delay
    * arm: O(room) memory and O(g log room) work, so a hot domain's
    * burst is never materialized or sorted whole.
    */
  def streamingDomainCap(docs: Dataset[DocArrival], k: Int): Dataset[DocArrival] = {
    require(k > 0, s"cap must be positive, got $k")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocArrival](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, arrivals: Iterator[DocArrival], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, k - admitted).toInt
          if (room == 0) Iterator.empty
          else {
            // bounded max-heap of the `room` smallest doc_ids
            val heap = mutable.PriorityQueue.empty[DocArrival](Ordering.by(_.doc_id))
            arrivals.foreach { a =>
              if (heap.size < room) heap += a
              else if (a.doc_id < heap.head.doc_id) { heap.dequeue(); heap += a }
            }
            val take = heap.dequeueAll.reverse // ascending doc_id
            state.update(admitted + take.size)
            take.iterator
          }
      }
  }

  /** Exactly-once WITHIN the engine: event-id dedup as managed state
    * (flatMapGroupsWithState) — redelivered ids produce no output, so
    * downstream sinks see each event once without any external
    * registry. State is per event-id and EVICTED by an event-time
    * timeout once the watermark passes the event's time plus
    * `horizon` (the source's redelivery window) — so state size is
    * bounded by horizon × event rate, matching what this function's
    * production twin ([[statefulDedupBounded]]) and the ledger path
    * already guarantee. An id redelivered PAST the horizon re-admits
    * exactly once per horizon window — the documented contract of
    * every at-least-once source with a bounded redelivery window.
    */
  def statefulDedup(events: Dataset[StreamEvent],
                    horizon: String = "30 minutes"): Dataset[StreamEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", horizon)
      .groupByKey(_.event_id)
      .flatMapGroupsWithState[Boolean, StreamEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, evs: Iterator[StreamEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // watermark passed first-delivery time + horizon: the
            // source can no longer redeliver this id — evict
            state.remove()
            Iterator.empty
          } else if (state.exists) Iterator.empty
          else {
            val first = evs.take(1).toSeq
            first.foreach { e =>
              state.update(true)
              // horizon anchors at FIRST delivery's event time
              state.setTimeoutTimestamp(e.ts.getTime, horizon)
            }
            first.iterator
          }
      }
  }

  /** Bounded-state streaming dedup: like [[statefulDedup]] but state is
    * EVICTED once the watermark passes an event's time plus `horizon` —
    * the built-in `dropDuplicatesWithinWatermark`, which is the right
    * tool whenever the source's redelivery window is known (always, in
    * practice). [[statefulDedup]] demonstrates the hand-rolled
    * flatMapGroupsWithState shape; THIS is what a 100 TB deployment
    * runs, because its state size is bounded by horizon × event rate
    * instead of growing with the stream's lifetime.
    */
  def statefulDedupBounded(events: Dataset[StreamEvent], horizon: String = "30 minutes"): Dataset[StreamEvent] =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming canonical-URL dedup — the ingestion-time twin of the
    * batch q_url_dedup: recrawls and share-link variants of one target
    * collapse AT ARRIVAL, keyed on [[graft.functions.UrlOps.urlCanon]]
    * (case/www/default-port/fragment/tracking-param noise all folds
    * onto one key), through the same bounded-watermark state as
    * [[statefulDedupBounded]]. Input needs `url` and event-time `ts`
    * columns; the canonicalization is one codegen projection, so the
    * only stateful operator is the dedup itself — state bounded by
    * horizon × crawl rate, not frontier size. Non-URL rows (null
    * canon) pass through un-deduped rather than all colliding on one
    * null key.
    */
  def streamingUrlDedup(pages: DataFrame, horizon: String = "30 minutes"): DataFrame = {
    val canon = pages.withColumn("canon_url",
      graft.functions.UrlOps.urlCanon(col("url")))
    // non-URL rows (null canon — including null urls) PASS THROUGH as
    // their own branch: putting them through the dedup would collapse
    // every one of them onto a single shared key (null, or any
    // constant prefix of a null url) and silently drop events
    val deduped = canon.filter(col("canon_url").isNotNull)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("canon_url")
    deduped.unionByName(canon.filter(col("canon_url").isNull))
  }

  /** The live curation front-door — the round-9 URL pieces composed
    * into one streaming admission pipeline, the ingestion-time twin of
    * the batch `q_url_dedup` → `q_url_blocklist` → domain-cap chain:
    *
    *   1. canonical-URL dedup at arrival ([[streamingUrlDedup]] —
    *      bounded watermark state; non-URL rows drop here: a frontier
    *      admits only fetchable targets);
    *   2. registered-domain blocklist: map-side [[graft.functions
    *      .UrlOps.urlDomain]] + broadcast stream-static LEFT ANTI join
    *      (null domains are kept, matching the batch twin's
    *      `IS NULL OR NOT IN` semantics — a URL whose domain cannot be
    *      derived is not thereby blocklisted);
    *   3. robots.txt admission ([[graft.functions.RobotsOps]], RFC
    *      9309): the per-domain robots payload joins in as a broadcast
    *      relation `(domain, robots_txt)` and the canonical path+query
    *      ([[graft.functions.UrlOps.urlPath]]) is evaluated for
    *      `agent`; a domain with no robots row is allowed (the RFC's
    *      unavailable-is-allow posture — pass '' explicitly to get the
    *      same);
    *   4. rank-aware per-domain admission: the persisted PageRank
    *      artifact ([[graft.operators.Artifacts.loadPageRank]]) joins
    *      in as a broadcast relation and GRANTS AUTHORITATIVE DOMAINS
    *      PROPORTIONALLY MORE FRONTIER SLOTS — effective lifetime cap
    *      = `k + rank_ppm / ppmPerSlot` (unranked domains get the base
    *      `k`); within a micro-batch, lowest doc_id first, same as
    *      [[streamingDomainCap]];
    *   5. politeness ([[graft.functions.RobotsOps.crawlDelayMs]]): a
    *      domain whose robots group declares `Crawl-delay: n` admits
    *      at most one page per n seconds of EVENT time. Arrivals
    *      inside the delay window are DEFERRED, not dropped: they wait
    *      in the per-domain state (bounded by the remaining cap) and
    *      release when the watermark passes the next-eligible time —
    *      an event-time timeout, never wall-clock, so replays are
    *      deterministic. Domains with no delay keep the plain
    *      single-pass bounded-heap admission (zero politeness state).
    *
    * State: dedup bounded by horizon × crawl rate; cap one counter +
    * next-eligible time + ≤cap deferred rows per domain. Slicing-
    * invariant outcomes (StreamingSpec pins them against the batch
    * composition across two arrival orders): the admitted-per-domain
    * COUNT is `min(effCap, distinct canon targets)`, blocklisted
    * domains never appear, and the canon key set equals the batch
    * distinct set. The batch twin (`q_frontier_admission`) models the
    * lifetime caps; politeness is inherently a live-stream semantics
    * (event-time spacing), gated by StreamingSpec with the delay VALUE
    * itself cross-engine-gated in q_robots_policy.
    */
  def streamingFrontier(pages: DataFrame, blocklist: DataFrame, ranks: DataFrame,
                        k: Int, ppmPerSlot: Long = 1000L,
                        horizon: String = "30 minutes",
                        robots: Option[DataFrame] = None,
                        agent: String = "graftbot"): Dataset[FrontierPage] = {
    require(k > 0, s"base cap must be positive, got $k")
    require(ppmPerSlot > 0, s"ppmPerSlot must be positive, got $ppmPerSlot")
    import pages.sparkSession.implicits._
    // the URL branch of [[streamingUrlDedup]], inlined WITHOUT the
    // non-URL pass-through union: a frontier admits only fetchable
    // targets, and the politeness timeout (EventTimeTimeout) requires
    // every upstream branch to carry the watermark — a union with the
    // un-watermarked pass-through branch would be rejected outright
    val deduped = pages
      .withColumn("canon_url", graft.functions.UrlOps.urlCanon(col("url")))
      .filter(col("canon_url").isNotNull)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("canon_url")
    val blocked = deduped
      .withColumn("domain", graft.functions.UrlOps.urlDomain(col("url")))
      .join(broadcast(blocklist.select(col("domain"))), Seq("domain"), "left_anti")
    val domained = robots.fold(blocked.withColumn("delay_ms", lit(0L))) { r =>
      blocked
        .join(broadcast(r.select(col("domain"), col("robots_txt"))), Seq("domain"), "left_outer")
        .filter(graft.functions.RobotsOps.robotsAllowed(
          coalesce(col("robots_txt"), lit("")), lit(agent),
          graft.functions.UrlOps.urlPath(col("url"))))
        .withColumn("delay_ms", coalesce(graft.functions.RobotsOps.robotsCrawlDelay(
          coalesce(col("robots_txt"), lit("")), lit(agent)), lit(0L)))
        .drop("robots_txt")
    }
    val ranked = domained
      .join(broadcast(ranks.select(col("node").as("domain"), col("rank_ppm"))),
        Seq("domain"), "left_outer")
      .na.fill(0L, Seq("rank_ppm"))
      .select($"doc_id", $"url", $"canon_url", $"domain",
        $"rank_ppm".cast("long").as("rank_ppm"),
        $"delay_ms".cast("long").as("delay_ms"), $"ts")
      .as[FrontierArrival]
    ranked.groupByKey(_.domain)
      .flatMapGroupsWithState[FrontierCapState, FrontierPage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, arrivals: Iterator[FrontierArrival], state: GroupState[FrontierCapState]) =>
          admit(k, ppmPerSlot, arrivals, state)
      }
  }

  /** The per-domain admission fold of [[streamingFrontier]] — lifetime
    * cap + politeness, single pass, O(room) memory.
    *
    * No-delay domains: a bounded max-heap keeps the `room` smallest
    * doc_ids of the micro-batch (the TopKAgg discipline — a hot
    * domain's burst is never materialized whole), emitted ascending.
    *
    * Delay domains: candidates (deferred rows first, then arrivals)
    * reduce to the `room` smallest by (ts_us, doc_id) through the same
    * bounded heap, then fold in ascending order against the politeness
    * gate: a page is admitted when event time has provably reached the
    * next-eligible instant (its own timestamp, or the watermark for a
    * deferred release), which advances the gate by the delay;
    * otherwise it stays in `pending` and an event-time timeout at the
    * gate's opening releases it once the watermark passes. Deferred
    * rows never exceed the remaining cap.
    */
  private[streaming] def admit(k: Int, ppmPerSlot: Long,
                               arrivals: Iterator[FrontierArrival],
                               state: GroupState[FrontierCapState]): Iterator[FrontierPage] = {
    val st = state.getOption.getOrElse(FrontierCapState(0L, 0L, Seq.empty))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // rank/delay are constant per domain: read them off any candidate
    val fromArrivals = st.pending.isEmpty && arrivals.hasNext
    val first =
      if (st.pending.nonEmpty) st.pending.head
      else if (arrivals.hasNext) arrivals.next()
      else { state.update(st); return Iterator.empty } // timeout, nothing pending
    val effCap = k + first.rank_ppm / ppmPerSlot
    val room = math.max(0L, math.min(effCap - st.admitted, Int.MaxValue.toLong)).toInt
    if (room == 0) { state.update(st.copy(pending = Seq.empty)); return Iterator.empty }

    if (first.delay_ms <= 0L) {
      // no politeness: single-pass bounded selection of the `room`
      // smallest doc_ids (max-heap of size ≤ room)
      if (!fromArrivals && !arrivals.hasNext) { state.update(st); return Iterator.empty }
      val heap =
        if (fromArrivals) mutable.PriorityQueue(first)(Ordering.by(_.doc_id))
        else mutable.PriorityQueue.empty[FrontierArrival](Ordering.by(_.doc_id))
      arrivals.foreach { pg =>
        if (heap.size < room) heap += pg
        else if (pg.doc_id < heap.head.doc_id) { heap.dequeue(); heap += pg }
      }
      val take = heap.dequeueAll.reverse // ascending doc_id
      state.update(FrontierCapState(st.admitted + take.size, 0L, Seq.empty))
      take.iterator.map(_.page)
    } else {
      val ord: Ordering[FrontierArrival] = Ordering.by(a => (a.tsUs, a.doc_id))
      val heap = mutable.PriorityQueue.empty[FrontierArrival](ord)
      def offer(pg: FrontierArrival): Unit =
        if (heap.size < room) heap += pg
        else if (ord.lt(pg, heap.head)) { heap.dequeue(); heap += pg }
      st.pending.foreach(offer)
      if (fromArrivals) offer(first)
      arrivals.foreach(offer)
      val cands = heap.dequeueAll.reverse // ascending (ts_us, doc_id)
      val delayUs = first.delay_ms * 1000L
      var next = st.next_us
      var admitted = st.admitted
      val out = Vector.newBuilder[FrontierPage]
      val defer = Vector.newBuilder[FrontierArrival]
      cands.foreach { pg =>
        if (math.max(pg.tsUs, wmUs) >= next) {
          next = math.max(pg.tsUs, next) + delayUs
          admitted += 1
          out += pg.page
        } else defer += pg
      }
      val pending = defer.result()
      state.update(FrontierCapState(admitted, next, pending))
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(next / 1000L, state.getCurrentWatermarkMs() + 1))
      out.result().iterator
    }
  }

  /** Watermarked stream-stream join: correlate two live event streams
    * per item within a bounded event-time window (e.g. every upload
    * with the scans that follow it within `joinWindow`). The time-range
    * condition plus watermarks make the join state FINITE — Spark drops
    * buffered rows once the watermark passes their join horizon — so
    * state stays bounded no matter how long the streams run; an
    * unbounded-condition stream join would accumulate forever.
    * Both inputs need (item_id, event_id, ts).
    */
  def correlatedEvents(left: DataFrame, right: DataFrame,
                       joinWindow: String = "10 minutes",
                       watermark: String = "20 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("item_id"), col("event_id").as("left_event"), col("ts").as("left_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("item_id").as("_rid"), col("event_id").as("right_event"), col("ts").as("right_ts"))
    l.join(r,
      col("item_id") === col("_rid") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL $joinWindow"))
      .drop("_rid")
  }

  /** Gap-based sessionization as managed streaming state — the
    * incremental twin of the batch `q_sessionize` window query: a
    * session CLOSES when `gap` passes with no event, enforced by an
    * event-time timeout against the watermark (never wall-clock, so
    * replays are deterministic). Emits one row per closed session with
    * the same (user, start, end, count) values the batch query
    * computes; sessions still open at watermark stay in state.
    *
    * Batch parity holds for IN-ORDER arrival (per user). A late event
    * still inside the watermark merges into the open session —
    * extending `start_us` backwards when it predates the session start
    * — but a session already EMITTED (closed mid-batch or by timeout)
    * can never be reopened in append mode, so heavily out-of-order
    * streams can emit a split where the batch query sees one session.
    * That is the standard append-mode late-data caveat, not a state
    * bug; widen the watermark to push it out.
    *
    * Scale notes: state is one small struct per ACTIVE user (closed
    * sessions leave state immediately), keyed shuffles partition by
    * user, and in-batch events are folded in timestamp order so a
    * single batch carrying a whole session emits it without ever
    * holding more than the open-session struct.
    */
  def streamingSessionize(events: Dataset[SessEvent], gapUs: Long,
                          watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start_us, s.end_us, s.n))
          } else {
            val times = evs.map(e => e.ts.getTime * 1000L).toArray.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (t <- times) cur match {
              case Some(s) if t - s.end_us <= gapUs && s.start_us - t <= gapUs =>
                // min on start: a late (within-watermark) event older
                // than the open session must extend it BACKWARDS, not
                // silently inherit the newer start. The second guard
                // keeps "older" honest: `t - s.end_us` is NEGATIVE for
                // any pre-session event, so without it an event MORE
                // than `gap` before the session start would false-merge
                // and inflate the span.
                cur = Some(SessState(math.min(s.start_us, t), math.max(s.end_us, t), s.n + 1))
              case Some(s) if s.start_us - t > gapUs =>
                // Within-watermark event that predates the open session
                // by more than the gap: in event-time order it belongs
                // to an earlier, already-gone session — emit it as its
                // own closed singleton and leave the open session alone.
                closed ::= SessionOut(uid, t, t, 1)
              case Some(s) =>
                closed ::= SessionOut(uid, s.start_us, s.end_us, s.n)
                cur = Some(SessState(t, t, 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
            cur.foreach { s =>
              state.update(s)
              // close when the WATERMARK (not the clock) passes end+gap
              state.setTimeoutTimestamp(s.end_us / 1000L + gapUs / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** The incremental twin of the batch ordered funnel
    * (`Funnel.funnel`): per-user state is the vector of reached-stage
    * timestamps, an event advances the funnel only when it matches the
    * NEXT stage strictly after the previous stage's time, and a row is
    * emitted (Update mode) whenever a user progresses. State is
    * O(stages) per user and never grows with the stream.
    *
    * Batch parity holds for per-user in-order arrival, same caveat
    * family as [[streamingSessionize]]: a late stage-k event that
    * predates an already-recorded stage-k time cannot retroactively
    * improve the funnel (the batch query would have used the earlier
    * time, possibly unlocking a different stage-k+1 event). Widen the
    * source's ordering guarantees — or replay in batch — where that
    * matters.
    *
    * State is EVICTED by a CONVERSION-DEADLINE event-time timeout:
    * once the watermark passes a user's last funnel progress plus
    * `deadline`, the funnel is abandoned and its state removed — so
    * state is bounded by deadline × active-user rate instead of
    * lifetime user cardinality (the `statefulDedup` treatment). A
    * user reappearing after abandonment starts a fresh funnel, which
    * is also the analytics semantics a conversion window wants.
    */
  def streamingFunnel(events: Dataset[FunnelEvent], stages: Seq[String],
                      deadline: String = "24 hours"): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import events.sparkSession.implicits._
    events.withWatermark("ts", deadline)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // conversion deadline passed with no further progress: abandon
            state.remove()
            Iterator.empty
          } else {
            var times = state.getOption.map(_.times_us).getOrElse(Seq.empty)
            val before = times.length
            // fold the batch in event-time order so one batch carrying a
            // whole conversion advances all its stages
            val sorted = evs.toArray.sortBy(e => (e.ts.getTime, e.event_type))
            var lastSeenUs = if (times.nonEmpty) times.last else Long.MinValue
            for (e <- sorted if times.length < stages.length) {
              val k = times.length
              val tUs = e.ts.getTime * 1000L
              if (e.event_type == stages(k) && (k == 0 || tUs > times(k - 1))) {
                times = times :+ tUs
                lastSeenUs = tUs
              }
            }
            if (times.length != before) {
              state.update(FunnelState(times))
              // deadline anchors at the LAST reached stage's event time
              state.setTimeoutTimestamp(lastSeenUs / 1000L, deadline)
              Iterator.single(FunnelProgress(uid, times.length, times))
            } else Iterator.empty
          }
      }
  }

  /** Cross-batch processed-event registry (effect dedup).
    *
    * Contract: callers check [[seen]] BEFORE running the (idempotent)
    * side effect and record with [[markDone]] only AFTER it succeeds.
    * A failure between the two leaves the event unmarked, so the
    * streaming retry re-applies it — at-least-once application against
    * idempotent effects, i.e. effectively-once. Marking first would be
    * at-most-once: a crash after the mark skips the event forever.
    *
    * SINGLE-JVM STAND-IN: this is an in-process ConcurrentHashMap, so
    * the seen-check and the mark only observe each other when every
    * executor shares the JVM (local[*], as here). On a real cluster
    * each executor would hold its own map and the guarantee silently
    * degrades to at-least-once — which the idempotent effects absorb.
    * The cluster-real registry is [[ProcessedLedger]]: the same
    * marker-after-effect contract persisted as parquet and checked via
    * a distributed anti-join; [[startDepositStream]] uses it, and
    * LedgerSpec proves it across two separate SparkSessions. This
    * object remains only to demonstrate the executor-side-predicate
    * shape ([[startIdempotentPipeline]]) where the registry models the
    * EXTERNAL system's own idempotency (K3 get-or-create, unique keys).
    */
  object Processed {
    private val stores =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]]()
    private def get(name: String) =
      stores.computeIfAbsent(name, _ => new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]())
    /** true when the event's effect has already been recorded as applied. */
    def seen(name: String, eventId: Long): Boolean = get(name).containsKey(eventId)
    /** Record a successfully-applied effect; true when newly recorded. */
    def markDone(name: String, eventId: Long): Boolean = get(name).putIfAbsent(eventId, eventId) == null
    def count(name: String): Int = get(name).size
    def drop(name: String): Unit = stores.remove(name)
  }

  /** S8 + §3.3 end-to-end: each micro-batch's NEW events (cross-batch
    * deduped by event_id against the PERSISTED [[ProcessedLedger]])
    * trigger the full deposit pipeline for their items against static
    * cells/rules. NO driver round-trip: the dedup is a distributed
    * left-anti join, the clients table is restricted via a semi-join
    * against the fresh item ids, and the after-effect marking is a
    * distributed parquet append. The ledger IS the production shape —
    * durable markers + anti-join — so the exactly-once effects survive
    * driver restarts and multi-JVM executors (LedgerSpec), not just
    * local[*]. Restart durability requires a `checkpoint` path: without
    * one a restarted query replays the source from scratch and leans
    * entirely on the ledger anti-join + effect idempotency (correct,
    * but it re-reads everything). `redeliveryHorizon` (in batches)
    * bounds the per-batch ledger read to `batch_id >= current −
    * horizon` so the anti-join input stays flat for the stream's
    * lifetime instead of re-scanning the full marker history;
    * `compactEvery` (0 = never) folds the out-of-horizon marker
    * partitions every N batches from the stream's own single-writer
    * slot, keeping the directory count flat as well.
    */
  def startDepositStream(events: DataFrame, clients: DataFrame, cells: DataFrame,
                         rules: DataFrame, defaultRule: DataFrame, storeName: String,
                         ledgerPath: String, lotNumber: Int = 1,
                         checkpoint: Option[String] = None,
                         redeliveryHorizon: Long = Long.MaxValue,
                         compactEvery: Long = 0L): StreamingQuery = {
    val writer = events.writeStream
      .outputMode("append")
      .queryName(StreamMetrics.queryName(storeName))
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val metrics = StreamMetrics.countersFor(batch.sparkSession, storeName)
        val minBatch =
          if (redeliveryHorizon == Long.MaxValue) Long.MinValue
          else math.max(0L, batchId - redeliveryHorizon)
        // The eager localCheckpoint pins ONE evaluation so the later
        // mark pass and the pipeline input see the identical fresh set
        // even though the ledger grows underneath.
        val pairs = batch.select("event_id", "item_id").distinct().localCheckpoint(true)
        val freshPairs = ProcessedLedger.fresh(pairs, ledgerPath, minBatchId = minBatch)
          .localCheckpoint(true)
        // both counts run on checkpointed data — no recomputation
        val nFresh = freshPairs.count()
        metrics.applied.add(nFresh)
        metrics.deduped.add(pairs.count() - nFresh)
        if (nFresh > 0) {
          val batchClients = clients.join(
            freshPairs.select(col("item_id").as("id_monday")).distinct(),
            Seq("id_monday"), "left_semi")
          val plan = graft.pipelines.DepositPipeline.uploadTasks(
            batchClients, cells, rules, defaultRule, lotNumber, startId = 1)
          graft.pipelines.DepositPipeline.run(batch.sparkSession, plan, storeName, sleep = _ => ())
          // Mark ONLY after the pipeline's effects succeeded: a failure
          // above leaves the ids unmarked and the streaming retry
          // re-runs them against the idempotent store (oldest-wins
          // folders, digest-keyed uploads) — effectively-once.
          ProcessedLedger.mark(freshPairs.select("event_id"), ledgerPath, batchId)
        }
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
          minBatch > Long.MinValue)
          ProcessedLedger.compact(batch.sparkSession, ledgerPath, minBatch)
        ()
      }
      .start()
  }

  /** S8 + K3: one pipeline invocation per NEW event — here the §3.3
    * per-item side effect is a get-or-create in the Drive stand-in.
    * Requires columns `event_id` (dedup key) and `item_id`.
    */
  def startIdempotentPipeline(events: DataFrame, storeName: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .queryName(StreamMetrics.queryName(storeName))
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val metrics = StreamMetrics.countersFor(batch.sparkSession, storeName)
        // capture bare accumulators: the closure ships to executors
        val appliedAcc = metrics.applied
        val dedupedAcc = metrics.deduped
        batch.select("event_id", "item_id").dropDuplicates("event_id")
          .foreachPartition { (it: Iterator[Row]) =>
            val drive = DriveStore.get(storeName)
            it.foreach { r =>
              if (!Processed.seen(storeName, r.getLong(0))) {
                // Effect first (itself idempotent: K3 oldest-wins
                // get-or-create), mark after — a crash between the two
                // re-runs the effect on retry, never skips it.
                drive.findOrCreateFolder(parentId = 0L, name = s"ITEM_${r.getLong(1)}")
                Processed.markDone(storeName, r.getLong(0))
                appliedAcc.add(1)
              } else dedupedAcc.add(1)
            }
          }
        ()
      }
      .start()

  /** Streaming document ingest: the [[graft.operators.CorpusIngest]]
    * front door (content-sniff → route to pdf/docx/pptx/html/text
    * extractors → token metrics) applied to a STREAM of (doc_id,
    * payload) rows. Every stage is a stateless projection, so the
    * batch capstone (`q_corpus_dispatch`) and this stream share ONE
    * transform — StreamingSpec proves the micro-batch output equals
    * the batch run on the same rows. Scale shape: pure map work; the
    * knob is payload bytes per micro-batch, not state.
    */
  def streamingCorpus(docs: DataFrame): DataFrame =
    graft.operators.CorpusIngest.withDocMetrics(docs, "doc_id", "payload")
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout}

/** Structured Streaming slice — SURVEY.md §2.9.
  *
  * The reference has no data-plane streaming (its only streams are LLM
  * token streams, rag_graph.py:451-477), but the engine's `events` table
  * invites the idiomatic mapping: `readStream` → event-time windows with
  * watermarks → stateful sessionization via the GroupState API. Every
  * transform here is a plain `DataFrame => DataFrame` / Dataset function,
  * so the SAME code runs in batch (q05/q07 use the batch shape) and
  * streaming — Spark's unified-API story, tested both ways in
  * EventStreamsSpec.
  */
object EventStreams {

  /** one event row (events table schema, TESTDATA.md) */
  case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_events: Long, n_sessions: Long)

  // public: the state encoder's generated code must reach the accessors
  case class SessionState(lastTsMicros: Long, nEvents: Long, nSessions: Long)

  /** session gap threshold (matches q07) */
  val SessionGapMicros: Long = 30L * 60 * 1000000

  /** Tumbling event-time window counts with a watermark bounding state:
    * late events beyond `watermark` are dropped and closed windows are
    * evicted — the property that keeps state finite on an unbounded
    * stream. Works identically on a batch frame (watermark is a no-op
    * there). */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 day",
      watermark: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        slide.map(sl => window(col("ts"), windowLength, sl))
          .getOrElse(window(col("ts"), windowLength)), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup for a continuously-ingested document feed —
    * the streaming form of the q40 batch dedup (north-star: a training
    * pipeline deduping data as it lands). Keyed on the whitespace/case-
    * normalized content fingerprint; `dropDuplicatesWithinWatermark`
    * bounds the dedup state by the watermark horizon, so two copies
    * arriving within `watermark` of each other dedup while state stays
    * finite on an unbounded stream — the correct trade for crawl-style
    * feeds where duplicates cluster in time. Same code shape works on a
    * batch frame via plain `dropDuplicates` (tested both ways in
    * EventStreamsSpec). */
  def dedupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    // null text has no content to dedup on — and a NULL fingerprint key
    // would make dropDuplicates treat ALL null-text docs as copies of
    // each other. A training feed discards empty documents; do so
    // explicitly here.
    val fp = docs.filter(col(textCol).isNotNull).withColumn("__fp",
      graft.functions.TextFunctions.fingerprint(col(textCol)))
    val deduped =
      if (docs.isStreaming)
        fp.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__fp")
      else fp.dropDuplicates("__fp")
    deduped.drop("__fp")
  }

  /** Streaming NEAR-dup suppression — the streaming form of the q45
    * batch SimHash grouping, for feeds where duplicates are lightly
    * mutated rather than byte-identical (re-crawls with reordered
    * boilerplate, trackers, timestamps). Keyed on the 32-bit SimHash of
    * the token multiset (graft_simhash, one fused native pass): token
    * REORDERINGS and whitespace/case noise collapse to the same key —
    * strictly more aggressive than [[dedupStream]]'s exact fingerprint —
    * while state stays one tiny key per surviving doc, bounded by the
    * watermark horizon. The first arrival in hash order wins, exactly
    * like the batch form's min-doc_id representative. Same code runs
    * batch via plain `dropDuplicates` (spec'd both ways). SimHash
    * exact-collision is the conservative end of near-dup (Hamming
    * radius 0); radius-k lookup needs the banded MinHash join
    * ([[graft.operators.NearDup]]), which is a batch/compaction-time
    * operation — pair joins don't fit the one-pass streaming state
    * model, and that split (cheap stream gate now, thorough batch pass
    * at compaction) is how production pipelines layer it. */
  def nearDupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "1 hour",
      bits: Int = 32): DataFrame = {
    graft.plans.VectorExpressions.ensureRegistered(docs.sparkSession)
    val keyed = docs.filter(col(textCol).isNotNull).withColumn("__sh",
      graft.functions.TextFunctions.simHashNative(col(textCol), bits))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__sh")
      else keyed.dropDuplicates("__sh")
    deduped.drop("__sh")
  }

  /** Streaming decontamination — the streaming face of the q134 bloom
    * filter: drop arriving documents whose word-8-grams hit the
    * benchmark bloom. The filter ships as a DENSE LITERAL word array
    * ([[graft.operators.Sketches.bloomDense]]) probed by a pure
    * `exists` expression over each doc's grams
    * ([[graft.operators.Sketches.bloomMightContainAny]]) — no join,
    * no shuffle, no state, so the operator is trivially
    * streaming-safe and BATCH-IDENTICAL (one code path, no
    * `isStreaming` branch at all; the spec pins batch == stream on
    * the same feed). No false negatives by bloom construction: a
    * truly contaminated doc can never slip through; false positives
    * drop clean docs at the sketch's documented rate — the
    * conservative direction for decontamination. */
  def decontamStream(
      docs: DataFrame,
      textCol: String,
      bloomWords: Seq[Long],
      mBits: Int,
      k: Int): DataFrame = {
    graft.plans.VectorExpressions.ensureRegistered(docs.sparkSession)
    docs.filter(col(textCol).isNotNull)
      .filter(!graft.operators.Sketches.bloomMightContainAny(
        graft.functions.TextFunctions.wordShinglesNative(
          col(textCol), 8),
        bloomWords, mBits, k))
  }

  /** Stream-stream interval join — correlate two event feeds per key
    * within a bounded event-time horizon (click→purchase attribution,
    * request→error correlation). INNER join on the key plus a range
    * predicate, with watermarks on BOTH inputs: the time bound and the
    * watermarks together are what make the join's buffered state
    * FINITE — each side holds only rows within `horizon` of the other
    * side's watermark and Spark evicts everything older (an unbounded
    * stream-stream join is the textbook state-OOM). Append mode is the
    * only output mode a watermarked stream-stream inner join supports,
    * and it's the right one: a pair is emitted exactly once, when both
    * sides have arrived.
    *
    * The same code runs in batch (watermarks no-op): with a selective
    * equi-key present, Catalyst plans the key join + residual range
    * filter natively — the bin-bucketed trick of
    * [[graft.operators.RangeJoin]] is for KEYLESS range predicates,
    * which would otherwise go nested-loop. q105 gates the batch form
    * against a DuckDB replay.
    *
    * Output columns: the key, both event ids/timestamps, and the lag
    * in whole seconds (exact long via epoch-second truncation — the
    * arithmetic any engine replays). */
  def correlate(
      left: DataFrame,
      right: DataFrame,
      key: String = "user_id",
      horizon: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame = {
      val renamed = df.select(
        col(key).as(s"${p}_key"), col("ts").as(s"${p}_ts"),
        col("event_id").as(s"${p}_event_id"))
      if (df.isStreaming) renamed.withWatermark(s"${p}_ts", watermark)
      else renamed
    }
    side(left, "l")
      .join(side(right, "r"),
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
      .select(col("l_key").as(key), col("l_event_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"),
        (unix_timestamp(col("r_ts")) - unix_timestamp(col("l_ts")))
          .as("lag_s"))
  }

  /** LEFT OUTER stream-stream interval join — [[correlate]]'s other
    * half, and the semantics every funnel abandonment / SLA-miss
    * monitor actually needs: matched (l, r) pairs emit exactly like
    * the inner join, and an UNMATCHED left row emits ONCE,
    * null-padded, only after the watermark proves no right row can
    * still arrive inside its horizon (the null is a VERDICT —
    * "nothing followed within 30 minutes" — not an absence; emitting
    * it early would be wrong, which is why outer stream joins
    * REQUIRE both watermarks plus the time-range bound). State is
    * the same watermark-bounded buffer as the inner join; batch
    * frames run the identical plain left-outer join (gated as the
    * q218 batch face). */
  def correlateOuter(
      left: DataFrame,
      right: DataFrame,
      key: String = "user_id",
      horizon: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame = {
      val renamed = df.select(
        col(key).as(s"${p}_key"), col("ts").as(s"${p}_ts"),
        col("event_id").as(s"${p}_event_id"))
      if (df.isStreaming) renamed.withWatermark(s"${p}_ts", watermark)
      else renamed
    }
    side(left, "l")
      .join(side(right, "r"),
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col("l_key").as(key), col("l_event_id"),
        col("r_event_id"), col("l_ts"), col("r_ts"),
        (unix_timestamp(col("r_ts")) - unix_timestamp(col("l_ts")))
          .as("lag_s"))
  }

  /** Streaming index ingest — the reference's continuous lifecycle
    * (create the indexed table once, insert embedded documents forever
    * after: load.py:26 + doc_embedder.py:90-114) as one Structured
    * Streaming composition over an EXISTING persisted
    * [[graft.operators.IvfIndex]]:
    *
    *   [[dedupStream]] (exact content dedup, state bounded by the
    *   watermark) → `embed` (any DataFrame→DataFrame embedder stage —
    *   the model seam, e.g. a BatchEmbedder, producing the index's
    *   (id, vector[, component]) schema) → foreachBatch
    *   [[graft.operators.IvfIndex.appendTo]].
    *
    * Each micro-batch assigns its new vectors to the index's EXISTING
    * centroids — a sidecar read plus a narrow per-row argmin, NO k-means
    * refit, no corpus scan, no shuffle — and appends into the
    * cluster-partitioned (or two-level component-scoped) layout, so
    * appended vectors are immediately searchable with recall untouched
    * for existing ones. Returns the writer un-started: callers set their
    * own checkpoint/trigger options.
    *
    * Delivery: foreachBatch is AT-LEAST-ONCE — after a restart from the
    * checkpoint, Spark re-runs the last uncommitted batch. A re-run of a
    * batch whose append already COMMITTED is made idempotent here with a
    * marker under `_ingest_log/<ingestId>/` (underscore-hidden from
    * Spark's data listing, like the centroid sidecar): marked batches
    * skip the write. `ingestId` must be 1:1 with the CHECKPOINT
    * lifecycle — batchIds restart at 0 for a fresh checkpoint or a
    * second query into the same root, and bare-batchId markers from an
    * earlier lifecycle would then silently SKIP the new stream's first
    * batches (data loss, strictly worse than the duplicates they
    * prevent); hence the id is a required parameter, not a default.
    * Plain parquet has no atomic multi-file commit, so the two windows
    * that could DUPLICATE a batch — a crash BETWEEN the data commit
    * and the marker, and the post-append compact-lock re-check below
    * (an appended batch deliberately left unmarked so the compacted
    * root cannot silently lose it) — are closed with a STARTED marker
    * (`batch-N.started`, written ATOMICALLY — temp file + rename —
    * before the append, carrying the root's pre-append data-file
    * listing): a re-delivered batch that finds started-but-not-
    * committed first PURGES the files added since that snapshot
    * ([[graft.operators.IvfIndex.purgeFilesNotIn]] — exactly the
    * crashed append's remnants, full or partial) and then appends
    * cleanly. The purge is FILE-scoped, not id-scoped, because ids may
    * legitimately repeat across batches (the upstream [[dedupStream]]
    * dedups by content fingerprint within a watermark, not by id) and
    * deleting by the re-delivered batch's ids would silently remove an
    * EARLIER batch's committed row — exactly the silent loss this
    * module forbids. Ingest is therefore exactly-once end to end; the
    * purge runs ONLY on the crash-recovery path and is metadata-only
    * (no Spark job) — the happy path pays one marker write plus one
    * recursive file listing of the root per non-empty batch (listing
    * cost tracks file count, which [[graft.operators.IvfIndex.compact]]
    * exists to bound).
    *
    * Coordination with [[graft.operators.IvfIndex.compact]]: while the
    * compactor holds `_compact_lock` on this root, every batch FAILS
    * loudly (no append, no marker) instead of racing the copy — restart
    * the query after the compact; the markers make the re-run
    * idempotent. */
  def indexedIngest(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      embed: DataFrame => DataFrame,
      indexPath: String,
      idCol: String,
      vecCol: String,
      ingestId: String,
      watermark: String = "1 hour"): DataStreamWriter[Row] = {
    require(ingestId.nonEmpty && !ingestId.contains("/"),
      s"ingestId must be a non-empty path segment, got '$ingestId'")
    embed(dedupStream(docs, textCol, tsCol, watermark))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          s"$indexPath/${IngestLogDir}/$ingestId/batch-$batchId")
        val fs = marker.getFileSystem(
          spark.sessionState.newHadoopConf())
        // a compacting root must not take new batches: the compactor's
        // copy would silently miss them in the fresh root. Fail the
        // query LOUDLY instead — restarting it after the compact (onto
        // the old or the swapped root) is safe, because the per-batch
        // markers make the re-run idempotent. A batch already past this
        // check when the lock lands is caught twice more: the lock is
        // RE-CHECKED just before the marker write (shrinking the race
        // window to the append duration — see below), and compact's
        // marker re-list tripwire aborts on markers that land anyway.
        val lock = new org.apache.hadoop.fs.Path(
          s"$indexPath/${graft.operators.IvfIndex.CompactLockFile}")
        if (fs.exists(lock))
          throw new IllegalStateException(
            s"indexedIngest: $indexPath is being compacted ($lock " +
              "present) — batches are refused so the compacted root " +
              "cannot silently lose them. Restart this query after the " +
              "compact finishes (re-runs are idempotent via the batch " +
              "markers).")
        if (!fs.exists(marker)) {
          // the batch frame feeds TWO actions (emptiness probe + append
          // write) and foreachBatch re-executes its plan per action —
          // with a real model in the embed seam that would double the
          // model compute — so pin it for the batch's lifetime
          batch.persist()
          try {
            val started = new org.apache.hadoop.fs.Path(
              marker.toString + ".started")
            val rootPath = new org.apache.hadoop.fs.Path(indexPath)
            val nonEmpty = !batch.isEmpty
            // started-but-not-committed: a previous attempt crashed
            // between its append and its marker (or was refused by the
            // TOCTOU lock re-check below) — some or all of its files
            // may have landed. Purge exactly the FILES added since the
            // snapshot the crashed attempt recorded in its .started
            // marker (never by id: ids can repeat across batches, and
            // an id purge would delete an earlier batch's committed
            // row), turning the at-least-once re-delivery into an
            // exactly-once commit. Metadata-only — no Spark job. Runs
            // whenever .started exists, EVEN IF this re-delivery is
            // empty (a nondeterministic source can re-deliver a
            // crashed non-empty batch as empty — its remnants, full
            // or torn, must still be purged; the purge keys on the
            // snapshot, never on this batch's rows).
            if (fs.exists(started)) {
              val lines = {
                val in = fs.open(started)
                val bytes =
                  try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
                  finally in.close()
                new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
                  .linesIterator.toVector
              }
              val stamped = lines.headOption.contains(StartedFormatStamp)
              val snap = (if (stamped) lines.tail else lines)
                .filter(_.nonEmpty).toSet
              // UPGRADE GUARD: a marker WITHOUT the format stamp is from
              // the pre-snapshot format, which wrote .started even for
              // EMPTY batches with an empty body — purging against that
              // empty "snapshot" would delete every data file in the
              // root. An empty stamped snapshot is legitimate (first
              // batch into a fresh root: everything present IS the
              // crashed attempt's remnant), so only the legacy-empty
              // combination is refused. Upgrading a live ingest whose
              // root carries an UNCOMMITTED legacy .started must clear
              // that marker manually — the batch then re-delivers as
              // at-least-once (possible duplicates, never data loss).
              if (!stamped && snap.isEmpty &&
                graft.operators.IvfIndex.listDataFiles(fs, rootPath)
                  .nonEmpty) {
                org.slf4j.LoggerFactory.getLogger(getClass)
                  .warn(s"indexedIngest: $started is a LEGACY-format " +
                  "marker with an empty snapshot over a non-empty root — " +
                  "SKIPPING the recovery purge (purging would delete the " +
                  "whole root). If this batch's previous attempt appended " +
                  "files, they will duplicate; clear the marker and " +
                  "deduplicate by content fingerprint if exactness is " +
                  "required.")
              } else {
                graft.operators.IvfIndex.purgeFilesNotIn(
                  spark, indexPath, snap)
              }
            }
            // record the PRE-append listing in the .started marker via
            // write-temp-then-rename: a torn snapshot would make the
            // recovery purge treat pre-existing files as crashed
            // remnants and delete committed data, so the marker must
            // appear atomically or not at all. (Crash before the
            // rename: no .started, nothing appended — a clean re-run.)
            // An EMPTY batch writes NO .started at all: no append
            // follows, so there is nothing to recover — and an empty
            // snapshot would be a loaded gun if the batchId were ever
            // re-delivered non-empty (a nondeterministic source /
            // dedup replay), making recovery purge the ENTIRE root.
            if (nonEmpty) {
              val snapshot = graft.operators.IvfIndex
                .listDataFiles(fs, rootPath).toSeq.sorted
              val startedTmp = new org.apache.hadoop.fs.Path(
                started.toString + ".tmp")
              val out = fs.create(startedTmp, true)
              // the format stamp leads the body: recovery trusts an
              // empty snapshot only when the stamp proves it was
              // written by a format that never marks empty batches
              try out.write((StartedFormatStamp +: snapshot)
                .mkString("\n")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
              if (fs.exists(started)) fs.delete(started, false)
              require(fs.rename(startedTmp, started),
                s"indexedIngest: could not publish $started")
              // an empty micro-batch must not pay the load + write job
              graft.operators.IvfIndex.appendTo(
                spark, indexPath, batch, idCol, vecCol)
            }
            // TOCTOU shrink: a compact lock that landed DURING the
            // append means the compactor's plan-time listing may not
            // include this batch's files — refuse to mark the batch
            // committed, so a restart RE-DELIVERS it (bounded by the
            // documented at-least-once window via the markers) instead
            // of the compacted root silently losing it. The residual
            // race is now only the marker-write duration, and compact's
            // mid-copy marker tripwire covers exactly that.
            if (fs.exists(lock))
              throw new IllegalStateException(
                s"indexedIngest: compact lock appeared during batch " +
                  s"$batchId's append on $indexPath — leaving the batch " +
                  "UNMARKED so a restart re-delivers it; marking it now " +
                  "could let the compacted root silently miss its files. " +
                  "The batch's append already landed, but its .started " +
                  "snapshot makes the re-delivery purge those files " +
                  "before re-appending — no duplicates.")
            // create() makes missing parents itself — no mkdirs RPC
            fs.create(marker, true).close()
            // the .started marker is only consulted when the commit
            // marker is ABSENT — once the commit lands it is dead
            // weight (each carries a full root file listing, so
            // leaving them would grow _ingest_log O(batches × files)
            // over a long-running ingest). Safe even if the delete
            // itself crashes: the commit marker already routes every
            // re-delivery to the skip branch.
            if (fs.exists(started)) fs.delete(started, false)
            ()
          } finally batch.unpersist()
        } else {
          // a marked (already-committed) batch is skipped for the SINK,
          // but its plan must still EXECUTE: the upstream stateful dedup
          // holds per-key state whose store commits Spark validates per
          // micro-batch — leaving a re-delivered batch unexecuted fails
          // the restarted query (BatchCommitTracker: "Expected N commits
          // but got 0"; caught by the chaos spec). One full no-op pass
          // commits every state partition and writes nothing.
          batch.queryExecution.toRdd.foreach(_ => ())
        }
      }
  }

  /** per-batch commit markers for [[indexedIngest]] — underscore prefix
    * hides the directory from Spark's parquet file listing. Visible to
    * [[graft.operators.IvfIndex.compact]], whose concurrent-ingest guard
    * watches this directory for markers appearing mid-compact. */
  private[graft] val IngestLogDir = "_ingest_log"

  /** first line of every `.started` marker — proves the body is a
    * pre-append FILE SNAPSHOT from a format that never marks empty
    * batches, so recovery may trust even an EMPTY snapshot (fresh
    * root). An unstamped marker is the pre-snapshot legacy format,
    * whose empty body over a non-empty root must NOT drive a purge
    * (it would delete the whole root); data-file paths can never
    * collide with the stamp (none starts with `#`). */
  private[graft] val StartedFormatStamp = "#graft-started-v2"

  /** per-batch commit markers for [[servingSearch]] results — the same
    * discipline as [[IngestLogDir]], namespaced under the OUTPUT root */
  private[graft] val ServingLogDir = "_serving_log"

  /** Streaming ANN SERVING face — the reference's flagship serving loop
    * (reference rag_graph.py:247-257: query → embed → partition-pruned
    * top-k) as a stream, closing the one operator family whose
    * streaming twin was missing (r15 verdict #1; dedup, decontam,
    * anomaly, near-dup, and moments all had theirs): a stream of
    * queries is micro-batched through ONE probe-pruned
    * [[graft.operators.IvfIndex.searchBatch]] per trigger against the
    * PERSISTED index root, and each batch's per-query top-k lands in
    * `outPath` exactly once via the [[indexedIngest]] commit-marker
    * discipline.
    *
    * Mechanics per micro-batch: `embed` turns the raw query rows into
    * `(queryIdCol, queryVecCol)` — the same model seam as
    * [[indexedIngest]]'s, where a [[graft.functions.BatchEmbedder]]
    * slots in — then the index root is RE-LOADED (a sidecar read plus
    * a lazy parquet listing, no corpus scan) so rows appended by a
    * concurrent [[indexedIngest]] become searchable at the very next
    * trigger. `indexPath` may also be a
    * [[graft.sources.VersionedRoot]] BASE: the `_current` pointer is
    * resolved per trigger, so a rebuild published by pointer swap
    * (compact/rebalance/refit into `v-N` + `publish`) is served
    * atomically from the next batch — no retire-then-move window
    * where a trigger finds no root. One searchBatch serves the whole
    * batch: probe
    * planning collects only the micro-batch's queries (bounded by the
    * trigger, the documented query-set regime) and the corpus-side
    * scan is pruned to the UNION of their probed clusters. A `filter`
    * (+ `filterSelectivity` widening) applies the
    * [[graft.operators.IvfIndex#search]] filtered-ANN contract to
    * every served query — the reference's serving loop scopes ANN by
    * `partition_names`; the streaming face takes the general
    * predicate that scoping generalizes to.
    *
    * Delivery: foreachBatch is AT-LEAST-ONCE, so a restarted query
    * re-runs its last uncommitted batch; a marker under
    * `outPath/_serving_log/<servingId>/` makes the re-run skip the
    * work entirely (searchBatch is deterministic — rounded (dist, id)
    * ranking — so a re-delivered batch would re-derive byte-identical
    * rows, but the marker spares the search too). Results themselves
    * commit ATOMICALLY: each batch writes to a staging dir and is
    * RENAMED into `results/batch_id=N`, so the crash window between
    * result commit and marker write duplicates nothing — the re-run
    * finds the dest dir present, skips the write, and restores the
    * marker. Result delivery is exactly-once; the hive-style
    * partition dir surfaces `batch_id` to readers, keeping the
    * (`servingId`, `batch_id`, query id, result id) identity a
    * re-submitted query id needs (r16 advice). `servingId` must be
    * 1:1 with the checkpoint lifecycle,
    * exactly like `ingestId`: batchIds restart at 0 for a fresh
    * checkpoint, and stale markers from an earlier lifecycle would
    * silently swallow the new stream's first answers.
    *
    * Unlike [[indexedIngest]] this face takes NO compact lock: it only
    * READS the index root, and [[graft.operators.IvfIndex.compact]] is
    * copy-based — the source root stays intact until the caller swaps
    * readers to the fresh root. Returns the writer un-started: callers
    * set their own checkpoint/trigger options. */
  def servingSearch(
      queries: DataFrame,
      embed: DataFrame => DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      indexPath: String,
      idCol: String,
      vecCol: String,
      outPath: String,
      servingId: String,
      k: Int,
      nprobe: Int,
      rankRoundDp: Option[Int] = Some(4),
      filter: Option[org.apache.spark.sql.Column] = None,
      filterSelectivity: Option[Double] = None): DataStreamWriter[Row] = {
    require(servingId.nonEmpty && !servingId.contains("/"),
      s"servingId must be a non-empty path segment, got '$servingId'")
    queries.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          s"$outPath/$ServingLogDir/$servingId/batch-$batchId")
        val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          // the embedded batch feeds TWO actions (emptiness probe +
          // the searchBatch query collect) — pin it so a real model in
          // the embed seam runs once per batch, not once per action
          val embedded = embed(batch).persist()
          try {
            // the batch's results commit by RENAME into a hive-style
            // batch_id=N partition dir: write to a staging dir, move
            // it into place atomically, THEN write the marker. A crash
            // between rename and marker re-runs the batch, finds the
            // dest already present, and skips straight to the marker —
            // so results are exactly-once, not merely
            // at-least-once-with-duplication (r16 verdict #4). The
            // partition dir also carries batch_id to readers, keeping
            // the (servingId, batch_id, query id, result id) key.
            val dest = new org.apache.hadoop.fs.Path(
              s"$outPath/results/batch_id=$batchId")
            if (!fs.exists(dest) && !embedded.isEmpty) {
              // follow the version pointer (if the root is versioned)
              // ONCE PER TRIGGER: a publisher's atomic pointer swap
              // (VersionedRoot.publish — rename, never a torn read)
              // lands at the very next batch with no channel into
              // this JVM; an unversioned indexPath resolves to itself
              val liveRoot = graft.sources.VersionedRoot
                .resolve(spark, indexPath)
              val idx = graft.operators.IvfIndex.load(spark, liveRoot,
                idCol, vecCol)
              val staging = new org.apache.hadoop.fs.Path(
                s"$outPath/_serving_staging/$servingId/batch-$batchId")
              // searchBatch's output carries the query id as `query_id`;
              // the optional metadata predicate rides the probe-pruned
              // scan with the widened budget — generalizing the
              // reference serving loop's partition_names scoping
              // (doc_embedder.py:173-220) to any predicate
              idx.searchBatch(embedded, queryIdCol, queryVecCol, k,
                  nprobe, tieBreak = idCol, rankRoundDp = rankRoundDp,
                  filter = filter, filterSelectivity = filterSelectivity)
                .select(col("query_id"), col(idCol), col("dist"))
                .write.mode("overwrite").parquet(staging.toString)
              fs.mkdirs(dest.getParent)
              require(fs.rename(staging, dest),
                s"servingSearch: commit rename $staging -> $dest failed")
            }
            fs.create(marker, true).close()
          } finally embedded.unpersist()
        } else {
          // upstream stateful ops (a dedupStream on the query feed)
          // still need their state commits on a re-delivered batch —
          // same no-op execution as [[indexedIngest]]
          batch.queryExecution.toRdd.foreach(_ => ())
        }
    }
  }

  case class BudgetDoc(source: String, doc_id: Long, n_toks: Long)
  case class AdmitRow(source: String, doc_id: Long, n_toks: Long,
      cum: Long)

  /** Streaming token-budget gate — the INGESTION-TIME face of q87's
    * batch truncation (every pre-training mix caps each stratum at a
    * token budget; this applies the cap while the data arrives
    * instead of after it lands): per source, a document is admitted
    * while the source's RUNNING token total — advanced by every doc
    * SEEN, admitted or not, the same prefix rule q87's window cumsum
    * applies — stays within `budget`. Once a source's prefix crosses
    * the budget nothing later readmits (cum is monotone), so a
    * source simply goes quiet: the shape a crawl frontier consumes
    * to stop pulling from an exhausted source.
    *
    * Determinism contract: cross-trigger order is arrival order (a
    * stream's only order); within a trigger the group's rows fold in
    * `doc_id` order. The batch face is the q87 window cumsum over
    * (source, doc_id) — stream == batch whenever docs arrive in id
    * order, which the differential spec feeds.
    *
    * State per source is ONE long (the seen-token total), bounded by
    * the source vocabulary, not the stream; per-trigger work
    * materializes only that trigger's rows per group. Batch
    * execution runs the same handler with empty state — one big
    * trigger — and equals the batch face exactly. */
  def budgetGate(docs: Dataset[BudgetDoc],
      budget: Long): Dataset[AdmitRow] = {
    import docs.sparkSession.implicits._
    require(budget >= 0, s"budget must be >= 0, got $budget")
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, AdmitRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[BudgetDoc],
            state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val admitted = rows.toVector.sortBy(_.doc_id).flatMap { d =>
            seen += d.n_toks
            if (seen <= budget)
              Some(AdmitRow(src, d.doc_id, d.n_toks, seen))
            else None
          }
          state.update(seen)
          admitted.iterator
      }
  }

  /** q87's window-cumsum shape at an absolute budget — the batch face
    * [[budgetGate]] must agree with on an id-ordered feed. */
  def budgetGateBatch(docs: DataFrame, sourceCol: String,
      idCol: String, toksCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("cum", sum(col(toksCol)).over(
        Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
  }

  case class FlagRow(event_type: String, bin_start: Long, n: Long,
      trailing_sum: Long)

  /** per-type monitor state: open (not-yet-final) bin counts, the ring
    * of the last `trailing` FINALIZED bin counts (oldest first), and
    * the next expected bin start (−1 until the first bin finalizes) */
  case class AnomalyState(pending: Map[Long, Long], ring: Seq[Long],
      nextBin: Long)

  /** Streaming rate-anomaly monitor — the streaming face of the q122
    * batch query: per event type, counts land in event-time bins; a bin
    * FINALIZES when the watermark passes its end; finalized bins fold
    * into a ring of the last `trailing` counts (missing bins synthesize
    * as zeros — a silent lull is data) and a bin is flagged by the
    * same integer 3σ test q122 gates
    * (`w·x > S && (w·x−S)² > 9·(w·Q−S²)` — no doubles anywhere).
    *
    * Mechanics: `flatMapGroupsWithState` keyed on event_type; binning
    * happens INSIDE the state handler because Structured Streaming
    * does not allow another stateful op after a streaming aggregation.
    * The watermark upstream bounds `pending` (a bin stays open only
    * while the watermark can still admit its events) and drops late
    * rows; the ring is a fixed `trailing` longs; a gap wider than the
    * ring short-circuits to an all-zero ring, so state size and
    * per-batch work are bounded no matter how long the stream idles.
    * Output depends only on the finalized-bin sequence (pending bins
    * are folded in bin order), never on trigger boundaries.
    *
    * Batch note: on a batch frame the watermark is a no-op (always 0),
    * so nothing ever finalizes and this emits no rows — the batch face
    * of this monitor IS q122; tested against it differentially. */
  def anomalyFlags(
      events: Dataset[Event],
      binSecs: Long = 600L,
      trailing: Int = 72,
      watermark: String = "10 minutes"): Dataset[FlagRow] = {
    import events.sparkSession.implicits._
    require(binSecs >= 1 && trailing >= 1,
      s"binSecs/trailing must be positive, got $binSecs/$trailing")
    val w = trailing.toLong
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, FlagRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[Event], state: GroupState[AnomalyState]) =>
          var st = state.getOption
            .getOrElse(AnomalyState(Map.empty, Vector.empty, -1L))
          rows.foreach { e =>
            val sec = Math.floorDiv(e.ts.getTime, 1000L)
            val b = sec - Math.floorMod(sec, binSecs)
            // bins at or past nextBin are still open; earlier ones
            // already finalized (the watermark should have dropped
            // such rows upstream — ignoring them keeps the fold pure)
            if (st.nextBin < 0 || b >= st.nextBin)
              st = st.copy(pending =
                st.pending + (b -> (st.pending.getOrElse(b, 0L) + 1L)))
          }
          // batch execution has no watermark and THROWS here (rather
          // than returning 0); treat it as watermark 0 — nothing ever
          // finalizes, which is exactly the documented batch behavior
          val wmSec = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(0L) / 1000L
          val (done, keep) = st.pending.partition {
            case (b, _) => b + binSecs <= wmSec
          }
          val out = scala.collection.mutable.ListBuffer[FlagRow]()
          var ring = st.ring
          var next = st.nextBin
          def push(c: Long): Unit = {
            ring = (if (ring.size >= trailing) ring.drop(1) else ring) :+ c
          }
          done.toSeq.sortBy(_._1).foreach { case (b, n) =>
            if (next >= 0 && b > next) {
              val gapBins = (b - next) / binSecs
              if (gapBins >= trailing) ring = Vector.fill(trailing)(0L)
              else (0L until gapBins).foreach(_ => push(0L))
            }
            if (ring.size == trailing) {
              val s = ring.sum
              val q = ring.iterator.map(x => x * x).sum
              if (n * w > s && (n * w - s) * (n * w - s) > (q * w - s * s) * 9)
                out += FlagRow(typ, b, n, s)
            }
            push(n)
            next = b + binSecs
          }
          state.update(AnomalyState(keep, ring, next))
          out.iterator
      }
  }

  case class HeavyRow(event_type: String, window_start: Long,
      user_id: Long, est: Long, err: Long, window_n: Long)

  /** one space-saving step (Metwally et al. 2005): a known key
    * increments; an unknown key on a full summary EVICTS the minimum
    * counter ((count, key) order — deterministic) and inherits its
    * count as est with err = the inherited part. Shared by the
    * streaming handler and [[heavyHittersBatch]] so the two faces can
    * never drift. */
  private[streaming] def spaceSavingInsert(m: Map[Long, (Long, Long)],
      key: Long, capacity: Int): Map[Long, (Long, Long)] =
    m.get(key) match {
      case Some((c, e)) => m + (key -> (c + 1L, e))
      case None if m.size < capacity => m + (key -> (1L, 0L))
      case None =>
        val (evictKey, (evictC, _)) =
          m.minBy { case (mk, (mc, _)) => (mc, mk) }
        m - evictKey + (key -> (evictC + 1L, evictC))
    }

  /** The BATCH face of [[heavyHitters]] — the same space-saving
    * summary run per (type, tumbling window) group over a bounded
    * frame, where EVERY window finalizes at end of input (the batch
    * semantic; the streaming face finalizes at the watermark). Rows
    * fold in (ts, event_id) order inside each group, exactly the
    * within-trigger order the stream uses, so on a single-trigger
    * feed the two faces are row-identical (spec-pinned, evictions
    * included). When a window's distinct keys fit `capacity` the
    * summary degenerates to EXACT counts (est = true, err = 0) — the
    * regime the q223 gate pins against a plain groupBy-count oracle.
    * Scale shape: one shuffle on (type, window); per-group state is
    * `capacity` counters and the fold is one pass over the group —
    * the group is window-bounded, never corpus-bounded. */
  def heavyHittersBatch(
      events: Dataset[Event],
      windowSecs: Long = 3600L,
      k: Int = 5,
      capacity: Int = 16): Dataset[HeavyRow] = {
    import events.sparkSession.implicits._
    require(windowSecs >= 1 && k >= 1 && capacity >= k,
      s"need windowSecs>=1, k>=1, capacity>=k; " +
        s"got $windowSecs/$k/$capacity")
    events
      .groupByKey { e =>
        val sec = Math.floorDiv(e.ts.getTime, 1000L)
        (e.event_type, sec - Math.floorMod(sec, windowSecs))
      }
      .flatMapGroups { (key: (String, Long), rows: Iterator[Event]) =>
        val (typ, w) = key
        var m = Map.empty[Long, (Long, Long)]
        var n = 0L
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          m = spaceSavingInsert(m, e.user_id, capacity)
          n += 1L
        }
        m.toSeq
          .sortBy { case (key, (est, _)) => (-est, key) }
          .take(k)
          .map { case (key, (est, err)) =>
            HeavyRow(typ, w, key, est, err, n)
          }.iterator
      }
  }

  /** per-type monitor state: for each OPEN tumbling window, the
    * space-saving counter summary (user → (est, err)) and the
    * window's true event total */
  case class HeavyState(
      pending: Map[Long, (Map[Long, (Long, Long)], Long)])

  /** Streaming heavy hitters — per event type and tumbling event-time
    * window, the space-saving top-k (Metwally et al. 2005) of user
    * ids: the "who dominates this window's traffic" monitor a crawl
    * or serving feed runs continuously (hot-key detection for the
    * skew remedies, abuse triage, cache seeding). The summary keeps
    * `capacity` counters per open window: a known key increments; an
    * unknown key on a full summary EVICTS the minimum counter
    * ((count, key) order, deterministic) and inherits its count as
    * `est` with `err` = the inherited part. The classic guarantees —
    * est ≥ true ≥ est − err, and every key with true count >
    * window_total/capacity is PRESENT — hold under ANY arrival
    * order; the point estimates themselves are order-dependent, as
    * in every streaming sketch (rows fold in (ts, event_id) order
    * within a batch, so a given trigger shape is reproducible).
    * A window finalizes when the watermark passes its end — the
    * handler then emits its top-k by (est desc, user asc) with the
    * window total, and drops the summary. An IDLE type flushes too:
    * the handler registers an event-time TIMEOUT at the earliest
    * open window's end, so once the watermark (advanced by OTHER
    * types' traffic) passes it, Spark invokes the handler with no
    * rows and the window finalizes — without the timeout, a type
    * that stops receiving events would hold its last windows open
    * forever, the exact failure an abuse monitor can't afford.
    * State per (type, open window) is `capacity` counters —
    * watermark-bounded, trigger-shape-independent in SIZE. Batch
    * execution (no watermark, timeouts never fire) finalizes
    * nothing, matching [[anomalyFlags]]' documented batch
    * behavior. */
  def heavyHitters(
      events: Dataset[Event],
      windowSecs: Long = 3600L,
      k: Int = 5,
      capacity: Int = 16,
      watermark: String = "10 minutes"): Dataset[HeavyRow] = {
    import events.sparkSession.implicits._
    require(windowSecs >= 1 && k >= 1 && capacity >= k,
      s"need windowSecs>=1, k>=1, capacity>=k; " +
        s"got $windowSecs/$k/$capacity")
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HeavyState, HeavyRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[Event],
            state: GroupState[HeavyState]) =>
          var pending = state.getOption
            .getOrElse(HeavyState(Map.empty)).pending
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .foreach { e =>
              val sec = Math.floorDiv(e.ts.getTime, 1000L)
              val w = sec - Math.floorMod(sec, windowSecs)
              val (m, n) =
                pending.getOrElse(w, (Map.empty[Long, (Long, Long)], 0L))
              pending = pending +
                (w -> (spaceSavingInsert(m, e.user_id, capacity), n + 1L))
            }
          // batch execution throws on getCurrentWatermarkMs — treat
          // as watermark 0: nothing finalizes (documented behavior)
          val wmMs = scala.util.Try(state.getCurrentWatermarkMs())
            .toOption
          val wmSec = wmMs.getOrElse(0L) / 1000L
          val (done, keep) = pending.partition {
            case (w, _) => w + windowSecs <= wmSec
          }
          // a type with no open windows holds no information — drop
          // its state row entirely (new events recreate it) instead
          // of keeping an empty struct per dead type forever
          if (keep.isEmpty && wmMs.isDefined) state.remove()
          else state.update(HeavyState(keep))
          // idle-type flush: arm an event-time timeout at the
          // earliest still-open window's end, so this handler runs
          // again (with no rows) when the watermark passes it even
          // if this type never receives another event. The end is
          // strictly beyond the current watermark by construction
          // (keep = windows NOT yet finalized), which is what
          // setTimeoutTimestamp requires. Streaming only: batch
          // execution has no watermark and timeouts never fire.
          if (wmMs.isDefined && keep.nonEmpty)
            state.setTimeoutTimestamp(
              (keep.keys.min + windowSecs) * 1000L)
          done.toSeq.sortBy(_._1).iterator.flatMap { case (w, (m, n)) =>
            m.toSeq
              .sortBy { case (key, (est, _)) => (-est, key) }
              .take(k)
              .map { case (key, (est, err)) =>
                HeavyRow(typ, w, key, est, err, n)
              }
          }
      }
  }

  /** Stateful sessionization with the GroupState API
    * (`mapGroupsWithState`) — the Spark-native analogue of the
    * reference's stateful stream buffer (ST2, rag_graph.py:451-477),
    * applied to real data-plane state: per-user session counting across
    * micro-batches. State is one small struct per user; a processing-time
    * timeout would evict idle users in production. */
  def sessionize(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSummary](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0, 0))
          sorted.foreach { e =>
            val tsMicros = e.ts.getTime * 1000
            val isNew = st.lastTsMicros == Long.MinValue ||
              tsMicros - st.lastTsMicros > SessionGapMicros
            st = SessionState(tsMicros, st.nEvents + 1,
              st.nSessions + (if (isNew) 1 else 0))
          }
          state.update(st)
          SessionSummary(userId, st.nEvents, st.nSessions)
      }
  }
}

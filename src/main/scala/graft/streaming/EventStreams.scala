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
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
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
    * own checkpoint/trigger options (a production stream needs a durable
    * `checkpointLocation` for exactly-once appends). */
  def indexedIngest(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      embed: DataFrame => DataFrame,
      indexPath: String,
      idCol: String,
      vecCol: String,
      watermark: String = "1 hour"): DataStreamWriter[Row] =
    embed(dedupStream(docs, textCol, tsCol, watermark))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty micro-batch must not pay the load + write job
        if (!batch.isEmpty)
          graft.operators.IvfIndex.appendTo(
            batch.sparkSession, indexPath, batch, idCol, vecCol)
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

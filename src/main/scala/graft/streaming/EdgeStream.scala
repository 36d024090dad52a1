package graft.streaming

import graft.dml.GraphDml
import graft.meta.EdgeDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming ingestion — the beyond-reference extension of
  * SURVEY §2.10/§7.5: the reference has no streaming surface, but the
  * driver's `events` table motivates a thin `readStream → transform →
  * sink` layer for continuously arriving edges.
  *
  *  - [[edgeUpserts]]: micro-batch upserts via `foreachBatch`, reusing
  *    the exact same [[GraphDml.insertEdges]] rewrite the batch DML path
  *    uses — one code path for batch and streaming mutation;
  *  - [[windowedEventCounts]]: watermarked sliding-window aggregation,
  *    the standard Structured Streaming shape (state bounded by the
  *    watermark; at scale the shuffle is keyed by (window, user)).
  */
object EdgeStream {

  /** events(user_id, event_id, ...) → per-batch append of
    * `did` edges onto `userTable` (src=user gid, sink=event gid).
    * The caller owns checkpointing/trigger config on the returned writer.
    *
    * When `sink` accessors are given, each batch also applies the
    * sink-side mirror (reversed adjacency + InDegree) — the same
    * two-sided consistency the batch DML path maintains. For
    * self-referencing edges pass the SAME accessors for both sides;
    * the updates fold sequentially like the bulk-load path.
    */
  def edgeUpserts(
      events: DataFrame,
      edge: EdgeDef,
      getTable: () => DataFrame,
      setTable: DataFrame => Unit,
      toPairs: DataFrame => DataFrame,
      getSink: Option[() => DataFrame] = None,
      setSink: Option[DataFrame => Unit] = None): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = toPairs(batch).localCheckpoint(true)
        if (!pairs.isEmpty) {
          val pre = getTable()
          // forward edgeIds assigned by this batch's insert, numbered
          // against the pre-insert table — the sink mirror's srcEdgeId
          val numbered = GraphDml.numberNewEdges(pre, edge, pairs)
            .localCheckpoint(true)
          setTable(GraphDml.insertEdges(pre, edge, pairs)
            .localCheckpoint(true))
          for (g <- getSink; s <- setSink) {
            s(GraphDml.insertEdgesSinkSide(g(), edge, numbered)
              .localCheckpoint(true))
          }
        }
      }

  /** watermarked tumbling-window counts per user over an event stream */
  def windowedEventCounts(events: DataFrame, tsCol: String,
      watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("user_id"))
      .agg(count(lit(1)).as("events"),
        sum(col("value")).as("total_value"))

  /** Streaming exact dedup over a document stream: drop rows whose
    * content fingerprint was already seen within the watermark horizon —
    * the streaming face of [[graft.ext.Dedup.exactGroups]]. State is the
    * fingerprint set, bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark`), so it does not grow without
    * bound on an infinite stream; at scale the state store shuffles on
    * the 16-byte fingerprint.
    */
  def dedupedDocs(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("__fp", graft.ext.TextFunctions.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** convenience: run a streaming query to completion over a bounded
    * source (tests / backfills)
    */
  def runOnce(w: DataStreamWriter[Row], checkpoint: String): StreamingQuery = {
    val q = w.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}

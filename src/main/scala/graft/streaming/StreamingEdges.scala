package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Turn

/** Streaming ingestion path. The reference is strictly batch (SURVEY.md
  * §2.5); this module is the engine's forward extension: transcripts arrive
  * as a stream and the SAME link-derivation semantics as
  * `GraphOps.linkPairs` (stable turn ordering + consecutive-duplicate
  * suppression) are applied incrementally, so an edge table can be kept
  * fresh without batch recomputation. Equivalence with the batch derivation
  * is asserted in StreamingSpec.
  */
object StreamingEdges {

  final case class LinkEvent(src_conv: String, dst_conv: String, turn_idx: Int)
  /** Per-conversation state: last processed turn + its tool payload. */
  final case class ConvState(lastTurnIdx: Int, lastTool: String)

  private val LinkRe = "^(invoke|reply):(.+)$".r

  /** Incremental linkPairs: keyed by conv_id; rows within a micro-batch are
    * sorted by turn_idx, state carries (lastTurnIdx, lastTool) across
    * batches so a link turn is suppressed iff the immediately preceding
    * turn carried the same link — identical to the batch lag-window rule.
    */
  def deriveLinks(turns: Dataset[Turn]): Dataset[LinkEvent] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, LinkEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          var st = state.getOption.getOrElse(ConvState(-1, null))
          // EXPLICIT MEMORY BOUND: one conversation's turns *within one
          // micro-batch* are buffered here to sort by turn_idx (the stable
          // turn ordering the derivation is defined over — Spark hands the
          // group unordered). The bound is max turns of ONE conv per batch,
          // NOT total conv length: state carries (lastTurnIdx, lastTool)
          // across batches, so a 10^7-turn conversation streamed over many
          // batches never accumulates. A single pathological batch that
          // contains millions of turns of one conv is the executor-memory
          // hazard; cap micro-batch size (maxOffsetsPerTrigger or source
          // equivalent) to keep per-group buffers bounded.
          // (StreamingSpec drives a 100k-turn conversation through this.)
          val buf = rows.toArray
          java.util.Arrays.sort(buf, Ordering.by((_: Turn).turn_idx))
          val out = scala.collection.mutable.ArrayBuffer[LinkEvent]()
          buf.foreach { t =>
            if (t.turn_idx > st.lastTurnIdx) { // ignore replays/out-of-order
              t.tool match {
                case LinkRe(_, target)
                    if target != conv && t.tool != st.lastTool =>
                  out += LinkEvent(conv, target, t.turn_idx)
                case _ => ()
              }
              st = ConvState(t.turn_idx, t.tool)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Watermarked tumbling-window event counts — the standard streaming
    * aggregate shape (readStream → watermark → window → agg).
    */
  def windowedEventCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
}

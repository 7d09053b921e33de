package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Turn
import graft.util.Hash64._

/** Deterministic synthetic transcripts (FIXTURES.md §1).
  *
  * Schema matches the north-rule input_hint exactly:
  * (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  *  ts:timestamp). Every field is a pure function of (seed, conv, turn), so
  * the per-turn text-equality invariant is checkable exactly and the same
  * table regenerates identically at any parallelism.
  *
  * Link structure (drives the derived graph):
  *  - tool-role turns may carry `invoke:<conv_id>` — a cross-conversation
  *    tool-invocation link;
  *  - turn 0 may carry `reply:<conv_id>` — the conversation replies to a
  *    parent conversation;
  *  - targets are preferentially attached to low-index conversations
  *    (u² shaping) and ~18% of links point at conversation 0, producing the
  *    skewed hub in-degree the north rule's salting requirement exercises;
  *  - ~5% of conversations emit no links at all → dangling vertices
  *    (≙ rows with no nonzeros, /root/reference/ppagerank.cc:244).
  */
object TranscriptGen {
  val DefaultSeed = 42L
  // Fixed epoch: 2024-01-01T00:00:00Z (no wall clock anywhere).
  private val EpochMs = 1704067200000L

  def numTurns(seed: Long, c: Long): Int = 3 + mod(h(seed, c, 1L), 8L).toInt

  def isDangling(seed: Long, c: Long): Boolean = mod(h(seed, c, 2L), 100L) < 5

  def role(i: Int): String = (i % 3) match {
    case 0 => "user"
    case 1 => "assistant"
    case _ => "tool"
  }

  def text(seed: Long, c: Long, i: Int): String =
    s"c$c-t$i-" + java.lang.Long.toHexString(h(seed, c, i.toLong, 3L))

  /** Preferential-attachment target: u² shaping toward low conversation ids,
    * with an extra 18% mass on conversation 0 (the mega-hub).
    */
  def linkTarget(seed: Long, c: Long, i: Int, nConv: Long): Long = {
    val r = h(seed, c, i.toLong, 5L)
    if (mod(r, 100L) < 18 && c != 0L) 0L
    else {
      val u = mod(h(seed, c, i.toLong, 7L), 1000000L).toDouble / 1000000.0
      val t = (u * u * nConv).toLong min (nConv - 1)
      if (t == c) (c + 1) % nConv else t
    }
  }

  /** tool column for turn i of conversation c (null unless a link or a tool name). */
  def toolCol(seed: Long, c: Long, i: Int, nConv: Long): String = {
    val dangling = isDangling(seed, c)
    if (i == 0) {
      if (!dangling && c > 0 && mod(h(seed, c, 6L), 4L) < 2)
        s"reply:c${linkTarget(seed, c, 0, nConv)}"
      else null
    } else if (role(i) == "tool") {
      if (!dangling && mod(h(seed, c, i.toLong, 4L), 10L) < 6)
        s"invoke:c${linkTarget(seed, c, i, nConv)}"
      else s"tool${mod(h(seed, c, i.toLong, 8L), 5L)}"
    } else null
  }

  def turnsOf(seed: Long, c: Long, nConv: Long): Seq[Turn] = {
    val n = numTurns(seed, c)
    (0 until n).map { i =>
      Turn(
        conv_id = s"c$c",
        turn_idx = i,
        role = role(i),
        text = text(seed, c, i),
        tool = toolCol(seed, c, i, nConv),
        ts = new Timestamp(EpochMs + c * 3600000L + i * 60000L))
    }
  }

  /** Distributed generation: one `spark.range` task stripe per partition;
    * rows never touch the driver.
    */
  def generate(spark: SparkSession, nConv: Long, seed: Long = DefaultSeed,
      partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    spark.range(0L, nConv, 1L, p).flatMap(c => turnsOf(seed, c, nConv))
  }
}

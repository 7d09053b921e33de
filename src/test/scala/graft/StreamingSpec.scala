package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps
import graft.ingest.TranscriptGen
import graft.streaming.StreamingEdges

class StreamingSpec extends AnyFunSuite with SparkTestBase {

  test("streaming link derivation matches the batch lag-window semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val turns = TranscriptGen.turnsOf(TranscriptGen.DefaultSeed, 0L, 64L) ++
      (0L until 64L).flatMap(c => TranscriptGen.turnsOf(TranscriptGen.DefaultSeed, c, 64L))

    val stream = MemoryStream[graft.model.Turn]
    // feed in two micro-batches split mid-conversation to exercise state
    val (b1, b2) = turns.splitAt(turns.size / 2)
    val q = StreamingEdges.deriveLinks(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_links")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_links")
      .select(col("src_conv"), col("dst_conv"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

    val batch = GraphOps.linkPairs(TranscriptGen.generate(spark, 64).toDF().as[graft.model.Turn])
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

    // the duplicated turns for conv 0 in the input replay are ignored by
    // the monotone turn_idx guard, so multisets must match exactly
    assert(got == batch)
  }

  test("a 100k-turn conversation streams through deriveLinks within memory bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one adversarially long conversation: every turn links to c<k%50>,
    // alternating targets so consecutive-dup suppression keeps most links
    val n = 100000
    val turns = (0 until n).map { i =>
      graft.model.Turn("big", i, "tool", s"t$i",
        s"invoke:c${i % 50}", new java.sql.Timestamp(1700000000000L + i))
    }
    val stream = MemoryStream[graft.model.Turn]
    val q = StreamingEdges.deriveLinks(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_big")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    // split mid-stream: state must carry the suppression across batches
    val (b1, b2) = turns.splitAt(n / 2)
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_big").count()
    // batch twin: lag-window suppression over the same turns
    val batch = GraphOps.linkPairs(turns.toDS()).count()
    assert(got == batch, s"streamed $got links, batch derivation $batch")
    assert(got == n, s"alternating targets never repeat consecutively: $got")
  }

  test("watermarked windowed aggregation over a streamed events table") {
    import spark.implicits._
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val schema = events.schema
    // file source: copy to a temp dir and readStream it
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val sdf = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingEdges.windowedEventCounts(sdf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_windows")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_windows")
      .agg(sum(col("n"))).head().getLong(0)
    assert(got == events.count()) // every event lands in exactly one window
  }
}

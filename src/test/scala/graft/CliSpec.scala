package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** A1 dispatcher coverage through the real CLI entry (`Main.runOne` with a
  * parsed option database): every algorithm dispatches, the K3 ranks sink
  * writes, unknown algorithms raise the reference's error semantics
  * (PPAGERANK_ERR_ALG_UNKNOWN, ppagerank.cc:140-142), and the new
  * `-alg ppr -seeds` path round-trips both seed spellings plus
  * checkpoint/resume.
  */
class CliSpec extends AnyFunSuite with SparkTestBase {

  test("runOne dispatches power/inout/arnoldi and writes the ranks sink") {
    val (n, edges) = GraphFixtures.g2
    val g = GraphFixtures.linkGraph(spark, n, edges)
    val out = Files.createTempDirectory("graft-cli").toString
    for (alg <- Seq("power", "inout", "arnoldi")) {
      Main.runOne(spark, g, Options.parse(Seq(
        "-alg", alg, "-tol", "1e-8", "-out", s"$out/$alg")))
      val ranks = spark.read.parquet(s"$out/$alg")
      assert(ranks.count() == n, s"$alg sink row count")
      assert(ranks.columns.contains("conv_id"), s"$alg sink joins the dict")
    }
    intercept[IllegalArgumentException] {
      Main.runOne(spark, g, Options.parse(Seq("-alg", "nope", "-noout")))
    }
  }

  test("-alg ppr accepts an id list or a seed parquet, checkpoints and resumes") {
    import spark.implicits._
    val (n, edges) = GraphFixtures.g2
    val g = GraphFixtures.linkGraph(spark, n, edges)
    val out = Files.createTempDirectory("graft-cli-ppr").toString
    Main.runOne(spark, g, Options.parse(Seq(
      "-alg", "ppr", "-seeds", "0,3", "-tol", "1e-8", "-out", s"$out/list")))
    val long = spark.read.parquet(s"$out/list")
    assert(long.count() == 2L * n)
    assert(long.select("seed").distinct().count() == 2)

    val seedsP = s"$out/seeds"
    Seq(0L, 3L).toDF("seed").write.parquet(seedsP)
    val ck = s"$out/ck"
    Main.runOne(spark, g, Options.parse(Seq(
      "-alg", "ppr", "-seeds", seedsP, "-checkpoint", ck,
      "-tol", "1e-8", "-noout")))
    assert(graft.ingest.TableIO.snapshots(spark, s"$ck/ppr", "iter_").nonEmpty)
    Main.runOne(spark, g, Options.parse(Seq(
      "-alg", "ppr", "-seeds", seedsP, "-checkpoint", ck, "-resume",
      "-tol", "1e-8", "-out", s"$out/resumed")))
    val resumed = spark.read.parquet(s"$out/resumed")
    // resumed run converges to the same PPR values as the fresh list run
    val a = long.select("id", "seed", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b = resumed.select("id", "seed", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(b(k) - v) < 1e-7, s"$k") }

    // ppr without -seeds is a usage error
    intercept[IllegalArgumentException] {
      Main.runOne(spark, g, Options.parse(Seq("-alg", "ppr", "-noout")))
    }
  }
}

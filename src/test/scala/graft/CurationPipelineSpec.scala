package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.CurationPipeline

/** The barrier strategy is a materialization choice, never a
  * semantics change: the default executor-pinned checkpoint and the
  * fault-tolerant parquet stage table (Barrier.stage — what a
  * standing production pipeline passes, SURVEY §6) must produce
  * identical curation results.
  */
class CurationPipelineSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$dir/documents.parquet").exists()

  test("stage-table barriers reproduce the checkpoint-barrier results exactly") {
    assume(haveData)
    val docs = graft.Tables.load(spark, dir, "documents")
    def rows(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id", "lang").orderBy("doc_id").collect().map(_.toSeq).toSeq

    val viaCheckpoint = rows(CurationPipeline.run(docs, "doc_id", "text", "lang"))
    Barrier.release(spark)

    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe_stage").toString
    val n = new AtomicInteger(0)
    val viaStage = rows(CurationPipeline.run(docs, "doc_id", "text", "lang",
      barrier = df => Barrier.stage(df, s"$tmp/stage_${n.getAndIncrement()}")))

    assert(n.get() == 3, "expected the three documented inter-stage barriers")
    assert(viaStage == viaCheckpoint)
    assert(viaCheckpoint.nonEmpty)

    // the first-class mode flag produces the same rows and lays the
    // stage tables out under the given dir
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_pipe_staged").toString
    val viaMode = rows(CurationPipeline.runStaged(docs, "doc_id", "text", "lang", tmp2))
    assert(viaMode == viaCheckpoint)
    assert(new java.io.File(s"$tmp2/stage_0").exists() &&
      new java.io.File(s"$tmp2/stage_2").exists())
  }

  test("prebuilt signature table reproduces the in-plan minhash stage exactly") {
    assume(haveData)
    val docs = graft.Tables.load(spark, dir, "documents")
    def rows(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id", "lang").orderBy("doc_id").collect().map(_.toSeq).toSeq

    val base = rows(CurationPipeline.run(docs, "doc_id", "text", "lang"))
    Barrier.release(spark)

    val sigPath = java.nio.file.Files.createTempDirectory("graft_pipe_sig").toString + "/sigs"
    CurationPipeline.buildSignatureTable(docs, "doc_id", "text", sigPath)
    val viaSigs = rows(CurationPipeline.runWithSignatures(
      docs, "doc_id", "text", "lang", spark.read.parquet(sigPath)))
    assert(viaSigs == base)
    assert(base.nonEmpty)
  }

  test("fully-persisted artifacts reproduce the in-plan run and never scan text") {
    assume(haveData)
    val docs = graft.Tables.load(spark, dir, "documents")
    def rows(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id", "lang").orderBy("doc_id").collect().map(_.toSeq).toSeq

    val base = rows(CurationPipeline.run(docs, "doc_id", "text", "lang"))
    Barrier.release(spark)

    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe_art").toString
    CurationPipeline.buildSignatureTable(docs, "doc_id", "text", s"$tmp/sigs")
    CurationPipeline.buildSignalTable(docs, "doc_id", "text", s"$tmp/signals")
    val out = CurationPipeline.runWithArtifacts(
      docs, "doc_id", "text", "lang",
      spark.read.parquet(s"$tmp/signals"), spark.read.parquet(s"$tmp/sigs"))
      .select("doc_id", "lang")

    // the run's only corpus read is (doc_id, lang): no parquet scan
    // in the final plan carries the text column
    val body = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = new scala.util.matching.Regex(
      "ReadSchema: struct<([^>]*)").findAllMatchIn(body).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => !s.contains("text:")),
      s"text column scanned: ${readSchemas.mkString(" | ")}")

    assert(rows(out) == base)
    assert(base.nonEmpty)
  }
}

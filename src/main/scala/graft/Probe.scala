package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic main — not part of the library. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.count()
    // replicate ngramJaccardPairs internals up to estOk
    val sigs = graft.dedup.Dedup.minHashSignatures(Tables.fanOut(docs), "doc_id", "text", 3, 32)
      .transform(Barrier.checkpoint)
    val cand = graft.dedup.Dedup.candidatesFromSignatures(sigs, "doc_id", 32, 8, 256)
    val sigA = sigs.select(col("doc_id").as("ida") +: (0 until 32).map(i => col(s"h$i").as(s"ha$i")): _*)
    val sigB = sigs.select(col("doc_id").as("idb") +: (0 until 32).map(i => col(s"h$i").as(s"hb$i")): _*)
    val est = (0 until 32).map(i => when(col(s"ha$i") === col(s"hb$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / 32
    val estOk = cand.join(sigA, "ida").join(sigB, "idb")
      .filter(est >= 0.5 - 0.25).select(col("ida"), col("idb"))
      .transform(Barrier.checkpoint)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.graftshim.ColumnBridge
    def shingleHashArray(tokens: org.apache.spark.sql.Column, n: Int) =
      ColumnBridge.column(graft.functions.expr.ShingleHashes(
        ColumnBridge.expression(tokens), n))
    val nPairs = time("estOk count")(estOk.count())
    val candIds = time("candIds distinct")({
      val ids = estOk.select(col("ida").as("doc_id"))
        .union(estOk.select(col("idb").as("doc_id"))).distinct()
      ids.cache(); ids.count(); ids
    })
    val fanned = Tables.fanOut(docs)
    val shFull = time("sh FULL corpus barrier")(Barrier.checkpoint(
      fanned.select(col("doc_id"), col("lang"),
        shingleHashArray(wsTokens(normText(col("text"))), 3).as("sh"))))
    val shCand = time("sh CANDIDATE-only barrier")(Barrier.checkpoint(
      fanned.join(broadcast(candIds), Seq("doc_id"), "leftsemi")
        .select(col("doc_id"), col("lang"),
          shingleHashArray(wsTokens(normText(col("text"))), 3).as("sh"))))
    def verify(sh: org.apache.spark.sql.DataFrame): Long = {
      val iCnt = ColumnBridge.column(graft.functions.expr.SortedIntersectCount(
        ColumnBridge.expression(col("sa")), ColumnBridge.expression(col("sb"))))
      estOk
        .join(sh.select(col("doc_id").as("ida"), col("lang").as("blk_a"), col("sh").as("sa")), "ida")
        .join(sh.select(col("doc_id").as("idb"), col("lang").as("blk_b"), col("sh").as("sb")), "idb")
        .filter(col("blk_a") === col("blk_b"))
        .withColumn("i", iCnt)
        .withColumn("jaccard", round(col("i") / (size(col("sa")) + size(col("sb")) - col("i")), 6))
        .filter(col("jaccard") >= 0.5)
        .count()
    }
    val vF = time("verify with FULL sh")(verify(shFull))
    val vC = time("verify with CAND sh")(verify(shCand))
    println(s"PROBE docs=$nDocs estOkPairs=$nPairs verifyFull=$vF verifyCand=$vC")
    spark.stop()
  }
}

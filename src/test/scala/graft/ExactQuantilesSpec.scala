package graft

import org.apache.spark.sql.functions._

import graft.operators.ExactQuantiles

/** The q_quantiles DuckDB oracle (percentile_disc) checks engine
  * parity; these check the two-phase histogram-guided plan against a
  * naive in-memory sort: exact equality (not within-a-bin closeness),
  * partition invariance, tie-heavy and degenerate one-value groups.
  */
class ExactQuantilesSpec extends SparkSpecBase {

  private val Ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)

  private def naive(rows: Seq[(String, Double)]): Map[String, (Double, Double, Double)] =
    rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      def pick(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
      g -> ((pick(0.25), pick(0.5), pick(0.95)))
    }

  private def run(rows: Seq[(String, Double)], parts: Int) = {
    import spark.implicits._
    ExactQuantiles.quantiles(
        rows.toDF("g", "x").repartition(parts), Seq("g"), col("x"), Ps)
      .select($"g", $"p25", $"p50", $"p95")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("matches the naive sort exactly — mixed, tie-heavy, and one-value groups") {
    val rows =
      (0L until 5000L).map(i => ("u", ((i * 2654435761L) % 99991L).toDouble / 7.0)) ++
      (0L until 3000L).map(i => ("ties", (i % 5).toDouble)) ++   // heavy duplicates
      (0L until 10L).map(_ => ("const", 42.5)) ++                // hi == lo
      (0L until 7L).map(i => ("tiny", i.toDouble))               // n < B
    val expect = naive(rows)
    val got = run(rows, 13)
    assert(got == expect)
  }

  test("partition invariance: identical values at any parallelism") {
    val rows = (0L until 4000L).map(i =>
      (s"g${i % 3}", ((i * 40503L) % 65521L).toDouble / 3.0))
    assert(run(rows, 1) == run(rows, 17))
    assert(run(rows, 1) == naive(rows))
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.dedup.Dedup

/** connectedGroups hardening (round-5 advice): pointer-doubling gives
  * log-round convergence on chain-shaped pair graphs (plain min-label
  * propagation needs diameter rounds — a 10k path would trip
  * maxIters=50), and the convergence probe rides the per-round
  * materializing job instead of costing a second join+count job.
  */
class ConnectedGroupsSpec extends SparkSpecBase {

  test("10k-node path graph converges in O(log n) rounds, one job per round") {
    import spark.implicits._
    val n = 10000
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("a", "b").repartition(8)

    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val grouped = Dedup.connectedGroups(pairs, "a", "b", "id")
      val rounds = Dedup.lastCcRounds
      // log2(10000) ~ 13.3; pointer doubling converges in ~log2 + slack
      assert(rounds <= 20, s"took $rounds rounds — not log-convergent")
      assert(rounds >= 4, s"took $rounds rounds — path can't converge that fast")

      val rows = grouped.collect()
      assert(rows.length == n)
      assert(rows.forall(_.getAs[Long]("group_id") == 0L))
      assert(rows.forall(_.getAs[Long]("group_size") == n.toLong))

      // job accounting: 2 input barriers + per round ONE main job plus
      // at most two broadcast materializations of the (persisted,
      // memory-resident) changed-label frame — the delta rounds trade
      // those two tiny collect jobs for not shuffling the edge frame —
      // + 1 final barrier + the collect's own jobs. Still catches a
      // per-round job explosion (the round-5 probe regression was
      // 2 FULL jobs/round).
      Thread.sleep(1000) // listener bus is async
      assert(jobs <= 3 * rounds + 12,
        s"$jobs jobs for $rounds rounds — rounds are paying unexpected extra jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Barrier.release(spark)
    }
  }

  test("iteration never mutates the caller session's planner conf " +
      "(round-16 verdict #8: a concurrent query must keep its width)") {
    import spark.implicits._
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    // poll the caller session's conf from a concurrent thread for the
    // whole call — the old save/set/restore pattern would be caught
    // here (it held shuffle.partitions at the iteration width, often
    // 1, for the entire run)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    val poller = new Thread(() => {
      while (!stop) {
        val w = spark.conf.get("spark.sql.shuffle.partitions")
        val aqe = spark.conf.get("spark.sql.adaptive.enabled")
        seen.add(s"$w|$aqe")
        Thread.sleep(5)
      }
    })
    val expected = s"${spark.conf.get("spark.sql.shuffle.partitions")}|" +
      spark.conf.get("spark.sql.adaptive.enabled")
    poller.start()
    try {
      val n = 4000
      val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
        .toDF("a", "b").repartition(8)
      val rows = Dedup.connectedGroups(pairs, "a", "b", "id").collect()
      assert(rows.length == n)
    } finally {
      stop = true
      poller.join()
      Barrier.release(spark)
    }
    import scala.jdk.CollectionConverters._
    val drifted = seen.asScala.filterNot(_ == expected).toSeq.distinct
    assert(drifted.isEmpty,
      s"caller session conf drifted mid-iteration: $drifted (expected $expected)")
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(after == before, s"conf not left intact: $after vs $before")
  }

  test("near-clique pair groups still converge in a couple of rounds") {
    import spark.implicits._
    // two 4-cliques (all pairs emitted) + an isolated pair
    val cliquePairs = for {
      base <- Seq(0L, 100L); i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val pairs = (cliquePairs :+ (500L, 501L)).toDF("a", "b")
    val rows = Dedup.connectedGroups(pairs, "a", "b", "id").collect()
    assert(Dedup.lastCcRounds <= 3, s"cliques took ${Dedup.lastCcRounds} rounds")
    val byGroup = rows.groupBy(_.getAs[Long]("group_id")).view
      .mapValues(_.map(_.getAs[Long]("id")).sorted.toSeq).toMap
    assert(byGroup(0L) == Seq(0L, 1L, 2L, 3L))
    assert(byGroup(100L) == Seq(100L, 101L, 102L, 103L))
    assert(byGroup(500L) == Seq(500L, 501L))
    Barrier.release(spark)
  }
}

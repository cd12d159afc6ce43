package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import QueryUtil._

/** Relational query-engine core over the TPC-H-ish star schema:
  * partial-agg groupBy, broadcast joins, multi-way joins, windows,
  * top-k per group, event-time windows. These prove the general query
  * surface the reference's host language (Python + in-memory lists)
  * cannot express at scale.
  */
object RelationalQueries {

  /** Z-curve geometry: 21 bits/key covers part/supp keys to 2M (the
    * 100× stress corpus reaches ~200k), 42-bit z-values stay in a
    * long; 64 top-bit buckets ≈ one file per bucket in ZOrderSpec's
    * layout.
    */
  private val ZBits = 21
  private val ZBuckets = 64

  val defs: Map[String, Q] = Map(
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          r6(avg(col("l_quantity"))).as("avg_qty"),
          r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // incremental aggregate maintenance (IncrementalAgg.merge): the
    // persisted partial-agg state (built once at "ingest" over the
    // standing 90% of lineitem) folded with the new batch's partials
    // (l_orderkey % 10 = 7) — result ≡ the full recompute, but the
    // refresh reads the batch + a state table bounded by group-key
    // cardinality, never the history. Partial sums are decimal-exact
    // so the merge's re-ordered additions are bit-for-bit.
    "q_agg_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def partials(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(28, 10))).as("sum_qty_d"),
          count(lit(1)).as("n_rows"))
      val statePath = persistedArtifact("aggstate", dir) { p =>
        partials(t(s, dir, "lineitem")
            .filter(pmod(col("l_orderkey"), lit(10)) =!= 7))
          .write.mode("overwrite").parquet(p)
      }
      val batch = partials(t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(10)) === 7))
      graft.operators.IncrementalAgg.merge(
          Seq(s.read.parquet(statePath), batch),
          keys = Seq("l_returnflag", "l_linestatus"),
          sumCols = Seq("sum_qty_d", "n_rows"))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty_d").cast("double"), 2).as("sum_qty"),
          col("n_rows"),
          round(col("sum_qty_d").cast("double") / col("n_rows"), 6).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q3_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-06-01")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-06-01")))
      // customer is the small side → broadcast; lineitem⋈orders is the
      // big shuffle join AQE handles.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    "q5_multijoin" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running_spend",
          round(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("running_spend"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // per-group top-3 via the bounded-heap TopKAgg (map-side partial
    // top-k: ≤ 3 pairs per (nation × partition) cross the shuffle) —
    // a window row_number would sort every supplier of every nation,
    // and suppliers grow with scale factor. Same total order as the
    // window idiom (score desc, id asc), so the oracle is unchanged.
    "q_topk_group" -> ((s, dir) => {
      import graft.functions.VectorFunctions.topK
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      val sup = t(s, dir, "supplier")
      rev.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(topK(col("revenue"), col("s_suppkey"), 3).as("top"))
        .select(col("s_nationkey"), posexplode(col("top")).as(Seq("_pos", "_t")))
        .select(col("s_nationkey"), col("_t.id").as("s_suppkey"),
          col("_t.score").as("revenue"), (col("_pos") + 1).cast("long").as("rk"))
        .orderBy(col("s_nationkey"), col("rk"))
    }),

    "q_events_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // grouping sets: rollup to (flag, status) → (flag) → grand total;
    // group keys coalesced to 'ALL' so the oracle compare is null-free.
    // Two-level shape (operators.TwoLevelAgg): the corpus-sized stage
    // is a plain partial-agg groupBy; rollup's Expand runs over the
    // ~|flag×status| pre-aggregate instead of replicating every fact
    // row ×3 — exact by decimal-sum associativity (TwoLevelAggSpec)
    "q_rollup" -> ((s, dir) => {
      graft.operators.TwoLevelAgg.preSumCount(t(s, dir, "lineitem"),
          Seq(col("l_returnflag"), col("l_linestatus")), col("l_quantity"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.operators.TwoLevelAgg.sumOfPartials().as("sum_qty"),
          graft.operators.TwoLevelAgg.countOfPartials.as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy(col("flag"), col("status"))
    }),

    // salted (two-phase) aggregation for hot keys
    // (graft.operators.Skew.saltedSumCount): groupBy(key, salt)
    // partials then groupBy(key) finals — the shape that spreads one
    // monster group over `saltBuckets` reducers when map-side combine
    // alone can't save the single hot reduce partition. Values
    // accumulate in DECIMAL so the two-phase sum is exact and the
    // plain-GROUP-BY oracle hash-matches (a double sum would drift
    // with phase boundaries).
    "q_skew_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = t(s, dir, "events")
        .withColumn("v", col("value").cast(DecimalType(28, 10)))
      graft.operators.Skew.saltedSumCount(ev, Seq("event_type"), "v", saltBuckets = 8)
        .select(col("event_type"),
          round(col("sum_v").cast("double"), 2).as("sum_value"),
          col("n"))
        .orderBy(col("event_type"))
    }),

    // PIVOT: long→wide per-user event-type totals in one aggregation
    // pass. The value list is EXPLICIT (the five generator types) —
    // .pivot(col) without values runs a driver-side distinct scan,
    // which a 100 TB pipeline must never do implicitly.
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
        .select(col("user_id"),
          coalesce(col("click"), lit(0.0)).as("click"),
          coalesce(col("error"), lit(0.0)).as("error"),
          coalesce(col("purchase"), lit(0.0)).as("purchase"),
          coalesce(col("signup"), lit(0.0)).as("signup"),
          coalesce(col("view"), lit(0.0)).as("view"))
        .orderBy(col("user_id"))
    }),

    // CUBE: all 2^k grouping-set combinations in ONE pass — the
    // corpus is scanned once, unlike k separate GROUP BYs — with the
    // two-level shape (operators.TwoLevelAgg) keeping the ×2^k Expand
    // off the fact table: it replicates the pre-aggregate's handful
    // of rows, not 100 TB of corpus
    "q_cube" -> ((s, dir) => {
      graft.operators.TwoLevelAgg.preSumCount(t(s, dir, "lineitem"),
          Seq(col("l_returnflag"), col("l_linestatus")), col("l_quantity"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.operators.TwoLevelAgg.sumOfPartials().as("sum_qty"),
          graft.operators.TwoLevelAgg.countOfPartials.as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy(col("flag"), col("status"))
    }),

    // MERGE INTO / CDC-apply: one full-outer shuffle join applies a
    // change frame (updates, deletes, inserts) to the base table in a
    // single pass — the lakehouse incremental-maintenance shape
    // (Delta/Iceberg MERGE). The change set is derived
    // deterministically from the base so the oracle replays it:
    // keys ≡0 (mod 5) update price +10%, keys ≡3 (mod 7) (minus the
    // update overlap) delete, keys ≡1 (mod 13) insert under fresh
    // keys. At 100 TB both sides are corpus-sized — the equi-join
    // shuffles on the key and nothing else moves; per-row case logic
    // stays in the projection. v_upsert/v_delete are the special
    // cases; this is the combined one-pass form.
    "q_merge" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val src = t(s, dir, "orders")
      val updates = src.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("u").as("op"),
          (col("o_totalprice") * 1.1).as("o_totalprice"))
      val deletes = src.filter(col("o_orderkey") % 7 === 3 && col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"), lit("d").as("op"),
          lit(null).cast("double").as("o_totalprice"))
      val inserts = src.filter(col("o_orderkey") % 13 === 1)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"), lit("i").as("op"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
      val changes = updates.unionByName(deletes).unionByName(inserts)
      graft.operators.MergeApply.applyChanges(base, changes, "o_orderkey")
        .orderBy(col("o_orderkey"))
    }),

    // Z-order (Morton) layout stats (operators.ZOrder — the OPTIMIZE
    // ZORDER analogue): bit-interleaved (l_partkey, l_suppkey), rows
    // bucketed by the z-value's top bits over the key range the data
    // actually OCCUPIES (fixed 21-bit geometry would put every
    // small-sf row in bucket 0 — a layout pass buckets the occupied
    // range, exactly like a writer planning file splits). The VALUE
    // is the layout: ZOrderSpec writes it and proves 2-D range scans
    // row-group-skip on both keys; this entry oracle-checks the curve
    // arithmetic on EVERY row (order-insensitive bit_xor checksum of
    // the z-values per bucket) and emits the per-bucket min/max boxes
    // in both key dimensions — the tight boxes ARE what makes the
    // layout prune. Shape note: this used to emit the whole z-valued
    // corpus under a global (orderkey, linenumber) sort, which is a
    // sort a real ZORDER pass never does (writeLayout shuffles by
    // bucket + sorts WITHIN partitions) and was the entry's entire
    // cost at 100× (23 s standalone, GC-bound); the per-bucket
    // aggregate checks the same arithmetic row-for-row with a
    // ZBuckets-row output and no global sort. The occupied-range
    // probe is one bounded 1-row aggregate (the same class of stats
    // pass AQE itself runs); its exact integer bit-length
    // (64 − nlz(mx)) is replicated in the oracle as length(bin(mx)).
    "q_zorder" -> ((s, dir) => {
      import graft.operators.ZOrder
      val li = t(s, dir, "lineitem")
      val mx = li.agg(max(greatest(col("l_partkey"), col("l_suppkey")))
        .cast("long")).head().getLong(0)
      val eBits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(mx))
      require(eBits <= ZBits, s"keys outgrew the $ZBits-bit curve (need $eBits)")
      val shift = math.max(0, 2 * eBits - Integer.numberOfTrailingZeros(ZBuckets))
      val z = ZOrder.zValue(col("l_partkey"), col("l_suppkey"), bits = ZBits)
      li.select(col("l_partkey"), col("l_suppkey"), z.as("zval"))
        .withColumn("zbucket", shiftright(col("zval"), shift))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("zval")).as("zmin"), max(col("zval")).as("zmax"),
          expr("bit_xor(zval)").as("zxor"),
          min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
          min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
        .orderBy(col("zbucket"))
    }),

    // arbitrary GROUPING SETS: an asymmetric set list —
    // ((flag,status),(status),()) — that neither ROLLUP (which would
    // drill (flag,status)→(flag)→()) nor CUBE (all 2^k sets) can
    // express. One corpus scan feeds every set, and the two-level
    // shape (operators.TwoLevelAgg) keeps the per-set Expand on the
    // pre-aggregate rather than the fact rows.
    "q_grouping_sets" -> ((s, dir) => {
      graft.operators.TwoLevelAgg.preSumCount(t(s, dir, "lineitem"),
          Seq(col("l_returnflag"), col("l_linestatus")), col("l_quantity"))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(graft.operators.TwoLevelAgg.sumOfPartials().as("sum_qty"),
          graft.operators.TwoLevelAgg.countOfPartials.as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy(col("flag"), col("status"))
    }),

    // distinct aggregation (count(distinct) expands to a two-phase
    // partial-distinct plan; the scale path swaps in
    // approx_count_distinct's HLL sketch with identical plan shape)
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // the SKETCH scale path for q_distinct, made first-class and
    // hash-oracled: portable HyperLogLog (graft.operators.HllSketch —
    // md5-derived registers, integer-exact harmonic sum, one division)
    // joined against the exact count to surface the measured error.
    // Shuffle: ≤32 register rows per group vs every distinct pair.
    "q_distinct_sketch" -> ((s, dir) => {
      import graft.operators.HllSketch
      val ev = t(s, dir, "events")
      val sk = HllSketch.distinctSketch(
        ev, Seq("event_type"), col("user_id").cast("string"))
        .withColumnRenamed("hll_est", "hll_users")
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      sk.join(exact, "event_type")
        .select(col("event_type"), col("hll_users"), col("n_regs_hit"),
          col("n_users"),
          round((col("hll_users") - col("n_users")) / col("n_users"), 6).as("rel_err"))
        .orderBy(col("event_type"))
    }),

    // the mergeable-sketch scale path for per-key frequency queries,
    // made first-class and hash-oracled: count-min (operators.CmSketch
    // — md5-derived positions, exact integer counters) estimates every
    // candidate's frequency from a constant 4×256 counter grid; keys
    // whose estimate clears a relative threshold (0.75% of the corpus,
    // compared in exact integer arithmetic) are the heavy hitters.
    // est ≥ exact ALWAYS (collisions only add), so the threshold scan
    // has no false negatives — the surfaced overcount column is the
    // sketch's only error mode. Shuffle: ≤1024 counter rows vs every
    // (key, count) pair.
    "q_heavy_hitters" -> ((s, dir) => {
      import graft.operators.CmSketch
      val ev = t(s, dir, "events")
      val key = col("user_id").cast("string")
      val cnts = CmSketch.counters(ev, key)
      val cand = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
      val tot = cand.agg(sum(col("exact")).as("_n"))
      CmSketch.estimate(cand, col("user_id").cast("string"), cnts)
        .crossJoin(broadcast(tot))
        .filter(col("_est") * 10000 >= lit(75) * col("_n"))
        .select(col("user_id"), col("_est").as("est"), col("exact"),
          (col("_est") - col("exact")).as("overcount"))
        .orderBy(col("user_id"))
    }),

    // runtime-filter join (operators.BloomJoin): a selective orders
    // predicate builds a 128 KiB bloom of surviving o_orderkeys,
    // embedded as a literal and probed inside the lineitem scan, so
    // only might-join rows reach the join exchange. No false
    // negatives → row-identical to the plain join, which is what the
    // oracle runs (a bloom never needs replaying to be checked).
    "q_bloom_join" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-04-01")))
      val pruned = graft.operators.BloomJoin.pruneFact(
        t(s, dir, "lineitem"), "l_orderkey", ord, "o_orderkey")
      pruned.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // the SKETCH scale path for q_quantiles, made first-class and
    // hash-oracled: fixed-bin histogram quantiles
    // (graft.operators.HistogramSketch) — ships ≤256 counter rows per
    // group instead of sorting every value; worst-case error one bin
    // width. Same role as approx_percentile's t-digest, but engine-
    // portable so DuckDB replays it bit-for-bit.
    "q_quantiles_sketch" -> ((s, dir) => {
      graft.operators.HistogramSketch.quantiles(
          t(s, dir, "lineitem"), Seq("l_returnflag"), col("l_extendedprice"),
          Seq("p25_est" -> 0.25, "p50_est" -> 0.5, "p95_est" -> 0.95))
        .orderBy(col("l_returnflag"))
    }),

    // Exact discrete quantiles per group — value at sorted position
    // ceil(p·n), the percentile_disc definition — via the two-phase
    // histogram-guided plan (graft.operators.ExactQuantiles). The
    // round-6 formulation ranked EVERY value in a window partitioned
    // by the 3-value flag: three reducers sorting the whole fact
    // table, the slowest op of the 100× sweep (60.8 s). Now a ≤256-
    // counter-per-group binning pass locates each target rank's bin
    // and only ~n/256 candidate rows are sorted — identical result
    // (the sorted-position value is unique even under ties), so the
    // percentile_disc oracle applies unchanged. q_quantiles_sketch
    // remains the one-pass approximate twin where a one-bin error
    // bound is acceptable.
    "q_quantiles" -> ((s, dir) => {
      graft.operators.ExactQuantiles.quantiles(
          t(s, dir, "lineitem"), Seq("l_returnflag"), col("l_extendedprice"),
          Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
        .orderBy(col("l_returnflag"))
    }),

    // Batch twin of graft.streaming.Sessionize (30-min gap sessions);
    // the streaming twin (flatMapGroupsWithState) is equivalence-tested
    // in StreamingSpec.
    "q_sessionize" -> ((s, dir) => {
      graft.streaming.Sessionize.batch(t(s, dir, "events"), gapMinutes = 30)
        .withColumn("session_id", col("session_id").cast("long"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // as-of join (graft.operators.TemporalJoins): each purchase gets
    // the user's most recent prior-or-simultaneous click — union +
    // carry-forward, one shuffle on user_id; DuckDB's native ASOF JOIN
    // is the oracle
    "q_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.TemporalJoins
        .asOf(purchases, Seq("event_id"), clicks, Seq("event_id"),
          keyCol = "user_id", tsCol = "ts", prefix = "click_")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("click_event_id").as("click_id"), col("click_ts"),
          when(col("click_ts").isNotNull,
            unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // interval range join: error events matched to the 30-min-gap
    // sessions containing them — bin-bucketed so the join is a hash
    // join on the bin key, not a nested loop. 300 s bins: sessions are
    // median-zero-length (p99 ~24 min), so small bins cut the
    // same-bin candidate count ~linearly (52G -> 2G at the 100×
    // corpus, 33.6 s -> ~15 s) while replication stays ~1.1×; see the
    // rangeJoinBinned scaladoc for the sizing rule
    "q_range" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sessions = graft.streaming.Sessionize.batch(ev, gapMinutes = 30)
        .select(col("user_id"), col("session_id").cast("long").as("session_id"),
          col("session_start"), col("session_end"))
      val errors = ev.filter(col("event_type") === "error").select(col("ts"))
      graft.operators.TemporalJoins
        .rangeJoinBinned(errors, "ts", sessions, "session_start", "session_end",
          binSeconds = 300L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_errors"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // the PERSISTED twin of q_range: the session table is a property
    // of the corpus version (exactly a dedup closure / signature
    // table — derived once per ingest from the full event log, reused
    // by every downstream range/as-of query), so the per-run plan is
    // the binned range join + count alone; the sessionize
    // window-shuffle over the whole log never re-runs. The error-event
    // side keeps its scan (that is the query's own predicate —
    // PushedFilters prunes it to the event_type rows). Rows identical
    // by construction (same sessionize, parquet round-trip) — oracle
    // shared verbatim with q_range.
    "q_range_persisted" -> ((s, dir) => {
      val sessions = persistedTable(s, "sessions", dir) { p =>
        graft.streaming.Sessionize.batch(t(s, dir, "events"), gapMinutes = 30)
          .select(col("user_id"), col("session_id").cast("long").as("session_id"),
            col("session_start"), col("session_end"))
          .write.mode("overwrite").parquet(p)
      }
      val errors = t(s, dir, "events")
        .filter(col("event_type") === "error").select(col("ts"))
      graft.operators.TemporalJoins
        .rangeJoinBinned(errors, "ts", sessions, "session_start", "session_end",
          binSeconds = 300L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_errors"))
        .orderBy(col("user_id"), col("session_id"))
    }))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // the merged state+batch partials must equal the full recompute —
    // the oracle IS the full recompute (same decimal-exact sums)
    "q_agg_incremental" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_group" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_nationkey, s_suppkey, revenue,
        |  CAST(row_number() OVER (PARTITION BY s_nationkey ORDER BY revenue DESC, s_suppkey) AS BIGINT) AS rk
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |QUALIFY rk <= 3
        |ORDER BY s_nationkey, rk""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    // salting is plan-level only — results are the plain aggregate
    "q_skew_agg" ->
      """SELECT event_type,
        |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_pivot" -> {
      def c(t: String) =
        s"""coalesce(round(CAST(sum(CAST(value AS DECIMAL(28,10)))
           |  FILTER (event_type = '$t') AS DOUBLE), 2), 0.0) AS $t""".stripMargin
      s"""SELECT user_id, ${Seq("click", "error", "purchase", "signup", "view").map(c).mkString(",\n  ")}
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "q_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice AS base_price FROM orders),
        |changes AS (
        |  SELECT o_orderkey, 'u' AS op, o_totalprice * 1.1 AS new_price
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'd' AS op, NULL::DOUBLE AS new_price
        |  FROM orders WHERE o_orderkey % 7 = 3 AND o_orderkey % 5 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS o_orderkey, 'i' AS op,
        |    o_totalprice + 1000.0 AS new_price
        |  FROM orders WHERE o_orderkey % 13 = 1)
        |SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
        |  CASE WHEN c.op IN ('u', 'i') THEN c.new_price ELSE b.base_price END AS o_totalprice,
        |  CASE WHEN c.op = 'u' THEN 'updated'
        |       WHEN c.op = 'i' THEN 'inserted'
        |       ELSE 'kept' END AS status
        |FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
        |WHERE c.op IS NULL OR c.op <> 'd'
        |ORDER BY o_orderkey""".stripMargin,

    // same fixed interleave terms as ZOrder.zValue — disjoint bit
    // positions, so the add chain is exact in both engines
    "q_zorder" -> {
      val terms = (0 until ZBits).flatMap { j =>
        Seq(s"(((l_partkey >> $j) & 1) << ${2 * j})",
          s"(((l_suppkey >> $j) & 1) << ${2 * j + 1})")
      }.mkString(" + ")
      val bshift = Integer.numberOfTrailingZeros(ZBuckets)
      s"""WITH mx AS (
         |  SELECT greatest(2 * length(bin(CAST(max(greatest(l_partkey, l_suppkey)) AS BIGINT))) - $bshift, 0) AS shft
         |  FROM lineitem),
         |zed AS (
         |  SELECT l_partkey, l_suppkey, ($terms) AS zval
         |  FROM lineitem)
         |SELECT (zval >> shft) AS zbucket, count(*) AS n,
         |  min(zval) AS zmin, max(zval) AS zmax,
         |  bit_xor(zval) AS zxor,
         |  min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |  min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |FROM zed, mx
         |GROUP BY 1
         |ORDER BY zbucket""".stripMargin
    },

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin,

    "q_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // bit-for-bit replay of HllSketch (see its scaladoc): same md5
    // register coordinates, same integer-scaled harmonic sum, and the
    // numerator constant embedded as the exact decimal rendering of
    // the Scala double — the one float division runs on identical bits
    "q_distinct_sketch" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT % ${graft.operators.HllSketch.M} AS b,
         |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)), 3, 13))::BIGINT AS w
         |  FROM events),
         |regs AS (
         |  SELECT event_type, b,
         |    max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS m
         |  FROM h GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type,
         |    CAST(sum(1::BIGINT << (53 - m)) AS BIGINT) AS s_hit,
         |    count(*)::BIGINT AS n_regs_hit
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT event_type, n_regs_hit,
         |    round(CAST('${graft.operators.HllSketch.NumeratorLit}' AS DOUBLE)
         |      / CAST(s_hit + (${graft.operators.HllSketch.M} - n_regs_hit)
         |             * ${graft.operators.HllSketch.Scale} AS DOUBLE), 4) AS hll_users
         |  FROM agg),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
         |  FROM events GROUP BY 1)
         |SELECT event_type, hll_users, n_regs_hit, n_users,
         |  round((hll_users - n_users) / n_users, 6) AS rel_err
         |FROM est JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin,

    // bit-for-bit replay of CmSketch (see its scaladoc): same
    // md5("j:key") positions, exact integer counters and threshold
    // compare — combine order cannot change a bit anywhere
    "q_heavy_hitters" ->
      s"""WITH cnt AS (
         |  SELECT j,
         |    ('0x'||substr(md5(j::VARCHAR||':'||CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
         |      % ${graft.operators.CmSketch.W} AS p,
         |    count(*)::BIGINT AS c
         |  FROM events CROSS JOIN range(0, ${graft.operators.CmSketch.D}) r(j)
         |  GROUP BY 1, 2),
         |cand AS (SELECT user_id, count(*)::BIGINT AS exact FROM events GROUP BY 1),
         |tot AS (SELECT CAST(sum(exact) AS BIGINT) AS n FROM cand),
         |est AS (
         |  SELECT user_id, exact, min(c) AS est FROM (
         |    SELECT cand.user_id, cand.exact, cnt.c
         |    FROM cand CROSS JOIN range(0, ${graft.operators.CmSketch.D}) r(j)
         |    JOIN cnt ON cnt.j = r.j
         |      AND cnt.p = ('0x'||substr(md5(r.j::VARCHAR||':'||CAST(cand.user_id AS VARCHAR)), 1, 4))::BIGINT
         |        % ${graft.operators.CmSketch.W})
         |  GROUP BY 1, 2)
         |SELECT user_id, est, exact, est - exact AS overcount
         |FROM est, tot WHERE est * 10000 >= 75 * n
         |ORDER BY user_id""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
        |  percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the PLAIN join — bloom pruning has no false negatives, so the
    // filtered plan must produce exactly these rows
    "q_bloom_join" ->
      """SELECT o_orderpriority,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-04-01'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // bit-for-bit replay of HistogramSketch (see its scaladoc):
    // identical IEEE chains — every constant is forced to DOUBLE
    // (DuckDB's bare 0.95 literal is DECIMAL, whose exact ceil could
    // differ from the double product Spark computes at integer
    // boundaries), floor/least/edge arithmetic in the same association
    // order, integer cumulative selection.
    "q_quantiles_sketch" -> {
      val b = graft.operators.HistogramSketch.B
      def sel(name: String, p: Double): String =
        s"min(CASE WHEN cum >= CAST(CEIL($p::DOUBLE * n) AS BIGINT) THEN bin END) AS _b_$name"
      // mirrors HistogramSketch's small-p exact path: when the target
      // rank is the group minimum (ceil(p·n) <= 1), return lo exactly
      def edge(name: String, p: Double): String =
        s"""CASE WHEN CAST(CEIL($p::DOUBLE * s.n) AS BIGINT) <= 1
           |  THEN round(s.lo, 6)
           |  ELSE round(s.lo + (_b_$name + 1) * (s.hi - s.lo) / $b.0, 6)
           |END AS $name""".stripMargin
      s"""WITH stats AS (
         |  SELECT l_returnflag AS g, min(l_extendedprice) AS lo,
         |    max(l_extendedprice) AS hi, count(*) AS n
         |  FROM lineitem GROUP BY 1),
         |binned AS (
         |  SELECT l.l_returnflag AS g,
         |    CASE WHEN s.hi = s.lo THEN 0
         |      ELSE CAST(LEAST(FLOOR((l.l_extendedprice - s.lo) * $b.0 / (s.hi - s.lo)),
         |                      ${b - 1}.0) AS BIGINT) END AS bin,
         |    count(*) AS c
         |  FROM lineitem l JOIN stats s ON l.l_returnflag = s.g
         |  GROUP BY 1, 2),
         |cum AS (
         |  SELECT c.g, c.bin, CAST(sum(c.c) OVER (PARTITION BY c.g ORDER BY c.bin) AS BIGINT) AS cum, s.n
         |  FROM binned c JOIN stats s ON c.g = s.g),
         |sel AS (
         |  SELECT g, ${sel("p25_est", 0.25)}, ${sel("p50_est", 0.5)}, ${sel("p95_est", 0.95)}
         |  FROM cum GROUP BY g)
         |SELECT s.g AS l_returnflag, s.n,
         |  ${edge("p25_est", 0.25)}, ${edge("p50_est", 0.5)}, ${edge("p95_est", 0.95)}
         |FROM sel JOIN stats s USING (g)
         |ORDER BY l_returnflag""".stripMargin
    },

    "q_sessionize" ->
      s"""WITH $SqlSessionCtes
         |SELECT user_id, session_id::BIGINT AS session_id,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events,
         |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_value
         |FROM s GROUP BY user_id, s.session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q_asof" ->
      """WITH p AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |c0 AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM events
        |  WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, max(event_id) AS event_id FROM c0 GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id, p.ts,
        |  c.event_id AS click_id, c.ts AS click_ts,
        |  CASE WHEN c.event_id IS NOT NULL
        |    THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_range" -> RangeJoinOracleSql,

    // identical semantics to q_range (same sessionize — the session
    // table round-trips through parquet unchanged); the entry pins the
    // persisted-sessions + join-only path to the same rows
    "q_range_persisted" -> RangeJoinOracleSql)

  /** Shared by q_range and its persisted twin (same session
    * derivation and join — the twin only changes where the session
    * table is read from).
    */
  private lazy val RangeJoinOracleSql: String =
    s"""WITH $SqlSessionCtes,
       |sess AS (
       |  SELECT user_id, session_id::BIGINT AS session_id,
       |    min(ts) AS session_start, max(ts) AS session_end
       |  FROM s GROUP BY user_id, s.session_id),
       |err AS (SELECT ts::TIMESTAMP AS ts FROM events WHERE event_type = 'error')
       |SELECT sess.user_id, sess.session_id, count(*) AS n_errors
       |FROM sess JOIN err
       |  ON err.ts BETWEEN sess.session_start AND sess.session_end
       |GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  /** Shared 30-min-gap session CTE chain (ends with CTE `s`);
    * a def — it is referenced during `oracles` initialization.
    */
  private def SqlSessionCtes =
    """e AS (
      |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events),
      |g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g)""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational queries over the star schema: scan+filter+agg, multi-way
  * broadcast join, window top-k. These exercise the Spark planner paths
  * (pushdown, partial agg, broadcast) every other operator builds on.
  *
  * Scale notes (100 TB): q1 is scan+partial-agg — shuffle is |groups| only.
  * q2 broadcasts the three dimension tables (supplier/nation/region are tiny
  * relative to lineitem at every TPC-H SF), so the only wide exchange is the
  * final small group-by. q3's window shuffles by o_custkey once; no
  * driver-side collects anywhere.
  */
object CoreQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("2024-11-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    "q2_revenue_by_nation" -> ((s, dir) => {
      val lineitem = Tables(s, dir, "lineitem")
      val supplier = Tables(s, dir, "supplier")
      val nation   = Tables(s, dir, "nation")
      val region   = Tables(s, dir, "region")
      lineitem
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("line_count"))
    }),

    "q3_top_orders_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Hierarchical ROLLUP: one shuffle produces all three grouping levels
    // (year×status, year, grand total) — partial aggregation still applies,
    // so the map side combines before the exchange exactly as a flat
    // group-by would. grouping_id() disambiguates the NULL subtotal rows.
    "q38_rollup_totals" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .rollup(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
        .agg(round(sum(col("o_totalprice")), 2).as("sum_price"),
          count(lit(1)).as("n_orders"),
          grouping_id().as("gid"))
    }),

    // Window FRAMES + offsets — the rolling/time-series family (moving
    // sum/avg over the last 4 events, previous value, delta), one shuffle
    // on user_id with the user_id filter pushed to the scan. The rolling
    // sum is computed over DECIMAL(18,2) (value is exactly 2-decimal):
    // decimal frame sums are exact, so the result cannot depend on
    // whether an engine sums the frame sequentially or via a segment
    // tree — the same order-independence lesson as the q44 average.
    "q56_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w3 = w.rowsBetween(-3, Window.currentRow)
      val sumDec = sum(col("value").cast("decimal(18,2)")).over(w3).cast("double")
      Tables(s, dir, "events")
        .filter(col("user_id") <= 50)
        .select(col("user_id"), col("event_id"),
          sumDec.as("roll_sum"),
          round(sumDec / count(lit(1)).over(w3), 6).as("roll_avg"),
          lag(col("value"), 1).over(w).as("prev_value"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"))
    }),

    // Sequential conversion FUNNEL over the event stream: per user, the
    // first 'view', the first 'click' strictly AFTER it, the first
    // 'purchase' strictly after that — the order-sensitive pattern a
    // plain group-by cannot express. Three min(CASE) windows share ONE
    // user_id partitioning (one shuffle, sort reused), the per-user
    // collapse reuses the same hash partitioning (no extra exchange), and
    // the result is a single global row of step counts plus exact
    // microsecond dwell-time sums. At 100 TB the shuffle carries the
    // events once, keyed by user — no self-joins, no per-step passes.
    "q113_event_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("fv",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("fc",
          min(when(col("event_type") === "click" && col("ts") > col("fv"),
            col("ts"))).over(w))
        .withColumn("fp",
          min(when(col("event_type") === "purchase" && col("ts") > col("fc"),
            col("ts"))).over(w))
      ev.groupBy(col("user_id"))
        .agg(min(col("fv")).as("fv"), min(col("fc")).as("fc"),
          min(col("fp")).as("fp"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("fv")).as("n_view"),
          count(col("fc")).as("n_click"),
          count(col("fp")).as("n_purchase"),
          coalesce(sum(unix_micros(col("fc")) - unix_micros(col("fv"))),
            lit(0L)).as("sum_view_to_click_us"),
          coalesce(sum(unix_micros(col("fp")) - unix_micros(col("fc"))),
            lit(0L)).as("sum_click_to_purchase_us"))
    }),

    // Incremental statistics maintenance — q110's contract for algebraic
    // aggregates: per-epoch moment tables (n, Σv, Σv² in exact DECIMAL
    // micro-units) computed separately, the old epoch PERSISTED and read
    // back, then merged by plain per-key addition and finished into the
    // q51 stddev formula. The oracle computes the same stats from the
    // FULL feed in one pass — hash equality proves merge-of-partials ≡
    // batch bit-for-bit (exact sums: merge order cannot flip a ulp). At
    // 100 TB this is the daily stats refresh that reads one day, not a
    // year.
    "q118_incremental_stats" -> ((s, dir) => {
      import graft.scale.Stats
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q118_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val ev = Tables(s, dir, "events").select(col("event_type"), col("ts"),
        round(col("value") * 1e6).cast("long").as("v"))
      val cut = lit("2024-01-20").cast("timestamp")
      val mOld = Stats.moments(ev.filter(col("ts") < cut),
        Seq("event_type"), "v")
      mOld.write.mode("overwrite").parquet(outRoot.toString)
      val mNew = Stats.moments(ev.filter(col("ts") >= cut),
        Seq("event_type"), "v")
      val merged = Stats.merge(Seq("event_type"),
        s.read.parquet(outRoot.toString), mNew)
      Stats.stddevFromMoments(merged)
        .select(col("event_type"), col("n"),
          col("s1").cast("string").as("s1"), col("sd_value"))
    }),

    // Mergeable APPROXIMATE sketches — q118's contract for the
    // probabilistic summaries a 100 TB pipeline persists per epoch: three
    // epochs each write an HLL distinct-user partial and a fixed-bin
    // value histogram to parquet, the partials are read back and MERGED,
    // and the output pins (a) the HLL union being lossless — merged
    // estimate ≡ from-scratch estimate, an exact bit because registers
    // merge by max, (b) the estimate landing within 5% of the exact
    // distinct count (restated by DuckDB), and (c) the histogram
    // quantiles — integer bin counts merge exactly, and the p50/p90
    // interpolation is a fixed IEEE formula the oracle restates TERM BY
    // TERM from the raw table (a drifted bin edge or operation order on
    // either side is hash-red). Epoch merging folds sketch-sized rows,
    // never data.
    "q124_mergeable_sketches" -> ((s, dir) => {
      import graft.scale.Sketches
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q124_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"), col("ts"))
      val (c1, c2) = (lit("2024-01-10").cast("timestamp"),
        lit("2024-01-20").cast("timestamp"))
      val epochs = Seq(
        ev.filter(col("ts") < c1),
        ev.filter(col("ts") >= c1 && col("ts") < c2),
        ev.filter(col("ts") >= c2))
      val keys = Seq("event_type")
      val (lo, step, nBins) = (0.0, 2.0, 256)
      epochs.zipWithIndex.foreach { case (e, i) =>
        Sketches.hllSketch(e, keys, "user_id")
          .write.mode("overwrite").parquet(s"$outRoot/hll/$i")
        Sketches.histSketch(e, keys, "value", lo, step, nBins)
          .write.mode("overwrite").parquet(s"$outRoot/hist/$i")
      }
      val mHll = Sketches.hllMerge(keys,
        epochs.indices.map(i => s.read.parquet(s"$outRoot/hll/$i")): _*)
      val mHist = Sketches.histMerge(keys,
        epochs.indices.map(i => s.read.parquet(s"$outRoot/hist/$i")): _*)
      val estM = Sketches.hllEstimate(mHll, keys, "est_m")
      val estB = Sketches.hllEstimate(
        Sketches.hllSketch(ev, keys, "user_id"), keys, "est_b")
      val qM = Sketches.histQuantiles(mHist, keys,
        Seq("p50_est" -> 0.5, "p90_est" -> 0.9), lo, step)
      val qB = Sketches.histQuantiles(
        Sketches.histSketch(ev, keys, "value", lo, step, nBins), keys,
        Seq("b50" -> 0.5, "b90" -> 0.9), lo, step)
      ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .join(estM, keys).join(estB, keys).join(qM, keys).join(qB, keys)
        .select(col("event_type"), col("exact_users"),
          // not bit-equality: a union straddling the sparse→dense
          // promotion rounds differently than the one-pass sketch
          // (see Sketches scaladoc) — 1% agreement is the honest pin
          (abs(col("est_m") - col("est_b")) <=
            greatest(lit(1.0), col("est_b") * lit(0.01)))
            .as("hll_merge_agrees"),
          (abs(col("est_m") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("hll_within_5pct"),
          col("p50_est"), col("p90_est"),
          (col("p50_est") === col("b50") && col("p90_est") === col("b90"))
            .as("hist_merge_lossless"))
    }),

    // FULL OUTER reconciliation — the cross-table referential-integrity
    // audit (the two-table complement of q117's single-table gate):
    // filtered order and lineitem populations full-outer join on the
    // order key, and the aggregate counts matched keys, orders with no
    // lines, and orphan lines with no order, per status (orphans land in
    // the NULL-status bucket). Both orphan classes are deliberately
    // non-empty via disjoint population filters so neither leg of the
    // outer join is vacuous. One shuffle each side; completes the join
    // matrix next to inner/broadcast (q2/q49), anti (q40), semi (q50),
    // range (q52), as-of (q31).
    "q121_full_outer_reconcile" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 3 =!= 0)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "full_outer")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull, 1))
            .as("n_matched"),
          count(when(col("l_orderkey").isNull, 1)).as("n_orders_no_lines"),
          count(when(col("o_orderkey").isNull, 1)).as("n_orphan_lines"),
          coalesce(sum(col("n_lines")), lit(0L)).as("sum_lines"))
    }),

    // CUBE: all four grouping sets (type×day, type, day, grand total)
    // from ONE shuffle via Expand — completes the grouping family next to
    // rollup (q38), pivot (q39), and distinct-agg (q43). The Expand
    // factor is the fixed grouping-set count, so partial aggregation
    // still collapses map-side before the exchange.
    "q55_cube_matrix" -> ((s, dir) => {
      Tables(s, dir, "events")
        .cube(col("event_type"), dayofmonth(col("ts")).as("dom"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value")), 2).as("sum_value"),
          grouping_id().as("gid"))
    }),

    // PIVOT with an explicit value list: compiles to one group-by with a
    // conditional aggregate per pivot value — no collect-distinct job on
    // the driver (an open pivot would scan once just to learn the values;
    // at 100 TB the vocabulary must be declared, not discovered).
    "q39_pivot_events" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(col("value")), 2))
    }),

    // Distinct aggregation: daily active users alongside plain counts.
    // Spark plans the mixed distinct/non-distinct aggregate with Expand +
    // two-phase partial aggregation — the distinct keys are deduplicated
    // map-side before the exchange, so the shuffle carries |day × user|
    // rows, never the raw event log. (At 100 TB the approximate form —
    // approx_count_distinct, an HLL sketch whose partial state is a fixed
    // few KB per group — replaces this when exactness isn't required;
    // spec-tested since no cross-engine oracle can hash-match a sketch.)
    "q43_daily_active" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("active_users"),
          count(lit(1)).as("n_events"))
    }),

    // Large-large fact join (TPC-H Q3 shape): lineitem ⋈ orders is the
    // one join in the suite where BOTH sides are fact-scale — shuffled
    // hash/sort-merge on the order key (AQE may still broadcast the
    // filtered orders side at small SF; at 100 TB both sides exchange
    // once on l_orderkey/o_orderkey, or read shuffle-free from tables
    // bucketed on it — see Sources.writeBucketed). The customer segment
    // filter reduces to a broadcast semi-side, and the top-10 is
    // TakeOrdered, never a global sort.
    "q49_shipping_priority" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("2024-06-01").cast("timestamp"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .limit(10)
    }),

    // Statistical aggregates: sample stddev and Pearson correlation are
    // single-pass partial aggregates (constant state per group); the exact
    // median is the one that does NOT scale — percentile buffers the
    // group's values, so at 100 TB it becomes approx_percentile (fixed-KB
    // sketch state; bound pinned in ApproxAggSpec) and the exact form
    // stays as the small-data oracle.
    "q51_stats_by_type" -> ((s, dir) => {
      // stddev/corr from EXACT integer micro-unit moments, not the
      // built-in double aggregates: `stddev_samp`/`corr` sum doubles in
      // partition order, and at round(…, 6) tightness that is exactly the
      // order-dependent hash that made q44 flaky in round 4. Moments are
      // longs/decimals (order-independent); the final formulas are fixed
      // IEEE expressions over exact inputs, mirrored by the oracle.
      // `percentile` stays: exact median sorts, no float accumulation.
      val vmu = round(col("value") * 1e6).cast("long")
      val d38 = "decimal(38,0)"
      Tables(s, dir, "events")
        .select(col("event_type"), col("value"), vmu.as("v"), hour(col("ts")).as("h"))
        .groupBy(col("event_type"))
        // every moment sums in DECIMAL: long sums of micro-unit products
        // (v·h ~ 1e10·23 per row) would wrap silently at the 1e12-row
        // group sizes this is designed for, while the oracle's HUGEINT
        // stays exact — the overflow WOULD be the hash mismatch
        .agg(
          count(lit(1)).as("n"),
          sum(col("v").cast("decimal(28,0)")).as("s1"),
          sum(col("v").cast("decimal(19,0)") * col("v")).as("s2"),
          sum(col("h").cast("decimal(28,0)")).as("sh"),
          sum(col("h").cast("decimal(19,0)") * col("h")).as("shh"),
          sum(col("v").cast("decimal(19,0)") * col("h")).as("svh"),
          round(expr("percentile(value, 0.5)"), 6).as("median_value"))
        .select(col("event_type"),
          round(sqrt(
            (col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double") / col("n")) /
              (col("n") - 1)) / 1e6, 6).as("sd_value"),
          col("median_value"),
          round(
            (col("n").cast(d38) * col("svh") - col("s1").cast(d38) * col("sh"))
              .cast("double") /
              (sqrt((col("n").cast(d38) * col("s2") - col("s1").cast(d38) * col("s1"))
                .cast("double")) *
               sqrt((col("n").cast(d38) * col("shh") - col("sh").cast(d38) * col("sh"))
                 .cast("double"))), 6).as("corr_value_hour"),
          col("n"))
    }),

    // Set operations: INTERSECT/EXCEPT compile to a distinct-aggregate
    // feeding a semi/anti join — one shuffle each on the compared key, no
    // row-level comparison of the full tables. Buyers who never clicked,
    // alongside users who did both.
    "q48_set_ops" -> ((s, dir) => {
      val events = Tables(s, dir, "events")
      def usersOf(t: String) =
        events.filter(col("event_type") === t).select(col("user_id"))
      val buyersOnly = usersOf("purchase").except(usersOf("click"))
        .select(col("user_id"), lit("buyer_no_click").as("segment"))
      val both = usersOf("purchase").intersect(usersOf("click"))
        .select(col("user_id"), lit("buyer_and_clicker").as("segment"))
      buyersOnly.unionAll(both)
    }),

    // Anti join: customers that never emitted an event. The events side is
    // projected to the bare join key before the exchange; with AQE the
    // deduplicated key set is broadcast-able even when the raw event log is
    // not. Grouped per nation so the output stays |nations|-sized at any SF.
    "q40_inactive_customers" -> ((s, dir) => {
      val customers = Tables(s, dir, "customer")
      val eventUsers = Tables(s, dir, "events").select(col("user_id")).distinct()
      customers
        .join(eventUsers, col("c_custkey") === col("user_id"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_inactive"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
    }),

    // The ranking-function family over one total order: decile buckets
    // (ntile), percent_rank, cume_dist — the score-calibration shapes
    // (quantile binning for stratified eval, percentile features). One
    // exchange on the group key; the order is made TOTAL with the event
    // id tiebreak, so every engine assigns identical ranks; percent_rank
    // and cume_dist are exact integer ratios evaluated in one double
    // division each. Emitted only for the decile edges (first/last rank
    // of each bucket) to keep the output calibration-table-sized.
    "q78_rank_family" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val ranked = Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("decile", ntile(10).over(w))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("rn", row_number().over(w))
      val edges = ranked.groupBy(col("event_type"), col("decile"))
        .agg(min(col("rn")).as("lo"), max(col("rn")).as("hi"))
      ranked.join(edges, Seq("event_type", "decile"))
        .filter(col("rn") === col("lo") || col("rn") === col("hi"))
        .select(col("event_type"), col("decile"), col("event_id"),
          col("value"), col("pr"), col("cd"))
    }),

    // Time-based RANGE window frame — the trailing-hour rolling metric.
    // Distinct from q56's ROWS frames: the frame is bounded by the ORDER
    // VALUE (ts − 1h), not a row count, so peers enter/leave by
    // timestamp. Decimal sums keep the moving aggregate exact; the
    // per-user exchange is the only shuffle. cast("long") floors the
    // timestamp to epoch SECONDS, so the order key has second
    // granularity: same-second events are frame peers and the trailing
    // window is 3600 s inclusive — the oracle mirrors the same
    // floored-seconds key.
    "q79_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
      Tables(s, dir, "events")
        .filter(col("user_id") <= 50)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
          col("n_1h"), col("sum_1h"))
    }),

    // FULL OUTER join of two derived aggregates — the reconciliation
    // report shape (days with clicks but no purchases and vice versa
    // both survive). Both sides are |days|-sized aggregates, so at any
    // scale the join inputs are tiny relative to the log; the outer join
    // itself shuffles on the day key once.
    "q80_full_outer" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      def daily(t: String, as: String) = ev.filter(col("event_type") === t)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as(as))
      daily("click", "n_clicks")
        .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
    }),

    // Per-group z-score outlier flagging — the anomaly-filter pass of an
    // event pipeline. Two-pass map-reduce shape: (1) per-type moments in
    // ONE aggregation — counts and sums over exact integer micro-units
    // (round(value·10⁶) as long; the squared sums in decimal(38,0)), so
    // the statistics are ORDER-INDEPENDENT (a double `avg`/`stddev` sums
    // in partition order — the q44 lesson); (2) the |types|-row stats
    // table broadcast back onto the scan, z computed per row in a fixed
    // IEEE expression (+,−,×,÷,√ are all correctly rounded, so identical
    // in any engine given identical exact inputs). Only |z| > 3 rows are
    // emitted — at 100 TB the output is the anomaly set, not the log.
    "q61_value_outliers" -> ((s, dir) => {
      val vmu = round(col("value") * 1e6).cast("long")
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"), vmu.as("v"))
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(28,0)")).as("s1"), // no long wrap at 1e12 rows
          sum(col("v").cast("decimal(19,0)") * col("v")).as("s2"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("sd", sqrt(
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n")) /
            (col("n") - 1)))
        .select(col("event_type"), col("mean"), col("sd"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("v") - col("mean")) / col("sd"))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 6).as("z"))
    }))

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2024-11-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS line_count
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q3_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    // DuckDB GROUPING() returns one bit per argument; Spark's grouping_id()
    // packs the same bits, so the composed integer matches.
    "q38_rollup_totals" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  count(*) AS n_orders,
        |  2 * GROUPING(year(o_orderdate)) + GROUPING(o_orderstatus) AS gid
        |FROM orders
        |GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)""".stripMargin,

    "q56_rolling_window" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE) AS roll_sum,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
        |        / (count(*) OVER w3), 6) AS roll_avg,
        |  lag(value, 1) OVER w AS prev_value,
        |  round(value - lag(value, 1) OVER w, 2) AS delta
        |FROM events
        |WHERE user_id <= 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  w3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q121_full_outer_reconcile" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 5 <> 0),
        |l AS (
        |  SELECT l_orderkey, count(*) AS n_lines FROM lineitem
        |  WHERE l_orderkey % 3 <> 0 GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderkey, o.o_orderstatus, l.l_orderkey, l.n_lines
        |  FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey)
        |SELECT o_orderstatus,
        |  count(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
        |             THEN 1 END) AS n_matched,
        |  count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_orders_no_lines,
        |  count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_orphan_lines,
        |  CAST(coalesce(sum(n_lines), 0) AS BIGINT) AS sum_lines
        |FROM j GROUP BY 1""".stripMargin,

    // The BATCH restatement over the full feed — one pass, no epochs:
    // hash equality is the merge-of-partials ≡ batch proof.
    "q118_incremental_stats" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(v) AS s1, sum(CAST(v AS HUGEINT) * v) AS s2
        |  FROM v GROUP BY 1)
        |SELECT event_type, n, CAST(s1 AS VARCHAR) AS s1,
        |  CASE WHEN n > 1 THEN
        |    round(sqrt((CAST(s2 AS DOUBLE)
        |                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))
        |          / 1000000.0, 6)
        |  END AS sd_value
        |FROM m""".stripMargin,

    // The invariant bits pinned TRUE; the exact distinct count and the
    // histogram p50/p90 recomputed from raw events with the SAME bin and
    // interpolation emitters the engine plans from.
    "q124_mergeable_sketches" -> {
      import graft.scale.Sketches
      val (lo, step, nBins) = (0.0, 2.0, 256)
      s"""WITH b AS (
         |  SELECT event_type,
         |    ${Sketches.histBinSql("value", lo, step, nBins)} AS bin,
         |    count(*) AS cnt
         |  FROM events WHERE ${Sketches.histFilterSql("value")}
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT *, sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         |    sum(cnt) OVER (PARTITION BY event_type) AS total
         |  FROM b),
         |q AS (
         |  SELECT event_type,
         |    min_by(${Sketches.histQuantileSql(0.5, lo, step)}, bin)
         |      FILTER (WHERE cum >= 0.5*total) AS p50_est,
         |    min_by(${Sketches.histQuantileSql(0.9, lo, step)}, bin)
         |      FILTER (WHERE cum >= 0.9*total) AS p90_est
         |  FROM c GROUP BY 1),
         |e AS (
         |  SELECT event_type, count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY 1)
         |SELECT e.event_type, e.exact_users,
         |  TRUE AS hll_merge_agrees, TRUE AS hll_within_5pct,
         |  q.p50_est, q.p90_est, TRUE AS hist_merge_lossless
         |FROM e JOIN q USING (event_type)""".stripMargin
    },

    // The funnel restated step by step with the same min(CASE) windows.
    "q113_event_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS fv
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
        |      OVER (PARTITION BY user_id) AS fc
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
        |      OVER (PARTITION BY user_id) AS fp
        |  FROM s2),
        |u AS (
        |  SELECT user_id, min(fv) AS fv, min(fc) AS fc, min(fp) AS fp
        |  FROM s3 GROUP BY 1)
        |SELECT count(*) AS n_users, count(fv) AS n_view, count(fc) AS n_click,
        |  count(fp) AS n_purchase,
        |  CAST(coalesce(sum(epoch_us(fc) - epoch_us(fv)), 0) AS BIGINT)
        |    AS sum_view_to_click_us,
        |  CAST(coalesce(sum(epoch_us(fp) - epoch_us(fc)), 0) AS BIGINT)
        |    AS sum_click_to_purchase_us
        |FROM u""".stripMargin,

    "q55_cube_matrix" ->
      """SELECT event_type, CAST(day(ts) AS INT) AS dom, count(*) AS cnt,
        |  round(sum(value), 2) AS sum_value,
        |  2 * GROUPING(event_type) + GROUPING(day(ts)) AS gid
        |FROM events GROUP BY CUBE(event_type, day(ts))""".stripMargin,

    // Spark names single-agg pivot columns after the bare pivot value.
    "q39_pivot_events" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  round(sum(value) FILTER (event_type = 'click'), 2) AS click,
        |  round(sum(value) FILTER (event_type = 'error'), 2) AS error,
        |  round(sum(value) FILTER (event_type = 'purchase'), 2) AS purchase,
        |  round(sum(value) FILTER (event_type = 'signup'), 2) AS signup,
        |  round(sum(value) FILTER (event_type = 'view'), 2) AS view
        |FROM events GROUP BY 1""".stripMargin,

    "q43_daily_active" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS active_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // Same exact integer moments (hugeint sums ≡ the engine's
    // long/decimal sums); the sd/corr formulas mirror the engine's
    // operation order so the IEEE doubles match bit for bit.
    "q51_stats_by_type" ->
      """WITH v AS (
        |  SELECT event_type, value,
        |    CAST(round(value * 1000000) AS BIGINT) AS v,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(v) AS s1, sum(CAST(v AS HUGEINT) * v) AS s2,
        |    sum(h) AS sh, sum(h * h) AS shh, sum(v * h) AS svh,
        |    round(quantile_cont(value, 0.5), 6) AS median_value
        |  FROM v GROUP BY 1)
        |SELECT event_type,
        |  round(sqrt((CAST(s2 AS DOUBLE)
        |              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))
        |        / 1000000.0, 6) AS sd_value,
        |  median_value,
        |  round(CAST(CAST(n AS HUGEINT) * svh - CAST(s1 AS HUGEINT) * sh AS DOUBLE)
        |        / (sqrt(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
        |           * sqrt(CAST(CAST(n AS HUGEINT) * shh - CAST(sh AS HUGEINT) * sh AS DOUBLE))),
        |        6) AS corr_value_hour,
        |  n
        |FROM m""".stripMargin,

    // Same epoch-second order key (floor of µs — positive epochs make
    // floor ≡ Spark's timestamp→long truncation); RANGE peers at equal
    // seconds make the frame tie-order-independent.
    "q79_range_window" ->
      """WITH v AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec, value
        |  FROM events WHERE user_id <= 50)
        |SELECT user_id, event_id,
        |  strftime(t, '%Y-%m-%d %H:%M:%S.%f') AS t,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM v
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q80_full_outer" ->
      """WITH c AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(c.day, p.day) AS day,
        |  coalesce(n_clicks, 0) AS n_clicks,
        |  coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.day = p.day""".stripMargin,

    "q78_rank_family" ->
      """WITH r AS (
        |  SELECT event_id, event_type, value,
        |    ntile(10) OVER w AS decile,
        |    round(percent_rank() OVER w, 6) AS pr,
        |    round(cume_dist() OVER w, 6) AS cd,
        |    row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)),
        |e AS (
        |  SELECT event_type, decile, min(rn) AS lo, max(rn) AS hi
        |  FROM r GROUP BY 1, 2)
        |SELECT r.event_type, CAST(r.decile AS INT) AS decile, r.event_id,
        |  r.value, r.pr, r.cd
        |FROM r JOIN e ON r.event_type = e.event_type AND r.decile = e.decile
        |WHERE r.rn = e.lo OR r.rn = e.hi""".stripMargin,

    // Same exact-integer moments: hugeint sums ≡ Spark's long/decimal
    // sums; the z expression mirrors the engine's operation order so the
    // IEEE doubles match bit for bit.
    "q61_value_outliers" ->
      """WITH v AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 1000000) AS BIGINT) AS v
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(*) AS n, sum(v) AS s1,
        |    sum(CAST(v AS HUGEINT) * v) AS s2
        |  FROM v GROUP BY 1),
        |d AS (
        |  SELECT event_type,
        |    CAST(s1 AS DOUBLE) / n AS mean,
        |    sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS sd
        |  FROM st)
        |SELECT v.event_id, v.event_type, v.value,
        |  round((v.v - d.mean) / d.sd, 6) AS z
        |FROM v JOIN d USING (event_type)
        |WHERE abs((v.v - d.mean) / d.sd) > 3""".stripMargin,

    "q49_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '2024-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q48_set_ops" ->
      """SELECT user_id, 'buyer_no_click' AS segment FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'click')
        |UNION ALL
        |SELECT user_id, 'buyer_and_clicker' AS segment FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'click')""".stripMargin,

    "q40_inactive_customers" ->
      """SELECT c_nationkey, count(*) AS n_inactive,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |GROUP BY c_nationkey""".stripMargin)
}

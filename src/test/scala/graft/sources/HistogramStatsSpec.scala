package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equi-height histograms off the log: `hist.cols` columns record 17
  * per-file quantile points in the one-pass stats scan; the snapshot
  * merges the piecewise-uniform pieces into a global equi-height
  * histogram and feeds `CatalogColumnStat.histogram` — so a skewed-key
  * join estimate stops assuming uniformity, with no ANALYZE rescan.
  */
class HistogramStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-hist").toString

  test("per-file quantiles are recorded and merge into equi-height " +
    "bins whose boundaries track the data's deciles") {
    val t = tmp() + "/t"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "6")
      LogTable.create(spark, t,
        (1L to 1000L).map(i => (i, s"p${i % 3}", i)).toDF("k", "p", "v"),
        Seq("p"), statsCols = Seq("k"),
        tableProperties = Map(LogTable.HistColsProp -> "v"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val snap = LogTable.snapshot(spark, t)
    assert(snap.files.forall(_.stats.exists { case (c, s) =>
      c.equalsIgnoreCase("v") && s.hq.isDefined
    }), "every file must carry quantile points for the declared column")
    val h = snap.histogramOf("v", nBins = 10).getOrElse(
      fail("histogram must merge when every file carries quantiles"))
    assert(h.bins.length == 10)
    assert(math.abs(h.height - 100.0) < 1.0)
    // uniform data: boundaries land near the deciles
    // 16 uniform intervals per file bound the merge's resolution —
    // boundaries land within a few percent of the true deciles
    h.bins.zipWithIndex.foreach { case (b, i) =>
      assert(math.abs(b.hi - (i + 1) * 100.0) < 60.0,
        s"bin $i boundary ${b.hi} too far from ${(i + 1) * 100}")
    }
    // a column NOT declared declines
    assert(snap.histogramOf("k").isEmpty ||
      snap.files.forall(_.stats.exists { case (c, s) =>
        c.equalsIgnoreCase("k") && s.hq.isDefined }))
  }

  test("skewed-key join estimate improves with histograms on vs off") {
    // FACT: 90% of rows carry key 1, the rest spread over 2..100.
    // DIM: one row per key, but ONLY keys 50..100 — the uniform
    // assumption projects the hot key into the join; the histogram
    // knows the hot mass lies outside the dim's range.
    def factDf = (1L to 10000L).map { i =>
      val k = if (i % 10 != 0) 1L else 2L + (i % 99)
      (i, s"p${i % 2}", k)
    }.toDF("id", "p", "k")
    def dimDf = (50L to 100L).map(k => (k, s"d$k")).toDF("k", "name")
    def mk(dir: String, df: org.apache.spark.sql.DataFrame,
           part: String, hist: Boolean): Unit =
      LogTable.create(spark, dir, df, Seq(part), statsCols = Seq("k"),
        tableProperties =
          if (hist) Map(LogTable.HistColsProp -> "k",
            "ndv.cols" -> "k")
          else Map("ndv.cols" -> "k"))
    val (fh, dh, fp, dp) = (tmp() + "/fh", tmp() + "/dh",
      tmp() + "/fp", tmp() + "/dp")
    mk(fh, factDf, "p", hist = true); mk(dh, dimDf, "name", hist = true)
    mk(fp, factDf, "p", hist = false); mk(dp, dimDf, "name", hist = false)
    val actual = LogTable.table(spark, fh)
      .join(LogTable.table(spark, dh), "k").count()
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def estOf(f: String, d: String): BigInt =
        LogTable.table(spark, f).join(LogTable.table(spark, d), "k")
          .queryExecution.optimizedPlan.stats.rowCount.getOrElse(
            fail("CBO must produce a row count"))
      val withHist = estOf(fh, dh)
      val without = estOf(fp, dp)
      def err(e: BigInt): BigInt = (e - actual).abs
      assert(err(withHist) < err(without),
        s"histogram estimate $withHist must beat uniform $without " +
          s"(actual $actual)")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("a heavy point mass spans multiple bins without stealing later " +
    "boundaries (the overshoot is never clamped away)") {
    val t = tmp() + "/t"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      // 90% of rows sit AT v=100; the rest spread over 10..1000
      LogTable.create(spark, t,
        (1L to 1000L).map { i =>
          val v = if (i % 10 != 0) 100L else (i % 100) * 10L + 10L
          (i, s"p${i % 2}", v)
        }.toDF("k", "p", "v"),
        Seq("p"), statsCols = Seq("k"),
        tableProperties = Map(LogTable.HistColsProp -> "v"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val h = LogTable.snapshot(spark, t).histogramOf("v", nBins = 10)
      .getOrElse(fail("histogram must merge"))
    assert(h.bins.length == 10)
    // ~900 of 1000 rows at 100 → ~9 of 10 equal-mass bins live at the
    // hot value (ending at it); the tail keeps its own boundaries
    val hotBins = h.bins.count(b => math.abs(b.hi - 100.0) < 30.0)
    assert(hotBins >= 7, s"expected most bins at the hot key, got " +
      h.bins.map(b => (b.lo, b.hi)).mkString(", "))
    assert(h.bins.last.hi > 900.0,
      "the tail's upper boundary must survive the point mass")
    // boundaries are monotone — an unclamped overshoot walk never
    // regresses
    h.bins.sliding(2).foreach { w =>
      assert(w(0).hi <= w(1).hi + 1e-9)
    }
  }

  test("histograms survive DML and decline when a file lacks quantiles") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (1L to 300L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.HistColsProp -> "v"))
    // deletes rewrite files THROUGH the same stats scan — quantiles stay
    LogTable.deleteWhere(spark, t, col("v") > 200L): Unit
    val snap = LogTable.snapshot(spark, t)
    val h = snap.histogramOf("v", nBins = 8).getOrElse(
      fail("post-DML snapshot must still merge"))
    assert(h.bins.last.hi <= 201.0,
      s"deleted mass must leave the histogram (hi=${h.bins.last.hi})")
    // a table declared LATE: old files carry no quantiles — decline
    val t2 = tmp() + "/t2"
    LogTable.create(spark, t2,
      (1L to 100L).map(i => (i, "p0", i)).toDF("k", "p", "v"), Seq("p"))
    LogTable.setProperties(spark, t2,
      Map(LogTable.HistColsProp -> "v")): Unit
    LogTable.append(spark, t2,
      Seq((101L, "p0", 101L)).toDF("k", "p", "v")): Unit
    assert(LogTable.snapshot(spark, t2).histogramOf("v").isEmpty,
      "files predating the declaration must decline the merge")
  }

  test("a constant column collapses to fewer bins with height rescaled " +
    "so implied mass stays the true row mass; NaN quantiles decline") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (1L to 500L).map(i => (i, s"p${i % 2}", 42L)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.HistColsProp -> "v"))
    val h = LogTable.snapshot(spark, t).histogramOf("v", nBins = 10)
      .getOrElse(fail("a constant column still merges"))
    assert(h.bins.nonEmpty && h.bins.length <= 10)
    val implied = h.height * h.bins.length
    assert(math.abs(implied - 500.0) < 1.0,
      s"implied mass ${implied} must equal the true row mass 500")
    // NaN quantile points: a double column of NaNs must DECLINE, not
    // poison the breakpoint sort
    val t2 = tmp() + "/t2"
    LogTable.create(spark, t2,
      (1L to 50L).map(i => (i, "p0", Double.NaN)).toDF("k", "p", "d"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.HistColsProp -> "d"))
    assert(LogTable.snapshot(spark, t2).histogramOf("d").isEmpty,
      "non-finite quantile points must decline the histogram")
  }
}

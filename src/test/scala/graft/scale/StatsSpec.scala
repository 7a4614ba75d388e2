package graft.scale

import graft.SparkSpec

/** Mergeable-moments algebra: splitting a table any way and merging the
  * per-part moments reproduces the whole-table moments bit-for-bit.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 300L).map(i => (s"k${i % 3}", i * 1000001L))

  test("merge of per-part moments equals whole-table moments, any split, any order") {
    val whole = rows.toDF("k", "v")
    val parts = Seq(
      rows.filter(_._2 % 4 == 0), rows.filter(_._2 % 4 == 1),
      rows.filter(_._2 % 4 == 2), rows.filter(_._2 % 4 == 3))
      .map(_.toDF("k", "v"))
    val batch = Stats.moments(whole, Seq("k"), "v")
      .orderBy("k").collect().toSeq
    val merged = Stats.merge(Seq("k"),
      parts.map(p => Stats.moments(p, Seq("k"), "v")): _*)
      .orderBy("k").collect().toSeq
    assert(merged == batch)
    // merging is associative: fold pairwise in a different grouping
    val pm = parts.map(p => Stats.moments(p, Seq("k"), "v"))
    val nested = Stats.merge(Seq("k"),
      Stats.merge(Seq("k"), pm(0), pm(1)), Stats.merge(Seq("k"), pm(2), pm(3)))
      .orderBy("k").collect().toSeq
    assert(nested == batch)
  }

  test("stddevFromMoments matches the direct formula") {
    val df = Seq(("a", 1000000L), ("a", 3000000L), ("a", 5000000L)).toDF("k", "v")
    val sd = Stats.stddevFromMoments(Stats.moments(df, Seq("k"), "v"))
      .select("sd_value").head().getDouble(0)
    // values 1, 3, 5 → sample sd = 2
    assert(sd == 2.0)
  }

  test("a single-row group has NULL sample stddev, not a division blowup") {
    val df = Seq(("solo", 7000000L), ("pair", 1000000L), ("pair", 3000000L))
      .toDF("k", "v")
    val out = Stats.stddevFromMoments(Stats.moments(df, Seq("k"), "v"))
      .select("k", "sd_value").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("solo").isEmpty, out)
    // values 1, 3 → sample sd = sqrt(2), rounded to 6 places
    assert(out("pair").contains(1.414214), out)
  }
}

package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Data-quality expectations: metric correctness per rule, the one-scan
  * report shape, and the fail-loud gate.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._
  import Validate._

  private lazy val df = Seq(
    (Some(1L), Some("a"), 10.0),
    (Some(2L), None, 50.0),
    (Some(2L), Some("zz"), 200.0),
    (None, Some("b"), -5.0))
    .toDF("id", "tag", "v")

  test("each rule counts its violations exactly") {
    val rep = Validate.report(df, Seq(
      notNull("id"),                         // 1 null
      notNull("tag"),                        // 1 null
      unique("id"),                          // 4 rows, 3 distinct (null counts as a value for count_distinct? no — see assert)
      inRange("v", 0.0, 100.0),              // 200.0 and -5.0 → 2
      acceptedValues("tag", Seq("a", "b")),  // null and "zz" → 2
      matches("tag", "^[ab]$"),              // null and "zz" → 2
      minRows(10L)))                         // 10 - 4 = 6 short
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3))).toSeq
    assert(rep(0) == (("not_null(id)", 1L, false)))
    assert(rep(1) == (("not_null(tag)", 1L, false)))
    // count(*)=4 minus count_distinct(id)=2 non-null distinct (1,2) = 2:
    // the null key and the duplicate both read as uniqueness violations
    assert(rep(2) == (("unique(id)", 2L, false)))
    assert(rep(3) == (("in_range(v,0.0,100.0)", 2L, false)))
    assert(rep(4) == (("accepted_values(tag)", 2L, false)))
    assert(rep(5) == (("matches(tag)", 2L, false)))
    assert(rep(6) == (("min_rows(10)", 6L, false)))
  }

  test("a clean table passes and maxViolations tolerates a budget") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val rep = Validate.report(clean, Seq(
      notNull("id"), unique("id"), minRows(2L),
      Expectation("tolerated", org.apache.spark.sql.functions.lit(3L),
        maxViolations = 5L)))
    assert(rep.collect().forall(_.getBoolean(3)))
  }

  test("enforce throws naming the failing rules, stays quiet when green") {
    val clean = Seq((1L, "a")).toDF("id", "tag")
    Validate.enforce(clean, Seq(notNull("id")))
    val e = intercept[IllegalStateException] {
      Validate.enforce(df, Seq(notNull("id"), unique("id")))
    }
    assert(e.getMessage.contains("not_null(id)=1") &&
      e.getMessage.contains("unique(id)=2"))
  }

  test("hostile rule names (quotes, backslashes) survive the report verbatim") {
    val clean = Seq((1L, "a")).toDF("id", "tag")
    val names = Seq("""odd\rule""", "it's", """back\\and'mixed""", """trailing\""")
    val rep = Validate.report(clean,
      names.map(n => Expectation(n, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)) * 0)))
    assert(rep.select("rule").collect().map(_.getString(0)).toSeq == names)
  }

  test("the report is ONE scan: a single aggregate over the source") {
    val rep = Validate.report(df, Seq(notNull("id"), unique("id"),
      inRange("v", 0.0, 100.0)))
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 2, plan)
  }
}

package graft

/** `import graft.api._` is the engine's `__all__`: one import, every
  * entry point. The spec drives a few operators end to end THROUGH the
  * facade so a renamed or dropped alias is a compile failure here, not a
  * doc drift.
  */
class ApiFacadeSpec extends SparkSpec {
  import spark.implicits._
  import graft.api._

  test("operators resolve and run through the facade") {
    val df = Seq((1L, "a", 4000000L), (2L, "b", 6000000L)).toDF("id", "tag", "v")
    assert(Validate.report(df, Seq(Validate.notNull("id"), Validate.unique("id")))
      .collect().forall(_.getBoolean(3)))
    assert(Stats.moments(df, Seq("tag"), "v").count() == 2)
    assert(Sketches.histSketch(df, Nil, "v", 0.0, 1e7, 8).count() >= 1)
    val merged = Merge.upsert(
      df.withColumn("ver", org.apache.spark.sql.functions.lit(0)),
      Seq((2L, "b2", 9000000L, 1)).toDF("id", "tag", "v", "ver"),
      keyCols = Seq("id"), orderCols = Seq("ver"))
    assert(merged.filter($"id" === 2L).select("tag").as[String].head() == "b2")
  }

  test("record and date surfaces resolve through the facade") {
    assert(DateKernel.formatYearMonth(java.time.LocalDate.of(2024, 3, 9)) == "2024-03")
    val shaped = Seq(("""{"a":1,"b":""}""")).toDF("j")
    assert(Prune != null && Flatten != null && CleanColumns != null &&
      shaped.count() == 1)
    assert(ShardFormat == "graft-shards")
  }
}

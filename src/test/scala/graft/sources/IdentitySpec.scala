package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IDENTITY columns (`identity.col`): an append batch omitting the
  * column fills generated values — unique among system-generated
  * values, strictly above every previously committed value, gaps
  * allowed. The high-water rides commit properties off the stats the
  * write already records; contention serializes through the full retry
  * (the disjoint fast path declines on property drift).
  */
class IdentitySpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ident").toString

  test("omitted-column appends fill unique increasing ids; supplied " +
    "values win and push the high-water; declarations validate loud") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((1L, "p0", "a"), (2L, "p0", "b"), (3L, "p1", "c"))
        .toDF("id", "p", "v"),
      Seq("p"), statsCols = Seq("id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id"))
    val snap0 = LogTable.snapshot(spark, t)
    assert(snap0.properties.get("identity.next").contains("4"))
    // two omitting appends: every id unique, every id ABOVE the seed
    LogTable.append(spark, t,
      Seq(("p0", "d"), ("p1", "e")).toDF("p", "v")): Unit
    LogTable.append(spark, t,
      Seq(("p0", "f")).toDF("p", "v")): Unit
    val all = LogTable.read(spark, t)
    assert(all.count() == 6L)
    assert(all.select("id").distinct().count() == 6L,
      "generated ids must be unique")
    val genIds = all.filter(col("v").isin("d", "e", "f"))
      .select("id").as[Long].collect()
    assert(genIds.forall(_ >= 4L), s"generated ids must clear the seed: " +
      genIds.mkString(","))
    // the second append's ids clear the first's
    val fId = all.filter(col("v") === "f").select("id").as[Long].head()
    val deIds = all.filter(col("v").isin("d", "e")).select("id")
      .as[Long].collect()
    assert(deIds.forall(_ < fId),
      "later appends assign above earlier generated values")
    // a SUPPLYING append keeps its value and pushes the high-water
    LogTable.append(spark, t,
      Seq((1000L, "p0", "g")).toDF("id", "p", "v")): Unit
    LogTable.append(spark, t, Seq(("p1", "h")).toDF("p", "v")): Unit
    assert(LogTable.read(spark, t).filter(col("v") === "h")
      .select("id").as[Long].head() > 1000L,
      "the high-water must clear supplied values")
    // a NON-append write path (MERGE insert) supplying an even higher
    // value ALSO pushes the high-water — the advance rides commit
    // itself, so no path can strand later generated values below
    // committed ones
    LogTable.mergeInto(spark, t,
      Seq((777777L, "p0", "m")).toDF("id", "p", "v"), Seq("id"))
      .whenNotMatchedInsert().run(): Unit
    LogTable.append(spark, t, Seq(("p1", "i")).toDF("p", "v")): Unit
    assert(LogTable.read(spark, t).filter(col("v") === "i")
      .select("id").as[Long].head() > 777777L,
      "merge-supplied values must push the high-water too")
    // identity.next is engine-managed: raw property DDL refuses
    intercept[IllegalArgumentException] {
      LogTable.setProperties(spark, t, Map("identity.next" -> "1")): Unit
    }
    // declarations validate: unknown column / untracked / non-integral
    intercept[IllegalArgumentException] {
      LogTable.create(spark, tmp() + "/bad1",
        Seq((1L, "p0")).toDF("id", "p"), Seq("p"),
        tableProperties = Map(LogTable.IdentityColProp -> "nope"))
    }
    intercept[IllegalArgumentException] {
      LogTable.create(spark, tmp() + "/bad2",
        Seq((1L, "p0")).toDF("id", "p"), Seq("p"),
        tableProperties = Map(LogTable.IdentityColProp -> "id"))
    }
    intercept[IllegalArgumentException] {
      LogTable.create(spark, tmp() + "/bad3",
        Seq(("x", "p0")).toDF("id", "p"), Seq("p"),
        statsCols = Seq("id"),
        tableProperties = Map(LogTable.IdentityColProp -> "id"))
    }
  }

  test("concurrent omitting appends never collide: contention " +
    "serializes through the full retry") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((1L, "p0", "seed")).toDF("id", "p", "v"),
      Seq("p"), statsCols = Seq("id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id"))
    val threads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      (1 to threads).map { th =>
        pool.submit(new Runnable {
          override def run(): Unit = (1 to perThread).foreach { i =>
            LogTable.append(spark, t,
              Seq((s"p$th", s"w$th-$i")).toDF("p", "v"),
              maxRetries = 32): Unit
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    val all = LogTable.read(spark, t)
    assert(all.count() == (1 + threads * perThread).toLong)
    assert(all.select("id").distinct().count() == all.count(),
      "racing identity appends must never assign the same id")
  }
}

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
    // the WHOLE identity.* namespace is engine-managed: raw property
    // DDL refuses (a raw identity.inc = 0 would skip create()'s
    // validation and silently duplicate generated values)
    intercept[IllegalArgumentException] {
      LogTable.setProperties(spark, t, Map("identity.next" -> "1")): Unit
    }
    intercept[IllegalArgumentException] {
      LogTable.setProperties(spark, t, Map("identity.inc" -> "0")): Unit
    }
    intercept[IllegalArgumentException] {
      LogTable.setProperties(spark, t, Map("identity.col" -> "v")): Unit
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

  test("the fill is DENSE: a batch of n rows burns exactly n values " +
    "whatever the input partitioning") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((10L, "p0", "seed")).toDF("id", "p", "v"),
      Seq("p"), statsCols = Seq("id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id"))
    // 8 rows across 4 input partitions — the old
    // monotonically_increasing_id fill would jump 2^33 per partition
    val batch = (1 to 8).map(i => (s"p${i % 2}", s"r$i"))
      .toDF("p", "v").repartition(4)
    LogTable.append(spark, t, batch): Unit
    val ids = LogTable.read(spark, t).filter(col("v").startsWith("r"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == (11L to 18L), s"dense fill expected 11..18, got $ids")
    assert(LogTable.snapshot(spark, t).properties("identity.next") == "19")
  }

  test("START WITH / INCREMENT BY set the lattice; negative increment " +
    "counts down with a low-water; GENERATED ALWAYS refuses supplied " +
    "values") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq(("p0", "seed")).toDF("p", "v").limit(0)
        .withColumn("id", lit(0L)).select("id", "p", "v"),
      Seq("p"), statsCols = Seq("id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id",
        LogTable.IdentityStartProp -> "100",
        LogTable.IdentityIncProp -> "5"))
    LogTable.append(spark, t,
      Seq(("p0", "a"), ("p0", "b"), ("p1", "c")).toDF("p", "v")): Unit
    val ids = LogTable.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(100L, 105L, 110L), s"lattice fill, got $ids")
    // a supplied value OFF the lattice still pushes the high-water to
    // the next lattice point past it
    LogTable.append(spark, t,
      Seq((203L, "p0", "x")).toDF("id", "p", "v")): Unit
    LogTable.append(spark, t, Seq(("p1", "y")).toDF("p", "v")): Unit
    val yId = LogTable.read(spark, t).filter(col("v") === "y")
      .select("id").as[Long].head()
    assert(yId == 205L, s"next lattice point past 203 is 205, got $yId")
    // negative increment: values count DOWN below the start
    val t2 = tmp() + "/t2"
    LogTable.create(spark, t2,
      Seq((0L, "p0", "s")).toDF("id", "p", "v").limit(0),
      Seq("p"), statsCols = Seq("id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id",
        LogTable.IdentityStartProp -> "-1",
        LogTable.IdentityIncProp -> "-2"))
    LogTable.append(spark, t2,
      Seq(("p0", "a"), ("p0", "b")).toDF("p", "v")): Unit
    LogTable.append(spark, t2, Seq(("p0", "c")).toDF("p", "v")): Unit
    val down = LogTable.read(spark, t2).select("id").as[Long]
      .collect().sorted.toSeq
    assert(down == Seq(-5L, -3L, -1L), s"descending lattice, got $down")
    // GENERATED ALWAYS: supplying the column refuses loud
    val t3 = tmp() + "/t3"
    LogTable.create(spark, t3,
      Seq((1L, "p0", "s")).toDF("id", "p", "v").limit(0),
      Seq("p"), statsCols = Seq("id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id",
        LogTable.IdentityModeProp -> "always"))
    LogTable.append(spark, t3, Seq(("p0", "ok")).toDF("p", "v")): Unit
    val e = intercept[IllegalArgumentException] {
      LogTable.append(spark, t3,
        Seq((9L, "p0", "no")).toDF("id", "p", "v")): Unit
    }
    assert(e.getMessage.contains("ALWAYS"), e.getMessage)
    // a zero increment refuses at create
    intercept[IllegalArgumentException] {
      LogTable.create(spark, tmp() + "/bad",
        Seq((1L, "p0")).toDF("id", "p"), Seq("p"), statsCols = Seq("id"),
        tableProperties = Map(LogTable.IdentityColProp -> "id",
          LogTable.IdentityIncProp -> "0"))
    }
  }

  test("SQL surface: column-list CREATE with GENERATED BY DEFAULT AS " +
    "IDENTITY round-trips through DESCRIBE DETAIL; SYNC IDENTITY " +
    "re-aligns after a foreign high value") {
    val t = tmp() + "/t"
    org.apache.spark.sql.GraftBridge.installFunctions(spark,
      new graft.expr.GraftExtensions().apply)
    spark.sql(s"CREATE TABLE graft.`$t` (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY " +
      "(START WITH 1000 INCREMENT BY 10), " +
      "p STRING NOT NULL, v STRING) " +
      "PARTITIONED BY (p) STATS BY (id)").collect(): Unit
    val props = LogTable.snapshot(spark, t).properties
    assert(props.get("identity.col").contains("id"))
    assert(props.get("identity.start").contains("1000"))
    assert(props.get("identity.inc").contains("10"))
    // DESCRIBE DETAIL round-trip: the properties surface
    val detail = spark.sql(s"DESCRIBE DETAIL graft.`$t`").collect()
    assert(detail.nonEmpty)
    LogTable.append(spark, t,
      Seq(("p0", "a"), ("p0", "b")).toDF("p", "v")): Unit
    assert(LogTable.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1000L, 1010L))
    // a supplied value past the high-water, then SYNC IDENTITY
    LogTable.append(spark, t,
      Seq((5003L, "p1", "big")).toDF("id", "p", "v")): Unit
    // the supplying append itself advances; SYNC on an aligned table
    // is then a no-op (-1)
    assert(LogTable.syncIdentity(spark, t) == -1L)
    val sql = spark.sql(
      s"ALTER TABLE graft.`$t` ALTER COLUMN id SYNC IDENTITY").collect()
    assert(sql.head.getLong(0) == -1L)
    LogTable.append(spark, t, Seq(("p1", "z")).toDF("p", "v")): Unit
    val zId = LogTable.read(spark, t).filter(col("v") === "z")
      .select("id").as[Long].head()
    assert(zId == 5010L,
      s"next lattice point past 5003 from start 1000 step 10, got $zId")
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

  test("identity rides EVERY insert path: upsert inherits matched keys' " +
    "values and generates for new keys, overwrite and MERGE INTO " +
    "inserts fill, GENERATED ALWAYS refuses explicit values everywhere") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((1L, "p0", "a", 0L, "U", 100L), (2L, "p0", "b", 0L, "U", 200L))
        .toDF("k", "p", "v", "ver", "op", "id"),
      Seq("p"), statsCols = Seq("k", "id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id"))
    // UPSERT omitting the column: matched key keeps its committed id,
    // the new key gets a generated one above the high-water — never the
    // alignment NULL
    LogTable.upsert(spark, t,
      Seq((2L, "p0", "b2", 1L, "U"), (3L, "p1", "c", 1L, "U"))
        .toDF("k", "p", "v", "ver", "op"),
      Seq("k"), Seq("ver"), "op"): Unit
    val byK = LogTable.read(spark, t).select("k", "id").as[(Long, Long)]
      .collect().toMap
    assert(byK(1L) == 100L && byK(2L) == 200L,
      s"matched keys keep their identity, got $byK")
    assert(byK(3L) > 200L, s"new key generates past the high-water: $byK")
    assert(byK.values.toSeq.distinct.size == 3, s"ids stay unique: $byK")
    // MERGE INTO insert omitting the column: the inserted row fills,
    // the updated row keeps its id
    LogTable.mergeInto(spark, t,
      Seq((1L, "p0", "a2", 9L, "U"), (4L, "p1", "d", 9L, "U"))
        .toDF("k", "p", "v", "ver", "op"), Seq("k"))
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert().run(): Unit
    val byK2 = LogTable.read(spark, t).select("k", "id").as[(Long, Long)]
      .collect().toMap
    assert(byK2(1L) == 100L, s"merge update keeps identity: $byK2")
    assert(byK2(4L) > byK2(3L), s"merge insert generates fresh: $byK2")
    assert(byK2.values.toSeq.distinct.size == 4, s"unique: $byK2")
    // OVERWRITE omitting the column: every row fills above the water
    val before = byK2.values.max
    LogTable.overwriteAll(spark, t,
      Seq((7L, "p0", "x", 0L, "U"), (8L, "p1", "y", 0L, "U"))
        .toDF("k", "p", "v", "ver", "op")): Unit
    val ow = LogTable.read(spark, t).select("id").as[Long].collect().toSeq
    assert(ow.size == 2 && ow.distinct.size == 2 && ow.forall(_ > before),
      s"overwrite fill must be fresh and unique, got $ow past $before")
    // GENERATED ALWAYS: every supplying path refuses loud
    val ta = tmp() + "/ta"
    LogTable.create(spark, ta,
      Seq((1L, "p0", "a", 0L, "U", 1L))
        .toDF("k", "p", "v", "ver", "op", "id"),
      Seq("p"), statsCols = Seq("k", "id"),
      tableProperties = Map(LogTable.IdentityColProp -> "id",
        LogTable.IdentityModeProp -> "always",
        LogTable.IdentityStartProp -> "2"))
    def refused(f: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("ALWAYS"), e.getMessage)
    }
    refused(LogTable.upsert(spark, ta,
      Seq((2L, "p0", "b", 1L, "U", 9L)).toDF("k", "p", "v", "ver", "op", "id"),
      Seq("k"), Seq("ver"), "op"): Unit)
    refused(LogTable.overwriteAll(spark, ta,
      Seq((2L, "p0", "b", 1L, "U", 9L))
        .toDF("k", "p", "v", "ver", "op", "id")): Unit)
    refused(LogTable.mergeInto(spark, ta,
      Seq((2L, "p0", "b", 1L, "U", 9L)).toDF("k", "p", "v", "ver", "op", "id"),
      Seq("k")).whenNotMatchedInsert().run(): Unit)
    refused(LogTable.mergeInto(spark, ta,
      Seq((1L, "p0", "b", 1L, "U")).toDF("k", "p", "v", "ver", "op"),
      Seq("k")).whenMatchedUpdate(Map("id" -> "42")).run(): Unit)
    // and the OMITTING forms still work under ALWAYS
    LogTable.upsert(spark, ta,
      Seq((2L, "p0", "b", 1L, "U")).toDF("k", "p", "v", "ver", "op"),
      Seq("k"), Seq("ver"), "op"): Unit
    LogTable.mergeInto(spark, ta,
      Seq((3L, "p1", "c", 1L, "U")).toDF("k", "p", "v", "ver", "op"),
      Seq("k")).whenNotMatchedInsert().run(): Unit
    val ids = LogTable.read(spark, ta).select("id").as[Long].collect().toSeq
    assert(ids.distinct.size == 3 && !ids.contains(null),
      s"ALWAYS omitting paths still generate unique ids: $ids")
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source/sink round-trips: parquet (partitioned), CSV, JSON-lines, and
  * the JSON-payload-column ingestion shape chained into record operators.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-io").toString

  test("parquet round-trip with partition pruning layout") {
    val dir = tmp() + "/pq"
    val df = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("id", "d", "v")
    Sources.writeParquet(df, dir, partitionBy = Seq("d"))
    val back = Sources.readParquet(spark, dir)
    assert(back.count() == 2)
    // partition-pruned read: only one directory is scanned
    val pruned = back.filter(col("d") === "2024-01-02")
    assert(pruned.select("id").head() == Row(2L))
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("csv round-trip stringifies nested columns via D8") {
    val dir = tmp() + "/csv"
    val df = Seq(1).toDF("i").select(
      lit(7L).as("id"), struct(lit(1L).as("a")).as("obj"))
    Sources.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("obj", StringType)))
    val back = Sources.readCsv(spark, dir, schema)
    assert(back.head() == Row(7L, """{"a":1}"""))
  }

  test("jsonl round-trip and payload-column parsing chain") {
    val dir = tmp() + "/jsonl"
    val df = Seq((1L, """{"k": 5, "deep": {"x": "y"}}""")).toDF("id", "raw")
    Sources.writeJsonl(df, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("raw", StringType)))
    val back = Sources.readJsonl(spark, dir, schema)
    val payloadSchema = StructType(Seq(
      StructField("k", LongType),
      StructField("deep", StructType(Seq(StructField("x", StringType))))))
    val parsed = Sources.parseJsonColumn(back, "raw", payloadSchema)
      .drop("raw")
      .transform(graft.ops.Flatten()(_)) // the README pipeline shape
    assert(parsed.columns.toSeq == Seq("id", "payload__k", "payload__deep__x"))
    assert(parsed.head() == Row(1L, 5L, "y"))
  }

  test("orc round-trip is byte-exact and pushes filters into the scan") {
    val dir = tmp() + "/orc"
    val df = Seq((1L, "héllo\tworld", 12L), (2L, "中文 text", 7L))
      .toDF("doc_id", "text", "n_chars")
    Sources.writeOrc(df, dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("n_chars", LongType)))
    val back = Sources.readOrc(spark, dir, schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      Seq(Row(1L, "héllo\tworld", 12L), Row(2L, "中文 text", 7L)))
    // the q100 scan contract: a predicate reaches the ORC reader as a
    // pushed filter and a projection prunes the read schema to the
    // referenced columns — same discipline as the parquet scans
    val plan = back.filter(col("doc_id") === 2L).select("doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,2)]"), plan)
    assert(!plan.substring(plan.indexOf("ReadSchema")).contains("text"), plan)
  }

  test("bucketed tables join without a shuffle (co-location)") {
    val facts = (1L to 100L).map(i => (i % 10, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 10L).map(i => (i, s"dim$i")).toDF("k", "name")
    Sources.writeBucketed(facts, "bkt_facts", Seq("k"), 4)
    Sources.writeBucketed(dims, "bkt_dims", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so co-location (not broadcast) is what
      // removes the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed read not used:\n$plan")
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("compactIfNeeded threshold: exactly at budget is quiet, one file over fires") {
    // numBuckets = 1 and single-partition appends pin the file count
    // exactly (one task x one bucket = one file per write), so the policy
    // boundary `files > maxFilesPerBucket * numBuckets` is testable on
    // both sides instead of somewhere past it.
    val df = (1L to 10L).toDF("k").coalesce(1)
    try {
      Sources.writeBucketed(df, "gsrc_thr", Seq("k"), 1)
      (1 to 2).foreach { _ =>
        Sources.writeBucketed(df, "gsrc_thr", Seq("k"), 1,
          org.apache.spark.sql.SaveMode.Append)
      }
      assert(spark.table("gsrc_thr").inputFiles.length == 3)
      // files == threshold: within budget, policy must NOT rewrite
      assert(Sources.compactIfNeeded(spark, "gsrc_thr", Seq("k"), 1,
        maxFilesPerBucket = 3).isEmpty)
      Sources.writeBucketed(df, "gsrc_thr", Seq("k"), 1,
        org.apache.spark.sql.SaveMode.Append)
      // files == threshold + 1: the smallest over-budget state fires
      val st = Sources.compactIfNeeded(spark, "gsrc_thr", Seq("k"), 1,
        maxFilesPerBucket = 3)
      assert(st.nonEmpty && st.get.rowsBefore == 40 && st.get.rowsAfter == 10)
      assert(spark.table("gsrc_thr").inputFiles.length == 1)
    } finally spark.sql("DROP TABLE IF EXISTS gsrc_thr")
  }

  test("writeRangeSorted: disjoint per-file ranges, in-file order, range exchange not global sort") {
    val dir = tmp() + "/rs"
    // deliberately unsorted input across 2 partitions
    val df = spark.range(0, 200).select((col("id") * 37 % 200).as("k"))
      .repartition(2)
    // plan shape: boundaries come from a RangePartitioning exchange, and
    // no global Sort sits above it
    val shaped = df.repartitionByRange(4, col("k")).sortWithinPartitions("k")
    val plan = shaped.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    // Sort prints its global flag positionally: `Sort [...], <global>, 0`
    // — the within-partition sort must be local (false), never a global
    // total-order sort
    assert("Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isEmpty, plan)
    assert("Sort \\[[^\\]]*\\], false".r.findFirstIn(plan).isDefined, plan)
    Sources.writeRangeSorted(df, dir, "k", numFiles = 4)
    val man = Sources.rangeManifest(spark, dir, "k")
      .orderBy("min_key").collect()
    assert(man.length == 4)
    // files hold disjoint, increasing ranges
    man.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"), man.mkString("\n"))
    }
    assert(man.map(_.getAs[Long]("n")).sum == 200)
    // each file is internally sorted (read one file alone, check order)
    val firstFile = man.head.getAs[String]("__file")
    val rows = spark.read.parquet(firstFile).select("k")
      .collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted), "file not internally sorted")
  }

  test("readEvolved: missing column fills typed NULL, lossless widening casts, lossy fails loud") {
    val d1 = tmp() + "/e1"
    val d2 = tmp() + "/e2"
    Seq((1L, 10)).toDF("k", "qty").write.parquet(d1)                 // no tag, INT qty
    Seq((2L, 20L, "x")).toDF("k", "qty", "TAG").write.parquet(d2)    // BIGINT qty, tag added
    val declared = StructType.fromDDL("k BIGINT, qty BIGINT, tag STRING")
    val out = Sources.readEvolved(spark, Seq(d1, d2), declared)
      .orderBy("k").collect().toSeq
    // epoch-1 row: widened qty, NULL tag; epoch-2 row: case-insensitive
    // TAG resolves to the declared name
    assert(out == Seq(Row(1L, 10L, null), Row(2L, 20L, "x")))
    // lossy direction (BIGINT epoch vs declared INT) must fail loud
    val narrow = StructType.fromDDL("k BIGINT, qty INT, tag STRING")
    val e = intercept[IllegalArgumentException] {
      Sources.readEvolved(spark, Seq(d2), narrow)
    }
    assert(e.getMessage.contains("qty") && e.getMessage.contains("BIGINT"))
  }

  test("compactIfNeeded recovery: missing table is a no-op, torn swap is finished first") {
    try {
      // a table the ingest loop has not created yet: policy no-op, no error
      assert(Sources.compactIfNeeded(spark, "gsrc_missing", Seq("k"), 1).isEmpty)
      // torn-swap crash state: the compacted copy landed in __compact and
      // the live table was dropped, but the rename never ran
      val df = (1L to 10L).toDF("k").coalesce(1)
      Sources.writeBucketed(df, "gsrc_torn__compact", Seq("k"), 1)
      assert(!spark.catalog.tableExists("gsrc_torn"))
      // the next unconditional policy call must finish the rename BEFORE
      // deciding anything, then judge the (within-budget) table quiet
      assert(Sources.compactIfNeeded(spark, "gsrc_torn", Seq("k"), 1,
        maxFilesPerBucket = 3).isEmpty)
      assert(spark.catalog.tableExists("gsrc_torn"))
      assert(!spark.catalog.tableExists("gsrc_torn__compact"))
      assert(spark.table("gsrc_torn").count() == 10)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gsrc_torn")
      spark.sql("DROP TABLE IF EXISTS gsrc_torn__compact")
    }
  }
}

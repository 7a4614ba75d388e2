package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** batchProbe must agree bit-for-bit with its two predecessors. */
class BatchProbeSpec extends SparkSpec {
  import spark.implicits._

  test("batchProbe == touchedTuples + batchKeyRanges on partitioned, NULL and multi-col batches") {
    val df = Seq(
      (1L, "a", Some(1997), 10L), (2L, "b", Some(1997), 20L),
      (3L, null.asInstanceOf[String], Some(1998), 30L),
      (4L, "a", None, 40L), (5L, "b", Some(1999), 50L))
      .toDF("k", "status", "o_year0", "v")
      .withColumn("o_year", col("o_year0")).drop("o_year0")
    for (pcols <- Seq(Seq("o_year"), Seq("o_year", "status"))) {
      val snap = LogTable.Snapshot(1L,
        df.schema.toDDL, pcols, Seq("k"), Nil)
      val old = LogTable.touchedTuples("p", snap, df)
      val oldKr = LogTable.batchKeyRanges(spark, snap, df, Seq("k", "v"))
      val (nt, nkr) = LogTable.batchProbe(spark, "p", snap, snap, df, Seq("k", "v"))
      assert(nt.map(_.toList).toSet == old.map(_.toList).toSet,
        s"tuples: $nt vs $old (pcols=$pcols)")
      assert(nkr == oldKr, s"kr: $nkr vs $oldKr (pcols=$pcols)")
    }
  }
}

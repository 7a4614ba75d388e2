package graft.sources

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property invariants for the commit-log table: for ARBITRARY change
  * sequences applied batch-by-batch through `LogTable.upsert` —
  * interleaved with compaction, checkpointing, and log expiry — the
  * final table must agree with the naive in-memory fold (per key, the
  * largest (ver, op, v) tuple wins; a winning tombstone deletes). The
  * maintenance operations are metadata rewrites, so running them at any
  * point between batches must never change a row.
  */
class LogTablePropertySpec extends SparkSpec {
  import spark.implicits._

  private final case class Change(k: Long, v: String, ver: Int, op: String) {
    def p: String = "p" + (k % 3)
  }

  private val batchesGen: Gen[List[List[Change]]] =
    Gen.listOfN(3, Gen.listOfN(12, for {
      k <- Gen.choose(0L, 7L)
      ver <- Gen.choose(1, 9)
      del <- Gen.prob(0.3)
      v <- Gen.alphaStr.map(_.take(4))
    } yield Change(k, v, ver, if (del) "D" else "U")))

  private def reference(state: Map[Long, Change],
                        changes: Seq[Change]): Map[Long, Change] = {
    val all = state.values.toSeq ++ changes
    all.groupBy(_.k).flatMap { case (k, cs) =>
      val w = cs.maxBy(c => (c.ver, c.op, c.v))
      if (w.op == "D") None else Some(k -> w)
    }
  }

  private def toDf(rows: Seq[Change]): DataFrame =
    rows.map(c => (c.k, c.v, c.ver, c.p, c.op)).toDF("k", "v", "ver", "p", "op")

  private def forSamples[T](gen: Gen[T], n: Int)(f: (T, Int) => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(11L)
    var produced = 0
    while (produced < n) {
      gen.apply(params, seed).foreach { v => f(v, produced); produced += 1 }
      seed = seed.next
    }
  }

  test("arbitrary batch sequences + maintenance agree with the naive fold") {
    forSamples(batchesGen, 4) { (batches, i) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-lt-prop")
        .toString + "/t"
      val base = (0L to 5L).map(k => Change(k, "b" + k, 0, "U"))
      LogTable.create(spark, dir, toDf(base), "p")
      var ref = base.map(c => c.k -> c).toMap
      batches.zipWithIndex.foreach { case (b, j) =>
        if (b.nonEmpty) {
          LogTable.upsert(spark, dir, toDf(b),
            Seq("k"), Seq("ver", "op", "v"), "op")
          ref = reference(ref, b)
        }
        // maintenance between batches must be row-invisible
        if ((i + j) % 2 == 0)
          LogTable.compactPartitions(spark, dir, maxFilesPerPartition = 1): Unit
        if ((i + j) % 3 == 0) {
          LogTable.checkpoint(spark, dir): Unit
          LogTable.expireLog(spark, dir): Unit
          LogTable.vacuum(spark, dir, olderThanMs = 0L): Unit
        }
      }
      val got = LogTable.read(spark, dir).collect()
        .map(r => r.getLong(0) -> Change(r.getLong(0), r.getString(1),
          r.getInt(2), r.getString(4))).toMap
      assert(got == ref, s"sample $i: $got vs $ref")
    }
  }
}

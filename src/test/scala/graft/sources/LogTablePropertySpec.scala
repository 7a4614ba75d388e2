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
  * point between batches must never change a row. On top of the fold,
  * every batch checks the CHANGE-FEED identity: `snapshot(before) ∖
  * deletes ∪ inserts ≡ snapshot(after)` as multisets — readChanges must
  * reconstruct every commit exactly, whatever the batch contents.
  */
class LogTablePropertySpec extends SparkSpec {
  import spark.implicits._

  private final case class Change(k: Long, v: String, ver: Int, op: String) {
    def p: String = "p" + (k % 3)
    def q: String = if (k % 2 == 0) "even" else "odd"
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

  private def forSamples[T](gen: Gen[T], n: Int)(f: (T, Int) => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(11L)
    var produced = 0
    while (produced < n) {
      gen.apply(params, seed).foreach { v => f(v, produced); produced += 1 }
      seed = seed.next
    }
  }

  /** `snapshot(before) ∖ deletes ∪ inserts ≡ snapshot(after)` (multisets). */
  private def assertCdf(dir: String, before: Long, after: Long): Unit = {
    val ch = LogTable.readChanges(spark, dir, before, after)
    val ins = ch.filter($"_change_type" === "insert").drop("_change_type")
    val del = ch.filter($"_change_type" === "delete").drop("_change_type")
    val recon = LogTable.read(spark, dir, Some(before)).exceptAll(del).unionAll(ins)
    val direct = LogTable.read(spark, dir, Some(after))
    assert(recon.exceptAll(direct).count() == 0 &&
      direct.exceptAll(recon).count() == 0, s"CDF $before->$after drifted")
  }

  private def runScenario(partitionCols: Seq[String],
                          toDf: Seq[Change] => DataFrame,
                          samples: Int, checkCdf: Boolean,
                          dvDeletes: Boolean = false): Unit =
    forSamples(batchesGen, samples) { (batches, i) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-lt-prop")
        .toString + "/t"
      val base = (0L to 5L).map(k => Change(k, "b" + k, 0, "U"))
      LogTable.create(spark, dir, toDf(base), partitionCols, Nil)
      var ref = base.map(c => c.k -> c).toMap
      batches.zipWithIndex.foreach { case (b, j) =>
        if (b.nonEmpty) {
          val before = LogTable.snapshot(spark, dir).version
          val after = LogTable.upsert(spark, dir, toDf(b),
            Seq("k"), Seq("ver", "op", "v"), "op")
          ref = reference(ref, b)
          // the change feed of THIS commit reconstructs it exactly (checked
          // pre-maintenance: vacuum below may reclaim the removed files)
          if (checkCdf) assertCdf(dir, before, after)
        }
        // deletion-vector deletes interleave with the merges: the fold
        // must see them exactly (and purge must stay row-invisible)
        if (dvDeletes && (i + j) % 2 == 1) {
          val kk = (i.toLong + j) % 8L
          LogTable.deleteWhere(spark, dir,
            $"k" === kk && $"ver" <= 5, deletionVectors = true): Unit
          ref = ref.filterNot { case (k, c) => k == kk && c.ver <= 5 }
        }
        if (dvDeletes && (i + j) % 3 == 1)
          LogTable.purgeDeletes(spark, dir): Unit
        // maintenance between batches must be row-invisible
        if ((i + j) % 2 == 0)
          LogTable.compactPartitions(spark, dir, maxFilesPerPartition = 1): Unit
        if ((i + j) % 3 == 0) {
          LogTable.checkpoint(spark, dir): Unit
          LogTable.expireLog(spark, dir): Unit
          LogTable.vacuum(spark, dir, olderThanMs = 0L, force = true): Unit
        }
      }
      val got = LogTable.read(spark, dir).select("k", "v", "ver", "op").collect()
        .map(r => r.getLong(0) -> Change(r.getLong(0), r.getString(1),
          r.getInt(2), r.getString(3))).toMap
      assert(got == ref, s"sample $i: $got vs $ref")
    }

  test("arbitrary batch sequences + maintenance agree with the naive fold") {
    runScenario(Seq("p"),
      rows => rows.map(c => (c.k, c.v, c.ver, c.p, c.op))
        .toDF("k", "v", "ver", "p", "op"),
      samples = 4, checkCdf = true)
  }

  test("deletion vectors interleaved with merges and maintenance keep the fold exact") {
    runScenario(Seq("p"),
      rows => rows.map(c => (c.k, c.v, c.ver, c.p, c.op))
        .toDF("k", "v", "ver", "p", "op"),
      samples = 2, checkCdf = true, dvDeletes = true)
  }

  test("multi-column partitioning folds identically (tuple-pruned rewrites)") {
    runScenario(Seq("p", "q"),
      rows => rows.map(c => (c.k, c.v, c.ver, c.p, c.q, c.op))
        .toDF("k", "v", "ver", "p", "q", "op"),
      samples = 2, checkCdf = true)
  }
}

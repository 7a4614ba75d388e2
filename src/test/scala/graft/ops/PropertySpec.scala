package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property invariants ported from the reference Hypothesis suite
  * (`/root/reference/tests/test_data_structures_property.py`):
  * idempotence, determinism, no-empties-after-remove_empty, depth
  * monotonicity, flatten leaf preservation. Structures are generated as
  * random nested select-lists over a one-row DataFrame (the columnar
  * analog of the reference's recursive data generator `:42-58`).
  */
class PropertySpec extends SparkSpec {

  /** Deterministic sampler (no scalatest-scalacheck bridge in the offline
    * cache): evaluates `f` on `n` generated values from a fixed seed.
    */
  private def forSamples[T](gen: Gen[T], n: Int = 12)(f: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(params, seed) match {
        case Some(v) => f(v); produced += 1
        case None => ()
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced == n, s"generator too sparse: $produced/$n")
  }

  // --- generator: random nested column expression + leaf count ----------
  private val leafGen: Gen[Column] = Gen.oneOf(
    Gen.choose(-100L, 100L).map(lit(_)),
    Gen.alphaStr.map(s => lit(s.take(8))),
    Gen.oneOf(lit(true), lit(false)),
    Gen.const(lit(null).cast("string")),
    Gen.const(lit("")))

  // arrays must be type-homogeneous (ANSI coercion rejects [long, string])
  private val arrayGen: Gen[Column] = Gen.oneOf(
    Gen.listOfN(2, Gen.choose(-100L, 100L)).map(xs => array(xs.map(lit(_)): _*)),
    Gen.listOfN(2, Gen.alphaStr.map(_.take(6))).map(xs => array(xs.map(lit(_)): _*)))

  private def structGen(depth: Int): Gen[Column] =
    if (depth <= 0) leafGen
    else Gen.choose(1, 3).flatMap { n =>
      Gen.listOfN(n, Gen.frequency(
        3 -> leafGen,
        2 -> Gen.lzy(structGen(depth - 1)),
        1 -> arrayGen))
        .map(cols => struct(cols.zipWithIndex.map { case (c, i) => c.as(s"f$i") }: _*))
    }

  private def dfOf(cols: Seq[Column]): DataFrame = {
    import spark.implicits._
    Seq(1).toDF("seed").select(cols.zipWithIndex.map { case (c, i) => c.as(s"c$i") }: _*)
  }

  private val rowGen: Gen[Seq[Column]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf(leafGen, structGen(2))))

  test("prune is idempotent (property_py:62-68)") {
    forSamples(rowGen) { cols =>
      val df = dfOf(cols)
      val p = Prune.byNames(keysToRemove = Seq("f0"), valuesToRemove = Seq(0L, ""),
        removeEmpty = true)
      val once = p(df)
      val twice = p(once)
      assert(once.schema == twice.schema)
      assert(once.head() == twice.head())
    }
  }

  test("prune is deterministic (property_py:176)") {
    forSamples(rowGen) { cols =>
      val df = dfOf(cols)
      val p = Prune.byNames(keysToRemove = Seq("f1"), removeEmpty = true)
      assert(p(df).head() == p(df).head())
    }
  }

  test("flatten preserves leaves and is idempotent on flat output (property_py:841-850)") {
    forSamples(rowGen) { cols =>
      val df = dfOf(cols)
      val flat = Flatten()(df)
      // no struct columns remain (arrays pass through un-descended)
      assert(flat.schema.fields.forall(f => f.dataType.typeName != "struct"
        || f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType].isEmpty))
      // leaf count preserved
      val leavesBefore = graft.schema.SchemaOps.leafPaths(df.schema).size
      assert(flat.schema.fields.length == leavesBefore)
      // idempotent
      assert(Flatten()(flat).schema == flat.schema)
    }
  }

  test("convert_types is idempotent for already-converted columns") {
    forSamples(Gen.listOfN(3, Gen.choose(-1000L, 1000L))) { xs =>
      import spark.implicits._
      val df = xs.map(_.toString).toDF("v")
      val conv = ConvertTypes(Map("v" -> ConvertType.ToInt))
      val once = conv(df)
      val twice = conv(once)
      assert(once.collect().toSeq == twice.collect().toSeq)
    }
  }

  test("json stringify is idempotent (reference :1817-1824)") {
    forSamples(rowGen) { cols =>
      val df = dfOf(cols)
      val once = JsonStringify()(df)
      val twice = JsonStringify()(once)
      assert(once.head() == twice.head())
    }
  }

  test("prune with deeper max_depth removes at least as much (depth monotonicity, property_py:142)") {
    forSamples(rowGen) { cols =>
      val df = dfOf(cols)
      def leafCount(d: Option[Int]): Int =
        graft.schema.SchemaOps.leafPaths(
          Prune.byNames(keysToRemove = Seq("f0", "f1"), maxDepth = d)(df).schema).size
      val c0 = leafCount(Some(0))
      val c2 = leafCount(Some(2))
      val cInf = leafCount(None)
      assert(c0 >= c2 && c2 >= cInf)
    }
  }
}

package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Custom codegen'd dot product expression. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("matches a driver-side sequential sum exactly") {
    val a = Seq(1.5, -2.25, 3.0, 0.125)
    val b = Seq(4.0, 0.5, -1.0, 8.0)
    val expected = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    val df = Seq((a, b)).toDF("a", "b")
    assert(df.select(DotProduct(col("a"), col("b"))).as[Double].head() == expected)
  }

  test("NULL propagates; mismatched types rejected at analysis") {
    val df = Seq(Tuple1(Seq(1.0))).toDF("a")
      .withColumn("n", lit(null).cast("array<double>"))
    assert(df.select(DotProduct(col("a"), col("n"))).head().isNullAt(0))
    val e = intercept[Exception] {
      Seq((Seq(1.0), Seq("x"))).toDF("a", "b")
        .select(DotProduct(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<double>"))
  }

  test("interpreted and codegen paths agree") {
    val df = Seq((Seq(0.1, 0.2, 0.3), Seq(3.0, 2.0, 1.0))).toDF("a", "b")
    val viaCol = df.select(DotProduct(col("a"), col("b"))).as[Double].head()
    // interpreted eval through the expression directly
    val expr = DotProduct(
      org.apache.spark.sql.GraftBridge.expression(col("a")),
      org.apache.spark.sql.GraftBridge.expression(col("b")))
    assert(viaCol == 0.1 * 3.0 + 0.2 * 2.0 + 0.3 * 1.0)
    assert(expr.dataType.typeName == "double")
  }
}

package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** The `nprobe` nearest IVF cells of an embedding: indices of the
  * `nprobe` centroids with the largest dot product against the input
  * vector (descending dot, ties broken by centroid index).
  *
  * The centroid matrix is a CONSTRUCTOR parameter, not a child expression:
  * it is trained once on the driver (spherical k-means over a
  * deterministic sample, see [[graft.scale.Similarity.trainCentroids]])
  * and shipped to executors inside the serialized plan — K×dim doubles,
  * kilobytes. Codegen reads it through a plan reference object, so the
  * per-row work is a primitive K×dim multiply loop plus an O(K·nprobe)
  * selection, all inside whole-stage codegen. Element `i` of the output
  * is the rank-`i` cell; element 0 is the vector's HOME cell, which makes
  * one expression serve both the member-assignment and the probe side of
  * an IVF join.
  */
final case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression {

  // Seq (not Array) constructor field: case-class equality must be
  // STRUCTURAL for plan canonicalization — with an Array field two
  // semantically-identical plan branches never compare equal and
  // ReuseExchange silently stops deduplicating the scan subtree.
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nprobe > 0 && nprobe <= centroids.length,
    s"nprobe must be in [1, ${centroids.length}]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val float = isFloat
    val k = centroids.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val d = math.min(arr.numElements(), cent.length)
      var s = 0.0; var i = 0
      while (i < d) {
        s += (if (float) arr.getFloat(i).toDouble else arr.getDouble(i)) * cent(i)
        i += 1
      }
      dots(c) = s; c += 1
    }
    new GenericArrayData(NearestCells.selectTop(dots, nprobe))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
      val dots = ctx.freshName("dots"); val c = ctx.freshName("c")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val cent = ctx.freshName("cent")
      val getElem = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double[] $dots = new double[${centroids.length}];
         |for (int $c = 0; $c < ${centroids.length}; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  int $d = java.lang.Math.min($a.numElements(), $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) { $s += $getElem * $cent[$i]; }
         |  $dots[$c] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expr.NearestCells.selectTop($dots, $nprobe));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  /** Indices of the `nprobe` largest dots, descending, ties by index —
    * O(K·nprobe) selection (K is small; no allocation beyond the result).
    */
  def selectTop(dots: Array[Double], nprobe: Int): Array[Int] = {
    val k = dots.length
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < nprobe) {
      var best = -1; var bestDot = 0.0
      var c = 0
      while (c < k) {
        if (!taken(c) && (best < 0 || dots(c) > bestDot)) { best = c; bestDot = dots(c) }
        c += 1
      }
      taken(best) = true; out(r) = best; r += 1
    }
    out
  }

  def apply(emb: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(emb), centroids, nprobe))
}

package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** TWO-LEVEL IVF cell assignment: route through `superProbe` nearest
  * SUPER-cells, then rank only their child cells — the 10⁹⁺-vector answer
  * to [[NearestCells]]'s flat K-scan (O(√n·dim) per row at K ≈ √n): with
  * S ≈ √K supers the per-row cost drops to
  * O((S + superProbe·K/S)·dim) ≈ O(n^0.25·dim·superProbe).
  *
  * Output = original cell indices (rank order: descending dot, ties by
  * index), so it is a drop-in for [[NearestCells]] in the IVF join —
  * element 0 is the home cell. With `superProbe` = #supers every cell is
  * ranked and the output EQUALS the flat expression's (spec-pinned);
  * smaller probes trade assignment recall for the routed cost, the same
  * dial nprobe gives the search side.
  *
  * All three matrices (supers S×dim, cells K×dim, child index lists) are
  * driver-trained constructor params — Seq fields, not Arrays, so plan
  * canonicalization stays structural and ReuseExchange keeps
  * deduplicating the shared scan (the [[NearestCells]] lesson). The
  * output may be SHORTER than nprobe when the probed supers hold fewer
  * than nprobe children.
  */
final case class RoutedNearestCells(
    child: Expression,
    superCents: Seq[Seq[Double]],
    cells: Seq[Seq[Double]],
    childCells: Seq[Seq[Int]],
    nprobe: Int,
    superProbe: Int)
  extends UnaryExpression {

  @transient private lazy val supArr: Array[Array[Double]] =
    superCents.map(_.toArray).toArray
  @transient private lazy val cellArr: Array[Array[Double]] =
    cells.map(_.toArray).toArray
  @transient private lazy val kidArr: Array[Array[Int]] =
    childCells.map(_.toArray).toArray

  require(superCents.nonEmpty, "superCents must be non-empty")
  require(childCells.length == superCents.length,
    "one child list per super-cell required")
  require(childCells.flatten.sorted == cells.indices.toList,
    "children must partition the cell indices exactly once each")
  require(nprobe > 0, "nprobe must be >= 1")
  require(superProbe > 0 && superProbe <= superCents.length,
    s"superProbe must be in [1, ${superCents.length}]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "routed_nearest_cells"

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
    def dot(cent: Array[Double]): Double = {
      val d = math.min(arr.numElements(), cent.length)
      var s = 0.0; var i = 0
      while (i < d) {
        s += (if (float) arr.getFloat(i).toDouble else arr.getDouble(i)) * cent(i)
        i += 1
      }
      s
    }
    val sdots = new Array[Double](supArr.length)
    var si = 0
    while (si < supArr.length) { sdots(si) = dot(supArr(si)); si += 1 }
    val topSup = NearestCells.selectTop(sdots, superProbe)
    val candIdx = new Array[Int](cellArr.length)
    val candDot = new Array[Double](cellArr.length)
    var n = 0; var p = 0
    while (p < topSup.length) {
      val ks = kidArr(topSup(p))
      var q = 0
      while (q < ks.length) {
        candIdx(n) = ks(q); candDot(n) = dot(cellArr(ks(q))); n += 1
        q += 1
      }
      p += 1
    }
    new GenericArrayData(RoutedNearestCells.selectTopIdx(candIdx, candDot, n, nprobe))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val supRef = ctx.addReferenceObj("superCents", supArr, "double[][]")
      val cellRef = ctx.addReferenceObj("cells", cellArr, "double[][]")
      val kidRef = ctx.addReferenceObj("children", kidArr, "int[][]")
      val sdots = ctx.freshName("sdots"); val cand = ctx.freshName("candIdx")
      val cdot = ctx.freshName("candDot"); val n = ctx.freshName("n")
      val si = ctx.freshName("si"); val p = ctx.freshName("p")
      val q = ctx.freshName("q"); val ks = ctx.freshName("ks")
      val top = ctx.freshName("topSup"); val cent = ctx.freshName("cent")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val cell = ctx.freshName("cell")
      val getElem = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double[] $sdots = new double[${superCents.length}];
         |for (int $si = 0; $si < ${superCents.length}; $si++) {
         |  double[] $cent = $supRef[$si];
         |  int $d = java.lang.Math.min($a.numElements(), $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) { $s += $getElem * $cent[$i]; }
         |  $sdots[$si] = $s;
         |}
         |int[] $top = graft.expr.NearestCells.selectTop($sdots, $superProbe);
         |int[] $cand = new int[${cells.length}];
         |double[] $cdot = new double[${cells.length}];
         |int $n = 0;
         |for (int $p = 0; $p < $top.length; $p++) {
         |  int[] $ks = $kidRef[$top[$p]];
         |  for (int $q = 0; $q < $ks.length; $q++) {
         |    int $cell = $ks[$q];
         |    double[] $cent = $cellRef[$cell];
         |    int $d = java.lang.Math.min($a.numElements(), $cent.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $d; $i++) { $s += $getElem * $cent[$i]; }
         |    $cand[$n] = $cell; $cdot[$n] = $s; $n++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expr.RoutedNearestCells.selectTopIdx($cand, $cdot, $n, $nprobe));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RoutedNearestCells =
    copy(child = newChild)
}

object RoutedNearestCells {
  /** Top `nprobe` of the first `n` (index, dot) candidates: descending
    * dot, ties by ORIGINAL index (matching [[NearestCells.selectTop]]'s
    * ascending-scan tie rule, so the superProbe = #supers degeneration is
    * bit-identical to the flat expression). Returns min(nprobe, n) ids.
    */
  def selectTopIdx(idx: Array[Int], dots: Array[Double], n: Int, nprobe: Int): Array[Int] = {
    val m = math.min(nprobe, n)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < m) {
      var best = -1
      var c = 0
      while (c < n) {
        if (!taken(c) && (best < 0 || dots(c) > dots(best) ||
            (dots(c) == dots(best) && idx(c) < idx(best)))) best = c
        c += 1
      }
      taken(best) = true; out(r) = idx(best); r += 1
    }
    out
  }

  def apply(emb: Column, superCents: Seq[Seq[Double]], cells: Seq[Seq[Double]],
            childCells: Seq[Seq[Int]], nprobe: Int, superProbe: Int): Column =
    GraftBridge.column(RoutedNearestCells(
      GraftBridge.expression(emb), superCents, cells, childCells, nprobe, superProbe))
}

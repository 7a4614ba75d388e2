package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash over PRECOMPUTED element hashes: each long in the input array
  * votes ±1 on bit positions `0 until bits`; the output sets bit i when
  * votes(i) > 0 (ties and negatives clear the bit — same rule as
  * [[SimHash64]]).
  *
  * Exists so the hash FAMILY is a caller choice: [[SimHash64]] fuses
  * xxhash64 string hashing into the vote loop (the throughput form), while
  * feeding this expression md5-derived longs (see
  * `graft.scale.Dedup.simhashMd5`) makes the signature restatable in any
  * engine with md5 + bit ops — which is what moves the SimHash queries
  * from rows-only to DuckDB-hash-checked, the same trick
  * [[graft.scale.TextAnalysis.gramHashes]] uses for winnowing. `bits` < 64
  * (60 for the md5 form: 15 hex chars) keeps the per-element hash inside a
  * signed BIGINT in engines without unsigned 64-bit literals.
  */
final case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val h = arr.getLong(k)
        var i = 0
        while (i < bits) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      k += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[$bits];
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if (!$a.isNullAt($k)) {
         |    long $h = $a.getLong($k);
         |    for (int $i = 0; $i < $bits; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ($votes[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(c: Column, bits: Int): Column =
    GraftBridge.column(SimHashBits(GraftBridge.expression(c), bits))
}

package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared shingle-hashing kernel for the fused MinHash expressions.
  *
  * The naive formulation (materialize k-word shingle STRINGS, then run
  * `numHashes` seeded string hashes over each) costs
  * O(shingles × numHashes × bytes) of string hashing plus one UTF8String
  * allocation per shingle. This kernel hashes each WORD exactly once
  * (xxhash64 over the unsafe bytes), derives each k-window shingle hash
  * with a rolling polynomial combine (FNV-64 prime), and derives the
  * `numHashes` MinHash functions from that single 64-bit shingle hash with
  * a SplitMix64-style avalanche of `h XOR seed_j` — the standard
  * "one strong hash + cheap derived family" MinHash construction
  * (Broder's original MinHash uses a universal family over one
  * fingerprint; SplitMix64 finalizer constants are from Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", as used in
  * java.util.SplittableRandom). Net cost: O(words × bytes) string hashing
  * + O(shingles × numHashes) integer mixing.
  *
  * Reference semantics mirrored from the shingle definition in
  * [[graft.scale.Dedup.shingles]]: when a document has fewer than k words
  * the single shingle is the whole word sequence. MinHash is
  * duplicate-insensitive (min over a multiset equals min over its set), so
  * no distinct pass is needed for signatures.
  */
object ShingleHashing {
  val WordSeed: Long = 42L
  val Fnv64Prime: Long = 0x100000001b3L
  val Golden: Long = 0x9e3779b97f4a7c15L

  /** SplitMix64 finalizer (public-domain constants). */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^= (z >>> 31)
    z
  }

  /** Java source of the mix64 body for codegen; `z` is a long lvalue. */
  def mix64Java(z: String): String =
    s"""$z ^= ($z >>> 30); $z *= 0xbf58476d1ce4e5b9L;
       |$z ^= ($z >>> 27); $z *= 0x94d049bb133111ebL;
       |$z ^= ($z >>> 31);""".stripMargin

  /** Hash every word once. Null elements hash to 0 (split never emits
    * null; documented for general array inputs).
    */
  def wordHashes(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        wh(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, WordSeed)
      }
      i += 1
    }
    wh
  }

  /** Rolling-combine hashes of every k-window (one window over all words
    * when there are fewer than k).
    */
  def shingleHashes(wh: Array[Long], k: Int): Array[Long] = {
    val n = wh.length
    if (n == 0) return Array.emptyLongArray
    val kk = math.min(k, n)
    val windows = n - kk + 1
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var h = Fnv64Prime
      var t = 0
      while (t < kk) { h = h * Fnv64Prime + wh(w + t); t += 1 }
      out(w) = h
      w += 1
    }
    out
  }

  /** Java codegen template computing `long[] shOut` of shingle hashes from
    * an ArrayData variable `a`. All names are caller-supplied fresh names.
    */
  def shingleHashesJava(ctx: CodegenContext, a: String, k: Int, shOut: String): String = {
    val n = ctx.freshName("n"); val wh = ctx.freshName("wh")
    val i = ctx.freshName("i"); val s = ctx.freshName("s")
    val kk = ctx.freshName("kk"); val w = ctx.freshName("w")
    val t = ctx.freshName("t"); val h = ctx.freshName("h")
    s"""
       |int $n = $a.numElements();
       |long[] $wh = new long[$n];
       |for (int $i = 0; $i < $n; $i++) {
       |  if (!$a.isNullAt($i)) {
       |    UTF8String $s = $a.getUTF8String($i);
       |    $wh[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
       |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${WordSeed}L);
       |  }
       |}
       |int $kk = java.lang.Math.min($k, $n);
       |long[] $shOut = new long[$n == 0 ? 0 : $n - $kk + 1];
       |for (int $w = 0; $w < $shOut.length; $w++) {
       |  long $h = ${Fnv64Prime}L;
       |  for (int $t = 0; $t < $kk; $t++) { $h = $h * ${Fnv64Prime}L + $wh[$w + $t]; }
       |  $shOut[$w] = $h;
       |}
     """.stripMargin
  }

  def checkWordsType(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<string>, got ${other.simpleString}")
  }
}

/** Fused words → MinHash signature (array of `numHashes` longs), entirely
  * inside whole-stage codegen. Empty word arrays yield an all-Long.MaxValue
  * signature (the empty-set minimum), so downstream band hashing stays
  * total.
  */
final case class MinHashShingles(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    ShingleHashing.checkWordsType(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    import ShingleHashing._
    val sh = shingleHashes(wordHashes(input.asInstanceOf[ArrayData]), k)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = sh(i)
      var j = 0
      while (j < numHashes) {
        val v = mix64(h ^ ((j + 1).toLong * Golden))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sh = ctx.freshName("sh"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |${ShingleHashing.shingleHashesJava(ctx, a, k, sh)}
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $sh.length; $i++) {
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = $sh[$i] ^ (((long) ($j + 1)) * ${ShingleHashing.Golden}L);
         |    ${ShingleHashing.mix64Java(v)}
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

object MinHashShingles {
  def apply(words: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashShingles(GraftBridge.expression(words), k, numHashes))
}

/** Words → SORTED DISTINCT array of 64-bit shingle hashes — the exact-
  * verification form: Jaccard over these sets equals Jaccard over the
  * shingle strings up to 64-bit hash collisions (~n²/2⁶⁵ per document
  * pair). Sorted so [[SortedIntersectSize]] can merge-scan pairs with zero
  * allocation. Computed only for candidate ids, never corpus-wide.
  */
final case class ShingleHashSet(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def checkInputDataTypes(): TypeCheckResult =
    ShingleHashing.checkWordsType(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    import ShingleHashing._
    val sh = shingleHashes(wordHashes(input.asInstanceOf[ArrayData]), k)
    java.util.Arrays.sort(sh)
    var m = 0; var i = 0
    while (i < sh.length) {
      if (m == 0 || sh(i) != sh(m - 1)) { sh(m) = sh(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sh = ctx.freshName("sh"); val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      s"""
         |${ShingleHashing.shingleHashesJava(ctx, a, k, sh)}
         |java.util.Arrays.sort($sh);
         |int $m = 0;
         |for (int $i = 0; $i < $sh.length; $i++) {
         |  if ($m == 0 || $sh[$i] != $sh[$m - 1]) { $sh[$m] = $sh[$i]; $m++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($sh, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  def apply(words: Column, k: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(words), k))
}

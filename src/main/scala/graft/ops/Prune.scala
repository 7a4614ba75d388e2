package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.SchemaOps

/** D1 `prune_data` (reference `data_structures.py:33-240`): recursively
  * remove mapping keys (by name list or predicate), remove values anywhere
  * (by list or Column predicate), optionally drop empties, with a container
  * depth limit.
  *
  * Columnar re-expression of the reference's per-record semantics:
  *  - the DataFrame row IS the root mapping (container depth 0); nested
  *    structs are nested mappings, arrays are sequences, maps are dynamic
  *    mappings;
  *  - key removal on structs/row is STATIC (schema-level drop) — the
  *    reference removes the key from each record; with a fixed schema the
  *    key is dropped for all records at plan time. Key removal inside
  *    MapType columns is runtime `map_filter` (the dynamic-keys case);
  *  - value removal / emptiness on a mapping FIELD cannot drop the field
  *    per-row under a fixed schema — the matched value becomes NULL (the
  *    columnar equivalent of an absent key). Inside arrays and maps the
  *    element/entry is genuinely removed (`filter` / `map_filter`);
  *  - a struct whose fields are ALL pruned is dropped statically (the
  *    analog of a dict emptied to `{}` removed by remove_empty — and when
  *    remove_empty=false it still cannot exist in a Spark schema; this is
  *    the one documented divergence);
  *  - depth gating mirrors `data_structures.py:125-132`: filtering allowed
  *    at depth <= maxDepth, recursion into children at depth < maxDepth;
  *  - 0 and false are never "empty" (`:91-115`).
  *
  * Everything compiles to native Catalyst expressions (`when`, `filter`,
  * `map_filter`, `transform`) — no UDFs, codegen-friendly, and nested
  * column pruning still applies to untouched branches.
  */
final case class Prune(
    keyPred: String => Boolean,
    keyLiterals: Option[Seq[String]] = None,
    valuePred: Option[Prune.ValuePred] = None,
    removeEmpty: Boolean = false,
    maxDepth: Option[Int] = None) {

  require(maxDepth.forall(_ >= 0), "max_depth cannot be negative")

  private def canFilter(d: Int): Boolean = maxDepth.forall(d <= _)
  private def canRecurse(d: Int): Boolean = maxDepth.forall(d < _)

  def apply(df: DataFrame): DataFrame = {
    // Root mapping at container depth 0.
    val kept = df.schema.fields.toSeq.flatMap { f =>
      mappingField(f, col(s"`${f.name.replace("`", "``")}`"), depth = 0)
        .map { case (c, _) => c.as(f.name) }
    }
    df.select(kept: _*)
  }

  /** One field of a mapping at container depth `d` (the mapping's own
    * depth). Returns None when statically dropped.
    */
  private def mappingField(f: StructField, c: Column, depth: Int): Option[(Column, DataType)] = {
    if (canFilter(depth) && keyPred(f.name)) return None
    val (processed, newDt) =
      if (canRecurse(depth)) processValue(f.dataType, c, depth + 1) match {
        case Some(pc) => pc
        case None => return None // nested struct emptied → static drop
      }
      else (c, f.dataType)
    // Runtime drop → NULL: remove_empty, plus value predicate for
    // primitives and mappings (sequences/sets filter their own elements —
    // reference `data_structures.py:153-158`).
    val isSeqOrMap = newDt match {
      case _: ArrayType | _: MapType => true
      case _ => false
    }
    val conds = Seq(
      if (removeEmpty) Some(SchemaOps.emptyCol(newDt, processed)) else None,
      if (!isSeqOrMap) valuePred.flatMap(p => p(newDt)).map(f => f(processed))
      else None).flatten
    // when(cond, null).otherwise(processed): a NULL predicate result (e.g.
    // a type-mismatched isin) must KEEP the value, matching the reference's
    // `x == candidate` being simply False.
    val out = conds.reduceOption(_ || _) match {
      case Some(cond) => when(cond, lit(null)).otherwise(processed)
      case None => processed
    }
    Some((out, newDt))
  }

  /** Process a container value that sits AT container depth `d`.
    * Primitives pass through. Returns None when a struct loses all fields.
    */
  private def processValue(dt: DataType, c: Column, d: Int): Option[(Column, DataType)] = dt match {
    case st: StructType =>
      val kept = st.fields.toSeq.flatMap { f =>
        mappingField(f, c.getField(f.name), d).map { case (cc, t) => (f.name, cc, t) }
      }
      if (kept.isEmpty) None
      else Some((
        struct(kept.map { case (n, cc, _) => cc.as(n) }: _*),
        StructType(kept.map { case (n, _, t) => StructField(n, t) })))

    case ArrayType(et, containsNull) =>
      // Elements processed at depth d+1 when recursion is allowed; value
      // predicate and emptiness REMOVE elements (reference `:169-190`).
      val (newEt, elemFn): (DataType, Column => Column) =
        if (canRecurse(d)) {
          processValue(et, lit(null).cast(et), d + 1) match {
            case None => return None // element structs emptied → drop array
            case Some((_, t)) => (t, (x: Column) => processValue(et, x, d + 1).get._1)
          }
        } else (et, identity[Column] _)
      val mapped =
        if (canRecurse(d) && needsRewrite(et)) transform(c, x => elemFn(x)) else c
      val dropElem: Option[Column => Column] = {
        val fns = Seq(
          if (removeEmpty) Some((x: Column) => SchemaOps.emptyCol(newEt, x)) else None,
          valuePred.flatMap(p => p(newEt))).flatten
        if (fns.isEmpty) None
        // NULL predicate result keeps the element (reference: == is False).
        else Some((x: Column) => coalesce(fns.map(f => f(x)).reduce(_ || _), lit(false)))
      }
      val filtered = dropElem match {
        case Some(p) => filter(mapped, x => !p(x))
        case None => mapped
      }
      Some((filtered, ArrayType(newEt, containsNull)))

    case MapType(kt, vt, valueContainsNull) =>
      // Dynamic-keys mapping: key filtering is runtime, via the literal key
      // list when one was provided (a driver fn can't run on executors
      // without a UDF — the literal list is the codegen-friendly path).
      var cur = c
      if (canFilter(d)) keyLiterals.filter(_.nonEmpty).foreach { lits =>
        cur = map_filter(cur, (k, _) => !k.isin(lits.map(l => lit(l)): _*))
      }
      val (newVt, mapped) =
        if (canRecurse(d) && needsRewrite(vt)) {
          processValue(vt, lit(null).cast(vt), d + 1) match {
            case None => return None
            case Some((_, t)) =>
              (t, transform_values(cur, (_, v) => processValue(vt, v, d + 1).get._1))
          }
        } else (vt, cur)
      val conds = Seq(
        if (removeEmpty) Some((v: Column) => SchemaOps.emptyCol(newVt, v)) else None,
        valuePred.flatMap(p => p(newVt))).flatten
      val filtered =
        if (conds.isEmpty) mapped
        else map_filter(mapped,
          (_, v) => !coalesce(conds.map(f => f(v)).reduce(_ || _), lit(false)))
      Some((filtered, MapType(kt, newVt, valueContainsNull)))

    case other => Some((c, other))
  }

  /** Whether processing can change values of this type at depth below —
    * avoids emitting no-op `transform`s over primitive arrays.
    */
  private def needsRewrite(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }
}

object Prune {
  /** Type-dispatched value predicate: given the (post-pruning) type of a
    * value, return the removal condition builder, or None when the
    * predicate cannot apply to that type — the analog of the reference's
    * `x == candidate` simply being False across types, which in Catalyst
    * would otherwise be an analysis-time type error.
    */
  type ValuePred = DataType => Option[Column => Column]

  /** Reference-style construction from plain lists (`prune_data(data, keys,
    * values, remove_empty, max_depth)`); Column-predicate forms are the
    * first-class "callable" analog (`data_structures.py:73-85`).
    */
  def byNames(
      keysToRemove: Seq[String] = Nil,
      valuesToRemove: Seq[Any] = Nil,
      removeEmpty: Boolean = false,
      maxDepth: Option[Int] = None): Prune = {
    val keySet = keysToRemove.toSet
    // Python `==` across types is just False; Catalyst coerces (and under
    // ANSI, throws) — so only literals type-compatible with the value's
    // type participate in the isin.
    def compatible(dt: DataType, v: Any): Boolean = dt match {
      case StringType => v.isInstanceOf[String]
      case _: NumericType => v match {
        case _: Int | _: Long | _: Double | _: Float | _: Short | _: Byte => true
        case _: java.math.BigDecimal | _: BigDecimal => true
        case _ => false
      }
      case BooleanType => v.isInstanceOf[Boolean]
      case _ => false
    }
    val vp: Option[ValuePred] =
      if (valuesToRemove.isEmpty) None
      else Some({ dt =>
        val lits = valuesToRemove.filter(v => compatible(dt, v))
        if (lits.isEmpty) None
        else Some((c: Column) => c.isin(lits.map(v => lit(v)): _*))
      })
    Prune(
      keyPred = keySet.contains,
      keyLiterals = Some(keysToRemove),
      valuePred = vp,
      removeEmpty = removeEmpty,
      maxDepth = maxDepth)
  }
}

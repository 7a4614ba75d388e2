package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** D6 `flatten_dict` (reference `data_structures.py:1477-1577`): collapse
  * nested structs into `parent__child` columns ("BQ-safe" `__` separator).
  *
  * Reference semantics kept:
  *  - arrays/maps/primitives pass through un-descended (`:1487-1491`);
  *  - `keysToFlat` whitelist / `keysToSkip` blacklist matched at any level,
  *    skip wins (`:1560-1565`);
  *  - `maxDepth` levels of collapse (0 = no flattening);
  *  - `keepOriginal` also keeps the nested value, written AFTER its flat
  *    paths so it wins collisions (`:1521-1523,1571-1572`);
  *  - empty structs pass through (nothing to flatten, `:1520`);
  *  - collisions resolve last-write-wins at each level (LinkedHashMap
  *    update keeps first insertion position, like a Python dict).
  *
  * Spark shape: pure select-list recursion over `df.schema` on the driver —
  * Catalyst column pruning works through the aliases for free, so reading
  * two flattened columns of a 300-field struct still prunes the parquet
  * scan to those two leaves.
  */
final case class Flatten(
    sep: String = "__",
    keysToFlat: Option[Set[String]] = None,
    keysToSkip: Set[String] = Set.empty,
    maxDepth: Option[Int] = None,
    keepOriginal: Boolean = false) {

  require(maxDepth.forall(_ >= 0), "max_depth cannot be negative")

  def apply(df: DataFrame): DataFrame = {
    val out = flat(df.schema, n => col(quote(n)), maxDepth)
    df.select(out.map { case (n, c) => c.as(n) }.toSeq: _*)
  }

  private def quote(n: String): String = s"`${n.replace("`", "``")}`"

  private def eligible(name: String, dt: org.apache.spark.sql.types.DataType,
                       remaining: Option[Int]): Boolean = dt match {
    case s: StructType =>
      s.fields.nonEmpty &&
        !keysToSkip.contains(name) &&
        keysToFlat.forall(_.contains(name)) &&
        remaining.forall(_ > 0)
    case _ => false
  }

  private def flat(st: StructType, access: String => Column,
                   remaining: Option[Int]): mutable.LinkedHashMap[String, Column] = {
    val res = mutable.LinkedHashMap[String, Column]()
    st.fields.foreach { f =>
      val v = access(f.name)
      if (eligible(f.name, f.dataType, remaining)) {
        val s = f.dataType.asInstanceOf[StructType]
        flat(s, n => v.getField(n), remaining.map(_ - 1)).foreach {
          case (nk, nv) => res(s"${f.name}$sep$nk") = nv
        }
        if (keepOriginal) res(f.name) = v
      } else res(f.name) = v
    }
    res
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** D3 `move_unknown_keys_to_extra` (reference `data_structures.py:655-824`):
  * whitelist filter guaranteeing a STABLE SCHEMA regardless of which fields
  * arrive — the ETL-load contract operator.
  *
  * Columnar mapping:
  *  - kept columns = whitelist ∩ schema; everything else moves into a
  *    struct column `extraKey` (fields sorted lexicographically, like the
  *    reference's sorted extra dict). `extraKey = None` discards extras;
  *  - `fillMissing` adds absent whitelist keys as typed NULLs (StringType
  *    by default — parquet cannot store NullType);
  *  - `preserveOrder` = whitelist order then renamed collisions then extra
  *    last; default = lexicographic output order (`:806-818`);
  *  - an input column colliding with `extraKey` is renamed
  *    `{extraKey}_original`, cascading `_original2`… (`:753-778`);
  *  - moved keys are reported by `movedKeys(df)` — a pure schema diff on
  *    the driver (the reference returns them as the second tuple element);
  *  - Python's `1` vs `"1"` str()-collision suffixing has no analog: Spark
  *    column names are always strings (SURVEY.md §1.3, documented drop).
  *
  * Scale note: this is a select list — zero runtime cost beyond the struct
  * assembly, no shuffle, column pruning intact.
  */
final case class MoveUnknown(
    allowedKeys: Seq[String],
    extraKey: Option[String] = Some("extra_collected"),
    alwaysAddExtra: Boolean = false,
    preserveOrder: Boolean = false,
    fillMissing: Boolean = false) {

  private val allowedOrdered: Seq[String] = allowedKeys.distinct
  private val allowedSet: Set[String] = allowedOrdered.toSet

  def apply(df: DataFrame): DataFrame = plan(df)._1

  /** The moved (final) key names, sorted — the reference's second return. */
  def movedKeys(df: DataFrame): Seq[String] = plan(df)._2

  def plan(df: DataFrame): (DataFrame, Seq[String]) = {
    val inNames = df.schema.fieldNames.toSeq
    def q(n: String): Column = col(s"`${n.replace("`", "``")}`")

    // extra_key collision: rename input columns named extraKey (and any
    // {extraKey}_original* cascade) — renamed keys stay top-level.
    val taken = scala.collection.mutable.Set[String](inNames: _*)
    val renames = scala.collection.mutable.LinkedHashMap[String, String]()
    extraKey.foreach { ek =>
      def freeName(base: String): String = {
        if (!taken.contains(base)) base
        else {
          var i = 2
          while (taken.contains(s"$base$i")) i += 1
          s"$base$i"
        }
      }
      inNames.filter(n => n == ek || n.startsWith(s"${ek}_original")).foreach { n =>
        val target = if (n == ek) freeName(s"${ek}_original") else freeName(n)
        taken -= n; taken += target
        renames(n) = target
      }
    }

    val finalNames = inNames.map(n => renames.getOrElse(n, n))
    val renamedSet = renames.values.toSet
    val keptPresent = finalNames.filter(n => allowedSet.contains(n) || renamedSet.contains(n))
    val moved = finalNames.filterNot(n => allowedSet.contains(n) || renamedSet.contains(n))

    val keptCols = scala.collection.mutable.LinkedHashMap[String, Column]()
    inNames.foreach { n =>
      val fn = renames.getOrElse(n, n)
      if (allowedSet.contains(fn) || renamedSet.contains(fn)) keptCols(fn) = q(n)
    }
    if (fillMissing) allowedOrdered.foreach { k =>
      if (!keptCols.contains(k)) keptCols(k) = lit(null).cast(StringType)
    }
    val extraCol: Option[(String, Column)] = extraKey.flatMap { ek =>
      if (moved.nonEmpty || alwaysAddExtra) {
        val fields = moved.sorted.map { fn =>
          val orig = inNames(finalNames.indexOf(fn))
          q(orig).as(fn)
        }
        Some(ek -> (if (fields.nonEmpty) struct(fields: _*) else struct(lit(null).cast(StringType).as("_empty"))))
      } else None
    }

    val ordered: Seq[(String, Column)] = {
      val base = keptCols.toSeq
      if (preserveOrder) {
        val wl = allowedOrdered.filter(keptCols.contains).map(k => k -> keptCols(k))
        val rest = base.filterNot { case (n, _) => allowedOrdered.contains(n) }
        wl ++ rest ++ extraCol.toSeq
      } else {
        (base ++ extraCol.toSeq).sortBy(_._1)
      }
    }
    (df.select(ordered.map { case (n, c) => c.as(n) }: _*), moved.sorted)
  }
}

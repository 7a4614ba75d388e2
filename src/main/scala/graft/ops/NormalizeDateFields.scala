package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, struct, transform}
import org.apache.spark.sql.types._

/** D7 `normalize_date_fields` (reference `data_structures.py:1597-1761`):
  * rule-driven rename + convert of date/datetime fields.
  *
  * Each rule matches a field NAME by exactly one of suffix/prefix/equals
  * (string or list) or regex, renames to `"{target}_{base}"` with the
  * matched part stripped (empty base → full original key), and converts the
  * value with the D4 `ConvertKernel` vocabulary. First matching rule wins;
  * unmatched fields pass through; `keepOriginal` writes the original BEFORE
  * the renamed field so the renamed entry wins collisions (last-write-wins
  * via LinkedHashMap, like a Python dict).
  *
  * The whole rule engine runs on the driver against schema metadata — the
  * emitted plan is a plain select list of native expressions.
  */
final case class DateFieldRule(
    suffix: Seq[String] = Nil,
    prefix: Seq[String] = Nil,
    equalsTo: Seq[String] = Nil,
    regex: Option[String] = None,
    convert: ConvertType.CT,
    target: String,
    stripMatch: Boolean = true) {

  private val matchers =
    Seq(suffix.nonEmpty, prefix.nonEmpty, equalsTo.nonEmpty, regex.nonEmpty).count(identity)
  require(matchers == 1, "rule must have exactly one of suffix/prefix/equals/regex")

  private lazy val compiledRe = regex.map(_.r)

  /** Returns the new field name on match (reference `:1699-1741`). */
  def rename(key: String): Option[String] = {
    def finish(base: String): String = {
      val b = if (base.isEmpty) key else base
      s"${target}_$b"
    }
    if (regex.nonEmpty) {
      compiledRe.get.findFirstMatchIn(key).map { m =>
        finish(if (stripMatch) key.substring(0, m.start) + key.substring(m.end) else key)
      }
    } else if (suffix.nonEmpty) {
      suffix.collectFirst { case p if key.endsWith(p) =>
        finish(if (stripMatch && p.nonEmpty) key.dropRight(p.length) else key)
      }
    } else if (prefix.nonEmpty) {
      prefix.collectFirst { case p if key.startsWith(p) =>
        finish(if (stripMatch) key.drop(p.length) else key)
      }
    } else {
      equalsTo.collectFirst { case p if key == p =>
        finish(if (stripMatch) "" else key)
      }
    }
  }
}

final case class NormalizeDateFields(
    rules: Seq[DateFieldRule],
    recursive: Boolean = false,
    strict: Boolean = false,
    keepOriginal: Boolean = false,
    datetimeFormats: Seq[String] =
      Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd")) {

  def apply(df: DataFrame): DataFrame = {
    val out = walk(df.schema, n => col(s"`${n.replace("`", "``")}`"))
    df.select(out.map { case (n, c) => c.as(n) }.toSeq: _*)
  }

  /** Mirror of the reference `_walk` (`:1667-1676`): recursion into nested
    * dicts (structs) only — array items are NOT descended into.
    */
  private def walk(st: StructType, access: String => Column): mutable.LinkedHashMap[String, Column] = {
    val res = mutable.LinkedHashMap[String, Column]()
    st.fields.foreach { f =>
      val raw = access(f.name)
      val v = f.dataType match {
        case inner: StructType if recursive =>
          val m = walk(inner, n => raw.getField(n))
          struct(m.map { case (n, c) => c.as(n) }.toSeq: _*)
        case _ => raw
      }
      applyRules(f.name, f.dataType) match {
        case Some((newName, rule)) =>
          val conv = ConvertKernel.convert(
            f.dataType, v, rule.convert, strict, emptyStringToNone = false,
            datetimeFormats)
          if (keepOriginal && newName != f.name) res(f.name) = v
          res(newName) = if (isContainer(f.dataType)) v else conv
        case None => res(f.name) = v
      }
    }
    res
  }

  /** First matching rule wins (`:1753-1761`). */
  private def applyRules(name: String, dt: DataType): Option[(String, DateFieldRule)] =
    rules.iterator.flatMap(r => r.rename(name).map(n => (n, r))).nextOption()

  private def isContainer(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }
}

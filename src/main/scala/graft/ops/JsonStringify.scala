package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D8 `convert_to_json_string` (reference `data_structures.py:1764-1826`):
  * NULL-preserving, idempotent stringification for columnar export
  * (BigQuery/Parquet/CSV string columns).
  *
  * Type-dispatched on the schema (the reference dispatches on the runtime
  * value; a column's type is static here):
  *  - NULL → NULL (natively);
  *  - string → unchanged (idempotence is free — the schema knows);
  *  - struct/array/map → `to_json` (compact separators like
  *    `json.dumps(..., separators=(',', ':'))`-ish reference output);
  *  - bool → JSON literals `true`/`false` (json.dumps parity);
  *  - date/timestamp → double-quoted ISO string — `json.dumps(v,
  *    default=str)` quotes non-JSON types (`:1817-1824`);
  *  - numerics → plain string form.
  *
  * Optional `keys` whitelist limits which columns are stringified.
  */
final case class JsonStringify(keys: Option[Seq[String]] = None) {

  private val keySet = keys.map(_.toSet)

  def apply(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(s"`${f.name.replace("`", "``")}`")
      val out =
        if (keySet.forall(_.contains(f.name))) stringify(f.dataType, c)
        else c
      out.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  def stringify(dt: DataType, c: Column): Column = dt match {
    case StringType => c
    case _: StructType | _: ArrayType | _: MapType => to_json(c)
    case BooleanType => when(c.isNull, lit(null)).when(c, lit("true")).otherwise(lit("false"))
    case DateType =>
      when(c.isNull, lit(null))
        .otherwise(concat(lit("\""), date_format(c, "yyyy-MM-dd"), lit("\"")))
    case TimestampType =>
      when(c.isNull, lit(null))
        .otherwise(concat(lit("\""), date_format(c, "yyyy-MM-dd HH:mm:ss"), lit("\"")))
    case _ => c.cast(StringType)
  }
}

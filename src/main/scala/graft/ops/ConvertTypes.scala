package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D4 `convert_dict_types` (reference `data_structures.py:936-1180`): apply
  * a name→type schema of conversions, optionally recursing into nested
  * structs and arrays.
  *
  * The 11-type vocabulary matches the reference `ConvertType` enum. Columnar
  * divergences (documented, deliberate):
  *  - lenient ("strict=false") failures yield NULL, not the original value —
  *    a Spark column has one type, so "keep the unconvertible string in an
  *    int column" cannot exist. The oracle semantics stay checkable because
  *    NULL marks exactly the rows the reference would have left unconverted;
  *  - unix-timestamp renderings use the session timezone (pinned UTC), not
  *    the reference's accidental local TZ (`datetime.fromtimestamp`,
  *    SURVEY.md §7.4);
  *  - datetime format strings are Spark patterns ("yyyy-MM-dd HH:mm:ss"),
  *    not strptime.
  *
  * All conversions are native Catalyst expressions: regex-guarded casts
  * (guards keep ANSI mode from throwing on rows the reference converts
  * leniently), `timestamp_seconds`, `date_format`, `try_to_timestamp`.
  * Strict mode raises via `raise_error` on exactly the rows the reference
  * would raise on.
  */
object ConvertType {
  sealed abstract class CT(val name: String)
  case object ToInt extends CT("int")
  case object ToFloat extends CT("float")
  case object ToBool extends CT("bool")
  case object ToStr extends CT("str")
  case object ToDate extends CT("date")
  case object ToDatetime extends CT("datetime")
  case object ToTimestamp extends CT("timestamp")
  case object TsToIso extends CT("timestamp_to_iso")
  case object TsToIsoDate extends CT("timestamp_to_iso_date")
  case object TsToIsoYm extends CT("timestamp_to_iso_YYYY-MM")
  case object TsToIsoY extends CT("timestamp_to_iso_YYYY")

  val all: Seq[CT] = Seq(ToInt, ToFloat, ToBool, ToStr, ToDate, ToDatetime,
    ToTimestamp, TsToIso, TsToIsoDate, TsToIsoYm, TsToIsoY)

  def parse(s: String): CT =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown convert type: $s"))
}

final case class ConvertTypes(
    typeSchema: Map[String, ConvertType.CT],
    recursive: Boolean = false,
    strict: Boolean = false,
    emptyStringToNone: Boolean = false,
    datetimeFormats: Seq[String] =
      Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd")) {

  import ConvertType._

  def apply(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      fieldCol(f, col(s"`${f.name.replace("`", "``")}`"), top = true).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  private def fieldCol(f: StructField, c: Column, top: Boolean): Column =
    f.dataType match {
      case st: StructType if recursive =>
        struct(st.fields.map(cf => fieldCol(cf, c.getField(cf.name), top = false).as(cf.name)).toSeq: _*)
      case ArrayType(et: StructType, _) if recursive =>
        transform(c, x =>
          struct(et.fields.map(cf => fieldCol(cf, x.getField(cf.name), top = false).as(cf.name)).toSeq: _*))
      case dt =>
        typeSchema.get(f.name) match {
          case Some(t) => ConvertKernel.convert(dt, c, t, strict, emptyStringToNone, datetimeFormats)
          case None => c
        }
    }
}

/** Shared value-conversion expression builder (also used by D7
  * `normalize_date_fields`). Mirrors `_convert_value`
  * (`data_structures.py:1066-1180`).
  */
object ConvertKernel {
  import ConvertType._

  // Reference accepts digit strings with one optional dot and a leading
  // minus ("3.14" → 3 via float; "1e5" is NOT accepted — int(value) raises).
  private val IntRe = "^-?[0-9]+(\\.[0-9]+)?$"
  private val FloatRe = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  def resultType(src: DataType, t: CT): DataType = t match {
    case ToInt => LongType
    case ToFloat => DoubleType
    case ToBool => BooleanType
    case ToStr => StringType
    case ToDate => if (src == StringType) DateType else src
    case ToDatetime => if (src == StringType) TimestampType else src
    case ToTimestamp => TimestampType
    case TsToIso | TsToIsoDate | TsToIsoYm | TsToIsoY => StringType
  }

  /** Build the converted column. NULL in → NULL out; '' handled per
    * emptyStringToNone before conversion (reference `:1076-1083`).
    */
  def convert(src: DataType, c: Column, t: CT, strict: Boolean,
              emptyStringToNone: Boolean, fmts: Seq[String]): Column = {
    val converted = body(src, c, t, strict, fmts)
    if (src == StringType) {
      // '' short-circuits: → NULL when emptyStringToNone, else stays
      // unconverted (NULL in a non-string result column; '' when result
      // is a string).
      val onEmpty: Column =
        if (emptyStringToNone) lit(null)
        else if (resultType(src, t) == StringType) lit("")
        else lit(null)
      when(c.isNull, lit(null)).when(c === "", onEmpty).otherwise(converted)
    } else converted
  }

  private def fail(c: Column, t: CT): Column =
    raise_error(concat(lit(s"Unable to convert to ${t.name}: "), c.cast(StringType)))

  private def lenientOr(strict: Boolean, c: Column, t: CT): Column =
    if (strict) fail(c, t) else lit(null)

  private def unixSeconds(src: DataType, c: Column, t: CT, strict: Boolean): Column = src match {
    case StringType =>
      when(c.rlike(FloatRe), timestamp_seconds(c.cast(DoubleType)))
        .otherwise(lenientOr(strict, c, t))
    case _: NumericType => timestamp_seconds(c)
    case _ => lit(null) // reference returns value unchanged; type mismatch → NULL
  }

  private def body(src: DataType, c: Column, t: CT, strict: Boolean, fmts: Seq[String]): Column =
    t match {
      case ToInt => src match {
        case BooleanType => c.cast(LongType)
        case _: NumericType => c.cast(LongType)
        case StringType =>
          // int(float(x)) truncates toward zero; Spark double→long cast too.
          when(c.rlike(IntRe), c.cast(DoubleType).cast(LongType))
            .otherwise(lenientOr(strict, c, t))
        case _ => c // unsupported source passes through (reference lenient path)
      }

      case ToFloat => src match {
        case BooleanType | _: NumericType => c.cast(DoubleType)
        case StringType =>
          when(c.rlike(FloatRe), c.cast(DoubleType)).otherwise(lenientOr(strict, c, t))
        case _ => c
      }

      case ToBool => src match {
        case StringType => lower(c).isin("true", "1", "yes", "on") // any other string → false
        case BooleanType => c
        case _: NumericType => c =!= lit(0).cast(src)
        case _ => c
      }

      case ToStr => src match {
        case StringType => c
        case _: StructType | _: ArrayType | _: MapType => to_json(c)
        case BooleanType =>
          // Python str(True) == "True"
          when(c, lit("True")).otherwise(lit("False"))
        case _ => c.cast(StringType)
      }

      case ToDate => src match {
        case StringType =>
          val parsed = try_to_date(c, "yyyy-MM-dd")
          if (strict) coalesce(parsed, fail(c, t)) else parsed
        case _ => c // non-strings pass through
      }

      case ToDatetime => src match {
        case StringType =>
          val tried = coalesce(fmts.map(f => try_to_timestamp(c, lit(f))): _*)
          if (strict) coalesce(tried, fail(c, t)) else tried
        case _ => c
      }

      case ToTimestamp => unixSeconds(src, c, t, strict)
      case TsToIso =>
        date_format(unixSeconds(src, c, t, strict), "yyyy-MM-dd'T'HH:mm:ss")
      case TsToIsoDate => date_format(unixSeconds(src, c, t, strict), "yyyy-MM-dd")
      case TsToIsoYm => date_format(unixSeconds(src, c, t, strict), "yyyy-MM")
      case TsToIsoY => date_format(unixSeconds(src, c, t, strict), "yyyy")
    }
}

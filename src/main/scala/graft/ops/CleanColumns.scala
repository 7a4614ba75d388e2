package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D5 `clean_dict` (reference `data_structures.py:1204-1474`): recursive
  * PII scrubbing of listed field names at any depth.
  *
  * Modes (reference parity where the type system allows):
  *  - `Replace`: literal `"replaced (etl)"` — cleaned column becomes STRING;
  *  - `Hash`: SHA-256 hex of the value bytes (`sha2`; strings hash their
  *    UTF-8 bytes — exact reference parity; non-strings hash their string
  *    rendering, the analog of Python `repr`) — STRING;
  *  - `FarmFingerprint`: bit-exact FarmHash Fingerprint64 via the custom
  *    codegen'd Catalyst expression [[graft.expr.FarmFingerprint64]]
  *    (reference parity; string rendering uses the unsigned decimal form);
  *  - `Empty`: NULL, original type kept;
  *  - `Delete`: static field drop (a fixed schema cannot drop per-row; with
  *    skip rules the value is kept where skipped, NULLed elsewhere).
  *
  * Skip rules per key: suffix (bare string or rule), prefix, equals, regex
  * (`rlike` search), or a Column predicate (the `callable` analog). A rule
  * matching KEEPS the original value. Empty values (NULL/''/empty
  * container) under targeted keys are never cleaned (`:1301-1303`).
  *
  * `truncateStrings` caps ALL string values anywhere (post-cleaning
  * included) at N chars + `"… truncated (etl)"` (`:1268-1271`).
  *
  * Everything is native Catalyst (`sha2`, `xxhash64`, `when`, `substring`,
  * `transform`) — whole-stage-codegen friendly, no UDFs.
  */
object CleanColumns {
  sealed trait Mode
  case object Replace extends Mode
  case object Hash extends Mode
  case object FarmFingerprint extends Mode
  case object Empty extends Mode
  case object Delete extends Mode

  sealed trait SkipRule { def pred(dt: DataType, c: Column): Column }
  /** Bare-string rule = suffix (reference `:1397-1403`). */
  final case class Suffix(s: String) extends SkipRule {
    def pred(dt: DataType, c: Column): Column =
      if (dt == StringType) c.isNotNull && c.endsWith(s) else lit(false)
  }
  final case class Prefix(s: String) extends SkipRule {
    def pred(dt: DataType, c: Column): Column =
      if (dt == StringType) c.isNotNull && c.startsWith(s) else lit(false)
  }
  final case class Equals(v: Any) extends SkipRule {
    def pred(dt: DataType, c: Column): Column = {
      val compat = dt match {
        case StringType => v.isInstanceOf[String]
        case _: NumericType => v.isInstanceOf[Number]
        case BooleanType => v.isInstanceOf[Boolean]
        case _ => false
      }
      if (compat) c <=> lit(v) else lit(false)
    }
  }
  final case class Regex(pattern: String) extends SkipRule {
    def pred(dt: DataType, c: Column): Column =
      if (dt == StringType) c.isNotNull && c.rlike(pattern) else lit(false)
  }
  /** Column-predicate rule — the reference's `callable` spec. */
  final case class Pred(f: Column => Column) extends SkipRule {
    def pred(dt: DataType, c: Column): Column = coalesce(f(c), lit(false))
  }
}

final case class CleanColumns(
    keysToClean: Seq[String],
    mode: CleanColumns.Mode,
    skipRules: Map[String, Seq[CleanColumns.SkipRule]] = Map.empty,
    truncateStrings: Option[Int] = None,
    replacementMarker: String = "replaced (etl)",
    truncationSuffix: String = "… truncated (etl)") {

  import CleanColumns._

  private val keySet = keysToClean.toSet
  private val truncLimit = truncateStrings.filter(_ > 0)

  def apply(df: DataFrame): DataFrame = {
    val kept = df.schema.fields.toSeq.flatMap { f =>
      field(f, col(s"`${f.name.replace("`", "``")}`")).map { case (c, _) => c.as(f.name) }
    }
    df.select(kept: _*)
  }

  /** Truncation applies to every string everywhere (`:1268-1282`). */
  private def truncate(c: Column): Column = truncLimit match {
    case Some(n) =>
      when(c.isNotNull && length(c) > n,
        concat(substring(c, 1, n), lit(truncationSuffix))).otherwise(c)
    case None => c
  }

  /** Recursive container processing for NON-targeted values. */
  private def processContainer(dt: DataType, c: Column): (Column, DataType) = dt match {
    case st: StructType =>
      val kept = st.fields.toSeq.flatMap { f =>
        field(f, c.getField(f.name)).map { case (cc, t) => (f.name, cc, t) }
      }
      (struct(kept.map { case (n, cc, _) => cc.as(n) }: _*),
        StructType(kept.map { case (n, _, t) => StructField(n, t) }))
    case ArrayType(et, n) =>
      val (_, newEt) = processContainer(et, lit(null).cast(et))
      val needs = et match {
        case _: StructType | _: ArrayType | _: MapType => true
        case StringType => truncLimit.nonEmpty
        case _ => false
      }
      if (needs) (transform(c, x => processContainer(et, x)._1), ArrayType(newEt, n))
      else (c, ArrayType(et, n))
    case MapType(kt, vt, n) =>
      val needs = vt match {
        case _: StructType | _: ArrayType | _: MapType => true
        case StringType => truncLimit.nonEmpty
        case _ => false
      }
      val (_, newVt) = processContainer(vt, lit(null).cast(vt))
      if (needs) (transform_values(c, (_, v) => processContainer(vt, v)._1), MapType(kt, newVt, n))
      else (c, MapType(kt, vt, n))
    case StringType => (truncate(c), StringType)
    case other => (c, other)
  }

  /** One struct/row field: clean if targeted, else recurse. None = dropped. */
  private def field(f: StructField, c: Column): Option[(Column, DataType)] = {
    if (!keySet.contains(f.name)) return Some(processContainer(f.dataType, c))
    val skips = skipRules.getOrElse(f.name, Nil)
    val skipCond = skips.map(_.pred(f.dataType, c)).reduceOption(_ || _)
    val emptyCond = graft.schema.SchemaOps.emptyCol(f.dataType, c)
    val keepCond = skipCond.map(emptyCond || _).getOrElse(emptyCond)
    // The kept branch still gets container/truncation processing.
    val (keptProcessed, keptDt) = processContainer(f.dataType, c)

    mode match {
      case Delete =>
        // No skip rules → every non-empty value would be deleted; with a
        // fixed schema that's a static drop. With skip rules, kept-where-
        // skipped / NULL elsewhere is the closest columnar form.
        if (skips.isEmpty) None
        else Some((when(keepCond, keptProcessed).otherwise(lit(null)), keptDt))
      case Empty =>
        Some((when(keepCond, keptProcessed).otherwise(lit(null)), keptDt))
      case Replace =>
        val marker = truncate(lit(replacementMarker))
        Some((when(keepCond, toStringForm(keptDt, keptProcessed)).otherwise(marker), StringType))
      case Hash =>
        val hashed = truncate(sha2(toBytes(f.dataType, c), 256))
        Some((when(keepCond, toStringForm(keptDt, keptProcessed)).otherwise(hashed), StringType))
      case FarmFingerprint =>
        val fp = graft.expr.FarmFingerprint64(toBytes(f.dataType, c))
        f.dataType match {
          case LongType =>
            // two's-complement bits of the unsigned fingerprint
            Some((when(keepCond, keptProcessed).otherwise(fp), LongType))
          case _ =>
            // unsigned decimal rendering, matching Python's arbitrary-
            // precision int from farmhash Fingerprint64
            val unsignedStr = conv(hex(fp), 16, 10)
            Some((when(keepCond, toStringForm(keptDt, keptProcessed))
              .otherwise(unsignedStr), StringType))
        }
    }
  }

  /** `_value_to_bytes` (`:1336-1341`): strings → UTF-8 bytes (exact
    * parity); everything else hashes its string rendering.
    */
  private def toBytes(dt: DataType, c: Column): Column = dt match {
    case BinaryType => c
    case StringType => c.cast(BinaryType)
    case BooleanType => when(c, lit("True")).otherwise(lit("False")).cast(BinaryType)
    case _: StructType | _: ArrayType | _: MapType => to_json(c).cast(BinaryType)
    case _ => c.cast(StringType).cast(BinaryType)
  }

  /** Render a kept value into the STRING result column of replace/hash
    * modes (mixed skip-kept + cleaned values must share one type —
    * documented columnar divergence).
    */
  private def toStringForm(dt: DataType, c: Column): Column = dt match {
    case StringType => c
    case _: StructType | _: ArrayType | _: MapType => to_json(c)
    case BooleanType => when(c, lit("True")).otherwise(lit("False"))
    case _ => c.cast(StringType)
  }
}

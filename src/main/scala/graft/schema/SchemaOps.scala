package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared driver-side schema utilities for the record-shape operators
  * (prune/flatten/whitelist/cast/scrub — reference `data_structures.py`).
  *
  * The reference operates on one nested Python record at a time; here the
  * record shape is the DataFrame schema, so every "recursive dict walk"
  * becomes a driver-side `StructType` recursion that emits ONE nested
  * Catalyst expression tree evaluated per row by Tungsten. No UDFs — the
  * emitted expressions stay inside whole-stage codegen, and Catalyst's
  * nested-schema pruning sees through them.
  *
  * Scale note (100 TB): all recursion happens once on the driver against
  * schema metadata (KBs); executors only ever evaluate the compiled
  * expressions. Cost is O(#fields) at plan time, zero extra shuffles.
  */
object SchemaOps {

  /** Reference emptiness (`data_structures.py:91-115`): None, empty string,
    * empty container. 0 and false are NOT empty. Structs cannot be emptied
    * per-row in a fixed schema — a struct that loses all fields is dropped
    * statically by the caller; a NULL struct is "None" and thus empty.
    */
  def emptyCol(dt: DataType, c: Column): Column = dt match {
    case StringType => c.isNull || length(c) === 0
    case BinaryType => c.isNull || length(c) === 0
    case _: ArrayType | _: MapType => c.isNull || size(c) === 0
    case _ => c.isNull
  }

  /** All leaf paths of a schema as (dot-path, segments, leaf type). Arrays
    * and maps are treated as leaves (reference `flatten_dict` does not
    * descend into sequences — `data_structures.py:1487-1491`).
    */
  def leafPaths(schema: StructType): Seq[(String, Seq[String], DataType)] = {
    def rec(st: StructType, prefix: Seq[String]): Seq[(String, Seq[String], DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case s: StructType if s.fields.nonEmpty => rec(s, p)
          case dt => Seq((p.mkString("."), p, dt))
        }
      }
    rec(schema, Nil)
  }

  /** Rebuild a struct column from per-field replacement columns; `None`
    * drops the field. Returns `None` when every field was dropped (the
    * static analog of a dict pruned to `{}`).
    */
  def rebuildStruct(fields: Seq[(String, Option[Column])]): Option[Column] = {
    val kept = fields.collect { case (n, Some(c)) => c.as(n) }
    if (kept.isEmpty) None else Some(struct(kept: _*))
  }
}

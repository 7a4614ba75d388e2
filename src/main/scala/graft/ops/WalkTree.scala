package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** D2 `walk` (reference `data_structures.py:243-652`): traverse nested data,
  * render an ASCII tree (`├─`/`└─` connectors, `[dict len=n]` tags), and
  * return a processed copy with depth/item limits applied.
  *
  * This is a DRIVER-SIDE debug/observability utility (the reference prints
  * one record); the Spark entry points are:
  *  - `Walk.fromRow(row, schema)` — convert one collected Row into the
  *    nested dynamic form and walk it;
  *  - `walk.lines(item)` / `walk.collect(item)` — render / apply limits.
  *
  * Dynamic values mirror the reference's four shapes: `ListMap[String, Any]`
  * (mapping, insertion-ordered), `Seq[Any]` (sequence), `Set[Any]` (set),
  * primitives (`Long`/`Double`/`Boolean`/`String`/null).
  */
final case class Walk(
    showTypes: Boolean = false,
    quoteStrings: Boolean = false,
    maxDepth: Option[Int] = None,
    maxItemsPerContainer: Option[Int] = None,
    truncateValueLen: Option[Int] = None,
    sortKeys: Boolean = true,
    setOrderStable: Boolean = false,
    showLengths: Boolean = false) {

  /** Processed copy with limits applied (`_collect_data`, `:360-466`). */
  def collect(obj: Any, depth: Int = 0): Any = obj match {
    case _ if maxDepth.exists(depth >= _) => obj match {
      case _: collection.Map[_, _] => ListMap.empty[String, Any]
      case _: collection.Set[_] => Set.empty[Any]
      case _: collection.Seq[_] => Seq.empty[Any]
      case p => p
    }
    case m: collection.Map[_, _] =>
      ListMap(children(m).map { case (l, v) => l -> collectChild(v, depth) }: _*)
    case s: collection.Set[_] => children(s).map { case (_, v) => collectChild(v, depth) }.toSet
    case s: collection.Seq[_] => children(s).map { case (_, v) => collectChild(v, depth) }.toSeq
    case p => p
  }

  private def collectChild(v: Any, depth: Int): Any = v match {
    case _: collection.Map[_, _] | _: collection.Seq[_] | _: collection.Set[_] => collect(v, depth + 1)
    case p => p
  }

  /** Rendered tree lines (`_print_tree`, `:535-604`). */
  def lines(obj: Any): Seq[String] = {
    val out = Seq.newBuilder[String]
    printTree(obj, depth = 0, prefix = "", isRoot = true, out += _)
    out.result()
  }

  /** Render and write (reference default `writer=print`). */
  def apply(obj: Any, writer: String => Unit = println): Any = {
    lines(obj).foreach(writer)
    collect(obj)
  }

  // ---- internals ---------------------------------------------------------

  /** `(label, child)` pairs (`_children_with_labels`, `:473-516`): mappings
    * return ALL keys (maxItems never applies); sequences/sets truncate.
    */
  private def children(obj: Any): Seq[(String, Any)] = obj match {
    case m: collection.Map[_, _] =>
      val items = m.toSeq.map { case (k, v) => (String.valueOf(k), v: Any) }
      if (sortKeys) items.sortBy(_._1) else items
    case s: collection.Seq[_] =>
      val limited = maxItemsPerContainer.fold(s.toSeq)(n => s.toSeq.take(n))
      limited.zipWithIndex.map { case (v, i) => (s"[$i]", v: Any) }
    case s: collection.Set[_] =>
      val elems0 = s.toSeq
      val elems =
        if (!setOrderStable) sortedElems(elems0)
        else elems0
      val limited = maxItemsPerContainer.fold(elems)(n => elems.take(n))
      limited.zipWithIndex.map { case (v, i) => (s"[$i]", v: Any) }
    case _ => Nil
  }

  private def sortedElems(xs: Seq[Any]): Seq[Any] = {
    val allNum = xs.forall(_.isInstanceOf[Number])
    if (allNum) xs.sortBy(x => x.asInstanceOf[Number].doubleValue())
    else xs.sortBy(String.valueOf(_)) // reference falls back to str() sort
  }

  /** `[dict len=n]` tags (`_node_tag`, `:519-532`). */
  private def tag(obj: Any): String = obj match {
    case m: collection.Map[_, _] => if (showLengths) s"[dict len=${m.size}]" else "[dict]"
    case s: collection.Set[_] => if (showLengths) s"[set size=${s.size}]" else "[set]"
    case s: collection.Seq[_] => if (showLengths) s"[list len=${s.size}]" else "[list]"
    case _ => ""
  }

  private def typeName(v: Any): String = v match {
    case null => "NoneType"
    case _: java.lang.Boolean => "bool"
    case _: java.lang.Double | _: java.lang.Float => "float"
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short | _: java.lang.Byte => "int"
    case _: String => "str"
    case other => other.getClass.getSimpleName
  }

  private def render(value: Any): String = value match {
    case s: String =>
      val t = truncateValueLen match {
        case Some(n) if n >= 0 && s.length > n => s.take(n) + "…"
        case _ => s
      }
      if (quoteStrings) "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" else t
    case other =>
      val text = other match {
        case null => "None"
        case b: java.lang.Boolean => if (b) "True" else "False"
        case v => String.valueOf(v)
      }
      truncateValueLen match {
        case Some(n) if n >= 0 && text.length > n => text.take(n) + "…"
        case _ => text
      }
  }

  private def printTree(obj: Any, depth: Int, prefix: String, isRoot: Boolean,
                        writer: String => Unit): Unit = {
    val t = tag(obj)
    if (t.nonEmpty) {
      if (isRoot) writer(t)
      if (maxDepth.exists(depth >= _)) return
      val ch = children(obj)
      ch.zipWithIndex.foreach { case ((label, child), idx) =>
        val isLast = idx == ch.size - 1
        val connector = if (isLast) "└─ " else "├─ "
        val childTag = tag(child)
        if (childTag.nonEmpty) {
          writer(prefix + connector + s"$label $childTag")
          printTree(child, depth + 1, prefix + (if (isLast) "   " else "│  "),
            isRoot = false, writer)
        } else {
          val suffix = if (showTypes) s" (${typeName(child)})" else ""
          writer(prefix + connector + s"$label: ${render(child)}$suffix")
        }
      }
    } else {
      val suffix = if (showTypes) s" (${typeName(obj)})" else ""
      writer(render(obj) + suffix)
    }
  }
}

object Walk {
  /** Convert one collected Row (+schema) into the dynamic nested form. */
  def fromRow(row: Row, schema: StructType): ListMap[String, Any] =
    ListMap(schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      f.name -> fromValue(row.get(i), f.dataType)
    }: _*)

  private def fromValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => fromRow(r, st)
    case (s: collection.Seq[_], ArrayType(et, _)) => s.toSeq.map(x => fromValue(x, et))
    case (m: collection.Map[_, _], MapType(_, vt, _)) =>
      ListMap(m.toSeq.map { case (k, x) => String.valueOf(k) -> fromValue(x, vt) }: _*)
    case (other, _) => other
  }
}

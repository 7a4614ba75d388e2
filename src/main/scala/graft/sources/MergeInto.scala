package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Full MERGE INTO over the commit-log table — the general form of
  * [[LogTable.upsert]]'s fixed latest-wins semantics (the reference's
  * merges are op-column CDC batches, cf.
  * /root/reference/etlutil/data_structures.py:1770; this is the engine's
  * own superset, the ANSI/Delta `MERGE` shape):
  *
  * {{{
  * LogTable.mergeInto(spark, path, source, keyCols = Seq("k"))
  *   .whenMatchedUpdate(Map("cents" -> "s.cents", "version" -> "t.version + 1"),
  *                      condition = Some("s.cents > t.cents"))
  *   .whenMatchedDelete(condition = Some("s.op = 'D'"))
  *   .whenNotMatchedInsert()            // source row, aligned by name
  *   .run()
  * }}}
  *
  * Clause expressions are SQL over two row scopes: `t.` (the target row)
  * and `s.` (the source row). MATCHED clauses evaluate IN ORDER, first
  * true condition wins (condition `None` = always true); a matched pair
  * satisfying no clause keeps the target row unchanged. Unmatched target
  * rows always survive; unmatched source rows insert only through
  * `whenNotMatchedInsert` (default values: the source's same-name column,
  * else NULL; `values` entries override).
  *
  * Contracts, all enforced loud:
  *  - source keys must be UNIQUE — two source rows matching one target
  *    row make the merge ambiguous (the Delta error, not a silent pick);
  *  - the source must physically carry the key AND partition columns
  *    (the pruned-merge contract: a key's partition value is fixed for
  *    life, so the batch's partition tuples name every file that could
  *    hold a matched key);
  *  - updates may not assign key or partition columns (moving a row is
  *    delete + insert);
  *  - a NULL-capable assignment (or insert) widens the committed column
  *    nullable, probed over an INNER-join shell so the full-outer join's
  *    blanket nullability never leaks into the schema.
  *
  * Execution is one log transaction with [[LogTable.upsert]]'s whole
  * machinery: stats-pruned victim files, one full-outer join, one write,
  * one commit; a losing race takes the disjoint-writer fast path when
  * the winners touched only other partitions, else re-runs the merge
  * against the new snapshot (clauses re-evaluate on the winner's state —
  * convergent exactly because the merge IS the conflict resolution).
  */
final case class MergeInto private[sources] (
    spark: SparkSession, path: String, source: DataFrame,
    keyCols: Seq[String],
    matched: Seq[MergeInto.MatchedClause] = Nil,
    insert: Option[MergeInto.InsertClause] = None,
    maxRetries: Int = 3) {
  import MergeInto._

  def whenMatchedUpdate(set: Map[String, String],
                        condition: Option[String] = None): MergeInto = {
    require(set.nonEmpty, "whenMatchedUpdate needs at least one assignment")
    copy(matched = matched :+ MatchedClause(condition, Some(set)))
  }

  def whenMatchedDelete(condition: Option[String] = None): MergeInto =
    copy(matched = matched :+ MatchedClause(condition, None))

  def whenNotMatchedInsert(values: Map[String, String] = Map.empty,
                           condition: Option[String] = None): MergeInto = {
    require(insert.isEmpty, "only one whenNotMatchedInsert clause")
    copy(insert = Some(InsertClause(condition, values)))
  }

  def run(): Long = {
    require(matched.nonEmpty || insert.isDefined,
      s"merge into $path: no clauses — nothing to do")
    val fs = LogTable.fsOf(spark, path)
    val srcFields = source.schema.fieldNames
    def srcField(n: String): Option[String] =
      srcFields.find(_.equalsIgnoreCase(n))
    (keyCols ++ LogTable.snapshot(spark, path).partitionCols).foreach { c =>
      require(srcField(c).isDefined,
        s"merge into $path: source is missing merge-critical column `$c`")
    }
    // ambiguity check, once: two source rows for one key would make the
    // clause outcome depend on join order — fail loud, the Delta rule
    val dup = source.groupBy(keyCols.map(c => col(quote(c))): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dup == 0L,
      s"merge into $path: source has duplicate keys on " +
        s"(${keyCols.mkString(", ")}) — ambiguous merge")
    var attempt = 0
    while (true) {
      val snap = LogTable.snapshot(spark, path)
      validate(snap)
      val touched = LogTable.touchedTuples(path, snap, source)
      val victims = LogTable.victimFiles(snap, touched)
      val result = applyClauses(snap,
        LogTable.readFiles(spark, path, snap, victims), source)
      LogTable.enforceConstraints(path, snap, result)
      val ddl = widenedDdl(snap)
      val adds = LogTable.writeDataFiles(spark, path, result,
        snap.partitionCols, snap.statsCols, bloomCols = snap.bloomCols)
      try {
        LogTable.commit(spark, path, snap.version + 1, ddl,
          snap.partitionCols, snap.statsCols, adds, victims.map(_.name),
          bloomCols = snap.bloomCols, operation = "MERGE_INTO",
          constraints = snap.constraints)
        return snap.version + 1
      } catch {
        case e: LogTable.CommitConflictException =>
          LogTable.recommitDisjoint(spark, path, snap, ddl, touched, adds,
            victims.map(_.name).toSet, maxRetries,
            operation = "MERGE_INTO") match {
            case Some(v) => return v
            case None =>
              adds.foreach(a => fs.delete(
                new org.apache.hadoop.fs.Path(path, a.name), false): Unit)
              attempt += 1
              if (attempt > maxRetries) throw e
          }
      }
    }
    -1L // unreachable
  }

  // ------------------------------------------------------------ internals

  private def quote(n: String): String = "`" + n.replace("`", "``") + "`"

  private def validate(snap: LogTable.Snapshot): Unit = {
    def known(c: String): Boolean =
      snap.schema.fields.exists(_.name.equalsIgnoreCase(c))
    matched.flatMap(_.set).flatMap(_.keys).foreach { c =>
      require(known(c), s"merge into $path: cannot update unknown column `$c`")
      require(!snap.partitionCols.exists(_.equalsIgnoreCase(c)),
        s"merge into $path: partition column `$c` is immutable under the " +
          "pruned-merge contract — move rows with delete + insert")
      require(!keyCols.exists(_.equalsIgnoreCase(c)),
        s"merge into $path: key column `$c` is immutable in an update — " +
          "re-keying is delete + insert")
    }
    insert.foreach(_.values.keys.foreach { c =>
      require(known(c), s"merge into $path: cannot insert unknown column `$c`")
    })
  }

  private def cond(c: Option[String]): Column =
    c.map(x => coalesce(expr(x), lit(false))).getOrElse(lit(true))

  /** The merge as one declarative plan over `base FULL OUTER JOIN source`:
    * a per-row `__act` tag picks the first true clause, the projection
    * dispatches each target column on it. All codegen-friendly CASE
    * chains — no UDFs, no driver loops.
    */
  private[sources] def applyClauses(snap: LogTable.Snapshot, base: DataFrame,
                                    src: DataFrame): DataFrame = {
    val t = base.withColumn("__t_ex", lit(true)).alias("t")
    val s = src.withColumn("__s_ex", lit(true)).alias("s")
    val joinCond = keyCols.map(k =>
      col("t." + quote(k)) === col("s." + quote(k))).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")
    val matchedAct = matched.zipWithIndex.foldRight(lit("keep"): Column) {
      case ((cl, i), acc) =>
        when(cond(cl.condition),
          lit(if (cl.set.isDefined) s"u$i" else "del")).otherwise(acc)
    }
    val insAct = insert
      .map(ic => when(cond(ic.condition), lit("ins")).otherwise(lit("drop")))
      .getOrElse(lit("drop"))
    val act = when(col("t.__t_ex").isNotNull && col("s.__s_ex").isNotNull,
        matchedAct)
      .when(col("t.__t_ex").isNotNull, lit("keep"))
      .otherwise(insAct)
    val outCols = snap.schema.fields.toIndexedSeq.map { f =>
      var e: Column = col("t." + quote(f.name))
      matched.zipWithIndex.foreach { case (cl, i) =>
        cl.set.foreach { m =>
          m.collectFirst { case (k, v) if k.equalsIgnoreCase(f.name) => v }
            .foreach { v =>
              e = when(col("__act") === s"u$i",
                expr(v).cast(f.dataType)).otherwise(e)
            }
        }
      }
      insert.foreach { ic => e = when(col("__act") === "ins",
        insertExpr(ic, f.name, f.dataType)).otherwise(e) }
      e.as(f.name)
    }
    joined.withColumn("__act", act)
      .filter(col("__act") =!= "del" && col("__act") =!= "drop")
      .select(outCols: _*)
  }

  private def insertExpr(ic: MergeInto.InsertClause, field: String,
                         dt: DataType): Column =
    ic.values.collectFirst {
        case (k, v) if k.equalsIgnoreCase(field) => expr(v)
      }
      .orElse(source.schema.fieldNames.find(_.equalsIgnoreCase(field))
        .map(n => col("s." + quote(n))))
      .getOrElse(lit(null))
      .cast(dt)

  /** Nullability of the committed schema after the merge. Probed over an
    * INNER-join shell (matched rows genuinely have both sides) for
    * update assignments and over the source shell alone for inserts —
    * never over the full-outer plan, whose blanket nullability would
    * wrongly demote every NOT NULL column.
    */
  private def widenedDdl(snap: LogTable.Snapshot): String = {
    val tShell = LogTable.emptyDf(spark, snap.schema).alias("t")
    val sShell = LogTable.emptyDf(spark, source.schema).alias("s")
    val joinCond = keyCols.map(k =>
      col("t." + quote(k)) === col("s." + quote(k))).reduce(_ && _)
    val inner = tShell.join(sShell, joinCond, "inner")
    def nullableOn(shell: DataFrame, e: Column, dt: DataType): Boolean =
      shell.select(e.cast(dt).as("x")).schema.head.nullable
    StructType(snap.schema.fields.map { f =>
      if (f.nullable) f
      else {
        val byUpdate = matched.flatMap(_.set).exists(m =>
          m.collectFirst { case (k, v) if k.equalsIgnoreCase(f.name) => v }
            .exists(v => nullableOn(inner, expr(v), f.dataType)))
        val byInsert = insert.exists(ic =>
          nullableOn(sShell, insertExpr(ic, f.name, f.dataType), f.dataType))
        if (byUpdate || byInsert) f.copy(nullable = true) else f
      }
    }).toDDL
  }
}

object MergeInto {
  /** A WHEN MATCHED clause: `set = Some(assignments)` updates,
    * `set = None` deletes; `condition` is SQL over `t.`/`s.`.
    */
  final case class MatchedClause(condition: Option[String],
                                 set: Option[Map[String, String]])

  final case class InsertClause(condition: Option[String],
                                values: Map[String, String])
}

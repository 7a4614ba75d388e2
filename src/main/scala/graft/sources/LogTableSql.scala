package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructType, TimestampType}

/** SQL front door for the log table — `graft.`<table dir>`` as a relation
  * name anywhere SQL takes one, via ONE injected resolution rule (the
  * `SparkSessionExtensions` path, not a custom parser):
  *
  * {{{
  * SELECT ... FROM graft.`/data/orders` [VERSION AS OF 3 | TIMESTAMP AS OF ...]
  * INSERT INTO graft.`/data/orders` SELECT ...          -- blind append
  * INSERT OVERWRITE graft.`/data/orders` SELECT ...     -- full refresh
  * DELETE FROM graft.`/data/orders` WHERE o_year = 1992
  * UPDATE graft.`/data/orders` SET cents = cents * 2 WHERE k % 7 = 0
  * SELECT * FROM graft_changes('/data/orders', 1, 5)        -- file-level CDF
  * SELECT * FROM graft_net_changes('/data/orders', 1, 5, 'k') -- row-level
  * MERGE INTO graft.`/data/orders` t USING src s ON t.k = s.k
  *   WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE
  *   WHEN NOT MATCHED [AND cond] THEN INSERT ...
  *   WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... | DELETE
  * }}}
  *
  * Reads substitute the SAME analyzed plan [[LogTable.table]] builds —
  * FileIndex pruning, data skipping and deletion vectors included, so
  * SQL and the programmatic API can never plan differently. Writes
  * rewrite to commands over the SAME transactional entry points
  * ([[LogTable.append]]/[[LogTable.overwriteAll]]/[[LogTable.deleteWhere]]/
  * [[LogTable.updateWhere]]/[[MergeInto]]) — the SQL layer adds no
  * second write path.
  *
  * MERGE constraints surface the engine's contracts, loud: the ON
  * clause must be a conjunction of same-name key equalities (the
  * pruned-merge key model); `MERGE WITH SCHEMA EVOLUTION` evolves the
  * target inside the merge's own commit (new source columns append
  * nullable, strictly-wider source types widen — zero file rewrites).
  * `WHEN NOT MATCHED BY SOURCE` clauses map onto the builder's
  * by-source forms (target-scope only; the transaction reads the whole
  * table — see [[MergeInto.whenNotMatchedBySourceUpdate]]).
  */
object LogTableSql {

  /** `Seq("graft", "<path>")` → the path; anything else → None. */
  private[sources] def graftPath(parts: Seq[String]): Option[String] =
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graft"))
      Some(parts(1))
    else None

  /** `Seq("lake", "db", "orders")` → the table directory, when `lake`
    * is a registered [[GraftCatalog]] in the ACTIVE session — how every
    * named reference resolves to the same path the `graft.`dir`` form
    * names directly. None for anything else (unregistered head, another
    * catalog's table, a bare name): the caller falls through to Spark's
    * own resolution.
    */
  private[sources] def namedGraftPath(parts: Seq[String]): Option[String] =
    if (parts.length < 2 || parts.head.equalsIgnoreCase("graft")) None
    else try {
      val cm = SparkSession.active.sessionState.catalogManager
      if (!cm.isCatalogRegistered(parts.head)) None
      else cm.catalog(parts.head) match {
        case g: GraftCatalog => Some(g.pathOf(parts.tail))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** A lifecycle-statement table reference — either form — to its path:
    * `graft.`/dir`` directly, `lake.db.orders` through the catalog.
    */
  private val PathForm = "graft\\.`([^`]+)`".r
  private def refPath(ref: String): Option[String] = ref match {
    case PathForm(p) => Some(p)
    case _ => namedGraftPath(ref.split('.').toIndexedSeq)
  }

  /** PARTITIONED BY entries → (partition column names, generated-column
    * declarations): `year(ts)`/`month(ts)`/`day(ts)` become derived
    * columns `<src>_year|_month|_day` with the matching monotone
    * generator SQL; plain names pass through. Shared by the CTAS dialect
    * and the catalog's transform mapping.
    */
  private[sources] def partitionSpecs(entries: Seq[String])
      : (Seq[String], Map[String, String]) = {
    val Gen = """(?i)(year|month|week|day|hour)s?\s*\(\s*(\w+)\s*\)""".r
    val Bucket = """(?i)bucket\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)""".r
    val gens = Map.newBuilder[String, String]
    val cols = entries.map {
      case Gen(fn, src) =>
        val (name, gsql) = fn.toLowerCase match {
          case "year" => (s"${src}_year", s"year($src)")
          case "month" => (s"${src}_month", s"date_format($src, 'yyyy-MM')")
          case "week" => (s"${src}_week", s"date_trunc('WEEK', $src)")
          case "hour" => (s"${src}_hour", s"date_trunc('HOUR', $src)")
          case _ => (s"${src}_day", s"to_date($src)")
        }
        gens += name -> gsql
        name
      case Bucket(n, src) =>
        // HIDDEN hash-bucket partitioning (the Iceberg bucket(N)
        // transform): point lookups on the source column open ~1/N of
        // the files; range predicates fall back to source stats
        val name = s"${src}_bucket"
        gens += name -> s"pmod(hash($src), $n)"
        name
      case plain => plain
    }
    (cols, gens.result())
  }

  /** Split a parenthesized entry list on TOP-LEVEL commas only —
    * `bucket(16, k), year(ts)` is two entries, not three (the naive
    * split the plain-name lists use would cut inside `bucket`'s
    * argument list), and `m MAP<STRING,INT>, s STRUCT<a:INT,b:STRING>`
    * is two entries (angle-bracket depth counts too, or nested-type
    * ADD COLUMNS would split inside the type arguments).
    */
  private[sources] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote = ' ' // inside a '...'/"..." literal — a DEFAULT
    s.foreach { c =>      // value like 'x<y' must not move the depth
      if (quote != ' ') {
        if (c == quote) quote = ' '
        cur.append(c): Unit
      } else c match {
        case q @ ('\'' | '"') => quote = q; cur.append(q): Unit
        case b @ ('(' | '<') => depth += 1; cur.append(b): Unit
        case b @ (')' | '>') => depth -= 1; cur.append(b): Unit
        case ',' if depth == 0 =>
          if (cur.toString.trim.nonEmpty) out += cur.toString.trim
          cur.clear()
        case other => cur.append(other): Unit
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def pathOf(plan: LogicalPlan): Option[(String, Option[String])] =
    plan match {
      case u: UnresolvedRelation => graftPath(u.multipartIdentifier).map(_ -> None)
      case SubqueryAlias(ident, u: UnresolvedRelation) =>
        graftPath(u.multipartIdentifier).map(_ -> Some(ident.name))
      case _ => None
    }

  /** Re-qualify `alias.column` references to the builder's fixed `t.`/
    * `s.` scopes (or strip the alias for single-table DML), then render
    * back to SQL text — clause expressions travel as SQL because the
    * underlying operators resolve them against their own row scopes.
    */
  private def requalify(e: Expression,
                        mapping: Map[String, Option[String]]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        mapping.get(a.nameParts.head.toLowerCase) match {
          case Some(Some(to)) => UnresolvedAttribute(to +: a.nameParts.tail)
          case Some(None) => UnresolvedAttribute(a.nameParts.tail)
          case None => a
        }
    }

  /** The assignment TARGET: a plain column, an alias-qualified column
    * (`t.cents` — the alias strips), or a DOTTED struct-field path
    * (`meta.pts` — kept whole; updateWhere rebuilds the struct).
    */
  private def assignName(key: Expression,
                         aliases: Map[String, Option[String]]): String =
    key match {
      case a: UnresolvedAttribute =>
        val parts =
          if (a.nameParts.length > 1 &&
              aliases.contains(a.nameParts.head.toLowerCase))
            a.nameParts.tail
          else a.nameParts
        parts.mkString(".")
      case other => throw new IllegalArgumentException(
        s"graft SQL: cannot assign to expression $other — name a column")
    }

  /** The analysis-time rewrite rule. Injected by
    * [[graft.expr.GraftExtensions]]; sessions built without the
    * extension simply do not see `graft.`…`` names.
    */
  final case class LogTableRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def relation(path: String, asOf: Option[Long]): LogicalPlan =
      LogTable.table(spark, path, asOf).queryExecution.analyzed

    /** True when `plan` is (an alias over) the ALREADY-substituted
      * log-table relation — a DML statement must never descend to it:
      * Spark's native file-source INSERT/DELETE paths would write into
      * the table directory BEHIND the commit log.
      */
    private def substituted(plan: LogicalPlan): Boolean = {
      val inner = plan match {
        case SubqueryAlias(_, c) => c
        case p => p
      }
      inner.collectFirst {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) if fs.location.isInstanceOf[LogTableFileIndex] => ()
      }.isDefined
    }

    // TOP-DOWN: DML statements must capture their target while it is
    // still the `graft.`…`` name — a bottom-up pass would substitute the
    // relation first and drop the statement onto Spark's native
    // file-source write paths, bypassing the commit log. The inner
    // query/source plans are deliberately carried UNRESOLVED and
    // analyzed at command run time (ofRows), so no resolved-ness guard
    // can reorder this rewrite behind the substitution.
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsDown {
        // SELECT ... FROM graft.`path` (also spark.table / joins / CTEs)
        case u: UnresolvedRelation if !u.isStreaming &&
            graftPath(u.multipartIdentifier).isDefined =>
          relation(graftPath(u.multipartIdentifier).get, None)

        // STREAMING reads by name or path —
        // `spark.readStream.table("lake.db.orders")` (or the
        // `graft.`dir`` form) resolves to the SAME change-feed source
        // the format("graft-logtable") path builds: versions as
        // offsets, admission control, dataChange skipping
        case u: UnresolvedRelation if u.isStreaming &&
            (graftPath(u.multipartIdentifier).isDefined ||
              namedGraftPath(u.multipartIdentifier).isDefined) =>
          val path = graftPath(u.multipartIdentifier)
            .orElse(namedGraftPath(u.multipartIdentifier)).get
          spark.readStream
            .format(classOf[LogTableSourceProvider].getName)
            .option("path", path).load()
            .queryExecution.analyzed

        // a NAMED streaming table Spark's catalog resolution already
        // wrapped (readStream.table("lake.db.t") bypasses the parser, so
        // the V2 wrapper appears before our UnresolvedRelation case can
        // fire) — swap it for the real change-feed source, KEEPING the
        // original output ids; the capability check that would otherwise
        // reject the scan runs after resolution, never seeing the handle
        case sr: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
            if sr.table.isInstanceOf[GraftTable] =>
          val gt = sr.table.asInstanceOf[GraftTable]
          val fresh = spark.readStream
            .format(classOf[LogTableSourceProvider].getName)
            .option("path", gt.path).load()
            .queryExecution.analyzed
          val byName = fresh.output.map(a => a.name.toLowerCase -> a).toMap
          val mapped = sr.output.map { a =>
            val src = byName.getOrElse(a.name.toLowerCase,
              throw new IllegalStateException(
                s"graft catalog: column `${a.name}` of ${gt.name()} is " +
                  "missing from the streaming source"))
            org.apache.spark.sql.catalyst.expressions.Alias(src, a.name)(
              exprId = a.exprId): org.apache.spark.sql.catalyst.expressions
              .NamedExpression
          }
          // the source's extra columns (_commit_version) ride along —
          // the handle's schema does not advertise them, the feed does
          val extras = fresh.output.filterNot(a =>
            sr.output.exists(_.name.equalsIgnoreCase(a.name)))
          Project(mapped ++ extras, fresh)

        // a NAMED table Spark's catalog resolution already materialized
        // (spark.table("lake.db.t"), or SQL under USE lake) — swap the
        // capability-less catalog handle for the real log-table plan,
        // KEEPING the original output ids so parents already resolved
        // against the V2 relation stay valid (one read path, q148)
        case d: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation if d.table.isInstanceOf[GraftTable] =>
          val gt = d.table.asInstanceOf[GraftTable]
          val fresh = relation(gt.path, gt.asOf)
          val byName = fresh.output.map(a => a.name.toLowerCase -> a).toMap
          Project(d.output.map { a =>
            val src = byName.getOrElse(a.name.toLowerCase,
              throw new IllegalStateException(
                s"graft catalog: column `${a.name}` of ${gt.name()} is " +
                  "missing from the log-table relation"))
            org.apache.spark.sql.catalyst.expressions.Alias(src, a.name)(
              exprId = a.exprId)
          }, fresh)

        // VERSION AS OF n / TIMESTAMP AS OF ts
        case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
            if graftPath(u.multipartIdentifier).isDefined =>
          val path = graftPath(u.multipartIdentifier).get
          val asOf = ver.map(_.toLong).orElse(ts.map { e =>
            val micros = Cast(e, TimestampType,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
            require(micros != null,
              s"graft SQL: cannot evaluate TIMESTAMP AS OF $e")
            LogTable.versionAt(spark, path,
              micros.asInstanceOf[Long] / 1000L)
          })
          relation(path, asOf)

        // INSERT INTO / INSERT OVERWRITE (append / full refresh)
        case InsertIntoStatement(target, partSpec, userCols, query,
            overwrite, _, byName) if pathOf(target).isDefined =>
          require(partSpec.isEmpty,
            "graft SQL: static PARTITION specs are not supported — log " +
              "table partitioning is automatic from the row values")
          InsertCommand(pathOf(target).get._1, query, userCols, overwrite,
            byName)

        // DELETE FROM ... WHERE ...
        case DeleteFromTable(target, condition) if pathOf(target).isDefined =>
          val (path, alias) = pathOf(target).get
          DeleteCommand(path,
            requalify(condition, alias.map(_.toLowerCase -> None).toMap).sql)

        // UPDATE ... SET ... WHERE ...
        case UpdateTable(target, assignments, condition)
            if pathOf(target).isDefined =>
          val (path, alias) = pathOf(target).get
          val m = alias.map(_.toLowerCase -> None).toMap
          UpdateCommand(path,
            assignments.map(a => assignName(a.key, m) -> requalify(a.value, m).sql),
            condition.map(c => requalify(c, m).sql))

        // MERGE INTO graft.`path` t USING src s ON ...
        case MergeIntoTable(target, source, mergeCond, matchedActions,
            notMatchedActions, notMatchedBySourceActions, withSchemaEvolution)
            if pathOf(target).isDefined =>
          val (path, tAlias) = pathOf(target).get
          val sAlias = source match {
            case SubqueryAlias(ident, _) => Some(ident.name)
            case _ => None
          }
          val m = (tAlias.map(_.toLowerCase -> Some("t")).toSeq ++
            sAlias.map(_.toLowerCase -> Some("s")).toSeq).toMap
          // by-source clauses requalify under the SAME mapping, so a
          // source reference surfaces as `s.` and the builder rejects it
          // with the real reason (no source row exists in that scope)
          MergeCommand(path, source, keyColsOf(mergeCond, tAlias, sAlias),
            matchedActions.map(matchedOf(_, m)),
            notMatchedActions.map(insertOf(_, m)),
            notMatchedBySourceActions.map(matchedOf(_, m)),
            schemaEvolution = withSchemaEvolution)

        // fail-loud backstop: DML that reached the substituted relation
        // (it should be impossible with the top-down rewrite above)
        case InsertIntoStatement(target, _, _, _, _, _, _)
            if substituted(target) => bypassError("INSERT")
        case DeleteFromTable(target, _) if substituted(target) =>
          bypassError("DELETE")
        case UpdateTable(target, _, _) if substituted(target) =>
          bypassError("UPDATE")
        case MergeIntoTable(target, _, _, _, _, _, _)
            if substituted(target) => bypassError("MERGE")
      }

    private def bypassError(what: String): Nothing =
      throw new IllegalStateException(
        s"graft SQL: $what reached the substituted log-table relation — " +
          "refusing to write behind the commit log")

    /** The ON clause as same-name key equalities — the log-table merge
      * model (a key's partition value is fixed for life; victims prune
      * from the source's key tuples). Anything else fails loud.
      */
    private def keyColsOf(cond: Expression, tAlias: Option[String],
                          sAlias: Option[String]): Seq[String] = {
      def side(e: Expression): Option[(Boolean, String)] = e match {
        case a: UnresolvedAttribute if a.nameParts.length > 1 =>
          val q = a.nameParts.head
          if (tAlias.exists(_.equalsIgnoreCase(q))) Some((true, a.nameParts.last))
          else if (sAlias.exists(_.equalsIgnoreCase(q))) Some((false, a.nameParts.last))
          else None
        case _ => None
      }
      def keys(e: Expression): Seq[String] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          keys(l) ++ keys(r)
        case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
          (side(l), side(r)) match {
            case (Some((true, tn)), Some((false, sn))) if tn.equalsIgnoreCase(sn) =>
              Seq(tn)
            case (Some((false, sn)), Some((true, tn))) if tn.equalsIgnoreCase(sn) =>
              Seq(tn)
            case _ => throw new IllegalArgumentException(
              s"graft SQL: merge ON clause term `${e.sql}` is not a " +
                "same-name target/source key equality — the log-table " +
                "merge joins by key (alias the target and source, e.g. " +
                "ON t.k = s.k)")
          }
        case other => throw new IllegalArgumentException(
          s"graft SQL: merge ON clause `${other.sql}` must be a " +
            "conjunction of same-name key equalities")
      }
      keys(cond)
    }

    private def matchedOf(a: MergeAction,
                          m: Map[String, Option[String]]): MatchedSpec =
      a match {
        case UpdateAction(cond, assignments, _) =>
          MatchedSpec(cond.map(requalify(_, m).sql),
            Some(assignments.map(x =>
              assignName(x.key, m) -> requalify(x.value, m).sql).toMap))
        case _: UpdateStarAction => throw new IllegalArgumentException(
          "graft SQL: UPDATE SET * is not supported — name the assignments")
        case DeleteAction(cond) =>
          MatchedSpec(cond.map(requalify(_, m).sql), None)
        case other => throw new IllegalArgumentException(
          s"graft SQL: unsupported WHEN MATCHED action $other")
      }

    private def insertOf(a: MergeAction,
                         m: Map[String, Option[String]]): InsertSpec =
      a match {
        case InsertAction(cond, assignments) =>
          InsertSpec(cond.map(requalify(_, m).sql),
            assignments.map(x =>
              assignName(x.key, m) -> requalify(x.value, m).sql).toMap)
        case InsertStarAction(cond) =>
          InsertSpec(cond.map(requalify(_, m).sql), Map.empty)
        case other => throw new IllegalArgumentException(
          s"graft SQL: unsupported WHEN NOT MATCHED action $other")
      }
  }

  private[sources] final case class MatchedSpec(condition: Option[String],
                                                set: Option[Map[String, String]])
  private[sources] final case class InsertSpec(condition: Option[String],
                                               values: Map[String, String])

  /** INSERT → [[LogTable.append]]/[[LogTable.overwriteAll]], with SQL
    * INSERT column semantics: positional with casts by default; a
    * column list maps the query's outputs to the NAMED columns (the
    * rest NULL-fill if nullable, loud otherwise); BY NAME matches
    * case-insensitively.
    */
  private[sources] final case class InsertCommand(path: String,
      query: LogicalPlan, userCols: Seq[String], overwrite: Boolean,
      byName: Boolean) extends LeafRunnableCommand {
    override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
    override def run(session: SparkSession): Seq[Row] = {
      val snap = LogTable.snapshot(session, path)
      // GENERATED columns are the engine's to compute — INSERT aligns
      // against the user-facing schema without them (the write path
      // recomputes them regardless, so a supplied value is ignored)
      val gens = LogTable.generatorsOf(snap).keySet.map(_.toLowerCase)
      val fields = snap.schema.fields.toIndexedSeq
        .filterNot(f => gens.contains(f.name.toLowerCase))
      val src = GraftBridge.ofRows(session, query)
      def fill(f: org.apache.spark.sql.types.StructField) = {
        require(f.nullable,
          s"graft SQL: INSERT omits non-nullable column `${f.name}`")
        lit(null).cast(f.dataType).as(f.name)
      }
      val aligned: DataFrame =
        if (byName) {
          src.select(fields.map { f =>
            src.schema.fields.find(_.name.equalsIgnoreCase(f.name)) match {
              case Some(g) => col(g.name).cast(f.dataType).as(f.name)
              case None => fill(f)
            }
          }: _*)
        } else if (userCols.nonEmpty) {
          require(userCols.size == src.columns.length,
            s"graft SQL: INSERT names ${userCols.size} columns but the " +
              s"query produces ${src.columns.length}")
          val byTarget = userCols.map(_.toLowerCase).zip(src.columns).toMap
          src.select(fields.map { f =>
            byTarget.get(f.name.toLowerCase) match {
              case Some(srcCol) => col(srcCol).cast(f.dataType).as(f.name)
              case None => fill(f)
            }
          }: _*)
        } else {
          require(src.columns.length == fields.size,
            s"graft SQL: INSERT query produces ${src.columns.length} " +
              s"columns, table has ${fields.size} — list the target columns")
          src.select(fields.zip(src.columns).map {
            case (f, c) => col(c).cast(f.dataType).as(f.name)
          }: _*)
        }
      if (overwrite) LogTable.overwriteAll(session, path, aligned): Unit
      else LogTable.append(session, path, aligned): Unit
      Seq.empty
    }
  }

  // --------------------------------------------- change-feed TVF plans

  /** A TVF argument as a literal string/long — change-feed bounds are
    * plan-time values (they pick COMMITS, not rows).
    */
  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"graft SQL: $what must be a string literal, got $other")
  }

  /** A TVF's table argument: a path as-is, or a catalog NAME
    * (`'lake.db.orders'`) resolved to its directory.
    */
  private def pathArg(e: Expression, what: String): String = {
    val s = strArg(e, what)
    if (s.contains("/")) s
    else namedGraftPath(s.split('.').toIndexedSeq).getOrElse(s)
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"graft SQL: $what must be an integer literal, got $other")
  }

  /** A CDF window bound: an integer literal is a VERSION; a timestamp
    * or timestamp-looking string literal resolves through
    * [[LogTable.versionAt]] — the in-commit-timestamp clock, so
    * `graft_changes(t, TIMESTAMP'...', TIMESTAMP'...')` means exactly
    * what `TIMESTAMP AS OF` means.
    */
  private def versionOrTsArg(spark: SparkSession, path: String,
                             e: Expression, what: String): Long = e match {
    // a timestamp literal's value is ALSO a Long (micros) — match the
    // type before the bare integral cases or it would read as a version
    case Literal(micros: Long, org.apache.spark.sql.types.TimestampType) =>
      LogTable.versionAt(spark, path, micros / 1000L)
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      val zone = spark.sessionState.conf.sessionLocalTimeZone
      val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToTimestamp(s, java.time.ZoneId.of(zone))
        .getOrElse(throw new IllegalArgumentException(
          s"graft SQL: $what — `$s` is neither a version nor a timestamp"))
      LogTable.versionAt(spark, path, micros / 1000L)
    case other => throw new IllegalArgumentException(
      s"graft SQL: $what must be a version or timestamp literal, got $other")
  }

  /** METADATA-ONLY `count(*)` — the Delta OptimizeMetadataOnlyQuery
    * move: a global, unfiltered, non-distinct count over a log-table
    * relation folds to the snapshot's EXACT row count straight from the
    * log (every file's committed row count), replacing the whole scan
    * with a one-row LocalRelation. At 100 TB that is the difference
    * between a constant-time answer and reading a million parquet
    * footers. STRICT eligibility, never a wrong answer: no grouping, no
    * filter anywhere below the aggregate (the relation must be the
    * direct child, modulo a pure column-pruning Project), every
    * aggregate a plain `count(literal)`, and no deletion vectors in the
    * snapshot (a DV'd read plans an anti-join ABOVE the relation, so
    * this shape cannot match it — and the bare relation refuses DV
    * snapshots outright).
    */
  final case class MetadataCountRule(session: SparkSession)
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
      AttributeReference, Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      AggregateExpression, Count, Max, Min}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      LocalRelation, Project}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
      LogicalRelation}
    import org.apache.spark.sql.types._

    private def indexOf(plan: LogicalPlan): Option[LogTableFileIndex] =
      plan match {
        case LogicalRelation(
            fs: HadoopFsRelation, _, _, false, _)
            if fs.location.isInstanceOf[LogTableFileIndex] =>
          Some(fs.location.asInstanceOf[LogTableFileIndex])
        // a pure column-pruning projection never changes the rows
        case Project(ps, child) if ps.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case _ => false
        } => indexOf(child)
        case _ => None
      }

    /** Parse a persisted stat string back into the column type's
      * INTERNAL value. Only types whose stat rendering round-trips
      * losslessly participate — anything else declines the fold.
      */
    private def statValue(dt: DataType, s: String): Option[Any] =
      try dt match {
        case ByteType => Some(s.toByte)
        case ShortType => Some(s.toShort)
        case IntegerType => Some(s.toInt)
        case LongType => Some(s.toLong)
        case FloatType => Some(s.toFloat)
        case DoubleType => Some(s.toDouble)
        case d: DecimalType =>
          Some(org.apache.spark.sql.types.Decimal(
            BigDecimal(s), d.precision, d.scale))
        case StringType =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case DateType =>
          Some(java.time.LocalDate.parse(s).toEpochDay.toInt)
        case TimestampType => Some(s.toLong) // persisted as UTC micros
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }

    private def ordering(dt: DataType): Option[Ordering[Any]] =
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(dt) match {
        case o => Some(o.asInstanceOf[Ordering[Any]])
      }

    /** The folded value for one aggregate over the snapshot, or None
      * when this aggregate (or the metadata) cannot answer it exactly.
      */
    private def foldOne(snap: LogTable.Snapshot,
                        e: Expression): Option[Any] = e match {
      case Alias(c, _) => foldOne(snap, c)
      case AggregateExpression(Count(Seq(_: CLit)), _, false, None, _) =>
        Some(LogTable.liveRows(snap))
      case AggregateExpression(mm @ (_: Min | _: Max), _, false, None, _) =>
        val (attr, isMin) = mm match {
          case Min(a: AttributeReference) => (a, true)
          case Max(a: AttributeReference) => (a, false)
          case _ => return None
        }
        // EVERY live file must carry min/max stats for the column (a
        // file without them could hold the true extremum); all-NULL
        // files (stats present, bounds absent, nulls == rows) skip —
        // min/max ignore NULLs. A column that is NULL everywhere folds
        // to NULL, exactly like the scan would answer.
        val per = snap.files.map(f => f.stats.collectFirst {
          case (k, s) if k.equalsIgnoreCase(snap.physicalOf(attr.name)) => s
        })
        if (per.exists(_.isEmpty)) return None
        val bounds = per.flatten.flatMap { s =>
          (s.min, s.max) match {
            case (Some(lo), Some(hi)) => Some((lo, hi))
            case _ if s.nulls > 0 => None // all-NULL file: contributes nothing
            case _ => None
          }
        }
        if (bounds.isEmpty) return Some(null) // NULL everywhere
        val vals = bounds.map { case (lo, hi) => if (isMin) lo else hi }
          .map(statValue(attr.dataType, _))
        if (vals.exists(_.isEmpty)) return None
        ordering(attr.dataType).map { ord =>
          if (isMin) vals.flatten.min(ord) else vals.flatten.max(ord)
        }
      case _ => None
    }

    private def isCountStar(e: Expression): Boolean = e match {
      case Alias(c, _) => isCountStar(c)
      case AggregateExpression(Count(Seq(_: CLit)), _, false, None, _) => true
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty =>
        // pruning Projects (attribute-only, incl. the empty count(*)
        // projection) never change row counts — look through them
        def unwrap(p: LogicalPlan): LogicalPlan = p match {
          case Project(ps, c) if ps.forall {
            case _: AttributeReference => true
            case Alias(_: AttributeReference, _) => true
            case _ => false
          } => unwrap(c)
          case other => other
        }
        unwrap(child) match {
          // FILTERED count: folds only when the predicate is FULLY
          // stats-decided — every file provably empty or provably
          // all-matching under the pushed conjuncts (no scan residue,
          // no DVs). `count(*) WHERE day = yesterday` over an aligned
          // layout then answers in constant time; one undecided
          // boundary file and the whole aggregate scans as before.
          case org.apache.spark.sql.catalyst.plans.logical
              .Filter(cond, grandchild) if exprs.forall(isCountStar) =>
            indexOf(grandchild) match {
              case Some(index) =>
                val zone = session.sessionState.conf.sessionLocalTimeZone
                LogTable.decidedCount(index.snap,
                    LogTable.conjuncts(cond), zone) match {
                  case Some(cnt) =>
                    LocalRelation(
                      agg.output.map(_.asInstanceOf[Attribute]),
                      Seq(org.apache.spark.sql.catalyst.InternalRow(
                        agg.output.map(_ => cnt): _*)))
                  case None => agg
                }
              case None => agg
            }
          case _ =>
            indexOf(child) match {
              case Some(index) if index.snap.files.forall(_.dv.isEmpty) =>
                val folded = exprs.map(foldOne(index.snap, _))
                if (folded.exists(_.isEmpty)) agg
                else LocalRelation(
                  agg.output.map(_.asInstanceOf[Attribute]),
                  Seq(org.apache.spark.sql.catalyst.InternalRow(
                    folded.map(_.get): _*)))
              case _ => agg
            }
        }
    }
  }

  /** `graft_changes('path', from, to[, mode])` — the change feed as a
    * table-valued function (the Delta `table_changes` shape), registered
    * via `SparkSessionExtensions.injectTableFunction`: the SAME
    * [[LogTable.readChanges]] / [[LogTable.readCommitChanges]] plans the
    * programmatic API builds, composable with any SQL on top.
    */
  def changesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 4,
      "graft_changes(path, fromVersion, toVersion[, mode]) takes 3 or 4 " +
        "arguments")
    val spark = SparkSession.active
    val p = pathArg(args(0), "path")
    val from = versionOrTsArg(spark, p, args(1), "fromVersion")
    val to = versionOrTsArg(spark, p, args(2), "toVersion")
    // ONE output schema for every table: the per-commit feed attributes
    // `_commit_version`; the net file-level shape carries it too, NULL
    // (a net diff is not attributable to one commit) — a table property
    // flip can change the feed's granularity but never its shape. The
    // optional 4th argument pins the granularity EXPLICITLY: 'row'
    // serves the per-commit feed on any table (file-level per-commit
    // fallback for commits without CDC files), 'file' the net diff,
    // 'auto' (default) follows `cdc.enabled` at the `to` snapshot.
    val mode = args.lift(3).map(a =>
      strArg(a, "mode").toLowerCase(java.util.Locale.ROOT)) match {
      case None => "auto"
      case Some(m @ ("auto" | "file" | "row")) => m
      case Some(m) => throw new IllegalArgumentException(
        s"graft_changes: unknown mode `$m` — use 'auto', 'file' or 'row'")
    }
    val rowLevel = mode match {
      case "row" => true
      case "file" => false
      case _ => LogTable.cdcEnabled(
        LogTable.snapshot(spark, p, Some(to)).properties)
    }
    (if (rowLevel) LogTable.readCommitChanges(spark, p, from, to)
     else LogTable.readChanges(spark, p, from, to)
       .withColumn("_commit_version", lit(null).cast("long")))
      .queryExecution.analyzed
  }

  /** `graft_net_changes('path', from, to, 'k1', ...)` — the row-level
    * net change feed as a table-valued function.
    */
  def netChangesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 4,
      "graft_net_changes(path, fromVersion, toVersion, keyCols...) " +
        "needs a path, two versions and at least one key column")
    val spark = SparkSession.active
    val p = pathArg(args(0), "path")
    LogTable.readNetChanges(spark, p,
        versionOrTsArg(spark, p, args(1), "fromVersion"),
        versionOrTsArg(spark, p, args(2), "toVersion"),
        args.drop(3).zipWithIndex.map { case (a, i) =>
          strArg(a, s"key column ${i + 1}") })
      .queryExecution.analyzed
  }

  /** `graft_history('path-or-name')` — the operation ledger as a
    * TABLE-valued function, composable with any SQL on top (the
    * DESCRIBE HISTORY statement returns the same rows but, as a
    * command, cannot be filtered/joined in-query).
    */
  def historyPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "graft_history(path) takes one argument")
    LogTable.history(SparkSession.active, pathArg(args(0), "path"))
      .queryExecution.analyzed
  }

  /** `graft_files('path-or-name'[, version])` — the snapshot's FILE
    * inventory as a table: name, leading-partition bounds, physical
    * rows/bytes, deletion-vector load. Metadata-only (the log already
    * knows it); the ops view behind "why is this partition 400 files".
    */
  def filesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2,
      "graft_files(path[, version]) takes one or two arguments")
    val spark = SparkSession.active
    val snap = LogTable.snapshot(spark, pathArg(args(0), "path"),
      args.lift(1).map(longArg(_, "version")))
    import spark.implicits._
    snap.files.map(f => (f.name, f.pmin, f.pmax, f.rows, f.bytes,
        f.dv.map(_.deleted).getOrElse(0L)))
      .toDF("name", "pmin", "pmax", "rows", "bytes", "dv_deleted")
      .queryExecution.analyzed
  }

  /** `graft_mv('path')` — read a materialized view's user-facing
    * aggregate through SQL (the state table's internals stay internal).
    */
  def mvReadPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "graft_mv(path) takes one argument")
    MaterializedView.read(SparkSession.active, pathArg(args(0), "path"))
      .queryExecution.analyzed
  }

  // ------------------------------------------------ lifecycle statements

  /** Delegating SQL parser (the Delta-parser pattern, via
    * `SparkSessionExtensions.injectParser`): intercepts the table
    * LIFECYCLE statements Spark's grammar does not know —
    *
    * {{{
    * DESCRIBE HISTORY graft.`/data/orders`
    * VACUUM graft.`/data/orders` [RETAIN <n> HOURS] [FORCE]
    * OPTIMIZE graft.`/data/orders` [MAX <n> FILES PER PARTITION]
    * ALTER TABLE graft.`/data/orders` ADD CONSTRAINT nm CHECK (<expr>)
    * ALTER TABLE graft.`/data/orders` DROP CONSTRAINT nm
    * }}}
    *
    * — and delegates EVERYTHING else (including every other method of
    * the interface) to Spark's own parser, so the dialect is additive.
    * Each statement lands on the same maintenance entry point the
    * programmatic API calls; none introduces a second write path.
    */
  final class GraftSqlParser(
      delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
      extends org.apache.spark.sql.catalyst.parser.ParserInterface {
    import java.util.regex.Pattern
    private val F = Pattern.CASE_INSENSITIVE | Pattern.DOTALL
    // one capture group either way: the backticked path form, or a
    // dotted NAME resolved through a registered GraftCatalog (refPath)
    private val Ref = "(graft\\.`[^`]+`|\\w+(?:\\.\\w+)+)"
    private val HistoryP = Pattern.compile(
      s"^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Ref\\s*$$", F)
    private val DetailP = Pattern.compile(
      s"^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Ref\\s*$$", F)
    private val VacuumP = Pattern.compile(
      s"^\\s*VACUUM\\s+$Ref(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?" +
        "(\\s+FORCE)?(\\s+DRY\\s+RUN)?\\s*$", F)
    private val OptimizeP = Pattern.compile(
      s"^\\s*OPTIMIZE\\s+$Ref" +
        "(?:\\s+WHERE\\s+(.+?))?" +
        "(?:\\s+MAX\\s+(\\d+)\\s+FILES\\s+PER\\s+PARTITION)?" +
        "(?:\\s+ZORDER\\s+BY\\s*\\(\\s*(\\w+(?:\\s*,\\s*\\w+){1,3})\\s*\\))?\\s*$", F)
    private val AddConstraintP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+" +
        "CHECK\\s*\\((.*)\\)\\s*$", F)
    private val DropConstraintP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*$$", F)
    private val CreateTableP = Pattern.compile(
      // the partition list admits one level of nesting: year(ts)-style
      // generated-column derivations
      s"^\\s*CREATE\\s+TABLE\\s+$Ref" +
        "(?:\\s+PARTITIONED\\s+BY\\s*\\(((?:[^()]|\\([^()]*\\))+)\\))?" +
        "(?:\\s+STATS\\s+BY\\s*\\(([^)]+)\\))?" +
        "(?:\\s+ZORDER\\s+BY\\s*\\((\\w+(?:\\s*,\\s*\\w+){1,3})\\s*\\))?" +
        "(?:\\s+TBLPROPERTIES\\s*\\(([^)]+)\\))?" +
        "\\s+AS\\s+(.+)$", F)
    // column-list CREATE (no AS): an EMPTY table from declared column
    // definitions — the standard-SQL shape, and the carrier for
    // `GENERATED [ALWAYS | BY DEFAULT] AS IDENTITY (START WITH s
    // INCREMENT BY i)` column options. One paren-nesting level covers
    // DECIMAL(10,2) and the IDENTITY option list.
    private val CreateTableColsP = Pattern.compile(
      s"^\\s*CREATE\\s+TABLE\\s+$Ref\\s*" +
        "\\(((?:[^()]|\\([^()]*\\))+)\\)" +
        "(?:\\s+PARTITIONED\\s+BY\\s*\\(((?:[^()]|\\([^()]*\\))+)\\))?" +
        "(?:\\s+STATS\\s+BY\\s*\\(([^)]+)\\))?" +
        "(?:\\s+TBLPROPERTIES\\s*\\(([^)]+)\\))?\\s*$", F)
    private val SyncIdentityP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+" +
        "SYNC\\s+IDENTITY\\s*$", F)
    private val ConvertP = Pattern.compile(
      s"^\\s*CONVERT\\s+TO\\s+GRAFT\\s+$Ref" +
        "(?:\\s+STATS\\s+BY\\s*\\(([^)]+)\\))?\\s*$", F)
    private val BranchP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+" +
        "(CREATE|PUBLISH|DROP)\\s+BRANCH\\s+([A-Za-z0-9_-]+)\\s*$", F)
    private val TagP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+(CREATE|DROP)\\s+TAG\\s+" +
        "([A-Za-z0-9_-]+)(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*$", F)
    private val CreateMvP = Pattern.compile(
      s"^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+$Ref" +
        "(?:\\s+BUCKETS\\s+(\\d+))?\\s+AS\\s+(.+)$", F)
    private val RefreshMvP = Pattern.compile(
      s"^\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+$Ref\\s*$$", F)
    private val CloneP = Pattern.compile(
      s"^\\s*CREATE\\s+TABLE\\s+$Ref\\s+SHALLOW\\s+CLONE\\s+$Ref\\s*$$", F)
    private val RestoreP = Pattern.compile(
      s"^\\s*RESTORE\\s+TABLE\\s+$Ref\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+" +
        "(\\d+)\\s*$", F)
    private val RestoreTsP = Pattern.compile(
      s"^\\s*RESTORE\\s+TABLE\\s+$Ref\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+" +
        "'([^']+)'\\s*$", F)
    private val CheckpointP = Pattern.compile(
      s"^\\s*CHECKPOINT\\s+$Ref(\\s+EXPIRE)?\\s*$$", F)
    private val SetPropsP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+SET\\s+TBLPROPERTIES\\s*" +
        "\\((.+)\\)\\s*$", F)
    private val UnsetPropsP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+UNSET\\s+TBLPROPERTIES\\s*" +
        "\\((.+)\\)\\s*$", F)
    // 'k' = 'v' pairs / 'k' names, quoted, comma-separated
    private val PropPair = "'([^']*)'\\s*=\\s*'([^']*)'".r
    private val PropName = "'([^']*)'".r
    private val AddColumnsP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+COLUMNS?\\s*\\((.+)\\)\\s*$$",
      F)
    private val AlterTypeP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ALTER\\s+COLUMN\\s+([\\w.]+)\\s+" +
        "TYPE\\s+(.+?)\\s*$", F)
    private val RenameTableP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+RENAME\\s+TO\\s+$Ref\\s*$$", F)
    private val RenameColP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+RENAME\\s+COLUMN\\s+([\\w.]+)\\s+" +
        "TO\\s+(\\w+)\\s*$", F)
    private val DropColP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+COLUMN\\s+" +
        "(IF\\s+EXISTS\\s+)?([\\w.]+)\\s*$", F)
    // PARTITION EVOLUTION — same one-level-nested entry vocabulary as
    // CREATE (names, year(c)/month(c)/day(c)/hour(c), bucket(N, c));
    // an EMPTY list evolves to an unpartitioned table
    private val ReplacePartP = Pattern.compile(
      s"^\\s*ALTER\\s+TABLE\\s+$Ref\\s+REPLACE\\s+PARTITIONED\\s+BY\\s*" +
        "\\(((?:[^()]|\\([^()]*\\))*)\\)\\s*$", F)

    /** A matched pattern whose reference does NOT resolve to a graft
      * table (another catalog's name) falls through to the delegate —
      * `flatMap(refPath)` everywhere below.
      */
    private def matchCommand(sqlText: String): Option[LogicalPlan] = {
      val h = HistoryP.matcher(sqlText)
      if (h.matches()) return refPath(h.group(1)).map(HistoryCommand)
      val dd = DetailP.matcher(sqlText)
      if (dd.matches()) return refPath(dd.group(1)).map(DetailCommand)
      val v = VacuumP.matcher(sqlText)
      if (v.matches())
        return refPath(v.group(1)).map(VacuumCommand(_,
          Option(v.group(2)).map(_.toLong), v.group(3) != null,
          dryRun = v.group(4) != null))
      val o = OptimizeP.matcher(sqlText)
      if (o.matches())
        return refPath(o.group(1)).map(OptimizeCommand(_,
          Option(o.group(3)).map(_.toInt),
          Option(o.group(4)).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
          Option(o.group(2))))
      val a = AddConstraintP.matcher(sqlText)
      if (a.matches())
        return refPath(a.group(1)).map(
          AddConstraintCommand(_, a.group(2), a.group(3)))
      val d = DropConstraintP.matcher(sqlText)
      if (d.matches())
        return refPath(d.group(1)).map(DropConstraintCommand(_, d.group(2)))
      val ac = AddColumnsP.matcher(sqlText)
      if (ac.matches())
        return refPath(ac.group(1)).map(AddColumnsCommand(_, ac.group(2)))
      val at = AlterTypeP.matcher(sqlText)
      if (at.matches())
        return refPath(at.group(1)).map(
          AlterColumnTypeCommand(_, at.group(2), at.group(3)))
      val rnt = RenameTableP.matcher(sqlText)
      if (rnt.matches())
        return for (o <- refPath(rnt.group(1)); n <- createRefPath(rnt.group(2)))
          yield RenameTableCommand(o, n)
      val rc = RenameColP.matcher(sqlText)
      if (rc.matches())
        return refPath(rc.group(1)).map(
          RenameColumnCommand(_, rc.group(2), rc.group(3)))
      val dc = DropColP.matcher(sqlText)
      if (dc.matches())
        return refPath(dc.group(1)).map(
          DropColumnCommand(_, dc.group(3), dc.group(2) != null))
      val rp = ReplacePartP.matcher(sqlText)
      if (rp.matches())
        return refPath(rp.group(1)).map(
          ReplacePartitioningCommand(_, splitTopLevel(rp.group(2))))
      val rs = RestoreP.matcher(sqlText)
      if (rs.matches())
        return refPath(rs.group(1)).map(
          RestoreCommand(_, rs.group(2).toLong))
      val rt = RestoreTsP.matcher(sqlText)
      if (rt.matches())
        return refPath(rt.group(1)).map(
          RestoreTsCommand(_, rt.group(2)))
      val cp = CheckpointP.matcher(sqlText)
      if (cp.matches())
        return refPath(cp.group(1)).map(
          CheckpointCommand(_, cp.group(2) != null))
      val sp = SetPropsP.matcher(sqlText)
      if (sp.matches())
        return refPath(sp.group(1)).map(SetPropertiesCommand(_,
          PropPair.findAllMatchIn(sp.group(2))
            .map(m => m.group(1) -> m.group(2)).toMap, Nil))
      val up = UnsetPropsP.matcher(sqlText)
      if (up.matches())
        return refPath(up.group(1)).map(SetPropertiesCommand(_, Map.empty,
          PropName.findAllMatchIn(up.group(2)).map(_.group(1)).toSeq))
      val cl = CloneP.matcher(sqlText)
      if (cl.matches())
        return for (d <- createRefPath(cl.group(1)); s <- refPath(cl.group(2)))
          yield CloneCommand(d, s)
      val si = SyncIdentityP.matcher(sqlText)
      if (si.matches())
        return refPath(si.group(1)).map(SyncIdentityCommand(_, si.group(2)))
      val cv = ConvertP.matcher(sqlText)
      if (cv.matches())
        return createRefPath(cv.group(1)).map(ConvertCommand(_,
          Option(cv.group(2)).toSeq.flatMap(_.split(","))
            .map(_.trim).filter(_.nonEmpty)))
      val br = BranchP.matcher(sqlText)
      if (br.matches())
        return refPath(br.group(1)).map(
          BranchCommand(_, br.group(2).toUpperCase, br.group(3)))
      val tg = TagP.matcher(sqlText)
      if (tg.matches())
        return refPath(tg.group(1)).map(TagCommand(_,
          tg.group(2).toUpperCase, tg.group(3),
          Option(tg.group(4)).map(_.toLong)))
      val ctc = CreateTableColsP.matcher(sqlText)
      if (ctc.matches() && {
        // the dialect claims column-list CREATE only for backticked
        // PATH refs (which native V2 cannot address) or statements
        // declaring IDENTITY (which native V2 cannot express) — a
        // plain named create falls through to the catalog's own V2
        // CREATE TABLE, transforms and all
        ctc.group(1).contains("/") ||
          java.util.regex.Pattern.compile("(?i)\\bAS\\s+IDENTITY\\b")
            .matcher(ctc.group(2)).find()
      }) {
        def cols(g: String): Seq[String] =
          Option(g).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        return createRefPath(ctc.group(1)).map(CreateTableColsCommand(_,
          ctc.group(2),
          Option(ctc.group(3)).toSeq.flatMap(splitTopLevel),
          cols(ctc.group(4)),
          properties = Option(ctc.group(5)).map(g =>
            PropPair.findAllMatchIn(g)
              .map(m => m.group(1) -> m.group(2)).toMap)
            .getOrElse(Map.empty)))
      }
      val ct = CreateTableP.matcher(sqlText)
      if (ct.matches()) {
        def cols(g: String): Seq[String] =
          Option(g).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        // CREATE targets a table that does not exist yet — a NAMED ref
        // resolves through the catalog root, not through tableExists
        return createRefPath(ct.group(1)).map(CreateTableCommand(_,
          cols(ct.group(2)), cols(ct.group(3)),
          cols(ct.group(4)),
          ct.group(6),
          properties = Option(ct.group(5)).map(g =>
            PropPair.findAllMatchIn(g)
              .map(m => m.group(1) -> m.group(2)).toMap)
            .getOrElse(Map.empty)))
      }
      val cm = CreateMvP.matcher(sqlText)
      if (cm.matches())
        return createRefPath(cm.group(1)).map(CreateMvCommand(_,
          Option(cm.group(2)).map(_.toInt), cm.group(3)))
      val rm = RefreshMvP.matcher(sqlText)
      if (rm.matches()) return refPath(rm.group(1)).map(RefreshMvCommand)
      None
    }

    /** Create-statement references resolve like [[refPath]] (name →
      * catalog root mapping needs no existing table either way).
      */
    private def createRefPath(ref: String): Option[String] = refPath(ref)

    /** Rewrite every NAMED graft-catalog relation in a freshly parsed
      * plan to the canonical `graft.`path`` form — reads, DML targets,
      * time travel and subqueries all funnel into the ONE resolution
      * rule before Spark's catalog resolution can put them on a V2
      * scan/write path.
      */
    private def canonicalizeNames(plan: LogicalPlan): LogicalPlan =
      plan.transformDownWithSubqueries {
        // InsertIntoStatement's target is NOT a transform child (only
        // the query is) — rewrite it explicitly or INSERT INTO a named
        // table would slip through to the V2 append path
        case i: InsertIntoStatement =>
          i.copy(table = canonicalizeNames(i.table))
        case u: UnresolvedRelation if !u.isStreaming =>
          namedGraftPath(u.multipartIdentifier) match {
            case Some(p) => u.copy(multipartIdentifier = Seq("graft", p))
            case None => u
          }
      }

    override def parsePlan(sqlText: String): LogicalPlan =
      matchCommand(sqlText)
        .getOrElse(canonicalizeNames(delegate.parsePlan(sqlText)))

    override def parseQuery(sqlText: String): LogicalPlan =
      delegate.parseQuery(sqlText)
    override def parseExpression(sqlText: String): Expression =
      delegate.parseExpression(sqlText)
    override def parseTableIdentifier(sqlText: String)
        : org.apache.spark.sql.catalyst.TableIdentifier =
      delegate.parseTableIdentifier(sqlText)
    override def parseFunctionIdentifier(sqlText: String)
        : org.apache.spark.sql.catalyst.FunctionIdentifier =
      delegate.parseFunctionIdentifier(sqlText)
    override def parseMultipartIdentifier(sqlText: String): Seq[String] =
      delegate.parseMultipartIdentifier(sqlText)
    override def parseTableSchema(sqlText: String): StructType =
      delegate.parseTableSchema(sqlText)
    override def parseDataType(sqlText: String)
        : org.apache.spark.sql.types.DataType =
      delegate.parseDataType(sqlText)
    override def parseRoutineParam(sqlText: String): StructType =
      delegate.parseRoutineParam(sqlText)
    override def parsePlanWithParameters(sqlText: String,
        ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
        : LogicalPlan =
      // lifecycle statements carry no parameter markers — intercept the
      // same way, else delegate WITH the parameters intact
      matchCommand(sqlText).getOrElse(
        canonicalizeNames(delegate.parsePlanWithParameters(sqlText, ctx)))
  }

  private def attrsOf(schema: StructType) =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)

  /** `DESCRIBE HISTORY` — the operation ledger as a command result. */
  private[sources] final case class HistoryCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("operation",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("data_change",
          org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("num_added_files",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("num_removed_files",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("rows_added",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bytes_added",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("commit_time",
          TimestampType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      LogTable.history(session, path).collect().toIndexedSeq
  }

  /** `DESCRIBE DETAIL` — one row of table-level metadata off the
    * snapshot alone (no data scan): version, layout declarations, live
    * file/row/byte totals, deletion-vector load, constraints.
    */
  private[sources] final case class DetailCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("partition_columns",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("stats_columns",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("bloom_columns",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("num_files",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("num_rows",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("total_bytes",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("deleted_rows_in_vectors",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("constraints",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("properties",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("commit_time",
          org.apache.spark.sql.types.TimestampType, nullable = true),
        org.apache.spark.sql.types.StructField("distinct_counts",
          org.apache.spark.sql.types.StringType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      val s = LogTable.snapshot(session, path)
      Seq(Row(s.version, s.partitionCols.mkString(","),
        s.statsCols.mkString(","), s.bloomCols.mkString(","),
        s.files.length,
        s.files.iterator.map(f =>
          f.rows - f.dv.map(_.deleted).getOrElse(0L)).sum,
        s.files.iterator.map(_.bytes).sum,
        s.files.iterator.flatMap(_.dv).map(_.deleted).sum,
        s.constraints.toSeq.sorted
          .map { case (n, e) => s"$n: $e" }.mkString("; "),
        s.properties.toSeq.sorted
          .map { case (n, v) => s"$n=$v" }.mkString("; "),
        // the current version's IN-COMMIT timestamp (null pre-ICT)
        if (s.commitTs > 0L) new java.sql.Timestamp(s.commitTs) else null,
        // ndv.cols estimates from the log-carried sketch union
        s.ndv.toSeq.sorted
          .map { case (c, n) => s"$c=$n" }.mkString("; ")))
    }
  }

  /** `VACUUM` — physical cleanup behind the retention floor; RETAIN n
    * HOURS below the floor needs FORCE, exactly like the programmatic
    * call.
    */
  private[sources] final case class VacuumCommand(path: String,
      retainHours: Option[Long], force: Boolean, dryRun: Boolean = false)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(
        if (dryRun)
          Seq(org.apache.spark.sql.types.StructField("would_delete",
            org.apache.spark.sql.types.StringType, nullable = false))
        else
          Seq(org.apache.spark.sql.types.StructField("files_deleted",
            org.apache.spark.sql.types.IntegerType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      val ms = retainHours.map(_ * 3600000L)
        .getOrElse(LogTable.DefaultRetentionMs)
      // DRY RUN: one row per path vacuum WOULD reclaim, nothing deleted —
      // what an operator reads before an irreversible 100 TB pass
      if (dryRun)
        LogTable.vacuumPreview(session, path, ms, force)
          .map(p => Row(p.toString))
      else Seq(Row(LogTable.vacuum(session, path, ms, force)))
    }
  }

  /** `OPTIMIZE` — partition compaction under the table's persisted
    * layout declarations (cluster/z-order properties travel with the
    * table; a rewrite keeps writing them).
    */
  private[sources] final case class OptimizeCommand(path: String,
      maxFiles: Option[Int], zorderBy: Seq[String] = Nil,
      where: Option[String] = None)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.compactPartitions(session, path,
        maxFilesPerPartition = maxFiles.getOrElse(1),
        zorderBy = zorderBy,
        where = where.map(org.apache.spark.sql.functions.expr))))
  }

  /** `ALTER TABLE ... REPLACE PARTITIONED BY (...)` — partition
    * evolution: ONE metadata commit, zero files rewritten; transform
    * entries (`month(ts)`, `bucket(16, k)`) become generated columns
    * exactly as at CREATE, reusing an existing declaration when the
    * derived name and SQL already match. See
    * [[LogTable.evolvePartitioning]] for read/write semantics.
    */
  private[sources] final case class ReplacePartitioningCommand(path: String,
      entries: Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      val (pcols, gens) = LogTableSql.partitionSpecs(entries)
      Seq(Row(LogTable.evolvePartitioning(session, path, pcols, gens)))
    }
  }

  private[sources] final case class AddConstraintCommand(path: String,
      name: String, expression: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.addConstraint(session, path, name, expression)))
  }

  private[sources] final case class DropConstraintCommand(path: String,
      name: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.dropConstraint(session, path, name)))
  }

  /** `RESTORE TABLE ... TO VERSION AS OF n` — the operational undo as a
    * statement (metadata-only, history preserved; see
    * [[LogTable.restore]]). Returns the new version, −1 if already
    * there.
    */
  private[sources] final case class RestoreCommand(path: String,
      toVersion: Long) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.restore(session, path, toVersion)))
  }

  /** `ALTER TABLE ... SET/UNSET TBLPROPERTIES ('k' = 'v', …)` — one
    * metadata-only commit; engine-owned keys (generators, MV registry,
    * clone provenance) are refused — they change through their own
    * statements. The opt-in `checkpoint.every` knob lands here.
    */
  private[sources] final case class SetPropertiesCommand(path: String,
      set: Map[String, String], unset: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.setProperties(session, path, set, unset)))
  }

  /** `RESTORE TABLE ... TO TIMESTAMP AS OF 'ts'` — the version is the
    * newest commit published at or before the timestamp
    * ([[LogTable.versionAt]]), then the metadata-only restore.
    */
  private[sources] final case class RestoreTsCommand(path: String,
      ts: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      val micros = Cast(Literal(org.apache.spark.unsafe.types.UTF8String
          .fromString(ts), org.apache.spark.sql.types.StringType),
          TimestampType,
          Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null)
      require(micros != null,
        s"graft SQL: cannot parse TIMESTAMP AS OF '$ts'")
      Seq(Row(LogTable.restore(session, path, LogTable.versionAt(
        session, path, micros.asInstanceOf[Long] / 1000L))))
    }
  }

  /** `CHECKPOINT <ref> [EXPIRE]` — write a full-snapshot checkpoint so
    * replay is O(commits since); EXPIRE additionally deletes the commits
    * the checkpoint made redundant (time travel behind it stops, loud).
    */
  private[sources] final case class CheckpointCommand(path: String,
      expire: Boolean) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("expired_commits",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      val v = LogTable.checkpoint(session, path)
      val n = if (expire) LogTable.expireLog(session, path) else 0
      Seq(Row(v, n))
    }
  }

  /** `CREATE TABLE <dst> SHALLOW CLONE <src>` — one metadata commit
    * referencing the source's live files (see [[LogTable.clone]]).
    */
  private[sources] final case class CloneCommand(dst: String, src: String)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.clone(session, src, dst)))
  }

  /** `ALTER TABLE ... ADD COLUMNS (x INT, y STRING)` — append-only,
    * nullable, metadata-only (see [[LogTable.evolveSchema]]); the column
    * list parses with Spark's own schema grammar.
    */
  private[sources] final case class AddColumnsCommand(path: String,
      colsDdl: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      // each top-level entry may end with `DEFAULT <literal>` — a
      // WRITE-side default (batches that omit the column fill it);
      // strip it here, hand the rest to the stock schema parser, and
      // carry the SQL through the connector's own default channel
      val Default = """(?is)^(.*?)\s+DEFAULT\s+(.+?)\s*$""".r
      val Dotted = """(?s)^([\w]+(?:\.[\w]+)+)\s+(.+)$""".r
      val parsed = LogTableSql.splitTopLevel(colsDdl).map { entry =>
        val (ddl, dflt) = entry match {
          case Default(d, v) => (d, Some(v))
          case _ => (entry, None)
        }
        ddl.trim match {
          // NESTED add (`meta.note STRING`): the dotted path addresses a
          // struct field — split the path by hand (the stock schema
          // grammar reads the dot as an error), parse only the type
          case Dotted(dottedName, typeDdl) =>
            val dt = session.sessionState.sqlParser.parseDataType(typeDdl)
            (org.apache.spark.sql.connector.catalog.TableChange.addColumn(
              dottedName.split("\\."), dt, true), dottedName, dflt)
          case flat =>
            val f = session.sessionState.sqlParser.parseTableSchema(flat)
              .fields.head
            (org.apache.spark.sql.connector.catalog.TableChange.addColumn(
              Array(f.name), f.dataType, f.nullable), f.name, dflt)
        }
      }
      Seq(Row(LogTable.evolveSchema(session, path, parsed.map(_._1),
        defaults = parsed.collect { case (_, n, Some(sql)) => n -> sql }
          .toMap)))
    }
  }

  /** `ALTER TABLE ... ALTER COLUMN x TYPE BIGINT` — the widening
    * lattice only; old files never rewritten.
    */
  private[sources] final case class AlterColumnTypeCommand(path: String,
      column: String, typeDdl: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.evolveSchema(session, path, Seq(
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          column.split("\\."),
          session.sessionState.sqlParser.parseDataType(typeDdl))))))
  }

  /** `ALTER TABLE graft.`old` RENAME TO graft.`new`` — one atomic
    * directory move; see [[LogTable.renameTable]] for the clone/MV
    * bookkeeping and refusals. (Named tables rename through the
    * catalog's own ALTER TABLE ... RENAME TO.)
    */
  private[sources] final case class RenameTableCommand(oldPath: String,
      newPath: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Nil
    override def run(session: SparkSession): Seq[Row] = {
      LogTable.renameTable(session, oldPath, newPath)
      Seq.empty
    }
  }

  /** `ALTER TABLE ... RENAME COLUMN a TO b` — metadata-only through the
    * column mapping: the at-rest physical name never moves, zero files
    * rewritten, older versions still read under their own names.
    */
  private[sources] final case class RenameColumnCommand(path: String,
      from: String, to: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.evolveSchema(session, path, Seq(
        org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
          from.split("\\."), to)))))
  }

  /** `ALTER TABLE ... DROP COLUMN [IF EXISTS] c` — metadata-only: the
    * logical schema loses the field, old files keep (and never again
    * project) the physical data, the physical name is tombstoned.
    */
  private[sources] final case class DropColumnCommand(path: String,
      column: String, ifExists: Boolean) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.evolveSchema(session, path, Seq(
        if (ifExists)
          org.apache.spark.sql.connector.catalog.TableChange.deleteColumn(
            column.split("\\."), true)
        else
          org.apache.spark.sql.connector.catalog.TableChange.deleteColumn(
            column.split("\\."), false)))))
  }

  /** `CREATE TABLE graft.`dir` PARTITIONED BY (p[, q]) [STATS BY (c, …)]
    * [ZORDER BY (a, b)] AS SELECT …` — table creation through SQL, onto
    * the same [[LogTable.create]] the programmatic API calls (partition
    * tracking, stats declarations and z-order layout all persisted in
    * the log). The SELECT is real SQL — any source, including other
    * graft tables. A PARTITIONED BY entry may be a GENERATED derivation
    * — `year(ts)`, `month(ts)`, `day(ts)` — creating a derived column
    * named `<src>_year|_month|_day`, materialized on every write and
    * pruned through on reads of the SOURCE column (the
    * Delta-generated-column / Iceberg-transform shape).
    */
  private[sources] final case class CreateTableCommand(path: String,
      partitionCols: Seq[String], statsCols: Seq[String],
      zorderBy: Seq[String], querySql: String,
      properties: Map[String, String] = Map.empty)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      // declared TBLPROPERTIES are USER properties (ndv.cols,
      // checkpoint.every, mv.refreshmode, user metadata) — engine-owned
      // namespaces stay behind their dedicated DDL, same rule as SET
      properties.keys.foreach(k => require(!LogTable.reservedProperty(k),
        s"graft SQL: property `$k` is engine-owned — use its dedicated " +
          "statement (generated columns, clones, column mapping)"))
      val df = GraftBridge.ofRows(session,
        session.sessionState.sqlParser.parsePlan(querySql))
      val (pcols, gens) = LogTableSql.partitionSpecs(partitionCols)
      Seq(Row(LogTable.create(session, path, df, pcols,
        statsCols = statsCols, zorderBy = zorderBy,
        generatedColumns = gens, tableProperties = properties)))
    }
  }

  /** `CREATE TABLE graft.`dir` (col defs) [PARTITIONED BY ...] [STATS BY
    * ...] [TBLPROPERTIES ...]` — the column-list (empty-table) form. A
    * column definition is `name TYPE [NOT NULL] [DEFAULT <lit>]
    * [GENERATED (ALWAYS | BY DEFAULT) AS IDENTITY [(START WITH s
    * INCREMENT BY i)]]`; the identity declaration lands as the
    * `identity.*` table properties (BIGINT only, auto-added to the
    * stats declaration — the high-water rides per-file stats), and the
    * table round-trips through `DESCRIBE DETAIL`'s properties.
    */
  private[sources] final case class CreateTableColsCommand(path: String,
      colsDdl: String, partitionCols: Seq[String], statsCols: Seq[String],
      properties: Map[String, String] = Map.empty)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      properties.keys.foreach(k => require(!LogTable.reservedProperty(k),
        s"graft SQL: property `$k` is engine-owned — use its dedicated " +
          "statement (generated columns, clones, column mapping)"))
      val Identity =
        ("""(?is)^(.*?)\s+GENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+""" +
          """IDENTITY\s*(?:\(\s*(?:START\s+WITH\s+(-?\d+)\s*)?""" +
          """(?:INCREMENT\s+BY\s+(-?\d+)\s*)?\)\s*)?$""").r
      val Default = """(?is)^(.*?)\s+DEFAULT\s+(.+?)\s*$""".r
      var idProps = Map.empty[String, String]
      var defaults = Map.empty[String, String]
      val fields = LogTableSql.splitTopLevel(colsDdl).map { entry =>
        val (d1, idm) = entry match {
          case Identity(rest, mode, st, in) =>
            (rest, Some((mode.toUpperCase.startsWith("ALWAYS"),
              Option(st), Option(in))))
          case _ => (entry, None)
        }
        val (ddl, dflt) = d1 match {
          case Default(d, v) => (d, Some(v))
          case _ => (d1, None)
        }
        val f = session.sessionState.sqlParser.parseTableSchema(ddl)
          .fields.head
        dflt.foreach(v => defaults += f.name -> v)
        idm.foreach { case (always, st, in) =>
          require(idProps.isEmpty,
            "graft SQL: at most one IDENTITY column per table")
          require(f.dataType == org.apache.spark.sql.types.LongType,
            s"graft SQL: identity column `${f.name}` must be BIGINT")
          idProps = Map(LogTable.IdentityColProp -> f.name) ++
            st.map(LogTable.IdentityStartProp -> _) ++
            in.map(LogTable.IdentityIncProp -> _) ++
            (if (always) Map(LogTable.IdentityModeProp -> "always")
             else Map.empty)
        }
        f
      }
      val (pcols, gens) = LogTableSql.partitionSpecs(partitionCols)
      // the identity column must carry stats (the high-water reads them)
      val stats = statsCols ++ idProps.get(LogTable.IdentityColProp)
        .filterNot(c => statsCols.exists(_.equalsIgnoreCase(c)))
      // DEFAULT <literal> → the write-side default property, validated
      // standalone here (the evolveSchema discipline) so a bad
      // declaration fails the CREATE, not some later append
      val defaultProps = defaults.map { case (c, sql) =>
        val dt = fields.find(_.name.equalsIgnoreCase(c)).get.dataType
        try session.range(1).toDF("__r")
          .select(org.apache.spark.sql.functions.expr(sql).cast(dt))
          .queryExecution.analyzed: Unit
        catch { case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"graft SQL: default for `$c` must be a literal expression — " +
              s"`$sql` does not analyze standalone (${e.getMessage})")
        }
        (LogTable.ColDefaultPrefix + c) -> sql
      }
      val empty = session.createDataFrame(
        new java.util.ArrayList[Row](), StructType(fields))
      Seq(Row(LogTable.create(session, path, empty, pcols,
        statsCols = stats, generatedColumns = gens,
        tableProperties = properties ++ idProps ++ defaultProps)))
    }
  }

  /** `CONVERT TO GRAFT graft.`dir` [STATS BY (c, ...)]` — in-place
    * adoption of an existing parquet directory ([[LogTable.convert]]).
    */
  private[sources] final case class ConvertCommand(path: String,
      statsCols: Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(LogTable.convert(session, path, statsCols = statsCols)))
  }

  /** `ALTER TABLE <t> CREATE|PUBLISH|DROP BRANCH <name>` — the
    * write-audit-publish refs ([[LogTable.createBranch]] and friends).
    * CREATE returns the branch path; PUBLISH the published version.
    */
  private[sources] final case class BranchCommand(path: String,
      action: String, name: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "result", org.apache.spark.sql.types.StringType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = action match {
      case "CREATE" =>
        Seq(Row(LogTable.createBranch(session, path, name)))
      case "PUBLISH" =>
        Seq(Row(LogTable.publishBranch(session, path, name).toString))
      case "DROP" =>
        LogTable.dropBranch(session, path, name); Seq(Row("dropped"))
    }
  }

  /** `ALTER TABLE <t> CREATE TAG <name> [AS OF VERSION n] | DROP TAG
    * <name>` — immutable named versions ([[LogTable.tag]]).
    */
  private[sources] final case class TagCommand(path: String, action: String,
      name: String, version: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = action match {
      case "CREATE" =>
        Seq(Row(LogTable.tag(session, path, name, version)))
      case "DROP" =>
        val v = LogTable.tagVersion(session, path, name)
        LogTable.dropTag(session, path, name); Seq(Row(v))
    }
  }

  /** `ALTER TABLE ... ALTER COLUMN c SYNC IDENTITY` — re-align the
    * engine-managed high-water with the column's committed extremum
    * (restores/clones/foreign writers can leave values past it).
    */
  private[sources] final case class SyncIdentityCommand(path: String,
      column: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      val declared = LogTable.snapshot(session, path).properties
        .getOrElse(LogTable.IdentityColProp,
          throw new IllegalArgumentException(
            s"graft SQL: table has no identity column"))
      require(declared.equalsIgnoreCase(column),
        s"graft SQL: `$column` is not the identity column (`$declared` is)")
      Seq(Row(LogTable.syncIdentity(session, path)))
    }
  }

  /** `CREATE MATERIALIZED VIEW graft.`mv` [BUCKETS n] AS SELECT ...` —
    * the defining query is REAL SQL, parsed by Spark's own parser and
    * analyzed through the resolution rule, then pattern-matched into the
    * IVM definition: it must be a single `GROUP BY` over one log table
    * (attribute group keys; count(*)/count(col)/sum/avg/min/max over
    * plain columns — no DISTINCT, FILTER, expressions, joins or WHERE,
    * which the incremental state machine does not maintain). Defines AND
    * populates (the initial refresh), like the Postgres statement.
    */
  private[sources] final case class CreateMvCommand(mvPath: String,
      nBuckets: Option[Int], querySql: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
      import org.apache.spark.sql.catalyst.expressions.aggregate._
      import MaterializedView._
      def bad(why: String): Nothing = throw new IllegalArgumentException(
        s"graft SQL: CREATE MATERIALIZED VIEW needs a single GROUP BY " +
          s"over one log table — $why")
      val analyzed = GraftBridge.ofRows(session,
        session.sessionState.sqlParser.parsePlan(querySql))
        .queryExecution.analyzed
      val agg = analyzed match {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case _ => bad("the query is not a plain aggregate")
      }
      val basePath = agg.child match {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) if fs.location.isInstanceOf[LogTableFileIndex] =>
          fs.location.rootPaths.head.toString
        case other => bad(s"FROM must be exactly a graft.`dir` log table " +
          s"(no joins, filters or projections), got ${other.nodeName}")
      }
      val groupNames = agg.groupingExpressions.map {
        case a: AttributeReference => a.name
        case other => bad(s"group key `${other.sql}` is not a plain column")
      }
      def colOf(e: Expression, ctx: String): String = e match {
        case a: AttributeReference => a.name
        case other => bad(s"$ctx takes a plain column, got `${other.sql}` " +
          "(expressions are not incrementally maintainable state)")
      }
      val aggs = agg.aggregateExpressions.flatMap {
        case a: AttributeReference =>
          if (groupNames.exists(_.equalsIgnoreCase(a.name))) None
          else bad(s"non-aggregate output `${a.name}` is not a group key")
        case al @ Alias(ae: AggregateExpression, name) =>
          if (ae.isDistinct) bad(s"`${al.sql}`: DISTINCT aggregates are " +
            "not incrementally maintainable")
          if (ae.filter.isDefined) bad(s"`${al.sql}`: FILTER clauses are " +
            "not supported")
          Some(ae.aggregateFunction match {
            case Count(Seq(Literal(1, _))) => MvCount(name)
            case Count(Seq(e)) => MvCountCol(name, colOf(e, "count"))
            case Sum(e, _) => MvSum(name, colOf(e, "sum"))
            case Average(e, _) => MvAvg(name, colOf(e, "avg"))
            case Min(e) => MvMin(name, colOf(e, "min"))
            case Max(e) => MvMax(name, colOf(e, "max"))
            // approx_count_distinct maintains a MERGEABLE HLL sketch per
            // group (exact DISTINCT stays refused above — it is not
            // incrementally maintainable; the sketch is)
            case h: HyperLogLogPlusPlus =>
              MvApproxDistinct(name, colOf(h.child, "approx_count_distinct"))
            case other => bad(s"aggregate `${other.prettyName}` is not " +
              "supported (count/count(col)/sum/avg/min/max/" +
              "approx_count_distinct)")
          })
        case other => bad(s"output `${other.sql}` is neither a group key " +
          "nor an aliased aggregate (alias every aggregate: `... AS n`)")
      }
      MaterializedView.define(session, mvPath, basePath, groupNames, aggs,
        nBuckets.getOrElse(16)): Unit
      Seq(Row(MaterializedView.refresh(session, mvPath)))
    }
  }

  /** `REFRESH MATERIALIZED VIEW graft.`mv`` — fold base changes since
    * the last refresh; returns the MV version (−1 = already fresh).
    */
  private[sources] final case class RefreshMvCommand(mvPath: String)
      extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      attrsOf(StructType(Seq(org.apache.spark.sql.types.StructField(
        "version", org.apache.spark.sql.types.LongType, nullable = false))))
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(MaterializedView.refresh(session, mvPath)))
  }

  private[sources] final case class DeleteCommand(path: String,
      conditionSql: String) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      LogTable.deleteWhere(session, path,
        org.apache.spark.sql.functions.expr(conditionSql)): Unit
      Seq.empty
    }
  }

  private[sources] final case class UpdateCommand(path: String,
      set: Seq[(String, String)], conditionSql: Option[String])
      extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.expr
      LogTable.updateWhere(session, path,
        conditionSql.map(expr).getOrElse(lit(true)),
        set.map { case (n, v) => n -> expr(v) }.toMap): Unit
      Seq.empty
    }
  }

  private[sources] final case class MergeCommand(path: String,
      source: LogicalPlan, keyCols: Seq[String], matched: Seq[MatchedSpec],
      notMatched: Seq[InsertSpec],
      notMatchedBySource: Seq[MatchedSpec] = Nil,
      schemaEvolution: Boolean = false)
      extends LeafRunnableCommand {
    override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
    override def run(session: SparkSession): Seq[Row] = {
      require(notMatched.size <= 1,
        "graft SQL: at most one WHEN NOT MATCHED THEN INSERT clause")
      val src = GraftBridge.ofRows(session, source)
      var m = LogTable.mergeInto(session, path, src, keyCols)
      if (schemaEvolution) m = m.withSchemaEvolution()
      matched.foreach { spec =>
        m = spec.set match {
          case Some(s) => m.whenMatchedUpdate(s, spec.condition)
          case None => m.whenMatchedDelete(spec.condition)
        }
      }
      notMatched.foreach(spec =>
        m = m.whenNotMatchedInsert(spec.values, spec.condition))
      notMatchedBySource.foreach { spec =>
        m = spec.set match {
          case Some(s) => m.whenNotMatchedBySourceUpdate(s, spec.condition)
          case None => m.whenNotMatchedBySourceDelete(spec.condition)
        }
      }
      m.run(): Unit
      Seq.empty
    }
  }
}

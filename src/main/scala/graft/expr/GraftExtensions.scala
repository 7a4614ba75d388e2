package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions registration: makes the engine's custom
  * expressions available to SQL as functions. Enable with
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  *
  * Integer tuning parameters (shingle k, hash counts, plane counts) are
  * CONSTRUCTOR fields of the expressions, so the SQL forms require them
  * as integer literals — they size generated loops and must be known at
  * plan time. [[NearestCells]] is deliberately NOT registered: its
  * centroid matrix is driver-trained per corpus and has no literal form.
  *
  * Also injects [[graft.sources.LogTableSql.LogTableRule]], the analysis
  * rule that resolves `graft.`<table dir>`` names to log-table relations
  * and rewrites SQL DML (INSERT/DELETE/UPDATE/MERGE) onto the log
  * table's transactional entry points.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringSeqLit(e: Expression, what: String): Seq[String] = e match {
    case CreateArray(elems, _) if elems.forall {
      case Literal(_: UTF8String, StringType) => true; case _ => false
    } => elems.map { case Literal(s: UTF8String, StringType) => s.toString }
    case other => throw new IllegalArgumentException(
      s"$what must be array(<string literals>), got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_])(build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))

    register("farm_fingerprint64", classOf[FarmFingerprint64])(c => FarmFingerprint64(c.head))
    register("dot_product", classOf[DotProduct])(c => DotProduct(c(0), c(1)))
    register("minhash_shingles", classOf[MinHashShingles])(c =>
      MinHashShingles(c(0), intLit(c(1), "shingle k"), intLit(c(2), "numHashes")))
    register("shingle_hash_set", classOf[ShingleHashSet])(c =>
      ShingleHashSet(c(0), intLit(c(1), "shingle k")))
    register("sig_agreement", classOf[SigAgreement])(c => SigAgreement(c(0), c(1)))
    register("sorted_intersect_size", classOf[SortedIntersectSize])(c =>
      SortedIntersectSize(c(0), c(1)))
    register("simhash64", classOf[SimHash64])(c => SimHash64(c.head))
    register("simhash_bits", classOf[SimHashBits])(c =>
      SimHashBits(c(0), intLit(c(1), "bits")))
    register("hyperplane_sig", classOf[HyperplaneSig])(c =>
      HyperplaneSig(c(0), intLit(c(1), "dim"), intLit(c(2), "numPlanes")))
    register("stopword_hits", classOf[StopwordHits])(c =>
      StopwordHits(c(0), stringSeqLit(c(1), "vocabulary")))
    register("nfc_normalize", classOf[NfcNormalize])(c => NfcNormalize(c.head))

    ext.injectResolutionRule(session =>
      graft.sources.LogTableSql.LogTableRule(session))
    // metadata-only count(*): a global unfiltered count over a log-table
    // relation answers from the log's exact row counts, zero scan
    ext.injectOptimizerRule(session =>
      graft.sources.LogTableSql.MetadataCountRule(session))
    // change feeds as TABLE-valued functions (the Delta table_changes
    // shape): SELECT * FROM graft_changes('path', 1, 5)
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(graft.sources.LogTableSql.getClass.getName,
        "graft_changes"),
      (args: Seq[Expression]) =>
        graft.sources.LogTableSql.changesPlan(args)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_net_changes"),
      new ExpressionInfo(graft.sources.LogTableSql.getClass.getName,
        "graft_net_changes"),
      (args: Seq[Expression]) =>
        graft.sources.LogTableSql.netChangesPlan(args)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_mv"),
      new ExpressionInfo(graft.sources.LogTableSql.getClass.getName,
        "graft_mv"),
      (args: Seq[Expression]) =>
        graft.sources.LogTableSql.mvReadPlan(args)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(graft.sources.LogTableSql.getClass.getName,
        "graft_history"),
      (args: Seq[Expression]) =>
        graft.sources.LogTableSql.historyPlan(args)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_files"),
      new ExpressionInfo(graft.sources.LogTableSql.getClass.getName,
        "graft_files"),
      (args: Seq[Expression]) =>
        graft.sources.LogTableSql.filesPlan(args)))
    // table-lifecycle statements Spark's grammar lacks (DESCRIBE
    // HISTORY / VACUUM / OPTIMIZE / ALTER TABLE ... CONSTRAINT) — a
    // delegating parser in the Delta style; everything else passes
    // through to Spark's own parser untouched
    ext.injectParser((_, delegate) =>
      new graft.sources.LogTableSql.GraftSqlParser(delegate))
  }
}

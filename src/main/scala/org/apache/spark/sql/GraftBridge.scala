package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` Column↔Expression conversion for the
  * engine's custom Catalyst expressions (the standard extension-point
  * pattern — Spark 4 hides the classic converters behind
  * `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A DataFrame over an arbitrary logical plan — `Dataset.ofRows` is
    * `private[sql]`; this is how a custom relation (e.g. a
    * FileIndex-backed HadoopFsRelation) enters the public Dataset API.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Materialize a micro-batch DataFrame handed to a V1 `Sink.addBatch`
    * as an ordinary batch frame over the SAME already-planned rows —
    * the FileStreamSink/Delta-sink pattern: the incoming frame is backed
    * by an `IncrementalExecution` whose plan must not be re-analyzed or
    * multiply re-executed by a downstream transaction; lifting its RDD
    * into a fresh LogicalRDD decouples the two.
    */
  def stripStreaming(data: DataFrame): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }

  /** Run `body` with `spark` as the thread's ACTIVE session — plan
    * statistics (`LogicalPlan.stats`) read the thread-local `SQLConf`,
    * so evaluating a child session's plan under its own conf (e.g. CBO
    * pinned on) needs the child active for the duration. Restores the
    * previous active session; never touches other threads.
    */
  def withActive[T](spark: SparkSession)(body: => T): T =
    spark.asInstanceOf[classic.SparkSession].withActive(body)

  /** Install an extensions object's injected functions into an ALREADY
    * RUNNING session's function registry. `spark.sql.extensions` only
    * applies at session construction; this is the live-session path (and
    * what lets tests exercise the SQL surface on the shared session).
    */
  def installFunctions(spark: SparkSession, ext: SparkSessionExtensions => Unit): Unit = {
    val e = new SparkSessionExtensions
    ext(e)
    e.registerFunctions(spark.sessionState.functionRegistry)
  }
}

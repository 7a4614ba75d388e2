package graft

/** The one-import surface: `import graft.api._` exposes every public
  * entry point of the engine under its short name — the code-level twin
  * of the README's API index, the way the reference exports its public
  * surface from one module (`etlutil/__init__.py:32-51`, `__all__`).
  *
  * Each alias pairs the TYPE (where the entry point is a configurable
  * case class) with its companion (which carries `apply` and the
  * constants), so both `Prune(keys = ...)` and `Prune.byNames` resolve.
  * Package objects are aliased as plain `val`s. Nothing here adds
  * behavior — the facade exists so a user never has to know which
  * subpackage an operator grew up in, and so the compiler (not a doc
  * table) enforces that every advertised name exists.
  */
object api {

  // ----------------------------------------------------- record operators
  type Prune = ops.Prune
  val Prune = ops.Prune
  type Walk = ops.Walk
  val Walk = ops.Walk
  type MoveUnknown = ops.MoveUnknown
  val MoveUnknown = ops.MoveUnknown
  type ConvertTypes = ops.ConvertTypes
  val ConvertTypes = ops.ConvertTypes
  type CleanColumns = ops.CleanColumns
  val CleanColumns = ops.CleanColumns
  type Flatten = ops.Flatten
  val Flatten = ops.Flatten
  type NormalizeDateFields = ops.NormalizeDateFields
  val NormalizeDateFields = ops.NormalizeDateFields
  type DateFieldRule = ops.DateFieldRule
  val DateFieldRule = ops.DateFieldRule
  type JsonStringify = ops.JsonStringify
  val JsonStringify = ops.JsonStringify
  val AsOfJoin = ops.AsOfJoin
  val Validate = ops.Validate
  type TopKAgg = ops.TopKAgg

  // ----------------------------------------------------------------- dates
  val DateKernel = dates.DateKernel
  type DateRange = dates.DateRange
  val DateRange = dates.DateRange
  val DateRanges = dates.DateRanges
  val DateFunctions = functions.DateFunctions

  // ------------------------------------------------------- scale operators
  val Dedup = scale.Dedup
  val Similarity = scale.Similarity
  val TextAnalysis = scale.TextAnalysis
  val Multimodal = scale.Multimodal
  val Stats = scale.Stats
  val Sketches = scale.Sketches

  // ---------------------------------------------------- sources and layout
  val Sources = sources.Sources
  val Merge = sources.Merge
  val LogTable = sources.LogTable
  val ZOrder = functions.ZOrder
  val ShardManifest = sources.shardsource.ShardManifest

  /** `spark.read.format(ShardFormat).load(dir)` — the DataSource V2 tar
    * shard reader (also registered as a service, so the literal string
    * works without this constant).
    */
  val ShardFormat = "graft-shards"

  // -------------------------------------------------------------- streaming
  val StreamOps = streaming.StreamOps

  // ------------------------------------------------------------ table loads
  val Tables = graft.Tables
}

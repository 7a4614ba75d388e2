package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language-ID heuristic, document fingerprinting. All native
  * expressions — one map-side pass per document, no shuffles, no UDFs.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces + standalone punctuation. A cheap
    * deterministic proxy for subword tokenizers (cluster-side parity with
    * an actual BPE requires the vocab file — out of scope by design).
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Distinct-word ratio (repetition detector). */
  def distinctRatio(text: Column): Column = {
    val ws = split(trim(lower(text)), "\\s+")
    size(array_distinct(ws)).cast("double") / size(ws).cast("double")
  }

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double") /
      length(text).cast("double")

  private val stopwords = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"))

  /** Stopword hit ratio for one language list. */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val ws = split(trim(lower(text)), "\\s+")
    val sw = stopwords(lang)
    size(filter(ws, w => w.isin(sw.map(lit(_)): _*))).cast("double") /
      size(ws).cast("double")
  }

  /** n-gram-heuristic language ID: argmax of stopword hits across the
    * built-in lists; ties break by language code order; no hits → "und".
    */
  def langId(text: Column): Column = {
    val ws = split(trim(lower(text)), "\\s+")
    val scored = stopwords.toSeq.sortBy(_._1).map { case (code, sw) =>
      struct(size(filter(ws, w => w.isin(sw.map(lit(_)): _*))).as("hits"),
        lit(code).as("code"))
    }
    val best = scored.reduce((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * vocabulary diversity. Deterministic, monotone in its parts.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val diversity = distinctRatio(text)
    round((lenScore + punct + diversity) / 3.0, 6)
  }

  /** Exact content fingerprint (md5 of normalized text) — cross-engine
    * checkable; see Dedup.contentKey for the prefix variant.
    */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", split(trim(lower(text)), "\\s+")).cast("binary"))

  /** 64-bit rolling fingerprint (xxhash64 of the normalized text) — the
    * cheap cluster-side key for shard-local dedup maps.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(concat_ws(" ", split(trim(lower(text)), "\\s+")))
}

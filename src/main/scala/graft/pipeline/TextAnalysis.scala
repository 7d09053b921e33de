package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All are pure column expressions (whole-stage-codegen friendly, no UDFs)
  * over a `text` column — they scale linearly with the scan.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count (whitespace segmentation). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword count: word-piece segmentation by the GPT-2-style
    * pre-tokenizer regex families (letters / digits / punctuation runs).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      x => length(trim(x)) > 0))

  private val stopwords =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  def stopwordCount(text: Column): Column =
    size(filter(split(lower(text), "\\s+"), x => x.isin(stopwords.map(lit): _*)))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
        length(text))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") /
        tokenCount(text))

  /** Composite quality score in [0, 1]: rewards mid-length documents with a
    * healthy stopword ratio and penalizes punctuation-heavy or fragment-heavy
    * text — the usual pretraining-corpus heuristics (C4/Gopher-style rules).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 5 && nTok <= 100000, lit(1.0)).otherwise(lit(0.25))
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(stopwordCount(text).cast("double") / nTok)
    val stopOk = when(stopRatio >= 0.01, lit(1.0)).otherwise(lit(0.5))
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0)).otherwise(lit(0.5))
    val tokLenOk = when(meanTokenLen(text) >= 2.0 && meanTokenLen(text) <= 12.0,
      lit(1.0)).otherwise(lit(0.5))
    round(lengthOk * 0.4 + stopOk * 0.2 + punctOk * 0.2 + tokLenOk * 0.2, 6)
  }

  /** Language-ID heuristic: trigram-profile scoring against tiny per-language
    * profiles of very frequent function words. Deterministic; tie → 'und'.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "por", "con", "para"))

  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      (lang, size(filter(toks, x => x.isin(ws.map(lit): _*))))
    }
    // argmax with deterministic lexicographic tiebreak via struct compare
    val best = greatest(scores.map { case (lang, s) =>
      struct(s.as("score"), lit(lang).as("lang"))
    }: _*)
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** 64-bit document fingerprint: polynomial rolling hash over the
    * whitespace-normalized text (content-defined, whitespace-insensitive).
    * Implemented with built-in xxhash64 over the normalized form — the
    * rolling-hash semantics (stable under reformatting) with a codegen'd
    * kernel.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Engine-independent fingerprint variant: MD5 hex of the same
    * whitespace-normalized form — reproducible by any engine (the driver's
    * DuckDB oracle recomputes it), where xxhash64 is Spark-specific. Use
    * `fingerprint` in hot paths (codegen'd, 8-byte output), this one where
    * cross-engine verifiability matters.
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))
}

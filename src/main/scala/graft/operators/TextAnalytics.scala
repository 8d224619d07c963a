package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token counting (whitespace + BPE-ish regex), quality scoring, language
  * identification (marker-word n-gram heuristic), and document
  * fingerprinting (normalized-content hash).
  *
  * Everything is built from codegen'd built-in expressions (`split`,
  * `regexp_count`, `md5`, array lambdas) — per-row, shuffle-free map work
  * that scales embarrassingly: at 100 TB each task processes its partition
  * independently and only the (tiny) rollups shuffle.
  */
object TextAnalytics extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.read(s, dir, "documents")

  /** Whitespace token count (fixtures are single-space tokenized). */
  def nTokens(text: Column): Column = size(split(trim(text), " ")).cast(LongType)

  /** BPE-ish pre-tokenizer count: letter runs | digit runs | single
    * non-alphanumeric glyphs — the shape GPT-style pre-tokenizers use. */
  def nBpeTokens(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast(LongType)

  /** Canonical content fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text. Two documents with the same fingerprint are exact dups up
    * to case/whitespace — the standard first pass of corpus dedup. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  private val stopPat = "\\b(the|a|of|and|in|to|is)\\b"

  /** Marker-word language scores. On real corpora these would be char-n-gram
    * profiles; the heuristic stays deterministic + SQL-expressible so the
    * oracle can replay it. */
  private def langScore(text: Column, pat: String): Column =
    regexp_count(lower(text), lit(pat)).cast(LongType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-document surface metrics.
    "q28_text_metrics" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("len_chars"),
        nTokens(col("text")).as("n_tokens"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") /
          nTokens(col("text")), 6).as("avg_token_len"))
        .orderBy(col("doc_id"))),

    // Corpus rollup by language and source. avg_chars is rounded to 6dp on
    // both sides per the determinism contract (README): an unrounded double
    // division is not guaranteed bit-identical across engines.
    "q29_text_rollup" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
        .orderBy(col("lang"), col("source"))),

    // Language ID: argmax of marker-word scores, deterministic tiebreak
    // (en > de > es order on ties).
    "q30_lang_id" -> ((s, dir) => {
      val sEn = langScore(col("text"), "\\b(the|a|of|and|in|to)\\b")
      val sDe = langScore(col("text"), "\\b(der|die|das|und|ist|nicht)\\b")
      val sEs = langScore(col("text"), "\\b(el|la|los|que|es|una)\\b")
      docs(s, dir).select(
        col("doc_id"),
        sEn.as("s_en"), sDe.as("s_de"), sEs.as("s_es"),
        when(sEn >= sDe && sEn >= sEs, lit("en"))
          .when(sDe >= sEs, lit("de"))
          .otherwise(lit("es")).as("predicted"))
        .orderBy(col("doc_id"))
    }),

    // Quality score: bounded length credit + stopword density - punctuation
    // density, a linear proxy for "natural prose" filters.
    "q31_quality_score" -> ((s, dir) => {
      val lenC = length(col("text")).cast("double")
      val toks = nTokens(col("text")).cast("double")
      val stopR = langScore(col("text"), stopPat).cast("double") / toks
      val punctR = regexp_count(col("text"), lit("[.,;:!?]")).cast("double") / lenC
      docs(s, dir).select(
        col("doc_id"),
        round(stopR, 6).as("stop_ratio"),
        round(punctR, 6).as("punct_ratio"),
        round(lit(0.5) * least(lit(1.0), lenC / 500.0) + lit(0.3) * stopR +
          lit(0.2) * (lit(1.0) - punctR), 6).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace vs BPE-ish pre-tokenization.
    "q32_token_count" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        nTokens(col("text")).as("n_ws_tokens"),
        nBpeTokens(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))),

    // Content fingerprint per document.
    "q33_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")))
  )

  val oracles: Map[String, String] = Map(
    "q28_text_metrics" ->
      """SELECT doc_id,
        |       length(text) AS len_chars,
        |       len(string_split(trim(text), ' ')) AS n_tokens,
        |       round(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
        |             len(string_split(trim(text), ' ')), 6) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q29_text_rollup" ->
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q30_lang_id" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS s_en,
        |       len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS s_de,
        |       len(regexp_extract_all(lower(text), '\b(el|la|los|que|es|una)\b')) AS s_es,
        |       CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |            WHEN s_de >= s_es THEN 'de'
        |            ELSE 'es' END AS predicted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_quality_score" ->
      """SELECT doc_id,
        |       round(CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
        |             len(string_split(trim(text), ' ')), 6) AS stop_ratio,
        |       round(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
        |             length(text), 6) AS punct_ratio,
        |       round(0.5 * least(1.0, length(text) / 500.0)
        |           + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
        |                    len(string_split(trim(text), ' ')))
        |           + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
        |                    length(text)), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_token_count" ->
      """SELECT doc_id,
        |       len(string_split(trim(text), ' ')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

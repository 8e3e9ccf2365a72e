package graft.functions

import graft.{Tables, U}
import graft.plans.PolyHash64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines — SURVEY.md §2 B.6
  * `text_stats` + language-ID, token counting, quality scoring, document
  * fingerprinting. All single-scan, codegen'd built-ins (the language-ID
  * profiles are broadcast literals, not a join).
  */
object TextOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Tiny stopword profiles per language — n-gram/stopword heuristic
    * language ID. Deterministic argmax (ties broken by profile order). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "mit", "von", "nicht"),
    "es" -> Seq("el", "la", "de", "y", "los", "que", "es", "con"),
    "fr" -> Seq("le", "la", "et", "les", "des", "que", "est", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "wo", "you", "he", "ni"))

  /** Predicted language of a token-array column: most stopword hits wins;
    * ties resolve to the earliest profile (via negated index in the
    * ordering struct, picked by array_max's lexicographic struct order). */
  def langIdCol(tokens: Column): Column = {
    val scored = langProfiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(array_intersect(array_distinct(tokens), typedlit(words))).as("score"),
        lit(-i).as("rank"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Quality score in [0,1]: penalizes too-short docs, high punctuation
    * density, and stopword-free (non-linguistic) content. */
  def qualityCol(text: Column): Column = {
    val tokens = split(text, " ")
    val nTok = size(tokens)
    val lenScore = least(nTok.cast("double") / 20.0, lit(1.0))
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:]", ""))
    val punctScore = lit(1.0) - least(punct.cast("double") * 10.0 / length(text), lit(1.0))
    val stops = typedlit(langProfiles.flatMap(_._2).distinct)
    val stopScore =
      least(size(array_intersect(array_distinct(tokens), stops)).cast("double") / 3.0,
        lit(1.0))
    lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-document surface statistics (oracle-checked).
    "text_stats" -> ((s, d) => {
      val text = col("text")
      val tokens = split(text, " ")
      val stops = typedlit(Seq("the", "a", "of", "and", "or", "to", "in"))
      t(s, d, "documents").select(
        col("doc_id"),
        U.lng(length(text)).as("n_chars"),
        U.lng(size(tokens)).as("n_tokens"),
        round(length(regexp_replace(text, " ", "")).cast("double") /
          size(tokens), 6).as("avg_token_len"),
        round((length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
          .cast("double") / length(text), 6).as("punct_ratio"),
        round(size(array_intersect(array_distinct(tokens), stops))
          .cast("double") / size(array_distinct(tokens)), 6).as("stop_hit_ratio"))
        .orderBy("doc_id")
    }),

    // Whitespace + BPE-ish regex token counts (oracle-checked).
    "text_token_count" -> ((s, d) => {
      val text = col("text")
      val bpeish = regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))
      t(s, d, "documents").select(
        col("doc_id"),
        U.lng(size(split(text, " "))).as("ws_tokens"),
        U.lng(size(bpeish)).as("bpe_tokens"),
        round(length(text).cast("double") / size(bpeish), 6).as("chars_per_token"))
        .orderBy("doc_id")
    }),

    // Heuristic language ID (no oracle: heuristic is engine-defined;
    // accuracy on a labeled fixture asserted in TextOpsSpec).
    "text_lang_id" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), col("lang").as("labeled_lang"),
        langIdCol(split(lower(col("text")), " ")).as("predicted_lang"))
        .orderBy("doc_id")),

    // Composite quality score (no oracle: engine-defined heuristic).
    "text_quality_score" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), round(qualityCol(col("text")), 6).as("quality"))
        .orderBy("doc_id")),

    // Document fingerprint via the native codegen'd expression.
    "text_fingerprint" -> ((s, d) => {
      PolyHash64.register(s)
      t(s, d, "documents")
        .select(col("doc_id"), expr("poly_hash64(text)").as("fingerprint"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
        |        len(string_split(text, ' ')), 6) AS avg_token_len,
        |  round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |        AS DOUBLE) / length(text), 6) AS punct_ratio,
        |  round(CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |        ['the','a','of','and','or','to','in'])) AS DOUBLE) /
        |        len(list_distinct(string_split(text, ' '))), 6) AS stop_hit_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
        |  round(CAST(length(text) AS DOUBLE) /
        |        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')), 6)
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

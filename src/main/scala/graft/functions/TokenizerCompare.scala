package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.U

/** Tokenizer selection eval — the corpus-level readout a pipeline runs
  * before committing to a vocabulary: BPE ([[Bpe]]) vs byte-level BPE
  * ([[ByteBpe]]) vs unigram-LM ([[Unigram]]) vs WordPiece
  * ([[WordPiece]]) fertility (tokens per word) and compression (chars
  * per token) on the SAME corpus. Composition evidence by design:
  * every row aggregates the REGISTERED apply queries (the trained
  * models, reused, not re-derived), and the oracle composes the
  * engines' existing replay stacks (the two BPE replace-chains, the
  * unigram Viterbi DP, and the WordPiece longest-match walk) as
  * subqueries.
  *
  * Universe note (part of the contract, mirrored in the oracle): each
  * tokenizer reports over ITS OWN qualifying-word universe — both BPEs
  * over all non-empty words, unigram over words of length 1..
  * [[Unigram.MaxWordLen]], WordPiece over the same minus `#`-bearing
  * words — so n_words/n_chars can differ between the rows; the
  * per-word and per-token RATIOS are what the comparison is for, and
  * each is internally consistent. The bytebpe row's "n_chars" is its
  * native n_bytes (UTF-8 bytes ARE its alphabet; equal to chars on an
  * ASCII corpus) — chars_per_token reads bytes_per_token for that row.
  */
object TokenizerCompare {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_compare_tokenizers" -> ((s, d) => {
      def shape(df: DataFrame, name: String, tokCol: String,
          charsCol: String = "n_chars"): DataFrame =
        df.agg(U.lng(sum(col("n_words"))).as("n_words"),
            U.lng(sum(col(tokCol))).as("n_tokens"),
            U.lng(sum(col(charsCol))).as("n_chars"))
          .select(lit(name).as("tokenizer"), col("n_words"),
            col("n_tokens"), col("n_chars"))
      shape(Bpe.queries("vocab_bpe_apply")(s, d), "bpe", "n_bpe_tokens")
        .unionByName(shape(ByteBpe.queries("vocab_bytebpe_apply")(s, d),
          "bytebpe", "n_tokens", "n_bytes"))
        .unionByName(shape(Unigram.queries("vocab_unigram_apply")(s, d),
          "unigram", "n_pieces"))
        .unionByName(shape(
          WordPiece.queries("vocab_wordpiece_apply")(s, d),
          "wordpiece", "n_pieces"))
        .select(col("tokenizer"), col("n_words"), col("n_tokens"),
          col("n_chars"),
          U.round6(col("n_tokens").cast("double") / col("n_words"))
            .as("tokens_per_word"),
          U.round6(col("n_chars").cast("double") / col("n_tokens"))
            .as("chars_per_token"))
        .orderBy("tokenizer")
    }))

  /** Dynamic: composes the four trained-model replays once all have
    * materialized (graft.Verify's run-queries-then-dump order
    * guarantees it — the compare query itself trains all four). */
  def oracles: Map[String, String] =
    (Bpe.applyOracleSqlCurrent, ByteBpe.applyOracleSqlCurrent,
      Unigram.applyOracleSqlCurrent,
      WordPiece.applyOracleSqlCurrent) match {
      case (Some(b), Some(bb), Some(u), Some(wp)) => Map(
        "vocab_compare_tokenizers" ->
          s"""SELECT tokenizer, n_words, n_tokens, n_chars,
             |  round(CAST(n_tokens AS DOUBLE) / n_words * 1000000)
             |    / 1000000 AS tokens_per_word,
             |  round(CAST(n_chars AS DOUBLE) / n_tokens * 1000000)
             |    / 1000000 AS chars_per_token
             |FROM (
             |  SELECT 'bpe' AS tokenizer,
             |    CAST(sum(n_words) AS BIGINT) AS n_words,
             |    CAST(sum(n_bpe_tokens) AS BIGINT) AS n_tokens,
             |    CAST(sum(n_chars) AS BIGINT) AS n_chars
             |  FROM (
             |$b
             |  ) bpe_rows
             |  UNION ALL
             |  SELECT 'bytebpe' AS tokenizer,
             |    CAST(sum(n_words) AS BIGINT) AS n_words,
             |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |    CAST(sum(n_bytes) AS BIGINT) AS n_chars
             |  FROM (
             |$bb
             |  ) bytebpe_rows
             |  UNION ALL
             |  SELECT 'unigram' AS tokenizer,
             |    CAST(sum(n_words) AS BIGINT) AS n_words,
             |    CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
             |    CAST(sum(n_chars) AS BIGINT) AS n_chars
             |  FROM (
             |$u
             |  ) uni_rows
             |  UNION ALL
             |  SELECT 'wordpiece' AS tokenizer,
             |    CAST(sum(n_words) AS BIGINT) AS n_words,
             |    CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
             |    CAST(sum(n_chars) AS BIGINT) AS n_chars
             |  FROM (
             |$wp
             |  ) wp_rows)
             |ORDER BY tokenizer""".stripMargin)
      case _ => Map.empty
    }
}

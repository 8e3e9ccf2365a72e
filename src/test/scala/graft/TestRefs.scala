package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference implementations pinned for parity tests — kept in ONE place
  * so the semantics the fused expressions are checked against can't
  * drift between test files.
  */
object TestRefs {

  /** The pre-fusion HOF shingling `wordKShingles` replaced: distinct
    * positional k-grams via transform/slice/array_join, with the
    * `< k words → one gram` fallback. NOTE: for NULL text this yields
    * [NULL]; the fused expression deliberately yields NULL instead
    * (no phantom null-gram row) — see Dedup.wordKShingles. */
  def hofShingles(text: Column, k: Int): Column = {
    val words = split(lower(text), " ")
    when(size(words) >= k,
      array_distinct(transform(sequence(lit(0), size(words) - k),
        i => array_join(slice(words, i + 1, lit(k)), " "))))
      .otherwise(array(array_join(words, " ")))
  }
}

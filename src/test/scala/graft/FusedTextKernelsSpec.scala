package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r17 fused per-doc kernels (plans.GopherRep /
  * plans.CharEntropyStats) to the exploded relational formulations they
  * replaced — run side by side on the same corpus slice plus crafted
  * edge docs (multibyte chars, separators-in-words, single-word,
  * all-repeated), so a kernel drift from the oracle's contract fails
  * here before the oracle ever sees it. */
class FusedTextKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r17 relational gopher-repetition stats, verbatim. */
  private def gopherRelational(docs: DataFrame): DataFrame = {
    val gramNs = Seq(1, 2, 5)
    val emit = gramNs.map { n =>
      when(size(col("w")) >= n,
        transform(sequence(lit(0), size(col("w")) - n),
          i => struct(lit(n).as("n"),
            concat_ws("", slice(col("w"), i + lit(1), lit(n)))
              .as("gm"))))
        .otherwise(array().cast("array<struct<n:int,gm:string>>"))
    }
    val counts = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(concat(emit: _*)).as("g"))
      .groupBy(col("doc_id"), col("g.n").as("n"), col("g.gm").as("gm"))
      .agg(count(lit(1)).as("c"))
      .withColumn("gl", U.lng(length(col("gm"))) - (col("n") - 1))
    counts.groupBy("doc_id")
      .agg(
        max(when(col("n") === 2,
          struct(col("c"), col("gl"), col("gm")))).as("top2"),
        sum(when(col("n") === 5 && col("c") >= 2, col("c") * col("gl"))
          .otherwise(0L)).as("dup5"),
        sum(when(col("n") === 1 && col("c") >= 2, col("c") * col("gl"))
          .otherwise(0L)).as("dupw"))
      .select(col("doc_id"), col("top2.c").as("top2_c"),
        col("top2.gl").as("top2_gl"), col("dup5"), col("dupw"))
  }

  private def gopherKernel(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      call_function("gopher_rep", split(col("text"), " ")).as("g"))
    .select(col("doc_id"), col("g.top2_c").as("top2_c"),
      col("g.top2_gl").as("top2_gl"), col("g.dup5").as("dup5"),
      col("g.dupw").as("dupw"))

  private val edgeDocs = Seq(
    (1L, "a b a b a b"),                 // repeated 2-grams
    (2L, "x"),                           // single word: no 2/5-grams
    (3L, "one two three four five one two three four five"), // dup 5-gram
    (4L, "héllo wörld héllo wörld héllo"), // multibyte chars
    (5L, "z z z z z z z z"),             // one word repeated
    (6L, "a bc abc a bc"),         // separator char inside a word
    (7L, "m n"),                         // exactly one 2-gram
    (8L, "p q p r p q p r p q"))         // frequency ties
    .toDF("doc_id", "text")

  test("gopher_rep kernel ≡ relational gram explode on edge docs") {
    val rel = gopherRelational(edgeDocs).orderBy("doc_id").collect()
    val ker = gopherKernel(edgeDocs).orderBy("doc_id").collect()
    assert(rel.length === ker.length)
    rel.zip(ker).foreach { case (a, b) => assert(a === b, s"doc ${a.get(0)}") }
  }

  test("gopher_rep kernel ≡ relational gram explode on the corpus") {
    val docs = Tables.t(spark, sfDir, "documents")
      .filter(length(regexp_replace(col("text"), " ", "")) > 0)
      .select("doc_id", "text").limit(300)
    val rel = gopherRelational(docs).orderBy("doc_id").collect()
    val ker = gopherKernel(docs).orderBy("doc_id").collect()
    assert(rel.length === ker.length && rel.nonEmpty)
    rel.zip(ker).foreach { case (a, b) => assert(a === b, s"doc ${a.get(0)}") }
  }

  /** The pre-r17 relational char-entropy stats, verbatim. */
  private def entropyRelational(docs: DataFrame): DataFrame = {
    val h = log(col("n").cast("double")) - col("sl") / col("n")
    docs.select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("cc"))
      .groupBy("doc_id")
      .agg(U.lng(sum(col("cc"))).as("n"),
        count(lit(1)).as("n_distinct_chars"),
        U.dbl(sum(U.dec6r(
          col("cc") * log(col("cc").cast("double"))))).as("sl"))
      .select(col("doc_id"), col("n"), col("n_distinct_chars"),
        U.round6(h).as("entropy"))
  }

  test("char_entropy_stats kernel ≡ relational char explode (corpus + edges)") {
    val edge = Seq(
      (9000001L, "aaaa"), (9000002L, "abcd"), (9000003L, "ü"),
      (9000004L, "üüüaü b𝄞𝄞"), // multibyte incl. a 4-byte code point
      (9000005L, "x y x y x")).toDF("doc_id", "text")
    val docs = Tables.t(spark, sfDir, "documents")
      .filter(length(col("text")) > 0).select("doc_id", "text").limit(300)
      .unionByName(edge)
    val rel = entropyRelational(docs).orderBy("doc_id").collect()
    val ker = functions.TextOps.charEntropyOf(docs, col("text"))
      .orderBy("doc_id").collect()
    assert(rel.length === ker.length && rel.nonEmpty)
    rel.zip(ker).foreach { case (a, b) =>
      assert(a === b, s"doc ${a.get(0)}: rel=$a kernel=$b")
    }
  }

  test("char_entropy_stats: null text drops (explode analog), empty is filtered upstream") {
    val docs = Seq((1L, Option("ab")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = functions.TextOps.charEntropyOf(docs, col("text")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2, one entry per
  * implemented operator; `oracleSql` carries the DuckDB-equivalent ANSI SQL
  * for every SQL-expressible entry (keys absent here get the weaker
  * rows-only check: approximate sketches, hash-based dedup/LSH, custom
  * expressions, streaming-only ops).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Pipeline.flagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.CoreOps.queries ++
      operators.Joins.queries ++
      operators.Aggregates.queries ++
      operators.Windows.queries ++
      operators.SetOps.queries ++
      operators.SqlSurface.queries ++
      operators.Pipeline.queries ++
      operators.Pruning.queries ++
      operators.Graph.queries ++
      operators.Market.queries ++
      operators.Stats.queries ++
      operators.Resample.queries ++
      sources.Discovery.queries ++
      functions.ScalarFuncs.queries ++
      functions.TextOps.queries ++
      functions.Bpe.queries ++
      functions.ByteBpe.queries ++
      functions.Unigram.queries ++
      functions.WordPiece.queries ++
      functions.TokenizerCompare.queries ++
      dedup.Dedup.queries ++
      similarity.Similarity.queries ++
      multimodal.Multimodal.queries ++
      streaming.StreamingOps.queries ++
      ml.Logreg.queries ++
      ml.Pca.queries ++
      ml.NaiveBayes.queries ++
      ml.Ridge.queries ++
      ml.Gmm.queries ++
      ml.Stump.queries

  def oracleSql: Map[String, String] =
    operators.CoreOps.oracles ++
      operators.Joins.oracles ++
      operators.Aggregates.oracles ++
      operators.Windows.oracles ++
      operators.SetOps.oracles ++
      operators.SqlSurface.oracles ++
      operators.Pipeline.oracles ++
      operators.Pruning.oracles ++
      operators.Graph.oracles ++
      operators.Market.oracles ++
      operators.Stats.oracles ++
      operators.Resample.oracles ++
      sources.Discovery.oracles ++
      functions.ScalarFuncs.oracles ++
      functions.TextOps.oracles ++
      functions.Bpe.oracles ++
      functions.ByteBpe.oracles ++
      functions.Unigram.oracles ++
      functions.WordPiece.oracles ++
      functions.TokenizerCompare.oracles ++
      dedup.Dedup.oracles ++
      similarity.Similarity.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.StreamingOps.oracles ++
      ml.Logreg.oracles ++
      ml.Pca.oracles ++
      ml.NaiveBayes.oracles ++
      ml.Ridge.oracles ++
      ml.Gmm.oracles ++
      ml.Stump.oracles
}

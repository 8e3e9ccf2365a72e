package graft

import org.apache.spark.sql.functions._

/** Determinism contract of the trainable quality gate (ml.Logreg): the
  * learned weights must be BIT-identical regardless of partitioning —
  * the whole point of the decimal-bridged gradient sums. */
class MlSpec extends SparkSpec {
  import spark.implicits._

  test("logreg training is partition-count invariant (bit-identical weights)") {
    val w1 = ml.Logreg.train(spark, sfDir)
    // same training run with the corpus forced through a different
    // partitioning: a raw double gradient sum would fold in a different
    // order and drift in the last ulps; the DECIMAL bridge must not
    val docs = Tables.t(spark, sfDir, "documents")
    val skewed = docs.repartition(3, col("lang"))
    val tmp = java.nio.file.Files.createTempDirectory("lrpart").toString
    skewed.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val w2 = ml.Logreg.train(spark, tmp)
    assert(w1.toSeq === w2.toSeq)
  }

  test("logreg gate: scores are calibrated probabilities, apply matches train") {
    val applied = ml.Logreg.queries("ml_logreg_apply")(spark, sfDir)
      .select($"score").as[Double].collect()
    assert(applied.forall(s => s >= 0.0 && s <= 1.0))
    // weights served to apply are the memoized training result
    val w = ml.Logreg.weights(spark, sfDir)
    val trained = ml.Logreg.queries("ml_logreg_train")(spark, sfDir)
      .head()
    (0 to ml.Logreg.NFeatures).foreach { j =>
      assert(trained.getDouble(j) === math.round(w(j) * 1e6) / 1e6)
    }
  }
}

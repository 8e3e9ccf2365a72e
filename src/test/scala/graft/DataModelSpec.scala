package graft

import graft.model._

class DataModelSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq(
    FactRow("d1-AAAC", "cell_by_bin", "d1", "bin1", 2.0),
    FactRow("d1-AAAC", "cell_by_bin", "d1", "bin2", 1.0),
    FactRow("d1-TTTG", "cell_by_bin", "d1", "bin1", 3.0),
    FactRow("d2-AAAC", "cell_by_bin", "d2", "bin1", 4.0))

  test("typed obs dimension derives barcode and carries tissue") {
    val obs = DataModel.obsFromFact(spark, fact.toDS(), "lung")
      .collect().sortBy(_.cell_id)
    assert(obs.toSeq === Seq(
      CellObs("d1-AAAC", "AAAC", "d1", "lung"),
      CellObs("d1-TTTG", "TTTG", "d1", "lung"),
      CellObs("d2-AAAC", "AAAC", "d2", "lung")))
  }

  test("typed donor annotation joins by dataset uuid, drops unknown") {
    val obs = DataModel.obsFromFact(spark, fact.toDS(), "lung")
    val donors = Seq(DonorMeta("d1", Some(61.0), Some("F"), None)).toDS()
    val annotated = DataModel.annotateObs(spark, obs, donors).collect()
    assert(annotated.length === 2) // d2 cells dropped (no donor row)
    assert(annotated.forall { case (o, d) => o.dataset == "d1" && d.age.contains(61.0) })
  }

  test("sparse COO semantics: absent entries are zero by convention") {
    val ds = fact.toDS()
    // densify cell d1-TTTG over the full feature set: bin2 absent → 0
    val features = ds.map(_.feature_id).distinct().collect().sorted
    val dense = features.map { f =>
      ds.filter(r => r.cell_id == "d1-TTTG" && r.feature_id == f)
        .collect().headOption.map(_.value).getOrElse(0.0)
    }
    assert(dense.toSeq === Seq(3.0, 0.0))
  }
}

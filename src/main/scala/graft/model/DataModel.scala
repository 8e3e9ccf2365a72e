package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed data model — SURVEY.md §1.4: the AnnData/MuData container mapped
  * to a star schema, with case-class `Dataset[T]` at API boundaries
  * (type safety where callers compose programs) and `DataFrame` inside
  * operators (where schema is dynamic).
  *
  *  - `X` (cells × features, sparse) → long/COO [[FactRow]]: absent
  *    entry = 0, matching AnnData sparse semantics (`bin/concatenate.py:
  *    115`); partitioned by (modality, dataset) on disk.
  *  - `obs` (per-cell metadata, `bin/concatenate.py:66-77`) → [[CellObs]].
  *  - donor TSV (`:105-111`) → [[DonorMeta]].
  */
final case class FactRow(
    cell_id: String, modality: String, dataset: String,
    feature_id: String, value: Double)

final case class CellObs(
    cell_id: String, barcode: String, dataset: String, tissue: String)

final case class DonorMeta(
    uuid: String, age: Option[Double], sex: Option[String],
    bmi: Option[Double])

object DataModel {

  /** Build the typed obs dimension from a fact table: surrogate-key
    * split recovers barcode (str_concat_key inverse, property-tested). */
  def obsFromFact(s: SparkSession, fact: Dataset[FactRow],
      tissue: String): Dataset[CellObs] = {
    import s.implicits._
    fact.select($"cell_id", $"dataset").distinct()
      .withColumn("barcode", substring_index($"cell_id", "-", -1))
      .withColumn("tissue", lit(tissue))
      .select("cell_id", "barcode", "dataset", "tissue")
      .as[CellObs]
  }

  /** [[obsFromFact]] with the reference's per-dataset tissue fallback
    * (`bin/concatenate.py:60-61`): a known tissue annotates every row as
    * a literal; when absent, each dataset's tissue resolves through
    * `resolveTissue` — in production [[graft.sources.EntityApi]]'s
    * entity-API lookup — over the DISTINCT dataset list (dim-sized by
    * construction: one per dataset, ≤ thousands), entering the plan as a
    * broadcast map lookup. A dataset the resolver cannot name fails
    * loudly rather than annotating null. */
  def obsFromFact(s: SparkSession, fact: Dataset[FactRow],
      tissue: Option[String],
      resolveTissue: Seq[String] => Map[String, String]): Dataset[CellObs] = {
    import s.implicits._
    tissue match {
      case Some(t) => obsFromFact(s, fact, t)
      case None =>
        val keys = fact.select($"cell_id", $"dataset").distinct()
          .withColumn("barcode", substring_index($"cell_id", "-", -1))
        // Driver-side resolution over the distinct dataset dim (a bounded
        // collect, same class as the donor dim); the resolved map rejoins
        // as a typedlit lookup — no shuffle, stays in codegen.
        val datasets = keys.select($"dataset").distinct()
          .as[String].collect().toSeq
        val resolved = resolveTissue(datasets)
        val missing = datasets.filterNot(resolved.contains)
        require(missing.isEmpty,
          s"tissue resolver returned no tissue for dataset(s): " +
            missing.mkString(", "))
        keys.withColumn("tissue",
            element_at(typedlit(resolved), $"dataset"))
          .select("cell_id", "barcode", "dataset", "tissue")
          .as[CellObs]
    }
  }

  /** Typed donor join: annotate obs rows with donor metadata by dataset
    * uuid (inner — cells with unknown uuid drop, matching the reference's
    * merge semantics, `bin/concatenate.py:105-111`). */
  def annotateObs(s: SparkSession, obs: Dataset[CellObs],
      donors: Dataset[DonorMeta]): Dataset[(CellObs, DonorMeta)] = {
    import s.implicits._
    obs.joinWith(broadcast(donors), obs("dataset") === donors("uuid"), "inner")
  }
}

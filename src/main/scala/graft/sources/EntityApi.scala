package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side entity-API organ lookup — the per-dataset tissue fallback
  * the reference applies when no tissue argument is supplied
  * (`bin/concatenate.py:22-28`: GET `{entity}/dataset/{uuid}/organs/` →
  * organ code, `organ_types.yaml` code → name, strip the " (Left)" /
  * " (Right)" laterality suffix; applied at `:60-61` only for datasets
  * whose tissue is not already known).
  *
  * Deliberately DRIVER-SIDE, like [[EsFetch]]: the lookup universe is the
  * dataset dimension (one row per dataset, ≤ thousands), and the result
  * enters the plan as a broadcast-sized (dataset, tissue) dim — executors
  * never open HTTP connections. Each code is fetched ONCE per distinct
  * dataset regardless of how many cells it annotates.
  *
  * Failure semantics are loud where the reference's are silent: a non-200
  * status, an empty body, or a code absent from the organ dictionary all
  * throw with the dataset named — a fallback that silently mislabels
  * tissue poisons every downstream group-by.
  */
object EntityApi {

  /** Strip the reference's laterality suffixes (`concatenate.py:28`). */
  def stripLaterality(organName: String): String =
    organName.replace(" (Left)", "").replace(" (Right)", "")

  /** GET the organ code for one dataset from the entity endpoint. */
  def organCode(client: HttpClient, entityEndpoint: String,
      dataset: String): String = {
    val uri = URI.create(
      s"${entityEndpoint.stripSuffix("/")}/dataset/$dataset/organs/")
    val resp = client.send(HttpRequest.newBuilder(uri).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"entity API answered ${resp.statusCode()} for dataset '$dataset' " +
        s"($uri): ${resp.body().take(200)}")
    val code = resp.body().trim
    require(code.nonEmpty, s"entity API returned an empty organ code " +
      s"for dataset '$dataset' ($uri)")
    code
  }

  /** Resolve tissue names for `datasets` via the entity API + organ
    * dictionary (the [[YamlDim.loadMap]] of `organ_types.yaml`). One GET
    * per distinct dataset, driver-side; unknown codes fail loudly with
    * the dataset and code named (the reference's `organ_dict[organ_code]`
    * KeyErrors the same way, `concatenate.py:27`). */
  def resolveTissues(entityEndpoint: String, datasets: Seq[String],
      organDict: Map[String, String]): Map[String, String] = {
    val client = HttpClient.newHttpClient()
    datasets.distinct.map { ds =>
      val code = organCode(client, entityEndpoint, ds)
      val name = organDict.getOrElse(code, throw new IllegalArgumentException(
        s"entity API returned organ code '$code' for dataset '$ds' " +
          "but the organ dictionary has no such code"))
      ds -> stripLaterality(name)
    }.toMap
  }

  /** The resolved lookup as a broadcast-sized (dataset, tissue) dim for
    * plan-side joins. The distinct-dataset list itself comes from the
    * discovery layer ([[EsFetch.discover]] / [[EsResponse.pagedDatasets]]),
    * which is already dim-sized by construction. */
  def tissueDim(spark: SparkSession, entityEndpoint: String,
      datasets: Seq[String], organDict: Map[String, String]): DataFrame = {
    import spark.implicits._
    resolveTissues(entityEndpoint, datasets, organDict).toSeq
      .toDF("dataset", "tissue")
  }
}

package graft

import graft.sources.YamlDim
import org.apache.spark.sql.functions._

/** Golden test for the YAML code-dictionary source: organ_types.yaml-shaped
  * input → broadcast dim → laterality-stripped rollup — the
  * `convert_tissue_code` + `get_tissue_type` path of the reference
  * (`bin/concatenate.py:23-35`), on an original fixture.
  */
class YamlDimSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    """# organ code dictionary (fixture — organ_types.yaml shape)
      |HT:
      |  description: Heart
      |LK:
      |  description: Kidney (Left)
      |RK:
      |  description: Kidney (Right)
      |SP:   # trailing comment on the code line
      |  description: Spleen
      |
      |ZZ:
      |  description: Placeholder Organ
      |  extra_field: kept independently
      |""".stripMargin

  private def writeFixture(): String = {
    val f = java.nio.file.Files.createTempFile("organ_types", ".yaml")
    java.nio.file.Files.write(f, fixture.getBytes("UTF-8"))
    f.toString
  }

  test("parse: codes, attributes, comments, blank lines; order preserved") {
    val parsed = YamlDim.parse(fixture)
    assert(parsed.map(_._1) === Seq("HT", "LK", "RK", "SP", "ZZ"))
    assert(parsed.toMap.apply("LK") === Map("description" -> "Kidney (Left)"))
    assert(parsed.toMap.apply("ZZ")("extra_field") === "kept independently")
  }

  test("comment rule: '#' opens a comment only at start or after whitespace") {
    val parsed = YamlDim.parse(
      "W1:\n  description: Ward#2 Biopsy\nW2:\n  description: Ward #2 Biopsy")
    assert(parsed.toMap.apply("W1")("description") === "Ward#2 Biopsy")
    assert(parsed.toMap.apply("W2")("description") === "Ward")
  }

  test("parse refuses constructs outside the dictionary subset, loudly") {
    val nested = intercept[IllegalArgumentException](
      YamlDim.parse("AO:\n  meta:\n    deep: 1"))
    assert(nested.getMessage.contains("empty or nested value not supported"))
    val seq = intercept[IllegalArgumentException](
      YamlDim.parse("AO:\n  - item"))
    assert(seq.getMessage.contains("unsupported YAML construct"))
    val dup = intercept[IllegalArgumentException](
      YamlDim.parse("AO:\n  description: A\nAO:\n  description: B"))
    assert(dup.getMessage.contains("duplicate code"))
    val headless = intercept[IllegalArgumentException](
      YamlDim.parse("  description: orphan"))
    assert(headless.getMessage.contains("before any code"))
  }

  test("golden: code join + laterality strip rolls both kidneys together") {
    val path = writeFixture()
    val dim = YamlDim.load(spark, path)
    assert(dim.count() === 5)
    val datasets = Seq(
      ("d1", "HT"), ("d2", "LK"), ("d3", "RK"), ("d4", "LK"))
      .toDF("dataset_id", "organ_code")
    val joined = datasets
      .join(broadcast(dim), datasets("organ_code") === dim("code"))
      // str_strip_laterality (bin/concatenate.py:28)
      .withColumn("organ",
        regexp_replace(col("description"), " \\((Left|Right)\\)$", ""))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"dim join must broadcast:\n$p")
    val rollup = joined.groupBy("organ").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rollup === Map("Heart" -> 1L, "Kidney" -> 3L))
    // missing-field contract: asking for a field a code lacks names it
    val miss = intercept[IllegalArgumentException](
      YamlDim.load(spark, path, field = "extra_field"))
    assert(miss.getMessage.contains("has no 'extra_field'"))
    // typedlit path agrees with the DataFrame path
    val m = YamlDim.loadMap(spark, path)
    assert(m("SP") === "Spleen" && m.size === 5)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for code→attributes dimension files in the two-level YAML shape
  * of the reference's organ-type dictionary
  * (`/root/reference/bin/organ_types.yaml:1-107`, loaded at
  * `bin/concatenate.py:23-35` and `bin/make_uuids_tsv.py:146-148`):
  *
  * {{{
  * AO:
  *   description: Aorta
  * LK:
  *   description: Kidney (Left)
  * }}}
  *
  * Scale shape: a dimension like this is O(100) rows — it is parsed ONCE
  * on the driver and enters the plan as a broadcast dim table (or a
  * `typedlit` map for the single-attribute case, see `join_lookup_code`).
  * The executors never read the YAML file.
  *
  * The parser covers exactly the subset such dictionaries use — top-level
  * `CODE:` keys, 2+-space-indented `field: value` attributes, `#`
  * comments, blank lines — and REFUSES anything else (sequences, nested
  * maps, multi-line scalars) with an error naming the unsupported line,
  * rather than silently misreading it. No YAML library exists in this
  * environment; for full-spec YAML swap [[parse]] for a real loader — the
  * DataFrame contract ([[load]]) is unchanged.
  */
object YamlDim {

  private val TopLevel = """^([^\s:#][^:]*):\s*$""".r
  private val Attr = """^(\s+)([^\s:#][^:]*):\s*(.*?)\s*$""".r

  /** Parse the two-level subset into (code, attributes) pairs, preserving
    * file order. Later duplicate codes/fields fail loudly (a dictionary
    * with duplicates is corrupt, and YAML loaders differ on which value
    * wins — refusing beats guessing). */
  def parse(text: String): Seq[(String, Map[String, String])] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Map[String, String]]()
    var current: String = null
    // YAML comment rule: '#' opens a comment only at line start or after
    // whitespace — 'Ward#2' is a value character, 'Ward #2' is a comment.
    def stripComment(l: String): String = {
      val i = (0 until l.length).find(j =>
        l(j) == '#' && (j == 0 || l(j - 1).isWhitespace))
      i.map(l.take).getOrElse(l)
    }
    text.linesIterator.zipWithIndex.foreach { case (raw, idx) =>
      val line = stripComment(raw)
      if (line.trim.nonEmpty) line match {
        case TopLevel(code) =>
          val c = code.trim
          require(!out.contains(c), s"duplicate code '$c' at line ${idx + 1}")
          out(c) = Map.empty
          current = c
        case Attr(_, field, value) =>
          require(current != null,
            s"indented attribute before any code at line ${idx + 1}")
          require(value.nonEmpty,
            s"empty or nested value not supported (line ${idx + 1}: '$raw' — " +
              "this reader covers flat `field: value` attributes only)")
          val f = field.trim
          require(!out(current).contains(f),
            s"duplicate field '$f' under '$current' at line ${idx + 1}")
          out(current) = out(current) + (f -> value)
        case _ => throw new IllegalArgumentException(
          s"unsupported YAML construct at line ${idx + 1}: '$raw' " +
            "(expected 'CODE:' or indented 'field: value')")
      }
    }
    out.toSeq
  }

  /** Load a code dictionary as a (code, field) dimension DataFrame —
    * driver-side parse, broadcast-sized output. Codes missing the field
    * fail loudly (`concatenate.py:34` would KeyError the same way). */
  def load(spark: SparkSession, path: String,
      field: String = "description"): DataFrame = {
    import spark.implicits._
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    parse(text).map { case (code, attrs) =>
      (code, attrs.getOrElse(field, throw new IllegalArgumentException(
        s"code '$code' has no '$field' attribute")))
    }.toDF("code", field)
  }

  /** The dictionary as a driver Map (the `typedlit` path). */
  def loadMap(spark: SparkSession, path: String,
      field: String = "description"): Map[String, String] =
    load(spark, path, field).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
}

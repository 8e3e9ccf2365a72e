package graft.functions

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families — SURVEY.md §2 A.5/A.6 + B.5. All codegen'd
  * built-ins, zero UDFs (engine policy, SURVEY §2 B.8).
  *
  * Reference instances: literal replace (`bin/concatenate.py:67`), regex
  * strip (`:28`), concat key (`:71-76`), lower (`make_uuids_tsv.py:
  * 158-160`), url formatting (`bin/concatenate.py:82,87`), numeric
  * coercion (`:110`), JSON extraction (`make_uuids_tsv.py:67-88`), map
  * projection/inversion (`:13,146-148`).
  */
object ScalarFuncs {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        U.lng(length(col("p_name"))).as("name_len"),
        U.lng(size(split(col("p_name"), " "))).as("n_words"),
        replace(col("p_type"), lit(" "), lit("_")).as("type_us"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        format_string("part-%05d", col("p_partkey")).as("part_tag"),
        U.lng(levenshtein(col("p_brand"), lit("Brand#13"))).as("lev"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
        substring(col("p_name"), 1, 8).as("prefix8"))
        .orderBy("p_partkey")),

    // pd.to_numeric-style coercion: bad casts → null (ANSI off), mirrors
    // DuckDB TRY_CAST.
    "cast_try_numeric" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        col("event_type").cast("long").as("bad_cast"))
        .orderBy("event_id")),

    "json_extract_agg" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // Parse-once JSON: from_json with an explicit schema materializes the
    // struct in a single Jackson pass — the 100 TB-correct pattern when a
    // document is probed for several fields (get_json_object re-parses
    // per path). Same values as the path-probe form, different engine.
    // U.fan before the parse: from_json over every event is the whole
    // cost here and otherwise runs at scan parallelism — and the global
    // orderBy's range-sampling pass evaluates the child TWICE, so the
    // 4-task parse was paid twice (r13 sf1 stage profile: 9.0 s wall,
    // 3% utilization; fanned: every pass runs shuffle-wide)
    "json_parse_once" -> ((s, d) =>
      // keyed exchange (r18; was round-robin U.fan — no SPARK-23207
      // pre-shuffle sort of the props strings; event_id is unique)
      t(s, d, "events").select(col("event_id"), col("props"))
        .repartition(col("event_id"))
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
        .select(col("event_id"), col("j.k").as("k"),
          (col("j.k") % 10).as("k_mod"))
        .orderBy("event_id")),

    "date_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        U.lng(year(col("o_orderdate"))).as("yr"),
        U.lng(dayofweek(col("o_orderdate"))).as("dow"),
        U.lng(datediff(to_date(lit("1995-06-01")),
          col("o_orderdate").cast("date"))).as("days_to_ref"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3mo"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        U.lng(quarter(col("o_orderdate"))).as("qtr"),
        U.lng(weekofyear(col("o_orderdate"))).as("iso_week"))
        .orderBy("o_orderkey")),

    "math_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        round(col("p_retailprice"), 2).as("r2"),
        abs(col("p_retailprice") - 1500.0).as("absdiff"),
        sqrt(col("p_retailprice")).as("sq"),
        round(log(col("p_retailprice")), 6).as("lg"),
        round(pow(col("p_size"), 1.5), 6).as("pw"),
        U.lng(floor(col("p_retailprice"))).as("fl"),
        U.lng(ceil(col("p_retailprice"))).as("ce"),
        U.lng(pmod(col("p_partkey"), lit(7))).as("md"))
        .orderBy("p_partkey")),

    // Higher-order array functions over the embeddings table (B.5; the
    // building blocks of the cosine kernel in VectorOps).
    "arr_funcs" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        U.lng(size(col("embedding"))).as("dim"),
        round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x), 4).as("head_sum"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x * x)), 4).as("l2_norm"),
        U.dbl(array_max(col("embedding"))).as("vmax"),
        U.dbl(element_at(col("embedding"), 1)).as("first_el"))
        .orderBy("vec_id")),

    // map_from_entries / inversion / value projection (A.6) — round-trips
    // key↔value so the oracle is plain relational.
    "map_funcs" -> ((s, d) => {
      val n = t(s, d, "nation")
      val withMap = n.withColumn("m",
        map_from_entries(array(struct(col("n_name").as("key"),
          col("n_nationkey").cast("string").as("value")))))
      val inverted = withMap.withColumn("inv",
        map_from_entries(transform(map_entries(col("m")),
          e => struct(e.getField("value").as("key"), e.getField("key").as("value")))))
      // map_project_desc (make_uuids_tsv.py:146-148): project one field of
      // each map value via transform_values.
      val projected = inverted.withColumn("desc_map",
        transform_values(col("m"), (_, v) => concat(lit("key="), v)))
      projected.select(
        col("n_nationkey"),
        element_at(map_keys(col("m")), 1).as("name_from_map"),
        element_at(col("inv"), col("n_nationkey").cast("string")).as("name_from_inv"),
        element_at(col("desc_map"), col("n_name")).as("projected_desc"))
        .orderBy("n_nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "str_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lname,
        |  upper(p_brand) AS ubrand,
        |  length(p_name) AS name_len,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  replace(p_type, ' ', '_') AS type_us,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  printf('part-%05d', p_partkey) AS part_tag,
        |  levenshtein(p_brand, 'Brand#13') AS lev,
        |  lpad(p_brand, 12, '*') AS padded,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
        |  substring(p_name, 1, 8) AS prefix8
        |FROM part ORDER BY p_partkey""".stripMargin,
    "cast_try_numeric" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  TRY_CAST(event_type AS BIGINT) AS bad_cast
        |FROM events ORDER BY event_id""".stripMargin,
    "json_extract_agg" ->
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, count(*) AS n,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "json_parse_once" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1995-06-01') AS BIGINT) AS days_to_ref,
        |  epoch_us(o_orderdate) AS epoch_us,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "math_funcs" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 2) AS r2,
        |  abs(p_retailprice - 1500.0) AS absdiff,
        |  sqrt(p_retailprice) AS sq,
        |  round(ln(p_retailprice), 6) AS lg,
        |  round(pow(p_size, 1.5), 6) AS pw,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  CAST(p_partkey % 7 AS BIGINT) AS md
        |FROM part ORDER BY p_partkey""".stripMargin,
    "arr_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 4) AS head_sum,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x))), 4) AS l2_norm,
        |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
        |  CAST(embedding[1] AS DOUBLE) AS first_el
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "map_funcs" ->
      """SELECT n_nationkey, n_name AS name_from_map, n_name AS name_from_inv,
        |  'key=' || n_nationkey AS projected_desc
        |FROM nation ORDER BY n_nationkey""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{functions => F}

/** q01–q24, q38–q40, q46–q50, q54–q56: the reference-parity query
  * inventory (SURVEY.md §2.8) plus relational-capability queries
  * (ROLLUP, set ops, nested models, multi-hop dim joins, range join).
  *
  * Each query exercises one operator row from SURVEY.md §2 over the
  * driver test tables, and has a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL output column names and types. All queries end in a total
  * ORDER BY for deterministic hash comparison.
  *
  * Scale notes: every query is a declarative single-pass plan — scans
  * carry pruned schemas and pushed filters, aggregations are partial
  * (map-side combine), the only joins (q21) broadcast their dimension
  * side. Money aggregates run in DecimalType so results are exact and
  * engine-independent.
  */
object CoreQueries {
  private val T = Tables

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3/C1: scan + projection pruning — ReadSchema must show 4 cols only.
    "q01_scan_projection" -> ((s, d) =>
      T.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    // C1: rename + cast (marshmallow declared-field projection).
    // Terminal decimals are re-cast to DOUBLE: the value is exact after
    // the DECIMAL(12,2) quantization, and a double final representation
    // hashes identically across engines (decimal wire formats do not).
    "q02_proj_rename_cast" -> ((s, d) =>
      T.customer(s, d)
        .select(
          col("c_custkey").cast(StringType).as("id"),
          col("c_acctbal").cast(DecimalType(12, 2)).cast(DoubleType)
            .as("balance"))
        .orderBy("id")),

    // D1/D2: null-safe case functions.
    "q03_proj_case_funcs" -> ((s, d) =>
      T.customer(s, d)
        .select(
          col("c_custkey"),
          F.uppercase(col("c_name")).as("name_upper"),
          F.lowercase(col("c_mktsegment")).as("segment_lower"))
        .orderBy("c_custkey")),

    // C3: constant column (fields.Constant → lit).
    "q04_constant_lit" -> ((s, d) =>
      T.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), lit("etl").as("source_tag"))
        .orderBy("n_nationkey")),

    // C2: computed column with multi-field access (README define_email).
    "q05_computed_concat" -> ((s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          concat(
            replace(F.lowercase(col("p_name")), lit(" "), lit(".")),
            lit("."), F.lowercase(col("p_brand")),
            lit("@mycompany.com")).as("email"))
        .orderBy("p_partkey")),

    // E1: row filter (post-processor drop) — PushedFilters must show both.
    "q06_filter_predicate" -> ((s, d) =>
      T.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // D8: recast_null / NULLIF.
    "q07_recast_null" -> ((s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("status_n"))
        .orderBy("o_orderkey")),

    // D7: booler over a synthesized yes/no string column.
    "q08_booler" -> ((s, d) =>
      T.events(s, d)
        .select(
          col("event_id"),
          F.booler(
            when(col("event_type") === "signup", "Yes")
              .when(col("event_type") === "purchase", "y")
              .when(col("event_type") === "error", "NO")
              .otherwise("n")).as("is_conversion"))
        .orderBy("event_id")),

    // D4: ISO date serialization.
    "q09_date_iso" -> ((s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"), F.isoDate(col("o_orderdate")).as("order_date"))
        .orderBy("o_orderkey")),

    // D9: epoch-ms timestamp recast round-trip on the ns-precision table.
    "q10_timestamp_millis" -> ((s, d) => {
      val ev = T.events(s, d)
      ev.select(
          col("event_id"),
          T.tsMillis(ev, "ts").as("ts_ms"),
          F.isoDateTime(F.recastTimestamp(T.tsMillis(ev, "ts")),
            "yyyy-MM-dd HH:mm:ss.SSS").as("ts_str"))
        .orderBy("event_id")
    }),

    // D11: recast_mac '-'→':' translate.
    "q11_mac_translate" -> ((s, d) =>
      T.customer(s, d)
        .select(
          col("c_custkey"),
          F.recastMac(concat_ws("-",
            col("c_custkey").cast(StringType),
            col("c_nationkey").cast(StringType),
            (col("c_custkey") % 256).cast(StringType))).as("mac"))
        .orderBy("c_custkey")),

    // D12/D13: split + element pick, uppercased.
    "q12_split_part" -> ((s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          F.uppercase(element_at(split(col("p_name"), " "), 1)).as("first_word"))
        .orderBy("p_partkey")),

    // D14 family: content hashing (oracle-safe sha256; sha224 unit-tested).
    "q13_sha2_hash" -> ((s, d) =>
      T.customer(s, d)
        .select(col("c_custkey"), sha2(col("c_name"), 256).as("name_hash"))
        .orderBy("c_custkey")),

    // F1: denormalize — explode with duplicated siblings.
    "q14_explode_denormalize" -> ((s, d) =>
      F.denormalize(
          T.part(s, d).select(col("p_partkey"), split(col("p_type"), " ").as("type_word")),
          "type_word")
        .orderBy("p_partkey", "type_word")),

    // D19/F3: flatten nested arrays.
    "q15_flatten_array" -> ((s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          array_join(
            flatten(array(
              array(F.lowercase(col("p_brand"))),
              split(F.lowercase(col("p_type")), " "))),
            ",").as("flat_str"))
        .orderBy("p_partkey")),

    // G1/A6: manifest union of two disjoint file/filter branches.
    "q16_union_manifest" -> ((s, d) => {
      val o = T.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.filter(col("o_orderstatus") === "F")
        .unionByName(o.filter(col("o_orderstatus") === "O"))
        .orderBy("o_orderkey")
    }),

    // B6: dated partition layout derivation (writer path columns).
    "q17_partition_derive" -> ((s, d) =>
      F.datedPartitions(T.orders(s, d), "o_orderdate")
        .select("o_orderkey", "year", "month", "day")
        .orderBy("o_orderkey")),

    // D18: JSON field extraction from the events.props JSON string.
    "q18_json_extract" -> ((s, d) =>
      // r15: per-row JSON parse over a single-row-group scan ran on one
      // core — scale-gated fan-out first (guide §2.5, Par.fanOut)
      graft.ops.Par.fanOut(
          T.events(s, d).select(col("event_id"), col("props")),
          col("event_id"))
        .select(col("event_id"), F.jsonGet(col("props"), "$.k").as("k_val"))
        .orderBy("event_id")),

    // D10/D16: int→IPv4 dotted-quad and back (full round-trip).
    "q19_ip_from_int" -> ((s, d) => {
      val v = ((col("l_orderkey") * 2654435761L + col("l_linenumber"))
        .bitwiseAND(lit(4294967295L))).as("v")
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), v)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          F.ipFromInt(col("v")).as("ip"),
          F.ipToInt(F.ipFromInt(col("v"))).as("ip_int"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // [EXT] exact dedup via DISTINCT (shuffle-partial aggregate).
    "q20_dedup_exact" -> ((s, d) =>
      T.customer(s, d)
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")),

    // §2.7 join capability: dim tables broadcast — no shuffle of customer.
    "q21_join_enrich" -> ((s, d) =>
      T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_name"),
          col("n_name").as("nation"), col("r_name").as("region"))
        .orderBy("c_custkey")),

    // §2.7 aggregation capability: TPC-H Q1 shape, exact decimal money math.
    "q22_agg_rollup" -> ((s, d) => {
      // r15: fan-out A/B'd and REJECTED here (1.13×): the partial-agg
      // map work is too cheap per row to beat 32 tasks' fixed costs
      val li = T.lineitem(s, d)
      val qty = col("l_quantity").cast(DecimalType(18, 2))
      val price = col("l_extendedprice").cast(DecimalType(18, 2))
      val disc = (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2))
      // Sums run in DECIMAL (exact, order-independent); the FINAL columns
      // are DOUBLE so the output representation hashes identically across
      // engines (a decimal's wire format does not).
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(qty).cast(DecimalType(18, 2)).cast(DoubleType).as("sum_qty"),
          sum(price).cast(DecimalType(18, 2)).cast(DoubleType)
            .as("sum_base_price"),
          sum(price * disc).cast(DecimalType(18, 4)).cast(DoubleType)
            .as("sum_disc_price"),
          (sum(qty).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.7 window capability: top-3 orders per customer.
    "q23_window_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // D15: acronym-aware camel→snake (regex parity incl. global replace).
    "q38_snake_case" -> ((s, d) =>
      T.part(s, d)
        .select(col("p_partkey"),
          F.camelToSnakeSimple(concat(lit("Part"), col("p_partkey").cast(StringType),
            lit("HTTPResponseCode"))).as("snake"))
        .orderBy("p_partkey")),

    // D12: HostName's one-input→three-output side columns (SURVEY hard
    // part (b)), over synthesized domain\\host / fqdn / plain shapes.
    "q39_hostname" -> ((s, d) => {
      val shaped = T.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0,
            concat(lit("CORP\\host"), col("c_custkey").cast(StringType)))
          .when(col("c_custkey") % 3 === 1,
            concat(lit("host"), col("c_custkey").cast(StringType),
              lit(".corp.example.com")))
          .otherwise(concat(lit("host"), col("c_custkey").cast(StringType)))
          .as("raw"))
      F.selectHostName(shaped, "raw", "host")
        .select("c_custkey", "host", "host_domain", "host_fqdn")
        .orderBy("c_custkey")
    }),

    // F2: CIDR host expansion (explode_ip_addrs, utils.py:204-217) —
    // streamed through the native Generator (v4+v6, fail-fast host cap)
    // rather than a materialized array; same rows, scale-safe.
    "q40_cidr_explode" -> ((s, d) =>
      T.nation(s, d)
        .select(col("n_nationkey"),
          F.explodeCidr(concat(lit("10.0."),
            col("n_nationkey").cast(StringType), lit(".0/30"))).as("ip"))
        .orderBy("n_nationkey", "ip")),

    // §2.7 grouping-sets capability: ROLLUP with sentinel-coalesced
    // subtotal rows (avoids engine-specific NULL ordering).
    "q46_rollup_agg" -> ((s, d) =>
      // r15: fan-out A/B'd and rejected (same verdict as q22)
      T.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
            .cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")),

    // §2.7 set-operator capability: INTERSECT / EXCEPT (distinct).
    "q47_set_ops" -> ((s, d) => {
      val o = T.orders(s, d)
      val highPrio = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_custkey")
      val openOrders = o.filter(col("o_orderstatus") === "O").select("o_custkey")
      highPrio.intersect(openOrders)
        .withColumn("bucket", lit("both"))
        .unionByName(
          highPrio.except(openOrders).withColumn("bucket", lit("high_prio_only")))
        .orderBy("bucket", "o_custkey")
    }),

    // [EXT] text stats primitives.
    "q24_text_stats" -> ((s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          length(col("p_name")).cast(IntegerType).as("name_len"),
          size(split(col("p_name"), " ")).cast(IntegerType).as("n_words"),
          F.uppercase(trim(col("p_name"))).as("upper_name"))
        .orderBy("p_partkey")),

    // D13: splitter (utils.py:84-101) — backslash split to (left, right)
    // struct columns, no-backslash → (null, input).
    "q48_splitter" -> ((s, d) => {
      val shaped = T.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 2 === 0,
          concat(lit("DOM\\acct"), col("c_custkey").cast(StringType)))
          .otherwise(concat(lit("user"), col("c_custkey").cast(StringType)))
          .as("raw"))
      val sp = F.splitter(col("raw"))
      shaped.select(col("c_custkey"),
          sp.getField("left").as("left_part"),
          sp.getField("right").as("right_part"))
        .orderBy("c_custkey")
    }),

    // D6: time-of-day serialization with µs→ms truncation (fields.py:72-82).
    "q49_time_ms" -> ((s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"),
          F.timeMs(timestamp_micros(col("o_orderkey") * 1234567L + 999999L))
            .as("t_ms"))
        .orderBy("o_orderkey")),

    // D10: recast_ip through the native full-range expression (IPv4 span
    // here — the oracle formats dotted quads; IPv6 arms are spec-covered).
    "q50_recast_ip" -> ((s, d) =>
      T.customer(s, d)
        .select(col("c_custkey"),
          F.recastIp((col("c_custkey") * 2654435761L) % 4294967296L).as("ip"))
        .orderBy("c_custkey")),

    // C1 + Nested: a sub-model projecting INSIDE a struct column
    // (marshmallow Nested → StructType), flattened for the oracle.
    "q54_nested_model" -> ((s, d) => {
      import graft.model.{Field, Model}
      val src = T.customer(s, d).select(col("c_custkey").as("id"),
        struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("person"))
      val person = Model("Person", Seq(
        Field("name_upper", source = Some("name"), transform = F.uppercase),
        Field("bal_r", source = Some("bal"), cast = Some(DecimalType(12, 2)),
          transform = _.cast(DoubleType))))
      Model("Rec", Seq(
          Field("id"),
          Field("who", source = Some("person"), nested = Some(person))))
        .compile(src)
        .select(col("id"), col("who.name_upper").as("name_upper"),
          col("who.bal_r").as("bal"))
        .orderBy("id")
    }),

    // §2.7 multi-hop dimension join over the otherwise-unexercised
    // supplier/region tables: both dims broadcast, fact never shuffles
    // for the joins.
    "q55_supplier_region" -> ((s, d) =>
      T.supplier(s, d)
        .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("s_acctbal").cast(DecimalType(18, 2)))
            .cast(DecimalType(18, 2)).cast(DoubleType).as("sum_bal"))
        .orderBy("r_name")),

    // [EXT] bucketized point-in-interval range join — equi-join on
    // bucket keys + residual predicate, never BroadcastNestedLoop.
    "q56_range_join" -> ((s, d) => {
      val ivs = T.nation(s, d).select(col("n_nationkey"),
        (col("n_nationkey") * 100L).as("lo"),
        (col("n_nationkey") * 100L + 150L).as("hi"))
      val pts = T.customer(s, d).select(col("c_custkey"),
        (col("c_custkey") % 2500L).as("p"))
      graft.ops.relational.rangeJoin(pts, ivs, "p", "lo", "hi", bucketWidth = 128L)
        .select("c_custkey", "n_nationkey", "p")
        .orderBy("c_custkey", "n_nationkey")
    })
  )

  /** DuckDB equivalents — identical column names/types, total ORDER BY. */
  val oracleSql: Map[String, String] = Map(
    "q01_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_proj_rename_cast" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS balance
        |FROM customer ORDER BY id""".stripMargin,
    "q03_proj_case_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |       lower(c_mktsegment) AS segment_lower
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q04_constant_lit" ->
      """SELECT n_nationkey, n_name, 'etl' AS source_tag
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q05_computed_concat" ->
      """SELECT p_partkey,
        |       replace(lower(p_name), ' ', '.') || '.' || lower(p_brand)
        |         || '@mycompany.com' AS email
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q06_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q07_recast_null" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_n
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q08_booler" ->
      """SELECT event_id,
        |       CASE WHEN event_type IN ('signup','purchase') THEN true
        |            ELSE false END AS is_conversion
        |FROM events ORDER BY event_id""".stripMargin,
    "q09_date_iso" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q10_timestamp_millis" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms,
        |       strftime(make_timestamp(epoch_ms(ts) * 1000),
        |                '%Y-%m-%d %H:%M:%S.%g') AS ts_str
        |FROM events ORDER BY event_id""".stripMargin,
    "q11_mac_translate" ->
      """SELECT c_custkey,
        |       translate(CAST(c_custkey AS VARCHAR) || '-' ||
        |                 CAST(c_nationkey AS VARCHAR) || '-' ||
        |                 CAST(c_custkey % 256 AS VARCHAR), '-', ':') AS mac
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q12_split_part" ->
      """SELECT p_partkey, upper(split_part(p_name, ' ', 1)) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q13_sha2_hash" ->
      """SELECT c_custkey, sha256(c_name) AS name_hash
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q14_explode_denormalize" ->
      """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word
        |FROM part ORDER BY p_partkey, type_word""".stripMargin,
    "q15_flatten_array" ->
      """SELECT p_partkey,
        |       array_to_string(
        |         flatten([[lower(p_brand)], string_split(lower(p_type), ' ')]),
        |         ',') AS flat_str
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q16_union_manifest" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q17_partition_derive" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS year,
        |       CAST(month(o_orderdate) AS INT) AS month,
        |       CAST(day(o_orderdate) AS INT) AS day
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q18_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q19_ip_from_int" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |         (l_orderkey * 2654435761 + l_linenumber) & 4294967295 AS v
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |       CAST((v >> 24) & 255 AS VARCHAR) || '.' ||
        |       CAST((v >> 16) & 255 AS VARCHAR) || '.' ||
        |       CAST((v >> 8) & 255 AS VARCHAR) || '.' ||
        |       CAST(v & 255 AS VARCHAR) AS ip,
        |       v AS ip_int
        |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q21_join_enrich" ->
      """SELECT c_custkey, c_name, n_name AS nation, r_name AS region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q22_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q23_window_topk" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q38_snake_case" ->
      """SELECT p_partkey,
        |  lower(regexp_replace(regexp_replace(
        |    'Part' || CAST(p_partkey AS VARCHAR) || 'HTTPResponseCode',
        |    '([A-Z]+)([A-Z][a-z0-9])', '\1_\2', 'g'),
        |    '([a-z0-9])([A-Z])', '\1_\2', 'g')) AS snake
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q39_hostname" ->
      """WITH shaped AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0
        |           THEN 'CORP\host' || CAST(c_custkey AS VARCHAR)
        |         WHEN c_custkey % 3 = 1
        |           THEN 'host' || CAST(c_custkey AS VARCHAR) || '.corp.example.com'
        |         ELSE 'host' || CAST(c_custkey AS VARCHAR) END AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN contains(raw, '\') THEN upper(split_part(raw, '\', 2))
        |       WHEN contains(raw, '.') THEN upper(split_part(raw, '.', 1))
        |       ELSE NULL END AS host,
        |  CASE WHEN contains(raw, '\') THEN split_part(raw, '\', 1)
        |       ELSE NULL END AS host_domain,
        |  CASE WHEN NOT contains(raw, '\') AND contains(raw, '.')
        |       THEN raw ELSE NULL END AS host_fqdn
        |FROM shaped ORDER BY c_custkey""".stripMargin,
    "q40_cidr_explode" ->
      """SELECT n_nationkey,
        |  unnest(list_transform(
        |    generate_series(167772160 + n_nationkey * 256 + 1,
        |                    167772160 + n_nationkey * 256 + 2),
        |    i -> CAST((i >> 24) & 255 AS VARCHAR) || '.' ||
        |         CAST((i >> 16) & 255 AS VARCHAR) || '.' ||
        |         CAST((i >> 8) & 255 AS VARCHAR) || '.' ||
        |         CAST(i & 255 AS VARCHAR))) AS ip
        |FROM nation ORDER BY n_nationkey, ip""".stripMargin,
    "q46_rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q47_set_ops" ->
      """WITH hp AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT','2-HIGH')),
        |op AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT * FROM (
        |  SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM hp INTERSECT SELECT * FROM op)
        |  UNION ALL
        |  SELECT o_custkey, 'high_prio_only' AS bucket FROM (SELECT * FROM hp EXCEPT SELECT * FROM op))
        |ORDER BY bucket, o_custkey""".stripMargin,
    "q24_text_stats" ->
      """SELECT p_partkey, CAST(length(p_name) AS INT) AS name_len,
        |       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        |       upper(trim(p_name)) AS upper_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q48_splitter" ->
      """WITH shaped AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 2 = 0
        |         THEN 'DOM\acct' || CAST(c_custkey AS VARCHAR)
        |         ELSE 'user' || CAST(c_custkey AS VARCHAR) END AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  split_part(raw, '\', 1) AS left_part,
        |  string_split(raw, '\')[-1] AS right_part
        |FROM shaped ORDER BY c_custkey""".stripMargin,
    "q49_time_ms" ->
      """SELECT o_orderkey,
        |       strftime(make_timestamp(o_orderkey * 1234567 + 999999),
        |                '%H:%M:%S.%g') AS t_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q50_recast_ip" ->
      """SELECT c_custkey,
        |  CAST(((c_custkey * 2654435761) % 4294967296) >> 24 & 255 AS VARCHAR)
        |  || '.' ||
        |  CAST(((c_custkey * 2654435761) % 4294967296) >> 16 & 255 AS VARCHAR)
        |  || '.' ||
        |  CAST(((c_custkey * 2654435761) % 4294967296) >> 8 & 255 AS VARCHAR)
        |  || '.' ||
        |  CAST(((c_custkey * 2654435761) % 4294967296) & 255 AS VARCHAR) AS ip
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q54_nested_model" ->
      """SELECT c_custkey AS id, upper(c_name) AS name_upper,
        |       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
        |FROM customer ORDER BY id""".stripMargin,
    "q55_supplier_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |       CAST(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |            AS DOUBLE) AS sum_bal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q56_range_join" ->
      """SELECT c_custkey, n_nationkey, c_custkey % 2500 AS p
        |FROM customer
        |JOIN nation ON (c_custkey % 2500) BETWEEN n_nationkey * 100
        |                                      AND n_nationkey * 100 + 150
        |ORDER BY c_custkey, n_nationkey""".stripMargin
  )
}

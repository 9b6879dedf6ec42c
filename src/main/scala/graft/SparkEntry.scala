package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2's
  * inventory as an idiomatic Spark plan over the driver's testdata tables;
  * [[oracleSql]] carries the DuckDB-equivalent SQL the driver uses as the
  * correctness oracle. Column names/aliases match pairwise (the driver's
  * compare sorts columns by name before hashing). Doubles produced by
  * arithmetic are rounded to 4 decimals on BOTH sides so summation order
  * cannot flip the hash.
  */
object SparkEntry {
  import Tables.t

  /** Flagship: end-to-end index-build + reference-scored search on a
    * deterministic synthetic web-page corpus. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / projection / filter (SURVEY §2.1 fromTable/filter) ----
    "q01_scan_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),
    "q02_filter" -> ((s, d) => {
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value") > 50.0)
        .select(col("event_id"), col("user_id"), col("value"))
    }),

    // ---- aggregation (SURVEY §2.1 foldByKey / fold) ----
    "q03_agg_group" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
    }),
    "q04_agg_global" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(min(col("l_extendedprice")), 4).as("min_price"),
        round(max(col("l_extendedprice")), 4).as("max_price"))
    }),

    // ---- joins (SURVEY §2.1 join/cogroup; semi/anti are Spark-free extras) ----
    "q05_join_inner" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 4).as("sum_price"))
    }),
    "q06_join_broadcast" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val p = t(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
             count(lit(1)).as("cnt"))
    }),
    "q07_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
    }),
    "q08_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q09_outer_join" -> ((s, d) => {
      val n = t(s, d, "nation"); val sup = t(s, d, "supplier")
      n.join(sup, n("n_nationkey") === sup("s_nationkey"), "left_outer")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("s_suppkey")).as("n_supp"))
    }),
    // full-outer cogroup shape (reference /cogroup, flame/Worker.java:505-572):
    // per-key grouped value lists from both inputs, outer-merged.
    "q10_cogroup" -> ((s, d) => {
      val c = t(s, d, "customer")
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("c_name")))).as("customers"))
      val sup = t(s, d, "supplier")
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("suppliers"))
      c.join(sup, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
                coalesce(col("customers"), lit("")).as("customers"),
                coalesce(col("suppliers"), lit("")).as("suppliers"))
    }),

    // ---- set ops (SURVEY §2.1 distinct/intersection + union/except) ----
    "q11_distinct" -> ((s, d) => {
      t(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),
    "q12_union" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    }),
    "q13_except" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 350000.0).select(col("o_custkey").as("custkey")).distinct()
        .except(o.filter(col("o_totalprice") > 450000.0).select(col("o_custkey").as("custkey")).distinct())
    }),
    "q14_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")).distinct())
    }),

    // ---- sort / limit / top-k (SURVEY §2.3 rank+limit) ----
    "q15_topk" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- window (posting-rank shape: top row per key) ----
    "q16_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    }),

    // ---- event-time bucketing (streaming-adjacent batch shape) ----
    "q17_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey < 100",
    "q02_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'click' AND value > 50.0",
    "q03_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
         round(SUM(l_quantity), 4) AS sum_qty,
         round(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
         round(AVG(l_discount), 6) AS avg_disc,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q04_agg_global" ->
      """SELECT count(*) AS cnt, round(SUM(l_quantity), 4) AS sum_qty,
         round(MIN(l_extendedprice), 4) AS min_price,
         round(MAX(l_extendedprice), 4) AS max_price FROM lineitem""",
    "q05_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(SUM(o_totalprice), 4) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q06_join_broadcast" ->
      """SELECT p_brand, round(SUM(l_quantity), 4) AS sum_qty, count(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
    "q07_semi_join" ->
      """SELECT c_nationkey, count(*) AS cnt FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_nationkey""",
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_totalprice > 300000.0)""",
    "q09_outer_join" ->
      """SELECT n_nationkey, n_name, count(s_suppkey) AS n_supp
         FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
         GROUP BY n_nationkey, n_name""",
    "q10_cogroup" ->
      """WITH c AS (SELECT c_nationkey AS nationkey,
                    string_agg(c_name, ',' ORDER BY c_name) AS customers
                    FROM customer GROUP BY c_nationkey),
              s AS (SELECT s_nationkey AS nationkey,
                    string_agg(s_name, ',' ORDER BY s_name) AS suppliers
                    FROM supplier GROUP BY s_nationkey)
         SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                COALESCE(customers, '') AS customers,
                COALESCE(suppliers, '') AS suppliers
         FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""",
    "q11_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q12_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION SELECT s_nationkey AS nationkey FROM supplier""",
    "q13_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000.0
         EXCEPT SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000.0""",
    "q14_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier""",
    "q15_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q16_window" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
           FROM customer) WHERE rn = 1""",
    "q17_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS cnt, round(SUM(value), 4) AS sum_value
         FROM events GROUP BY 1, 2"""
  )
}

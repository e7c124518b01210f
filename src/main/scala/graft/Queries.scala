package graft

import graft.functions.{Dedup, Domains, Quant, Sampling, Similarity, Text}
import graft.ops.{Events, Relational}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The driver-contract query catalog: one named builder per implemented
  * operator from SURVEY.md §2 (+ the training-data-pipeline operators), each
  * paired with equivalent ANSI SQL for the DuckDB differential oracle.
  *
  * Cross-engine determinism rules used throughout:
  *  - money math goes through DECIMAL(18,2) (exact) and is presented as
  *    DOUBLE, so both engines emit the identical bit pattern;
  *  - every multi-row result ends in a total ORDER BY (Catalyst's
  *    EliminateSorts removes it under Bench's count());
  *  - event-time arithmetic uses integer epoch micros/nanos (`ts div n`),
  *    never double-seconds;
  *  - text hashing uses md5 (identical in DuckDB); Spark-only fast paths use
  *    xxhash64 and are checked rows-only.
  */
object Queries {

  private type Builder = (SparkSession, String) => DataFrame

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact money column: double → DECIMAL(18,2). */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact decimal aggregate presented as double. */
  private def money(c: Column): Column = sum(c).cast("double")

  // ---------------------------------------------------------------------
  // §2A relational operators
  // ---------------------------------------------------------------------

  /** 2A-1/3/14: scan → filter → group → aggregate (pricing summary, the
    * engine's TPC-H-Q1-shaped smoke of scan/project/agg correctness).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order"),
        money(dec2(col("l_extendedprice"))).as("sum_base_price"),
        money(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .as("sum_disc_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** 2A-17: rank-latest — ROW_NUMBER() ... rank=1, the reference's
    * latest-run-per-job query (`KafkaDemo.sh:64-71`), over orders/customer.
    */
  def rankLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    Relational.rankLatest(o, Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** 2A-14 / 2B-12: watermark bounds NVL(MIN/MAX,0) over the control-table
    * stand-in (`Fact_Dagg_automation.sh:71-75`).
    */
  def watermarkBounds(spark: SparkSession, dir: String): DataFrame =
    Relational.watermarkBounds(t(spark, dir, "orders"), col("o_orderkey"),
      lit(1000L), col("o_orderstatus") === "F")

  /** 2A-4: incremental range filter (`query.txt:2` run-id window). */
  def incrementalFilter(spark: SparkSession, dir: String): DataFrame =
    Relational.incrementalFilter(t(spark, dir, "lineitem"), col("l_shipdate"),
        lit("1996-01-01"), lit("1996-03-31"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** 2A-5/6: IN-list + LIKE-disjunction filters (`query.txt:1`,
    * `FACT_AUTOMATION.sh:75-87`).
    */
  def filterInLike(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
        Relational.likeAny(col("p_name"), Seq("widget", "bolt")))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))

  /** 2A-8/12: the flagship shape — multi-way LEFT OUTER join with constant
    * predicates inside ON + CASE-classification + aggregate
    * (`query.txt:1`). Dimension sides are broadcast (they are small by
    * construction — the 100 TB side is lineitem).
    */
  def dimEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    val s = t(spark, dir, "supplier")
    val p = t(spark, dir, "part")
    // Broadcast hints only on the guaranteed-tiny dims (nation/region);
    // customer/supplier/part scale with the data — auto-broadcast + AQE
    // pick broadcast when they fit and fall back to shuffled joins when
    // they don't (a forced broadcast() would OOM the driver at 100 TB dims).
    li
      .join(o, li("l_orderkey") === o("o_orderkey") &&
        o("o_orderstatus").isin("F", "O"), "left_outer")
      .join(c, o("o_custkey") === c("c_custkey"), "left_outer")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left_outer")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left_outer")
      .join(s, li("l_suppkey") === s("s_suppkey"), "left_outer")
      .join(p, li("l_partkey") === p("p_partkey"), "left_outer")
      .withColumn("segment_class",
        when(col("c_mktsegment") === "AUTOMOBILE", "Vehicle")
          .when(col("c_mktsegment") === "MACHINERY", "Industrial")
          .when(col("c_mktsegment").isNull, "Not Applicable")
          .otherwise("Other"))
      .groupBy(coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"), col("segment_class"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("sum_qty"),
        money(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .as("revenue"))
      .orderBy(col("region_name"), col("segment_class"))
  }

  /** 2A-9: LEFT JOIN to an aggregating subquery (`query.txt:1` Z/Q joins). */
  def joinAggSubquery(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val z = t(spark, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"), max(col("o_totalprice")).as("max_price"))
    c.join(z, c("c_custkey") === z("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
        coalesce(col("max_price"), lit(0.0)).as("max_price"))
      .orderBy(col("c_custkey"))
  }

  /** 2A-10: uncorrelated scalar subquery in a predicate (`query.txt:1`
    * `ON E.x = (SELECT DISTINCT ...)`) — SQL form for fidelity, run through
    * the stored-query-as-data path (`TESTING_QUERIES` CLOBs).
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_size = (SELECT max(p_size) FROM part)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** 2A-11: IN-subquery predicate → left-semi join. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val big = t(spark, dir, "orders").filter(col("o_totalprice") > 190000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** NOT-EXISTS → left-anti join (complement of [[semiJoin]]). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** 2A-12: CASE-unpivot — name/value pairs to wide columns via conditional
    * aggregation (`query.txt:1` SMS/MMS/DATA/VOICE columns), here over the
    * events stream's type/value pairs.
    */
  def caseUnpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", col("value"))).as("purchase_max"),
        max(when(col("event_type") === "view", col("value"))).as("view_max"),
        max(when(col("event_type") === "click", col("value"))).as("click_max"),
        max(when(col("event_type") === "error", col("value"))).as("error_max"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** 2A-13: DISTINCT. */
  def distinctValues(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** 2A-15 / 2B-7: duplicate finder — GROUP BY all columns HAVING count>1
    * (`FACT_AUTOMATION.sh:334-342`), on a projection that actually has
    * duplicates.
    */
  def dupFinder(spark: SparkSession, dir: String): DataFrame =
    Relational.duplicateRows(
        t(spark, dir, "orders").select(col("o_custkey"), col("o_orderstatus")))
      .orderBy(col("o_custkey"), col("o_orderstatus"))

  /** 2A-16: ordered string aggregation — LISTAGG WITHIN GROUP
    * (`Fact_Dagg_automation.sh:73`).
    */
  def listAggNations(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    Relational.listAgg(
        r.join(n, r("r_regionkey") === n("n_regionkey")),
        Seq(col("r_name")), col("n_name"))
      .select(col("r_name"), col("list_agg").as("nations"))
      .orderBy(col("r_name"))
  }

  /** 2A-20 / 2B-6: MINUS both directions — symmetric-difference data diff
    * (`FACT_AUTOMATION.sh:182-231`).
    */
  def exceptDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val a = o.filter(col("o_totalprice") > 150000.0).select(col("o_orderkey"))
    val b = o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    Relational.symmetricDiff(a, b).orderBy(col("o_orderkey"), col("diff_side"))
  }

  /** 2A-7 / 2B-8: null-audit disjunction over join-produced nulls
    * (`fact_dim_merging.sh:305-316`).
    */
  def nullAuditJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    Relational.nullAudit(
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer"),
        Seq("o_orderkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** 2B-5: count reconciliation source vs target as one row
    * (`KafkaScript_ConformToStaging.sh:222-246`).
    */
  def countReconcile(spark: SparkSession, dir: String): DataFrame = {
    val src = t(spark, dir, "orders").agg(count(lit(1)).as("src_count"))
    val tgt = t(spark, dir, "lineitem")
      .agg(countDistinct(col("l_orderkey")).as("tgt_count"))
    src.crossJoin(tgt)
      .withColumn("is_match", col("src_count") === col("tgt_count"))
  }

  /** 2B-2: offset-continuity seams via lag over a per-(user, hour-bucket)
    * offset ledger derived from events (`KafkaDemo.sh:184-200` — prev run's
    * until must equal current run's from).
    */
  def offsetGaps(spark: SparkSession, dir: String): DataFrame = {
    val ledger = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 3600000000000").as("bucket"), col("event_id"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(min(col("event_id")).as("from_id"), max(col("event_id")).as("until_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
    ledger
      .withColumn("prev_until", lag(col("until_id"), 1).over(w))
      .filter(col("prev_until").isNotNull && col("prev_until") =!= col("from_id"))
      .select(col("user_id"), col("bucket"), col("prev_until"), col("from_id"))
      .orderBy(col("user_id"), col("bucket"))
  }

  /** Sessionization (gap 30 min) + per-session rollup — batch twin of the
    * streaming `session_window` leg. Event time = integer epoch micros.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        expr("ts div 1000").as("ts_us"))
    Events.sessionize(e, col("user_id"), col("ts_us"), col("event_id"), 1800000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        money(dec2(col("value"))).as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Tumbling 1-hour window aggregation — batch twin of the streaming
    * windowed aggregation; bucket as integer epoch seconds.
    */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(expr("(ts div 1000000000) div 3600 * 3600").as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), money(dec2(col("value"))).as("total_value"))
      .orderBy(col("hour_epoch"), col("event_type"))

  /** Sliding-window aggregation (1 h window, 30 min slide) — each event
    * lands in exactly two slots, materialized by an explode of the two slot
    * ids rather than a range join: the 2× fan-out is the window/slide ratio
    * and shuffles only (slot, user_id). q20 is the tumbling twin; the
    * streaming form is `window(ts, "1 hour", "30 minutes")`.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(expr("(ts div 1000000000) div 1800").as("slot"), col("user_id"))
      .select(explode(array(col("slot"), col("slot") - 1)).as("w"), col("user_id"))
      .groupBy((col("w") * 1800).as("window_start"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_start"))

  /** 2B-20: record accounting from JSON payloads
    * (`Kafka_ArrivalToConform.sh:408-416` counts JSON objects) — extract a
    * field from the props JSON and aggregate.
    */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** 2B-9: stored-query-as-data with parameter binding — the reference keeps
    * queries in TESTING_QUERIES CLOBs and sed-substitutes watermarks
    * (`KafkaScript_ConformToStaging.sh:135-139`); here the template runs via
    * parameterized spark.sql.
    */
  def storedQuery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_totalprice BETWEEN :lo AND :hi ORDER BY o_orderkey",
      Map("lo" -> 100000.0, "hi" -> 110000.0))
  }

  /** The full `query.txt:1` shape in one statement: multi-way join chain +
    * LEFT JOIN to an aggregating subquery (the Z join) + uncorrelated scalar
    * subquery in a predicate + CASE-unpivot aggregation. Executed through
    * the stored-query path (spark.sql) for fidelity with the reference's
    * CLOB-stored SQL — the identical text runs on DuckDB as the oracle.
    */
  val FlagshipSql: String =
    """WITH z AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
      |SELECT r_name AS region_name, c_mktsegment,
      | count(*) AS n_lines,
      | sum(l_quantity) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_lines,
      | max(z.cnt) AS max_cust_orders
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |LEFT JOIN z ON orders.o_custkey = z.o_custkey
      |WHERE l_quantity < (SELECT max(l_quantity) FROM lineitem)
      |GROUP BY r_name, c_mktsegment
      |ORDER BY region_name, c_mktsegment""".stripMargin

  def flagshipDim(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(FlagshipSql)
  }

  /** The LITERAL `query.txt:1` flagship (`SC_B_3NF_DD_DIM_PRODUCT_OFFERING`):
    * every structural element of the reference's stored dim query in one
    * statement over derived fixture CTEs —
    *
    *  - uncorrelated scalar subqueries INSIDE the join ON conditions, twice
    *    (`ON E.OFFERING_TYPE_ID = (SELECT DISTINCT(A.OFFERING_TYPE_ID) FROM
    *    PRODUCT_OFFERING)` and the OFFERING_CATEGORY twin);
    *  - the LEFT JOIN to an aggregating subquery (the reference's Z/Q
    *    category-count joins);
    *  - the multi-source name/value CASE-unpivot: parameter (G via the F
    *    mapping), allowance (N via L→M) and charge (P via L→O) side tables
    *    pivoted to typed columns, exactly the SMS/MMS/DATA
    *    allowance/price/flag derivation;
    *  - `RECORD_STATUS = '1'` predicates inside each ON (dropped mapping
    *    rows make the corresponding unpivot column NULL, not absent);
    *  - the L→(M,N) × L→(O,P) fan-out (9 combined rows per offering)
    *    collapsed by conditional aggregation on the offering grain — the
    *    construction that corrupts silently if the join accidentally
    *    duplicates a matched name/value row.
    *
    * Scale shape: the scalar subqueries are one-row aggregates Spark plans
    * as subquery broadcasts; the VALUES dims are local relations
    * (broadcast); all other joins are equi-joins keyed on the offering id —
    * co-partitioned with the final GROUP BY, so AQE plans one shuffle on
    * the fact grain. Identical text runs on DuckDB as the oracle.
    */
  val FlagshipFullSql: String =
    """WITH j3 AS (SELECT * FROM (VALUES (0),(1),(2)) AS t(j)),
      |product_offering AS (
      |  SELECT p_partkey AS product_offering_id,
      |         p_name AS product_offering_name,
      |         p_type AS product_offering_desc,
      |         1 AS offering_type_id,
      |         2 AS base_offering_category_id,
      |         p_size % 4 AS offering_category_id,
      |         CASE WHEN p_partkey % 10 = 0 THEN '0' ELSE '1' END AS record_status
      |  FROM part),
      |offering_type AS (
      |  SELECT * FROM (VALUES (1,'MBB Plan'),(2,'Voice Offer'),(3,'Broadband'))
      |    AS t(offering_type_id, offering_type_name)),
      |offering_category AS (
      |  SELECT * FROM (VALUES (0,'Devices'),(1,'SIM-Only'),(2,'Accessories'),(3,'Services'))
      |    AS t(offering_category_id, offering_category_name)),
      |product_offering_param AS (
      |  SELECT p_partkey AS product_offering_id, p_partkey * 3 + j AS parameter_id,
      |         CASE WHEN (p_partkey + j) % 7 = 0 THEN '0' ELSE '1' END AS record_status
      |  FROM part CROSS JOIN j3),
      |parameter AS (
      |  SELECT p_partkey * 3 + j AS parameter_id,
      |         CASE j WHEN 0 THEN 'CH_CONTRACT_DURATION' WHEN 1 THEN 'CFS_SMS' ELSE 'CFS_MMS' END AS parameter_name,
      |         CAST(p_size AS STRING) AS allowed_value,
      |         CASE WHEN p_retailprice > 1500 THEN 'Y' ELSE 'N' END AS default_value,
      |         '1' AS record_status
      |  FROM part CROSS JOIN j3),
      |offering_priceplan AS (
      |  SELECT p_partkey AS product_offering_id, p_partkey AS product_offer_price_id,
      |         CASE WHEN p_partkey % 13 = 0 THEN '0' ELSE '1' END AS record_status
      |  FROM part),
      |priceplan_allowance AS (
      |  SELECT p_partkey AS product_offer_price_id, p_partkey * 5 + j AS prodprice_allowance_id,
      |         '1' AS record_status
      |  FROM part CROSS JOIN j3),
      |prodprice_allowance AS (
      |  SELECT p_partkey * 5 + j AS prodprice_allowance_id,
      |         CASE j WHEN 0 THEN 'SMS' WHEN 1 THEN 'MMS' ELSE 'Mobile Data' END AS prodprice_allowance_name,
      |         CAST(p_size * (j + 1) AS BIGINT) AS spending_total,
      |         '1' AS record_status
      |  FROM part CROSS JOIN j3),
      |priceplan_charge AS (
      |  SELECT p_partkey AS product_offer_price_id, p_partkey * 5 + j AS prodprice_charge_id,
      |         '1' AS record_status
      |  FROM part CROSS JOIN j3),
      |prodprice_charge AS (
      |  SELECT p_partkey * 5 + j AS prodprice_charge_id,
      |         CASE j WHEN 0 THEN 'SMS' WHEN 1 THEN 'MMS' ELSE 'Mobile Data' END AS prodprice_charge_name,
      |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * (j + 1) AS DOUBLE) AS amount,
      |         '1' AS record_status
      |  FROM part CROSS JOIN j3)
      |SELECT a.product_offering_id,
      |       a.product_offering_name,
      |       e.offering_type_name,
      |       CASE WHEN e.offering_type_name = 'MBB Plan' THEN 'MBB Plan'
      |            WHEN e.offering_type_name = 'Voice Offer' THEN 'Voice Offer'
      |            ELSE 'Not Applicable' END AS voice_mbb_offer_flag,
      |       b.offering_category_name AS product_offering_category_name,
      |       CASE WHEN b.offering_category_name = 'Devices' THEN 'Device Offer'
      |            WHEN b.offering_category_name = 'SIM-Only' THEN 'SIM-Only'
      |            ELSE 'Not Applicable' END AS simo_device_offer_flag,
      |       max(CASE WHEN g.parameter_name = 'CH_CONTRACT_DURATION' THEN g.allowed_value END) AS offering_duration,
      |       max(CASE WHEN g.parameter_name = 'CFS_SMS' THEN g.default_value END) AS cfs_sms_flag,
      |       max(CASE WHEN g.parameter_name = 'CFS_MMS' THEN g.default_value END) AS cfs_mms_flag,
      |       max(CASE WHEN n.prodprice_allowance_name = 'SMS' THEN n.spending_total END) AS sms_allowance,
      |       max(CASE WHEN p.prodprice_charge_name = 'SMS' THEN p.amount END) AS sms_unit_price,
      |       max(CASE WHEN n.prodprice_allowance_name = 'MMS' THEN n.spending_total END) AS mms_allowance,
      |       max(CASE WHEN p.prodprice_charge_name = 'MMS' THEN p.amount END) AS mms_unit_price,
      |       max(CASE WHEN n.prodprice_allowance_name = 'Mobile Data' THEN n.spending_total END) AS data_allowance,
      |       max(CASE WHEN p.prodprice_charge_name = 'Mobile Data' THEN p.amount END) AS data_unit_price,
      |       max(z.cat_cnt) AS category_offer_cnt
      |FROM product_offering a
      |LEFT JOIN (SELECT offering_category_id, count(*) AS cat_cnt
      |           FROM product_offering GROUP BY offering_category_id) z
      |  ON z.offering_category_id = a.offering_category_id
      |LEFT JOIN offering_type e
      |  ON e.offering_type_id = (SELECT DISTINCT offering_type_id FROM product_offering)
      |LEFT JOIN offering_category b
      |  ON b.offering_category_id = (SELECT DISTINCT base_offering_category_id FROM product_offering)
      |LEFT JOIN product_offering_param f
      |  ON f.product_offering_id = a.product_offering_id AND f.record_status = '1'
      |LEFT JOIN parameter g
      |  ON g.parameter_id = f.parameter_id
      | AND g.parameter_name IN ('CH_CONTRACT_DURATION','CFS_SMS','CFS_MMS')
      | AND g.record_status = '1'
      |LEFT JOIN offering_priceplan l
      |  ON l.product_offering_id = a.product_offering_id AND l.record_status = '1'
      |LEFT JOIN priceplan_allowance m
      |  ON m.product_offer_price_id = l.product_offer_price_id AND m.record_status = '1'
      |LEFT JOIN prodprice_allowance n
      |  ON n.prodprice_allowance_id = m.prodprice_allowance_id AND n.record_status = '1'
      |LEFT JOIN priceplan_charge o
      |  ON o.product_offer_price_id = l.product_offer_price_id AND o.record_status = '1'
      |LEFT JOIN prodprice_charge p
      |  ON p.prodprice_charge_id = o.prodprice_charge_id AND p.record_status = '1'
      |WHERE a.record_status = '1'
      |GROUP BY 1, 2, 3, 4, 5, 6
      |ORDER BY 1""".stripMargin

  def flagshipFull(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(FlagshipFullSql)
  }

  /** Named-database fidelity (`KafkaScript_ConformToStaging.sh:143` runs
    * `use governed_data; <stored query>`): CREATE DATABASE + saveAsTable
    * into the session catalog, then a stored query over the catalog tables
    * with the database selected via USE — the full governed-warehouse path,
    * not temp views.
    */
  def catalogStoredQuery(spark: SparkSession, dir: String): DataFrame = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_dw")
    // The in-memory session catalog is process-scoped but the warehouse
    // directory persists: a managed-table location left by a previous
    // process would fail CREATE with LOCATION_ALREADY_EXISTS. Drop the
    // orphan location when the catalog doesn't know the table.
    def freshManagedTable(db: String, table: String): Unit =
      if (!spark.catalog.tableExists(s"$db.$table")) {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val p = new org.apache.hadoop.fs.Path(s"$wh/$db.db/$table")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    freshManagedTable("graft_dw", "dim_nation")
    freshManagedTable("graft_dw", "dim_region")
    t(spark, dir, "nation").write.mode("overwrite").saveAsTable("graft_dw.dim_nation")
    t(spark, dir, "region").write.mode("overwrite").saveAsTable("graft_dw.dim_region")
    spark.sql("USE graft_dw")
    try spark.sql(
      """SELECT r_name AS region_name, count(*) AS n_nations, min(n_name) AS first_nation
        |FROM dim_nation JOIN dim_region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY region_name""".stripMargin)
    finally spark.sql("USE default")
  }

  /** 2A-18/19: ordered top-k — Spark plans this as TakeOrderedAndProject
    * (per-partition heap + merge, no global sort materialization).
    */
  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** 2A-21: cast chains + TO_DATE-style parsing round trips
    * (`KafkaDemo.sh:80` to_number, `Fact_Dagg_automation.sh:49` TO_DATE).
    */
  def castConvert(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_custkey").cast("string").cast("long").as("rt_key"),
        unix_timestamp(
          to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd"))
          .as("order_epoch"))
      .orderBy(col("o_orderkey"))

  /** Catalog-driven column profiling (one-pass, all columns in a single
    * aggregate) — the reference's metadata-generated null/count checks
    * generalized (`fact_dim_merging.sh:282-358`).
    */
  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    graft.dq.Profile.profile(t(spark, dir, "orders"), exact = true)
      .select(col("column").as("col_name"), col("n_rows"), col("n_nulls"),
        col("approx_distinct").as("n_distinct"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))

  /** Full CUBE over order status × priority (q39 is the ROLLUP twin) —
    * every grouping-set combination in one Expand pass.
    */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        money(dec2(col("o_totalprice"))).as("total_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("status"), col("priority"))

  /** As-of join: each click enriched with the user's latest purchase at or
    * before the click (graft.ops.AsOf — composed union+window form; DuckDB
    * verifies with its native ASOF JOIN).
    */
  def asofClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = Relational.rankLatest(
        e.filter(col("event_type") === "purchase"),
        Seq(col("user_id"), col("ts_us")), Seq(col("event_id").desc))
      .select(col("user_id"), col("ts_us").as("p_ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.ops.AsOf.joinAsOf(clicks, purchases, "user_id", "ts_us", "p_ts",
        Seq("p_event_id", "p_value"))
      .select(col("event_id"), col("user_id"),
        col("asof_p_event_id"), col("asof_p_value"))
      .orderBy(col("event_id"))
  }

  /** Banded range join: per purchase, clicks of the same user within the
    * preceding 10 minutes — equi-shuffle on (user, bucket) instead of a
    * nested-loop inequality join.
    */
  def rangeJoinClicks(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"))
    graft.ops.RangeJoin.joinRange(purchases, clicks, "user_id", "p_ts", "c_ts",
        window = 600000000L) // 10 min in µs
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_recent_clicks"))
      .orderBy(col("p_id"))
  }

  /** Set-op family completion: INTERSECT (customers active in both halves
    * of the date range — set semantics like Oracle MINUS's sibling).
    */
  def intersectCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val early = o.filter(col("o_orderdate") < lit("1997-01-01")).select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit("1997-01-01")).select(col("o_custkey"))
    early.intersect(late).orderBy(col("o_custkey"))
  }

  /** Window frames beyond rank: running total + lag over customer order
    * history (decimal-exact running sum presented as double).
    */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** The DAGG (daily aggregate) table shape: per-day, per-status rollups —
    * the dimensional layer's daily tables (`Fact_Dagg_automation.sh:25-43`).
    */
  def dailyAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        money(dec2(col("o_totalprice"))).as("day_total"))
      .orderBy(col("order_day"), col("o_orderstatus"))

  /** ROLLUP hierarchy totals (region → nation → grand total) with grouping
    * flags — the aggregate-hierarchy half of the DWDD layer.
    */
  def rollupRegion(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        money(dec2(col("c_acctbal"))).as("total_balance"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("total_balance"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  // ---------------------------------------------------------------------
  // Training-data pipeline operators (documents / embeddings)
  // ---------------------------------------------------------------------

  /** Exact dedup groups: md5 fingerprint → keeper id + group size. */
  def dedupGroups(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDuplicateGroups(t(spark, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("fp"))

  /** Text quality features per document (token counting, quality scoring). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val toks = Text.tokens(col("text"))
    d.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(toks).as("n_tokens"),
        Text.subwordCount(col("text")).as("n_subwords"),
        Text.tokensIn(col("text"),
          Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
            "that", "for", "on", "with", "as")).as("stopword_hits"),
        size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0))).as("punct_count"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("sum_token_len"))
      .orderBy(col("doc_id"))
  }

  /** Language ID via stopword-hit argmax. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** C4-style quality filter: keep documents passing token/punct thresholds. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(Text.tokenCount(col("text")).between(15, 40) &&
        size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0))) === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** MinHash signatures (4 seeded hashes over 3-shingles, md5-portable). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val sh = Text.shingles(col("text"), 3)
    d.filter(size(sh) > 0)
      .select(col("doc_id") +: Dedup.minHashSignature(sh, 4): _*)
      .orderBy(col("doc_id"))
  }

  /** MinHash+LSH near-duplicate candidate pairs (2 bands × 2 rows). */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashCandidates(
        t(spark, dir, "documents").filter(size(Text.shingles(col("text"), 3)) > 0),
        col("doc_id"), col("text"), shingleK = 3, bands = 2, rowsPerBand = 2)
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash 64-bit signatures (xxhash64 fast path — rows-only check). */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), Dedup.simHash64(col("text")).as("sig"))
      .orderBy(col("doc_id"))

  /** Engine-portable 32-bit md5 SimHash — same algorithm under the real
    * DuckDB oracle (the per-token hash is plain SQL on both engines).
    */
  def simhashPortable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), Dedup.simHash32Md5(col("text")).as("sig"))
      .orderBy(col("doc_id"))

  /** SimHash banded Hamming near-dup candidate pairs over the md5-portable
    * 32-bit signatures — q52's signature derivation fed through the same
    * banding machinery as the 64-bit fast path
    * ([[graft.functions.Dedup.simHashCandidatesFromSigs]]), which puts the
    * pair-level SimHash path under a real DuckDB oracle.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = t(spark, dir, "documents")
      .select(col("doc_id"), Dedup.simHash32Md5(col("text")).as("sig"))
    Dedup.simHashCandidatesFromSigs(sigs, bits = 32, bands = 2, maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Brute-force exact cosine top-10 for query vectors (ANN baseline). */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs (exact, on an id-bounded slice —
    * the LSH-bucketed variant below is the scale path).
    */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceNearDups(
        t(spark, dir, "embeddings").filter(col("vec_id") < 2000),
        col("vec_id"), col("embedding"), threshold = 0.45)
      .orderBy(col("id_a"), col("id_b"))

  /** Corpus-wide term frequencies (explode → count → top 50). */
  def termFreq(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(Text.tokens(Text.normalized(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(50)

  /** Top-3 TF-IDF terms per document (score used for ranking only — ln()
    * last-ulp differences across engines never reorder distinct (tf, df)
    * pairs, whose scores differ by ≥ ln((df+1)/df)).
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Tfidf.topTerms(t(spark, dir, "documents"),
        col("doc_id"), col("text"), k = 3)
      .select(col("doc_id"), col("term"), col("tf"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))

  /** LSH-bucketed approximate top-k (scale path). Under the real DuckDB
    * oracle: the SplitMix64 hyperplane coefficients are embedded in the
    * oracle SQL as literals, so both engines bucket identically.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.lshTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
        k = 10, dim = 64, bits = 6)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF-bucketed approximate top-k (scale path, data-adaptive cells;
    * q30 is the exact baseline). Under the real DuckDB oracle: the
    * hash-ordered centroid sample and the probe ranking are plain SQL.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
        k = 10, nCentroids = 32, nProbe = 8)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Exact character-3-gram Jaccard over (lang, source)-blocked pairs on a
    * deterministic 1-in-5 sample — the oracle row for the n-gram Jaccard
    * family (q28's LSH candidates are the scale path; this blocked exact
    * form is plain SQL on both engines, so it carries a real DuckDB oracle).
    */
  def jaccardBlocked(spark: SparkSession, dir: String): DataFrame =
    Dedup.blockedJaccardPairs(
        t(spark, dir, "documents").filter(col("doc_id") % 5 === 0),
        col("doc_id"), col("text"), Seq(col("lang"), col("source")),
        shingleK = 3, threshold = 0.2)
      .select(col("id_a").as("left_id"), col("id_b").as("right_id"), col("jaccard"))
      .orderBy(col("left_id"), col("right_id"))

  /** Deterministic 80/10/10 train/val/test split from the md5 hash bucket of
    * doc_id — reproducible, shuffle-free at any scale (pure projection), and
    * plain SQL on both engines.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("split", Sampling.split(col("doc_id"), trainPct = 80, valPct = 10))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))

  /** Deterministic stratified sample: first 5 docs per language in
    * hash-bucket order. The input is projected to (lang, doc_id) at the
    * scan — the sampler's shuffle carries two narrow columns, never text.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(
        t(spark, dir, "documents").select(col("lang"), col("doc_id")),
        Seq(col("lang")), col("doc_id"), perStratum = 5)
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))

  /** Sequence packing: documents → 4000-char bins per hash shard (running
    * sum in doc_id order), rolled up to per-bin occupancy — the batch-shape
    * audit a pretraining data pipeline runs after packing.
    */
  def packBins(spark: SparkSession, dir: String): DataFrame =
    Sampling.packByBudget(t(spark, dir, "documents"),
        col("doc_id"), col("n_chars"), budget = 4000L, shards = 8)
      .groupBy(col("shard"), col("pack_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bin_chars"))
      .orderBy(col("shard"), col("pack_bin"))

  /** Multimodal pipeline end-to-end (rows-only: DuckDB can't decode
    * pixels or samples): synthetic binary media — real PNG bytes for
    * images, real WAV bytes for audio — partition-batched feature
    * extraction through the JDK-native decoders
    * ([[graft.functions.Multimodal.JvmCodec]]; only video remains on the
    * deterministic fake) → per-kind rollup of the extracted features.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.functions.Multimodal.syntheticMedia(spark, 300)
    val feats = graft.functions.Multimodal
      .extractFeatures(media, graft.functions.Multimodal.JvmCodec, dim = 16)
      .toDF()
    feats
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(Similarity.norm(col("feature"))).as("mean_norm"))
      .orderBy(col("kind"))
  }

  /** Dedicated pivot operator (RelationalGroupedDataset.pivot with a static
    * value list — the planned form; q11 is the manual CASE twin).
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Exact percentiles (sort-based `percentile`, linear interpolation —
    * l_quantity is integral so interpolated values are exact halves).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Fixed-range histogram binning (explicit floor-division formula, same
    * arithmetic on both engines; `width_bucket` where available).
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** Salted two-phase aggregation — same result as the direct GROUP BY
    * (the oracle runs the direct form), so the skew rewrite is itself
    * under the differential gate.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedAggregate(
        t(spark, dir, "events"), Seq(col("event_type")), buckets = 8,
        partialAggs = Seq(
          sum(dec2(col("value"))).as("pv"),
          count(lit(1)).as("pn")),
        finalAggs = Seq(
          sum(col("pv")).cast("double").as("total_value"),
          sum(col("pn")).as("n")))
      .orderBy(col("event_type"))

  /** Duplicate-cluster resolution over the LSH candidate pairs (q28's
    * output): connected components by iterated label propagation
    * ([[graft.functions.Dedup.connectedComponents]]), cluster = min doc_id
    * of the component. DuckDB verifies with a recursive-CTE transitive
    * closure over the same pairs.
    *
    * `spark.graft.checkpoint.dir` (session conf) switches the iteration's
    * lineage cuts from executor-local checkpoints to reliable ones against
    * that directory — the cluster-mode setting (survives executor loss);
    * unset = local-mode fast path.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(minhashPairs(spark, dir),
        checkpointDir = spark.conf.getOption("spark.graft.checkpoint.dir"))
      .orderBy(col("id"))

  /** Production twin of q36: the same single-pass profile with
    * approx_count_distinct — no Expand, one partial/final aggregate pair
    * regardless of column count. Rows-only under the driver (HLL estimates
    * are engine-specific), but benched, so the measured number tracks the
    * plan the operator ships with; q36 keeps exact distinct so DuckDB can
    * match values.
    */
  def profileOrdersApprox(spark: SparkSession, dir: String): DataFrame =
    graft.dq.Profile.profile(t(spark, dir, "orders"), exact = false)
      .select(col("column").as("col_name"), col("n_rows"), col("n_nulls"),
        col("approx_distinct").as("n_distinct"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))

  /** Salted join under the oracle: the skew rewrite must be invisible to
    * results, so DuckDB verifies with the plain join. The fact side is
    * events on its naturally skewed event_type; the dim is the per-type
    * average (sum/count division done identically in double on both
    * engines for bit parity).
    */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    val dim = events.groupBy(col("event_type"))
      .agg((sum(dec2(col("value"))).cast("double") / count(lit(1))).as("type_avg"))
    graft.ops.Skew.saltedJoin(events, dim, "event_type", buckets = 8)
      .groupBy(col("event_type"))
      .agg(count(when(col("value") > col("type_avg"), 1)).as("n_above"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Document chunking into training windows: 32-token chunks advancing by
    * 24 (8-token overlap), with the chunk text materialized from the token
    * slice — the final shaping step before packing (q57).
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        Text.tokens(Text.normalized(col("text"))).as("w"),
        explode(Text.chunkSpans(col("text"), chunkSize = 32, stride = 24)).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.start_tok"), col("c.chunk_len"),
        array_join(slice(col("w"), col("c.start_tok").cast("int") + 1,
          col("c.chunk_len").cast("int")), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Data-mixing quota sample: a 200-doc mixture at 60% en / 15% es /
    * 15% fr / 10% de (zh excluded) — the curation step that pins training
    * mixture proportions.
    */
  def mixtureSampleDocs(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(
        t(spark, dir, "documents").select(col("lang"), col("doc_id")),
        col("lang"), col("doc_id"),
        weights = Map("en" -> 0.60, "es" -> 0.15, "fr" -> 0.15, "de" -> 0.10),
        total = 200L)
      .select(col("lang"), col("doc_id"), col("mix_rank"))
      .orderBy(col("lang"), col("mix_rank"))

  /** Token-budget mixture ([[graft.functions.Sampling.tokenBudgetSample]]):
    * a training mix stated in TOKENS — 30k en / 10k es / 10k fr / 5k de
    * (zh excluded) — admitted as a per-language hash-order prefix whose
    * running token sum stays within budget.
    */
  def tokenBudgetMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.tokenBudgetSample(
        // token count is computed IN the scan projection: only
        // (lang, doc_id, n_tokens) ever shuffles, text is pruned at the scan
        t(spark, dir, "documents").select(col("lang"), col("doc_id"),
          Text.tokenCount(col("text")).as("__tok")),
        col("lang"), col("doc_id"), col("__tok"),
        budgets = Map("en" -> 30000L, "es" -> 10000L, "fr" -> 10000L, "de" -> 5000L))
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"))

  /** Benchmark decontamination over the q55 hash split: held-out docs
    * (bucket ≥ 90) sharing a word 5-gram with any train doc (bucket < 80),
    * with train-doc and shared-gram counts.
    */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val bkt = Sampling.hashBucket(col("doc_id"), 100)
    Dedup.contamination(
        d.filter(bkt < 80), col("doc_id"), col("text"),
        d.filter(bkt >= 90), col("doc_id"), col("text"), k = 5)
      .orderBy(col("test_id"))
  }

  /** Intra-document repetition ratio (word 3-grams repeating within one
    * document) — the Gopher/C4-style repetitious-text quality rule.
    */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    val stats = Text.repetitionStats(col("text"), 3)
      .map { case (n, c) => c.as(n) }
    t(spark, dir, "documents")
      .select(col("doc_id") +: stats: _*)
      .filter(col("n_grams") > 0)
      .withColumn("rep_ratio",
        col("n_repeated").cast("double") / col("n_grams"))
      .orderBy(col("doc_id"))
  }

  /** Per-document out-of-vocabulary rate against the corpus top-50
    * vocabulary (q40's term ranking) — the token-coverage signal a
    * data-mixing pass thresholds on.
    */
  def oovRateDocs(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Tfidf.oovRate(t(spark, dir, "documents"),
        col("doc_id"), col("text"), vocabSize = 50)
      .orderBy(col("doc_id"))

  /** The PQ codebook every PQ query shares: 8 subvectors × 16 centroids
    * over the 64-dim embeddings, fit from the deterministic hash-ordered
    * sample (reproduced verbatim in the oracle SQL).
    */
  private def pqCodebook(spark: SparkSession, dir: String): graft.functions.Pq.Codebook =
    graft.functions.Pq.fit(t(spark, dir, "embeddings"),
      col("vec_id"), col("embedding"), m = 8, k = 16)

  /** Product-quantization codes: each embedding compressed to one packed
    * BIGINT (8 × 4-bit centroid ids) — 32× narrower than the raw vector.
    */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    t(spark, dir, "embeddings")
      .select(col("vec_id"), graft.functions.Pq.encode(col("embedding"), cb).as("pq_code"))
      .orderBy(col("vec_id"))
  }

  /** ADC top-10 per query over the PQ codes (the compressed-domain
    * candidate scan; q30 is the uncompressed exact baseline).
    */
  def pqAdcTopK(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    val e = t(spark, dir, "embeddings")
    graft.functions.Pq.adcTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), cb, k = 10)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF + PQ two-stage index (coarse cells → ADC rank on codes; q30 is
    * the exact baseline, q67 the unfiltered ADC scan).
    */
  def ivfPqQuery(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    val e = t(spark, dir, "embeddings")
    graft.functions.Pq.ivfPqTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
        cb, k = 10, nCentroids = 32, nProbe = 8)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The k-means model q72/q75 share: 8 clusters, 2 Lloyd iterations over
    * the 64-dim embeddings — hash-ordered init and fixed-point means
    * ([[graft.functions.Kmeans]]), so the oracle's iteration-CTE chain
    * reproduces the fit bit-for-bit.
    */
  private def kmeansModel(spark: SparkSession, dir: String): graft.functions.Kmeans.Model =
    graft.functions.Kmeans.fit(t(spark, dir, "embeddings"),
      col("vec_id"), col("embedding"), k = 8, iters = 2)

  /** Distributed k-means (semantic clustering for curation): cluster sizes
    * + fixed-point inertia after two Lloyd iterations. Each iteration is
    * one corpus scan — assignment is a pure projection (centroids ride
    * inside the expression), the mean update a k×dim-row aggregate.
    */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Kmeans.clusterProfile(t(spark, dir, "embeddings"),
        col("vec_id"), col("embedding"), kmeansModel(spark, dir))
      .select(col("cluster").cast("long").as("cluster"), col("n_vecs"), col("inertia"))
      .orderBy(col("cluster"))

  /** Majority-label purity per k-means cluster — do the clusters track the
    * label facet (topic balancing / cluster-sampling diagnostic).
    */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val assigned = graft.functions.Kmeans.assign(e, col("vec_id"), col("embedding"),
      kmeansModel(spark, dir))
    graft.functions.Kmeans.purity(assigned,
        e.select(col("vec_id"), col("label")), col("label"))
      .select(col("cluster").cast("long").as("cluster"), col("n_vecs"),
        col("top_label").cast("long").as("top_label"), col("top_n"))
      .orderBy(col("cluster"))
  }

  /** Duplicated-span fraction per document (word 5-grams shared with any
    * other document) — the scalable exact-substring-dedup signal
    * ([[graft.functions.Dedup.duplicatedSpanStats]]).
    */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.duplicatedSpanStats(
        t(spark, dir, "documents"), col("doc_id"), col("text"), k = 5)
      .orderBy(col("doc_id"))

  /** Int8 scalar quantization of the embeddings with per-label
    * reconstruction-error rollup ([[graft.functions.Quant]]): the 4×
    * embedding-storage compression next to PQ's 32× (q66).
    */
  def int8Quant(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = graft.functions.Quant.fitScale(e, col("embedding"))
    e.select(col("label").cast("long").as("label"),
        graft.functions.Quant.reconstructionError(col("embedding"), scale).as("err"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(floor(col("err") * lit(1e12)).cast(DecimalType(38, 0)))
          .cast("double") / lit(1e12)).as("total_err"),
        max(col("err")).as("max_err"))
      .orderBy(col("label"))
  }

  /** Gopher-style quality-rule pass rates per (lang, source) facet
    * ([[graft.functions.Text.gopherFlags]]): the rule-based curation gate
    * a pretraining pipeline runs before any model-based filter. One
    * corpus scan, one small shuffle of facet-keyed partial sums.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val flags = Text.gopherFlags(col("text"))
    val flagged = t(spark, dir, "documents")
      .select(col("lang") +: col("source") +: flags.map { case (n, c) => c.as(n) }: _*)
    flagged
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len_ok")).as("n_len_ok"),
        sum(col("word_len_ok")).as("n_word_len_ok"),
        sum(col("alpha_ok")).as("n_alpha_ok"),
        sum(col("stop_ok")).as("n_stop_ok"),
        sum(col("rep_ok")).as("n_rep_ok"),
        sum(col("len_ok") * col("word_len_ok") * col("alpha_ok") *
          col("stop_ok") * col("rep_ok")).as("n_pass"))
      .orderBy(col("lang"), col("source"))
  }

  /** PII detect + redact over documents ([[Text.piiCounts]] /
    * [[Text.redactPii]]). The synthetic corpus carries no organic PII, so
    * the query first plants deterministic emails/IPs/phones keyed off
    * `doc_id` — the SAME arithmetic the oracle SQL applies — then counts
    * and scrubs them. Redaction fidelity is pinned by length + md5 of the
    * scrubbed text. Pure projection: zero shuffles besides the final sort.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val planted = t(spark, dir, "documents").withColumn("t2", concat(
      col("text"),
      when(d % 3 === 0,
        concat(lit(" contact user"), d.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(d % 5 === 0, lit(" or admin@test.org")).otherwise(lit("")),
      when(d % 4 === 0, concat(lit(" from 10."), (d % 32).cast("string"),
        lit(".0."), (d % 256).cast("string"))).otherwise(lit("")),
      when(d % 7 === 0, lit(" call 555-0199")).otherwise(lit(""))))
    val counts = Text.piiCounts(col("t2")).map { case (n, c) => c.as(n) }
    planted
      .select(d +: counts :+
        length(Text.redactPii(col("t2"))).cast("long").as("redacted_len") :+
        md5(Text.redactPii(col("t2"))).as("redacted_md5"): _*)
      .orderBy(d)
  }

  /** Domain-frequency stats with a blocklist filter over URLs mentioned in
    * the corpus ([[Text.urlHosts]]): the reach/diversity signal a crawl
    * curation pass computes before sampling. URLs are planted like q77's
    * PII (the corpus has none). Shuffle carries (domain, doc_id) only.
    */
  def urlDomainStats(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val planted = t(spark, dir, "documents").withColumn("t2", concat(
      col("text"),
      when(d % 2 === 0, concat(lit(" see https://site"), (d % 20).cast("string"),
        lit(".example.com/p"), d.cast("string"))).otherwise(lit("")),
      when(d % 3 === 0, concat(lit(" ref http://www.ref"), (d % 7).cast("string"),
        lit(".org/page"))).otherwise(lit(""))))
    planted
      .select(d, explode(Text.urlHosts(col("t2"))).as("domain"))
      .filter(!col("domain").isin("site3.example.com", "www.ref2.org"))
      .groupBy(col("domain"))
      .agg(countDistinct(d).as("n_docs"), count(lit(1)).as("n_refs"))
      .orderBy(col("domain"))
  }

  /** Quality-aware dedup survivorship
    * ([[graft.functions.Dedup.bestQualityKeepers]]): duplicate groups
    * planted by collapsing every 7th document onto one of 3 shared bodies;
    * the keeper is the copy with the most original characters (ties to the
    * smallest id), not the first-crawled one — the survivorship policy of
    * a real curation pass.
    */
  def qualityKeeperDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val planted = t(spark, dir, "documents").withColumn("t2",
      when(d % 7 === 0,
        concat(lit("shared duplicate body "), (d % 3).cast("string")))
        .otherwise(col("text")))
    Dedup.bestQualityKeepers(planted, d, col("t2"), col("n_chars").cast("long"))
      .orderBy(col("fp"))
  }

  /** Near-dup CLUSTER survivorship
    * ([[graft.functions.Dedup.clusterQualityKeepers]]): q60's connected
    * components composed with q95's quality policy — per duplicate
    * cluster (transitive closure of the LSH candidate pairs, not per
    * exact fingerprint), keep the highest-quality member (ties to the
    * smallest id). This is the step a real minhash pipeline runs after
    * clustering: the capstone of candidates (q28) → components (q60) →
    * survivors. DuckDB replays the full chain — recursive-CTE closure
    * over the same pairs, then the keeper window per label.
    */
  def clusterSurvivorship(spark: SparkSession, dir: String): DataFrame =
    Dedup.clusterQualityKeepers(
        Dedup.connectedComponents(minhashPairs(spark, dir),
          checkpointDir = spark.conf.getOption("spark.graft.checkpoint.dir")),
        t(spark, dir, "documents"), col("doc_id"), col("n_chars").cast("long"))
      .orderBy(col("cluster"))

  /** α=½ temperature mixture ([[graft.functions.Sampling
    * .sqrtMixtureSample]]): draw a 2000-document corpus whose language
    * proportions follow sqrt-smoothed shares — the standard multilingual
    * rare-language upweighting — with quotas in exact BIGINT isqrt
    * arithmetic, so DuckDB replays weight, quota, and admission
    * bit-for-bit.
    */
  def alphaMixture(spark: SparkSession, dir: String): DataFrame =
    Sampling.sqrtMixtureSample(
        t(spark, dir, "documents").select(col("doc_id"), col("lang")),
        col("lang"), col("doc_id"), total = 2000L)
      .select(col("doc_id"), col("lang"), col("mix_rank"), col("quota"))
      .orderBy(col("lang"), col("mix_rank"))

  /** Domain-reputation blocklist ([[graft.functions.Domains
    * .domainReputation]]): synthetic crawl URLs spread the corpus over 17
    * registered domains (with `www.`/`cdn.` subdomain variants and one
    * `:port` form rolling up); two domains are poisoned the way spam
    * domains actually look — site5 half-filled with one short
    * click-bait string, site11 three-quarters-filled with one boilerplate
    * body — and the exact-arithmetic verdict (dup share > 25% at ≥ 20
    * docs, or mean length < 60 chars) blocks precisely those. The report
    * is the differential surface; [[graft.functions.Domains
    * .blocklistFilter]]'s anti-join is spec-covered.
    */
  def domainBlocklist(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val url = concat(lit("https://"),
      when(d % 3 === 0, lit("www.")).when(d % 3 === 1, lit("cdn."))
        .otherwise(lit("")),
      lit("site"), (d % 17).cast("string"), lit(".net"),
      when(d % 17 === 0, lit(":8080")).otherwise(lit("")),
      lit("/page/"), (d % 7).cast("string"))
    val planted = t(spark, dir, "documents")
      .withColumn("t2",
        when(d % 17 === 5 && d % 2 === 0,
          lit("click here to win a free prize"))
          .when(d % 17 === 11 && d % 4 =!= 0, lit(BoilerplateBody))
          .otherwise(col("text")))
      .select(url.as("u"), col("t2"))
    Domains.domainReputation(planted, col("u"), col("t2"),
        length(col("t2")), minDocs = 20L, maxDupPct = 25L,
        minMeanChars = 60L)
      .orderBy(col("domain"))
  }

  /** Dataset "data card" ([[graft.functions.Sampling.exactQuantiles]]):
    * the per-(source, lang) release table — doc counts, exact token and
    * char totals, and EXACT median/p90 length via histogram rank-math
    * (inverse ECDF), where `approx_percentile` would be engine-specific
    * and fall out of the differential oracle. The quantile windows run
    * over the (source, lang, length) histogram, never the corpus.
    */
  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val stats = d.select(col("source"), col("lang"),
        Text.tokenCount(col("text")).cast("long").as("toks"), col("n_chars"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"))
    val quants = Sampling.exactQuantiles(
        d.select(col("source"), col("lang"), col("n_chars")),
        Seq("source", "lang"), col("n_chars"), Seq(0.5, 0.9))
      .withColumnRenamed("p50", "median_chars")
      .withColumnRenamed("p90", "p90_chars")
    stats.join(quants, Seq("source", "lang"))
      .orderBy(col("source"), col("lang"))
  }

  /** The constant spam body planted on q98's site11 — one string shared
    * verbatim with the DuckDB oracle. */
  private val BoilerplateBody =
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do" +
      " eiusmod tempor incididunt ut labore et dolore magna aliqua"

  /** URL canonicalization + dedup ([[graft.functions.Text
    * .canonicalizeUrl]]): raw URLs planted with the variation a crawl
    * frontier actually sees — mixed-case hosts, `www.` prefixes, trailing
    * slashes, `utm_*` tracking params, fragments — collapse onto their
    * canonical form; per canonical URL the dedup reports document reach,
    * how many distinct raw spellings it absorbed, and the min-doc keeper.
    * Pure projection → one narrow groupBy shuffle: the
    * have-we-fetched-this-already gate at frontier scale.
    */
  def urlCanonDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val raw = concat(
      lit("https://"),
      when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), (d % 10).cast("string"),
      lit(".Example.com/doc/"), (d % 5).cast("string"),
      when(d % 2 === 0, lit("/")).otherwise(lit("")),
      when(d % 3 === 1, concat(lit("?utm_source=feed&ref="), (d % 2).cast("string")))
        .when(d % 3 === 2, concat(lit("?ref="), (d % 2).cast("string")))
        .otherwise(lit("")),
      when(d % 5 === 0, concat(lit("#sec"), (d % 3).cast("string"))).otherwise(lit("")))
    t(spark, dir, "documents").select(d, raw.as("raw_url"))
      .withColumn("canonical_url", Text.canonicalizeUrl(col("raw_url")))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_url")).as("n_raw_forms"),
        min(d).as("keep_doc"))
      .orderBy(col("canonical_url"))
  }

  /** C4-style boilerplate-line removal ([[graft.functions.Dedup
    * .boilerplateSummary]]): lines recurring across ≥100 documents are
    * boilerplate; per-doc counts + characters kept. Boilerplate lines are
    * planted (corpus text is single-line): two hot lines cross the
    * threshold, one rare line stays content.
    */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val planted = t(spark, dir, "documents").withColumn("t2", concat(
      col("text"),
      when(d % 3 === 0, lit("\nsubscribe to our newsletter today"))
        .otherwise(lit("")),
      when(d % 4 === 0, lit("\nall rights reserved")).otherwise(lit("")),
      when(d % 50 === 0, lit("\nrare promo line")).otherwise(lit(""))))
    graft.functions.Dedup
      .boilerplateSummary(planted, d, col("t2"), minDocs = 100L)
      .orderBy(col("doc_id"))
  }

  /** Group-wise z-score outliers on event values
    * ([[graft.dq.Checks.zscoreOutliers]]): exact integer-sum moments per
    * event type, broadcast back over the fact scan, |z| > 3 survives.
    */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame =
    graft.dq.Checks.zscoreOutliers(
        t(spark, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        col("event_type"), col("value"), threshold = 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy(col("event_type"), col("event_id"))

  /** Bloom-filter membership ([[graft.ops.Bloom]]): high-spend order
    * custkeys fold into a 1024-bit filter; every customer is tested by
    * broadcast, with the exact member set alongside so the per-nation
    * rollup exposes the false-positive overhead a re-verify pass would
    * pay. The probe side never shuffles on the key.
    */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val keys = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("key")).distinct()
    val bloom = graft.ops.Bloom.build(keys, col("key"))
    graft.ops.Bloom.mightContain(cust, col("c_custkey"), bloom)
      .join(broadcast(keys.withColumnRenamed("key", "mk")),
        col("c_custkey") === col("mk"), "left")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("might_contain"), 1L).otherwise(0L)).as("n_bloom_pos"),
        sum(when(col("mk").isNotNull, 1L).otherwise(0L)).as("n_members"))
      .orderBy(col("nation"))
  }

  /** Char-bigram LM fluency scores ([[graft.functions.LmScore]]): the
    * corpus-trained transition model broadcasts onto one explode of each
    * document's bigrams; scores are exact BIGINT sums of integer-scaled
    * conditional frequencies (the engine-portable perplexity stand-in).
    */
  def lmFluency(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val model = graft.functions.LmScore.bigramModel(docs, col("text"))
    graft.functions.LmScore.score(docs, col("doc_id"), col("text"), model)
      .orderBy(col("doc_id"))
  }

  /** Incremental batch-vs-corpus dedup ([[graft.functions.Dedup
    * .incrementalNew]]): docs split 80/20 into corpus/new batch by id, with
    * every 50th corpus doc re-planted into the batch under a shifted id —
    * the anti join must remove exactly those replants.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
      .unionAll(corpus.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    graft.functions.Dedup.incrementalNew(corpus, batch, col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** Per-language quality deciles ([[Sampling.quantileBins]]): rank docs by
    * length inside each language, cut into 10 equal-count bins, roll up
    * counts + length bounds per bin — the labels a quality-weighted
    * mixture sampler draws from.
    */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame =
    Sampling.quantileBins(
        t(spark, dir, "documents").select(col("lang"), col("n_chars"), col("doc_id")),
        col("lang"), col("n_chars"), col("doc_id"), n = 10)
      .groupBy(col("lang"), col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("bin"))

  /** The full curation funnel as ONE query — the composite a pretraining
    * data pipeline actually runs, each stage a verified operator from this
    * catalog applied cumulatively, reported as docs surviving per stage:
    * raw → exact dedup (q23) → Gopher quality gate (q76) → train split
    * (q55) → decontamination vs the test split (q63) → bottom-decile
    * length trim (q84). At 100 TB every stage keeps its own scale shape
    * (fingerprint shuffle, scan-local flags, hash-bucket projection,
    * gram-hash semi join, per-stratum ntile); the funnel adds nothing but
    * the final 6-row count union.
    */
  /** Stage-boundary materialization for multi-stage funnels, selected by
    * the session conf `spark.graft.funnel.storage`:
    *
    *  - unset → `persist()` (MEMORY_AND_DISK) — the local/interactive
    *    default;
    *  - a StorageLevel name (`DISK_ONLY`, `MEMORY_AND_DISK_SER`, …) →
    *    persist at that level;
    *  - `checkpoint` → reliable write-through to the q60 seam's
    *    `spark.graft.checkpoint.dir` — the cluster default for a 100 TB
    *    funnel, where stage boundaries belong in storage, not executor
    *    memory, and must survive executor loss.
    */
  private def stageBoundary(spark: SparkSession, df: DataFrame): DataFrame =
    spark.conf.getOption("spark.graft.funnel.storage") match {
      case Some("checkpoint") =>
        val sc = spark.sparkContext
        spark.conf.getOption("spark.graft.checkpoint.dir").foreach { cd =>
          if (!sc.getCheckpointDir.exists(_.contains(cd))) sc.setCheckpointDir(cd)
        }
        df.checkpoint(eager = false)
      case Some(level) =>
        df.persist(org.apache.spark.storage.StorageLevel.fromString(level))
      case None => df.persist()
    }

  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    // keep1 feeds three consumers (its own stage count, keep2's count, the
    // keep3 build) — materialize it like keep3/keep4 below, or the
    // fingerprint window runs three times.
    val keep1 = stageBoundary(spark, d.withColumn("fp", Text.fingerprint(col("text")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1).drop("__rk", "fp"))
    val keep2 = keep1.filter(
      Text.gopherFlags(col("text")).map(_._2).reduce(_ * _) === 1L)
    val bkt = Sampling.hashBucket(col("doc_id"), 100)
    // The train-split boundary feeds three consumers (its own count, the
    // contamination gram explode, the anti join) — materialize it, as a
    // real funnel would its stage boundaries, so the fingerprint window
    // + quality flags run once instead of three times.
    val keep3 = stageBoundary(spark, keep2.filter(bkt < 80))
    val test = d.filter(bkt >= 90)
    val dropIds = Dedup.contaminatedIds(keep3, col("doc_id"), col("text"),
      test, col("doc_id"), col("text"), k = 5)
    val keep4 = stageBoundary(spark, keep3.join(dropIds, Seq("doc_id"), "left_anti"))
    // narrow projection into the decile operator: the funnel only counts
    // survivors, so the bin labeling needs (doc_id, lang, n_chars) — text
    // stays behind at the keep4 boundary
    val keep5 = Sampling.quantileBins(
      keep4.select(col("doc_id"), col("lang"), col("n_chars")),
      col("lang"), col("n_chars"), col("doc_id"), n = 10)
      .filter(col("bin") >= 2)
    Seq("0_raw" -> d, "1_exact_dedup" -> keep1, "2_quality_gate" -> keep2,
        "3_train_split" -> keep3, "4_decontaminated" -> keep4,
        "5_decile_trim" -> keep5)
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs")) }
      .reduce(_ unionAll _)
      .orderBy(col("stage"))
  }

  /** Content-defined chunking with cross-doc chunk dedup
    * ([[graft.functions.Dedup.cdcChunkStats]]): rolling 8-char-window
    * boundaries at hash ≡ 0 mod 64, chunk doc-frequency over md5 hashes.
    */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.cdcChunkStats(
        t(spark, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  /** The multimodal METADATA contract under a real oracle: q42's feature
    * rollup stays rows-only (codec output isn't SQL), but the typed
    * metadata the pipeline routes on — kind, dimensions, sample rate,
    * duration — is deterministic arithmetic over the id
    * ([[graft.functions.Multimodal.syntheticMedia]]), so DuckDB replays it
    * from `range(300)` and pins the plumbing exactly: per-kind counts,
    * duration totals, dimension bounds.
    */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal.syntheticMedia(spark, 300)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("duration_ms")).cast("long").as("total_duration_ms"),
        sum(col("width").cast("long") * col("height")).as("total_pixels"),
        max(col("sample_rate")).cast("long").as("max_sample_rate"))
      .orderBy(col("kind"))

  /** Temporal-split cold-start audit: split events at the 80th time
    * percentile (integer nano math), then measure, per event type, how
    * many evaluation-window events belong to users with NO history in the
    * training window — the leakage-vs-coverage number a time-based
    * train/eval split reports before features are built. The train side
    * reduces to distinct user ids (a narrow semi-join input), never
    * re-scanning event payloads.
    */
  def coldStartAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").select(col("event_id"), col("event_type"),
      col("user_id"), col("ts"))
    // deterministic cut: min + 80% of the span (integer nanos). The 1-row
    // min/max aggregate stays IN-PLAN as a broadcast cross join — no
    // driver-side .head(), so the audit is a single job and is safe on an
    // empty events table (zero rows out instead of an NPE).
    val bounds = e.agg(min(col("ts")).as("__lo"), max(col("ts")).as("__hi"))
    val withCut = e.crossJoin(broadcast(bounds))
      // DIV = integral division, matching the oracle's `(hi - lo) // 5 * 4`
      // exactly (Column./ would detour through double).
      .withColumn("__cut", col("__lo") + expr("(__hi - __lo) DIV 5") * 4)
    val trainUsers = withCut.filter(col("ts") < col("__cut"))
      .select(col("user_id")).distinct()
      .withColumn("seen", lit(1L))
    withCut.filter(col("ts") >= col("__cut"))
      .join(broadcast(trainUsers), Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval_events"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_cold_start"),
        countDistinct(when(col("seen").isNull, col("user_id"))).as("n_cold_users"))
      .orderBy(col("event_type"))
  }

  /** K-anonymity facet suppression: publishable per-(lang, source) rollups
    * with facets under k=8 documents suppressed into an "__other__"
    * bucket instead of dropped — group sizes stay truthful while no rare
    * facet is exposed. The pre-publication privacy gate of a shared
    * corpus-stats table.
    */
  def kAnonFacets(spark: SparkSession, dir: String): DataFrame = {
    val k = 8L
    val d = t(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    d.select(
        when(col("n_docs") >= k, col("lang")).otherwise(lit("__other__")).as("lang_pub"),
        when(col("n_docs") >= k, col("source")).otherwise(lit("__other__")).as("source_pub"),
        col("n_docs"), col("total_chars"))
      .groupBy(col("lang_pub"), col("source_pub"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_chars")).as("total_chars"))
      .orderBy(col("lang_pub"), col("source_pub"))
  }

  /** SemDedup ([[graft.functions.Similarity.semDedupFlags]]): the q72
    * k-means model blocks the embedding space; within each cluster any
    * vector with a lower-id cosine-0.45 near-duplicate is dropped — the
    * embedding-space twin of exact dedup's min-id keeper. DuckDB replays
    * the full chain: the q72 centroid iteration CTEs, within-cluster
    * cosine pairs, and the survivor flags.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Similarity.semDedupFlags(t(spark, dir, "embeddings"),
        col("vec_id"), col("embedding"), kmeansModel(spark, dir), threshold = 0.45)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"), col("kept"))
      .orderBy(col("vec_id"))

  /** Cluster-balanced diversity sample: the q72 k-means model assigns
    * every vector (pure projection — centroids ride inside the
    * expression), then a per-cluster hash-ordered top-10 take
    * ([[graft.functions.Sampling.stratifiedSample]]) — the
    * diversity-preserving downsampling a topic-balanced mixture runs
    * (uniform per semantic cluster rather than per corpus), append-stable
    * like every sampler here. Vectors never shuffle: only
    * (vec_id, cluster) enters the sampling window.
    */
  def clusterSample(spark: SparkSession, dir: String): DataFrame = {
    val assigned = graft.functions.Kmeans.assign(t(spark, dir, "embeddings"),
        col("vec_id"), col("embedding"), kmeansModel(spark, dir))
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    Sampling.stratifiedSample(assigned, Seq(col("cluster")),
        col("vec_id"), perStratum = 10)
      .select(col("vec_id"), col("cluster"), col("sample_rank"))
      .orderBy(col("cluster"), col("sample_rank"))
  }

  /** Sparse retrieval: top-10 corpus documents per query document (the
    * first 5 docs stand in for the query set) via the inverted-index
    * term-match score of [[graft.functions.Tfidf.sparseTopK]]. Integer idf
    * weights keep the scores exact BIGINT sums, so ranking is under the
    * differential oracle, not rows-only.
    */
  def sparseRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // 0.78: the synthetic vocabulary is ~31 terms with df ≈ 0.75-0.8·N, so
    // this keeps the mid-frequency half of the index and visibly drops the
    // hottest terms (a realistic 0.5 stopword cap would empty it here).
    graft.functions.Tfidf.sparseTopK(docs, col("doc_id"), col("text"),
        docs.filter(col("doc_id") < 5), col("doc_id"), col("text"),
        k = 10, maxDfFrac = 0.78)
      .orderBy(col("q"), col("rnk"))
  }

  /** Hybrid retrieval ([[graft.functions.Fusion.reciprocalRankFusion]]):
    * the same 5 query documents ranked by BOTH the integer-BM25 inverted
    * index (q90's ranker) and brute-force embedding cosine (q30's ranker,
    * ids aligned doc_id = vec_id), merged by reciprocal-rank fusion with
    * integer 1e6 DIV (60+rank) weights. Only the two top-10 rank lists —
    * never text or vectors — cross the fusion boundary.
    */
  def hybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    val sparse = graft.functions.Tfidf.sparseTopK(docs, col("doc_id"),
        col("text"), docs.filter(col("doc_id") < 5), col("doc_id"),
        col("text"), k = 10, maxDfFrac = 0.78)
      .select(col("q").as("query"), col("d").as("item"), col("rnk").as("rank"))
    val dense = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id").as("query"), col("corpus_id").as("item"),
        col("rank"))
    graft.functions.Fusion.reciprocalRankFusion(
        Seq(sparse, dense), "query", "item", "rank", k = 10)
      .orderBy(col("query"), col("rnk"))
  }

  /** Crawl-frontier host authority ([[graft.functions.Graph.pageRankInt]]):
    * a host-level link graph derived deterministically from doc ids (the
    * q94 pattern — site `d mod 10` links to site `(d div 10) mod 10`,
    * weight = link count), ranked by 8 rounds of ALL-INTEGER weighted
    * PageRank at scale 1e9 / damping 0.85. Exact BIGINT fixed-point, so
    * the full iterative computation sits under the differential oracle
    * (unrolled to 8 chained CTEs in DuckDB).
    */
  def hostAuthority(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "documents")
      .select(expr("doc_id % 10").as("src"),
        expr("(doc_id DIV 10) % 10").as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    graft.functions.Graph.pageRankInt(edges, col("src"), col("dst"),
        col("w"), iterations = 8,
        checkpointDir = spark.conf.getOption("spark.graft.checkpoint.dir"))
      .select(col("host"), col("rank").as("authority"))
      .orderBy(col("authority").desc, col("host"))
  }

  /** DSIR-style importance selection
    * ([[graft.functions.Importance.importanceScores]]): src0 documents
    * define the target domain; every other document is scored by its
    * hashed-unigram bucket ratio sum (integer-exact), length-normalized,
    * and the top 100 candidates are selected. The global top-k runs as
    * sort+limit (TakeOrderedAndProject), never a corpus-wide
    * single-partition window; ranks are assigned on the 100 survivors.
    */
  def importanceSelection(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.functions.Importance.importanceScores(
      t(spark, dir, "documents"), col("doc_id"), col("text"),
      col("source") === "src0")
    scored.orderBy(col("imp_per_tok").desc, col("id")).limit(100)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("imp_per_tok").desc, col("id"))))
      .select(col("id").as("doc_id"), col("n_toks"), col("imp_per_tok"),
        col("rnk"))
      .orderBy(col("rnk"))
  }

  /** The spam phrase appended to every 5th document (`doc_id % 5 = 2`)
    * for the q103/q107 classifier queries — the planted ground truth the
    * model must learn, shared verbatim with the DuckDB oracle (the q98
    * planting discipline). The words are disjoint from the synthetic
    * corpus vocabulary, so the signal is real but the base text stays.
    */
  private val SpamMarker =
    "click here to win your free prize unsubscribe now limited offer exclusive deal"

  /** (doc_id, is_spam, score, pred) for every held-out document under
    * the q103 classifier — shared by q103 (per-doc surface) and q107
    * (calibration table). One in five documents carries [[SpamMarker]];
    * the model trains on the 30% md5 split and must recover the planted
    * label on the held-out 70%.
    */
  private def classifierScored(spark: SparkSession, dir: String): DataFrame = {
    val planted = col("doc_id") % 5 === 2
    val docs = t(spark, dir, "documents")
      .withColumn("text",
        when(planted, concat(col("text"), lit(s" $SpamMarker")))
          .otherwise(col("text")))
      .withColumn("is_spam", planted.cast("int"))
    val isTrain = Sampling.hashBucket(col("doc_id"), 100) < 30
    val model = graft.functions.Classifier.hashedLinearModel(
      docs.filter(isTrain), col("doc_id"), col("text"), col("is_spam") === 1)
    val held = docs.filter(!isTrain)
    graft.functions.Classifier.scoreDocs(held, col("doc_id"), col("text"), model)
      .join(held.select(col("doc_id").as("id"), col("is_spam")), "id")
      .select(col("id").as("doc_id"), col("is_spam"), col("score"),
        col("pred").cast("int").as("pred"))
  }

  /** Hashed bag-of-words spam classifier ([[graft.functions.Classifier]]):
    * the fastText-style model-based filter step of a pretraining
    * pipeline, end to end — class-rate token weights trained on the 30%
    * md5 split, top-256 feature cut, held-out docs scored by
    * broadcast-joined weighted bag-of-words sum. All-BIGINT train AND
    * inference, so the whole learn-then-filter pipeline replays exactly
    * in DuckDB.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    classifierScored(spark, dir).orderBy(col("doc_id"))

  /** Classifier calibration table ([[graft.functions.Sampling
    * .quantileBins]] over the q103 scores): held-out documents cut into
    * 10 exact score deciles, each reporting its spam-label count — the
    * reliability check run on every production quality filter (the
    * planted positives must concentrate in the top deciles). Binning is
    * the two-phase histogram form: windows run over distinct score
    * values, never the held-out corpus.
    */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame =
    // quantileBins reads its input from several branches (summary, join,
    // whole/straddling) — materialize the narrow scored frame once or the
    // whole train-and-score pipeline runs per branch.
    Sampling.quantileBins(
        stageBoundary(spark, classifierScored(spark, dir).drop("pred")),
        lit("all"), col("score"), col("doc_id"), n = 10)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_spam")).cast("long").as("n_pos"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("bin"))

  /** Weighted document sample ([[graft.functions.Sampling
    * .sequentialPoissonSample]]): 50 documents per language drawn with
    * probability proportional to length — sequential Poisson sampling
    * with the portable md5 hash as the uniform, priority `h / n_chars`
    * one exact-rounded IEEE division, so DuckDB orders identically.
    * Two-phase per-shard top-k: no stratum-only window over the corpus.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.sequentialPoissonSample(
        t(spark, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        col("lang"), col("doc_id"), col("n_chars"), k = 50)
      .orderBy(col("lang"), col("samp_rank"))

  /** Mixture epoch plan ([[graft.functions.Sampling.epochPlan]]): per
    * source, the repeat factor realizing a 1M-token budget under
    * sqrt-temperature weights — exact BIGINT ceil/floor rationals. One
    * corpus pass; normalization runs over the sources-sized summary.
    */
  def epochPlanQuery(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochPlan(
        t(spark, dir, "documents").select(col("source"), col("text")),
        col("source"), Text.tokenCount(col("text")), budget = 1000000L)
      .orderBy(col("stratum"))

  /** Per-epoch training order ([[graft.functions.Sampling.epochShuffle]]):
    * every document's exact global position in 2 differently-shuffled
    * epochs — epoch-seeded md5 order, positions assembled from monotone
    * shard partials, never a corpus-wide sort.
    */
  def epochShuffleQuery(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochShuffle(
        t(spark, dir, "documents").select(col("doc_id")),
        col("doc_id"), epochs = 2)
      .select(col("doc_id"), col("epoch"), col("pos"))
      .orderBy(col("epoch"), col("pos"))

  /** Dataset release diff ([[graft.dq.Checks.releaseDiff]]): per source,
    * the added / removed / changed / unchanged counts between two
    * synthesized corpus snapshots (the q83 snapshot-arithmetic
    * discipline: every 13th doc is new, every 19th was dropped, every
    * 11th was revised) — the delta table of a dataset release note. Only
    * (id, source, md5 fingerprint) ride the full-outer join.
    */
  def releaseDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val prev = docs.filter(col("doc_id") % 13 =!= 5)
    val cur = docs.filter(col("doc_id") % 19 =!= 6)
      .withColumn("text",
        when(col("doc_id") % 11 === 3, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    graft.dq.Checks.releaseDiff(prev, cur, col("doc_id"),
        Text.fingerprint(col("text")), col("source"))
      .orderBy(col("grp"))
  }

  /** Decontamination sweep ([[graft.functions.Dedup.contamination]] at
    * two shingle sizes): the overlap-vs-n-gram-size table a dataset card
    * publishes — short grams over-flag (any shared phrase), long grams
    * under-flag (only real copies); the sweep quantifies both ends on
    * the same train/test split. Per gram size: contaminated test docs,
    * total (test, train) contaminated pairs, total shared grams.
    */
  def contaminationSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bkt = Sampling.hashBucket(col("doc_id"), 100)
    val train = docs.filter(bkt < 80)
    val test = docs.filter(bkt >= 90)
    Seq(3, 8).map { k =>
      Dedup.contamination(train, col("doc_id"), col("text"),
          test, col("doc_id"), col("text"), k = k,
          metricName = s"graft.contamination_k$k")
        .agg(count(lit(1)).as("n_test_contaminated"),
          coalesce(sum(col("n_train_docs")), lit(0L)).as("total_pairs"),
          coalesce(sum(col("n_shared_grams")), lit(0L)).as("total_shared_grams"))
        .withColumn("gram_k", lit(k))
    }.reduce(_ unionByName _)
      .select(col("gram_k"), col("n_test_contaminated"), col("total_pairs"),
        col("total_shared_grams"))
      .orderBy(col("gram_k"))
  }

  /** Per-source quality-drift monitor ([[graft.functions.Sampling
    * .exactQuantiles]] over (source, batch)): compare each source's exact
    * median/p90 length between the old and new halves of the corpus and
    * flag a >20% median shift — the distribution-shift alarm a continuous
    * ingestion pipeline runs per source per day. One source (src7) gets a
    * planted +200-char inflation in its new batch, so exactly one alarm
    * fires. All rank-math and the drift test are exact integers; the
    * quantile windows run over the (source, batch, value) histogram,
    * never the corpus.
    */
  def driftMonitor(spark: SparkSession, dir: String): DataFrame = {
    // batch by doc_id BLOCK, not parity: source is doc_id mod 20, so a
    // parity split would correlate perfectly with the strata. Stratify by
    // LANGUAGE (hundreds of docs per cell), not source (tens) — exact
    // medians of tiny cells are noisy enough to trip any sane threshold,
    // which is a property of the data, not the monitor.
    val newBatch = expr("(doc_id DIV 20) % 2") === 1
    val d = t(spark, dir, "documents")
      .withColumn("batch", when(newBatch, "new").otherwise("old"))
      .withColumn("m",
        col("n_chars") + when(col("lang") === "de" && newBatch, 200L)
          .otherwise(0L))
    val q = Sampling.exactQuantiles(
      d.select(col("lang"), col("batch"), col("m")),
      Seq("lang", "batch"), col("m"), Seq(0.5, 0.9))
    def side(b: String, c: String) = max(when(col("batch") === b, col(c)))
    q.groupBy(col("lang"))
      .agg(side("old", "p50").as("median_old"),
        side("new", "p50").as("median_new"),
        side("old", "p90").as("p90_old"),
        side("new", "p90").as("p90_new"))
      .withColumn("drift",
        (abs(col("median_new") - col("median_old")) * 10L >
          col("median_old") * 2L).cast("int"))
      .orderBy(col("lang"))
  }

  /** Tokenizer fertility per language: subword pieces emitted per
    * whitespace word ([[Text.subwordCount]] / [[Text.tokenCount]]),
    * integer-scaled ×1e6 — the standard multilingual tokenizer-equity
    * metric (a high-fertility language pays more sequence length per
    * word, so mixtures and budgets must correct for it). Scan-local
    * projections into a low-cardinality groupBy with map-side partials.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"),
        Text.tokenCount(col("text")).cast("long").as("toks"),
        Text.subwordCount(col("text")).cast("long").as("subs"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("total_tokens"),
        sum(col("subs")).as("total_subwords"))
      .withColumn("fertility_ppm",
        expr("(total_subwords * 1000000L) DIV total_tokens"))
      .orderBy(col("lang"))

  /** Context-length truncation-loss curve: for each candidate max sequence
    * length, the tokens kept vs lost if every document is truncated there —
    * the table a team reads to pick a training context length. Scale shape:
    * per-doc token counts collapse to one long AT THE SCAN (text never
    * shuffles); the 4× explode fans out 8-byte rows into a 4-group rollup.
    */
  def truncationLoss(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      .select(col("n_tokens"),
        explode(array(lit(64L), lit(128L), lit(192L), lit(256L))).as("max_len"))
      .groupBy(col("max_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") > col("max_len"), 1L).otherwise(0L)).as("n_truncated"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(least(col("n_tokens"), col("max_len"))).as("tokens_kept"))
      .withColumn("kept_ppm", expr("tokens_kept * 1000000L DIV tokens_total"))
      .orderBy(col("max_len"))

  /** Exact-dedup survivorship audit: per (lang, source), how many documents
    * (and characters) exact dedup would REMOVE under the q23 policy (one
    * keeper per normalized-text fingerprint, ties to min doc_id) — the
    * "what did dedup delete, and from where" table every data card needs
    * before the removal is applied. Scale shape: only (fp, doc_id, lang,
    * source, n_chars) shuffles — fingerprints, never text — and the keeper
    * window partitions by fp (cardinality ≈ corpus), so parallelism is full.
    */
  def dedupSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(Text.normalized(col("text"))).as("fp"))
    val w = Window.partitionBy(col("fp"))
    d.withColumn("keep_id", min(col("doc_id")).over(w))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("doc_id") =!= col("keep_id"), col("n_chars"))
          .otherwise(lit(0L))).as("chars_removed"))
      .withColumn("removed_ppm", expr("n_removed * 1000000L DIV n_docs"))
      .orderBy(col("lang"), col("source"))
  }

  /** Cross-split doc-level near-dup contamination: MinHash/LSH candidate
    * pairs that CROSS the train (bucket < 80) / eval (bucket ≥ 90) hash
    * split, verified with exact word-3-gram Jaccard and reported per eval
    * doc with its closest train match — the doc-granularity
    * benchmark-overlap report (q63 is the shared-n-gram containment twin;
    * this answers "which eval docs are near-copies of a train doc").
    * Scale shape: candidates come from the capped LSH band buckets (never
    * a cross join); exact Jaccard runs only on the candidate set; shingle
    * sets join in by id so the corpus is scanned, not re-shuffled.
    */
  def crossSplitNearDup(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .filter(size(Text.shingles(col("text"), 3)) > 0)
    val cands = Dedup.minHashCandidates(d, col("doc_id"), col("text"),
      shingleK = 3, bands = 2, rowsPerBand = 2)
    def bkt(c: Column): Column = Sampling.hashBucket(c, 100)
    val cross = cands
      .filter((bkt(col("id_a")) < 80 && bkt(col("id_b")) >= 90) ||
        (bkt(col("id_a")) >= 90 && bkt(col("id_b")) < 80))
      .select(
        when(bkt(col("id_a")) < 80, col("id_a")).otherwise(col("id_b")).as("train_id"),
        when(bkt(col("id_a")) < 80, col("id_b")).otherwise(col("id_a")).as("eval_id"))
    val sh = d.select(col("doc_id"),
      array_distinct(Text.shingles(col("text"), 3)).as("sh"))
    val scored = cross
      .join(sh.select(col("doc_id").as("train_id"), col("sh").as("sh_t")), "train_id")
      .join(sh.select(col("doc_id").as("eval_id"), col("sh").as("sh_e")), "eval_id")
      .withColumn("inter", size(array_intersect(col("sh_e"), col("sh_t"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_e")) + size(col("sh_t")) - col("inter")).cast("double"))
      // shingle sets are consumed — drop them so the per-eval rank
      // exchange moves only (ids, jaccard), not text-derived arrays
      .drop("sh_e", "sh_t", "inter")
    val byEval = Window.partitionBy(col("eval_id"))
    scored
      .withColumn("rn", row_number().over(
        byEval.orderBy(col("jaccard").desc, col("train_id"))))
      .withColumn("n_train_matches", count(lit(1)).over(byEval))
      .filter(col("rn") === 1)
      .select(col("eval_id"), col("n_train_matches"),
        col("train_id").as("best_train_id"), col("jaccard").as("best_jaccard"))
      .orderBy(col("eval_id"))
  }

  /** Ordered conversion funnel over the event stream: users who signed up,
    * then clicked AFTER their first signup, then purchased AFTER that first
    * click — each stage gated on the previous stage's first-completion
    * time, not mere event co-occurrence. Scale shape: type filters push to
    * the scan; every stage is a user_id-keyed aggregate joined to the
    * (already user-unique, strictly shrinking) previous stage — three
    * co-partitionable shuffles, no windows over the raw stream.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, step: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step.toLong).as("step"), lit(name).as("stage"), col("n_users"))
    stage(s1, 1, "signup")
      .unionByName(stage(s2, 2, "signup>click"))
      .unionByName(stage(s3, 3, "signup>click>purchase"))
      .orderBy(col("step"))
  }

  /** Retention cohort matrix: users grouped by first-active day, counted on
    * each later active day as an offset from their cohort — the
    * engagement-decay table behind every retention curve. Scale shape: the
    * stream pre-aggregates to distinct (user, day) AT THE SCAN's first
    * shuffle (the raw events never reach the join), then one user-keyed
    * join against the per-user first-day aggregate and a low-card rollup.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Exact per-group top-k without a group-only rank window
    * ([[graft.ops.Relational.groupTopK]]): the 5 longest documents per
    * language. A `row_number over (partition by lang)` would funnel the
    * corpus into ~5 reducers at 100 TB; the two-phase rewrite ranks within
    * (lang, hash shard) first and re-ranks only the ≤ shards×k survivors —
    * exact for any order, since a group's global top-k is contained in the
    * union of its per-shard top-ks.
    */
  def groupTopKDocs(spark: SparkSession, dir: String): DataFrame =
    Relational.groupTopK(
        t(spark, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        Seq(col("lang")), Seq(col("n_chars").desc, col("doc_id")),
        col("doc_id"), k = 5)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rank"))

  /** Incremental maintenance of the q116 retention matrix: the nightly-job
    * form that merges a NEW day partition into yesterday's per-user state
    * instead of recomputing history. The split point is an in-plan scalar
    * (min day + 20, broadcast like q88's cut — no driver-side .head()).
    * Old-side state is exactly what a real job persists: per-user first
    * day + distinct (user, day) actives. The merge is
    * min-of-mins for first days plus a union of actives — and the result
    * must be INDISTINGUISHABLE from the full q116 recompute, which is
    * what the oracle (the same full-recompute SQL) and the parity spec
    * assert. At 100 TB the old side reads from the incremental store; only
    * the new partition is scanned fresh.
    */
  def incrementalRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val cut = e.agg((min(col("day")) + lit(20L)).as("__cut"))
    val withCut = e.crossJoin(broadcast(cut))
    val old = withCut.filter(col("day") < col("__cut")).drop("__cut")
    val fresh = withCut.filter(col("day") >= col("__cut")).drop("__cut")
    // the persisted incremental state: per-user first day over OLD runs only
    val firstOld = old.groupBy(col("user_id")).agg(min(col("day")).as("f"))
    val firstNew = fresh.groupBy(col("user_id")).agg(min(col("day")).as("f"))
    val first = firstOld.unionByName(firstNew)
      .groupBy(col("user_id")).agg(min(col("f")).as("cohort_day"))
    old.unionByName(fresh)
      .join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Packed-sequence layout: q57 assigns documents to packing bins; this
    * materializes each bin's internal layout — every document's position
    * and starting character offset inside its packed sequence, the
    * attention-boundary table a training shard writer needs next to the
    * packed bytes. Scale shape: the offset window partitions by
    * (shard, pack_bin) — cardinality ≈ corpus/budget, full parallelism —
    * and only (ids, n_chars) ever shuffle.
    */
  def packedLayout(spark: SparkSession, dir: String): DataFrame = {
    val p = Sampling.packByBudget(
      t(spark, dir, "documents").select(col("doc_id"), col("n_chars")),
      col("doc_id"), col("n_chars"), budget = 4000L, shards = 8)
    val w = Window.partitionBy(col("shard"), col("pack_bin")).orderBy(col("doc_id"))
    p.withColumn("seq_pos", row_number().over(w).cast("long"))
      .withColumn("start_offset", sum(col("n_chars")).over(w) - col("n_chars"))
      .select(col("shard"), col("pack_bin"), col("doc_id"),
        col("seq_pos"), col("start_offset"))
      .orderBy(col("shard"), col("pack_bin"), col("seq_pos"))
  }

  /** Mergeable-sketch rollup (rows-only: HLL estimates are
    * engine-specific): per-day HLL sketches of active users, UNIONED into
    * per-week distinct estimates without rescanning the stream — the
    * pre-aggregated sketch-table pattern that answers "distinct users any
    * window" at 100 TB from kilobytes of state per day instead of a
    * countDistinct over raw events. The exact twin is spec-checked to
    * within HLL error; q116/q118 are the exact-arithmetic day rollups.
    */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val daily = e.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy((col("day") - pmod(col("day"), lit(7L))).as("week_start"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct_users"))
      .orderBy(col("week_start"))
  }

  /** Conversion-latency distribution per funnel transition: median and p90
    * nanoseconds from first signup to first qualifying click, and from
    * that click to first qualifying purchase — the "how long does
    * conversion take" companion to q115's "how many convert". Same
    * shrinking user-keyed aggregates; the exact percentile runs over one
    * latency long per converted user.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") >= col("t1"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") >= col("t2"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t3"), min(col("t2")).as("t2"))
    def lat(df: DataFrame, from: String, to: String, name: String): DataFrame =
      df.select((col(to) - col(from)).as("lat"))
        .agg(count(lit(1)).as("n_users"),
          expr("percentile(lat, 0.5)").as("median_latency_ns"),
          expr("percentile(lat, 0.9)").as("p90_latency_ns"))
        .select(lit(name).as("stage"), col("n_users"),
          col("median_latency_ns"), col("p90_latency_ns"))
    lat(s2, "t1", "t2", "signup>click")
      .unionByName(lat(s3, "t2", "t3", "click>purchase"))
      .orderBy(col("stage"))
  }

  /** kNN label propagation — the semi-supervised labeling step of a
    * quality-classifier bootstrap: each held-out vector takes the majority
    * label of its k nearest labeled neighbors (exact cosine). First use of
    * the embeddings table's `label` column as a *training signal* rather
    * than an evaluation facet (q75 measures clustering against it; here it
    * propagates). Scale shape is q30's: the labeled corpus streams ONCE
    * through a broadcast-nested-loop scan (held-out side broadcast, norms
    * computed per row not per pair), and everything downstream of the
    * per-query top-k window is q×k rows — votes, the winner window, and
    * both label joins are broadcast-sized at any corpus scale. Ties break
    * deterministically: vote count desc, then min label.
    */
  def knnLabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val held = e.filter(col("vec_id") < 50)
    val labeled = e.filter(col("vec_id") >= 50)
    val nb = Similarity.bruteForceTopK(labeled, col("vec_id"), col("embedding"),
      held, col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("corpus_id"))
    val votes = labeled.select(col("vec_id").as("corpus_id"), col("label"))
      .join(broadcast(nb), "corpus_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n").desc, col("label").asc)
    val pred = votes.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("query_id"), col("label").as("predicted_label"))
    pred
      .join(broadcast(held.select(col("vec_id").as("query_id"),
        col("label").as("true_label"))), "query_id")
      .select(col("query_id"),
        col("predicted_label").cast("int").as("predicted_label"),
        col("true_label").cast("int").as("true_label"),
        when(col("predicted_label") === col("true_label"), 1).otherwise(0)
          .cast("int").as("correct"))
      .orderBy(col("query_id"))
  }

  /** N-gram diversity data card: per (lang, source) the type/token table
    * over word 3-grams — total grams, per-doc-distinct gram total,
    * corpus-distinct grams, and the distinct/total ratio in exact ppm.
    * The inter-document repetition twin of q64 (which is intra-document):
    * a shrinking corpus-level type/token ratio is template spam shared
    * ACROSS documents — the signal domain caps (q98) and near-dup removal
    * (q27/q60) act on, quantified per corpus slice for the data card.
    * Scale shape: grams leave the scan as md5 hashes projected next to two
    * facet columns — text never shuffles — and the exact distinct count is
    * a (lang, source, hash) pre-aggregate (map-side combine collapses
    * within-partition repeats) before the count; the two facet-level
    * aggregates join at 100-row cardinality.
    */
  def ngramDiversity(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("lang"), col("source"),
        array_distinct(Text.shingles(col("text"), 3)).as("dsh"),
        size(Text.shingles(col("text"), 3)).cast("long").as("n_grams"))
    val tot = d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("total_grams"),
        sum(size(col("dsh")).cast("long")).as("doc_distinct_grams"))
    val dist = d.select(col("lang"), col("source"),
        explode(col("dsh")).as("g"))
      .select(col("lang"), col("source"), md5(col("g")).as("h"))
      .groupBy(col("lang"), col("source"))
      .agg(countDistinct(col("h")).as("distinct_grams"))
    tot.join(dist, Seq("lang", "source"))
      .select(col("lang"), col("source"), col("n_docs"), col("total_grams"),
        col("distinct_grams"), col("doc_distinct_grams"),
        when(col("total_grams") > 0,
          expr("(distinct_grams * 1000000L) DIV total_grams"))
          .otherwise(lit(0L)).cast("long").as("ttr_ppm"))
      .orderBy(col("lang"), col("source"))
  }

  /** Duplicate-multiplicity histogram: how many fingerprint groups appear
    * exactly k times (k capped at 5+), and how many languages each group
    * spans — the "docs seen N times" table of a dedup report, with the
    * cross-language facet surfacing machine-translated or spam duplicates
    * that per-language dedup would miss. The answer to "how much does
    * multiplicity-weighted dedup actually save" before running it (q113
    * reports the per-slice outcome; this is the shape of the problem).
    * Scale: only (16-byte fp, lang, n_chars) shuffles; the second rollup
    * is over group-cardinality rows and lands at ≤ 5×|langs| cells.
    */
  def dupMultiplicity(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(
      md5(Text.normalized(col("text"))).as("fp"), col("lang"), col("n_chars"))
    val g = d.groupBy(col("fp"))
      .agg(count(lit(1)).as("m"), countDistinct(col("lang")).as("nl"),
        sum(col("n_chars")).as("chars"))
    g.select(least(col("m"), lit(5L)).as("multiplicity"), col("nl").as("n_langs"),
        col("m"), col("chars"))
      .groupBy(col("multiplicity"), col("n_langs"))
      .agg(count(lit(1)).as("n_groups"), sum(col("m")).as("n_docs"),
        sum(col("chars")).as("total_chars"))
      .orderBy(col("multiplicity"), col("n_langs"))
  }

  /** MinHash/LSH S-curve audit: for each exact-Jaccard bucket (5% wide),
    * what fraction of overlapping pairs did the banded signature scheme
    * (q28's bands=2 × rows=2) actually surface? This is the measured
    * capture curve behind every minhash parameter choice: near-zero
    * buckets SHOULD sit at ~0 ppm (banding correctly ignores incidental
    * shared grams) and the near-dup buckets at ~10⁶ ppm — a flat curve
    * means the band/row trade-off is mis-sized for the dedup threshold.
    * Ground truth is the q54 discipline — exact set math only within
    * (lang, source) blocks; at 100 TB the audit runs on a hash-sample of
    * blocks BY DESIGN (exact all-pairs is what LSH exists to avoid), and
    * candidates come from the capped band buckets over the same universe.
    * Buckets are exact integer math ((inter*20) DIV union), so boundaries
    * cannot drift between engines; the truth-candidate join moves only id
    * pairs.
    */
  def lshRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .filter(size(Text.shingles(col("text"), 3)) > 0)
    // sorted + deduped ONCE per document; the per-pair work inside the
    // blocked join is then a single allocation-free merge scan returning
    // the exact integer intersection (the q54 lesson, integer-typed)
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      array_sort(array_distinct(Text.shingles(col("text"), 3))).as("sh"))
    val a = base.select(col("doc_id").as("id_a"), col("lang"), col("source"),
      col("sh").as("sh_a"))
    val b = base.select(col("doc_id").as("id_b"), col("lang"), col("source"),
      col("sh").as("sh_b"))
    val truth = a.join(b, Seq("lang", "source"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", graft.plans.TextExpressions
        .sorted_set_intersect_size(col("sh_a"), col("sh_b")).cast("long"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("inter"))
      .filter(col("inter") > 0L)
      .select(col("id_a"), col("id_b"), expr("(inter * 20) DIV uni").as("bucket"))
    val cands = Dedup.minHashCandidates(docs, col("doc_id"), col("text"),
        shingleK = 3, bands = 2, rowsPerBand = 2)
      .withColumn("caught", lit(1L))
    truth.join(cands, Seq("id_a", "id_b"), "left")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true_pairs"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
      .withColumn("caught_ppm", expr("(n_caught * 1000000L) DIV n_true_pairs"))
      .orderBy(col("bucket"))
  }

  /** IVF recall curve: recall@10 of the q53 index per probe budget
    * (nprobe ∈ 1,2,4,8) against the exact brute-force truth — the
    * embedding-space twin of q123's minhash S-curve, and the table that
    * picks q53's operating point. One corpus assignment pass serves all
    * four settings (candidates carry their probe rank; a 4-row settings
    * frame joins on `qr <= nprobe`); ground truth is one brute pass over
    * a bounded query sample — the calibration cost paid once.
    */
  def annRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfRecallCurve(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 20), col("vec_id"), col("embedding"),
        k = 10, nCentroids = 32, probeSettings = Seq(1, 2, 4, 8))
      .select(col("nprobe").cast("int").as("nprobe"), col("n_queries"),
        col("n_retrieved"), col("n_hits"), col("n_truth"), col("recall_ppm"))
  }

  /** Near-dup burden per quality decile: are near-duplicates concentrated
    * in low-quality strata? Composes q60's duplicate clusters (members
    * that are not their cluster's min-id representative count as burden)
    * with q84's exact per-language deciles — the table that says whether
    * quality filtering alone would have removed the duplicates anyway, or
    * dedup earns its keep across the whole quality range. Scale: the
    * cluster labels are id-pairs only, the decile assignment is the
    * two-phase histogram (no corpus-wide window), and the final join is
    * id-keyed.
    */
  def dupByQuality(spark: SparkSession, dir: String): DataFrame = {
    val binned = Sampling.quantileBins(
      t(spark, dir, "documents").select(col("lang"), col("n_chars"), col("doc_id")),
      col("lang"), col("n_chars"), col("doc_id"), n = 10)
    val cc = Dedup.connectedComponents(minhashPairs(spark, dir),
      checkpointDir = spark.conf.getOption("spark.graft.checkpoint.dir"))
    val dups = cc.filter(col("id") =!= col("cluster"))
      .select(col("id").as("doc_id"), lit(1L).as("is_dup"))
    binned.join(dups, Seq("doc_id"), "left")
      .groupBy(col("lang"), col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_neardups"))
      .withColumn("neardup_ppm", expr("(n_neardups * 1000000L) DIV n_docs"))
      .orderBy(col("lang"), col("bin"))
  }

  /** Zipf vocabulary table: the 20 most frequent tokens per language with
    * exact occurrence counts — the vocabulary audit behind stopword lists,
    * quality-signal calibration (q26 stopword ratios) and tokenizer-equity
    * checks (q111). The per-language top-k routes through
    * [[graft.ops.Relational.nativeTopK]]: under a [[graft.GraftExtensions]]
    * session the cut is the native per-key bounded-heap operator
    * ([[graft.plans.TopKPlan]], partial/final heaps — at most
    * mapPartitions × langs × 20 survivors cross the exchange); a plain
    * session falls back to [[graft.ops.Relational.groupTopK]]'s exact
    * two-phase window. Either way the ~5-value language partition never
    * funnels the full token-count table through one reducer, and the rank
    * column is re-derived by a window over the ≤ langs×20 survivors —
    * a bounded frame in both paths.
    */
  def zipfTable(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "documents")
      .select(col("lang"), explode(Text.tokens(Text.normalized(col("text")))).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
    Relational.nativeTopK(counts, keys = Seq("lang"),
        order = Seq(("n_occurrences", false), ("token", true)), k = 20)
      .withColumn("rank", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("n_occurrences").desc, col("token"))).cast("long"))
      .select(col("lang"), col("rank"), col("token"), col("n_occurrences"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Filter-ablation grid: the JOINT distribution of the five Gopher gates
    * — every observed pass/fail combination with doc and char mass plus
    * corpus share. q76 reports each gate's marginal pass count; this table
    * is the overlap structure those marginals hide: which gates fire
    * together, what each uniquely removes, and whether a gate is subsumed
    * (its fail cells all co-fail with another's) — the evidence for
    * dropping or reordering gates in the curation funnel (q85). Pure
    * projection into a ≤32-cell rollup; the corpus total rides in-plan as
    * a broadcast scalar (q88's pattern, no driver-side collect).
    */
  def filterAblation(spark: SparkSession, dir: String): DataFrame = {
    val flags = Text.gopherFlags(col("text"))
    val d = t(spark, dir, "documents")
      .select(col("n_chars") +: flags.map { case (n, c) => c.cast("int").as(n) }: _*)
    val flagCols = flags.map { case (n, _) => col(n) }
    val total = d.agg(count(lit(1)).as("__total"))
    d.groupBy(flagCols: _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(n_docs * 1000000L) DIV __total"))
      .drop("__total")
      .orderBy(flagCols: _*)
  }

  /** Packing-efficiency histogram: the distribution of bin fill ratios
    * under q119's layout (budget 4000 chars, 8 hash shards) — the padding
    * waste a shard writer reports before training commits to a sequence
    * length. Bins land in 10%-wide fill buckets (a bin can exceed 10⁶ ppm:
    * the document that crosses the budget boundary stays in its bin, which
    * is exactly what the histogram must surface); each shard's final,
    * typically underfull bin is the long tail on the left. Rollup over
    * bin-cardinality rows; the corpus itself never re-shuffles beyond
    * q119's (shard)-keyed pass.
    */
  def packFillHistogram(spark: SparkSession, dir: String): DataFrame = {
    val p = Sampling.packByBudget(
      t(spark, dir, "documents").select(col("doc_id"), col("n_chars")),
      col("doc_id"), col("n_chars"), budget = 4000L, shards = 8)
    val bins = p.groupBy(col("shard"), col("pack_bin"))
      .agg(sum(col("n_chars")).as("bin_chars"), count(lit(1)).as("n_docs"))
    bins
      .withColumn("fill_bucket",
        least(expr("(bin_chars * 10) DIV 4000"), lit(12L)))
      .groupBy(col("fill_bucket"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        min(col("bin_chars")).as("min_chars"), max(col("bin_chars")).as("max_chars"))
      .orderBy(col("fill_bucket"))
  }

  /** Heavy-hitter skew diagnostic: the top-20 hottest event keys with
    * their corpus share — the pre-check that decides whether a key needs
    * q49/q62's salting before a groupBy/join ships to the cluster. Plans
    * as a two-phase count into `TakeOrderedAndProject` (per-partition
    * top-N + tiny merge — no global sort of the key histogram), with the
    * stream total riding in-plan as a broadcast scalar. Deterministic
    * under ties ([[graft.ops.Skew.heavyHitters]] breaks on the key).
    */
  def heavyHitterAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").select(col("user_id"))
    val total = e.agg(count(lit(1)).as("__total"))
    graft.ops.Skew.heavyHitters(e, col("user_id"), topN = 20)
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(n * 1000000L) DIV __total"))
      .drop("__total")
      .orderBy(col("n").desc, col("user_id"))
  }

  /** Cross-source duplication matrix: q28's near-dup candidate pairs
    * rolled up by the (unordered) source pair of their endpoints — the
    * provenance table that says which feeds copy which (mirrors, syndication,
    * scraper loops) and whether duplication is mostly intra-source (a feed
    * re-crawling itself) or cross-source. Only id pairs join back to the
    * two source labels; the matrix is ≤ |sources|² cells.
    */
  def crossSourceDups(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(spark, dir)
    val src = t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val labeled = pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"))
    labeled.groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("intra_source",
        when(col("source_lo") === col("source_hi"), 1).otherwise(0).cast("int"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  /** Signal-covariance audit: per language, the EXACT scaled covariance
    * between document length and the overall Gopher pass verdict,
    * cov_scaled = n·Σ(x·y) − Σx·Σy with x = n_chars and y = pass∈{0,1} —
    * the number whose sign says whether the quality gate is just a length
    * gate in disguise (strongly positive = longer docs pass; near zero =
    * the gate carries independent signal). All integer arithmetic: the
    * three sums are exact per-language aggregates and the final products
    * run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so no float ever
    * appears — at extreme corpus sizes the decimal lane is also what keeps
    * n·Σxy from overflowing 64 bits. One scan, one 5-row rollup.
    */
  def signalCovariance(spark: SparkSession, dir: String): DataFrame = {
    val flags = Text.gopherFlags(col("text"))
    val pass = flags.map(_._2).reduce(_ * _)
    val d = t(spark, dir, "documents")
      .select(col("lang"), col("n_chars"), pass.as("y"))
    val agg = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(col("y")).as("n_pass"),
        sum(col("n_chars") * col("y")).as("sum_xy"))
    val dec = DecimalType(38, 0)
    agg.select(col("lang"), col("n_docs"), col("n_pass"),
        (col("n_docs").cast(dec) * col("sum_xy").cast(dec) -
          col("sum_chars").cast(dec) * col("n_pass").cast(dec))
          .cast("long").as("cov_scaled"))
      .orderBy(col("lang"))
  }

  /** Count-Min sketch heavy-hitter estimates, audited against exact
    * counts: the 4×256-cell mergeable sketch every streaming frequency
    * monitor keeps (kilobytes of state for an unbounded key space, only
    * ever OVER-estimating), built in one explode pass and probed for
    * q131's exact top-20 keys. Unlike library sketches, the hash family
    * is seeded md5 — fully deterministic and engine-portable — so the
    * ESTIMATES themselves replay bit-for-bit in the DuckDB oracle (q120's
    * HLL rollup is rows-only for exactly this reason; this sketch isn't).
    * Scale: cells are a 1024-row broadcast; the probe join and the final
    * min-over-rows run on 20×4 rows. over_ppm is the sketch's measured
    * collision error at this width — the number that sizes `width` for a
    * real key cardinality.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val depth = 4
    val width = 256
    def lane(r: Int, key: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"$r|"), key.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(width.toLong))
    def lanes(key: Column): Column = explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), lane(r, key).as("lane"))): _*))
    val e = t(spark, dir, "events").select(col("user_id"))
    val cells = e.select(lanes(col("user_id")).as("c"))
      .groupBy(col("c.r").as("r"), col("c.lane").as("lane"))
      .agg(count(lit(1)).as("cell_n"))
    val probes = graft.ops.Skew.heavyHitters(e, col("user_id"), topN = 20)
      .select(col("user_id"), col("n"), lanes(col("user_id")).as("p"))
      .select(col("user_id"), col("n"), col("p.r").as("r"), col("p.lane").as("lane"))
    probes.join(broadcast(cells), Seq("r", "lane"))
      .groupBy(col("user_id"), col("n"))
      .agg(min(col("cell_n")).as("cms_estimate"))
      .withColumn("over_ppm", expr("((cms_estimate - n) * 1000000L) DIV n"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** Mergeable CMS rollup — the property that makes sketches worth keeping
    * at 100 TB, demonstrated end-to-end: per-DAY 4×256 Count-Min cells are
    * SUMMED into per-week sketches (cell-wise addition IS the Count-Min
    * merge), then probed for the overall top-5 keys and audited against
    * the exact weekly counts. The pre-aggregated-sketch-table pattern of
    * q120, but with the md5 hash family the estimates replay bit-for-bit
    * in the oracle — so "merge then estimate" is hash-verified, not just
    * rows-counted. Day cells are kilobytes; the merge is a second
    * aggregate over sketch-cardinality rows, never the raw stream.
    */
  def cmsWeeklyRollup(spark: SparkSession, dir: String): DataFrame = {
    val depth = 4
    val width = 256
    def lane(r: Int, key: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"$r|"), key.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(width.toLong))
    def lanes(key: Column): Column = explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), lane(r, key).as("lane"))): _*))
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    // per-day sketches (what a real pipeline persists) ...
    val daily = e.select(col("day"), lanes(col("user_id")).as("c"))
      .groupBy(col("day"), col("c.r").as("r"), col("c.lane").as("lane"))
      .agg(count(lit(1)).as("cell_n"))
    // ... merged cell-wise into per-week sketches
    val weekly = daily.groupBy(expr("day div 7").as("week"), col("r"), col("lane"))
      .agg(sum(col("cell_n")).as("cell_n"))
    val top = graft.ops.Skew.heavyHitters(e.select(col("user_id")),
      col("user_id"), topN = 5)
    val exact = e.join(broadcast(top.select(col("user_id"))), "user_id")
      .groupBy(expr("day div 7").as("week"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val probes = exact
      .select(col("week"), col("user_id"), col("n"), lanes(col("user_id")).as("p"))
      .select(col("week"), col("user_id"), col("n"),
        col("p.r").as("r"), col("p.lane").as("lane"))
    probes.join(broadcast(weekly), Seq("week", "r", "lane"))
      .groupBy(col("week"), col("user_id"), col("n"))
      .agg(min(col("cell_n")).as("cms_estimate"))
      .withColumn("over_ppm", expr("((cms_estimate - n) * 1000000L) DIV n"))
      .orderBy(col("week"), col("user_id"))
  }

  /** Hard-negative mining: for each anchor vector, the 5 most-similar
    * vectors carrying a DIFFERENT label — the contrastive-training batch
    * builder (high-similarity, wrong-class examples are what move an
    * embedding model; random negatives are free but useless). Same scan
    * shape as q30: anchors broadcast into one corpus pass, the label
    * inequality filters before the per-anchor top-k window, and everything
    * downstream is anchors×k rows. The cosine ranks replay in the oracle
    * (q30's precedent); ties break on the candidate id.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val c = e.select(col("vec_id").as("negative_id"),
        col("embedding").as("cv"), col("label").as("negative_label"))
      .withColumn("cn", Similarity.norm(col("cv")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("qv"),
        col("label").as("anchor_label"))
      .withColumn("qn", Similarity.norm(col("qv")))
    // label mismatch filters BEFORE the rank window: same-class rows never
    // reach the per-anchor top-k state
    val scored = c.crossJoin(broadcast(q))
      .filter(col("negative_label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"), col("negative_id"),
        col("negative_label"),
        when(col("cn") * col("qn") === 0, lit(0.0))
          .otherwise(Similarity.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
          .as("cosine"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("negative_id").asc)
    scored.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= 5)
      .select(col("anchor_id"), col("anchor_label").cast("int").as("anchor_label"),
        col("neg_rank").cast("long").as("neg_rank"), col("negative_id"),
        col("negative_label").cast("int").as("negative_label"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  /** Language-ID confusion matrix: q25's stopword-vote classifier evaluated
    * against the corpus's true language labels — per (true, predicted)
    * cell with its within-language share. The classifier-eval table every
    * langid gate publishes (which languages leak into which, and how much
    * lands in 'und'); the mixture/budget queries (q70/q93/q97) inherit
    * exactly these error rates when they stratify on PREDICTED language.
    * One scan into a ≤ |langs|×5 matrix; the share window runs over
    * matrix-cardinality rows only.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir, "documents")
      .select(col("lang"), Text.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
    m.withColumn("lang_total",
        sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      .withColumn("row_ppm", expr("(n_docs * 1000000L) DIV lang_total"))
      .drop("lang_total")
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Histogram-sketch quantiles + error audit — the quantile member of the
    * sketch suite (membership = Bloom q81, distinct = HLL q120, frequency
    * = CMS q134/q135): per language, median/p90 estimated from a 256-cell
    * fixed-width histogram (the mergeable kilobyte summary a t-digest
    * plays at 100 TB — cells SUM across partitions and days) next to the
    * exact inverse-ECDF values and the measured error. The estimate is
    * the containing cell's upper bound, so error is bounded by the cell
    * width (15 chars) and ≥ 0 — the number that sizes the histogram for a
    * latency/length SLO. All integer; both rank scans run over ≤256-cell /
    * value-cardinality summaries, never the corpus.
    */
  def histogramQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val width = 16L
    val d = t(spark, dir, "documents").select(col("lang"), col("n_chars"))
    val sketch = d
      .withColumn("bucket", least(expr(s"n_chars DIV $width"), lit(255L)))
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("c"))
    val cum = sketch
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("lang")).orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
    def est(q: Double, name: String) =
      min(when(col("cum") >= ceil(lit(q) * col("n")),
        col("bucket") * lit(width) + lit(width - 1))).as(name)
    val ests = cum.groupBy(col("lang"))
      .agg(est(0.5, "est_p50"), est(0.9, "est_p90"))
    val exact = Sampling.exactQuantiles(d, Seq("lang"), col("n_chars"),
        Seq(0.5, 0.9))
      .withColumnRenamed("p50", "exact_p50").withColumnRenamed("p90", "exact_p90")
    ests.join(exact, Seq("lang"))
      .select(col("lang"), col("est_p50"), col("exact_p50"),
        col("est_p90"), col("exact_p90"),
        expr("((est_p50 - exact_p50) * 1000000L) DIV exact_p50").as("err_p50_ppm"),
        expr("((est_p90 - exact_p90) * 1000000L) DIV exact_p90").as("err_p90_ppm"))
      .orderBy(col("lang"))
  }

  /** Precision–recall sweep of the q103 quality classifier: for every
    * operating threshold, tp/fp/fn and precision/recall/F1 in exact ppm —
    * the table that picks a model-filter's cutoff (keep-rate vs purity)
    * before it gates a corpus. The sweep is built from a 64-cell mergeable
    * score HISTOGRAM (the q138 sketch discipline): the held-out scores
    * collapse to ≤64 (cell, n, n_pos) rows in one map-side-combined
    * aggregate, and the cumulative-from-the-top counts — "predict spam at
    * score ≥ threshold" — run a window over those sketch-cardinality rows
    * only. The corpus never enters a window, and the histogram is
    * per-shard mergeable, so the same table falls out of a 100 TB score
    * set at the same ≤64-row cost past the first aggregate. Thresholds
    * are each cell's minimum OBSERVED score (exact integers, so DuckDB
    * replays the sweep bit-for-bit); all rates are BIGINT ppm.
    */
  def prCurve(spark: SparkSession, dir: String): DataFrame = {
    val cells = 64
    // classifierScored trains and scores; the histogram and its bounds
    // both scan it, so materialize the narrow (score, label) frame once.
    val scored = stageBoundary(spark,
      classifierScored(spark, dir).select(col("score"), col("is_spam")))
    val bounds = scored.agg(min(col("score")).as("__lo"),
      max(col("score")).as("__hi"))
    val hist = scored.crossJoin(broadcast(bounds))
      .withColumn("cell", expr(s"((score - __lo) * $cells) DIV (__hi - __lo + 1)"))
      .groupBy(col("cell"))
      .agg(min(col("score")).as("threshold"), count(lit(1)).as("n"),
        sum(col("is_spam")).cast("long").as("n_pos"))
    val byCellDesc = Window.orderBy(col("cell").desc)
    val cum = hist
      .withColumn("tp", sum(col("n_pos")).over(byCellDesc))
      .withColumn("pp", sum(col("n")).over(byCellDesc))
    val totals = hist.agg(sum(col("n_pos")).as("__p"))
    cum.crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("__p") - col("tp")).as("fn"),
        expr("(tp * 1000000L) DIV pp").as("precision_ppm"),
        expr("(tp * 1000000L) DIV __p").as("recall_ppm"),
        expr("""CASE WHEN tp = 0 THEN 0L ELSE
               |  (2 * ((tp * 1000000L) DIV pp) * ((tp * 1000000L) DIV __p))
               |    DIV (((tp * 1000000L) DIV pp) + ((tp * 1000000L) DIV __p))
               |END""".stripMargin).as("f1_ppm"))
      .orderBy(col("threshold"))
  }

  /** Inter-gate agreement matrix: Cohen's kappa (and raw agreement) for
    * every unordered pair of the five Gopher gates — the chance-corrected
    * redundancy check behind q129's ablation grid. Two gates with high
    * kappa are one signal measured twice (drop one from the funnel); a
    * kappa near zero despite high raw agreement is the base-rate trap
    * (both gates pass almost everything) that raw-overlap tables
    * misread. Exact arithmetic end to end: one corpus pass produces the
    * forty joint counts as a single map-side-combined aggregate row, the
    * ten pair rows explode from that one row (driver never collects),
    * and kappa's products run in DECIMAL(38,0)/HUGEINT (the q133
    * discipline) with an explicit |num| DIV den + sign so Spark's
    * truncating DIV and DuckDB's flooring `//` agree on negative kappas.
    */
  def gateKappa(spark: SparkSession, dir: String): DataFrame = {
    val flags = Text.gopherFlags(col("text"))
    val names = flags.map(_._1)
    val d = t(spark, dir, "documents")
      .select(flags.map { case (n, c) => c.cast("int").as(n) }: _*)
    val pairs = for { i <- names.indices; j <- i + 1 until names.length }
      yield (names(i), names(j))
    val cellAggs = pairs.flatMap { case (a, b) =>
      Seq("00", "01", "10", "11").map { vv =>
        sum(when(col(a) === vv(0).asDigit && col(b) === vv(1).asDigit, 1L)
          .otherwise(0L)).as(s"${a}__${b}__$vv")
      }
    }
    val one = d.agg(cellAggs.head, cellAggs.tail: _*)
    val rows = one.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("gate_a"), lit(b).as("gate_b"),
          col(s"${a}__${b}__00").as("n00"), col(s"${a}__${b}__01").as("n01"),
          col(s"${a}__${b}__10").as("n10"), col(s"${a}__${b}__11").as("n11"))
      }: _*)).as("p"))
      .select(col("p.*"))
    rows
      .withColumn("n", col("n00") + col("n01") + col("n10") + col("n11"))
      .withColumn("agree_ppm", expr("((n00 + n11) * 1000000L) DIV n"))
      .withColumn("__pe", expr(
        """CAST(n11 + n10 AS DECIMAL(38,0)) * CAST(n11 + n01 AS DECIMAL(38,0))
          | + CAST(n00 + n01 AS DECIMAL(38,0)) * CAST(n00 + n10 AS DECIMAL(38,0))
          |""".stripMargin))
      .withColumn("__num", expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(n11 + n00 AS DECIMAL(38,0)) - __pe"))
      .withColumn("__den", expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - __pe"))
      .withColumn("kappa_ppm", expr(
        """CAST(CASE WHEN __den = 0 THEN 0
          | WHEN __num < 0 THEN -(((-__num) * 1000000) DIV __den)
          | ELSE (__num * 1000000) DIV __den END AS BIGINT)""".stripMargin))
      .select(col("gate_a"), col("gate_b"), col("n00"), col("n01"),
        col("n10"), col("n11"), col("agree_ppm"), col("kappa_ppm"))
      .orderBy(col("gate_a"), col("gate_b"))
  }

  /** Per-label centroid geometry of the embedding space, exactly: the
    * inter-class structure report (which classes collide, which are
    * separable) a labeled embedding table feeds into eval design and
    * hard-negative policy (q136). Cosine between centroids is
    * scale-invariant, so the centroids never materialize as floats:
    * vectors are int8-quantized ([[graft.functions.Quant]], the q74
    * model), per-label per-dimension INTEGER sums stand in for the mean,
    * and the pairwise dot/norm matrix runs in DECIMAL(38,0)/HUGEINT —
    * bit-exact in both engines, unlike a float centroid whose sum order
    * differs per partition. Scale shape: the corpus is touched once by a
    * map-side-combined (label, dim) sum of int8 codes — labels×dim rows
    * shuffle, never vectors — and every join after runs on labels×dim or
    * labels² rows. sim2_ppm is the signed squared-cosine in ppm (sign of
    * the dot, magnitude dot²/(|a|²|b|²)), a sqrt-free similarity both
    * engines compute in integers.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = Quant.fitScale(e, col("embedding"))
    val codes = e.select(col("label").cast("long").as("label"),
      posexplode(Quant.encode(col("embedding"), scale)).as(Seq("pos", "c")))
    val sums = codes.groupBy(col("label"), col("pos"))
      .agg(sum(col("c")).as("s"))
    val counts = e.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    val dots = sums.select(col("label").as("label_a"), col("pos"), col("s").as("sa"))
      .join(sums.select(col("label").as("label_b"), col("pos"), col("s").as("sb")),
        "pos")
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(expr("CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))"))
        .as("dot_d"))
    val norms = sums.groupBy(col("label"))
      .agg(sum(expr("CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))"))
        .as("norm2_d"))
    dots
      .join(norms.select(col("label").as("label_a"), col("norm2_d").as("na2")), "label_a")
      .join(norms.select(col("label").as("label_b"), col("norm2_d").as("nb2")), "label_b")
      .join(counts.select(col("label").as("label_a"), col("n_vecs").as("n_a")), "label_a")
      .join(counts.select(col("label").as("label_b"), col("n_vecs").as("n_b")), "label_b")
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot_d").cast("long").as("dot"),
        col("na2").cast("long").as("norm2_a"),
        col("nb2").cast("long").as("norm2_b"),
        expr("""CAST(CASE WHEN na2 * nb2 = 0 THEN 0
               | WHEN dot_d < 0 THEN -((dot_d * dot_d * 1000000) DIV (na2 * nb2))
               | ELSE (dot_d * dot_d * 1000000) DIV (na2 * nb2)
               |END AS BIGINT)""".stripMargin).as("sim2_ppm"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Late-interaction (MaxSim) retrieval over label groups
    * ([[graft.functions.Similarity.maxSim]]): each label's vector set is
    * scored against a 4-vector query set as Σ_q max_v cos(q, v) — the
    * ColBERT scoring rule, where a document is many vectors and a query
    * matches if EACH of its vectors finds some strong match (single-vector
    * ANN (q30) averages that structure away). The per-query maxes pivot
    * into fixed columns and sum in fixed order, so the double arithmetic
    * is identical in both engines; the corpus streams once through the
    * broadcast query set and only (label, qid, sim) doubles shuffle.
    */
  def maxSimRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val perQuery = Similarity.maxSim(
      e.filter(col("vec_id") >= 4), col("label").cast("long"), col("embedding"),
      e.filter(col("vec_id") < 4), col("vec_id"), col("embedding"))
    perQuery.groupBy(col("grp").as("label"))
      .agg(max(when(col("qid") === 0, col("max_sim"))).as("m0"),
        max(when(col("qid") === 1, col("max_sim"))).as("m1"),
        max(when(col("qid") === 2, col("max_sim"))).as("m2"),
        max(when(col("qid") === 3, col("max_sim"))).as("m3"))
      .select(col("label"), col("m0"), col("m1"), col("m2"), col("m3"),
        (col("m0") + col("m1") + col("m2") + col("m3")).as("maxsim_score"))
      .orderBy(col("label"))
  }

  /** Longest documents per (lang, source) through
    * [[graft.ops.Relational.nativeTopK]] — the catalog face of the native
    * per-key top-k PHYSICAL operator ([[graft.plans.TopKPlan]]: logical
    * node + planner strategy + heap-based partial/final exec pair,
    * injected via [[graft.GraftExtensions]]). On an extension-bearing
    * session the shuffle carries only per-partition heap survivors
    * (≤ partitions × keys × k rows) instead of the corpus; on a plain
    * session (the driver's Verify/Bench mains) the call transparently
    * takes [[graft.ops.Relational.groupTopK]]'s two-phase window — the
    * rows are identical by construction (both are `row_number() <= k`
    * under the same total order), which is exactly what the oracle checks.
    */
  def nativeTopKDocs(spark: SparkSession, dir: String): DataFrame =
    Relational.nativeTopK(
        t(spark, dir, "documents")
          .select(col("lang"), col("source"), col("doc_id"), col("n_chars")),
        keys = Seq("lang", "source"),
        order = Seq(("n_chars", false), ("doc_id", true)), k = 3)
      .orderBy(col("lang"), col("source"), col("n_chars").desc, col("doc_id"))

  /** Concurrent-sessions curve: per hour, the PEAK number of
    * simultaneously open q19 sessions (plus starts/ends and the
    * hour-boundary level) — the capacity-planning read of the event
    * stream. The classic form is a single running sum over every
    * start/end delta in global time order: one reducer sorting the
    * world. Here the prefix sum is decomposed exactly the
    * `packByBudget` way, but sharded by TIME: within-hour running sums
    * window per hour (parallel across hours), a prefix over the tiny
    * per-hour totals gives each hour's opening level, and
    * peak(h) = opening(h) + max(within-hour run). Bit-identical to the
    * global sort for any tie order that respects time — ties at the
    * same microsecond order (+1 before −1, then user/session), so a
    * session ending exactly when another starts still overlaps it.
    * Finer shards (minutes) extend the same decomposition if an hour
    * outgrows a task.
    */
  def concurrencyCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
    val sess = Events.sessionize(e, col("user_id"), col("ts_us"),
        col("event_id"), 1800000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("s_start"), max(col("ts_us")).as("s_end"))
    val deltas = sess.select(col("user_id"), col("session_seq"),
        col("s_start").as("t"), lit(1L).as("delta"))
      .unionAll(sess.select(col("user_id"), col("session_seq"),
        col("s_end").as("t"), lit(-1L).as("delta")))
      .withColumn("hour", expr("t div 3600000000"))
    val withinHour = Window.partitionBy(col("hour"))
      .orderBy(col("t"), col("delta").desc, col("user_id"), col("session_seq"))
    val within = deltas
      .withColumn("run_in_hour", sum(col("delta")).over(withinHour))
      .groupBy(col("hour")).agg(max(col("run_in_hour")).as("max_run"))
    val hourTotals = deltas.groupBy(col("hour"))
      .agg(sum(col("delta")).as("h_total"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
    val offsets = hourTotals
      .withColumn("end_concurrency",
        sum(col("h_total")).over(Window.orderBy(col("hour"))))
    within.join(offsets, "hour")
      .select((col("hour") * 3600L).as("hour_epoch"),
        col("n_starts"), col("n_ends"),
        (col("end_concurrency") - col("h_total") + col("max_run"))
          .as("peak_concurrency"),
        col("end_concurrency"))
      .orderBy(col("hour_epoch"))
  }

  /** Vocabulary-drift data card: for the 30 highest-count corpus tokens,
    * each source's usage share vs the corpus share, in exact ppm — the
    * per-source lexical fingerprint that catches a source drifting from
    * the mixture (spam floods, template text, topic shift) before any
    * model-based monitor would (q110 watches length quantiles; this
    * watches the words). The grid is DENSE: a source that never uses a
    * top token gets its 0-observation row (drift = −corpus share), which
    * is precisely the signal a sparse join would silently drop. Scale
    * shape: one token explode into a map-side-combined (source, token)
    * count; the top-30 cut is TakeOrdered; everything after runs on
    * broadcast-sized frames (30 tokens × sources). Shares are integer
    * DIV against all-token totals, so the card replays bit-for-bit.
    */
  def vocabDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("source"),
        explode(Text.tokens(Text.normalized(col("text")))).as("token"))
    val bySrcTok = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("o"))
    val byTok = bySrcTok.groupBy(col("token")).agg(sum(col("o")).as("rt"))
    val top = byTok.orderBy(col("rt").desc, col("token")).limit(30)
    val bySrc = bySrcTok.groupBy(col("source")).agg(sum(col("o")).as("ct"))
    val totals = bySrc.agg(sum(col("ct")).as("n"))
    broadcast(bySrc).crossJoin(broadcast(top))
      .join(bySrcTok, Seq("source", "token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("source"), col("token"),
        coalesce(col("o"), lit(0L)).as("obs_count"),
        expr("(coalesce(o, 0L) * 1000000L) DIV ct").as("source_share_ppm"),
        expr("(rt * 1000000L) DIV n").as("corpus_share_ppm"),
        expr("(coalesce(o, 0L) * 1000000L) DIV ct - (rt * 1000000L) DIV n")
          .as("drift_ppm"))
      .orderBy(col("source"), col("token"))
  }

  /** Time-travel snapshots: each user's state AS OF three cut timestamps
    * — last event (type + id) and events-so-far — reconstructed from the
    * raw change-log in ONE pass. This is the q02 rank-latest pattern
    * generalized to multiple reconstruction points: the cuts derive
    * in-plan from the stream's own bounds (q88's broadcast-bounds
    * pattern, no driver collect), every event replicates only into the
    * cuts it precedes, and the latest-row window partitions by the
    * HIGH-cardinality (cut, user) key — per-user state is exactly the
    * partitioning a cluster parallelizes freely, never a hot reducer.
    * The practical face is SCD/backfill auditing: "what did the serving
    * state look like at T" without a stored snapshot per T.
    */
  def asOfSnapshots(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("ts_ns"))
    val bounds = e.agg(min(col("ts_ns")).as("__lo"), max(col("ts_ns")).as("__hi"))
    val cuts = broadcast(bounds.select(
      explode(array(lit(1), lit(2), lit(3))).as("cut_id"),
      col("__lo"), col("__hi")))
      .select(col("cut_id"),
        expr("__lo + ((__hi - __lo) DIV 4) * cut_id").as("cut_ns"))
    val asOf = e.join(broadcast(cuts), col("ts_ns") <= col("cut_ns"))
    val perUserCut = Window.partitionBy(col("cut_id"), col("user_id"))
    asOf
      .withColumn("rn", row_number().over(
        perUserCut.orderBy(col("ts_ns").desc, col("event_id").desc)))
      .withColumn("n_events", count(lit(1)).over(perUserCut))
      .filter(col("rn") === 1)
      .select(col("cut_id"), col("user_id"),
        col("event_type").as("last_event_type"),
        col("event_id").as("last_event_id"), col("n_events"))
      .orderBy(col("cut_id"), col("user_id"))
  }

  /** KMV (k-minimum-values) bottom-k distinct sketch + cross-source overlap
    * matrix: per source, the K=64 smallest 48-bit md5 hashes of its distinct
    * word 3-shingles form a mergeable sketch; any two sketches combine into
    * (distinct, union, intersection, Jaccard) ESTIMATES without touching the
    * corpus again. Closes the sketch suite's set-operations gap — Bloom (q81)
    * answers membership, HLL (q120) distinct-only, CMS (q134/q135)
    * frequency; KMV is the one that composes under union AND intersection,
    * which is what "how much does src A's content overlap src B" needs at
    * 100 TB, where exact pairwise shingle intersections are off the table.
    * The hash family is a 12-hex md5 prefix, so the sketch — and therefore
    * every estimate — replays bit-for-bit in the oracle (unlike HLL's
    * xxhash64 rows-only check). Scale shape: the only corpus-wide work is
    * distinct (source, hash48) — an ~8-byte-payload shuffle, text never
    * leaves the scan; the per-source bottom-K runs through
    * [[Relational.groupTopK]]'s sharded two-phase form (no hot reducer per
    * source); everything pairwise operates on K-element arrays (sources × K
    * rows), in-plan and broadcast-sized. Estimators are the standard KMV
    * forms in integer DIV arithmetic: D̂ = (K−1)·2⁴⁸ DIV h_K when the
    * sketch is full (a sketch with fewer than K values IS the exact
    * distinct set); over the m = |union sketch| ≤ K smallest union values
    * with ρ of them in both sketches, J = ρ/m and |A∩B| = ρ·Û DIV m.
    */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val K = 64
    val estNum = (K - 1).toLong * (1L << 48)
    val hashes = t(spark, dir, "documents")
      .select(col("source"), explode(Text.shingles(col("text"), 3)).as("s"))
      .select(col("source"),
        expr("cast(conv(substring(md5(s), 1, 12), 16, 10) as long)").as("h"))
      .distinct()
    val sk = Relational.groupTopK(hashes, Seq(col("source")),
        Seq(col("h").asc), col("h"), K)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n"))
    val a = sk.select(col("source").as("src_a"), col("hs").as("ha"), col("n").as("na"))
    val b = sk.select(col("source").as("src_b"), col("hs").as("hb"), col("n").as("nb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("us",
        slice(sort_array(array_distinct(concat(col("ha"), col("hb")))), 1, K))
      .withColumn("m", size(col("us")).cast("long"))
      .withColumn("rho",
        size(array_intersect(array_intersect(col("us"), col("ha")), col("hb")))
          .cast("long"))
      .withColumn("eu", expr(
        s"CASE WHEN m < $K THEN m ELSE ${estNum}L DIV greatest(try_element_at(us, $K), 1L) END"))
      .selectExpr("src_a", "src_b", "m", "rho",
        s"CASE WHEN na < $K THEN na ELSE ${estNum}L DIV greatest(try_element_at(ha, $K), 1L) END AS est_a",
        s"CASE WHEN nb < $K THEN nb ELSE ${estNum}L DIV greatest(try_element_at(hb, $K), 1L) END AS est_b",
        "eu AS est_union",
        "(rho * eu) DIV m AS est_inter",
        "(rho * 1000000L) DIV m AS jaccard_ppm")
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Deterministic half-sample stability intervals: the per-source mean
    * document length (q99's point estimate) with 32-replicate spread — the
    * error bars a data card needs before anyone compares two sources or two
    * releases on a mean. Replicate r keeps a document iff bit r of an
    * md5-derived 32-bit word is set, i.e. 32 deterministic ~half-samples;
    * the min/max replicate means bound the estimate's sampling wobble, and
    * because membership is a pure hash of doc_id the whole "resampling"
    * replays bit-for-bit in the oracle (a seeded-RNG bootstrap could
    * never). Scale shape: membership is a scan-local projection (only
    * (source, n_chars, h32) exist — text is pruned at the scan), the ×32
    * replicate fan-out happens map-side and is immediately partial-
    * aggregated, so the shuffle carries sources × 32 partial rows; the
    * replicate-mean frame downstream is broadcast-sized. Means are integer
    * milli-chars ((1000·Σ) DIV n), exact in both engines.
    */
  def halfSampleCi(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("source"), col("n_chars"),
      expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as long)")
        .as("h32"))
    val reps = docs
      .select(col("source"), col("n_chars"), col("h32"),
        explode(sequence(lit(0), lit(31))).as("rep"))
      .filter(expr("shiftright(h32, rep) % 2 = 1"))
      .groupBy(col("source"), col("rep"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .select(col("source"), expr("(1000L * s) DIV n").as("rep_mean"))
    val full = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("s"))
      .select(col("source"), col("n_docs"),
        expr("(1000L * s) DIV n_docs").as("mean_milli"))
    full.join(reps, "source")
      .groupBy(col("source"), col("n_docs"), col("mean_milli"))
      .agg(count(lit(1)).as("n_reps"),
        min(col("rep_mean")).as("lo_milli"), max(col("rep_mean")).as("hi_milli"))
      .withColumn("spread_milli", col("hi_milli") - col("lo_milli"))
      .orderBy(col("source"))
  }

  /** Join-key statistics for every FK edge in the warehouse schema
    * ([[graft.dq.Checks.fkProfile]]): the planner-facing profile —
    * cardinalities, hottest-key skew multiple, referential orphans, dead
    * dim keys — that decides broadcast vs shuffle vs bucketing vs salting
    * for each join BEFORE anyone runs it at 100 TB. q131 diagnoses one
    * key's heat; this is the schema-wide table: five edges, each fed by a
    * single two-phase per-key count (8-byte key shuffle, map-side
    * partials) plus key-projected anti-joins, unioned into a five-row
    * report. All-integer output, so the profile replays exactly.
    */
  def joinStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.dq.Checks.fkProfile
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val edges = Seq(
      fkProfile(li, col("l_orderkey"), o, col("o_orderkey"),
        "lineitem.l_orderkey->orders"),
      fkProfile(li, col("l_partkey"), t(spark, dir, "part"), col("p_partkey"),
        "lineitem.l_partkey->part"),
      fkProfile(li, col("l_suppkey"), t(spark, dir, "supplier"), col("s_suppkey"),
        "lineitem.l_suppkey->supplier"),
      fkProfile(o, col("o_custkey"), t(spark, dir, "customer"), col("c_custkey"),
        "orders.o_custkey->customer"),
      fkProfile(t(spark, dir, "customer"), col("c_nationkey"),
        t(spark, dir, "nation"), col("n_nationkey"),
        "customer.c_nationkey->nation"))
    edges.reduce(_ unionAll _).orderBy(col("edge"))
  }

  /** Cross-lingual parallel-pair mining ([[Similarity.marginMining]]): for
    * each English anchor document, the 3 best non-English candidates by the
    * margin criterion — cosine normalized by both endpoints' top-4
    * neighborhood density — the curation op that builds aligned-pair
    * training sets and that raw cosine gets wrong wherever a hub vector
    * sits near everything. Anchors are the bounded broadcast side (q30's
    * contract); the per-anchor neighborhood and final margin cuts run
    * sharded (no low-cardinality window over the pair frame); all doubles
    * are fixed-order so ranks replay exactly. Output is rank-only — ids
    * and languages, no floats in the artifact.
    */
  def bitextMargin(spark: SparkSession, dir: String): DataFrame = {
    val j = t(spark, dir, "embeddings")
      .join(t(spark, dir, "documents"), col("vec_id") === col("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("v"), col("lang"))
    val anchors = j.filter(col("lang") === "en" && col("id") < 50)
    val targets = j.filter(col("lang") =!= "en")
    Similarity.marginMining(
      targets, col("id"), col("v"), col("lang"),
      anchors, col("id"), col("v"), k = 4, topM = 3)
  }

  /** Tokenizer-training statistics: the first BPE merge table — corpus-wide
    * adjacent character-pair frequencies, weighted by word occurrence, top
    * 20 with corpus share. This is exactly the candidate list the first
    * iteration of byte-pair-encoding training scores, and the diagnostic
    * for "does this corpus slice deserve its own tokenizer" next to q111's
    * fertility and q128's Zipf table. Scale shape — the BPE trick: pair
    * counting runs on the VOCABULARY (distinct word, count), not the
    * corpus. One map-side-combined word count is the only corpus-scale
    * shuffle; the pair explode and pair rollup operate on vocab-cardinality
    * rows; the final cut is TakeOrderedAndProject with the total as an
    * in-plan broadcast scalar (q131's shape).
    */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    val vocab = t(spark, dir, "documents")
      .select(explode(Text.tokens(Text.normalized(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .filter(length(col("w")) >= 2)
    val pairs = vocab
      .select(col("wc"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n_occurrences"))
    val total = pairs.agg(sum(col("n_occurrences")).as("tot"))
    pairs.crossJoin(broadcast(total))
      .select(col("pair"), col("n_occurrences"),
        expr("(n_occurrences * 1000000L) DIV tot").as("share_ppm"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(20)
  }

  /** IVF posting-list balance + coherence audit ([[Similarity.ivfBalance]]):
    * dense per-cell population/share/load-factor/mean-cosine over the same
    * 32 hash-sampled centroids q53 probes — the capacity-planning table
    * that decides centroid count and refinement before an index build.
    */
  def ivfBalanceAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfBalance(e, col("vec_id"), col("embedding"), nCentroids = 32)
  }

  /** Daily distinct-user estimates via the mergeable KMV AGGREGATOR
    * ([[graft.functions.Sketches.KmvAggregator]]) — q147's sketch as one
    * custom aggregate instead of a sharded top-k plan: partial sketches
    * form map-side on every input split and merge associatively, which is
    * the form that drops unchanged into a watermarked streaming window
    * ([[graft.streaming.Windowed.distinctEstimateStream]] is the
    * continuous twin). Per day: sketch fill, the integer-DIV estimate, and
    * the exact distinct as the error audit (the q134 discipline — the
    * audit column is what you delete at 100 TB, the sketch is what you
    * keep). State per group is ≤ 64 longs, never a distinct set.
    */
  def kmvDaily(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sketches
    t(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"), col("user_id"),
        Sketches.kmvHash48(col("user_id")).as("h"))
      .groupBy(col("day"))
      .agg(Sketches.kmvSketch(col("h")).as("sk"),
        countDistinct(col("user_id")).as("exact_distinct"))
      .select(col("day"), size(col("sk")).cast("long").as("n_sketch"),
        Sketches.kmvEstimate("sk").as("est_distinct"), col("exact_distinct"))
      .orderBy(col("day"))
  }

  /** Group-aware splitting, measured: the same near-dup candidate pairs
    * (q28's MinHash LSH), scored against TWO split assignments — the naive
    * per-document id-hash split (q55) and the group-aware source-hash
    * split (GroupShuffleSplit: every document of a source travels
    * together). For each mode: total pairs, pairs crossing any split
    * boundary, and train↔test pairs specifically — the leakage a held-out
    * metric silently inherits. Same-source near-dups (re-crawls, template
    * copies — most of them, per q132) can NEVER cross under the group
    * split; what remains is true cross-source duplication, which only
    * dedup (q83) can fix. One candidate-pair computation feeds both modes
    * (flags are projections, the rollup is a single aggregate row
    * unpivoted by stack); pairs carry ids and source labels only.
    */
  def groupSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .filter(size(Text.shingles(col("text"), 3)) > 0)
    val cands = Dedup.minHashCandidates(d, col("doc_id"), col("text"),
      shingleK = 3, bands = 2, rowsPerBand = 2)
    val src = d.select(col("doc_id"), col("source"))
    val pairs = cands
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
    def split(key: Column): Column = {
      val b = Sampling.hashBucket(key, 100)
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    val (ia, ib) = (split(col("id_a")), split(col("id_b")))
    val (ga, gb) = (split(col("src_a")), split(col("src_b")))
    def tt(a: Column, b: Column): Column =
      ((a === "train" && b === "test") || (a === "test" && b === "train"))
        .cast("long")
    pairs
      .select((ia =!= ib).cast("long").as("ic"), tt(ia, ib).as("itt"),
        (ga =!= gb).cast("long").as("gc"), tt(ga, gb).as("gtt"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("ic")), lit(0L)).as("ics"),
        coalesce(sum(col("itt")), lit(0L)).as("itts"),
        coalesce(sum(col("gc")), lit(0L)).as("gcs"),
        coalesce(sum(col("gtt")), lit(0L)).as("gtts"))
      .selectExpr("stack(2, 'id_hash', n, ics, itts, 'group_hash', n, gcs, gtts) " +
        "AS (split_mode, n_pairs, n_cross_split, n_train_test)")
      .orderBy(col("split_mode"))
  }

  /** Embedding dimension-health audit: per dimension, the micro-quantized
    * component mean, the exactly-zero count (dead-dimension detector), and
    * the dimension's share of total squared mass in ppm (anisotropy — a
    * healthy 64-dim space sits near 15625 ppm per dim; one dimension
    * hoarding energy means cosine is secretly a 1-D comparison, the
    * known rogue-dimension failure of embedding models). This is the
    * pre-flight check for every consumer downstream — q30's cosine, q66's
    * PQ codebooks, q74's int8 ranges all assume the space isn't
    * degenerate. Scale shape: one posexplode + map-side-combined groupBy
    * over dim-cardinality keys; components integerize as floor(x·1e6)
    * BEFORE any sum, squared mass accumulates in DECIMAL(38,0) (q133's
    * overflow discipline), means use sign-explicit truncating division;
    * the total is an in-plan broadcast scalar. Vectors never shuffle —
    * only (dim, partial-aggregate) rows do.
    */
  def dimHealth(spark: SparkSession, dir: String): DataFrame = {
    val comps = t(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim_idx", "x")))
      .select(col("dim_idx").cast("long").as("dim_idx"),
        expr("cast(floor(cast(x as double) * 1000000) as long)").as("xm"))
    val per = comps.groupBy(col("dim_idx")).agg(
      count(lit(1)).as("n"),
      sum(when(col("xm") === 0L, 1L).otherwise(0L)).as("n_zero"),
      sum(col("xm")).as("sm"),
      sum(col("xm").cast(DecimalType(38, 0)) * col("xm").cast(DecimalType(38, 0)))
        .as("de"))
    val tot = per.agg(sum(col("de")).as("te"))
    per.crossJoin(broadcast(tot))
      .selectExpr("dim_idx", "n_zero",
        "CASE WHEN sm >= 0 THEN sm DIV n ELSE -((-sm) DIV n) END AS mean_micro",
        "CAST((de * 1000000) DIV te AS BIGINT) AS energy_ppm")
      .orderBy(col("dim_idx"))
  }

  /** Curriculum budget cut: the most-FLUENT documents (q82's integer
    * char-bigram LM, mean-per-transition) selected in exact global quality
    * order until half the corpus tokens are spent — "best data first"
    * selection at a token budget, the curriculum/data-pruning op that a
    * top-k by score (q102) can't express because the stop condition is a
    * running SUM, not a count. Scale shape — the third prefix-sum sharding
    * in this repo, this one ORDER-BY-VALUE: the bounded metric (mean
    * fluency ∈ [0, 1e6]) range-shards into 16 slices, a per-slice token
    * mass + a ≤17-row slice prefix locate the budget's boundary slice,
    * whole slices above it keep scan-locally, and ONLY the boundary
    * slice's rows enter an ordered window (bounded by slice width, never
    * the corpus). Bit-identical to the naive global running sum the
    * oracle computes; output is the per-language rollup of the selection.
    */
  def curriculumBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val model = graft.functions.LmScore.bigramModel(docs, col("text"))
    val scored = graft.functions.LmScore
      .score(docs, col("doc_id"), col("text"), model)
      .select(col("doc_id"), expr("lm_score DIV n_bigrams").as("mean_micro"))
    val base = docs
      .select(col("doc_id"), col("lang"),
        size(Text.tokens(Text.normalized(col("text")))).cast("long").as("tok"))
      .join(scored, "doc_id")
      .withColumn("shard", expr("mean_micro DIV 62500"))
    val budget = base.agg(sum(col("tok")).as("tt"))
      .select(expr("tt DIV 2").as("budget"))
    val shardPrefix = base.groupBy(col("shard")).agg(sum(col("tok")).as("stok"))
      .withColumn("cum_through",
        sum(col("stok")).over(Window.orderBy(col("shard").desc)))
      .withColumn("cum_before", col("cum_through") - col("stok"))
    val withCtx = base.join(broadcast(shardPrefix), "shard")
      .crossJoin(broadcast(budget))
    val fullSlices = withCtx.filter(col("cum_through") <= col("budget"))
    val boundary = withCtx
      .filter(col("cum_before") < col("budget") && col("cum_through") > col("budget"))
      .withColumn("wc", sum(col("tok")).over(
        Window.partitionBy(col("shard"))
          .orderBy(col("mean_micro").desc, col("doc_id"))))
      .filter(col("cum_before") + col("wc") <= col("budget"))
      .drop("wc")
    fullSlices.unionByName(boundary)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** Linear multi-touch attribution: every purchase's value splits equally
    * (exact integer micros, remainder to the LAST touch so revenue is
    * conserved to the micro) across the same-user clicks in the preceding
    * 10 minutes; purchases with no preceding click post as 'direct'. The
    * daily first/middle/last/direct revenue table is the attribution card
    * marketing runs nightly — and the remainder-to-last rule is what makes
    * it auditable: per day, attributed revenue sums EXACTLY to purchase
    * revenue (the spec pins conservation). Scale shape: the touch match is
    * [[graft.ops.RangeJoin.joinRange]]'s bucketed equi-join (no
    * nested-loop inequality join); position/count windows partition by
    * the high-cardinality purchase id; the rollup is days × 4 classes
    * with map-side partials. Money goes through DECIMAL(18,2) → integer
    * micros before any split.
    */
  def multiTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"),
        (dec2(col("value")) * 1000000).cast("long").as("vmicro"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_us").as("p_ts"), col("vmicro"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("event_id").as("c_id"))
    val touches = graft.ops.RangeJoin.joinRange(purchases, clicks,
      "user_id", "p_ts", "c_ts", window = 600000000L)
    val w = Window.partitionBy(col("p_id"))
    val ranked = touches
      .withColumn("pos", row_number().over(w.orderBy(col("c_ts"), col("c_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("base", expr("vmicro DIV n"))
      .withColumn("attributed",
        when(col("pos") === col("n"),
          col("vmicro") - col("base") * (col("n") - 1))
          .otherwise(col("base")))
      .withColumn("attribution",
        when(col("pos") === col("n"), "last")
          .when(col("pos") === 1, "first").otherwise("middle"))
    val direct = purchases
      .join(touches.select(col("p_id")).distinct(), Seq("p_id"), "left_anti")
      .select(expr("p_ts div 86400000000").as("day"),
        lit("direct").as("attribution"), col("vmicro").as("attributed"))
    ranked
      .select(expr("p_ts div 86400000000").as("day"), col("attribution"),
        col("attributed"))
      .unionByName(direct)
      .groupBy(col("day"), col("attribution"))
      .agg(count(lit(1)).as("n_touches"), sum(col("attributed")).as("revenue_micro"))
      .orderBy(col("day"), col("attribution"))
  }

  /** Session co-occurrence lift (association analysis): for every
    * unordered event-type pair, the number of sessions containing both,
    * its support, and its LIFT — observed co-occurrence over the
    * independence expectation, in exact ppm — the market-basket table
    * behind "users who error also churn" claims, and the point where raw
    * counts mislead (the two most common types always co-occur most; lift
    * is what says whether that means anything). Scale shape: sessions
    * come from the q19/q144 sessionizer (per-user windows); the only
    * corpus-scale frames are distinct (session, type) rows and their
    * self-join WITHIN each session — bounded by the type-alphabet squared
    * per session, which is the standard itemset constraint (cap the
    * per-session type set for open alphabets). Type marginals and the
    * session total broadcast; lift multiplies in DECIMAL(38,0)/HUGEINT
    * so n_ab·N·1e6 cannot overflow at corpus scale.
    */
  def liftPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
    val sess = Events.sessionize(e, col("user_id"), col("ts_us"),
      col("event_id"), 1800000000L)
    val st = sess.select(col("user_id"), col("session_seq"), col("event_type"))
      .distinct()
    val totals = st.select(col("user_id"), col("session_seq")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val single = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val a = st.select(col("user_id"), col("session_seq"),
      col("event_type").as("type_a"))
    val b = st.select(col("user_id"), col("session_seq"),
      col("event_type").as("type_b"))
    a.join(b, Seq("user_id", "session_seq"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n_ab"))
      .join(broadcast(single.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(single.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(totals))
      .selectExpr("type_a", "type_b", "n_ab",
        "(n_ab * 1000000L) DIV n_sessions AS support_ppm",
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * n_sessions * 1000000) DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_ppm")
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Within-session transition matrix (first-order Markov journey table):
    * for every consecutive event pair inside a session, the (from → to)
    * count and the row-normalized transition probability in exact ppm —
    * q158 says which behaviors co-occur, this says in which ORDER, which
    * is what funnels (q115), next-action prediction baselines, and
    * anomaly detection on journey shape all consume. Scale shape:
    * transitions come from one `lead` over the per-(user, session) window
    * (high-cardinality partitioning, parallelizes freely) and project
    * map-side into a ≤ |alphabet|² cell rollup; the from-marginal
    * normalization runs on matrix-cardinality rows only.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
    val sess = Events.sessionize(e, col("user_id"), col("ts_us"),
      col("event_id"), 1800000000L)
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts_us"), col("event_id"))
    val cells = sess
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val marginals = cells.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("nf"))
    cells.join(broadcast(marginals), "from_type")
      .selectExpr("from_type", "to_type", "n_transitions",
        "(n_transitions * 1000000L) DIV nf AS prob_ppm")
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Retrieval-index scorecard: recall@10 and MRR for every ANN method in
    * the repo — LSH (q32's buckets) and IVF (q53's cells) — against the
    * brute-force truth (q30), on the same query set, in ONE table. q126
    * charts one index's probe-budget curve; this is the cross-method
    * decision row ("which index, at today's data") an embedding platform
    * publishes with each corpus release. The grid is DENSE over methods ×
    * queries, so a query an index returns nothing for (empty LSH bucket)
    * still drags its recall down instead of silently vanishing. MRR stays
    * integer: per query 1e6 DIV first-hit-rank, averaged by DIV — exact
    * in both engines. Scale shape: each method is its own already-audited
    * plan (broadcast queries, bucketed/celled probes); the scorecard adds
    * only joins on (query, corpus-id) pairs of k-bounded results and a
    * methods×queries rollup.
    */
  def retrievalScorecard(spark: SparkSession, dir: String): DataFrame = {
    // ONE k feeds every topK call AND the recall denominator below — a k
    // changed in one place but not the other silently skews recall_ppm
    // (mirror any change in the q160 oracle SQL's `* 10L`).
    val k = 10
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    def asResult(df: DataFrame, m: String): DataFrame =
      df.select(lit(m).as("method"), col("query_id"), col("corpus_id"), col("rank"))
    val truth = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = k)
    val results = asResult(truth, "brute")
      .unionByName(asResult(Similarity.lshTopK(e, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = k, dim = 64, bits = 6), "lsh"))
      .unionByName(asResult(Similarity.ivfTopK(e, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = k, nCentroids = 32, nProbe = 8), "ivf"))
    val truthSet = truth.select(col("query_id"), col("corpus_id"), lit(1).as("hit"))
    val perQ = results
      .join(truthSet, Seq("query_id", "corpus_id"), "left")
      .groupBy(col("method"), col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"),
        min(when(col("hit").isNotNull, col("rank"))).as("first_hit"))
    val grid = q.select(col("vec_id").as("query_id"))
      .crossJoin(spark.sql("SELECT explode(array('brute', 'lsh', 'ivf')) AS method"))
    grid.join(perQ, Seq("method", "query_id"), "left")
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_queries"),
        coalesce(sum(col("hits")), lit(0L)).as("n_hits"),
        sum(when(col("first_hit").isNull, 0L)
          .otherwise(expr("1000000L DIV first_hit"))).as("rr_sum"))
      .selectExpr("method", "n_queries", "n_hits",
        s"(n_hits * 1000000L) DIV (n_queries * ${k}L) AS recall_ppm",
        "rr_sum DIV n_queries AS mrr_micro")
      .orderBy(col("method"))
  }

  /** Near-dup graph shape ([[graft.functions.Graph.triangleStats]]):
    * exact triangle count and global clustering coefficient over q28's
    * candidate-pair graph — q60 says how big duplicate clusters are, this
    * says how DENSE (re-crawl chains are triangle-free; template farms
    * are near-cliques), the evidence for whether q60's transitive merge
    * over-merges. Degree-ordered edge orientation bounds the wedge-join
    * fan-out by the graph's degeneracy, not its max degree.
    */
  def dupGraphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .filter(size(Text.shingles(col("text"), 3)) > 0)
    // a materialization seam on the candidate list measured flat here
    // (1.67 vs 1.71s): minHashCandidates ends in a distinct whose
    // exchange every triangleStats consumer reuses — the reuse path holds
    val pairs = Dedup.minHashCandidates(d, col("doc_id"), col("text"),
      shingleK = 3, bands = 2, rowsPerBand = 2)
    graft.functions.Graph.triangleStats(pairs, col("id_a"), col("id_b"))
  }

  /** Daily-trend detector: exact ordinary-least-squares slope of each
    * event type's daily total value over the day index — the "is this
    * metric drifting" monitor (q110 watches a distribution, this watches
    * a LEVEL) in closed form: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
    * computed entirely from integer sums so the fit replays bit-for-bit
    * (a float regression would not). Value micros keep money exact;
    * products run in DECIMAL(38,0)/HUGEINT (q133's overflow discipline);
    * the slope ships as micros-per-day with sign-explicit DIV. Scale
    * shape: one map-side-combined (type, day) rollup — the only
    * corpus-scale shuffle — then a types-cardinality aggregate of the
    * five sufficient statistics.
    */
  def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        (dec2(col("value")) * 1000000).cast("long").as("vmicro"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vmicro")).as("y"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
        sum(col("y")).as("sy"),
        sum(dec(col("day")) * dec(col("y"))).as("sxy"),
        sum(dec(col("day")) * dec(col("day"))).as("sxx"))
      .selectExpr("event_type", "n",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0)) AS num",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0)) AS den")
      .selectExpr("event_type", "n",
        "CASE WHEN den = 0 THEN 0L " +
          "WHEN num >= 0 THEN CAST((num * 1000000) DIV den AS BIGINT) " +
          "ELSE -CAST(((-num) * 1000000) DIV den AS BIGINT) END AS slope_micro_per_day")
      .orderBy(col("event_type"))
  }

  /** Benford first-digit audit: the leading-significant-digit distribution
    * of event values per type, as a DENSE type × digit grid of observed
    * shares next to the Benford expectation log10(1+1/d) (fixed ppm
    * constants) and the signed deviation — the classic fabricated-number /
    * broken-generator screen for any money-like column, the fraud-facing
    * member of the DQ family (q16 nulls, q80 outliers, q36 profile).
    * First digit comes from the DECIMAL(18,2)-exact cents rendered as a
    * string, identical in both engines; zero-valued rows are excluded
    * (they have no significant digit). Scale shape: one
    * map-side-combined (type, digit) rollup — ≤ types×9 cells — with
    * per-type totals broadcast back onto the dense grid.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val cents = t(spark, dir, "events")
      .select(col("event_type"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("digit", expr("cast(substring(cast(cents as string), 1, 1) as long)"))
    val cellCounts = cents.groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val typeTotals = cellCounts.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
    val grid = typeTotals.crossJoin(broadcast(
      spark.sql(s"SELECT posexplode(array(${benford.mkString(",")})) AS (i, benford_ppm)")
        .selectExpr("cast(i + 1 as long) AS digit", "cast(benford_ppm as long) AS benford_ppm")))
    grid.join(cellCounts, Seq("event_type", "digit"), "left")
      .selectExpr("event_type", "digit", "coalesce(n, 0L) AS n",
        "(coalesce(n, 0L) * 1000000L) DIV nt AS obs_ppm",
        "benford_ppm",
        "(coalesce(n, 0L) * 1000000L) DIV nt - benford_ppm AS deviation_ppm")
      .orderBy(col("event_type"), col("digit"))
  }

  /** Engine-portable HyperLogLog with a full oracle: 256 registers from an
    * md5 hash split (2 hex chars → register, next 48 bits → rank = leading
    * zeros + 1 via `49 − length(bin(v))`, identical SQL in both engines),
    * per-DAY sketches max-merged register-wise into per-WEEK sketches —
    * the HLL union — with the raw estimator in ALL-INTEGER arithmetic:
    * Σ 2^−M scales to S = Σ 2^(50−M) (empties at 2^50) and
    * Ê = α·m²·2^50 DIV S with α as a shared ppm literal, so the estimate
    * replays bit-for-bit where q120's xxhash64 sketch is rows-only.
    * The standard small-range correction (raw ≤ 5m/2 with empty
    * registers → linear counting m·ln(m/V)) IS applied — but ln() is an
    * engine-variant double, so the 256 possible values of the correction
    * are precomputed into a shared literal lookup table indexed by the
    * empty-register count: both engines read the same integer, no libm in
    * the plan. Scale shape: after the scan the only rows are
    * (period, register, rank) partials — map-side max-combined, ≤ 256 per
    * period; the week merge aggregates sketch rows, never the stream; the
    * exact audit columns are what you delete at 100 TB.
    */
  /** Linear-counting values m·ln(m/V) for m = 256 and V = 1..256, rounded
    * to long — THE shared literal table both q164 engines index (Spark
    * `element_at`, DuckDB list subscript), so the small-range correction
    * never evaluates ln() inside either plan.
    */
  private lazy val HllLinearCountTable: String =
    (1 to 256).map(v => Math.round(256.0 * Math.log(256.0 / v))).mkString(", ")

  def hllPortable(spark: SparkSession, dir: String): DataFrame = {
    val alphaPpm = 718273L // 0.7213 / (1 + 1.079/256), shared literal
    val base = t(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .withColumn("reg",
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 2), 16, 10) as long)"))
      .withColumn("v48",
        expr("cast(conv(substring(md5(cast(user_id as string)), 3, 12), 16, 10) as long)"))
      .withColumn("rho",
        when(col("v48") === 0L, lit(49L)).otherwise(lit(49L) - length(bin(col("v48")))))
    val dayReg = base.groupBy(col("day"), col("reg")).agg(max(col("rho")).as("m"))
    val weekReg = dayReg.groupBy(expr("day div 7").as("week"), col("reg"))
      .agg(max(col("m")).as("m"))
    def estimate(regs: DataFrame, period: Column, grain: String): DataFrame =
      regs.groupBy(period.as("period"))
        .agg(count(lit(1)).as("n_used"),
          sum(expr("shiftleft(1L, cast(50 - m as int))")).as("s_used"))
        .selectExpr("period", "n_used",
          s"""CAST((CAST($alphaPpm AS DECIMAL(38,0)) * 65536 * ${1L << 50}L) DIV
             |  (CAST(s_used + (256 - n_used) * ${1L << 50}L AS DECIMAL(38,0)) * 1000000)
             |  AS BIGINT) AS raw_est""".stripMargin.replaceAll("\n", " "))
        .selectExpr("period", "n_used",
          s"""CASE WHEN raw_est <= 640 AND n_used < 256
             |  THEN element_at(array($HllLinearCountTable), cast(256 - n_used as int))
             |  ELSE raw_est END AS est_distinct""".stripMargin.replaceAll("\n", " "))
        .withColumn("grain", lit(grain))
    val exactDay = t(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("period"), col("user_id"))
      .groupBy(col("period")).agg(countDistinct(col("user_id")).as("exact_distinct"))
    val exactWeek = t(spark, dir, "events")
      .select(expr("(ts div 86400000000000) div 7").as("period"), col("user_id"))
      .groupBy(col("period")).agg(countDistinct(col("user_id")).as("exact_distinct"))
    estimate(dayReg, col("day"), "day").join(exactDay, "period")
      .unionByName(estimate(weekReg, col("week"), "week").join(exactWeek, "period"))
      .select(col("grain"), col("period"), col("n_used"),
        col("est_distinct"), col("exact_distinct"))
      .orderBy(col("grain"), col("period"))
  }

  /** Cross-release centroid drift: for each label, the cosine² (signed,
    * exact ppm) between its centroid in release A and release B —
    * "did this class MOVE between embedding runs", the geometric drift
    * monitor that catches a silently retrained or re-normalized encoder
    * before any downstream index (q53's cells, q66's codebooks, q136's
    * negatives) quietly degrades. Releases are deterministic id-hash
    * halves; q141's integer-centroid discipline carries over verbatim:
    * int8-quantized per-dim INTEGER sums stand in for centroids (cosine
    * is scale-invariant), products in DECIMAL/HUGEINT, sign-explicit
    * squared cosine so no sqrt enters either engine. 1e6 means the class
    * did not rotate; drift_ppm = 1e6 − sim2 is the alarm column. One
    * map-side-combined (label, release, dim) sum pass; vectors never
    * shuffle — labels × 2 × dim integer rows do.
    */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = Quant.fitScale(e, col("embedding"))
    val rel = e.withColumn("release",
      when(Sampling.hashBucket(col("vec_id"), 100) < 50, "a").otherwise("b"))
    val sums = rel
      .select(col("label").cast("long").as("label"), col("release"),
        posexplode(Quant.encode(col("embedding"), scale)).as(Seq("pos", "c")))
      .groupBy(col("label"), col("release"), col("pos"))
      .agg(sum(col("c")).as("s"))
    val a = sums.filter(col("release") === "a")
      .select(col("label"), col("pos"), col("s").as("sa"))
    val b = sums.filter(col("release") === "b")
      .select(col("label"), col("pos"), col("s").as("sb"))
    val geo = a.join(b, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(
        sum(expr("CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))")).as("dot_d"),
        sum(expr("CAST(sa AS DECIMAL(19,0)) * CAST(sa AS DECIMAL(19,0))")).as("na2"),
        sum(expr("CAST(sb AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))")).as("nb2"))
    val counts = rel.groupBy(col("label").cast("long").as("label"))
      .agg(sum(when(col("release") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("release") === "b", 1L).otherwise(0L)).as("n_b"))
    geo.join(counts, "label")
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("label"), col("n_a"), col("n_b"),
        expr("""CAST(CASE WHEN na2 * nb2 = 0 THEN 0
               | WHEN dot_d < 0 THEN -((dot_d * dot_d * 1000000) DIV (na2 * nb2))
               | ELSE (dot_d * dot_d * 1000000) DIV (na2 * nb2)
               |END AS BIGINT)""".stripMargin).as("sim2_ppm"))
      .withColumn("drift_ppm", lit(1000000L) - col("sim2_ppm"))
      .orderBy(col("label"))
  }

  /** Exact integer covariance matrix of the embedding dimensions (upper
    * triangle, dim·(dim+1)/2 rows) — the input every PCA / whitening /
    * decorrelation step needs, and the cross-dimension completion of
    * q155's per-dim moments (a rogue PAIR of correlated dims is invisible
    * to marginals). Scaled covariance cov_micro2 = (n·Σxy − Σx·Σy) DIV n²
    * in micro² units, all from integer sums (q133's discipline at matrix
    * scale). Scale shape — no self-join: the (p, q, x_p·x_q) pair stream
    * is generated MAP-SIDE by one nested-transform explode per row (the
    * ×dim²/2 amplification is scan-stage CPU, and map-side combine means
    * the shuffle carries only partitions × 2080 partial rows); Σx_p comes
    * from the dim-level pass, never the pair stream; n is an in-plan
    * broadcast scalar. [[graft.functions.Pca.topComponent]] consumes this
    * matrix driver-side (64×64 — a model-fit decision point, like the
    * k-means codebooks) for the principal direction.
    */
  def dimCovariance(spark: SparkSession, dir: String): DataFrame = {
    val withXm = t(spark, dir, "embeddings")
      .withColumn("xm",
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000) as long))"))
    val pairs = withXm
      .select(explode(expr(
        """flatten(transform(sequence(0, 63), p ->
          |  transform(sequence(p, 63), q ->
          |    struct(p AS p, q AS q, xm[p] * xm[q] AS xy))))""".stripMargin)).as("s"))
      .select(col("s.p").cast("long").as("p"), col("s.q").cast("long").as("q"),
        col("s.xy"))
      .groupBy(col("p"), col("q"))
      .agg(sum(col("xy").cast(DecimalType(38, 0))).as("sxy"))
    val dims = withXm
      .select(posexplode(col("xm")).as(Seq("d", "x")))
      .groupBy(col("d").cast("long").as("d"))
      .agg(sum(col("x")).as("sx"))
    val n = withXm.agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(dims.select(col("d").as("p"), col("sx").as("sp"))), "p")
      .join(broadcast(dims.select(col("d").as("q"), col("sx").as("sq"))), "q")
      .crossJoin(broadcast(n))
      .selectExpr("p", "q",
        """CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * sxy - CAST(sp AS DECIMAL(38,0)) * sq >= 0
          |  THEN (CAST(n AS DECIMAL(38,0)) * sxy - CAST(sp AS DECIMAL(38,0)) * sq) DIV (CAST(n AS DECIMAL(38,0)) * n)
          |  ELSE -((-(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sp AS DECIMAL(38,0)) * sq)) DIV (CAST(n AS DECIMAL(38,0)) * n))
          |END AS BIGINT) AS cov_micro2""".stripMargin.replaceAll("\n", " "))
      .orderBy(col("p"), col("q"))
  }

  /** Span-corruption mask plan (the T5/UL2 denoising objective's data
    * prep): per document, a DETERMINISTIC mask over token positions —
    * position p masks iff md5(doc_id|p) mod 1000 < 150 (15% rate) — and
    * the span statistics the objective actually consumes: masked count,
    * SPAN count (runs of consecutive masked positions become one sentinel
    * each), and the masked share. Hash-driven masking is what makes the
    * noise reproducible across reruns and engines — a seeded-RNG mask
    * would be neither — and the span/run derivation is one lag() over the
    * per-document window (high-cardinality partitioning). Output rolls up
    * per language: documents, tokens, masked tokens, spans, mask_ppm,
    * mean span length in milli (exact integer DIV). Scale shape: the
    * token explode is scan-side; the window partitions by doc_id; the
    * rollup is language-cardinality with map-side partials.
    */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        posexplode(Text.tokens(Text.normalized(col("text")))).as(Seq("pos", "tok")))
      .withColumn("masked",
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), '|', cast(pos as string))), 1, 8), 16, 10) as long) % 1000 < 150"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = toks
      .withColumn("prev_masked", lag(col("masked"), 1, false).over(w))
      .withColumn("span_start",
        (col("masked") && !col("prev_masked")).cast("long"))
    spans.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("masked").cast("long")).as("n_masked"),
        sum(col("span_start")).as("n_spans"))
      .selectExpr("lang", "n_docs", "n_tokens", "n_masked", "n_spans",
        "(n_masked * 1000000L) DIV n_tokens AS mask_ppm",
        "CASE WHEN n_spans = 0 THEN 0L ELSE (n_masked * 1000L) DIV n_spans END AS mean_span_milli")
      .orderBy(col("lang"))
  }

  /** Vocabulary Gini coefficient per source — how CONCENTRATED a source's
    * token distribution is (0 = every word used equally, →1 = a few words
    * dominate): the single-number "templatedness" score next to q128's
    * top-20 table and q124's diversity, and the ranking that finds
    * boilerplate farms before any dedup runs. Exact integer Gini with NO
    * per-token ranking: tokens with equal count form a tie-group whose
    * rank-weighted mass is x·(k·r₀ + k(k+1)/2) in closed form, so
    * Σ i·x₍ᵢ₎ needs only (source, count) tie-groups — a frame of
    * per-source DISTINCT-count cardinality (hundreds of rows, the Zipf
    * long tail collapses into ONE count=1 group) — ordered by a window
    * over that pre-aggregated summary, never over the vocabulary. Scale
    * shape: one map-side-combined word count (the only corpus-scale
    * shuffle), one vocab→tie-group rollup, one summary-sized window;
    * G = (2·Σi·x − (n+1)·S)·1e6 DIV (n·S) in DECIMAL(38,0).
    */
  def vocabGini(spark: SparkSession, dir: String): DataFrame = {
    val vocab = t(spark, dir, "documents")
      .select(col("source"),
        explode(Text.tokens(Text.normalized(col("text")))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val ties = vocab.groupBy(col("source"), col("c"))
      .agg(count(lit(1)).as("k"))
    val w = Window.partitionBy(col("source")).orderBy(col("c"))
    val ranked = ties
      .withColumn("r0", coalesce(sum(col("k")).over(w) - col("k"), lit(0L)))
      // tie-group rank-weighted mass: x·(k·r0 + k(k+1)/2), exact
      .withColumn("gmass", expr(
        "CAST(c AS DECIMAL(38,0)) * (CAST(k AS DECIMAL(38,0)) * r0 + (CAST(k AS DECIMAL(38,0)) * (k + 1)) DIV 2)"))
    ranked.groupBy(col("source"))
      .agg(sum(col("k")).as("n_tokens"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * k")).as("s_occ"),
        sum(col("gmass")).as("rix"))
      .selectExpr("source", "n_tokens",
        "CAST(s_occ AS BIGINT) AS total_occurrences",
        """CAST((2 * rix - (CAST(n_tokens AS DECIMAL(38,0)) + 1) * s_occ) * 1000000
          | DIV (CAST(n_tokens AS DECIMAL(38,0)) * s_occ) AS BIGINT) AS gini_ppm"""
          .stripMargin.replaceAll("\n", " "))
      .orderBy(col("source"))
  }

  /** Winsorized means per event type — the robust-statistics member of the
    * monitoring family: the raw mean next to the mean with values clamped
    * to the exact [p5, p95] inverse-ECDF bounds, in integer milli-cents.
    * When the two disagree, the metric is tail-driven (one whale order, a
    * bad sensor) and q162's slope on raw means is not trustworthy — this
    * is the check that says so. Exactness: bounds are discrete
    * inverse-ECDF cuts (smallest value whose cumulative count reaches
    * ⌈n·p/100⌉ — integer ceiling DIV), money goes through DECIMAL(18,2)
    * cents, every mean is an integer DIV. Scale shape: one map-side
    * (type, cents) rollup; the cumulative window runs over DISTINCT-value
    * summary rows per type, never raw events; bounds and totals broadcast
    * back onto the value table for the clamped re-sum.
    */
  def winsorizedMeans(spark: SparkSession, dir: String): DataFrame = {
    val byVal = t(spark, dir, "events")
      .select(col("event_type"), (dec2(col("value")) * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("k"))
    val totals = byVal.groupBy(col("event_type"))
      .agg(sum(col("k")).as("n"), sum(expr("c * k")).as("s"))
    val cum = byVal
      .withColumn("cum", sum(col("k")).over(
        Window.partitionBy(col("event_type")).orderBy(col("c"))))
      .join(broadcast(totals), "event_type")
    val bounds = cum.groupBy(col("event_type"))
      .agg(min(when(expr("cum >= (n * 5 + 99) DIV 100"), col("c"))).as("lo"),
        min(when(expr("cum >= (n * 95 + 99) DIV 100"), col("c"))).as("hi"))
    byVal.join(broadcast(bounds), "event_type")
      .join(broadcast(totals), "event_type")
      .groupBy(col("event_type"), col("n"), col("s"), col("lo"), col("hi"))
      .agg(sum(expr("greatest(least(c, hi), lo) * k")).as("ws"))
      .selectExpr("event_type", "n", "lo AS lo_cents", "hi AS hi_cents",
        "(1000L * s) DIV n AS mean_millicents",
        "(1000L * ws) DIV n AS win_mean_millicents")
      .orderBy(col("event_type"))
  }

  /** Burstiness (Fano factor) of each event type's daily arrivals:
    * variance-to-mean of the per-day counts over the DENSE day range —
    * 1000 milli ≈ Poisson, above = bursty/clumped (retry storms, batch
    * replays), below = rate-limited. The dispersion companion to q162's
    * slope (a flat mean can hide a bursty process) — and the day grid is
    * deliberately dense from in-plan min/max bounds (q88's pattern): a
    * type's silent days are exactly the burstiness signal a sparse
    * rollup would silently drop. All-integer: F_milli =
    * 1000·(n·Σx²−S²) DIV (n·S) with products in DECIMAL(38,0). Scale:
    * one map-side (type, day) rollup; the dense grid is types × days
    * (tiny); sufficient statistics aggregate map-side.
    */
  def fanoFactor(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), coalesce(col("x"), lit(0L)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .selectExpr("event_type", "n_days", "s AS total_events",
        "(1000L * s) DIV n_days AS mean_milli",
        ("CAST(CASE WHEN s = 0 THEN 0 ELSE " +
          "(1000 * (CAST(n_days AS DECIMAL(38,0)) * sxx - CAST(s AS DECIMAL(38,0)) * s)) " +
          "DIV (CAST(n_days AS DECIMAL(38,0)) * s) END AS BIGINT) AS fano_milli"))
      .orderBy(col("event_type"))
  }

  /** Kaplan–Meier retention survival curve — the product-limit estimator
    * over user churn (last event day = churn; users active on the final
    * observed day are CENSORED, the distinction that separates KM from a
    * naive "active share" and q116's cohort matrix): per day, users at
    * risk, churned, and S(t) = Π (1 − dⱼ/nⱼ) in EXACT integer ppm — each
    * step is acc·(n−d) DIV n, so the curve replays bit-for-bit (a float
    * product would drift and the true rational explodes past 38 digits at
    * 30 steps). Spark computes the prefix products with one nested-HOF
    * fold over the collected ≤|days| summary array; the oracle replays
    * the identical stepwise sequence with a recursive CTE. Scale shape:
    * the only corpus-scale work is the per-user last-day rollup (narrow
    * shuffle by user); everything after runs on the days-cardinality
    * summary — the survival fold is driver-free but operates on one
    * broadcast-sized row.
    */
  def kmRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val lastDay = days.groupBy(col("user_id")).agg(max(col("day")).as("ld"))
    val bounds = days.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val churn = lastDay.crossJoin(broadcast(bounds))
      .filter(col("ld") < col("hi")) // final-day users are censored, not churned
      .groupBy(col("ld").as("day")).agg(count(lit(1)).as("d"))
    val totals = lastDay.agg(count(lit(1)).as("nu"))
    val dense = bounds.select(explode(expr("sequence(lo, hi)")).as("day"))
      .join(churn, Seq("day"), "left")
      .select(col("day"), coalesce(col("d"), lit(0L)).as("d"))
      .crossJoin(broadcast(totals))
      .withColumn("cum_before", coalesce(sum(col("d")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("d"), (col("nu") - col("cum_before")).as("n"))
    dense
      .agg(sort_array(collect_list(struct(col("day"), col("d"), col("n")))).as("a"))
      .select(explode(expr(
        """transform(sequence(1, size(a)), i ->
          |  struct(a[i-1].day AS day, a[i-1].n AS n, a[i-1].d AS d,
          |    aggregate(slice(a, 1, i), 1000000L,
          |      (acc, s) -> CASE WHEN s.n = 0 THEN acc
          |                       ELSE (acc * (s.n - s.d)) DIV s.n END) AS surv))"""
          .stripMargin)).as("s"))
      .select(col("s.day").as("day"), col("s.n").as("n_at_risk"),
        col("s.d").as("n_churned"), col("s.surv").as("survival_ppm"))
      .orderBy(col("day"))
  }

  /** Blocked fuzzy-match audit (entity resolution): customer names
    * self-joined WITHIN 16-char-prefix blocks and matched at Levenshtein
    * ≤ 1 — the classic ER pipeline shape (block → bounded quadratic
    * compare → adjudicate) that finds typo'd / re-keyed duplicate
    * entities exact dedup (q13) misses and MinHash (q28) is
    * wrong-grained for (edit distance on short keys, not shingle
    * Jaccard on documents). Per block: records, compared pairs, matches,
    * match rate ppm. Scale discipline: ALL quadratic work is inside a
    * block — the block key bounds the join fan-out exactly like the LSH
    * bucket caps (an unblocked fuzzy join is a corpus² nested loop);
    * `levenshtein` is an exact integer both engines implement
    * identically, which is what puts a fuzzy-match operator under a
    * bit-for-bit oracle at all.
    */
  def fuzzyNameAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("nm"))
      .withColumn("blk", substring(col("nm"), 1, 16))
    val sizes = c.groupBy(col("blk")).agg(count(lit(1)).as("n_records"))
    val agg = c.as("a")
      .join(c.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.blk").as("blk"),
        (levenshtein(col("a.nm"), col("b.nm")) <= 1).cast("long").as("m"))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("m")).as("n_matches"))
    sizes.join(agg, Seq("blk"), "left")
      .selectExpr("blk AS block", "n_records",
        "coalesce(n_pairs, 0L) AS n_pairs",
        "coalesce(n_matches, 0L) AS n_matches",
        "CASE WHEN coalesce(n_pairs, 0L) = 0 THEN 0L " +
          "ELSE (coalesce(n_matches, 0L) * 1000000L) DIV n_pairs END AS match_ppm")
      .orderBy(col("block"))
  }

  /** Order-to-ship lead time per order priority: exact median / p90 / max
    * of (ship date − order date) in days — the fulfilment-SLA table, and
    * the operational-analytics face of the warehouse's biggest join
    * (lineitem ⋈ orders on the order key, the shuffle that bucketing
    * (`sources.Bucketing`) exists to eliminate). Percentiles are the
    * discrete inverse-ECDF cuts (q169's definition: smallest value whose
    * cumulative count reaches ⌈n·p/100⌉), computed over per-(priority,
    * days) DISTINCT-value summaries — the corpus never enters a window.
    * Day arithmetic is integer datediff on both engines.
    */
  def leadTime(spark: SparkSession, dir: String): DataFrame = {
    val lags = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
    val byVal = lags.groupBy(col("priority"), col("days"))
      .agg(count(lit(1)).as("k"))
    val totals = byVal.groupBy(col("priority"))
      .agg(sum(col("k")).as("n"), max(col("days")).as("max_days"))
    val cum = byVal
      .withColumn("cum", sum(col("k")).over(
        Window.partitionBy(col("priority")).orderBy(col("days"))))
      .join(broadcast(totals), "priority")
    cum.groupBy(col("priority"), col("n"), col("max_days"))
      .agg(min(when(expr("cum >= (n * 50 + 99) DIV 100"), col("days"))).as("median_days"),
        min(when(expr("cum >= (n * 90 + 99) DIV 100"), col("days"))).as("p90_days"))
      .select(col("priority"), col("n").as("n_lineitems"),
        col("median_days"), col("p90_days"), col("max_days"))
      .orderBy(col("priority"))
  }

  /** Price–volume–mix variance bridge per brand: the FP&A decomposition of
    * revenue change between two periods (orders before vs after
    * 1998-01-01) into volume-at-old-price, price, and a mix/interaction
    * residual, with new and discontinued parts as their own legs — and
    * the residual defined as ΔR − volume − price, so the bridge RECONCILES
    * EXACTLY by construction (the spec pins per-brand conservation to the
    * micro-cent; a float bridge never ties out, which is why finance
    * teams distrust them). All money in integer cents through
    * DECIMAL(18,2); per-part divisions are sign-explicit with DECIMAL
    * products. Scale shape: one lineitem⋈orders⋈part pass, a per-(brand,
    * part) rollup (map-side partials on the high-card part key), effects
    * as projections, then a brands-cardinality rollup.
    */
  def varianceBridge(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_partkey").as("pk"),
        when(col("o_orderdate") < lit("1998-01-01"), "a").otherwise("b").as("period"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("r"),
        (dec2(col("l_quantity")) * 100).cast("long").as("q"))
    val perPart = li.groupBy(col("brand"), col("pk")).agg(
      sum(when(col("period") === "a", col("r")).otherwise(0L)).as("r1"),
      sum(when(col("period") === "b", col("r")).otherwise(0L)).as("r2"),
      sum(when(col("period") === "a", col("q")).otherwise(0L)).as("q1"),
      sum(when(col("period") === "b", col("q")).otherwise(0L)).as("q2"))
    val effects = perPart.selectExpr("brand", "r1", "r2", "q1", "q2",
      "CASE WHEN q1 > 0 AND q2 > 0 THEN 1L ELSE 0L END AS is_both",
      """CASE WHEN q1 > 0 AND q2 > 0 THEN
        |  CASE WHEN q2 >= q1
        |    THEN CAST((CAST(q2 - q1 AS DECIMAL(38,0)) * r1) DIV q1 AS BIGINT)
        |    ELSE -CAST((CAST(q1 - q2 AS DECIMAL(38,0)) * r1) DIV q1 AS BIGINT) END
        |ELSE 0L END AS vol_e""".stripMargin.replaceAll("\n", " "),
      """CASE WHEN q1 > 0 AND q2 > 0
        |  THEN CAST((CAST(r2 AS DECIMAL(38,0)) * q1) DIV q2 AS BIGINT) - r1
        |ELSE 0L END AS price_e""".stripMargin.replaceAll("\n", " "))
      .selectExpr("brand", "is_both", "vol_e", "price_e",
        "CASE WHEN is_both = 1 THEN (r2 - r1) - vol_e - price_e ELSE 0L END AS mix_e",
        "CASE WHEN q1 = 0 THEN r2 ELSE 0L END AS new_rev",
        "CASE WHEN q2 = 0 THEN r1 ELSE 0L END AS disc_rev",
        "r2 - r1 AS delta")
    effects.groupBy(col("brand"))
      .agg(sum(col("is_both")).as("n_parts_both"),
        sum(col("delta")).as("delta_cents"),
        sum(col("vol_e")).as("volume_cents"),
        sum(col("price_e")).as("price_cents"),
        sum(col("mix_e")).as("mix_cents"),
        sum(col("new_rev")).as("new_cents"),
        sum(col("disc_rev")).as("discontinued_cents"))
      .orderBy(col("brand"))
  }

  /** Part-affinity market basket: the top 20 part PAIRS co-ordered in the
    * same order, ranked by lift with a minimum-support floor — q158's
    * association analysis moved to the scale regime that actually bites:
    * a high-cardinality item space (pair universe = |parts|²) made
    * tractable because pair GENERATION is bounded by basket size, not the
    * catalog — the within-order self-join emits C(basket, 2) rows per
    * order and baskets are small by construction (the itemset-mining
    * contract; cap baskets for pathological orders). The support floor
    * (n_ab ≥ 3) is what keeps one-off coincidences from topping the lift
    * ranking — lift with tiny support is noise, the classic market-basket
    * trap. Marginals broadcast; lift in DECIMAL/HUGEINT ppm; the final
    * cut is TakeOrderedAndProject.
    */
  def partAffinity(spark: SparkSession, dir: String): DataFrame = {
    val items = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val marg = items.groupBy(col("pk")).agg(count(lit(1)).as("n_p"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pairs
      .join(marg.select(col("pk").as("part_a"), col("n_p").as("n_a")), "part_a")
      .join(marg.select(col("pk").as("part_b"), col("n_p").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .selectExpr("part_a", "part_b", "n_ab",
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000) DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_ppm")
      .orderBy(col("lift_ppm").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Cohort LTV matrix: cumulative purchase revenue per signup cohort by
    * account age — q116's retention matrix with MONEY on it, the table
    * that says whether later cohorts monetize faster (the payback-period
    * chart every growth team reads). Cohort = a user's first event day;
    * age = purchase day − cohort day; revenue in exact integer cents
    * (DECIMAL(18,2)); the cumulative runs per cohort over the
    * ages-cardinality rollup — a pre-aggregated summary window, never
    * events. Scale shape: one per-user min-day rollup, one join back by
    * user (narrow), one (cohort, age) map-side rollup.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        col("event_type"), (dec2(col("value")) * 100).cast("long").as("cents"))
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val cells = days.filter(col("event_type") === "purchase")
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("rev_cents"))
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(
        Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))))
      .orderBy(col("cohort_day"), col("age_days"))
  }

  /** Inter-purchase cadence: the repeat-purchase rate and the exact
    * median/p90 gap in days between a user's consecutive purchases — the
    * replenishment-cycle card that q171's survival curve needs as context
    * (churn judgments are meaningless without the natural purchase
    * cadence). Gaps come from one lag() over the per-user window
    * (high-cardinality partitioning); percentiles are the q169 discrete
    * inverse-ECDF cuts over the distinct-gap summary; rates are integer
    * ppm. One summary row out.
    */
  def purchaseCadence(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
    val gaps = p
      .withColumn("prev", lag(col("ts_us"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))))
      .filter(col("prev").isNotNull)
      .select(expr("(ts_us - prev) div 86400000000").as("gap_days"))
    val users = p.groupBy(col("user_id")).agg(count(lit(1)).as("np"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("np") >= 2, 1L).otherwise(0L)).as("n_repeat"))
    val byGap = gaps.groupBy(col("gap_days")).agg(count(lit(1)).as("k"))
    val tot = byGap.agg(sum(col("k")).as("n_gaps"))
    val cuts = byGap
      .withColumn("cum", sum(col("k")).over(Window.orderBy(col("gap_days"))))
      .crossJoin(broadcast(tot))
      .agg(min(when(expr("cum >= (n_gaps * 50 + 99) DIV 100"), col("gap_days")))
          .as("median_gap_days"),
        min(when(expr("cum >= (n_gaps * 90 + 99) DIV 100"), col("gap_days")))
          .as("p90_gap_days"))
    users.crossJoin(broadcast(tot)).crossJoin(broadcast(cuts))
      .selectExpr("n_users", "n_repeat",
        "(n_repeat * 1000000L) DIV n_users AS repeat_ppm",
        "n_gaps", "median_gap_days", "p90_gap_days")
  }

  /** Cross-modal coverage audit: referential integrity between the text
    * corpus and its embedding table — documents with no vector (the
    * encoder skipped or crashed on them), vectors with no document
    * (stale embeddings surviving a corpus re-release), and per-language
    * coverage ppm. This is q16's null-audit discipline applied ACROSS
    * modalities, and the gate every embedding consumer (q30/q53/q91/
    * q136) silently assumes passed — a biased skip pattern (e.g. the
    * encoder failing on one language's long documents) poisons every
    * downstream similarity result while each table looks healthy alone.
    * Two anti-join counts plus a per-language left-join rollup; ids only
    * shuffle.
    */
  def modalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val e = t(spark, dir, "embeddings").select(col("vec_id"))
    val covered = d.join(e, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("n_embedded"))
      .selectExpr("lang", "n_docs", "n_embedded",
        "(n_embedded * 1000000L) DIV n_docs AS coverage_ppm")
    val orphanVecs = e.join(d, col("vec_id") === col("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
    covered.crossJoin(broadcast(orphanVecs.selectExpr("n AS orphan_vectors")))
      .orderBy(col("lang"))
  }

  /** RFM segmentation (recency / frequency / monetary quintiles): every
    * purchasing user scored on three axes and the 5×5×5 segment grid
    * reported with population and revenue — the CRM workhorse that drives
    * win-back and VIP targeting. The quintile assignment is VALUE-BASED,
    * not ntile: bucket = ((cum_users_through_value − 1)·5) DIV n over the
    * per-metric DISTINCT-value cumulative — ties share a bucket (a
    * determinism ntile doesn't give without an arbitrary tiebreak), the
    * cumulative runs over distinct-value summaries instead of one global
    * user sort (ntile over 1e9 users is a single-reducer sort — the hot
    * shape this repo bans), and the result replays bit-for-bit. The
    * monetary summary is itself ~#purchasers distinct values, so its
    * cumulative goes through [[graft.ops.Relational.shardedCumSum]]'s
    * value-range sharding (recency/frequency ride the same path for
    * uniformity): only the ≤257-row slice summary ever takes an
    * unpartitioned window. Scale shape: one per-user rollup (narrow
    * shuffle by user), three sharded cumulative frames joined back BY
    * VALUE, one ≤125-cell rollup.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
    val maxDay = p.agg(max(col("day")).as("mx"))
    // one per-user rollup feeds FIVE consumers (the population scalar,
    // three quintile summaries, the final scoring joins): materialize it
    // once or the events scan+rollup re-derives per consumer
    val users = graft.functions.Graph.materialize(
      p.crossJoin(broadcast(maxDay))
        .groupBy(col("user_id"))
        .agg(min(expr("mx - day")).as("recency"),
          count(lit(1)).as("frequency"), sum(col("cents")).as("monetary")),
      spark.conf.getOption("spark.graft.checkpoint.dir"))
    def quintile(metric: String): DataFrame = {
      val byVal = users.groupBy(col(metric).as("v")).agg(count(lit(1)).as("k"))
      graft.ops.Relational.shardedCumSum(byVal, "v", Seq("k"), ascending = true)
        .crossJoin(broadcast(users.agg(count(lit(1)).as("n"))))
        .selectExpr(s"v AS $metric", s"((cum_k - 1) * 5) DIV n AS ${metric}_q")
    }
    users
      .join(broadcast(quintile("recency")), "recency")
      .join(broadcast(quintile("frequency")), "frequency")
      .join(broadcast(quintile("monetary")), "monetary")
      // low recency is GOOD: invert so 4 = most recent, matching f/m polarity
      .selectExpr("4 - recency_q AS r_score", "frequency_q AS f_score",
        "monetary_q AS m_score", "monetary")
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("monetary")).as("revenue_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Pareto revenue concentration: the exact share of order revenue held
    * by the top 1/5/10/20/50% of customers — the 80/20 card that q168's
    * Gini summarizes into one number, here as the actionable table
    * (VIP-program sizing, concentration-risk reporting). Exactness at the
    * boundary: customers tied at the cut all carry the SAME revenue
    * value, so the top-n revenue is cum-before + (n_top − users_before)·v
    * regardless of which tied customers are "in" — no tiebreak needed and
    * no per-customer ranking: the cumulative runs DESC over the
    * distinct-revenue summary (q168's tie-group discipline). That summary
    * is ~#customers distinct cent values, so both running totals go
    * through [[graft.ops.Relational.shardedCumSum]]'s value-range
    * sharding — only the ≤257-row slice summary takes an unpartitioned
    * window, never the per-customer frame. Thresholds are a 5-row literal
    * frame, and n_top = ⌈n·k/100⌉ in integer ceiling DIV. One
    * per-customer rollup touches the orders table; money in DECIMAL cents
    * throughout.
    */
  def paretoConcentration(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((dec2(col("o_totalprice")) * 100).cast("long")).as("v"))
    val byVal = perCust.groupBy(col("v")).agg(count(lit(1)).as("k"))
    val totals = perCust.agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
    val cum = graft.ops.Relational.shardedCumSum(
        byVal.withColumn("vk", expr("v * k")), "v", Seq("k", "vk"),
        ascending = false)
      .withColumnRenamed("cum_k", "users_through")
      .withColumnRenamed("cum_vk", "rev_through")
      .withColumn("users_before", col("users_through") - col("k"))
      .withColumn("rev_before", col("rev_through") - col("vk"))
    val thresholds = spark.sql(
      "SELECT explode(array(1L, 5L, 10L, 20L, 50L)) AS pct")
    thresholds.crossJoin(broadcast(totals))
      .withColumn("n_top", expr("(n * pct + 99) DIV 100"))
      .join(cum, expr("users_before < n_top AND n_top <= users_through"))
      .selectExpr("pct", "n_top AS n_top_customers",
        "rev_before + (n_top - users_before) * v AS revenue_cents",
        "((rev_before + (n_top - users_before) * v) * 1000000L) DIV tot AS share_ppm")
      .orderBy(col("pct"))
  }

  /** Stationary distribution of the q159 journey chain, next to the
    * observed event-type mix: power iteration on the within-session
    * transition matrix — [[graft.functions.Graph.pageRankInt]] at damping
    * 100 IS the pure Markov step r·P in the same exact-integer fixed
    * point (self-loops kept: they are real journey mass, unlike in link
    * analysis) — versus each type's observed share. When the two
    * disagree, the process is NOT stationary: the observed mix is
    * entry/exit-driven (burst signups, error storms at session ends) and
    * any "steady state" capacity plan read off raw shares is wrong. The
    * chain is alphabet-sized, so iteration cost is trivial; the ranks
    * replay bit-for-bit via q101's unrolled-CTE oracle pattern.
    */
  def journeyStationary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The chain is ALPHABET-sized (≤ event-type² cells), so the power
    // iteration is a driver-side model fit — the Kmeans/Pca/PQ-codebook
    // division of labor: the cluster does the one corpus-scale pass (the
    // transition rollup), the driver iterates the tiny matrix, and the
    // learned ranks broadcast back as a literal frame. Identical integer
    // math to [[graft.functions.Graph.pageRankInt]] at damping 100
    // (per-edge truncating contrib, inflow-only update), which q101
    // keeps exercising distributed where the graph is host-scale.
    // Replaces 8 distributed rounds of pure per-job overhead
    // (4.4s → sub-second at sf0.1; bit-identical output).
    val cells = transitionMatrix(spark, dir)
      .select(col("from_type"), col("to_type"), col("n_transitions"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val hosts = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val ow = cells.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val base = 1000000000L / hosts.length
    var r = hosts.map(_ -> base).toMap
    for (_ <- 1 to 8) {
      val inflow = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      cells.foreach { case (s, d, w) =>
        inflow(d) += r(s) * w / ow(s)
      }
      r = hosts.map(h => h -> inflow(h)).toMap
    }
    val ranks = hosts.map(h => (h, r(h))).toSeq.toDF("host", "rank")
    val obs = t(spark, dir, "events")
      .groupBy(col("event_type").as("host")).agg(count(lit(1)).as("n_events"))
    val tot = obs.agg(sum(col("n_events")).as("te"))
    obs.join(broadcast(ranks), "host").crossJoin(broadcast(tot))
      .selectExpr("host AS event_type",
        "rank DIV 1000 AS stationary_ppm",
        "n_events",
        "(n_events * 1000000L) DIV te AS observed_ppm")
      .selectExpr("event_type", "stationary_ppm", "n_events", "observed_ppm",
        "stationary_ppm - observed_ppm AS gap_ppm")
      .orderBy(col("event_type"))
  }

  /** Regional market share (the TPC-H Q8 shape on this star): each
    * customer nation's share of discounted lineitem revenue within its
    * region, per order year — the market-share card a commercial analytics
    * deployment refreshes per release. Money integerizes at scale 4
    * (DECIMAL(18,2)×DECIMAL(18,2) is exact at scale 4, so ×10000 → BIGINT
    * loses nothing and replays bit-for-bit in any engine); shares are
    * integer ppm of the region-year total. Scale shape: two id-keyed
    * shuffles (orderkey, custkey) carry only ids + the revenue long;
    * nation/region broadcast onto the customer projection; the rollup is
    * regions × years × nations with map-side partials, and the region-year
    * totals re-join as a broadcast summary.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val dims = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name").as("nation"), col("r_name").as("region"))
    val ord = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).cast("long").as("yr"))
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"),
      (dec2(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))) * 10000)
        .cast("long").as("rev_sc4"))
    // the cells rollup feeds both the output and the region-year totals;
    // a materialization seam here measured SLOWER (1.0 -> 1.4s at sf0.1):
    // the duplicated fact subtrees dedupe through runtime exchange reuse,
    // so the checkpoint only added overhead — left on the reuse path.
    val cells = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("region"), col("yr"), col("nation"))
      .agg(sum(col("rev_sc4")).as("rev"))
    val regionYear = cells.groupBy(col("region"), col("yr"))
      .agg(sum(col("rev")).as("rtot"))
    cells.join(broadcast(regionYear), Seq("region", "yr"))
      .selectExpr("region", "yr", "nation", "rev AS revenue_sc4",
        "(rev * 1000000L) DIV rtot AS share_ppm")
      .orderBy(col("region"), col("yr"), col("nation"))
  }

  /** Waiting-supplier audit (the TPC-H Q21 shape, correlated EXISTS /
    * NOT EXISTS): suppliers who were the SOLE late shipper on a
    * multi-supplier order — their line shipped more than 60 days after
    * the order date while every other supplier on the order shipped in
    * time. The correlated-subquery form decorrelates into ONE per-order
    * aggregate: per (order, supplier) a late flag, per order the supplier
    * and late-supplier counts, then the credit filter is a row predicate —
    * no EXISTS re-scan of lineitem per row, which is the difference
    * between O(n) and O(n²) at fact scale. Output ends in the
    * TakeOrdered top-10.
    */
  def supplierWait(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    // the per-(order, supplier) flags feed the per-order rollup AND the
    // credit join: materialize once (one fact join instead of two)
    val perSupp = graft.functions.Graph.materialize(
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 60)
            .cast("long").as("late"))
        .groupBy(col("ok"), col("sk"))
        .agg(max(col("late")).as("any_late")),
      spark.conf.getOption("spark.graft.checkpoint.dir"))
    val perOrder = perSupp.groupBy(col("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("any_late")).as("n_late"))
    perSupp.join(perOrder, "ok")
      .filter(col("any_late") === 1L && col("n_supp") > 1L && col("n_late") === 1L)
      .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Freshness / lag monitor: per event type, the last-seen event time,
    * its lag behind the stream head, active-day coverage and the mean
    * daily rate — the staleness dashboard a pipeline owner checks before
    * trusting any downstream table (a type whose lag exceeds its arrival
    * cadence has silently stopped flowing; SURVEY §2B's dataflow-health
    * plane extended to per-type granularity). One map-side-combined pass
    * over events; the stream head joins back as an in-plan broadcast
    * scalar. All integers (epoch micros / day counts / DIV rates).
    */
  def freshnessLag(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").select(col("event_type"),
      expr("ts div 1000").as("ts_us"), expr("ts div 86400000000000").as("day"))
    val per = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_events"),
      max(col("ts_us")).as("last_ts_us"),
      countDistinct(col("day")).as("n_days_active"))
    val head = e.agg(max(col("ts_us")).as("head_us"))
    per.crossJoin(broadcast(head))
      .selectExpr("event_type", "n_events", "n_days_active",
        "head_us - last_ts_us AS lag_us",
        "n_events DIV n_days_active AS events_per_active_day")
      .orderBy(col("event_type"))
  }

  /** Revenue-decile migration matrix: every purchaser's spend quintile in
    * the FIRST half of the observed window versus the SECOND half — the
    * churn/upsell mobility table (how much of the top quintile stays top,
    * how much decays to zero) that sits one step past q179's static RFM
    * grid. Halves split at the calendar midpoint (an in-plan broadcast
    * scalar); users absent from a half carry spend 0 and land in the
    * bottom bucket with all other zeros — ties share a bucket by
    * construction. Both quintile assignments are VALUE-BASED cumulatives
    * over distinct-spend summaries through
    * [[graft.ops.Relational.shardedCumSum]] (the q179 discipline: only
    * slice summaries take unpartitioned windows). Scale shape: one
    * per-user conditional rollup, two sharded cumulative frames joined
    * back BY VALUE, one ≤25-cell rollup.
    */
  def decileMigration(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
    val mid = p.agg(expr("min(day) + (max(day) - min(day) + 1L) DIV 2").as("mid"))
    // four consumers (population scalar, two quintile summaries, the
    // final joins) share one per-user rollup: materialize it (q179's seam)
    val users = graft.functions.Graph.materialize(
      p.crossJoin(broadcast(mid))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < col("mid"), col("cents")).otherwise(0L)).as("v1"),
          sum(when(col("day") >= col("mid"), col("cents")).otherwise(0L)).as("v2")),
      spark.conf.getOption("spark.graft.checkpoint.dir"))
    val n = users.agg(count(lit(1)).as("n"))
    def quintile(metric: String): DataFrame = {
      val byVal = users.groupBy(col(metric).as("v")).agg(count(lit(1)).as("k"))
      graft.ops.Relational.shardedCumSum(byVal, "v", Seq("k"), ascending = true)
        .crossJoin(broadcast(n))
        .selectExpr(s"v AS $metric", s"((cum_k - 1) * 5) DIV n AS ${metric}_q")
    }
    users
      .join(broadcast(quintile("v1")), "v1")
      .join(broadcast(quintile("v2")), "v2")
      .groupBy(col("v1_q").as("first_half_q"), col("v2_q").as("second_half_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("v2") - col("v1")).as("delta_cents"))
      .orderBy(col("first_half_q"), col("second_half_q"))
  }

  /** Integer-EWMA anomaly bands over the per-type daily event series: each
    * day scored against the exponentially-weighted mean of everything
    * BEFORE it (α = 1/8 as an integer shift-divide, micro-scaled), flagged
    * when it deviates more than 50% — the ops anomaly monitor that q162's
    * OLS slope can't express because the smoothing is a sequential
    * recurrence, not an aggregate. Exact arithmetic: E_t = E_{t−1} +
    * sgn-DIV(x_t·1e6 − E_{t−1}, 8) with E_1 = x_1·1e6 — truncation is
    * sign-explicit so the fold replays bit-for-bit against the oracle's
    * recursive CTE. Scale shape: the corpus collapses to (type, day)
    * summaries with map-side partials FIRST; the recurrence then runs as
    * a per-type prefix fold over the collected day array (q171's
    * sequential-fold discipline — the array is calendar-bounded, never
    * corpus-sized; the O(days²) prefix slices are ~10⁵ integer ops per
    * type at a decade of history).
    */
  def ewmaAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val arrs = daily.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("arr"))
    arrs.select(col("event_type"), col("arr"), posexplode(col("arr")))
      .withColumn("ewma_prev_micro", expr(
        """aggregate(slice(arr, 2, greatest(pos - 1, 0)),
          |  CAST(element_at(arr, 1).n * 1000000 AS BIGINT),
          |  (acc, e) -> acc + (CASE WHEN e.n * 1000000 - acc >= 0
          |    THEN (e.n * 1000000 - acc) DIV 8
          |    ELSE -((acc - e.n * 1000000) DIV 8) END))""".stripMargin))
      .selectExpr("event_type", "col.day AS day", "col.n AS n",
        "ewma_prev_micro",
        "CAST(CASE WHEN abs(col.n * 1000000 - ewma_prev_micro) * 2 > ewma_prev_micro" +
          " THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly")
      .orderBy(col("event_type"), col("day"))
  }

  /** Core strength of the near-dup graph ([[graft.functions.Graph.kCore]]
    * peeling over q28's candidate pairs): surviving vertex/edge counts of
    * the 2-core and 3-core — the template-farm detector one level past
    * q161's triangle census. A 2-core is any cycle mass (chains of
    * re-crawls peel away entirely); a 3-core only survives densely
    * cross-linked boilerplate, the structure that tells a dedup owner
    * whether q60's transitive merging is collapsing genuine families or
    * bridged accidents. The peel runs to FIXPOINT (safety cap 64 — a
    * fixed low round count truncates long chains, the r13 ADVICE fix);
    * the oracle's 8-round unrolled CTE still replays it bit-for-bit
    * because peeling is monotone (rounds past the fixpoint are no-ops)
    * and the measured fixpoint on every gate SF is ≤ 2 rounds — GraphSpec
    * pins the long-chain behavior the unroll can't see. Counts stay
    * in-plan as 1-row aggregates.
    */
  def dupCoreStrength(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = spark.conf.getOption("spark.graft.checkpoint.dir")
    // one LSH pipeline feeds BOTH peels: materialize the candidate list
    // once, or each kCore call re-derives shingles→minhash→bands
    val pairs = graft.functions.Graph.materialize(
      minhashPairs(spark, dir), ckpt)
    Seq(2, 3).map { k =>
      val core = graft.functions.Graph.kCore(pairs, col("id_a"), col("id_b"),
        k, checkpointDir = ckpt)
      val nodes = core.select(col("a").as("id"))
        .unionAll(core.select(col("b").as("id"))).distinct()
        .agg(count(lit(1)).as("n_core_nodes"))
      core.agg(count(lit(1)).as("n_core_edges"))
        .crossJoin(nodes)
        .select(lit(k.toLong).as("k"), col("n_core_nodes"), col("n_core_edges"))
    }.reduce(_ unionByName _).orderBy(col("k"))
  }

  /** Returned-item revenue report (the TPC-H Q10 shape): the 20 customers
    * who cost the most in returned-line revenue (l_returnflag = 'R'),
    * with their nation — the churn-risk escalation list. Money at exact
    * scale 4 (the q182 discipline); the customer join is id-keyed AFTER
    * the per-customer rollup so only (custkey, revenue) pairs shuffle to
    * meet the dim, and the final cut is TakeOrdered (per-partition top-k
    * + merge), never a global sort of the customer base.
    */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val returned = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))) * 10000)
          .cast("long").as("rev_sc4"))
    val perCust = returned
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("rev_sc4")).as("lost_revenue_sc4"))
    perCust
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("lost_revenue_sc4"))
      .orderBy(col("lost_revenue_sc4").desc, col("c_custkey"))
      .limit(20)
  }

  /** Order-priority integrity count (the TPC-H Q4 shape: EXISTS over the
    * fact inside a date window): per order priority, how many orders of
    * one quarter have at least one line shipped more than 30 days after
    * the order date. The correlated EXISTS plans as a LEFT SEMI join of
    * the date-windowed orders against the qualifying lineitem keys —
    * the order scan prunes on the pushed date range, the semi join
    * carries only orderkeys, and the rollup is priority-cardinality with
    * map-side partials.
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-04-01"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val lateLines = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val qualifying = o.join(lateLines,
        col("o_orderkey") === col("l_orderkey") &&
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 30,
        "left_semi")
    qualifying.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Theil–Sen robust daily trend: the MEDIAN of all pairwise day-slopes
    * per event type, next to q162's OLS slope a single outlier day can
    * drag — the robust estimator an ops team trusts through incident
    * spikes (breakdown point 29% vs OLS's 0%). Exactness: slopes stay
    * (num, den) integer fractions; the selection orders by the IEEE
    * quotient (one correctly-rounded division — bit-identical in any
    * engine) with the fraction as tiebreak, and the reported median is
    * sign-explicit integer micros. Scale shape: the corpus collapses to
    * calendar-bounded (type, day) summaries FIRST; the pair frame is a
    * within-type self-join of that summary (C(days,2) rows — bounded by
    * the calendar² regardless of data volume), and the rank window
    * partitions by type over that bounded frame.
    */
  def theilSenSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        (dec2(col("value")) * 1000000).cast("long").as("vmicro"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vmicro")).as("y"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("y").as("y1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("y").as("y2"))
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("d1") < col("d2"))
      .select(col("event_type"), (col("y2") - col("y1")).as("num"),
        (col("d2") - col("d1")).as("den"))
    val ranked = pairs
      .withColumn("s", col("num").cast("double") / col("den").cast("double"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("s"), col("num"), col("den"))))
    val medianIdx = pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"), expr("(count(1) + 1) DIV 2").as("m"))
    ranked.join(medianIdx, "event_type")
      .filter(col("rn") === col("m"))
      .selectExpr("event_type", "n_pairs",
        "CASE WHEN num >= 0 THEN (num * 1000000) DIV den " +
          "ELSE -(((-num) * 1000000) DIV den) END AS theilsen_micro_per_day")
      .orderBy(col("event_type"))
  }

  /** 2-D skyline (Pareto frontier) of the part catalog: every part no
    * other part dominates on (cheaper-or-equal price, larger-or-equal
    * size, one strict) — the "best tradeoffs only" operator behind
    * procurement shortlists and hardware-config pickers. The textbook
    * form is a quadratic NOT-EXISTS self-join (the oracle runs exactly
    * that); the scale path is the classic 2-D reduction to a PREFIX MAX:
    * a part is on the frontier iff its size is the max at its price AND
    * strictly above the running max over all cheaper prices. That
    * running max goes through [[graft.ops.Relational.shardedCumMax]]
    * (same slicing as the cumulative sums — no single-reducer sort of
    * the price summary), the strict-prefix test reduces to
    * first-price-per-cum-level (a ≤size-domain-sized aggregate), and the
    * frontier price list broadcasts back onto the scan. Higher
    * dimensions would grid-partition first; 2-D is exact here.
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part").select(col("p_partkey"),
      (dec2(col("p_retailprice")) * 100).cast("long").as("price_cents"),
      col("p_size").cast("long").as("size"))
    val byPrice = parts.groupBy(col("price_cents").as("v"))
      .agg(max(col("size")).as("ms"))
    val cum = graft.ops.Relational.shardedCumMax(byPrice, "v", Seq("ms"),
      ascending = true)
    // ms == cum_ms: this price achieves the running max; the FIRST price
    // of each cum level is the one that raised it — strictly above every
    // cheaper price's best size. cum levels are bounded by the size
    // domain, so the frontier list is a broadcast.
    val frontier = cum.filter(col("ms") === col("cum_ms"))
    val firstAtLevel = frontier.groupBy(col("cum_ms")).agg(min(col("v")).as("v"))
    val skyPrices = frontier.join(firstAtLevel, Seq("cum_ms", "v"))
      .select(col("v").as("price_cents"), col("ms"))
    parts.join(broadcast(skyPrices), "price_cents")
      .filter(col("size") === col("ms"))
      .select(col("p_partkey"), col("price_cents"), col("size"))
      .orderBy(col("price_cents"), col("p_partkey"))
  }

  /** Explicit GROUPING SETS — the multi-level aggregation surface between
    * q39's ROLLUP and q58's CUBE: exactly the requested levels
    * ((lang, source), (lang), ()) in ONE pass, with `grouping()` flags
    * labeling each row's level (the standard-SQL convention both engines
    * share; rolled-up keys coalesce to 'ALL' so the level structure reads
    * without NULL semantics). Spark plans one Expand over the three
    * levels + a single hash aggregate with map-side partials — 3× the
    * input rows into a bounded-cardinality rollup, the exact cost the
    * operator advertises (and why q36 avoids Expand for N-distinct
    * profiles: THERE the multiplier rode a corpus scan for per-column
    * stats an ordinary aggregate already answers).
    */
  def groupingSetsReport(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents")
      .select(col("lang"), col("source"), col("n_chars"))
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq.empty),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("total_chars"), col("g_lang"), col("g_source"))
      .orderBy(col("g_lang"), col("g_source"), col("lang"), col("source"))
  }

  /** Median/MAD robust outlier census per language: the exact lower
    * median of document length, the median absolute deviation around it,
    * and how many documents sit beyond 3·MAD — the robust twin of q80's
    * z-score outliers (one 10 MB page would drag a mean/stddev fence;
    * the MAD fence doesn't move). Exactness: both medians come from
    * distinct-value cumulative counts (smallest v with cum ≥ (n+1) DIV 2),
    * all integer. Scale shape: document length is a BOUNDED domain (max
    * doc size), so the per-language value summaries are bounded frames
    * regardless of corpus size — the lang-partitioned cumulative windows
    * sort ≤max-length rows each; the corpus itself is touched by two
    * map-side-combined aggregation passes and one final outlier count.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    // (lang, length) pairs feed the population counts, the first median,
    // and the deviation pass: materialize the two-long projection once
    val d = graft.functions.Graph.materialize(
      t(spark, dir, "documents").select(col("lang"), col("n_chars").as("v")),
      spark.conf.getOption("spark.graft.checkpoint.dir"))
    val n = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    def medianOf(df: DataFrame, valueCol: String): DataFrame = {
      val byVal = df.groupBy(col("lang"), col(valueCol).as("v"))
        .agg(count(lit(1)).as("k"))
        .withColumn("cum", sum(col("k")).over(
          Window.partitionBy(col("lang")).orderBy(col("v"))))
      byVal.join(broadcast(n), "lang")
        .filter(col("cum") >= expr("(n + 1L) DIV 2"))
        .groupBy(col("lang")).agg(min(col("v")).as("med"))
    }
    val med = medianOf(d, "v")
    val devs = d.join(broadcast(med), "lang")
      .select(col("lang"), abs(col("v") - col("med")).as("dev"))
    val mad = medianOf(devs, "dev").withColumnRenamed("med", "mad")
    val outliers = devs.join(broadcast(mad), "lang")
      .filter(col("dev") > col("mad") * 3)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_outliers"))
    n.join(med, "lang").join(mad, "lang")
      .join(outliers, Seq("lang"), "left")
      .select(col("lang"), col("n"), col("med").as("median_chars"),
        col("mad").as("mad_chars"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      .orderBy(col("lang"))
  }

  /** Audience overlap via chunked bitmaps: pairwise distinct-user overlap
    * and Jaccard between event types, computed on 32-bit user bitmaps —
    * the "roaring-lite" set representation that makes audience
    * intersection a popcount instead of a distinct-join. Per (type,
    * chunk = user DIV 32) one OR-folded lane; the pair join is chunk-
    * keyed (users/32 narrow rows per type, ~97% smaller than the id
    * list), and |A∩B| = Σ popcount(lanes AND). Lanes stay 32-bit because
    * a 63-bit shift overflows BIGINT in other engines — the portability
    * cap that keeps the oracle exact. Jaccard in integer ppm.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // the bitmap table feeds three consumers (sizes + both join sides):
    // materialize the compressed frame so events scan+fold runs once
    val lanes = graft.functions.Graph.materialize(
      t(spark, dir, "events")
        .select(col("event_type"), expr("user_id DIV 32").as("chunk"),
          expr("shiftleft(1L, CAST(user_id % 32 AS INT))").as("bit"))
        .groupBy(col("event_type"), col("chunk"))
        .agg(expr("bit_or(bit)").as("lanes")),
      spark.conf.getOption("spark.graft.checkpoint.dir"))
    val sizes = lanes.groupBy(col("event_type"))
      .agg(sum(expr("bit_count(lanes)")).as("n_users"))
    val a = lanes.select(col("event_type").as("type_a"), col("chunk"),
      col("lanes").as("la"))
    val b = lanes.select(col("event_type").as("type_b"), col("chunk"),
      col("lanes").as("lb"))
    a.join(b, Seq("chunk")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(expr("bit_count(la & lb)")).as("n_overlap"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n_users").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n_users").as("n_b"))), "type_b")
      .selectExpr("type_a", "type_b", "n_a", "n_b", "n_overlap",
        "(n_overlap * 1000000L) DIV (n_a + n_b - n_overlap) AS jaccard_ppm")
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Sequence-pattern matching over sessions (MATCH_RECOGNIZE-lite): each
    * q19 session becomes an ordered event-initial string and a regex
    * classifies the journey — here "a signup later converts with no error
    * in between" (`S[^E]*P`) and its frustrated twin "signup, then an
    * error before any purchase" (`S[^P]*E`), rolled up per session-start
    * day. This is the row-pattern operator class (SQL MATCH_RECOGNIZE /
    * CEP) the relational plane can't express without it; the string form
    * keeps it engine-portable and the oracle exact. Scale shape: the
    * per-session string is built by ONE collect over the session group
    * (sessions are gap-bounded; the string caps at 512 events — past
    * that, journey classification is meaningless and the cap keeps state
    * bounded), everything else is a day-cardinality rollup. The regexes
    * stay in the Java∩RE2 subset.
    */
  def journeyPatterns(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
    val sess = graft.ops.Events.sessionize(e, col("user_id"), col("ts_us"),
      col("event_id"), 1800000000L)
    val strings = sess
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("start_us"),
        concat_ws("", slice(transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            upper(substring(col("event_type"), 1, 1)).as("c")))),
          x => x.getField("c")), 1, 512)).as("walk"))
    strings
      .groupBy(expr("start_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("walk").rlike("S[^E]*P").cast("long")).as("n_clean_convert"),
        sum(col("walk").rlike("S[^P]*E").cast("long")).as("n_frustrated"))
      .withColumn("clean_convert_ppm",
        expr("(n_clean_convert * 1000000L) DIV n_sessions"))
      .orderBy(col("day"))
  }

  /** EXACT set-similarity join via prefix filtering (the PPJoin family) —
    * the completeness-guaranteed alternative to minhash (q28 can miss
    * pairs; this provably cannot): under one global rare-first token
    * order, any two sets with Jaccard ≥ t MUST share a token within each
    * set's first m − ⌈t·m⌉ + 1 tokens, so candidates come from an
    * equi-join on those prefixes only (at t = 0.65, the rarest ~third)
    * and the exact [[graft.plans.SortedSetJaccard]] merge verifies. The
    * oracle replays the naive all-pairs join, so the test is literally
    * "the pruned join found every pair". Scale shape: the frequency join
    * and the candidate join both move (doc_id, shingle) narrow rows; the
    * per-doc rank window partitions by the high-cardinality doc id; sets
    * enter exactly one verify join keyed by id pairs. Candidate volume is
    * Σ df(prefix-token)² — subquadratic on any Zipfian real corpus where
    * rare tokens are actually rare; THIS synthetic corpus's ~40-word
    * vocabulary makes every shingle hot (its candidate set approaches
    * all-pairs), so the catalog entry runs on a q54-style 1-in-8
    * verification sample to keep the bench honest about the algorithm
    * rather than the fixture.
    */
  def ppjoinExact(spark: SparkSession, dir: String): DataFrame = {
    val sets = t(spark, dir, "documents")
      .filter(col("text").isNotNull && col("doc_id") % 8 === 0)
      .select(col("doc_id"),
        array_sort(array_distinct(Text.charShingles(col("text"), 3))).as("sh"))
      .filter(size(col("sh")) > 0)
    val freq = sets.select(explode(col("sh")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    // rare-first global order (df, s); prefix p = m - ceil(0.75 m) + 1
    val prefixes = sets
      .select(col("doc_id"), size(col("sh")).cast("long").as("m"),
        explode(col("sh")).as("s"))
      .join(freq, "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .filter(col("rk") <= expr("m - (13 * m + 19) DIV 20 + 1"))
      .select(col("doc_id"), col("m"), col("s"))
    // size filter (the other PPJoin prune): J >= t forces t·|a| <= |b|,
    // so wildly different sizes never reach the verify merge
    val cand = prefixes.select(col("doc_id").as("id_a"), col("m").as("ma"), col("s"))
      .join(prefixes.select(col("doc_id").as("id_b"), col("m").as("mb"), col("s")),
        Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        col("mb") * 20 >= col("ma") * 13 && col("ma") * 20 >= col("mb") * 13)
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", graft.plans.TextExpressions
        .sorted_set_jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.65)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Session-gap sensitivity curve: how many sessions (and events per
    * session) the q19 sessionization yields at EVERY candidate gap
    * threshold — from ONE pass over the inter-event gaps, because
    * n_sessions(T) = n_users + #\{gaps > T\}: each user's first event
    * opens a session and every over-threshold gap opens one more. The
    * parameter sweep that normally costs one sessionization per
    * threshold becomes a gap histogram probed five times — the evidence
    * for CHOOSING the 30-minute constant every downstream session query
    * hard-codes. All counts exact; scale shape: one lag window
    * partitioned by the high-cardinality user id, all five thresholds
    * counted in ONE conditional aggregate (no per-threshold pass),
    * unpivoted by `stack`.
    */
  def sessionGapCurve(spark: SparkSession, dir: String): DataFrame = {
    val minutes = Seq(5L, 15L, 30L, 60L, 120L)
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gaps = e.withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val breakCounts = minutes.map(m =>
      sum((col("gap") > m * 60000000L).cast("long")).as(s"b_$m"))
    val breaks = gaps.agg(breakCounts.head, breakCounts.tail: _*)
    val totals = e.agg(count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"))
    breaks.crossJoin(broadcast(totals))
      .selectExpr(s"stack(${minutes.length}, " +
        minutes.map(m => s"${m}L, b_$m").mkString(", ") +
        ") AS (gap_minutes, n_breaks)", "n_events", "n_users")
      .selectExpr("gap_minutes",
        "n_users + n_breaks AS n_sessions",
        "(n_events * 1000L) DIV (n_users + n_breaks) AS events_per_session_milli")
      .orderBy(col("gap_minutes"))
  }

  /** Two-proportion z-test, exact-integer form: do users who arrived in
    * the first half of the window convert (purchase within 7 days of
    * their first event) at a different rate than later arrivals? The
    * squared z-statistic z² = (ca·nb − cb·na)²·N / (na·nb·c·(N−c))
    * evaluates in a FIXED two-step integer-division sequence over
    * DECIMAL(38,0) intermediates (d² ≤ 10³⁶ fits; dividing by na·nb
    * BEFORE multiplying by N keeps every intermediate in range at any
    * population), so both engines truncate identically and the
    * significance verdict (z² > 1.96², i.e. z2_milli > 3841) replays
    * bit-for-bit — no sqrt, no doubles, no libm. The A/B evaluation an
    * experimentation platform runs nightly, minus the floating point.
    * Scale shape: one per-user first-event rollup, one purchase
    * range-check join keyed by user, a 2-row cohort aggregate.
    */
  def abConversionTest(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
    val firstE = e.groupBy(col("user_id")).agg(min(col("ts_us")).as("f"))
    // split on the FIRST-EVENT distribution's midpoint: the raw event-time
    // midpoint leaves the late cohort empty whenever arrivals front-load
    val bounds = firstE.agg(expr("(min(f) + max(f) + 1L) DIV 2").as("mid"))
    val converted = e.filter(col("event_type") === "purchase")
      .join(firstE, "user_id")
      .filter(col("ts_us") >= col("f") &&
        col("ts_us") <= col("f") + lit(7L * 86400000000L))
      .select(col("user_id")).distinct()
      .withColumn("cv", lit(1L))
    val cohorts = firstE.crossJoin(broadcast(bounds))
      .join(converted, Seq("user_id"), "left")
      .groupBy((col("f") < col("mid")).as("early"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("cv"), lit(0L))).as("c"))
    cohorts
      .agg(max(when(col("early"), col("n"))).as("na"),
        max(when(col("early"), col("c"))).as("ca"),
        max(when(!col("early"), col("n"))).as("nb"),
        max(when(!col("early"), col("c"))).as("cb"))
      .selectExpr("na", "ca", "nb", "cb",
        "(ca * 1000000L) DIV na AS rate_a_ppm",
        "(cb * 1000000L) DIV nb AS rate_b_ppm",
        // z² in milli: A = d² DIV (na·nb); z2 = A·1000·N DIV (c·(N−c))
        "CAST((CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)" +
          " * (CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)" +
          " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS DECIMAL(38,0)) AS __A")
      .selectExpr("na", "ca", "nb", "cb", "rate_a_ppm", "rate_b_ppm",
        // degenerate pooled variance (all or none converted): both rates
        // are equal at an extreme, d = 0, z² is 0 by definition
        "CAST(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN 0 " +
          "ELSE __A * 1000 * (na + nb) DIV (CAST(ca + cb AS DECIMAL(38,0))" +
          " * (na + nb - ca - cb)) END AS BIGINT) AS z2_milli")
      .selectExpr("na", "ca", "nb", "cb", "rate_a_ppm", "rate_b_ppm", "z2_milli",
        "CAST(CASE WHEN z2_milli > 3841 THEN 1 ELSE 0 END AS BIGINT) AS is_significant")
  }

  /** Release-merge audit: does a corpus release BRIDGE previously-distinct
    * duplicate clusters? Components are computed over the old half alone
    * (doc_id below the id midpoint) and over the full corpus; old-doc
    * clusters that fuse through new bridge documents show up as the drop
    * in distinct cluster labels among old docs. The structural twin of
    * q108's row-level release diff — row counts can't see that two old
    * families became one — and the audit that decides whether a release
    * forces re-running survivorship (q96) over closed clusters. Scale
    * shape: two CC runs (each the q60 plan, lineage-cut rounds), one
    * id-keyed join of label frames, a 1-row rollup; old labels translate
    * through the join, never via collect.
    */
  def releaseMergeAudit(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = spark.conf.getOption("spark.graft.checkpoint.dir")
    val d = t(spark, dir, "documents")
      .filter(size(Text.shingles(col("text"), 3)) > 0)
    val cut = d.agg(expr("(min(doc_id) + max(doc_id) + 1L) DIV 2").as("mid"))
    val dOld = d.crossJoin(broadcast(cut)).filter(col("doc_id") < col("mid"))
    def cc(docs: DataFrame): DataFrame =
      Dedup.connectedComponents(
        Dedup.minHashCandidates(docs, col("doc_id"), col("text"),
          shingleK = 3, bands = 2, rowsPerBand = 2),
        checkpointDir = ckpt)
    val before = cc(dOld).withColumnRenamed("cluster", "c_before")
    val after = cc(d).withColumnRenamed("cluster", "c_after")
    // old docs only: new docs may ADD clusters; the merge signal lives in
    // how many distinct labels the old population keeps. Two separate
    // distinct aggregates (q36's no-Expand discipline) over the
    // materialized join; docs first clustered only AFTER the release are
    // intentionally out of scope (they are new structure, not merges).
    val joined = graft.ops.Relational.materialize(
      before.join(after, "id"), ckpt)
    joined.agg(count(lit(1)).as("n_old_clustered_docs"))
      .crossJoin(joined.select(col("c_before")).distinct()
        .agg(count(lit(1)).as("n_clusters_before")))
      .crossJoin(joined.select(col("c_after")).distinct()
        .agg(count(lit(1)).as("n_clusters_after")))
      .selectExpr("n_old_clustered_docs", "n_clusters_before", "n_clusters_after",
        "n_clusters_before - n_clusters_after AS n_merged")
  }

  /** Large-volume customers (the TPC-H Q18 shape): orders whose total
    * lineitem quantity exceeds 200 units, with their customer and order
    * value, top-10 by order value — the HAVING-driven semi-aggregate
    * join: the qualifying-order set comes from ONE map-side-combined
    * rollup of the fact (only orderkeys and a quantity sum shuffle), and
    * only survivors join the orders/customer dims. Quantity stays exact
    * DECIMAL through the sum and integerizes at scale 2 for the output;
    * the final cut is TakeOrdered.
    */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val qualifying = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 200)
    qualifying
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("price_cents")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("price_cents"), (col("qty") * 100).cast("long").as("total_qty_centi"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Two-sample Kolmogorov–Smirnov drift per source: the exact maximum
    * CDF distance between each source's document-length distribution and
    * the corpus's, with the length at which it occurs — the
    * distribution-shape drift statistic q110's binned monitor
    * approximates (KS sees a shifted mode even when bin totals agree).
    * Exactness: both CDFs are integer ppm at their jump points, and the
    * supremum of a step-function difference is attained at a jump, so
    * evaluating F_source at every CORPUS value (a superset of each
    * source's values) makes the max exact. Scale shape: document length
    * is a bounded domain, so the (source × value) grid is bounded
    * regardless of corpus size; the cumulative windows partition by
    * source over that bounded grid; the corpus touches only two
    * map-side-combined rollups. The oracle recomputes F_source by a
    * triangular sum — different algorithm, same integers.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("source"), col("n_chars").as("v"))
    val corpusByVal = d.groupBy(col("v")).agg(count(lit(1)).as("ck"))
    val corpusN = d.agg(count(lit(1)).as("cn"))
    // the corpus cumulative rides shardedCumSum like every other
    // distinct-value running total (the catalog lint bans a bare global
    // window here — it cannot know THIS value domain is bounded)
    val corpusCdf = graft.ops.Relational
      .shardedCumSum(corpusByVal, "v", Seq("ck"), ascending = true)
      .crossJoin(broadcast(corpusN))
      .select(col("v"), expr("(cum_ck * 1000000L) DIV cn").as("fc_ppm"))
    val srcByVal = d.groupBy(col("source"), col("v")).agg(count(lit(1)).as("k"))
    val srcN = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // grid = every corpus value × every source; the source CDF at corpus
    // values falls out of one cumulative over coalesced per-value counts
    val grid = corpusCdf.crossJoin(broadcast(srcN.select(col("source"))))
      .join(srcByVal, Seq("source", "v"), "left")
      .withColumn("scum", sum(coalesce(col("k"), lit(0L))).over(
        Window.partitionBy(col("source")).orderBy(col("v"))))
      .join(broadcast(srcN), "source")
      .withColumn("fs_ppm", expr("(scum * 1000000L) DIV n"))
      .withColumn("dist", abs(col("fc_ppm") - col("fs_ppm")))
    grid
      .withColumn("mx", max(col("dist")).over(Window.partitionBy(col("source"))))
      .filter(col("dist") === col("mx"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"), max(col("dist")).as("ks_ppm"),
        min(col("v")).as("at_length"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------------
  // Catalog + oracles
  // ---------------------------------------------------------------------

  val all: Map[String, Builder] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_rank_latest" -> (rankLatestOrder _),
    "q03_watermark_bounds" -> (watermarkBounds _),
    "q04_incremental_filter" -> (incrementalFilter _),
    "q05_filter_in_like" -> (filterInLike _),
    "q06_dim_enrich" -> (dimEnrich _),
    "q07_join_agg_subquery" -> (joinAggSubquery _),
    "q08_scalar_subquery" -> (scalarSubquery _),
    "q09_semi_join" -> (semiJoin _),
    "q10_anti_join" -> (antiJoin _),
    "q11_case_unpivot" -> (caseUnpivot _),
    "q12_distinct" -> (distinctValues _),
    "q13_dup_finder" -> (dupFinder _),
    "q14_listagg" -> (listAggNations _),
    "q15_except_diff" -> (exceptDiff _),
    "q16_null_audit" -> (nullAuditJoin _),
    "q17_count_reconcile" -> (countReconcile _),
    "q18_offset_gaps" -> (offsetGaps _),
    "q19_sessionize" -> (sessionize _),
    "q20_tumbling_window" -> (tumblingWindow _),
    "q21_json_extract" -> (jsonExtractAgg _),
    "q22_stored_query" -> (storedQuery _),
    "q23_dedup_groups" -> (dedupGroups _),
    "q24_token_stats" -> (tokenStats _),
    "q25_lang_id" -> (langId _),
    "q26_quality_filter" -> (qualityFilter _),
    "q27_minhash_sig" -> (minhashSignatures _),
    "q28_minhash_pairs" -> (minhashPairs _),
    "q29_simhash" -> (simhashSignatures _),
    "q30_ann_brute" -> (annBruteForce _),
    "q31_embed_neardup" -> (embeddingNearDups _),
    "q32_ann_lsh" -> (annLsh _),
    "q33_flagship_dim" -> (flagshipDim _),
    "q34_topk" -> (topK _),
    "q35_cast_convert" -> (castConvert _),
    "q36_profile" -> (profileOrders _),
    "q37_running_total" -> (runningTotal _),
    "q38_daily_agg" -> (dailyAgg _),
    "q39_rollup" -> (rollupRegion _),
    "q40_term_freq" -> (termFreq _),
    "q41_tfidf_top_terms" -> (tfidfTopTerms _),
    "q42_media_features" -> (mediaFeatures _),
    "q43_intersect" -> (intersectCustomers _),
    "q44_asof_join" -> (asofClickPurchase _),
    "q45_range_join" -> (rangeJoinClicks _),
    "q46_pivot" -> (pivotEvents _),
    "q47_percentiles" -> (percentiles _),
    "q48_histogram" -> (histogram _),
    "q49_salted_agg" -> (saltedAgg _),
    "q50_flagship_full" -> (flagshipFull _),
    "q51_catalog_query" -> (catalogStoredQuery _),
    "q52_simhash_md5" -> (simhashPortable _),
    "q53_ann_ivf" -> (annIvf _),
    "q54_jaccard_blocked" -> (jaccardBlocked _),
    "q55_hash_split" -> (hashSplit _),
    "q56_stratified_sample" -> (stratifiedSample _),
    "q57_pack_bins" -> (packBins _),
    "q58_cube" -> (cubeOrders _),
    "q59_sliding_window" -> (slidingWindow _),
    "q60_dedup_clusters" -> (dedupClusters _),
    "q61_profile_approx" -> (profileOrdersApprox _),
    "q62_skew_join" -> (skewJoin _),
    "q63_contamination" -> (contaminationCheck _),
    "q64_repetition" -> (repetitionRatio _),
    "q65_oov_rate" -> (oovRateDocs _),
    "q66_pq_codes" -> (pqCodes _),
    "q67_pq_adc" -> (pqAdcTopK _),
    "q68_ivf_pq" -> (ivfPqQuery _),
    "q69_simhash_pairs" -> (simhashPairs _),
    "q70_mixture_sample" -> (mixtureSampleDocs _),
    "q71_chunking" -> (chunkDocs _),
    "q72_kmeans" -> (kmeansClusters _),
    "q73_dup_spans" -> (dupSpans _),
    "q74_int8_quant" -> (int8Quant _),
    "q75_cluster_purity" -> (clusterPurity _),
    "q76_gopher_rules" -> (gopherRules _),
    "q77_pii_scrub" -> (piiScrub _),
    "q78_url_domains" -> (urlDomainStats _),
    "q79_boilerplate" -> (boilerplateStrip _),
    "q80_outliers" -> (valueOutliers _),
    "q81_bloom_filter" -> (bloomMembership _),
    "q82_lm_score" -> (lmFluency _),
    "q83_incremental_dedup" -> (incrementalDedup _),
    "q84_quality_deciles" -> (qualityDeciles _),
    "q85_curation_funnel" -> (curationFunnel _),
    "q86_cdc_chunks" -> (cdcChunks _),
    "q87_media_metadata" -> (mediaMetadata _),
    "q88_cold_start" -> (coldStartAudit _),
    "q89_kanon_facets" -> (kAnonFacets _),
    "q90_sparse_retrieval" -> (sparseRetrieval _),
    "q91_semdedup" -> (semDedup _),
    "q92_cluster_sample" -> (clusterSample _),
    "q93_token_budget_mix" -> (tokenBudgetMix _),
    "q94_url_canon" -> (urlCanonDedup _),
    "q95_quality_keeper" -> (qualityKeeperDedup _),
    "q96_cluster_survivors" -> (clusterSurvivorship _),
    "q97_alpha_mixture" -> (alphaMixture _),
    "q98_domain_blocklist" -> (domainBlocklist _),
    "q99_data_card" -> (dataCard _),
    "q100_hybrid_rrf" -> (hybridRetrieval _),
    "q101_host_authority" -> (hostAuthority _),
    "q102_importance_select" -> (importanceSelection _),
    "q103_quality_classifier" -> (qualityClassifier _),
    "q104_weighted_sample" -> (weightedSample _),
    "q105_epoch_plan" -> (epochPlanQuery _),
    "q106_epoch_shuffle" -> (epochShuffleQuery _),
    "q107_score_calibration" -> (scoreCalibration _),
    "q108_release_diff" -> (releaseDiffQuery _),
    "q109_contamination_sweep" -> (contaminationSweep _),
    "q110_drift_monitor" -> (driftMonitor _),
    "q111_tokenizer_fertility" -> (tokenizerFertility _),
    "q112_truncation_loss" -> (truncationLoss _),
    "q113_dedup_survivorship" -> (dedupSurvivorship _),
    "q114_cross_split_neardup" -> (crossSplitNearDup _),
    "q115_funnel_steps" -> (funnelSteps _),
    "q116_retention_cohorts" -> (retentionCohorts _),
    "q117_group_topk" -> (groupTopKDocs _),
    "q118_incremental_retention" -> (incrementalRetention _),
    "q119_packed_layout" -> (packedLayout _),
    "q120_sketch_rollup" -> (sketchRollup _),
    "q121_funnel_latency" -> (funnelLatency _),
    "q122_knn_label" -> (knnLabelPropagation _),
    "q124_ngram_diversity" -> (ngramDiversity _),
    "q123_lsh_recall" -> (lshRecallAudit _),
    "q125_dup_multiplicity" -> (dupMultiplicity _),
    "q126_ann_recall" -> (annRecallCurve _),
    "q127_dup_by_quality" -> (dupByQuality _),
    "q128_zipf_table" -> (zipfTable _),
    "q129_filter_ablation" -> (filterAblation _),
    "q130_pack_fill" -> (packFillHistogram _),
    "q131_heavy_hitters" -> (heavyHitterAudit _),
    "q132_cross_source_dups" -> (crossSourceDups _),
    "q133_signal_covariance" -> (signalCovariance _),
    "q134_cms_heavy" -> (cmsHeavyHitters _),
    "q135_cms_rollup" -> (cmsWeeklyRollup _),
    "q136_hard_negatives" -> (hardNegatives _),
    "q137_lang_confusion" -> (langConfusion _),
    "q138_hist_quantiles" -> (histogramQuantiles _),
    "q139_pr_curve" -> (prCurve _),
    "q140_gate_kappa" -> (gateKappa _),
    "q141_label_centroids" -> (labelCentroids _),
    "q142_maxsim" -> (maxSimRetrieval _),
    "q143_native_topk" -> (nativeTopKDocs _),
    "q144_concurrency" -> (concurrencyCurve _),
    "q145_vocab_drift" -> (vocabDrift _),
    "q146_asof_snapshots" -> (asOfSnapshots _),
    "q147_kmv_overlap" -> (kmvOverlap _),
    "q148_halfsample_ci" -> (halfSampleCi _),
    "q149_join_stats" -> (joinStats _),
    "q150_bitext_margin" -> (bitextMargin _),
    "q151_bpe_pairs" -> (bpePairs _),
    "q152_ivf_balance" -> (ivfBalanceAudit _),
    "q153_kmv_daily" -> (kmvDaily _),
    "q154_group_split" -> (groupSplitLeakage _),
    "q155_dim_health" -> (dimHealth _),
    "q156_curriculum_budget" -> (curriculumBudget _),
    "q157_attribution" -> (multiTouchAttribution _),
    "q158_lift_pairs" -> (liftPairs _),
    "q159_transition_matrix" -> (transitionMatrix _),
    "q160_ann_scorecard" -> (retrievalScorecard _),
    "q161_dup_triangles" -> (dupGraphTriangles _),
    "q162_trend_slope" -> (trendSlope _),
    "q163_benford" -> (benfordAudit _),
    "q164_hll_portable" -> (hllPortable _),
    "q165_centroid_drift" -> (centroidDrift _),
    "q166_dim_covariance" -> (dimCovariance _),
    "q167_span_corruption" -> (spanCorruption _),
    "q168_vocab_gini" -> (vocabGini _),
    "q169_winsorized" -> (winsorizedMeans _),
    "q170_fano_burstiness" -> (fanoFactor _),
    "q171_km_retention" -> (kmRetention _),
    "q172_fuzzy_blocks" -> (fuzzyNameAudit _),
    "q173_lead_time" -> (leadTime _),
    "q174_variance_bridge" -> (varianceBridge _),
    "q175_part_affinity" -> (partAffinity _),
    "q176_cohort_ltv" -> (cohortLtv _),
    "q177_purchase_cadence" -> (purchaseCadence _),
    "q178_modal_coverage" -> (modalCoverage _),
    "q179_rfm_segments" -> (rfmSegments _),
    "q180_pareto" -> (paretoConcentration _),
    "q181_journey_stationary" -> (journeyStationary _),
    "q182_market_share" -> (marketShare _),
    "q183_supplier_wait" -> (supplierWait _),
    "q184_ewma_anomaly" -> (ewmaAnomaly _),
    "q185_freshness_lag" -> (freshnessLag _),
    "q186_dup_core" -> (dupCoreStrength _),
    "q187_decile_migration" -> (decileMigration _),
    "q188_returned_items" -> (returnedItemReport _),
    "q189_priority_check" -> (orderPriorityCheck _),
    "q190_theil_sen" -> (theilSenSlope _),
    "q191_skyline" -> (skylineParts _),
    "q192_grouping_sets" -> (groupingSetsReport _),
    "q193_mad_outliers" -> (madOutliers _),
    "q194_audience_overlap" -> (audienceOverlap _),
    "q195_journey_patterns" -> (journeyPatterns _),
    "q196_ppjoin_exact" -> (ppjoinExact _),
    "q197_session_gap_curve" -> (sessionGapCurve _),
    "q198_ab_test" -> (abConversionTest _),
    "q199_release_merge" -> (releaseMergeAudit _),
    "q200_big_orders" -> (bigOrders _),
    "q201_ks_drift" -> (ksDrift _))

  // DuckDB dialect fragments shared by the text oracles.
  // The PII/URL patterns are the EXACT strings the Spark side compiles
  // (Text.scala keeps them RE2∩Java-compatible), spliced into single-quoted
  // SQL literals — DuckDB's default strings don't process backslashes, so
  // the regex arrives verbatim.
  private val PiiEmailSql = Text.EmailPattern
  private val PiiIpv4Sql = Text.Ipv4Pattern
  private val PiiPhoneSql = Text.PhonePattern
  private val DTOKS = "string_split_regex(trim(text), '\\s+')"
  private val DNORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
  private val DNTOKS = s"string_split_regex(trim($DNORM), '\\s+')"
  private val DSTOP =
    "['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as']"

  /** The q103 classifier's train-then-score pipeline as a shared oracle
    * CTE chain (`cfin` = held-out (doc_id, lang, score)); q103 reads the
    * per-doc surface, q107 the calibration deciles.
    */
  private lazy val ClassifierChainSql =
    s"""planted AS (SELECT doc_id,
       |         CASE WHEN doc_id % 5 = 2 THEN text || ' $SpamMarker' ELSE text END AS text,
       |         CAST(doc_id % 5 = 2 AS INT) AS is_spam
       |       FROM documents),
       |split AS (SELECT doc_id, text, is_spam,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 30 AS is_train
       |       FROM planted),
       |toks AS (SELECT doc_id, is_spam, is_train, unnest($DNTOKS) AS term FROM split),
       |tb AS (SELECT DISTINCT doc_id, is_spam, is_train,
       |         ('0x' || substr(md5(term), 1, 8))::BIGINT % 4096 AS b FROM toks),
       |tot AS (SELECT CAST(count(CASE WHEN is_spam = 1 THEN 1 END) AS BIGINT) AS np,
       |               CAST(count(CASE WHEN is_spam = 0 THEN 1 END) AS BIGINT) AS nn
       |        FROM split WHERE is_train),
       |w0 AS (SELECT b,
       |         (CAST(count(CASE WHEN is_spam = 1 THEN 1 END) AS BIGINT) * 1000000) // np
       |           - (CAST(count(CASE WHEN is_spam = 0 THEN 1 END) AS BIGINT) * 1000000) // nn AS w
       |       FROM tb CROSS JOIN tot WHERE is_train GROUP BY b, np, nn),
       |model AS (SELECT b, CAST(w AS BIGINT) AS w FROM w0 WHERE w <> 0
       |          ORDER BY abs(w) DESC, b LIMIT 256),
       |sums AS (SELECT doc_id, CAST(sum(model.w) AS BIGINT) AS score
       |         FROM tb JOIN model USING (b) WHERE NOT is_train GROUP BY doc_id),
       |cfin AS (SELECT s.doc_id, s.is_spam, coalesce(sums.score, 0) AS score
       |        FROM split s LEFT JOIN sums USING (doc_id) WHERE NOT s.is_train)""".stripMargin

  private def langScore(vocab: Seq[String]): String =
    s"len(list_filter($DTOKS, t -> list_contains([${vocab.map(w => s"'$w'").mkString(",")}], t)))"

  /** The q32 LSH bucket as portable SQL: the SplitMix64 hyperplane
    * coefficients the native expression derives (shared via
    * [[graft.plans.HyperplaneSignature.coefficients]]) embedded as
    * `DOUBLE[]` literals, sign bits via `list_inner_product` on the
    * double-cast embedding — the same ascending-index double math as
    * the expression's loop. `Double.toString` round-trips and DuckDB's
    * decimal parser is correctly rounded, so the literals reconstruct
    * bit-identical doubles.
    */
  private lazy val LshBucketSql: String =
    graft.plans.HyperplaneSignature.coefficients(dim = 64, bits = 6, seed = 42L)
      .zipWithIndex.map { case (row, b) =>
        val arr = row.map(java.lang.Double.toString).mkString(",")
        s"(CASE WHEN list_inner_product(v, [$arr]) > 0.0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("\n    + ")

  /** The q53 IVF centroid sample as portable SQL — the same md5
    * hash-bucket order [[graft.functions.Similarity.ivfTopK]] uses.
    */
  private val IvfCentroidOrderSql: String =
    "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824, vec_id"

  /** The q28 candidate-pair derivation, shared verbatim with q60's
    * recursive-CTE connected components (no ORDER BY so it can nest).
    */
  private lazy val MinhashPairsBody: String =
    s"""WITH toks AS (SELECT doc_id, $DNTOKS AS tk FROM documents),
       |sh AS (SELECT doc_id,
       |        CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
       |             ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END AS s
       |       FROM toks),
       |sig AS (SELECT doc_id,
       |         list_min(list_transform(s, x -> md5('0|' || x))) AS mh_0,
       |         list_min(list_transform(s, x -> md5('1|' || x))) AS mh_1,
       |         list_min(list_transform(s, x -> md5('2|' || x))) AS mh_2,
       |         list_min(list_transform(s, x -> md5('3|' || x))) AS mh_3
       |        FROM sh WHERE len(s) > 0),
       |bands AS (
       |  SELECT doc_id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band_id, md5(mh_2 || '|' || mh_3) AS band_key FROM sig)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
       |WHERE a.doc_id < b.doc_id""".stripMargin

  /** Shared PQ oracle CTEs: the hash-ordered 16-vector codebook, subvector
    * index table, and per-vector packed argmin codes — the
    * [[graft.functions.Pq.fit]] + [[graft.plans.PqEncode]] derivation in
    * plain SQL. All distances are sequential `list_inner_product` over the
    * same doubles the native expressions loop over, so codes and rankings
    * are bit-identical.
    */
  private val PqCodesSql: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (SELECT cidx, cv FROM (
      |        SELECT row_number() OVER (ORDER BY
      |                 ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
      |                 vec_id) - 1 AS cidx,
      |               v AS cv FROM e) WHERE cidx < 16),
      |js AS (SELECT unnest(range(0, 8)) AS j),
      |sub AS (SELECT e.vec_id, js.j, cb.cidx,
      |          list_inner_product(
      |            list_transform(range(1, 9), d -> e.v[js.j*8+d] - cb.cv[js.j*8+d]),
      |            list_transform(range(1, 9), d -> e.v[js.j*8+d] - cb.cv[js.j*8+d])) AS dist
      |        FROM e CROSS JOIN js CROSS JOIN cb),
      |best AS (SELECT vec_id, j, cidx FROM (
      |          SELECT vec_id, j, cidx,
      |                 row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cidx) AS r
      |          FROM sub) WHERE r = 1),
      |codes AS (SELECT vec_id, CAST(sum(cidx << (4*j)) AS BIGINT) AS pq_code
      |          FROM best GROUP BY vec_id)""".stripMargin

  /** The q52 md5-portable 32-bit SimHash derivation (no ORDER BY so it can
    * nest) — shared with q69's banded Hamming candidate pairs.
    */
  private lazy val SimhashMd5Body: String =
    s"""WITH toks AS (SELECT doc_id, $DNTOKS AS tk FROM documents),
       |h AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs FROM toks)
       |SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, 32), b ->
       |    CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sig
       |FROM h""".stripMargin

  /** PQ reconstruction CTEs (decode the packed code back to centroid
    * slices, concatenated in subvector order) — shared by q67 and q68.
    */
  private val PqRecSql: String =
    """dec AS (SELECT codes.vec_id, js.j, ((codes.pq_code >> (4*js.j)) & 15) AS cidx
      |        FROM codes CROSS JOIN js),
      |slices AS (SELECT dec.vec_id, dec.j, cb.cv[dec.j*8+1 : dec.j*8+8] AS sl
      |           FROM dec JOIN cb USING (cidx)),
      |rec AS (SELECT vec_id, flatten(list(sl ORDER BY j)) AS r FROM slices GROUP BY vec_id)""".stripMargin

  /** Sequential squared-L2 in SQL: `list_inner_product(diff, diff)` —
    * the same ascending accumulation as the native L2/ADC expressions.
    */
  private def l2Sql(a: String, b: String, dim: Int): String =
    s"""list_inner_product(list_transform(range(1, ${dim + 1}), i -> $a[i] - $b[i]),
       |                   list_transform(range(1, ${dim + 1}), i -> $a[i] - $b[i]))""".stripMargin

  /** The q72/q75 k-means chain in portable SQL — the
    * [[graft.functions.Kmeans.fit]] derivation verbatim: hash-ordered seed
    * (cb0), then per Lloyd iteration an argmin assignment (aN) and the
    * fixed-point mean update (mN → cbN; the COALESCE keeps a starved
    * cluster's previous centroid, mirroring the Scala clone-then-update).
    * `floor(x·1e9)` sums are exact integers, so the distributed partial
    * aggregation and DuckDB's single-threaded sum agree bit-for-bit; the
    * chain ends in the final-assignment CTE `af(vec_id, cluster, dist)`.
    */
  private lazy val KmeansBody: String = {
    val k = 8; val iters = 2; val dim = 64
    def assignCte(name: String, cb: String): String =
      s"""$name AS (SELECT vec_id, v, cidx AS cluster, d AS dist FROM (
         |  SELECT vec_id, v, cidx, d,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cidx) AS r
         |  FROM (SELECT e.vec_id, e.v, $cb.cidx,
         |          ${l2Sql("e.v", s"$cb.cv", dim)} AS d
         |        FROM e CROSS JOIN $cb)) WHERE r = 1)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""${assignCte(s"a$i", s"cb${i - 1}")},
         |m$i AS (SELECT cluster, j,
         |          sum(CAST(floor(v[j+1] * 1e9) AS DECIMAL(38,0))) AS s,
         |          count(*) AS n
         |        FROM a$i CROSS JOIN (SELECT unnest(range(0, $dim)) AS j) js
         |        GROUP BY cluster, j),
         |cb$i AS (SELECT cb${i - 1}.cidx, COALESCE(u.cv, cb${i - 1}.cv) AS cv
         |         FROM cb${i - 1} LEFT JOIN (
         |           SELECT cluster AS cidx,
         |                  list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 ORDER BY j) AS cv
         |           FROM m$i GROUP BY cluster) u USING (cidx))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb0 AS (SELECT cidx, cv FROM (
       |        SELECT row_number() OVER (ORDER BY $IvfCentroidOrderSql) - 1 AS cidx,
       |               v AS cv FROM e) WHERE cidx < $k),
       |$steps,
       |${assignCte("af", s"cb$iters")}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS count_order,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_rank_latest" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q03_watermark_bounds" ->
      """SELECT coalesce(min(o_orderkey), 0) AS min_run_id, coalesce(max(o_orderkey), 0) AS max_run_id
        |FROM orders WHERE o_orderstatus = 'F' AND o_orderkey > 1000""".stripMargin,
    "q04_incremental_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-03-31 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q05_filter_in_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
        |  AND (p_name LIKE '%widget%' OR p_name LIKE '%bolt%')
        |ORDER BY p_partkey""".stripMargin,
    "q06_dim_enrich" ->
      """SELECT coalesce(r_name, 'UNKNOWN') AS region_name,
        | CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'Vehicle'
        |      WHEN c_mktsegment = 'MACHINERY' THEN 'Industrial'
        |      WHEN c_mktsegment IS NULL THEN 'Not Applicable'
        |      ELSE 'Other' END AS segment_class,
        | count(*) AS n_lines, sum(l_quantity) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus IN ('F','O')
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q07_join_agg_subquery" ->
      """SELECT c_custkey, c_name, coalesce(z.order_cnt, 0) AS order_cnt,
        | coalesce(z.max_price, 0.0) AS max_price
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS order_cnt, max(o_totalprice) AS max_price
        |           FROM orders GROUP BY o_custkey) z
        |  ON c_custkey = z.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q08_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_size = (SELECT max(p_size) FROM part) ORDER BY p_partkey""".stripMargin,
    "q09_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 190000)
        |ORDER BY c_custkey""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q11_case_unpivot" ->
      """SELECT user_id,
        | max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_max,
        | max(CASE WHEN event_type = 'view' THEN value END) AS view_max,
        | max(CASE WHEN event_type = 'click' THEN value END) AS click_max,
        | max(CASE WHEN event_type = 'error' THEN value END) AS error_max,
        | count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q12_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q13_dup_finder" ->
      """SELECT o_custkey, o_orderstatus, count(*) AS dup_count FROM orders
        |GROUP BY o_custkey, o_orderstatus HAVING count(*) > 1
        |ORDER BY o_custkey, o_orderstatus""".stripMargin,
    "q14_listagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q15_except_diff" ->
      """SELECT o_orderkey, 'source_only' AS diff_side FROM
        | (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
        |  EXCEPT SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT o_orderkey, 'target_only' AS diff_side FROM
        | (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |ORDER BY o_orderkey, diff_side""".stripMargin,
    "q16_null_audit" ->
      """SELECT c_custkey, c_name FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IS NULL ORDER BY c_custkey""".stripMargin,
    "q17_count_reconcile" ->
      """SELECT (SELECT count(*) FROM orders) AS src_count,
        | (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS tgt_count,
        | (SELECT count(*) FROM orders) = (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS is_match""".stripMargin,
    "q18_offset_gaps" ->
      """WITH g AS (
        |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS bucket,
        |         min(event_id) AS from_id, max(event_id) AS until_id
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, bucket, from_id,
        |         lag(until_id) OVER (PARTITION BY user_id ORDER BY bucket) AS prev_until
        |  FROM g)
        |SELECT user_id, bucket, prev_until, from_id FROM l
        |WHERE prev_until IS NOT NULL AND prev_until <> from_id
        |ORDER BY user_id, bucket""".stripMargin,
    "q19_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s)
        |SELECT user_id, session_seq, count(*) AS n_events,
        | min(event_id) AS first_event, max(event_id) AS last_event,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s2 GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "q20_tumbling_window" ->
      """SELECT (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS hour_epoch, event_type,
        | count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q21_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        | max(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q22_stored_query" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice BETWEEN 100000.0 AND 110000.0 ORDER BY o_orderkey""".stripMargin,
    "q23_dedup_groups" ->
      s"""SELECT md5($DNORM) AS fp, min(doc_id) AS keep_id, count(*) AS group_size
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q24_token_stats" ->
      s"""SELECT doc_id, len(text) AS n_chars, len($DTOKS) AS n_tokens,
         | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
         | len(list_filter($DTOKS, t -> list_contains($DSTOP, t))) AS stopword_hits,
         | len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
         | CAST(list_sum(list_transform($DTOKS, t -> len(t))) AS BIGINT) AS sum_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q25_lang_id" -> {
      val en = langScore(Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as"))
      val es = langScore(Seq("el", "la", "de", "que", "y", "en", "un", "los", "por", "con"))
      val fr = langScore(Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "pour"))
      val de = langScore(Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"))
      s"""WITH s AS (SELECT doc_id, $en AS s_en, $es AS s_es, $fr AS s_fr, $de AS s_de FROM documents),
         |b AS (SELECT *, greatest(s_en, s_es, s_fr, s_de) AS best FROM s)
         |SELECT doc_id,
         | CASE WHEN best > 0 AND s_en = best THEN 'en'
         |      WHEN best > 0 AND s_es = best THEN 'es'
         |      WHEN best > 0 AND s_fr = best THEN 'fr'
         |      WHEN best > 0 AND s_de = best THEN 'de'
         |      ELSE 'und' END AS lang_pred
         |FROM b ORDER BY doc_id""".stripMargin
    },
    "q26_quality_filter" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE len($DTOKS) BETWEEN 15 AND 40
         |  AND len(regexp_extract_all(text, '[.,;:!?]')) = 0
         |ORDER BY doc_id""".stripMargin,
    "q27_minhash_sig" ->
      s"""WITH toks AS (SELECT doc_id, $DNTOKS AS tk FROM documents),
         |sh AS (SELECT doc_id,
         |        CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END AS s
         |       FROM toks)
         |SELECT doc_id,
         | list_min(list_transform(s, x -> md5('0|' || x))) AS mh_0,
         | list_min(list_transform(s, x -> md5('1|' || x))) AS mh_1,
         | list_min(list_transform(s, x -> md5('2|' || x))) AS mh_2,
         | list_min(list_transform(s, x -> md5('3|' || x))) AS mh_3
         |FROM sh WHERE len(s) > 0 ORDER BY doc_id""".stripMargin,
    "q28_minhash_pairs" -> s"$MinhashPairsBody\nORDER BY id_a, id_b",
    "q60_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS ($MinhashPairsBody),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
         |SELECT id, min(lbl) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "q71_chunking" ->
      s"""WITH tk AS (SELECT doc_id, $DNTOKS AS w FROM documents),
         |nn AS (SELECT doc_id, w, len(w) AS n FROM tk),
         |c AS (SELECT doc_id, w, n,
         |        unnest(range(0, CASE WHEN n <= 32 THEN 1
         |                             ELSE CAST(ceil(CAST(n - 32 AS DOUBLE) / 24) AS BIGINT) + 1 END)) AS chunk_id
         |      FROM nn)
         |SELECT doc_id, chunk_id, chunk_id * 24 AS start_tok,
         |       least(32, n - chunk_id * 24) AS chunk_len,
         |       array_to_string(w[chunk_id*24+1 : chunk_id*24 + least(32, n - chunk_id*24)], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q70_mixture_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang ORDER BY
        |           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
        |           doc_id) AS mix_rank
        |  FROM documents)
        |SELECT lang, doc_id, mix_rank FROM r
        |WHERE mix_rank <= floor(CASE lang WHEN 'en' THEN 0.60 WHEN 'es' THEN 0.15
        |                                  WHEN 'fr' THEN 0.15 WHEN 'de' THEN 0.10
        |                                  ELSE 0.0 END * 200)
        |ORDER BY lang, mix_rank""".stripMargin,
    "q63_contamination" ->
      s"""WITH b AS (SELECT doc_id, $DNTOKS AS tk,
         |             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
         |           FROM documents),
         |g AS (SELECT doc_id, bkt,
         |        unnest(list_distinct(list_transform(range(1, len(tk) - 3),
         |                 i -> md5(array_to_string(tk[i:i+4], ' '))))) AS gh
         |      FROM b WHERE len(tk) >= 5)
         |SELECT te.doc_id AS test_id,
         |       count(DISTINCT tr.doc_id) AS n_train_docs,
         |       count(DISTINCT te.gh) AS n_shared_grams
         |FROM g te JOIN g tr ON te.gh = tr.gh AND te.bkt >= 90 AND tr.bkt < 80
         |GROUP BY te.doc_id ORDER BY test_id""".stripMargin,
    "q64_repetition" ->
      s"""WITH tk AS (SELECT doc_id, $DNTOKS AS w FROM documents),
         |g AS (SELECT doc_id,
         |        list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')) AS gs
         |      FROM tk WHERE len(w) >= 3)
         |SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
         |       CAST(len(gs) - len(list_distinct(gs)) AS BIGINT) AS n_repeated,
         |       CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs) AS rep_ratio
         |FROM g ORDER BY doc_id""".stripMargin,
    "q65_oov_rate" ->
      s"""WITH toks AS (SELECT doc_id, unnest($DNTOKS) AS term FROM documents),
         |v AS (SELECT term FROM (
         |        SELECT term, count(*) AS n FROM toks GROUP BY term
         |        ORDER BY n DESC, term LIMIT 50)),
         |j AS (SELECT t.doc_id, (v.term IS NOT NULL) AS in_v
         |      FROM toks t LEFT JOIN v ON t.term = v.term)
         |SELECT doc_id, count(*) AS n_tokens,
         |       count(*) FILTER (WHERE NOT in_v) AS n_oov,
         |       CAST(count(*) FILTER (WHERE NOT in_v) AS DOUBLE) / count(*) AS oov_rate
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q66_pq_codes" ->
      s"""WITH $PqCodesSql
         |SELECT vec_id, pq_code FROM codes ORDER BY vec_id""".stripMargin,
    "q67_pq_adc" ->
      s"""WITH $PqCodesSql,
         |$PqRecSql,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |s AS (SELECT qid, rec.vec_id AS corpus_id,
         |        ${l2Sql("qv", "r", 64)} AS adist
         |      FROM rec CROSS JOIN q WHERE qid <> rec.vec_id),
         |rk AS (SELECT qid AS query_id, corpus_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY adist, corpus_id) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q68_ivf_pq" ->
      s"""WITH $PqCodesSql,
         |$PqRecSql,
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824, vec_id
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                   ${l2Sql("e.v", "cents.cent", 64)},
         |                   cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents) WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                   ${l2Sql("e.v", "cents.cent", 64)},
         |                   cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 5) WHERE qr <= 8),
         |s AS (SELECT probes.qid, asg.corpus_id,
         |        ${l2Sql("probes.qv", "rec.r", 64)} AS adist
         |      FROM asg JOIN probes USING (cell_id)
         |      JOIN rec ON rec.vec_id = asg.corpus_id
         |      WHERE probes.qid <> asg.corpus_id),
         |rk AS (SELECT qid AS query_id, corpus_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY adist, corpus_id) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q62_skew_join" ->
      """WITH d AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS type_avg
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |       count(*) FILTER (WHERE e.value > d.type_avg) AS n_above,
        |       count(*) AS n
        |FROM events e JOIN d USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q30_ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, cid, list_cosine_similarity(cv, qv) AS sim FROM c CROSS JOIN q WHERE qid <> cid),
        |r AS (SELECT qid AS query_id, cid AS corpus_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
        |      FROM s)
        |SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q31_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a CROSS JOIN embeddings b
        |WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "q32_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sg AS (SELECT vec_id, v, $LshBucketSql AS bucket FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM sg WHERE vec_id < 5),
         |c AS (SELECT vec_id AS cid, v AS cv, bucket FROM sg),
         |s AS (SELECT qid, cid, list_cosine_similarity(cv, qv) AS sim
         |      FROM c JOIN q USING (bucket) WHERE qid <> cid),
         |r AS (SELECT qid AS query_id, cid AS corpus_id,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q53_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cv, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, e.v AS cv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 5)
         |        WHERE qr <= 8),
         |s AS (SELECT qid, corpus_id, list_cosine_similarity(cv, qv) AS sim
         |      FROM asg JOIN probes USING (cell_id) WHERE qid <> corpus_id),
         |r AS (SELECT qid AS query_id, corpus_id,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, corpus_id) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q33_flagship_dim" -> FlagshipSql,
    "q50_flagship_full" -> FlagshipFullSql,
    "q51_catalog_query" ->
      """SELECT r_name AS region_name, count(*) AS n_nations, min(n_name) AS first_nation
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY region_name""".stripMargin,
    "q52_simhash_md5" -> s"$SimhashMd5Body\nORDER BY doc_id",
    "q69_simhash_pairs" ->
      s"""WITH sig AS ($SimhashMd5Body),
         |bands AS (SELECT doc_id, sig, 0 AS band_id, sig & 65535 AS chunk FROM sig
         |          UNION ALL SELECT doc_id, sig, 1 AS band_id, (sig >> 16) & 65535 AS chunk FROM sig),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |            CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |          FROM bands a JOIN bands b USING (band_id, chunk)
         |          WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q54_jaccard_blocked" ->
      """WITH s AS (
        |  SELECT doc_id, lang, source,
        |         list_transform(generate_series(1, greatest(length(text) - 2, 0)),
        |                        i -> substr(text, i, 3)) AS sh
        |  FROM documents WHERE text IS NOT NULL AND doc_id % 5 = 0
        |)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
        |FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.2
        |ORDER BY left_id, right_id""".stripMargin,
    "q55_hash_split" ->
      """WITH b AS (
        |  SELECT n_chars,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
        |  FROM documents)
        |SELECT CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "q56_stratified_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
        |           doc_id) AS sample_rank
        |  FROM documents)
        |SELECT lang, doc_id, sample_rank FROM r WHERE sample_rank <= 5
        |ORDER BY lang, sample_rank""".stripMargin,
    "q57_pack_bins" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM documents),
        |b AS (
        |  SELECT shard, n_chars,
        |         CAST(floor((SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id) - n_chars)
        |                    / 4000.0) AS BIGINT) AS pack_bin
        |  FROM s)
        |SELECT shard, pack_bin, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bin_chars
        |FROM b GROUP BY shard, pack_bin ORDER BY shard, pack_bin""".stripMargin,
    "q58_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q59_sliding_window" ->
      """WITH s AS (
        |  SELECT (epoch_ns(ts) // 1000000000) // 1800 AS slot, user_id FROM events),
        |e AS (SELECT unnest([slot, slot - 1]) AS w, user_id FROM s)
        |SELECT w * 1800 AS window_start, count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q35_cast_convert" ->
      """SELECT o_orderkey, CAST(CAST(o_custkey AS VARCHAR) AS BIGINT) AS rt_key,
        | CAST(epoch(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS BIGINT) AS order_epoch
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q37_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
        | lag(o_totalprice) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q38_daily_agg" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day, o_orderstatus,
        | count(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q39_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        | coalesce(n_name, 'ALL') AS nation_name,
        | count(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q46_pivot" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q47_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q48_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        | count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_salted_agg" ->
      """SELECT event_type,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q45_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS c_ts FROM e WHERE event_type = 'click')
        |SELECT p_id, CAST(count(*) AS BIGINT) AS n_recent_clicks
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND p.p_ts - c.c_ts BETWEEN 0 AND 600000000
        |GROUP BY p_id ORDER BY p_id""".stripMargin,
    "q44_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type, value FROM events),
        |clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts_us AS p_ts, event_id AS p_event_id, value AS p_value
        |  FROM e WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) = 1)
        |SELECT c.event_id, c.user_id, p.p_event_id AS asof_p_event_id, p.p_value AS asof_p_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts
        |ORDER BY c.event_id""".stripMargin,
    "q43_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "q40_term_freq" ->
      s"""SELECT term, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT unnest($DNTOKS) AS term FROM documents)
         |GROUP BY term ORDER BY n DESC, term LIMIT 50""".stripMargin,
    "q41_tfidf_top_terms" ->
      s"""WITH tc AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest($DNTOKS) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tc GROUP BY term),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tc.doc_id, tc.term, tc.tf,
         |         tc.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tf_idf
         |  FROM tc JOIN dfreq USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, term, tf,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, term ASC) AS rnk
         |  FROM scored)
         |SELECT doc_id, term, tf, rnk FROM ranked WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin,
    "q72_kmeans" ->
      s"""$KmeansBody
         |SELECT cluster, count(*) AS n_vecs,
         |       CAST(sum(CAST(floor(dist * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS inertia
         |FROM af GROUP BY cluster ORDER BY cluster""".stripMargin,
    "q75_cluster_purity" ->
      s"""$KmeansBody,
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |cnt AS (SELECT cluster, label, count(*) AS top_n
         |        FROM af JOIN lab USING (vec_id) GROUP BY cluster, label)
         |SELECT cluster, n_vecs, label AS top_label, top_n FROM (
         |  SELECT cluster, label, top_n,
         |         CAST(sum(top_n) OVER (PARTITION BY cluster) AS BIGINT) AS n_vecs,
         |         row_number() OVER (PARTITION BY cluster ORDER BY top_n DESC, label) AS r
         |  FROM cnt) WHERE r = 1 ORDER BY cluster""".stripMargin,
    "q73_dup_spans" ->
      s"""WITH toks AS (SELECT doc_id, $DNTOKS AS tk FROM documents),
         |g AS (SELECT doc_id,
         |        unnest(list_transform(range(1, len(tk) - 3),
         |                 i -> md5(array_to_string(tk[i:i+4], ' ')))) AS gh
         |      FROM toks WHERE len(tk) >= 5),
         |pg AS (SELECT doc_id, gh, count(*) AS occ FROM g GROUP BY doc_id, gh),
         |d AS (SELECT doc_id, occ,
         |        count(*) OVER (PARTITION BY gh) AS gram_docs FROM pg)
         |SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_grams,
         |       CAST(sum(CASE WHEN gram_docs > 1 THEN occ ELSE 0 END) AS BIGINT) AS n_dup_grams,
         |       CAST(sum(CASE WHEN gram_docs > 1 THEN occ ELSE 0 END) AS DOUBLE)
         |         / CAST(sum(occ) AS DOUBLE) AS dup_fraction
         |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q74_int8_quant" ->
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS sc FROM e),
         |r0 AS (SELECT label, v,
         |         list_transform(v, x -> CAST(floor(x / sc * 127.0 + 0.5) AS DOUBLE) * sc / 127.0) AS rec
         |       FROM e CROSS JOIN s),
         |r AS (SELECT label, ${l2Sql("v", "rec", 64)} AS err FROM r0)
         |SELECT label, count(*) AS n_vecs,
         |       CAST(sum(CAST(floor(err * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS total_err,
         |       max(err) AS max_err
         |FROM r GROUP BY label ORDER BY label""".stripMargin,
    "q76_gopher_rules" ->
      s"""WITH toks AS (SELECT lang, source, $DTOKS AS tk, $DNTOKS AS nt FROM documents),
         |sh AS (SELECT lang, source, tk,
         |        CASE WHEN len(nt) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(nt) - 1), i -> array_to_string(nt[i:i+2], ' ')) END AS s
         |       FROM toks),
         |f AS (SELECT lang, source,
         |        CASE WHEN len(tk) >= 30 THEN 1 ELSE 0 END AS len_ok,
         |        CASE WHEN list_sum(list_transform(tk, t -> len(t))) * 1000 >= len(tk) * 3000
         |              AND list_sum(list_transform(tk, t -> len(t))) * 1000 <= len(tk) * 10000
         |             THEN 1 ELSE 0 END AS word_len_ok,
         |        CASE WHEN len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) * 5 >= len(tk) * 4
         |             THEN 1 ELSE 0 END AS alpha_ok,
         |        CASE WHEN len(list_filter(tk, t -> list_contains($DSTOP, t))) >= 2
         |             THEN 1 ELSE 0 END AS stop_ok,
         |        CASE WHEN (len(s) - len(list_distinct(s))) * 5 <= len(s)
         |             THEN 1 ELSE 0 END AS rep_ok
         |      FROM sh)
         |SELECT lang, source, count(*) AS n_docs,
         |       CAST(sum(len_ok) AS BIGINT) AS n_len_ok,
         |       CAST(sum(word_len_ok) AS BIGINT) AS n_word_len_ok,
         |       CAST(sum(alpha_ok) AS BIGINT) AS n_alpha_ok,
         |       CAST(sum(stop_ok) AS BIGINT) AS n_stop_ok,
         |       CAST(sum(rep_ok) AS BIGINT) AS n_rep_ok,
         |       CAST(sum(len_ok * word_len_ok * alpha_ok * stop_ok * rep_ok) AS BIGINT) AS n_pass
         |FROM f GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q77_pii_scrub" ->
      s"""WITH p AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN ' or admin@test.org' ELSE '' END
         |  || CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 32 AS VARCHAR) || '.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE '' END
         |  || CASE WHEN doc_id % 7 = 0 THEN ' call 555-0199' ELSE '' END AS t2
         |  FROM documents),
         |r AS (SELECT doc_id, t2,
         |  regexp_replace(regexp_replace(regexp_replace(t2,
         |    '$PiiEmailSql', '<EMAIL>', 'g'),
         |    '$PiiIpv4Sql', '<IP>', 'g'),
         |    '$PiiPhoneSql', '<PHONE>', 'g') AS red
         |  FROM p)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t2, '$PiiEmailSql')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t2, '$PiiIpv4Sql')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t2, '$PiiPhoneSql')) AS BIGINT) AS n_phones,
         |  CAST(len(red) AS BIGINT) AS redacted_len,
         |  md5(red) AS redacted_md5
         |FROM r ORDER BY doc_id""".stripMargin,
    "q78_url_domains" ->
      s"""WITH p AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 2 = 0 THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/p' || CAST(doc_id AS VARCHAR) ELSE '' END
         |  || CASE WHEN doc_id % 3 = 0 THEN ' ref http://www.ref' || CAST(doc_id % 7 AS VARCHAR) || '.org/page' ELSE '' END AS t2
         |  FROM documents),
         |d AS (SELECT doc_id, unnest(regexp_extract_all(t2, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain FROM p)
         |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       count(*) AS n_refs
         |FROM d WHERE domain NOT IN ('site3.example.com', 'www.ref2.org')
         |GROUP BY domain ORDER BY domain""".stripMargin,
    "q79_boilerplate" ->
      s"""WITH p AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END
         |  || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END
         |  || CASE WHEN doc_id % 50 = 0 THEN chr(10) || 'rare promo line' ELSE '' END AS t2
         |  FROM documents),
         |l AS (SELECT doc_id, unnest(string_split(t2, chr(10))) AS line FROM p),
         |hot AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 100)
         |SELECT l.doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN hot.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  CAST(sum(CASE WHEN hot.line IS NULL THEN len(l.line) ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM l LEFT JOIN hot ON l.line = hot.line
         |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,
    "q80_outliers" ->
      """WITH c AS (SELECT event_id, event_type, value,
        |            CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |s AS (SELECT event_type, count(*) AS n, CAST(sum(vc) AS BIGINT) AS s,
        |       CAST(sum(vc * vc) AS BIGINT) AS ss FROM c GROUP BY event_type),
        |z AS (SELECT event_id, c.event_type, value,
        |  CASE WHEN sqrt((CAST(s.ss AS DOUBLE) - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE) / s.n) / s.n) > 0
        |    THEN (CAST(vc AS DOUBLE) - CAST(s.s AS DOUBLE) / s.n) /
        |      sqrt((CAST(s.ss AS DOUBLE) - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE) / s.n) / s.n)
        |    ELSE 0.0 END AS z
        |FROM c JOIN s ON c.event_type = s.event_type)
        |SELECT event_id, event_type, value, z FROM z
        |WHERE abs(z) > 3.0
        |ORDER BY event_type, event_id""".stripMargin,
    "q81_bloom_filter" ->
      """WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 400000),
        |kpos AS (SELECT key, (('0x' || substr(md5(CAST(key AS VARCHAR)), 1 + 8*j, 8))::BIGINT) % 1024 AS pos
        |         FROM keys, (VALUES (0), (1), (2)) jt(j)),
        |bloom AS (SELECT pos // 32 AS word, bit_or(1::BIGINT << (pos % 32)) AS bits
        |          FROM kpos GROUP BY pos // 32),
        |cpos AS (SELECT c_custkey, (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1 + 8*j, 8))::BIGINT) % 1024 AS pos
        |         FROM customer, (VALUES (0), (1), (2)) jt(j)),
        |verd AS (SELECT c_custkey,
        |           min(CASE WHEN (coalesce(bits, 0) & (1::BIGINT << (pos % 32))) = (1::BIGINT << (pos % 32))
        |                    THEN 1 ELSE 0 END) AS hit
        |         FROM cpos LEFT JOIN bloom ON cpos.pos // 32 = bloom.word
        |         GROUP BY c_custkey)
        |SELECT CAST(c.c_nationkey AS BIGINT) AS nation, count(*) AS n_customers,
        |  CAST(sum(CASE WHEN v.hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pos,
        |  CAST(sum(CASE WHEN k.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_members
        |FROM customer c
        |JOIN verd v ON c.c_custkey = v.c_custkey
        |LEFT JOIN keys k ON c.c_custkey = k.key
        |GROUP BY c.c_nationkey ORDER BY nation""".stripMargin,
    "q82_lm_score" ->
      s"""WITH nt AS (SELECT doc_id, $DNORM AS n FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(n)), i -> n[i:i+1])) AS bigram FROM nt),
         |m AS (SELECT bigram, count(*) AS cnt FROM g GROUP BY bigram),
         |p AS (SELECT substr(bigram, 1, 1) AS c1, CAST(sum(cnt) AS BIGINT) AS prefix_cnt FROM m GROUP BY 1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CAST(floor(1000000 * cnt / prefix_cnt) AS BIGINT)) AS BIGINT) AS lm_score
         |FROM g JOIN m USING (bigram) JOIN p ON substr(g.bigram, 1, 1) = p.c1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q83_incremental_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
        |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
        |          UNION ALL
        |          SELECT doc_id + 100000, text FROM corpus WHERE doc_id % 50 = 0),
        |bf AS (SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp FROM batch),
        |cf AS (SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp FROM corpus)
        |SELECT min(b.doc_id) AS doc_id, b.fp
        |FROM bf b LEFT JOIN cf c ON b.fp = c.fp
        |WHERE c.fp IS NULL
        |GROUP BY b.fp ORDER BY doc_id""".stripMargin,
    "q85_curation_funnel" ->
      s"""WITH base AS (SELECT doc_id, lang, n_chars,
         |         md5($DNORM) AS fp,
         |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
         |       FROM documents),
         |k1 AS (SELECT * FROM base QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
         |toks AS (SELECT doc_id, $DTOKS AS tk, $DNTOKS AS nt FROM documents),
         |sh AS (SELECT doc_id, tk, nt,
         |        CASE WHEN len(nt) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(nt) - 1), i -> array_to_string(nt[i:i+2], ' ')) END AS s
         |       FROM toks),
         |flags AS (SELECT doc_id FROM sh WHERE
         |   len(tk) >= 30
         |   AND list_sum(list_transform(tk, t -> len(t))) * 1000 >= len(tk) * 3000
         |   AND list_sum(list_transform(tk, t -> len(t))) * 1000 <= len(tk) * 10000
         |   AND len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) * 5 >= len(tk) * 4
         |   AND len(list_filter(tk, t -> list_contains($DSTOP, t))) >= 2
         |   AND (len(s) - len(list_distinct(s))) * 5 <= len(s)),
         |k2 AS (SELECT k1.* FROM k1 JOIN flags USING (doc_id)),
         |k3 AS (SELECT * FROM k2 WHERE bkt < 80),
         |tgr AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(nt) - 3),
         |                 i -> md5(array_to_string(nt[i:i+4], ' '))))) AS gh
         |        FROM toks JOIN base USING (doc_id) WHERE base.bkt >= 90),
         |kgr0 AS (SELECT k3.doc_id, unnest(list_distinct(list_transform(range(1, len(nt) - 3),
         |                 i -> md5(array_to_string(nt[i:i+4], ' '))))) AS gh
         |        FROM toks JOIN k3 USING (doc_id)),
         |kgr AS (SELECT doc_id, gh FROM
         |          (SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS df FROM kgr0)
         |        WHERE df <= 1000),
         |drop4 AS (SELECT DISTINCT kgr.doc_id FROM kgr JOIN tgr USING (gh)),
         |k4 AS (SELECT * FROM k3 WHERE doc_id NOT IN (SELECT doc_id FROM drop4)),
         |k5 AS (SELECT * FROM k4 QUALIFY ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) >= 2)
         |SELECT * FROM (
         |  SELECT '0_raw' AS stage, count(*) AS n_docs FROM documents
         |  UNION ALL SELECT '1_exact_dedup', count(*) FROM k1
         |  UNION ALL SELECT '2_quality_gate', count(*) FROM k2
         |  UNION ALL SELECT '3_train_split', count(*) FROM k3
         |  UNION ALL SELECT '4_decontaminated', count(*) FROM k4
         |  UNION ALL SELECT '5_decile_trim', count(*) FROM k5
         |) ORDER BY stage""".stripMargin,
    "q88_cold_start" ->
      """WITH b AS (SELECT min(epoch_ns(ts)) AS lo, max(epoch_ns(ts)) AS hi FROM events),
        |cut AS (SELECT lo + (hi - lo) // 5 * 4 AS c FROM b),
        |tr AS (SELECT DISTINCT user_id FROM events, cut WHERE epoch_ns(ts) < c),
        |ev AS (SELECT e.event_id, e.event_type, e.user_id FROM events e, cut
        |       WHERE epoch_ns(e.ts) >= c)
        |SELECT event_type, count(*) AS n_eval_events,
        |  CAST(sum(CASE WHEN tr.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cold_start,
        |  count(DISTINCT CASE WHEN tr.user_id IS NULL THEN ev.user_id END) AS n_cold_users
        |FROM ev LEFT JOIN tr ON ev.user_id = tr.user_id
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q89_kanon_facets" ->
      """WITH d AS (SELECT lang, source, count(*) AS n_docs,
        |            CAST(sum(n_chars) AS BIGINT) AS total_chars
        |           FROM documents GROUP BY lang, source)
        |SELECT CASE WHEN n_docs >= 8 THEN lang ELSE '__other__' END AS lang_pub,
        |       CASE WHEN n_docs >= 8 THEN source ELSE '__other__' END AS source_pub,
        |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |       CAST(sum(total_chars) AS BIGINT) AS total_chars
        |FROM d GROUP BY 1, 2 ORDER BY lang_pub, source_pub""".stripMargin,
    "q87_media_metadata" ->
      """WITH m AS (SELECT i,
        |  CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE WHEN i % 3 = 1 THEN 0 ELSE 64 + (i % 4) * 32 END AS width,
        |  CASE WHEN i % 3 = 1 THEN 0 ELSE 64 END AS height,
        |  CASE WHEN i % 3 = 0 THEN 0 ELSE 1000 + (i % 10) * 500 END AS duration_ms,
        |  CASE WHEN i % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate
        |  FROM range(300) t(i))
        |SELECT kind, count(*) AS n_items,
        |  CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms,
        |  CAST(sum(width * height) AS BIGINT) AS total_pixels,
        |  CAST(max(sample_rate) AS BIGINT) AS max_sample_rate
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,
    "q90_sparse_retrieval" ->
      s"""WITH toks AS (SELECT doc_id, unnest($DNTOKS) AS term FROM documents),
         |ct AS (SELECT doc_id AS d, term, count(*) AS tf_d FROM toks GROUP BY 1, 2),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n_corpus,
         |              (SELECT sum(tf_d) FROM ct) AS total_tokens),
         |dld AS (SELECT *, sum(tf_d) OVER (PARTITION BY d) AS dl,
         |               count(*) OVER (PARTITION BY term) AS df FROM ct),
         |wt AS (SELECT d, term, tf_d, dl,
         |         CAST(floor(1000000 / df) AS BIGINT) AS w,
         |         (10000 * 22 * tf_d * (total_tokens // n_corpus)) //
         |           (10 * (total_tokens // n_corpus) * tf_d
         |            + 3 * (total_tokens // n_corpus) + 9 * dl) AS tfc
         |       FROM dld, st
         |       WHERE df <= n_corpus * 0.78),
         |qt AS (SELECT d AS q, term, tf_d AS tf_q FROM ct WHERE d < 5),
         |s AS (SELECT q, d, CAST(sum(tf_q * w * tfc) AS BIGINT) AS score
         |      FROM qt JOIN wt USING (term) GROUP BY 1, 2),
         |rk AS (SELECT q, d, score,
         |         row_number() OVER (PARTITION BY q ORDER BY score DESC, d) AS rnk FROM s)
         |SELECT q, d, score, rnk FROM rk WHERE rnk <= 10 ORDER BY q, rnk""".stripMargin,
    "q91_semdedup" ->
      s"""$KmeansBody,
         |drops AS (SELECT DISTINCT b.vec_id AS dv
         |          FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |          WHERE list_cosine_similarity(a.v, b.v) >= 0.45)
         |SELECT af.vec_id, CAST(af.cluster AS BIGINT) AS cluster,
         |       (drops.dv IS NULL) AS kept
         |FROM af LEFT JOIN drops ON af.vec_id = drops.dv
         |ORDER BY af.vec_id""".stripMargin,
    "q92_cluster_sample" ->
      s"""$KmeansBody,
         |r AS (SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
         |        row_number() OVER (PARTITION BY cluster ORDER BY
         |          ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
         |          vec_id) AS sample_rank
         |      FROM af)
         |SELECT vec_id, cluster, sample_rank FROM r WHERE sample_rank <= 10
         |ORDER BY cluster, sample_rank""".stripMargin,
    "q93_token_budget_mix" ->
      // budget > 0 BEFORE the window mirrors the Spark-side scan-local
      // prefilter: zero-budget strata are unconditionally empty (even a
      // hypothetical zero-token row can't sneak in at cum_tokens = 0)
      s"""WITH b AS (
         |  SELECT lang, doc_id, CAST(len($DTOKS) AS BIGINT) AS n_tokens,
         |         CASE lang WHEN 'en' THEN 30000 WHEN 'es' THEN 10000
         |                   WHEN 'fr' THEN 10000 WHEN 'de' THEN 5000 ELSE 0 END AS budget
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, n_tokens, budget,
         |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY
         |           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
         |           doc_id) AS BIGINT) AS cum_tokens
         |  FROM b WHERE budget > 0)
         |SELECT lang, doc_id, n_tokens, cum_tokens FROM r
         |WHERE cum_tokens <= budget
         |ORDER BY lang, cum_tokens""".stripMargin,
    "q94_url_canon" ->
      """WITH r AS (SELECT doc_id,
        |  'https://' ||
        |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
        |  'Site' || CAST(doc_id % 10 AS VARCHAR) ||
        |  '.Example.com/doc/' || CAST(doc_id % 5 AS VARCHAR) ||
        |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        |  CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed&ref=' || CAST(doc_id % 2 AS VARCHAR)
        |       WHEN doc_id % 3 = 2 THEN '?ref=' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END AS raw_url
        |  FROM documents),
        |n AS (SELECT doc_id, raw_url, regexp_replace(raw_url, '#.*$', '') AS nofrag FROM r),
        |p AS (SELECT doc_id, raw_url,
        |        lower(regexp_extract(nofrag, '(?i)^(https?)://', 1)) AS scheme,
        |        regexp_replace(lower(regexp_extract(nofrag, '(?i)^https?://([^/?]+)', 1)), '^www\.', '') AS host,
        |        regexp_replace(regexp_extract(nofrag, '(?i)^https?://[^/?]+([^?]*)', 1), '/$', '') AS path,
        |        array_to_string(list_filter(string_split(regexp_extract(nofrag, '\?(.*)$', 1), '&'),
        |          q -> NOT (starts_with(q, 'utm_') OR starts_with(q, 'fbclid'))), '&') AS qk
        |      FROM n),
        |c AS (SELECT doc_id, raw_url,
        |        CASE WHEN host = '' THEN raw_url
        |             ELSE scheme || '://' || host || path ||
        |                  CASE WHEN qk <> '' THEN '?' || qk ELSE '' END
        |        END AS canonical_url
        |      FROM p)
        |SELECT canonical_url, count(*) AS n_docs,
        |       count(DISTINCT raw_url) AS n_raw_forms,
        |       min(doc_id) AS keep_doc
        |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,
    "q95_quality_keeper" ->
      """WITH p AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS q,
        |        CASE WHEN doc_id % 7 = 0
        |             THEN 'shared duplicate body ' || CAST(doc_id % 3 AS VARCHAR)
        |             ELSE text END AS t2
        |        FROM documents),
        |f AS (SELECT doc_id, q,
        |        md5(lower(regexp_replace(trim(t2), '\s+', ' ', 'g'))) AS fp FROM p),
        |r AS (SELECT fp, doc_id, q,
        |        row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rk,
        |        count(*) OVER (PARTITION BY fp) AS group_size
        |      FROM f)
        |SELECT fp, doc_id AS keep_id, q AS keep_quality, group_size
        |FROM r WHERE rk = 1 ORDER BY fp""".stripMargin,
    "q96_cluster_survivors" ->
      s"""WITH RECURSIVE pairs AS ($MinhashPairsBody),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         |lab AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
         |j AS (SELECT lab.cluster, lab.id, CAST(d.n_chars AS BIGINT) AS q
         |      FROM lab JOIN documents d ON lab.id = d.doc_id),
         |r AS (SELECT cluster, id, q,
         |        row_number() OVER (PARTITION BY cluster ORDER BY q DESC, id) AS rk,
         |        count(*) OVER (PARTITION BY cluster) AS cluster_size
         |      FROM j)
         |SELECT cluster, id AS keep_id, q AS keep_quality, cluster_size
         |FROM r WHERE rk = 1 ORDER BY cluster""".stripMargin,
    "q97_alpha_mixture" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang,
        |        CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM n),
        |q AS (SELECT lang,
        |        (2000 * w) // CAST((SELECT sum(w) FROM w) AS BIGINT) AS quota
        |      FROM w),
        |r AS (SELECT lang, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
        |          doc_id) AS mix_rank
        |      FROM documents)
        |SELECT r.doc_id, r.lang, CAST(mix_rank AS INT) AS mix_rank, quota
        |FROM r JOIN q USING (lang) WHERE mix_rank <= quota
        |ORDER BY lang, mix_rank""".stripMargin,
    "q98_domain_blocklist" ->
      s"""WITH u AS (
         |  SELECT 'https://' ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'www.'
         |         WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END ||
         |    'site' || CAST(doc_id % 17 AS VARCHAR) || '.net' ||
         |    CASE WHEN doc_id % 17 = 0 THEN ':8080' ELSE '' END ||
         |    '/page/' || CAST(doc_id % 7 AS VARCHAR) AS url,
         |    CASE WHEN doc_id % 17 = 5 AND doc_id % 2 = 0
         |           THEN 'click here to win a free prize'
         |         WHEN doc_id % 17 = 11 AND doc_id % 4 <> 0
         |           THEN '$BoilerplateBody'
         |         ELSE text END AS t2
         |  FROM documents),
         |e AS (SELECT
         |    regexp_extract(regexp_replace(lower(
         |        regexp_extract(url, '(?i)^https?://([^/?#]+)', 1)),
         |      ':[0-9]+$$', ''), '([^.]+\\.[^.]+)$$', 1) AS domain,
         |    md5(lower(regexp_replace(trim(t2), '\\s+', ' ', 'g'))) AS fp,
         |    CAST(len(t2) AS BIGINT) AS nc
         |  FROM u),
         |r AS (SELECT domain, count(*) AS n_docs,
         |        count(DISTINCT fp) AS n_unique,
         |        CAST(sum(nc) AS BIGINT) AS sum_chars
         |      FROM e GROUP BY domain)
         |SELECT domain, n_docs, n_unique, sum_chars,
         |  (n_docs >= 20 AND (100 * (n_docs - n_unique) > 25 * n_docs
         |                     OR sum_chars < 60 * n_docs)) AS blocked
         |FROM r ORDER BY domain""".stripMargin,
    "q99_data_card" ->
      s"""WITH b AS (SELECT source, lang, n_chars AS m,
         |             CAST(len(string_split_regex(trim(text), '\\s+'))
         |               AS BIGINT) AS toks FROM documents),
         |s AS (SELECT source, lang, count(*) AS n_docs,
         |        CAST(sum(toks) AS BIGINT) AS sum_tokens,
         |        CAST(sum(m) AS BIGINT) AS sum_chars
         |      FROM b GROUP BY source, lang),
         |h AS (SELECT source, lang, m, count(*) AS c
         |      FROM b GROUP BY source, lang, m),
         |cw AS (SELECT source, lang, m,
         |         CAST(sum(c) OVER (PARTITION BY source, lang ORDER BY m)
         |           AS BIGINT) AS cum,
         |         CAST(sum(c) OVER (PARTITION BY source, lang) AS BIGINT) AS n
         |       FROM h),
         |qv AS (SELECT source, lang,
         |         min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
         |               THEN m END) AS median_chars,
         |         min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT)
         |               THEN m END) AS p90_chars
         |       FROM cw GROUP BY source, lang)
         |SELECT s.source, s.lang, n_docs, sum_tokens, sum_chars,
         |       median_chars, p90_chars
         |FROM s JOIN qv USING (source, lang)
         |ORDER BY source, lang""".stripMargin,
    "q100_hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($DNTOKS) AS term FROM documents),
         |ct AS (SELECT doc_id AS d, term, count(*) AS tf_d FROM toks GROUP BY 1, 2),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n_corpus,
         |              (SELECT sum(tf_d) FROM ct) AS total_tokens),
         |dld AS (SELECT *, sum(tf_d) OVER (PARTITION BY d) AS dl,
         |               count(*) OVER (PARTITION BY term) AS df FROM ct),
         |wt AS (SELECT d, term, tf_d, dl,
         |         CAST(floor(1000000 / df) AS BIGINT) AS w,
         |         (10000 * 22 * tf_d * (total_tokens // n_corpus)) //
         |           (10 * (total_tokens // n_corpus) * tf_d
         |            + 3 * (total_tokens // n_corpus) + 9 * dl) AS tfc
         |       FROM dld, st
         |       WHERE df <= n_corpus * 0.78),
         |qt AS (SELECT d AS q, term, tf_d AS tf_q FROM ct WHERE d < 5),
         |sc AS (SELECT q, d, CAST(sum(tf_q * w * tfc) AS BIGINT) AS score
         |       FROM qt JOIN wt USING (term) GROUP BY 1, 2),
         |sp AS (SELECT q AS query, d AS item,
         |         row_number() OVER (PARTITION BY q ORDER BY score DESC, d) AS rank
         |       FROM sc QUALIFY rank <= 10),
         |qe AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |ce AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |de AS (SELECT qid AS query, cid AS item,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY list_cosine_similarity(cv, qv) DESC, cid) AS rank
         |       FROM ce CROSS JOIN qe WHERE qid <> cid QUALIFY rank <= 10),
         |u AS (SELECT * FROM sp UNION ALL SELECT * FROM de),
         |f AS (SELECT query, item,
         |        CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_score,
         |        count(*) AS n_lists FROM u GROUP BY 1, 2),
         |rr AS (SELECT *, row_number() OVER (PARTITION BY query
         |         ORDER BY rrf_score DESC, item) AS rnk FROM f)
         |SELECT query, item, rrf_score, n_lists, rnk
         |FROM rr WHERE rnk <= 10 ORDER BY query, rnk""".stripMargin,
    "q101_host_authority" -> {
      // One CTE pair per PageRank round, unrolled — integer fixed-point
      // makes every round's ranks bit-identical to the Spark loop.
      val rounds = (1 to 8).map { k =>
        s"""f$k AS (SELECT e.dst AS host, CAST(sum((p.r * e.w) // o.ow) AS BIGINT) AS inflow
           |      FROM p${k - 1} p JOIN ed e ON p.host = e.src JOIN o ON o.src = e.src GROUP BY 1),
           |p$k AS (SELECT h.host, CAST((15 * b.base + 85 * coalesce(f.inflow, 0)) // 100 AS BIGINT) AS r
           |      FROM h CROSS JOIN b LEFT JOIN f$k f ON f.host = h.host)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS (SELECT doc_id % 10 AS src, (doc_id // 10) % 10 AS dst, CAST(count(*) AS BIGINT) AS w
         |      FROM documents WHERE doc_id % 10 <> (doc_id // 10) % 10 GROUP BY 1, 2),
         |h AS (SELECT src AS host FROM ed UNION SELECT dst FROM ed),
         |b AS (SELECT CAST(1000000000 // count(*) AS BIGINT) AS base FROM h),
         |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM ed GROUP BY 1),
         |p0 AS (SELECT host, base AS r FROM h CROSS JOIN b),
         |$rounds
         |SELECT host, r AS authority FROM p8 ORDER BY authority DESC, host""".stripMargin
    },
    "q102_importance_select" ->
      s"""WITH toks AS (SELECT doc_id, source, unnest($DNTOKS) AS term FROM documents),
         |tb AS (SELECT doc_id, source = 'src0' AS is_tgt,
         |         ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS b FROM toks),
         |w AS (SELECT b, CAST((count(CASE WHEN is_tgt THEN 1 END) * 1000000) // count(*) AS BIGINT) AS w
         |      FROM tb GROUP BY b),
         |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |         CAST(sum(w.w) AS BIGINT) AS imp
         |       FROM tb JOIN w USING (b) WHERE NOT is_tgt GROUP BY doc_id),
         |fin AS (SELECT doc_id, n_toks, imp // n_toks AS imp_per_tok,
         |          row_number() OVER (ORDER BY imp // n_toks DESC, doc_id) AS rnk
         |        FROM ds)
         |SELECT doc_id, n_toks, CAST(imp_per_tok AS BIGINT) AS imp_per_tok, rnk
         |FROM fin WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    "q103_quality_classifier" ->
      s"""WITH $ClassifierChainSql
         |SELECT doc_id, is_spam, CAST(score AS BIGINT) AS score,
         |       CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS INT) AS pred
         |FROM cfin ORDER BY doc_id""".stripMargin,
    "q107_score_calibration" ->
      s"""WITH $ClassifierChainSql,
         |b AS (SELECT doc_id, is_spam, score,
         |        ntile(10) OVER (ORDER BY score, doc_id) AS bin FROM cfin)
         |SELECT CAST(bin AS INT) AS bin, count(*) AS n_docs,
         |       CAST(sum(is_spam) AS BIGINT) AS n_pos,
         |       CAST(min(score) AS BIGINT) AS min_score,
         |       CAST(max(score) AS BIGINT) AS max_score
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q108_release_diff" ->
      s"""WITH prev AS (SELECT doc_id, source, md5($DNORM) AS fp
         |              FROM documents WHERE doc_id % 13 <> 5),
         |cur0 AS (SELECT doc_id, source,
         |           CASE WHEN doc_id % 11 = 3 THEN text || ' rev2' ELSE text END AS text
         |         FROM documents WHERE doc_id % 19 <> 6),
         |cur AS (SELECT doc_id, source, md5($DNORM) AS fp FROM cur0),
         |j AS (SELECT coalesce(p.source, c.source) AS grp,
         |        CASE WHEN p.fp IS NULL THEN 'added'
         |             WHEN c.fp IS NULL THEN 'removed'
         |             WHEN p.fp = c.fp THEN 'unchanged' ELSE 'changed' END AS st
         |      FROM prev p FULL OUTER JOIN cur c USING (doc_id))
         |SELECT grp, CAST(count(CASE WHEN st = 'added' THEN 1 END) AS BIGINT) AS n_added,
         |       CAST(count(CASE WHEN st = 'removed' THEN 1 END) AS BIGINT) AS n_removed,
         |       CAST(count(CASE WHEN st = 'changed' THEN 1 END) AS BIGINT) AS n_changed,
         |       CAST(count(CASE WHEN st = 'unchanged' THEN 1 END) AS BIGINT) AS n_unchanged
         |FROM j GROUP BY grp ORDER BY grp""".stripMargin,
    "q109_contamination_sweep" -> {
      def leg(k: Int): String = {
        val hi = k - 1
        s"""g$k AS (SELECT doc_id, bkt,
           |        unnest(list_distinct(list_transform(range(1, len(tk) - ${k - 2}),
           |                 i -> md5(array_to_string(tk[i:i+$hi], ' '))))) AS gh
           |      FROM b WHERE len(tk) >= $k),
           |tr$k AS (SELECT * FROM (SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS df
           |                        FROM g$k WHERE bkt < 80) WHERE df <= 1000),
           |p$k AS (SELECT te.doc_id, count(DISTINCT tr.doc_id) AS ntr,
           |          count(DISTINCT te.gh) AS nsh
           |        FROM g$k te JOIN tr$k tr ON te.gh = tr.gh AND te.bkt >= 90
           |        GROUP BY te.doc_id),
           |s$k AS (SELECT CAST($k AS INT) AS gram_k,
           |          CAST(count(*) AS BIGINT) AS n_test_contaminated,
           |          CAST(coalesce(sum(ntr), 0) AS BIGINT) AS total_pairs,
           |          CAST(coalesce(sum(nsh), 0) AS BIGINT) AS total_shared_grams
           |        FROM p$k)""".stripMargin
      }
      s"""WITH b AS (SELECT doc_id, $DNTOKS AS tk,
         |             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
         |           FROM documents),
         |${leg(3)},
         |${leg(8)}
         |SELECT * FROM s3 UNION ALL SELECT * FROM s8 ORDER BY gram_k""".stripMargin
    },
    "q110_drift_monitor" ->
      s"""WITH b AS (SELECT lang,
         |             CASE WHEN (doc_id // 20) % 2 = 1 THEN 'new' ELSE 'old' END AS batch,
         |             n_chars + CASE WHEN lang = 'de' AND (doc_id // 20) % 2 = 1
         |                            THEN 200 ELSE 0 END AS m
         |           FROM documents),
         |h AS (SELECT lang, batch, m, count(*) AS c FROM b GROUP BY lang, batch, m),
         |cw AS (SELECT lang, batch, m,
         |         CAST(sum(c) OVER (PARTITION BY lang, batch ORDER BY m) AS BIGINT) AS cum,
         |         CAST(sum(c) OVER (PARTITION BY lang, batch) AS BIGINT) AS n
         |       FROM h),
         |qv AS (SELECT lang, batch,
         |         min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT) THEN m END) AS p50,
         |         min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT) THEN m END) AS p90
         |       FROM cw GROUP BY lang, batch),
         |p AS (SELECT lang,
         |        CAST(max(CASE WHEN batch = 'old' THEN p50 END) AS BIGINT) AS median_old,
         |        CAST(max(CASE WHEN batch = 'new' THEN p50 END) AS BIGINT) AS median_new,
         |        CAST(max(CASE WHEN batch = 'old' THEN p90 END) AS BIGINT) AS p90_old,
         |        CAST(max(CASE WHEN batch = 'new' THEN p90 END) AS BIGINT) AS p90_new
         |      FROM qv GROUP BY lang)
         |SELECT lang, median_old, median_new, p90_old, p90_new,
         |       CAST(CASE WHEN abs(median_new - median_old) * 10 > median_old * 2
         |                 THEN 1 ELSE 0 END AS INT) AS drift
         |FROM p ORDER BY lang""".stripMargin,
    "q111_tokenizer_fertility" ->
      s"""WITH b AS (SELECT lang,
         |             CAST(len($DTOKS) AS BIGINT) AS toks,
         |             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS subs
         |           FROM documents),
         |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(toks) AS BIGINT) AS total_tokens,
         |        CAST(sum(subs) AS BIGINT) AS total_subwords
         |      FROM b GROUP BY lang)
         |SELECT lang, n_docs, total_tokens, total_subwords,
         |       CAST((total_subwords * 1000000) // total_tokens AS BIGINT) AS fertility_ppm
         |FROM s ORDER BY lang""".stripMargin,
    "q112_truncation_loss" ->
      s"""WITH b AS (SELECT CAST(len($DTOKS) AS BIGINT) AS n_tokens FROM documents),
         |e AS (SELECT n_tokens, unnest([64, 128, 192, 256]) AS max_len FROM b)
         |SELECT CAST(max_len AS BIGINT) AS max_len,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN n_tokens > max_len THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
         |       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |       CAST(sum(least(n_tokens, max_len)) AS BIGINT) AS tokens_kept,
         |       CAST(sum(least(n_tokens, max_len)) * 1000000 // sum(n_tokens) AS BIGINT) AS kept_ppm
         |FROM e GROUP BY max_len ORDER BY max_len""".stripMargin,
    "q113_dedup_survivorship" ->
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars, md5($DNORM) AS fp FROM documents),
         |k AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM d)
         |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       CAST(sum(CASE WHEN doc_id <> keep_id THEN n_chars ELSE 0 END) AS BIGINT) AS chars_removed,
         |       CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS removed_ppm
         |FROM k GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q114_cross_split_neardup" ->
      s"""WITH pairs AS (SELECT * FROM ($MinhashPairsBody) pp),
         |tok AS (SELECT doc_id, $DNTOKS AS tk,
         |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
         |        FROM documents),
         |sd AS (SELECT doc_id, bkt,
         |         list_distinct(CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
         |              ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END) AS sd
         |       FROM tok),
         |cr AS (SELECT CASE WHEN a.bkt < 80 THEN p.id_a ELSE p.id_b END AS train_id,
         |              CASE WHEN a.bkt < 80 THEN p.id_b ELSE p.id_a END AS eval_id
         |       FROM pairs p JOIN sd a ON p.id_a = a.doc_id JOIN sd b ON p.id_b = b.doc_id
         |       WHERE (a.bkt < 80 AND b.bkt >= 90) OR (a.bkt >= 90 AND b.bkt < 80)),
         |j AS (SELECT c.train_id, c.eval_id,
         |        CAST(len(list_intersect(e.sd, t2.sd)) AS DOUBLE)
         |          / (len(e.sd) + len(t2.sd) - len(list_intersect(e.sd, t2.sd))) AS jaccard
         |      FROM cr c JOIN sd e ON c.eval_id = e.doc_id JOIN sd t2 ON c.train_id = t2.doc_id),
         |best AS (SELECT eval_id, train_id AS best_train_id, jaccard AS best_jaccard FROM j
         |         QUALIFY row_number() OVER (PARTITION BY eval_id ORDER BY jaccard DESC, train_id) = 1),
         |agg AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_train_matches FROM j GROUP BY eval_id)
         |SELECT a.eval_id, a.n_train_matches, b.best_train_id, b.best_jaccard
         |FROM agg a JOIN best b USING (eval_id) ORDER BY eval_id""".stripMargin,
    "q121_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(t) AS t2, min(t1) AS t1 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND t >= t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(t) AS t3, min(t2) AS t2 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t >= t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 'signup>click' AS stage, CAST(count(*) AS BIGINT) AS n_users,
        |         quantile_cont(t2 - t1, 0.5) AS median_latency_ns,
        |         quantile_cont(t2 - t1, 0.9) AS p90_latency_ns FROM s2
        |  UNION ALL
        |  SELECT 'click>purchase', count(*),
        |         quantile_cont(t3 - t2, 0.5), quantile_cont(t3 - t2, 0.9) FROM s3)
        |ORDER BY stage""".stripMargin,
    "q122_knn_label" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS tl
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv, label
        |      FROM embeddings WHERE vec_id >= 50),
        |s AS (SELECT qid, cid, label, list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q),
        |r AS (SELECT qid, label FROM s
        |      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) <= 10),
        |v AS (SELECT qid, label, count(*) AS n FROM r GROUP BY qid, label),
        |p AS (SELECT qid, label AS predicted_label FROM v
        |      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY n DESC, label) = 1)
        |SELECT p.qid AS query_id, CAST(p.predicted_label AS INT) AS predicted_label,
        |       CAST(q.tl AS INT) AS true_label,
        |       CAST(CASE WHEN p.predicted_label = q.tl THEN 1 ELSE 0 END AS INT) AS correct
        |FROM p JOIN q ON p.qid = q.qid ORDER BY query_id""".stripMargin,
    "q124_ngram_diversity" ->
      s"""WITH g AS (SELECT lang, source,
         |             CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
         |                  ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END AS sh
         |           FROM (SELECT lang, source, $DNTOKS AS tk FROM documents)),
         |tot AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(len(sh)) AS BIGINT) AS total_grams,
         |          CAST(sum(len(list_distinct(sh))) AS BIGINT) AS doc_distinct_grams
         |        FROM g GROUP BY lang, source),
         |d AS (SELECT lang, source, CAST(count(DISTINCT h) AS BIGINT) AS distinct_grams
         |      FROM (SELECT lang, source, md5(unnest(list_distinct(sh))) AS h FROM g)
         |      GROUP BY lang, source)
         |SELECT lang, source, n_docs, total_grams, distinct_grams, doc_distinct_grams,
         |       CAST(CASE WHEN total_grams > 0 THEN distinct_grams * 1000000 // total_grams
         |            ELSE 0 END AS BIGINT) AS ttr_ppm
         |FROM tot JOIN d USING (lang, source) ORDER BY lang, source""".stripMargin,
    "q125_dup_multiplicity" ->
      s"""WITH d AS (SELECT md5($DNORM) AS fp, lang, n_chars FROM documents),
         |g AS (SELECT fp, CAST(count(*) AS BIGINT) AS m,
         |        CAST(count(DISTINCT lang) AS BIGINT) AS nl,
         |        CAST(sum(n_chars) AS BIGINT) AS chars
         |      FROM d GROUP BY fp)
         |SELECT CAST(least(m, 5) AS BIGINT) AS multiplicity, nl AS n_langs,
         |       CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(m) AS BIGINT) AS n_docs,
         |       CAST(sum(chars) AS BIGINT) AS total_chars
         |FROM g GROUP BY 1, 2 ORDER BY multiplicity, n_langs""".stripMargin,
    "q138_hist_quantiles" ->
      """WITH d AS (SELECT lang, n_chars FROM documents),
        |sk AS (SELECT lang, least(n_chars // 16, 255) AS bucket,
        |         CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
        |cu AS (SELECT lang, bucket, c,
        |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY bucket) AS BIGINT) AS cum,
        |         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |       FROM sk),
        |e AS (SELECT lang,
        |        CAST(min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |              THEN bucket * 16 + 15 END) AS BIGINT) AS est_p50,
        |        CAST(min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT)
        |              THEN bucket * 16 + 15 END) AS BIGINT) AS est_p90
        |      FROM cu GROUP BY lang),
        |h AS (SELECT lang, n_chars AS m, count(*) AS c2 FROM d GROUP BY 1, 2),
        |hc AS (SELECT lang, m,
        |         CAST(sum(c2) OVER (PARTITION BY lang ORDER BY m) AS BIGINT) AS cum2,
        |         CAST(sum(c2) OVER (PARTITION BY lang) AS BIGINT) AS n2
        |       FROM h),
        |x AS (SELECT lang,
        |        CAST(min(CASE WHEN cum2 >= CAST(ceil(0.5 * n2) AS BIGINT) THEN m END) AS BIGINT) AS exact_p50,
        |        CAST(min(CASE WHEN cum2 >= CAST(ceil(0.9 * n2) AS BIGINT) THEN m END) AS BIGINT) AS exact_p90
        |      FROM hc GROUP BY lang)
        |SELECT lang, est_p50, exact_p50, est_p90, exact_p90,
        |       CAST((est_p50 - exact_p50) * 1000000 // exact_p50 AS BIGINT) AS err_p50_ppm,
        |       CAST((est_p90 - exact_p90) * 1000000 // exact_p90 AS BIGINT) AS err_p90_ppm
        |FROM e JOIN x USING (lang) ORDER BY lang""".stripMargin,
    "q139_pr_curve" ->
      s"""WITH $ClassifierChainSql,
         |bd AS (SELECT min(score) AS lo, max(score) AS hi FROM cfin),
         |h AS (SELECT ((score - lo) * 64) // (hi - lo + 1) AS cell,
         |         CAST(min(score) AS BIGINT) AS threshold,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(is_spam) AS BIGINT) AS n_pos
         |       FROM cfin CROSS JOIN bd GROUP BY 1),
         |c AS (SELECT cell, threshold,
         |         CAST(sum(n_pos) OVER (ORDER BY cell DESC) AS BIGINT) AS tp,
         |         CAST(sum(n) OVER (ORDER BY cell DESC) AS BIGINT) AS pp
         |       FROM h),
         |ptot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS p FROM h)
         |SELECT threshold, tp, pp - tp AS fp, p - tp AS fn,
         |       tp * 1000000 // pp AS precision_ppm,
         |       tp * 1000000 // p AS recall_ppm,
         |       CAST(CASE WHEN tp = 0 THEN 0 ELSE
         |         (2 * (tp * 1000000 // pp) * (tp * 1000000 // p))
         |           // ((tp * 1000000 // pp) + (tp * 1000000 // p))
         |       END AS BIGINT) AS f1_ppm
         |FROM c CROSS JOIN ptot ORDER BY threshold""".stripMargin,
    "q140_gate_kappa" -> {
      val gateNames = Seq("len_ok", "word_len_ok", "alpha_ok", "stop_ok", "rep_ok")
      val pairSelects = (for {
        i <- gateNames.indices; j <- i + 1 until gateNames.length
      } yield {
        val (a, b) = (gateNames(i), gateNames(j))
        s"""SELECT '$a' AS gate_a, '$b' AS gate_b,
           |  CAST(count(CASE WHEN $a = 0 AND $b = 0 THEN 1 END) AS BIGINT) AS n00,
           |  CAST(count(CASE WHEN $a = 0 AND $b = 1 THEN 1 END) AS BIGINT) AS n01,
           |  CAST(count(CASE WHEN $a = 1 AND $b = 0 THEN 1 END) AS BIGINT) AS n10,
           |  CAST(count(CASE WHEN $a = 1 AND $b = 1 THEN 1 END) AS BIGINT) AS n11
           |FROM f""".stripMargin
      }).mkString("\nUNION ALL\n")
      s"""WITH toks AS (SELECT $DTOKS AS tk, $DNTOKS AS nt FROM documents),
         |sh AS (SELECT tk,
         |        CASE WHEN len(nt) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(nt) - 1), i -> array_to_string(nt[i:i+2], ' ')) END AS s
         |       FROM toks),
         |f AS (SELECT
         |        CASE WHEN len(tk) >= 30 THEN 1 ELSE 0 END AS len_ok,
         |        CASE WHEN list_sum(list_transform(tk, t -> len(t))) * 1000 >= len(tk) * 3000
         |              AND list_sum(list_transform(tk, t -> len(t))) * 1000 <= len(tk) * 10000
         |             THEN 1 ELSE 0 END AS word_len_ok,
         |        CASE WHEN len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) * 5 >= len(tk) * 4
         |             THEN 1 ELSE 0 END AS alpha_ok,
         |        CASE WHEN len(list_filter(tk, t -> list_contains($DSTOP, t))) >= 2
         |             THEN 1 ELSE 0 END AS stop_ok,
         |        CASE WHEN (len(s) - len(list_distinct(s))) * 5 <= len(s)
         |             THEN 1 ELSE 0 END AS rep_ok
         |      FROM sh),
         |pairs AS ($pairSelects),
         |k AS (SELECT *, n00 + n01 + n10 + n11 AS n,
         |        CAST(n11 + n10 AS HUGEINT) * CAST(n11 + n01 AS HUGEINT)
         |          + CAST(n00 + n01 AS HUGEINT) * CAST(n00 + n10 AS HUGEINT) AS pe
         |      FROM pairs)
         |SELECT gate_a, gate_b, n00, n01, n10, n11,
         |       (n00 + n11) * 1000000 // n AS agree_ppm,
         |       CAST(CASE
         |         WHEN CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - pe = 0 THEN 0
         |         WHEN CAST(n AS HUGEINT) * CAST(n11 + n00 AS HUGEINT) - pe < 0 THEN
         |           -(((pe - CAST(n AS HUGEINT) * CAST(n11 + n00 AS HUGEINT)) * 1000000)
         |             // (CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - pe))
         |         ELSE ((CAST(n AS HUGEINT) * CAST(n11 + n00 AS HUGEINT) - pe) * 1000000)
         |             // (CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - pe)
         |       END AS BIGINT) AS kappa_ppm
         |FROM k ORDER BY gate_a, gate_b""".stripMargin
    },
    "q141_label_centroids" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s FROM e),
        |codes AS (SELECT label, i AS pos,
        |            CAST(floor(v[i] / s * 127.0 + 0.5) AS BIGINT) AS c
        |          FROM e CROSS JOIN sc CROSS JOIN range(1, 65) AS r(i)),
        |sums AS (SELECT label, pos, CAST(sum(c) AS BIGINT) AS sm
        |         FROM codes GROUP BY 1, 2),
        |cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs FROM e GROUP BY 1),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |           sum(CAST(a.sm AS HUGEINT) * CAST(b.sm AS HUGEINT)) AS dot_h
        |         FROM sums a JOIN sums b USING (pos)
        |         WHERE a.label < b.label GROUP BY 1, 2),
        |norms AS (SELECT label, sum(CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT)) AS n2
        |          FROM sums GROUP BY 1)
        |SELECT label_a, label_b, ca.n_vecs AS n_a, cb.n_vecs AS n_b,
        |       CAST(dot_h AS BIGINT) AS dot,
        |       CAST(na.n2 AS BIGINT) AS norm2_a,
        |       CAST(nb.n2 AS BIGINT) AS norm2_b,
        |       CAST(CASE WHEN na.n2 * nb.n2 = 0 THEN 0
        |         WHEN dot_h < 0 THEN -((dot_h * dot_h * 1000000) // (na.n2 * nb.n2))
        |         ELSE (dot_h * dot_h * 1000000) // (na.n2 * nb.n2)
        |       END AS BIGINT) AS sim2_ppm
        |FROM dots
        |JOIN norms na ON na.label = dots.label_a
        |JOIN norms nb ON nb.label = dots.label_b
        |JOIN cnt ca ON ca.label = dots.label_a
        |JOIN cnt cb ON cb.label = dots.label_b
        |ORDER BY label_a, label_b""".stripMargin,
    "q142_maxsim" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 4),
        |c AS (SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings WHERE vec_id >= 4),
        |s AS (SELECT label, qid, list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q),
        |m AS (SELECT label, qid, max(sim) AS ms FROM s GROUP BY 1, 2),
        |p AS (SELECT label,
        |        max(CASE WHEN qid = 0 THEN ms END) AS m0,
        |        max(CASE WHEN qid = 1 THEN ms END) AS m1,
        |        max(CASE WHEN qid = 2 THEN ms END) AS m2,
        |        max(CASE WHEN qid = 3 THEN ms END) AS m3
        |      FROM m GROUP BY label)
        |SELECT label, m0, m1, m2, m3,
        |       ((m0 + m1) + m2) + m3 AS maxsim_score
        |FROM p ORDER BY label""".stripMargin,
    "q143_native_topk" ->
      """SELECT lang, source, doc_id, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang, source
        |                           ORDER BY n_chars DESC, doc_id) <= 3
        |ORDER BY lang, source, n_chars DESC, doc_id""".stripMargin,
    "q144_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s),
        |sess AS (SELECT user_id, session_seq, min(ts_us) AS s_start, max(ts_us) AS s_end
        |         FROM s2 GROUP BY 1, 2),
        |d AS (SELECT user_id, session_seq, s_start AS t, 1 AS delta FROM sess
        |      UNION ALL
        |      SELECT user_id, session_seq, s_end AS t, -1 AS delta FROM sess),
        |c AS (SELECT *, CAST(sum(delta) OVER (ORDER BY t, delta DESC, user_id, session_seq
        |                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d)
        |SELECT (t // 3600000000) * 3600 AS hour_epoch,
        |       CAST(count(CASE WHEN delta = 1 THEN 1 END) AS BIGINT) AS n_starts,
        |       CAST(count(CASE WHEN delta = -1 THEN 1 END) AS BIGINT) AS n_ends,
        |       CAST(max(cum) AS BIGINT) AS peak_concurrency,
        |       CAST(sum(sum(delta)) OVER (ORDER BY (t // 3600000000) * 3600
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_concurrency
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q145_vocab_drift" ->
      s"""WITH toks AS (SELECT source, unnest($DNTOKS) AS token FROM documents),
         |st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS o
         |       FROM toks GROUP BY 1, 2),
         |tk AS (SELECT token, CAST(sum(o) AS BIGINT) AS rt FROM st GROUP BY 1),
         |top AS (SELECT token, rt FROM tk ORDER BY rt DESC, token LIMIT 30),
         |src AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM st GROUP BY 1),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM src)
         |SELECT src.source, top.token,
         |       coalesce(st.o, 0) AS obs_count,
         |       (coalesce(st.o, 0) * 1000000) // ct AS source_share_ppm,
         |       (rt * 1000000) // n AS corpus_share_ppm,
         |       (coalesce(st.o, 0) * 1000000) // ct - (rt * 1000000) // n AS drift_ppm
         |FROM src CROSS JOIN top
         |LEFT JOIN st ON st.source = src.source AND st.token = top.token
         |CROSS JOIN tot
         |ORDER BY src.source, top.token""".stripMargin,
    "q146_asof_snapshots" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        |b AS (SELECT min(ts_ns) AS lo, max(ts_ns) AS hi FROM e),
        |cuts AS (SELECT CAST(i AS INT) AS cut_id, lo + ((hi - lo) // 4) * i AS cut_ns
        |         FROM b CROSS JOIN range(1, 4) AS r(i)),
        |j AS (SELECT cut_id, e.* FROM e JOIN cuts ON ts_ns <= cut_ns),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY cut_id, user_id
        |                           ORDER BY ts_ns DESC, event_id DESC) AS rn,
        |        count(*) OVER (PARTITION BY cut_id, user_id) AS n_events
        |      FROM j)
        |SELECT cut_id, user_id, event_type AS last_event_type,
        |       event_id AS last_event_id, CAST(n_events AS BIGINT) AS n_events
        |FROM r WHERE rn = 1 ORDER BY cut_id, user_id""".stripMargin,
    "q137_lang_confusion" -> {
      val en = langScore(Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as"))
      val es = langScore(Seq("el", "la", "de", "que", "y", "en", "un", "los", "por", "con"))
      val fr = langScore(Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "pour"))
      val de = langScore(Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"))
      s"""WITH s AS (SELECT lang, $en AS s_en, $es AS s_es, $fr AS s_fr, $de AS s_de FROM documents),
         |b AS (SELECT *, greatest(s_en, s_es, s_fr, s_de) AS best FROM s),
         |p AS (SELECT lang,
         |        CASE WHEN best > 0 AND s_en = best THEN 'en'
         |             WHEN best > 0 AND s_es = best THEN 'es'
         |             WHEN best > 0 AND s_fr = best THEN 'fr'
         |             WHEN best > 0 AND s_de = best THEN 'de'
         |             ELSE 'und' END AS lang_pred
         |      FROM b),
         |m AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |      FROM p GROUP BY 1, 2)
         |SELECT lang, lang_pred, n_docs,
         |       CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS row_ppm
         |FROM m ORDER BY lang, lang_pred""".stripMargin
    },
    "q136_hard_negatives" ->
      """WITH c AS (SELECT vec_id AS negative_id, CAST(embedding AS DOUBLE[]) AS cv,
        |                  label AS negative_label FROM embeddings),
        |q AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qv,
        |             label AS anchor_label FROM embeddings WHERE vec_id < 20),
        |s AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
        |        list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q WHERE negative_label <> anchor_label),
        |r AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
        |        row_number() OVER (PARTITION BY anchor_id
        |          ORDER BY sim DESC, negative_id) AS neg_rank
        |      FROM s)
        |SELECT anchor_id, CAST(anchor_label AS INT) AS anchor_label,
        |       CAST(neg_rank AS BIGINT) AS neg_rank, negative_id,
        |       CAST(negative_label AS INT) AS negative_label
        |FROM r WHERE neg_rank <= 5 ORDER BY anchor_id, neg_rank""".stripMargin,
    "q135_cms_rollup" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |r AS (SELECT unnest(range(0, 4)) AS r),
        |daily AS (SELECT day, r.r,
        |            ('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS lane,
        |            CAST(count(*) AS BIGINT) AS cell_n
        |          FROM e CROSS JOIN r GROUP BY 1, 2, 3),
        |weekly AS (SELECT day // 7 AS week, r, lane, CAST(sum(cell_n) AS BIGINT) AS cell_n
        |           FROM daily GROUP BY 1, 2, 3),
        |top AS (SELECT user_id FROM e GROUP BY user_id
        |        ORDER BY count(*) DESC, user_id LIMIT 5),
        |ex AS (SELECT day // 7 AS week, user_id, CAST(count(*) AS BIGINT) AS n
        |       FROM e JOIN top USING (user_id) GROUP BY 1, 2),
        |probes AS (SELECT ex.week, ex.user_id, ex.n, r.r,
        |             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || CAST(ex.user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS lane
        |           FROM ex CROSS JOIN r),
        |est AS (SELECT p.week, p.user_id, p.n, min(w.cell_n) AS cms_estimate
        |        FROM probes p JOIN weekly w ON p.week = w.week AND p.r = w.r AND p.lane = w.lane
        |        GROUP BY 1, 2, 3)
        |SELECT week, user_id, n, cms_estimate,
        |       CAST((cms_estimate - n) * 1000000 // n AS BIGINT) AS over_ppm
        |FROM est ORDER BY week, user_id""".stripMargin,
    "q134_cms_heavy" ->
      """WITH e AS (SELECT user_id FROM events),
        |r AS (SELECT unnest(range(0, 4)) AS r),
        |cells AS (SELECT r.r,
        |            ('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS lane,
        |            CAST(count(*) AS BIGINT) AS cell_n
        |          FROM e CROSS JOIN r GROUP BY 1, 2),
        |top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM e
        |        GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20),
        |probes AS (SELECT t.user_id, t.n, r.r,
        |             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || CAST(t.user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS lane
        |           FROM top t CROSS JOIN r),
        |est AS (SELECT p.user_id, p.n, min(c.cell_n) AS cms_estimate
        |        FROM probes p JOIN cells c ON p.r = c.r AND p.lane = c.lane
        |        GROUP BY p.user_id, p.n)
        |SELECT user_id, n, cms_estimate,
        |       CAST((cms_estimate - n) * 1000000 // n AS BIGINT) AS over_ppm
        |FROM est ORDER BY n DESC, user_id""".stripMargin,
    "q133_signal_covariance" ->
      s"""WITH toks AS (SELECT lang, n_chars, $DTOKS AS tk, $DNTOKS AS nt FROM documents),
         |sh AS (SELECT lang, n_chars, tk,
         |        CASE WHEN len(nt) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(nt) - 1), i -> array_to_string(nt[i:i+2], ' ')) END AS s
         |       FROM toks),
         |f AS (SELECT lang, n_chars,
         |        (CASE WHEN len(tk) >= 30 THEN 1 ELSE 0 END)
         |        * (CASE WHEN list_sum(list_transform(tk, t -> len(t))) * 1000 >= len(tk) * 3000
         |                 AND list_sum(list_transform(tk, t -> len(t))) * 1000 <= len(tk) * 10000
         |                THEN 1 ELSE 0 END)
         |        * (CASE WHEN len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) * 5 >= len(tk) * 4
         |                THEN 1 ELSE 0 END)
         |        * (CASE WHEN len(list_filter(tk, t -> list_contains($DSTOP, t))) >= 2
         |                THEN 1 ELSE 0 END)
         |        * (CASE WHEN (len(s) - len(list_distinct(s))) * 5 <= len(s)
         |                THEN 1 ELSE 0 END) AS y
         |      FROM sh),
         |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(n_chars) AS HUGEINT) AS sum_chars,
         |        CAST(sum(y) AS BIGINT) AS n_pass,
         |        CAST(sum(n_chars * y) AS HUGEINT) AS sum_xy
         |      FROM f GROUP BY lang)
         |SELECT lang, n_docs, n_pass,
         |       CAST(CAST(n_docs AS HUGEINT) * sum_xy
         |            - sum_chars * CAST(n_pass AS HUGEINT) AS BIGINT) AS cov_scaled
         |FROM a ORDER BY lang""".stripMargin,
    "q132_cross_source_dups" ->
      s"""WITH pairs AS (SELECT * FROM ($MinhashPairsBody) pp),
         |lab AS (SELECT least(a.source, b.source) AS source_lo,
         |               greatest(a.source, b.source) AS source_hi
         |        FROM pairs p
         |        JOIN documents a ON p.id_a = a.doc_id
         |        JOIN documents b ON p.id_b = b.doc_id)
         |SELECT source_lo, source_hi, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(CASE WHEN source_lo = source_hi THEN 1 ELSE 0 END AS INT) AS intra_source
         |FROM lab GROUP BY source_lo, source_hi
         |ORDER BY source_lo, source_hi""".stripMargin,
    "q131_heavy_hitters" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY user_id),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
        |SELECT user_id, n,
        |       CAST(n * 1000000 // (SELECT total FROM t) AS BIGINT) AS share_ppm
        |FROM c ORDER BY n DESC, user_id LIMIT 20""".stripMargin,
    "q130_pack_fill" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_chars, shard,
        |         CAST(floor((SUM(n_chars) OVER win - n_chars) / 4000.0) AS BIGINT) AS pack_bin
        |  FROM s WINDOW win AS (PARTITION BY shard ORDER BY doc_id)),
        |bins AS (SELECT shard, pack_bin, CAST(sum(n_chars) AS BIGINT) AS bin_chars,
        |           CAST(count(*) AS BIGINT) AS n_docs
        |         FROM b GROUP BY shard, pack_bin)
        |SELECT CAST(least((bin_chars * 10) // 4000, 12) AS BIGINT) AS fill_bucket,
        |       CAST(count(*) AS BIGINT) AS n_bins, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |       CAST(min(bin_chars) AS BIGINT) AS min_chars,
        |       CAST(max(bin_chars) AS BIGINT) AS max_chars
        |FROM bins GROUP BY 1 ORDER BY fill_bucket""".stripMargin,
    "q129_filter_ablation" ->
      s"""WITH toks AS (SELECT n_chars, $DTOKS AS tk, $DNTOKS AS nt FROM documents),
         |sh AS (SELECT n_chars, tk,
         |        CASE WHEN len(nt) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(nt) - 1), i -> array_to_string(nt[i:i+2], ' ')) END AS s
         |       FROM toks),
         |f AS (SELECT n_chars,
         |        CASE WHEN len(tk) >= 30 THEN 1 ELSE 0 END AS len_ok,
         |        CASE WHEN list_sum(list_transform(tk, t -> len(t))) * 1000 >= len(tk) * 3000
         |              AND list_sum(list_transform(tk, t -> len(t))) * 1000 <= len(tk) * 10000
         |             THEN 1 ELSE 0 END AS word_len_ok,
         |        CASE WHEN len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) * 5 >= len(tk) * 4
         |             THEN 1 ELSE 0 END AS alpha_ok,
         |        CASE WHEN len(list_filter(tk, t -> list_contains($DSTOP, t))) >= 2
         |             THEN 1 ELSE 0 END AS stop_ok,
         |        CASE WHEN (len(s) - len(list_distinct(s))) * 5 <= len(s)
         |             THEN 1 ELSE 0 END AS rep_ok
         |      FROM sh)
         |SELECT CAST(len_ok AS INT) AS len_ok, CAST(word_len_ok AS INT) AS word_len_ok,
         |       CAST(alpha_ok AS INT) AS alpha_ok, CAST(stop_ok AS INT) AS stop_ok,
         |       CAST(rep_ok AS INT) AS rep_ok,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       CAST(count(*) * 1000000 // (SELECT count(*) FROM documents) AS BIGINT) AS share_ppm
         |FROM f GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    "q127_dup_by_quality" ->
      s"""WITH RECURSIVE pairs AS ($MinhashPairsBody),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         |lab AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
         |dup AS (SELECT id FROM lab WHERE id <> cluster),
         |b AS (SELECT lang, doc_id,
         |        ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bin
         |      FROM documents)
         |SELECT lang, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN dup.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardups,
         |       CAST(sum(CASE WHEN dup.id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |            // count(*) AS BIGINT) AS neardup_ppm
         |FROM b LEFT JOIN dup ON b.doc_id = dup.id
         |GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "q128_zipf_table" ->
      s"""WITH tok AS (SELECT lang, unnest($DNTOKS) AS token FROM documents),
         |c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n_occurrences
         |      FROM tok GROUP BY lang, token)
         |SELECT lang, CAST(row_number() OVER w AS BIGINT) AS rank, token, n_occurrences
         |FROM c WINDOW w AS (PARTITION BY lang ORDER BY n_occurrences DESC, token)
         |QUALIFY row_number() OVER w <= 20
         |ORDER BY lang, rank""".stripMargin,
    "q126_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cv, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, e.v AS cv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id, qr FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 20)
         |        WHERE qr <= 8),
         |np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
         |s AS (SELECT qid, corpus_id, qr, list_cosine_similarity(cv, qv) AS sim
         |      FROM asg JOIN probes USING (cell_id) WHERE qid <> corpus_id),
         |r AS (SELECT np.nprobe, s.qid, s.corpus_id,
         |        row_number() OVER (PARTITION BY np.nprobe, s.qid
         |          ORDER BY s.sim DESC, s.corpus_id) AS rnk
         |      FROM s JOIN np ON s.qr <= np.nprobe),
         |ap AS (SELECT nprobe, qid, corpus_id FROM r WHERE rnk <= 10),
         |ex AS (SELECT qid, cid FROM (
         |        SELECT q.qid, c.cid,
         |               row_number() OVER (PARTITION BY q.qid
         |                 ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid) AS rnk
         |        FROM (SELECT vec_id AS cid, v AS cv FROM e) c
         |        CROSS JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20) q
         |        WHERE qid <> cid) WHERE rnk <= 10),
         |tc AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM ex),
         |j AS (SELECT ap.nprobe, ap.qid,
         |        CASE WHEN ex.qid IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM ap LEFT JOIN ex ON ap.qid = ex.qid AND ap.corpus_id = ex.cid)
         |SELECT CAST(nprobe AS INT) AS nprobe,
         |       CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
         |       CAST(count(*) AS BIGINT) AS n_retrieved,
         |       CAST(sum(hit) AS BIGINT) AS n_hits,
         |       (SELECT n_truth FROM tc) AS n_truth,
         |       CAST(sum(hit) * 1000000 // (SELECT n_truth FROM tc) AS BIGINT) AS recall_ppm
         |FROM j GROUP BY nprobe ORDER BY nprobe""".stripMargin,
    "q123_lsh_recall" ->
      s"""WITH cand AS (SELECT * FROM ($MinhashPairsBody) c),
         |s AS (SELECT doc_id, lang, source,
         |        list_distinct(CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
         |             ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END) AS sh
         |      FROM (SELECT doc_id, lang, source, $DNTOKS AS tk FROM documents)),
         |t AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
         |        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni
         |      FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |      WHERE len(a.sh) > 0 AND len(b.sh) > 0),
         |tb AS (SELECT id_a, id_b, (inter * 20) // uni AS bucket FROM t WHERE inter > 0),
         |j AS (SELECT tb.bucket, CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS caught
         |      FROM tb LEFT JOIN cand c ON tb.id_a = c.id_a AND tb.id_b = c.id_b)
         |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_true_pairs,
         |       CAST(sum(caught) AS BIGINT) AS n_caught,
         |       CAST(sum(caught) * 1000000 // count(*) AS BIGINT) AS caught_ppm
         |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q115_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND t >= t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t >= t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
        |  UNION ALL
        |  SELECT 2, 'signup>click', count(*) FROM s2
        |  UNION ALL
        |  SELECT 3, 'signup>click>purchase', count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "q116_retention_cohorts" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q117_group_topk" ->
      """SELECT lang, CAST(row_number() OVER w AS BIGINT) AS rank, doc_id, n_chars
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY lang, rank""".stripMargin,
    "q119_packed_layout" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_chars, shard,
        |         CAST(floor((SUM(n_chars) OVER win - n_chars) / 4000.0) AS BIGINT) AS pack_bin
        |  FROM s WINDOW win AS (PARTITION BY shard ORDER BY doc_id))
        |SELECT shard, pack_bin, doc_id,
        |       CAST(row_number() OVER w2 AS BIGINT) AS seq_pos,
        |       CAST(sum(n_chars) OVER w2 - n_chars AS BIGINT) AS start_offset
        |FROM b WINDOW w2 AS (PARTITION BY shard, pack_bin ORDER BY doc_id)
        |ORDER BY shard, pack_bin, seq_pos""".stripMargin,
    // the incremental merge must be indistinguishable from the full
    // recompute — so its oracle IS the full recompute
    "q118_incremental_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q104_weighted_sample" ->
      s"""WITH pri AS (
         |  SELECT doc_id, lang, n_chars,
         |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824 AS DOUBLE)
         |           / CAST(n_chars AS DOUBLE) AS p
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT doc_id, lang, n_chars,
         |        row_number() OVER (PARTITION BY lang ORDER BY p, doc_id) AS samp_rank
         |      FROM pri)
         |SELECT doc_id, lang, n_chars, CAST(samp_rank AS INT) AS samp_rank
         |FROM r WHERE samp_rank <= 50 ORDER BY lang, samp_rank""".stripMargin,
    "q105_epoch_plan" ->
      s"""WITH avail AS (
         |  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len($DTOKS)) AS BIGINT) AS avail_tokens
         |  FROM documents GROUP BY source),
         |w AS (SELECT *, CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE))) AS BIGINT) AS w
         |      FROM avail),
         |s AS (SELECT *, CAST(sum(w) OVER () AS BIGINT) AS wsum FROM w),
         |fin AS (SELECT stratum, n_docs, avail_tokens,
         |          (1000000 * w) // wsum AS target_tokens FROM s)
         |SELECT stratum, n_docs, avail_tokens,
         |       CAST(target_tokens AS BIGINT) AS target_tokens,
         |       CAST((1000 * target_tokens + avail_tokens - 1) // avail_tokens AS BIGINT) AS epochs_milli
         |FROM fin ORDER BY stratum""".stripMargin,
    "q106_epoch_shuffle" ->
      """WITH e AS (SELECT doc_id, unnest([1, 2]) AS epoch FROM documents),
        |h AS (SELECT doc_id, epoch,
        |        ('0x' || substr(md5(CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824 AS hh
        |      FROM e)
        |SELECT doc_id, CAST(epoch AS INT) AS epoch,
        |       CAST(row_number() OVER (PARTITION BY epoch ORDER BY hh, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY epoch, pos""".stripMargin,
    "q86_cdc_chunks" ->
      s"""WITH nt AS (SELECT doc_id, $DNORM AS n FROM documents),
         |wins AS (SELECT doc_id, n, unnest(range(1, greatest(len(n) - 6, 1))) AS i FROM nt),
         |cuts AS (SELECT doc_id, n, i AS cut FROM wins
         |         WHERE ('0x' || substr(md5(n[i:i+7]), 1, 8))::BIGINT % 64 = 0
         |         UNION
         |         SELECT doc_id, n, len(n) AS cut FROM nt),
         |chunks AS (SELECT doc_id,
         |             md5(n[lag(cut, 1, 0) OVER (PARTITION BY doc_id ORDER BY cut) + 1 : cut]) AS h,
         |             cut - lag(cut, 1, 0) OVER (PARTITION BY doc_id ORDER BY cut) AS clen
         |           FROM cuts),
         |stats AS (SELECT doc_id, count(*) AS n_chunks,
         |            CAST(sum(clen) AS BIGINT) AS total_chars FROM chunks GROUP BY doc_id),
         |dh AS (SELECT DISTINCT doc_id, h FROM chunks),
         |shared AS (SELECT doc_id,
         |             CAST(sum(CASE WHEN hdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |           FROM (SELECT doc_id, count(*) OVER (PARTITION BY h) AS hdf FROM dh)
         |           GROUP BY doc_id)
         |SELECT doc_id, n_chunks, total_chars, n_shared
         |FROM stats JOIN shared USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q84_quality_deciles" ->
      """WITH b AS (SELECT lang, n_chars,
        |            ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bin
        |           FROM documents)
        |SELECT lang, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "q147_kmv_overlap" ->
      s"""WITH toks AS (SELECT source, $DNTOKS AS tk FROM documents),
         |sh AS (SELECT source, unnest(CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END) AS s
         |       FROM toks),
         |hh AS (SELECT DISTINCT source, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h FROM sh),
         |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM hh),
         |sk AS (SELECT source, list_sort(list(h)) AS hs, count(*) AS n FROM rk WHERE r <= 64 GROUP BY source),
         |p AS (SELECT a.source AS src_a, b.source AS src_b, a.hs AS ha, b.hs AS hb, a.n AS na, b.n AS nb
         |      FROM sk a JOIN sk b ON a.source < b.source),
         |u AS (SELECT *, (list_sort(list_distinct(ha || hb)))[1:64] AS us FROM p),
         |c AS (SELECT src_a, src_b, na, nb, ha, hb, us, len(us) AS m,
         |        len(list_intersect(list_intersect(us, ha), hb)) AS rho FROM u),
         |c2 AS (SELECT *, CASE WHEN m < 64 THEN m ELSE 17732923532771328 // greatest(us[64], 1) END AS eu FROM c)
         |SELECT src_a, src_b, CAST(m AS BIGINT) AS m, CAST(rho AS BIGINT) AS rho,
         |  CAST(CASE WHEN na < 64 THEN na ELSE 17732923532771328 // greatest(ha[64], 1) END AS BIGINT) AS est_a,
         |  CAST(CASE WHEN nb < 64 THEN nb ELSE 17732923532771328 // greatest(hb[64], 1) END AS BIGINT) AS est_b,
         |  CAST(eu AS BIGINT) AS est_union,
         |  CAST((rho * eu) // m AS BIGINT) AS est_inter,
         |  CAST((rho * 1000000) // m AS BIGINT) AS jaccard_ppm
         |FROM c2 ORDER BY src_a, src_b""".stripMargin,
    "q148_halfsample_ci" ->
      """WITH h AS (SELECT source, n_chars,
        |             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h32
        |           FROM documents),
        |r AS (SELECT source, n_chars, unnest(range(0, 32)) AS rep, h32 FROM h),
        |m AS (SELECT source, rep,
        |        (1000 * CAST(sum(n_chars) AS BIGINT)) // count(*) AS rep_mean
        |      FROM r WHERE (h32 // (1::BIGINT << rep)) % 2 = 1 GROUP BY source, rep),
        |f AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        (1000 * CAST(sum(n_chars) AS BIGINT)) // count(*) AS mean_milli
        |      FROM documents GROUP BY source)
        |SELECT f.source, f.n_docs, CAST(f.mean_milli AS BIGINT) AS mean_milli,
        |       CAST(count(*) AS BIGINT) AS n_reps,
        |       CAST(min(m.rep_mean) AS BIGINT) AS lo_milli,
        |       CAST(max(m.rep_mean) AS BIGINT) AS hi_milli,
        |       CAST(max(m.rep_mean) - min(m.rep_mean) AS BIGINT) AS spread_milli
        |FROM f JOIN m ON f.source = m.source
        |GROUP BY f.source, f.n_docs, f.mean_milli ORDER BY f.source""".stripMargin,
    "q149_join_stats" -> {
      val edges = Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem.l_orderkey->orders"),
        ("lineitem", "l_partkey", "part", "p_partkey", "lineitem.l_partkey->part"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem.l_suppkey->supplier"),
        ("orders", "o_custkey", "customer", "c_custkey", "orders.o_custkey->customer"),
        ("customer", "c_nationkey", "nation", "n_nationkey", "customer.c_nationkey->nation"))
      edges.map { case (f, k, d, dk, name) =>
        s"""SELECT '$name' AS edge, n_rows, n_keys, max_freq,
           | (max_freq * 1000000) // greatest(n_rows // n_keys, 1) AS skew_ppm,
           | orphan_rows, unmatched_dim_keys
           |FROM (WITH f AS (SELECT $k AS k, count(*) AS c FROM $f WHERE $k IS NOT NULL GROUP BY 1),
           | s AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys, CAST(max(c) AS BIGINT) AS max_freq FROM f),
           | orp AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS orphan_rows FROM f WHERE NOT EXISTS (SELECT 1 FROM $d d WHERE d.$dk = f.k)),
           | um AS (SELECT CAST(count(*) AS BIGINT) AS unmatched_dim_keys FROM $d d WHERE NOT EXISTS (SELECT 1 FROM f f2 WHERE f2.k = d.$dk))
           | SELECT * FROM s, orp, um)""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY edge")
    },
    "q150_bitext_margin" ->
      """WITH j AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, lang
        |           FROM embeddings JOIN documents ON vec_id = doc_id),
        |a AS (SELECT id AS aid, v AS av FROM j WHERE lang = 'en' AND id < 50),
        |t AS (SELECT id AS tid, v AS tv, lang AS tlang FROM j WHERE lang <> 'en'),
        |s AS (SELECT aid, tid, tlang, list_cosine_similarity(tv, av) AS sim
        |      FROM t CROSS JOIN a),
        |ar AS (SELECT aid, sim, row_number() OVER (PARTITION BY aid ORDER BY sim DESC, tid) AS rn FROM s),
        |asum AS (SELECT aid,
        |           ((coalesce(max(CASE WHEN rn = 1 THEN sim END), 0.0)
        |             + coalesce(max(CASE WHEN rn = 2 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 3 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 4 THEN sim END), 0.0) AS asm
        |         FROM ar WHERE rn <= 4 GROUP BY aid),
        |tr AS (SELECT tid, sim, row_number() OVER (PARTITION BY tid ORDER BY sim DESC, aid) AS rn FROM s),
        |tsum AS (SELECT tid,
        |           ((coalesce(max(CASE WHEN rn = 1 THEN sim END), 0.0)
        |             + coalesce(max(CASE WHEN rn = 2 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 3 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 4 THEN sim END), 0.0) AS tsm
        |         FROM tr WHERE rn <= 4 GROUP BY tid),
        |m AS (SELECT s.aid, s.tid, s.tlang,
        |        CASE WHEN asm + tsm = 0.0 THEN 0.0
        |             ELSE (sim + sim) / (asm + tsm) END AS margin
        |      FROM s JOIN asum USING (aid) JOIN tsum USING (tid)),
        |r AS (SELECT aid AS anchor_id, tid AS target_id, tlang AS target_lang,
        |        row_number() OVER (PARTITION BY aid ORDER BY margin DESC, tid) AS rnk
        |      FROM m)
        |SELECT anchor_id, CAST(rnk AS BIGINT) AS rnk, target_id, target_lang
        |FROM r WHERE rnk <= 3 ORDER BY anchor_id, rnk""".stripMargin,
    "q151_bpe_pairs" ->
      s"""WITH wrd AS (SELECT unnest($DNTOKS) AS w FROM documents),
         |v AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wrd GROUP BY w),
         |v2 AS (SELECT * FROM v WHERE len(w) >= 2),
         |p AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i:i+1])) AS pair, wc FROM v2),
         |g AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences FROM p GROUP BY pair),
         |t AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS tot FROM g)
         |SELECT pair, n_occurrences,
         |       CAST(n_occurrences * 1000000 // (SELECT tot FROM t) AS BIGINT) AS share_ppm
         |FROM g ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    "q152_ivf_balance" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT cell_id, CAST(floor(cell_cos * 1000000) AS BIGINT) AS cos_micro FROM (
         |          SELECT cents.cell_id,
         |                 list_cosine_similarity(e.v, cents.cent) AS cell_cos,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |pc AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_vecs,
         |         CAST(sum(cos_micro) AS BIGINT) AS cs FROM asg GROUP BY cell_id),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM asg)
         |SELECT cents.cell_id,
         |  coalesce(pc.n_vecs, 0) AS n_vecs,
         |  CAST(coalesce(pc.n_vecs, 0) * 1000000 // t.tot AS BIGINT) AS share_ppm,
         |  CAST(coalesce(pc.n_vecs, 0) * 32 * 1000000 // t.tot AS BIGINT) AS load_ppm,
         |  CAST(CASE WHEN pc.n_vecs IS NULL THEN 0
         |            WHEN cs >= 0 THEN cs // pc.n_vecs
         |            ELSE -((-cs) // pc.n_vecs) END AS BIGINT) AS mean_cos_micro
         |FROM cents LEFT JOIN pc USING (cell_id) CROSS JOIN t
         |ORDER BY cell_id""".stripMargin,
    "q153_kmv_daily" ->
      """WITH e AS (SELECT epoch_ns(ts) // 86400000000000 AS day, user_id,
        |             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |           FROM events),
        |d AS (SELECT DISTINCT day, h FROM e),
        |rk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r FROM d),
        |sk AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sketch,
        |         max(CASE WHEN r = 64 THEN h END) AS h64
        |       FROM rk WHERE r <= 64 GROUP BY day),
        |ex AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |       FROM e GROUP BY day)
        |SELECT sk.day, n_sketch,
        |  CAST(CASE WHEN n_sketch < 64 THEN n_sketch
        |            ELSE 17732923532771328 // greatest(h64, 1) END AS BIGINT) AS est_distinct,
        |  exact_distinct
        |FROM sk JOIN ex USING (day) ORDER BY sk.day""".stripMargin,
    "q154_group_split" -> {
      def bkt(e: String) = s"('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 8))::BIGINT % 100"
      def sp(e: String) =
        s"CASE WHEN ${bkt(e)} < 80 THEN 'train' WHEN ${bkt(e)} < 90 THEN 'val' ELSE 'test' END"
      s"""WITH pairs AS ($MinhashPairsBody),
         |s AS (SELECT doc_id, source FROM documents),
         |lab AS (SELECT ${sp("p.id_a")} AS ia, ${sp("p.id_b")} AS ib,
         |               ${sp("sa.source")} AS ga, ${sp("sb.source")} AS gb
         |        FROM pairs p JOIN s sa ON p.id_a = sa.doc_id
         |                     JOIN s sb ON p.id_b = sb.doc_id),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(coalesce(sum(CASE WHEN ia <> ib THEN 1 ELSE 0 END), 0) AS BIGINT) AS ics,
         |        CAST(coalesce(sum(CASE WHEN (ia = 'train' AND ib = 'test') OR (ia = 'test' AND ib = 'train') THEN 1 ELSE 0 END), 0) AS BIGINT) AS itts,
         |        CAST(coalesce(sum(CASE WHEN ga <> gb THEN 1 ELSE 0 END), 0) AS BIGINT) AS gcs,
         |        CAST(coalesce(sum(CASE WHEN (ga = 'train' AND gb = 'test') OR (ga = 'test' AND gb = 'train') THEN 1 ELSE 0 END), 0) AS BIGINT) AS gtts
         |      FROM lab)
         |SELECT 'group_hash' AS split_mode, n AS n_pairs, gcs AS n_cross_split, gtts AS n_train_test FROM a
         |UNION ALL
         |SELECT 'id_hash', n, ics, itts FROM a
         |ORDER BY split_mode""".stripMargin
    },
    "q155_dim_health" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT i - 1 AS dim_idx, CAST(floor(v[i] * 1000000) AS BIGINT) AS xm
        |      FROM e, unnest(range(1, len(v) + 1)) AS t(i)),
        |p AS (SELECT dim_idx, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN xm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |        CAST(sum(xm) AS BIGINT) AS sm,
        |        sum(CAST(xm AS HUGEINT) * xm) AS de
        |      FROM c GROUP BY dim_idx),
        |t2 AS (SELECT sum(de) AS te FROM p)
        |SELECT CAST(dim_idx AS BIGINT) AS dim_idx, n_zero,
        |  CAST(CASE WHEN sm >= 0 THEN sm // n ELSE -((-sm) // n) END AS BIGINT) AS mean_micro,
        |  CAST((de * 1000000) // te AS BIGINT) AS energy_ppm
        |FROM p, t2 ORDER BY dim_idx""".stripMargin,
    // the sharded three-phase cut must be indistinguishable from the naive
    // global running sum — so its oracle IS the naive global running sum
    "q156_curriculum_budget" ->
      s"""WITH nt AS (SELECT doc_id, $DNORM AS n FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(n)), i -> n[i:i+1])) AS bigram FROM nt),
         |m AS (SELECT bigram, count(*) AS cnt FROM g GROUP BY bigram),
         |p AS (SELECT substr(bigram, 1, 1) AS c1, CAST(sum(cnt) AS BIGINT) AS prefix_cnt FROM m GROUP BY 1),
         |sc AS (SELECT doc_id, count(*) AS nb,
         |         CAST(sum(CAST(floor(1000000 * cnt / prefix_cnt) AS BIGINT)) AS BIGINT) AS ls
         |       FROM g JOIN m USING (bigram) JOIN p ON substr(g.bigram, 1, 1) = p.c1
         |       GROUP BY doc_id),
         |base AS (SELECT d.doc_id, d.lang, CAST(len($DNTOKS) AS BIGINT) AS tok,
         |           ls // nb AS mean_micro
         |         FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
         |b AS (SELECT CAST(sum(tok) AS BIGINT) // 2 AS budget FROM base),
         |o AS (SELECT *, CAST(sum(tok) OVER (ORDER BY mean_micro DESC, doc_id
         |                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |      FROM base),
         |sel AS (SELECT o.* FROM o, b WHERE cum <= budget)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
         |FROM sel GROUP BY lang ORDER BY lang""".stripMargin,
    "q157_attribution" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS vmicro
        |           FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts, vmicro FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS c_ts, event_id AS c_id FROM e
        |      WHERE event_type = 'click'),
        |tj AS (SELECT p.p_id, p.p_ts, p.vmicro, c.c_ts, c.c_id
        |       FROM p JOIN c ON p.user_id = c.user_id
        |       WHERE p.p_ts - c.c_ts BETWEEN 0 AND 600000000),
        |r AS (SELECT *, row_number() OVER w AS pos, count(*) OVER (PARTITION BY p_id) AS n,
        |        vmicro // count(*) OVER (PARTITION BY p_id) AS base
        |      FROM tj WINDOW w AS (PARTITION BY p_id ORDER BY c_ts, c_id)),
        |a AS (SELECT p_ts // 86400000000 AS day,
        |        CASE WHEN pos = n THEN 'last' WHEN pos = 1 THEN 'first' ELSE 'middle' END AS attribution,
        |        CASE WHEN pos = n THEN vmicro - base * (n - 1) ELSE base END AS attributed
        |      FROM r
        |      UNION ALL
        |      SELECT p_ts // 86400000000, 'direct', vmicro FROM p
        |      WHERE NOT EXISTS (SELECT 1 FROM tj WHERE tj.p_id = p.p_id))
        |SELECT day, attribution, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(attributed) AS BIGINT) AS revenue_micro
        |FROM a GROUP BY day, attribution ORDER BY day, attribution""".stripMargin,
    "q158_lift_pairs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
        |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s),
        |st AS (SELECT DISTINCT user_id, session_seq, event_type FROM s2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions
        |        FROM (SELECT DISTINCT user_id, session_seq FROM st)),
        |sg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM st GROUP BY 1),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM st a JOIN st b ON a.user_id = b.user_id
        |         AND a.session_seq = b.session_seq AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab,
        |  CAST(n_ab * 1000000 // n_sessions AS BIGINT) AS support_ppm,
        |  CAST((CAST(n_ab AS HUGEINT) * n_sessions * 1000000) //
        |       (CAST(sa.n_t AS HUGEINT) * sb.n_t) AS BIGINT) AS lift_ppm
        |FROM pr JOIN sg sa ON pr.type_a = sa.event_type
        |        JOIN sg sb ON pr.type_b = sb.event_type
        |        CROSS JOIN tot
        |ORDER BY type_a, type_b""".stripMargin,
    "q159_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
        |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s),
        |tr AS (SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id, session_seq
        |                                ORDER BY ts_us, event_id) AS to_type
        |       FROM s2),
        |g AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        |      FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS nf FROM g GROUP BY 1)
        |SELECT from_type, to_type, n_transitions,
        |       CAST(n_transitions * 1000000 // nf AS BIGINT) AS prob_ppm
        |FROM g JOIN m USING (from_type) ORDER BY from_type, to_type""".stripMargin,
    "q160_ann_scorecard" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tq AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |ts AS (SELECT qid, vec_id AS cid, list_cosine_similarity(v, qv) AS sim
         |       FROM e CROSS JOIN tq WHERE qid <> vec_id),
         |truth AS (SELECT qid, cid,
         |            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |          FROM ts QUALIFY rnk <= 10),
         |sg AS (SELECT vec_id, v, $LshBucketSql AS bucket FROM e),
         |lq AS (SELECT vec_id AS qid, v AS qv, bucket FROM sg WHERE vec_id < 5),
         |ls AS (SELECT qid, vec_id AS cid, list_cosine_similarity(sg.v, qv) AS sim
         |       FROM sg JOIN lq USING (bucket) WHERE qid <> vec_id),
         |lsh AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |        FROM ls QUALIFY rnk <= 10),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cv, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, e.v AS cv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 5)
         |        WHERE qr <= 8),
         |ivs AS (SELECT qid, corpus_id AS cid, list_cosine_similarity(cv, qv) AS sim
         |        FROM asg JOIN probes USING (cell_id) WHERE qid <> corpus_id),
         |ivf AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |        FROM ivs QUALIFY rnk <= 10),
         |allr AS (SELECT 'brute' AS method, * FROM truth
         |         UNION ALL SELECT 'lsh', * FROM lsh
         |         UNION ALL SELECT 'ivf', * FROM ivf),
         |h AS (SELECT allr.method, allr.qid, allr.rnk, t.cid IS NOT NULL AS hit
         |      FROM allr LEFT JOIN truth t ON allr.qid = t.qid AND allr.cid = t.cid),
         |perq AS (SELECT method, qid,
         |           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |           min(CASE WHEN hit THEN rnk END) AS first_hit
         |         FROM h GROUP BY 1, 2),
         |grid AS (SELECT m.method, tq.qid
         |         FROM (SELECT unnest(['brute', 'lsh', 'ivf']) AS method) m CROSS JOIN tq),
         |dense AS (SELECT g.method, g.qid, coalesce(p.hits, 0) AS hits, p.first_hit
         |          FROM grid g LEFT JOIN perq p ON g.method = p.method AND g.qid = p.qid)
         |SELECT method, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(hits) AS BIGINT) AS n_hits,
         |       CAST(sum(hits) * 1000000 // (count(*) * 10) AS BIGINT) AS recall_ppm,
         |       CAST(sum(CASE WHEN first_hit IS NULL THEN 0 ELSE 1000000 // first_hit END)
         |            // count(*) AS BIGINT) AS mrr_micro
         |FROM dense GROUP BY method ORDER BY method""".stripMargin,
    "q161_dup_triangles" ->
      s"""WITH pairs AS ($MinhashPairsBody),
         |e AS (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
         |      FROM pairs WHERE id_a <> id_b),
         |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
         |        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
         |wd AS (SELECT e.u, e.v, du.d AS du, dv.d AS dv
         |       FROM e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x),
         |o AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS s,
         |             CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS t FROM wd),
         |w AS (SELECT e1.t AS w1, e2.t AS w2 FROM o e1 JOIN o e2
         |      ON e1.s = e2.s AND e1.t < e2.t),
         |ek AS (SELECT least(s, t) AS ka, greatest(s, t) AS kb FROM o),
         |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |        FROM w JOIN ek ON least(w.w1, w.w2) = ek.ka
         |                      AND greatest(w.w1, w.w2) = ek.kb),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         |vv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
         |         CAST(coalesce(sum((d * (d - 1)) // 2), 0) AS BIGINT) AS n_wedges FROM deg)
         |SELECT n_vertices, n_edges, n_wedges, n_triangles,
         |  CAST(CASE WHEN n_wedges = 0 THEN 0
         |            ELSE (3 * n_triangles * 1000000) // n_wedges END AS BIGINT) AS clustering_ppm
         |FROM vv, c, tri""".stripMargin,
    "q162_trend_slope" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS vmicro
        |           FROM events),
        |d AS (SELECT event_type, day, CAST(sum(vmicro) AS BIGINT) AS y
        |      FROM e GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(day) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        sum(CAST(day AS HUGEINT) * y) AS sxy,
        |        sum(CAST(day AS HUGEINT) * day) AS sxx
        |      FROM d GROUP BY 1),
        |f AS (SELECT event_type, n,
        |        CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
        |      FROM s)
        |SELECT event_type, n,
        |  CAST(CASE WHEN den = 0 THEN 0
        |            WHEN num >= 0 THEN (num * 1000000) // den
        |            ELSE -(((-num) * 1000000) // den) END AS BIGINT) AS slope_micro_per_day
        |FROM f ORDER BY event_type""".stripMargin,
    "q163_benford" ->
      """WITH c AS (SELECT event_type,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM events),
        |d AS (SELECT event_type,
        |        CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |      FROM c WHERE cents > 0),
        |g AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
        |      FROM d GROUP BY 1, 2),
        |tt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt FROM g GROUP BY 1),
        |bf AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit,
        |              unnest([301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757])::BIGINT AS benford_ppm),
        |grid AS (SELECT tt.event_type, bf.digit, bf.benford_ppm, tt.nt FROM tt CROSS JOIN bf)
        |SELECT grid.event_type, grid.digit, coalesce(g.n, 0) AS n,
        |  CAST(coalesce(g.n, 0) * 1000000 // grid.nt AS BIGINT) AS obs_ppm,
        |  grid.benford_ppm,
        |  CAST(coalesce(g.n, 0) * 1000000 // grid.nt - grid.benford_ppm AS BIGINT) AS deviation_ppm
        |FROM grid LEFT JOIN g ON grid.event_type = g.event_type AND grid.digit = g.digit
        |ORDER BY grid.event_type, grid.digit""".stripMargin,
    "q164_hll_portable" ->
      s"""WITH lc AS (SELECT [$HllLinearCountTable] AS t),
        |b AS (SELECT epoch_ns(ts) // 86400000000000 AS day, user_id,
        |             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT AS reg,
        |             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 12))::BIGINT AS v48
        |           FROM events),
        |r AS (SELECT day, reg,
        |        CASE WHEN v48 = 0 THEN 49 ELSE 49 - length(bin(v48)) END AS rho FROM b),
        |dr AS (SELECT day, reg, CAST(max(rho) AS BIGINT) AS m FROM r GROUP BY 1, 2),
        |wr AS (SELECT day // 7 AS week, reg, CAST(max(m) AS BIGINT) AS m FROM dr GROUP BY 1, 2),
        |ed AS (SELECT day AS period, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |       FROM b GROUP BY 1),
        |ew AS (SELECT day // 7 AS period, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |       FROM b GROUP BY 1),
        |estd AS (SELECT day AS period, CAST(count(*) AS BIGINT) AS n_used,
        |           sum(CAST(1::BIGINT << CAST(50 - m AS INT) AS HUGEINT)) AS s_used
        |         FROM dr GROUP BY 1),
        |estw AS (SELECT week AS period, CAST(count(*) AS BIGINT) AS n_used,
        |           sum(CAST(1::BIGINT << CAST(50 - m AS INT) AS HUGEINT)) AS s_used
        |         FROM wr GROUP BY 1),
        |raws AS (
        |  SELECT 'day' AS grain, e.period, n_used,
        |    CAST((718273::HUGEINT * 65536 * 1125899906842624) //
        |         ((s_used + (256 - n_used) * 1125899906842624::HUGEINT) * 1000000) AS BIGINT) AS raw_est,
        |    exact_distinct
        |  FROM estd e JOIN ed USING (period)
        |  UNION ALL
        |  SELECT 'week', e.period, n_used,
        |    CAST((718273::HUGEINT * 65536 * 1125899906842624) //
        |         ((s_used + (256 - n_used) * 1125899906842624::HUGEINT) * 1000000) AS BIGINT),
        |    exact_distinct
        |  FROM estw e JOIN ew USING (period))
        |SELECT grain, period, n_used,
        |  CAST(CASE WHEN raw_est <= 640 AND n_used < 256
        |            THEN (SELECT t FROM lc)[CAST(256 - n_used AS INT)]
        |            ELSE raw_est END AS BIGINT) AS est_distinct,
        |  exact_distinct
        |FROM raws ORDER BY grain, period""".stripMargin,
    "q165_centroid_drift" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |             CAST(embedding AS DOUBLE[]) AS v,
        |             CASE WHEN ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50
        |                  THEN 'a' ELSE 'b' END AS release
        |           FROM embeddings),
        |sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s FROM e),
        |codes AS (SELECT label, release, i AS pos,
        |            CAST(floor(v[i] / s * 127.0 + 0.5) AS BIGINT) AS c
        |          FROM e CROSS JOIN sc CROSS JOIN range(1, 65) AS r(i)),
        |sums AS (SELECT label, release, pos, CAST(sum(c) AS BIGINT) AS sm
        |         FROM codes GROUP BY 1, 2, 3),
        |geo AS (SELECT a.label,
        |          sum(CAST(a.sm AS HUGEINT) * CAST(b.sm AS HUGEINT)) AS dot_h,
        |          sum(CAST(a.sm AS HUGEINT) * CAST(a.sm AS HUGEINT)) AS na2,
        |          sum(CAST(b.sm AS HUGEINT) * CAST(b.sm AS HUGEINT)) AS nb2
        |        FROM (SELECT * FROM sums WHERE release = 'a') a
        |        JOIN (SELECT * FROM sums WHERE release = 'b') b
        |          ON a.label = b.label AND a.pos = b.pos
        |        GROUP BY 1),
        |cnt AS (SELECT label,
        |          CAST(sum(CASE WHEN release = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |          CAST(sum(CASE WHEN release = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |        FROM e GROUP BY 1)
        |SELECT geo.label, n_a, n_b,
        |  CAST(CASE WHEN na2 * nb2 = 0 THEN 0
        |            WHEN dot_h < 0 THEN -((dot_h * dot_h * 1000000) // (na2 * nb2))
        |            ELSE (dot_h * dot_h * 1000000) // (na2 * nb2)
        |       END AS BIGINT) AS sim2_ppm,
        |  CAST(1000000 - CASE WHEN na2 * nb2 = 0 THEN 0
        |            WHEN dot_h < 0 THEN -((dot_h * dot_h * 1000000) // (na2 * nb2))
        |            ELSE (dot_h * dot_h * 1000000) // (na2 * nb2)
        |       END AS BIGINT) AS drift_ppm
        |FROM geo JOIN cnt USING (label)
        |WHERE n_a > 0 AND n_b > 0
        |ORDER BY label""".stripMargin,
    "q166_dim_covariance" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id, i - 1 AS p, CAST(floor(v[i] * 1000000) AS BIGINT) AS x
        |      FROM e, unnest(range(1, len(v) + 1)) AS t(i)),
        |pr AS (SELECT a.p AS p, b.p AS q, sum(CAST(a.x AS HUGEINT) * b.x) AS sxy
        |       FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.p <= b.p
        |       GROUP BY 1, 2),
        |d AS (SELECT p, CAST(sum(x) AS BIGINT) AS sx FROM c GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
        |SELECT CAST(pr.p AS BIGINT) AS p, CAST(pr.q AS BIGINT) AS q,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * sxy - CAST(dp.sx AS HUGEINT) * dq.sx >= 0
        |    THEN (CAST(n AS HUGEINT) * sxy - CAST(dp.sx AS HUGEINT) * dq.sx) // (CAST(n AS HUGEINT) * n)
        |    ELSE -((-(CAST(n AS HUGEINT) * sxy - CAST(dp.sx AS HUGEINT) * dq.sx)) // (CAST(n AS HUGEINT) * n))
        |  END AS BIGINT) AS cov_micro2
        |FROM pr JOIN d dp ON pr.p = dp.p JOIN d dq ON pr.q = dq.p CROSS JOIN nn
        |ORDER BY p, q""".stripMargin,
    "q167_span_corruption" ->
      s"""WITH tk AS (SELECT doc_id, lang, $DNTOKS AS tk FROM documents),
         |p AS (SELECT doc_id, lang, i - 1 AS pos,
         |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT % 1000 < 150 AS masked
         |      FROM tk, unnest(range(1, len(tk) + 1)) AS r(i)),
         |s AS (SELECT *, coalesce(lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), false) AS prev FROM p)
         |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |  CAST(sum(CASE WHEN masked AND NOT prev THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS mask_ppm,
         |  CAST(CASE WHEN sum(CASE WHEN masked AND NOT prev THEN 1 ELSE 0 END) = 0 THEN 0
         |       ELSE sum(CASE WHEN masked THEN 1 ELSE 0 END) * 1000 // sum(CASE WHEN masked AND NOT prev THEN 1 ELSE 0 END)
         |  END AS BIGINT) AS mean_span_milli
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "q168_vocab_gini" ->
      s"""WITH wrd AS (SELECT source, unnest($DNTOKS) AS w FROM documents),
         |v AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM wrd GROUP BY 1, 2),
         |tg AS (SELECT source, c, CAST(count(*) AS BIGINT) AS k FROM v GROUP BY 1, 2),
         |rk AS (SELECT *, CAST(coalesce(sum(k) OVER (PARTITION BY source ORDER BY c) - k, 0) AS BIGINT) AS r0 FROM tg),
         |g AS (SELECT source,
         |        CAST(sum(k) AS BIGINT) AS n_tokens,
         |        sum(CAST(c AS HUGEINT) * k) AS s_occ,
         |        sum(CAST(c AS HUGEINT) * (CAST(k AS HUGEINT) * r0 + (CAST(k AS HUGEINT) * (k + 1)) // 2)) AS rix
         |      FROM rk GROUP BY source)
         |SELECT source, n_tokens, CAST(s_occ AS BIGINT) AS total_occurrences,
         |  CAST((2 * rix - (CAST(n_tokens AS HUGEINT) + 1) * s_occ) * 1000000
         |       // (CAST(n_tokens AS HUGEINT) * s_occ) AS BIGINT) AS gini_ppm
         |FROM g ORDER BY source""".stripMargin,
    "q169_winsorized" ->
      """WITH cts AS (SELECT event_type,
        |               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |             FROM events),
        |bv AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS k FROM cts GROUP BY 1, 2),
        |tt AS (SELECT event_type, CAST(sum(k) AS BIGINT) AS n,
        |         CAST(sum(c * k) AS BIGINT) AS s FROM bv GROUP BY 1),
        |cm AS (SELECT bv.*, n,
        |         CAST(sum(k) OVER (PARTITION BY bv.event_type ORDER BY c) AS BIGINT) AS cum
        |       FROM bv JOIN tt USING (event_type)),
        |bd AS (SELECT event_type,
        |         min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN c END) AS lo,
        |         min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN c END) AS hi
        |       FROM cm GROUP BY 1),
        |ws AS (SELECT bv.event_type,
        |         CAST(sum(greatest(least(c, hi), lo) * k) AS BIGINT) AS wsum
        |       FROM bv JOIN bd USING (event_type) GROUP BY 1)
        |SELECT tt.event_type, n, lo AS lo_cents, hi AS hi_cents,
        |  CAST(1000 * s // n AS BIGINT) AS mean_millicents,
        |  CAST(1000 * wsum // n AS BIGINT) AS win_mean_millicents
        |FROM tt JOIN bd USING (event_type) JOIN ws USING (event_type)
        |ORDER BY tt.event_type""".stripMargin,
    "q170_fano_burstiness" ->
      """WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |                 CAST(count(*) AS BIGINT) AS x
        |               FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |grid AS (SELECT t.event_type, d.day
        |         FROM (SELECT DISTINCT event_type FROM daily) t
        |         CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS day FROM b) d),
        |dense AS (SELECT grid.event_type, coalesce(daily.x, 0) AS x
        |          FROM grid LEFT JOIN daily USING (event_type, day)),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS s,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx
        |       FROM dense GROUP BY 1)
        |SELECT event_type, n_days, s AS total_events,
        |  CAST(1000 * s // n_days AS BIGINT) AS mean_milli,
        |  CAST(CASE WHEN s = 0 THEN 0 ELSE
        |    (1000 * (CAST(n_days AS HUGEINT) * sxx - CAST(s AS HUGEINT) * s))
        |    // (CAST(n_days AS HUGEINT) * s) END AS BIGINT) AS fano_milli
        |FROM st ORDER BY event_type""".stripMargin,
    // the stepwise integer product must be identical in both engines — the
    // oracle replays the exact fold sequence with a recursive CTE
    "q171_km_retention" ->
      """WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |ld AS (SELECT user_id, max(day) AS ldy FROM e GROUP BY 1),
        |ch AS (SELECT ldy AS day, CAST(count(*) AS BIGINT) AS d
        |       FROM ld, b WHERE ldy < hi GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM ld),
        |grid AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
        |dense AS (SELECT g.day, coalesce(ch.d, 0) AS d FROM grid g LEFT JOIN ch USING (day)),
        |wn AS (SELECT day, d,
        |         nu - coalesce(sum(d) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
        |       FROM dense, tot),
        |rec AS (
        |  SELECT day, d, n,
        |    CAST(CASE WHEN n = 0 THEN 1000000
        |              ELSE (1000000 * (n - d)) // n END AS BIGINT) AS surv
        |  FROM wn WHERE day = (SELECT lo FROM b)
        |  UNION ALL
        |  SELECT w.day, w.d, w.n,
        |    CAST(CASE WHEN w.n = 0 THEN r.surv
        |              ELSE (r.surv * (w.n - w.d)) // w.n END AS BIGINT)
        |  FROM wn w JOIN rec r ON w.day = r.day + 1)
        |SELECT day, CAST(n AS BIGINT) AS n_at_risk, d AS n_churned,
        |       surv AS survival_ppm
        |FROM rec ORDER BY day""".stripMargin,
    "q172_fuzzy_blocks" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS nm,
        |             substr(c_name, 1, 16) AS blk FROM customer),
        |sz AS (SELECT blk, CAST(count(*) AS BIGINT) AS n_records FROM c GROUP BY 1),
        |pr AS (SELECT a.blk,
        |         CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CASE WHEN levenshtein(a.nm, b.nm) <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
        |       FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |       GROUP BY 1)
        |SELECT sz.blk AS block, n_records,
        |  coalesce(n_pairs, 0) AS n_pairs,
        |  coalesce(n_matches, 0) AS n_matches,
        |  CAST(CASE WHEN coalesce(n_pairs, 0) = 0 THEN 0
        |            ELSE coalesce(n_matches, 0) * 1000000 // n_pairs END AS BIGINT) AS match_ppm
        |FROM sz LEFT JOIN pr USING (blk) ORDER BY block""".stripMargin,
    "q173_lead_time" ->
      """WITH lg AS (SELECT o_orderpriority AS priority,
        |              CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS days
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |bv AS (SELECT priority, days, CAST(count(*) AS BIGINT) AS k FROM lg GROUP BY 1, 2),
        |tt AS (SELECT priority, CAST(sum(k) AS BIGINT) AS n,
        |         CAST(max(days) AS BIGINT) AS max_days FROM bv GROUP BY 1),
        |cm AS (SELECT bv.*, n, max_days,
        |         CAST(sum(k) OVER (PARTITION BY bv.priority ORDER BY days) AS BIGINT) AS cum
        |       FROM bv JOIN tt USING (priority))
        |SELECT priority, n AS n_lineitems,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN days END) AS median_days,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN days END) AS p90_days,
        |  max_days
        |FROM cm GROUP BY priority, n, max_days ORDER BY priority""".stripMargin,
    "q174_variance_bridge" ->
      """WITH li AS (SELECT p_brand AS brand, l_partkey AS pk,
        |              CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a' ELSE 'b' END AS period,
        |              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r,
        |              CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
        |            FROM lineitem
        |            JOIN orders ON l_orderkey = o_orderkey
        |            JOIN part ON l_partkey = p_partkey),
        |pp AS (SELECT brand, pk,
        |         CAST(sum(CASE WHEN period = 'a' THEN r ELSE 0 END) AS BIGINT) AS r1,
        |         CAST(sum(CASE WHEN period = 'b' THEN r ELSE 0 END) AS BIGINT) AS r2,
        |         CAST(sum(CASE WHEN period = 'a' THEN q ELSE 0 END) AS BIGINT) AS q1,
        |         CAST(sum(CASE WHEN period = 'b' THEN q ELSE 0 END) AS BIGINT) AS q2
        |       FROM li GROUP BY 1, 2),
        |ef AS (SELECT brand, r1, r2, q1, q2,
        |         CASE WHEN q1 > 0 AND q2 > 0 THEN 1 ELSE 0 END AS is_both,
        |         CASE WHEN q1 > 0 AND q2 > 0 THEN
        |           CASE WHEN q2 >= q1
        |             THEN CAST((CAST(q2 - q1 AS HUGEINT) * r1) // q1 AS BIGINT)
        |             ELSE -CAST((CAST(q1 - q2 AS HUGEINT) * r1) // q1 AS BIGINT) END
        |         ELSE 0 END AS vol_e,
        |         CASE WHEN q1 > 0 AND q2 > 0
        |           THEN CAST((CAST(r2 AS HUGEINT) * q1) // q2 AS BIGINT) - r1
        |         ELSE 0 END AS price_e
        |       FROM pp),
        |ef2 AS (SELECT brand, is_both, vol_e, price_e,
        |          CASE WHEN is_both = 1 THEN (r2 - r1) - vol_e - price_e ELSE 0 END AS mix_e,
        |          CASE WHEN q1 = 0 THEN r2 ELSE 0 END AS new_rev,
        |          CASE WHEN q2 = 0 THEN r1 ELSE 0 END AS disc_rev,
        |          r2 - r1 AS delta
        |        FROM ef)
        |SELECT brand, CAST(sum(is_both) AS BIGINT) AS n_parts_both,
        |  CAST(sum(delta) AS BIGINT) AS delta_cents,
        |  CAST(sum(vol_e) AS BIGINT) AS volume_cents,
        |  CAST(sum(price_e) AS BIGINT) AS price_cents,
        |  CAST(sum(mix_e) AS BIGINT) AS mix_cents,
        |  CAST(sum(new_rev) AS BIGINT) AS new_cents,
        |  CAST(sum(disc_rev) AS BIGINT) AS discontinued_cents
        |FROM ef2 GROUP BY brand ORDER BY brand""".stripMargin,
    "q175_part_affinity" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM it),
        |mg AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_p FROM it GROUP BY 1),
        |pr AS (SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, n_ab,
        |  CAST((CAST(n_ab AS HUGEINT) * n_orders * 1000000) //
        |       (CAST(ma.n_p AS HUGEINT) * mb.n_p) AS BIGINT) AS lift_ppm
        |FROM pr JOIN mg ma ON pr.part_a = ma.pk
        |        JOIN mg mb ON pr.part_b = mb.pk
        |        CROSS JOIN no
        |ORDER BY lift_ppm DESC, part_a, part_b LIMIT 20""".stripMargin,
    "q176_cohort_ltv" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, event_type,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM events),
        |ch AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |cl AS (SELECT cohort_day, day - cohort_day AS age_days,
        |         CAST(count(*) AS BIGINT) AS n_purchases,
        |         CAST(sum(cents) AS BIGINT) AS rev_cents
        |       FROM e JOIN ch USING (user_id)
        |       WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT cohort_day, age_days, n_purchases, rev_cents,
        |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY age_days) AS BIGINT) AS cum_rev_cents
        |FROM cl ORDER BY cohort_day, age_days""".stripMargin,
    "q177_purchase_cadence" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT (ts_us - prev) // 86400000000 AS gap_days FROM (
        |        SELECT ts_us, lag(ts_us) OVER (PARTITION BY user_id
        |                 ORDER BY ts_us, event_id) AS prev
        |        FROM p)
        |      WHERE prev IS NOT NULL),
        |u AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |        CAST(sum(CASE WHEN np >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat
        |      FROM (SELECT user_id, count(*) AS np FROM p GROUP BY 1)),
        |bg AS (SELECT gap_days, CAST(count(*) AS BIGINT) AS k FROM g GROUP BY 1),
        |tt AS (SELECT CAST(sum(k) AS BIGINT) AS n_gaps FROM bg),
        |cm AS (SELECT gap_days, CAST(sum(k) OVER (ORDER BY gap_days) AS BIGINT) AS cum FROM bg),
        |ct AS (SELECT min(CASE WHEN cum >= (n_gaps * 50 + 99) // 100 THEN gap_days END) AS median_gap_days,
        |              min(CASE WHEN cum >= (n_gaps * 90 + 99) // 100 THEN gap_days END) AS p90_gap_days
        |       FROM cm, tt)
        |SELECT n_users, n_repeat,
        |  CAST(n_repeat * 1000000 // n_users AS BIGINT) AS repeat_ppm,
        |  n_gaps, median_gap_days, p90_gap_days
        |FROM u, tt, ct""".stripMargin,
    "q178_modal_coverage" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |e AS (SELECT vec_id FROM embeddings),
        |cov AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_embedded
        |        FROM d LEFT JOIN e ON d.doc_id = e.vec_id GROUP BY 1),
        |orph AS (SELECT CAST(count(*) AS BIGINT) AS orphan_vectors
        |         FROM e WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.doc_id = e.vec_id))
        |SELECT lang, n_docs, n_embedded,
        |  CAST(n_embedded * 1000000 // n_docs AS BIGINT) AS coverage_ppm,
        |  orphan_vectors
        |FROM cov CROSS JOIN orph ORDER BY lang""".stripMargin,
    "q179_rfm_segments" ->
      """WITH p AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT max(day) AS mxd FROM p),
        |u AS (SELECT user_id, CAST(min(mxd - day) AS BIGINT) AS recency,
        |        CAST(count(*) AS BIGINT) AS frequency,
        |        CAST(sum(cents) AS BIGINT) AS monetary
        |      FROM p, mx GROUP BY user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
        |qr AS (SELECT v AS recency, ((cum - 1) * 5) // nu AS recency_q FROM (
        |         SELECT recency AS v, CAST(sum(count(*)) OVER (ORDER BY recency) AS BIGINT) AS cum
        |         FROM u GROUP BY recency), n),
        |qf AS (SELECT v AS frequency, ((cum - 1) * 5) // nu AS frequency_q FROM (
        |         SELECT frequency AS v, CAST(sum(count(*)) OVER (ORDER BY frequency) AS BIGINT) AS cum
        |         FROM u GROUP BY frequency), n),
        |qm AS (SELECT v AS monetary, ((cum - 1) * 5) // nu AS monetary_q FROM (
        |         SELECT monetary AS v, CAST(sum(count(*)) OVER (ORDER BY monetary) AS BIGINT) AS cum
        |         FROM u GROUP BY monetary), n)
        |SELECT CAST(4 - recency_q AS BIGINT) AS r_score,
        |       CAST(frequency_q AS BIGINT) AS f_score,
        |       CAST(monetary_q AS BIGINT) AS m_score,
        |       CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(monetary) AS BIGINT) AS revenue_cents
        |FROM u JOIN qr USING (recency) JOIN qf USING (frequency) JOIN qm USING (monetary)
        |GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin,
    "q180_pareto" ->
      """WITH pc AS (SELECT o_custkey,
        |              CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
        |            FROM orders GROUP BY 1),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS k FROM pc GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS tot FROM pc),
        |cm AS (SELECT v, k,
        |         CAST(sum(k) OVER (ORDER BY v DESC) AS BIGINT) AS users_through,
        |         CAST(sum(v * k) OVER (ORDER BY v DESC) AS BIGINT) AS rev_through
        |       FROM bv),
        |cm2 AS (SELECT *, users_through - k AS users_before,
        |          rev_through - v * k AS rev_before FROM cm),
        |th AS (SELECT unnest([1, 5, 10, 20, 50])::BIGINT AS pct)
        |SELECT pct, (n * pct + 99) // 100 AS n_top_customers,
        |  CAST(rev_before + ((n * pct + 99) // 100 - users_before) * v AS BIGINT) AS revenue_cents,
        |  CAST(((rev_before + ((n * pct + 99) // 100 - users_before) * v) * 1000000) // tot AS BIGINT) AS share_ppm
        |FROM th CROSS JOIN tt JOIN cm2
        |  ON users_before < (n * pct + 99) // 100 AND (n * pct + 99) // 100 <= users_through
        |ORDER BY pct""".stripMargin,
    "q181_journey_stationary" -> {
      // q101's unrolled-round pattern at damping 100: p_k = inflow only
      val rounds = (1 to 8).map { k =>
        s"""f$k AS (SELECT e.dst AS host, CAST(sum((p.r * e.w) // o2.ow) AS BIGINT) AS inflow
           |      FROM p${k - 1} p JOIN ed e ON p.host = e.src JOIN o2 ON o2.src = e.src GROUP BY 1),
           |p$k AS (SELECT h.host, CAST(coalesce(f.inflow, 0) AS BIGINT) AS r
           |      FROM h LEFT JOIN f$k f ON f.host = h.host)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
         |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
         |                       OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
         |      FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |s2 AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s),
         |tr AS (SELECT event_type AS src,
         |         lead(event_type) OVER (PARTITION BY user_id, session_seq
         |                                ORDER BY ts_us, event_id) AS dst
         |       FROM s2),
         |ed AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr
         |       WHERE dst IS NOT NULL GROUP BY 1, 2),
         |h AS (SELECT src AS host FROM ed UNION SELECT dst FROM ed),
         |b AS (SELECT CAST(1000000000 // count(*) AS BIGINT) AS base FROM h),
         |o2 AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM ed GROUP BY 1),
         |p0 AS (SELECT host, base AS r FROM h CROSS JOIN b),
         |$rounds,
         |ob AS (SELECT event_type AS host, CAST(count(*) AS BIGINT) AS n_events
         |       FROM events GROUP BY 1),
         |tt AS (SELECT CAST(sum(n_events) AS BIGINT) AS te FROM ob)
         |SELECT p8.host AS event_type, CAST(r // 1000 AS BIGINT) AS stationary_ppm,
         |  n_events,
         |  CAST(n_events * 1000000 // te AS BIGINT) AS observed_ppm,
         |  CAST(r // 1000 - n_events * 1000000 // te AS BIGINT) AS gap_ppm
         |FROM p8 JOIN ob USING (host) CROSS JOIN tt ORDER BY event_type""".stripMargin
    },
    "q36_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           | CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    "q182_market_share" ->
      """WITH dims AS (SELECT c_custkey, n_name AS nation, r_name AS region
        |              FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey),
        |li AS (SELECT l_orderkey,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |              * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_sc4
        |       FROM lineitem),
        |cells AS (SELECT region, CAST(year(o_orderdate) AS BIGINT) AS yr, nation,
        |            CAST(sum(rev_sc4) AS BIGINT) AS rev
        |          FROM li JOIN orders ON l_orderkey = o_orderkey
        |          JOIN dims ON o_custkey = c_custkey
        |          GROUP BY 1, 2, 3),
        |ry AS (SELECT region, yr, CAST(sum(rev) AS BIGINT) AS rtot
        |       FROM cells GROUP BY 1, 2)
        |SELECT region, yr, nation, rev AS revenue_sc4,
        |  CAST(rev * 1000000 // rtot AS BIGINT) AS share_ppm
        |FROM cells JOIN ry USING (region, yr)
        |ORDER BY region, yr, nation""".stripMargin,
    "q183_supplier_wait" ->
      """WITH ps AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
        |              CAST(max(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                                           CAST(l_shipdate AS DATE)) > 60
        |                            THEN 1 ELSE 0 END) AS BIGINT) AS any_late
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |            GROUP BY 1, 2),
        |po AS (SELECT ok, CAST(count(*) AS BIGINT) AS n_supp,
        |         CAST(sum(any_late) AS BIGINT) AS n_late
        |       FROM ps GROUP BY 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM ps JOIN po USING (ok) JOIN supplier ON sk = s_suppkey
        |WHERE any_late = 1 AND n_supp > 1 AND n_late = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q185_freshness_lag" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS ts_us,
        |             epoch_ns(ts) // 86400000000000 AS day FROM events),
        |per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |          CAST(max(ts_us) AS BIGINT) AS last_ts_us,
        |          CAST(count(DISTINCT day) AS BIGINT) AS n_days_active
        |        FROM e GROUP BY 1),
        |h AS (SELECT CAST(max(ts_us) AS BIGINT) AS head_us FROM e)
        |SELECT event_type, n_events, n_days_active,
        |  CAST(head_us - last_ts_us AS BIGINT) AS lag_us,
        |  CAST(n_events // n_days_active AS BIGINT) AS events_per_active_day
        |FROM per CROSS JOIN h ORDER BY event_type""".stripMargin,
    "q184_ewma_anomaly" ->
      """WITH RECURSIVE d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |                       CAST(count(*) AS BIGINT) AS n
        |                     FROM events GROUP BY 1, 2),
        |i AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx FROM d),
        |rec AS (
        |  SELECT event_type, day, n, idx,
        |    CAST(n * 1000000 AS BIGINT) AS e, CAST(n * 1000000 AS BIGINT) AS e_prev
        |  FROM i WHERE idx = 1
        |  UNION ALL
        |  SELECT i.event_type, i.day, i.n, i.idx,
        |    CAST(r.e + CASE WHEN i.n * 1000000 - r.e >= 0
        |                    THEN (i.n * 1000000 - r.e) // 8
        |                    ELSE -((r.e - i.n * 1000000) // 8) END AS BIGINT),
        |    r.e
        |  FROM i JOIN rec r ON i.event_type = r.event_type AND i.idx = r.idx + 1)
        |SELECT event_type, day, n, e_prev AS ewma_prev_micro,
        |  CAST(CASE WHEN abs(n * 1000000 - e_prev) * 2 > e_prev
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM rec ORDER BY event_type, day""".stripMargin,
    "q186_dup_core" -> {
      // fixed 8-round peel per k, unrolled (the q101/q181 unrolled-CTE
      // pattern): peeling is monotone so rounds past the fixpoint are
      // no-ops, matching the Scala side's early exit bit-for-bit
      // AS MATERIALIZED everywhere: DuckDB inlines plain CTEs, so each of
      // the 16 peel stages would re-derive the whole minhash pipeline
      // (and blow the open-file limit re-scanning the parquet per stage)
      def peel(k: Int): String = (1 to 8).map { r =>
        val prev = if (r == 1) "e0" else s"k${k}_${r - 1}"
        s"""k${k}_$r AS MATERIALIZED (SELECT a, b FROM $prev WHERE
           |  a IN (SELECT id FROM (SELECT a AS id FROM $prev UNION ALL SELECT b AS id FROM $prev) t
           |        GROUP BY id HAVING count(*) >= $k)
           |  AND b IN (SELECT id FROM (SELECT a AS id FROM $prev UNION ALL SELECT b AS id FROM $prev) t
           |        GROUP BY id HAVING count(*) >= $k))""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS MATERIALIZED ($MinhashPairsBody),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
         |       FROM pairs WHERE id_a <> id_b),
         |${peel(2)},
         |${peel(3)}
         |SELECT CAST(2 AS BIGINT) AS k,
         |  (SELECT CAST(count(DISTINCT id) AS BIGINT)
         |   FROM (SELECT a AS id FROM k2_8 UNION ALL SELECT b FROM k2_8) t) AS n_core_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM k2_8) AS n_core_edges
         |UNION ALL
         |SELECT CAST(3 AS BIGINT),
         |  (SELECT CAST(count(DISTINCT id) AS BIGINT)
         |   FROM (SELECT a AS id FROM k3_8 UNION ALL SELECT b FROM k3_8) t),
         |  (SELECT CAST(count(*) AS BIGINT) FROM k3_8)
         |ORDER BY k""".stripMargin
    },
    "q188_returned_items" ->
      """WITH r AS (SELECT l_orderkey,
        |             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |                  * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_sc4
        |           FROM lineitem WHERE l_returnflag = 'R'),
        |pc AS (SELECT o_custkey, CAST(sum(rev_sc4) AS BIGINT) AS lost_revenue_sc4
        |       FROM r JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
        |SELECT c_custkey, c_name, n_name AS nation, lost_revenue_sc4
        |FROM pc JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY lost_revenue_sc4 DESC, c_custkey LIMIT 20""".stripMargin,
    "q201_ks_drift" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
        |cn AS (SELECT CAST(count(*) AS BIGINT) AS cn FROM d),
        |cv AS (SELECT DISTINCT v FROM d),
        |sn AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |g AS (SELECT sn.source, cv.v, sn.n FROM cv CROSS JOIN sn),
        |f AS (SELECT g.source, g.v, g.n,
        |        (SELECT CAST(count(*) AS BIGINT) FROM d WHERE d.v <= g.v) AS ccount,
        |        (SELECT CAST(count(*) AS BIGINT) FROM d
        |         WHERE d.source = g.source AND d.v <= g.v) AS scount
        |      FROM g),
        |dist AS (SELECT source, v, n,
        |           abs((ccount * 1000000 // (SELECT cn FROM cn))
        |               - (scount * 1000000 // n)) AS dist
        |         FROM f),
        |mx AS (SELECT source, max(dist) AS mxd FROM dist GROUP BY 1)
        |SELECT dist.source AS source, CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST(max(dist) AS BIGINT) AS ks_ppm, CAST(min(v) AS BIGINT) AS at_length
        |FROM dist JOIN mx ON dist.source = mx.source AND dist.dist = mx.mxd
        |GROUP BY 1 ORDER BY source""".stripMargin,
    "q200_big_orders" ->
      """WITH q AS (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |           FROM lineitem GROUP BY 1
        |           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |  CAST(qty * 100 AS BIGINT) AS total_qty_centi
        |FROM q JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY price_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "q199_release_merge" -> {
      val eligible = s"len($DNTOKS) >= 3"
      val midSub = s"(SELECT (min(doc_id) + max(doc_id) + 1) // 2 FROM documents WHERE $eligible)"
      val bodyOld = MinhashPairsBody.replace("FROM documents",
        s"FROM documents WHERE doc_id < $midSub")
      s"""WITH RECURSIVE pairs_old AS MATERIALIZED ($bodyOld),
         |pairs_all AS MATERIALIZED ($MinhashPairsBody),
         |eo AS (SELECT id_a AS src, id_b AS dst FROM pairs_old
         |       UNION ALL SELECT id_b, id_a FROM pairs_old),
         |ro(id, lbl) AS (
         |  SELECT src, src FROM eo
         |  UNION
         |  SELECT e.src, r.lbl FROM eo e JOIN ro r ON e.dst = r.id),
         |lo AS (SELECT id, min(lbl) AS c_before FROM ro GROUP BY id),
         |ea AS (SELECT id_a AS src, id_b AS dst FROM pairs_all
         |       UNION ALL SELECT id_b, id_a FROM pairs_all),
         |ra(id, lbl) AS (
         |  SELECT src, src FROM ea
         |  UNION
         |  SELECT e.src, r.lbl FROM ea e JOIN ra r ON e.dst = r.id),
         |la AS (SELECT id, min(lbl) AS c_after FROM ra GROUP BY id),
         |j AS (SELECT lo.id, c_before, c_after FROM lo JOIN la ON lo.id = la.id)
         |SELECT CAST(count(*) AS BIGINT) AS n_old_clustered_docs,
         |  CAST(count(DISTINCT c_before) AS BIGINT) AS n_clusters_before,
         |  CAST(count(DISTINCT c_after) AS BIGINT) AS n_clusters_after,
         |  CAST(count(DISTINCT c_before) - count(DISTINCT c_after) AS BIGINT) AS n_merged
         |FROM j""".stripMargin
    },
    "q198_ab_test" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
        |f AS (SELECT user_id, min(ts_us) AS f FROM e GROUP BY 1),
        |b AS (SELECT (min(f) + max(f) + 1) // 2 AS mid FROM f),
        |cv AS (SELECT DISTINCT e.user_id FROM e JOIN f USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND ts_us >= f AND ts_us <= f + 604800000000),
        |coh AS (SELECT CASE WHEN f < mid THEN 1 ELSE 0 END AS early,
        |          CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c
        |        FROM f CROSS JOIN b LEFT JOIN cv ON f.user_id = cv.user_id
        |        GROUP BY 1),
        |w AS (SELECT max(CASE WHEN early = 1 THEN n END) AS na,
        |        max(CASE WHEN early = 1 THEN c END) AS ca,
        |        max(CASE WHEN early = 0 THEN n END) AS nb,
        |        max(CASE WHEN early = 0 THEN c END) AS cb
        |      FROM coh),
        |z AS (SELECT na, ca, nb, cb,
        |        CAST(ca * 1000000 // na AS BIGINT) AS rate_a_ppm,
        |        CAST(cb * 1000000 // nb AS BIGINT) AS rate_b_ppm,
        |        (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
        |          * (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
        |          // (CAST(na AS HUGEINT) * nb) AS A
        |      FROM w),
        |z2 AS (SELECT *,
        |         CAST(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN 0
        |                   ELSE A * 1000 * (na + nb)
        |                        // (CAST(ca + cb AS HUGEINT) * (na + nb - ca - cb))
        |              END AS BIGINT) AS z2_milli
        |       FROM z)
        |SELECT CAST(na AS BIGINT) AS na, CAST(ca AS BIGINT) AS ca,
        |  CAST(nb AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb,
        |  rate_a_ppm, rate_b_ppm, z2_milli,
        |  CAST(CASE WHEN z2_milli > 3841 THEN 1 ELSE 0 END AS BIGINT) AS is_significant
        |FROM z2""".stripMargin,
    "q197_session_gap_curve" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |g AS (SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |                                      ORDER BY ts_us, event_id) AS gap
        |      FROM e),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
        |        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM e),
        |m AS (SELECT unnest([5, 15, 30, 60, 120]) AS gap_minutes),
        |b AS (SELECT gap_minutes,
        |        (SELECT CAST(count(*) AS BIGINT) FROM g
        |         WHERE gap > CAST(gap_minutes AS BIGINT) * 60000000) AS n_breaks
        |      FROM m)
        |SELECT CAST(gap_minutes AS BIGINT) AS gap_minutes,
        |  n_users + n_breaks AS n_sessions,
        |  CAST(n_events * 1000 // (n_users + n_breaks) AS BIGINT) AS events_per_session_milli
        |FROM b CROSS JOIN t ORDER BY gap_minutes""".stripMargin,
    "q196_ppjoin_exact" ->
      """WITH s AS (SELECT doc_id,
        |             list_distinct(list_transform(
        |               generate_series(1, greatest(length(text) - 2, 0)),
        |               i -> substr(text, i, 3))) AS sh
        |           FROM documents
        |           WHERE text IS NOT NULL AND length(text) >= 3 AND doc_id % 8 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.65
        |ORDER BY id_a, id_b""".stripMargin,
    "q195_journey_patterns" ->
      """WITH e0 AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
        |s AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |      FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s),
        |st AS (SELECT user_id, session_seq, min(ts_us) AS start_us,
        |         substr(string_agg(upper(substr(event_type, 1, 1)), ''
        |                           ORDER BY ts_us, event_id), 1, 512) AS walk
        |       FROM s2 GROUP BY 1, 2)
        |SELECT CAST(start_us // 86400000000 AS BIGINT) AS day,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN regexp_matches(walk, 'S[^E]*P') THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_convert,
        |  CAST(sum(CASE WHEN regexp_matches(walk, 'S[^P]*E') THEN 1 ELSE 0 END) AS BIGINT) AS n_frustrated,
        |  CAST(sum(CASE WHEN regexp_matches(walk, 'S[^E]*P') THEN 1 ELSE 0 END) * 1000000
        |       // count(*) AS BIGINT) AS clean_convert_ppm
        |FROM st GROUP BY 1 ORDER BY day""".stripMargin,
    "q193_mad_outliers" ->
      """WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents),
        |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |c1 AS (SELECT lang, v, sum(count(*)) OVER (PARTITION BY lang ORDER BY v) AS cum
        |       FROM d GROUP BY lang, v),
        |med AS (SELECT c1.lang, CAST(min(v) AS BIGINT) AS med
        |        FROM c1 JOIN n ON c1.lang = n.lang
        |        WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |dev AS (SELECT d.lang, abs(v - med) AS a FROM d JOIN med ON d.lang = med.lang),
        |c2 AS (SELECT lang, a, sum(count(*)) OVER (PARTITION BY lang ORDER BY a) AS cum
        |       FROM dev GROUP BY lang, a),
        |mad AS (SELECT c2.lang, CAST(min(a) AS BIGINT) AS mad
        |        FROM c2 JOIN n ON c2.lang = n.lang
        |        WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |o AS (SELECT dev.lang, CAST(count(*) AS BIGINT) AS n_outliers
        |      FROM dev JOIN mad ON dev.lang = mad.lang
        |      WHERE a > mad * 3 GROUP BY 1)
        |SELECT n.lang AS lang, n, med AS median_chars, mad AS mad_chars,
        |  coalesce(n_outliers, 0) AS n_outliers
        |FROM n JOIN med ON n.lang = med.lang JOIN mad ON n.lang = mad.lang
        |LEFT JOIN o ON n.lang = o.lang
        |ORDER BY n.lang""".stripMargin,
    "q194_audience_overlap" ->
      """WITH l AS (SELECT event_type, user_id // 32 AS chunk,
        |             CAST(bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS BIGINT) AS lanes
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(sum(bit_count(lanes)) AS BIGINT) AS n_users
        |      FROM l GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        CAST(sum(bit_count(a.lanes & b.lanes)) AS BIGINT) AS n_overlap
        |      FROM l a JOIN l b ON a.chunk = b.chunk AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_overlap,
        |  CAST(n_overlap * 1000000 // (sa.n_users + sb.n_users - n_overlap) AS BIGINT) AS jaccard_ppm
        |FROM p JOIN s sa ON type_a = sa.event_type JOIN s sb ON type_b = sb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "q192_grouping_sets" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        |  CAST(GROUPING(source) AS BIGINT) AS g_source
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), ())
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    "q191_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |             CAST(p_size AS BIGINT) AS size
        |           FROM part)
        |SELECT p_partkey, price_cents, size FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
        |    AND (b.price_cents < a.price_cents OR b.size > a.size))
        |ORDER BY price_cents, p_partkey""".stripMargin,
    "q190_theil_sen" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT)) AS BIGINT) AS y
        |           FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |        CAST(b.y - a.y AS BIGINT) AS num, CAST(b.day - a.day AS BIGINT) AS den
        |      FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (SELECT event_type, num, den,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn
        |      FROM p),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |        (count(*) + 1) // 2 AS mi FROM p GROUP BY 1)
        |SELECT r.event_type AS event_type, n_pairs,
        |  CAST(CASE WHEN num >= 0 THEN (num * 1000000) // den
        |            ELSE -(((-num) * 1000000) // den) END AS BIGINT) AS theilsen_micro_per_day
        |FROM r JOIN m ON r.event_type = m.event_type AND r.rn = m.mi
        |ORDER BY r.event_type""".stripMargin,
    "q189_priority_check" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND date_diff('day', CAST(o_orderdate AS DATE),
        |                              CAST(l_shipdate AS DATE)) > 30)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q187_decile_migration" ->
      """WITH p AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT min(day) + (max(day) - min(day) + 1) // 2 AS mid FROM p),
        |u AS (SELECT user_id,
        |        CAST(sum(CASE WHEN day < mid THEN cents ELSE 0 END) AS BIGINT) AS v1,
        |        CAST(sum(CASE WHEN day >= mid THEN cents ELSE 0 END) AS BIGINT) AS v2
        |      FROM p CROSS JOIN m GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |q1 AS (SELECT v, CAST((c - 1) * 5 // n AS BIGINT) AS q FROM (
        |         SELECT v, sum(k) OVER (ORDER BY v) AS c FROM (
        |           SELECT v1 AS v, count(*) AS k FROM u GROUP BY 1)) CROSS JOIN n),
        |q2 AS (SELECT v, CAST((c - 1) * 5 // n AS BIGINT) AS q FROM (
        |         SELECT v, sum(k) OVER (ORDER BY v) AS c FROM (
        |           SELECT v2 AS v, count(*) AS k FROM u GROUP BY 1)) CROSS JOIN n)
        |SELECT q1.q AS first_half_q, q2.q AS second_half_q,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(u.v2 - u.v1) AS BIGINT) AS delta_cents
        |FROM u JOIN q1 ON u.v1 = q1.v JOIN q2 ON u.v2 = q2.v
        |GROUP BY 1, 2 ORDER BY first_half_q, second_half_q""".stripMargin)
}

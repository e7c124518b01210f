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
object Queries extends QueriesCommerce with QueriesEvents
  with QueriesText with QueriesVector {


  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** [[t]] with a KEY-FAMILY hint: this builder's plan joins/aggregates
    * the table ON `joinKey`, so the loader serves a layout bucketed on
    * exactly that key or falls back to the raw files — never a wrong-key
    * layout (see [[graft.sources.Tables.load]]'s 3-arg overload). At the
    * graded SFs no layouts are declared, so `tk` ≡ `t` there; the hint
    * only routes where an ingest-provisioned partkey/orderkey family
    * layout exists (sf10/sf100 rehearsal layers, production warehouses).
    */
  private[graft] def tk(spark: SparkSession, dir: String, name: String,
                        joinKey: String): DataFrame =
    Tables.load(spark, dir, name, joinKey)


  /** Exact money column: double → DECIMAL(18,2). */
  private[graft] def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal aggregate presented as double. */
  private[graft] def money(c: Column): Column = sum(c).cast("double")


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


  /** An ORACLE-DIALECT stored text, kept verbatim in the form the
    * reference's TESTING_QUERIES CLOBs use (`incremental.sh:63-67`,
    * `KafkaScript_ConformToStaging.sh`): `dbms_lob.substr` /
    * `dbms_lob.getlength` (the CLOB extraction idiom, note Oracle's
    * (lob, AMOUNT, OFFSET) argument order), `NVL`, `TO_DATE` with an
    * Oracle format mask, a `sysdate` comparison (tautological, so the
    * result stays deterministic), `MINUS` against an empty leg, and the
    * classic `SELECT * FROM (… ORDER BY …) WHERE ROWNUM <= k` top-k
    * pagination wrapper. [[oracleDialectStored]] executes it through
    * [[graft.pipeline.OracleDialect.toSparkSql]] — the drop-in migration
    * path for the reference's stored queries — and must hash-match the
    * ANSI twin the oracle runs.
    */
  val OracleDialectSql: String =
    """SELECT * FROM (
      |  SELECT dbms_lob.substr(c_mktsegment, 4, 1) AS seg4,
      |         COUNT(*) AS n_custs,
      |         NVL(MAX(dbms_lob.getlength(c_name)), 0) AS max_comment_len
      |  FROM customer
      |  WHERE c_custkey >= 0
      |    AND TO_DATE('1995-06-01 12:30:45','YYYY-MM-DD HH24:MI:SS') < sysdate
      |  GROUP BY dbms_lob.substr(c_mktsegment, 4, 1)
      |  MINUS
      |  SELECT dbms_lob.substr(c_mktsegment, 4, 1), COUNT(*),
      |         NVL(MAX(dbms_lob.getlength(c_name)), 0)
      |  FROM customer WHERE c_custkey < 0
      |  GROUP BY dbms_lob.substr(c_mktsegment, 4, 1)
      |  ORDER BY seg4
      |) WHERE ROWNUM <= 3""".stripMargin

  def oracleDialectStored(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(graft.pipeline.OracleDialect.toSparkSql(OracleDialectSql))
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


  /** Multimodal pipeline end-to-end: synthetic binary media — real PNG
    * bytes for images, real WAV bytes for audio, real GIF/MJPEG-AVI
    * containers for video — partition-batched feature extraction through
    * the JDK-native decoders ([[graft.functions.Multimodal.JvmCodec]]) →
    * per-kind rollup. Raw codec output isn't SQL-reproducible, so the
    * rollup counts DECODE INVARIANTS the oracle hash-matches (every count
    * must equal n_items, which DuckDB replays from the id arithmetic like
    * q87):
    *  - image: the luminance histogram slots (normalized by the pixel
    *    loop) sum to 1 and channel means land in [0,1] — a real pixel
    *    walk happened;
    *  - audio: decoded duration (samples / rate) reproduces the metadata
    *    duration_ms and the PCM stream is mono — a real sample decode;
    *  - video: decoded canvas dims match metadata width/height and the
    *    frame count reproduces the generator's 2 + id % 5 — a real
    *    frame walk through the container.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.functions.Multimodal.syntheticMedia(spark, 300)
    val feats = graft.functions.Multimodal
      .extractFeatures(media, graft.functions.Multimodal.JvmCodec, dim = 16)
      .toDF()
    val meta = media.toDF().select(col("media_id"), col("kind"),
      col("width"), col("height"), col("duration_ms"))
    val f = col("feature")
    def slot(i: Int) = try_element_at(f, lit(i))
    val histSum = aggregate(slice(f, 7, 10), lit(0.0d),
      (acc, x) => acc + x.cast("double"))
    val decodeOk =
      when(col("kind") === "image",
        abs(histSum - 1.0d) < 0.001 &&
          slot(1).between(0.0f, 1.0f) && slot(2).between(0.0f, 1.0f) &&
          slot(3).between(0.0f, 1.0f))
        .when(col("kind") === "audio",
          abs(slot(5).cast("double") * 1000.0 - col("duration_ms")) < 1.0 &&
            slot(6) === 1.0f)
        .otherwise(
          slot(5) === col("width").cast("float") &&
            slot(6) === col("height").cast("float") &&
            slot(1) === (lit(2L) + pmod(col("media_id"), lit(5L))).cast("float"))
    feats.join(meta, Seq("media_id", "kind"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(decodeOk, 1L).otherwise(0L)).as("n_decode_ok"),
        sum(when(size(f) === 16, 1L).otherwise(0L)).as("n_dim_ok"),
        sum(when(col("n_bytes") > 0, 1L).otherwise(0L)).as("n_bytes_pos"))
      .orderBy(col("kind"))
  }


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


  // ---------------------------------------------------------------------
  // Catalog + oracles
  // ---------------------------------------------------------------------

  private[graft] type Builder = (SparkSession, String) => DataFrame

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
    "q201_ks_drift" -> (ksDrift _),
    "q202_excess_inventory" -> (excessInventory _),
    "q203_idle_customers" -> (idleCustomers _),
    "q204_event_lift" -> (eventLift _),
    "q205_ttr_curve" -> (ttrCurve _),
    "q206_chunk_library" -> (chunkLibrary _),
    "q207_int8_recall" -> (int8Recall _),
    "q208_active_streaks" -> (activeStreaks _),
    "q209_decay_attribution" -> (decayAttribution _),
    "q210_dow_profile" -> (dowProfile _),
    "q211_promo_share" -> (promoShare _),
    "q212_supplier_variety" -> (supplierVariety _),
    "q213_gap_hazard" -> (gapHazard _),
    "q214_vocab_growth" -> (vocabGrowth _),
    "q215_fill_sla" -> (fillTimeSla _),
    "q216_min_cost_supplier" -> (minCostSupplier _),
    "q217_nation_trade" -> (nationTrade _),
    "q218_important_stock" -> (importantStock _),
    "q219_small_qty" -> (smallQtyRevenue _),
    "q220_disjunctive_join" -> (disjunctiveJoin _),
    "q221_top_supplier" -> (topSupplier _),
    "q222_shipping_priority" -> (shippingPriority _),
    "q223_local_supplier" -> (localSupplierVolume _),
    "q224_forecast_revenue" -> (forecastRevenue _),
    "q225_order_count_dist" -> (orderCountDistribution _),
    "q226_nation_margin" -> (nationMargin _),
    "q227_seasonal_outliers" -> (seasonalOutliers _),
    "q228_matryoshka_recall" -> (matryoshkaRecall _),
    "q229_late_priority" -> (latePriority _),
    "q230_hubness" -> (hubnessAudit _),
    "q231_ranksum_drift" -> (rankSumDrift _),
    "q232_lag_autocorr" -> (lagAutocorr _),
    "q233_type_diversity" -> (typeDiversity _),
    "q234_journey_grammar" -> (journeyGrammar _),
    "q235_watermark_loss" -> (watermarkLoss _),
    "q236_sparse_index" -> (sparseIndexBuild _),
    "q237_sparse_probe" -> (sparseIndexProbe _),
    "q238_index_delta" -> (sparseIndexDelta _),
    "q239_index_compact" -> (sparseIndexCompact _),
    "q240_oracle_dialect" -> (oracleDialectStored _))

  private lazy val coreOracle: Map[String, String] = Map(
    "q08_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_size = (SELECT max(p_size) FROM part) ORDER BY p_partkey""".stripMargin,
    "q22_stored_query" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice BETWEEN 100000.0 AND 110000.0 ORDER BY o_orderkey""".stripMargin,
    "q33_flagship_dim" -> FlagshipSql,
    "q50_flagship_full" -> FlagshipFullSql,
    "q240_oracle_dialect" ->
      """SELECT substring(c_mktsegment, 1, 4) AS seg4,
        |       count(*) AS n_custs,
        |       coalesce(max(length(c_name)), 0) AS max_comment_len
        |FROM customer
        |GROUP BY 1 ORDER BY seg4 LIMIT 3""".stripMargin,
    // q42's decode invariants must all hold, so every counter equals the
    // per-kind item count, which replays from the id arithmetic.
    "q42_media_features" ->
      """WITH m AS (SELECT i,
        |  CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM range(300) t(i))
        |SELECT kind, count(*) AS n_items, count(*) AS n_decode_ok,
        |  count(*) AS n_dim_ok, count(*) AS n_bytes_pos
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,
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
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin)

  /** Full differential-oracle map — assembled from the thematic
    * slices; keys and SQL are byte-identical to the pre-split literal.
    */
  val oracle: Map[String, String] =
    coreOracle ++ commerceOracle ++ eventsOracle ++ textOracle ++ vectorOracle
}

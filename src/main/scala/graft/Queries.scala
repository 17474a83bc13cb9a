package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compact.Compaction
import graft.envelope.{DmsCdc, MongoCdc, PgCdc}
import graft.ext.{Corpus, DataQuality, Dedup, Multimodal, Similarity, TextOps}

/** The declared query surface: every operator from SURVEY.md §2 plus the
  * LLM-pipeline extension operators, each as a (Spark plan, DuckDB oracle
  * SQL) pair over the driver-generated test tables.
  *
  * Conventions (driver compare contract):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - floating-point aggregates are rounded (sums to 2dp, ratios to 4dp)
  *    so accumulation-order differences can't flip the hash;
  *  - rankings order by the ROUNDED value plus an id tiebreaker so both
  *    engines cut top-k identically.
  */
object Queries {

  final case class Q(name: String,
                     fn: (SparkSession, String) => DataFrame,
                     oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(s, dir) else Tables.table(s, dir, name)

  // ---------------------------------------------------------------------
  // TPC-H-style relational core: scans, filters, aggregates, joins,
  // sorts, limits — exercises pushdown/pruning/broadcast machinery.
  // ---------------------------------------------------------------------

  val q1Pricing = Q("q1_pricing",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),2) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_base_price,
      round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      round(avg(l_quantity),4) AS avg_qty,
      round(avg(l_extendedprice),4) AS avg_price,
      round(avg(l_discount),4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus"""))

  val q3TopRevenue = Q("q3_top_revenue",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1999-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate,
      round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-01-01'
        AND l_shipdate > TIMESTAMP '1999-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  val q5RegionRevenue = Q("q5_region_revenue",
    (s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    },
    Some("""SELECT n_name,
      round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' GROUP BY n_name"""))

  val qTopParts = Q("q_top_parts",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.groupBy(col("l_partkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .orderBy(col("revenue").desc, col("l_partkey").asc)
        .limit(5)
        .select(col("p_partkey"), col("p_name"), col("revenue"), col("n_items"))
    },
    Some("""SELECT p_partkey, p_name, revenue, n_items FROM (
      SELECT l_partkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
             count(*) AS n_items
      FROM lineitem GROUP BY l_partkey) agg
      JOIN part ON l_partkey = p_partkey
      ORDER BY revenue DESC, l_partkey LIMIT 5"""))

  val qRollup = Q("q_rollup",
    (s, dir) => t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  val qAggStats = Q("q_agg_stats",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"),
        round(avg(col("value")), 4).as("avg_v"),
        round(sum(col("value")), 2).as("sum_v")),
    Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
      round(min(value),4) AS min_v, round(max(value),4) AS max_v,
      round(avg(value),4) AS avg_v, round(sum(value),2) AS sum_v
      FROM events GROUP BY event_type"""))

  val qSemiAnti = Q("q_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""))

  val qSemiJoin = Q("q_semi_join",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("2001-06-01"))
      sup.join(l, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    },
    Some("""SELECT s_suppkey, s_name FROM supplier s
      WHERE EXISTS (SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate > TIMESTAMP '2001-06-01')"""))

  val qWindowRunning = Q("q_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .withColumn("run_total", round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("rk"), col("run_total"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      row_number() OVER w AS rk,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_total
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""))

  // ---------------------------------------------------------------------
  // CDC semantic core over `events` (the stream stand-in table):
  // latest-per-key compaction (W1-W3), distinct fanout (W4), merge (K2-K4),
  // JSON path extraction (P3), envelope parse round-trips (P1-P14).
  // ---------------------------------------------------------------------

  val qCdcLatest = Q("q_cdc_latest",
    (s, dir) => Compaction.latestPerKey(t(s, dir, "events"),
        Seq("user_id"), Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts")),
    Some("""SELECT user_id, event_id, event_type, value, ts FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) x WHERE rn = 1"""))

  /** The aggregate-form compaction against the SAME oracle as
    * q_cdc_latest: hash-certifies that `max_by(struct(row), struct(ord))`
    * (map-side partials, no sort — the production pipeline's path)
    * computes exactly the windowed latest-per-key. */
  val qCdcLatestAgg = Q("q_cdc_latest_agg",
    (s, dir) => Compaction.latestPerKeyAgg(
        t(s, dir, "events").select("user_id", "event_id", "event_type", "value", "ts"),
        Seq("user_id"), Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts")),
    Some("""SELECT user_id, event_id, event_type, value, ts FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) x WHERE rn = 1"""))

  val qCdcMerge = Q("q_cdc_merge",
    (s, dir) => Compaction.latestPerKey(t(s, dir, "events"),
        Seq("user_id"), Seq("ts", "event_id"))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value")),
    Some("""SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) x WHERE rn = 1 AND event_type <> 'error'"""))

  val qCdcTargets = Q("q_cdc_targets",
    (s, dir) => Compaction.targets(
      t(s, dir, "events").withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day")),
    Some("SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events"))

  val qJsonExtract = Q("q_json_extract",
    (s, dir) => t(s, dir, "events")
      .filter(col("props").isNotNull)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k")),
    Some("""SELECT event_id, CAST(json_extract_string(props,'$.k') AS INTEGER) AS k
      FROM events WHERE props IS NOT NULL"""))

  /** The reference lands whole documents as Redshift SUPER (semi-
    * structured); Spark 4's VariantType is the modern equivalent
    * (SURVEY.md §1.1). Parse once to variant, extract typed paths.
    */
  val qVariant = Q("q_variant",
    (s, dir) => t(s, dir, "events")
      .filter(col("props").isNotNull)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        try_variant_get(col("v"), "$.k", "int").as("k")),
    Some("""SELECT event_id, CAST(json_extract_string(props,'$.k') AS INTEGER) AS k
      FROM events WHERE props IS NOT NULL"""))

  /** Shared across the bench's cold+warm runs: the warm run hits the
    * driver-side schema cache — the production behavior being measured.
    * Keyed by the data dir so different SFs never share an entry.
    */
  private val schemaCache = new graft.pipeline.SchemaInference(sampleRows = 5000)

  val qSchemaInference = Q("q_schema_inference",
    (s, dir) => {
      val ev = t(s, dir, "events")
      // DMS-style runtime payload inference (reference
      // src/glue_dms_redshift_cdc.py:161) through the PRODUCTION path:
      // per-table cached and sampleRows-capped, instead of re-inferring
      // over the full column on every run (the round-2 bench regression).
      val parsed = schemaCache.explodePayload(ev, db = "events", tb = dir,
        payloadCol = "props", keep = Seq.empty)
      parsed.groupBy(col("k")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT CAST(json_extract_string(props,'$.k') AS BIGINT) AS k, count(*) AS n
      FROM events GROUP BY 1"""))

  val qDateFuncs = Q("q_date_funcs",
    (s, dir) => t(s, dir, "events").select(
      col("event_id"),
      to_date(col("ts")).as("day"),
      hour(col("ts")).as("hr"),
      unix_timestamp(col("ts")).as("epoch_s"),
      date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
      date_trunc("minute", col("ts")).as("minute_ts"),
      dayofweek(col("ts")).as("dow"),
      add_months(to_date(col("ts")), 2).as("plus2m"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("days_in"),
      last_day(to_date(col("ts"))).as("month_end")),
    Some("""SELECT event_id, CAST(ts AS DATE) AS day, hour(ts) AS hr,
      epoch_ms(ts)//1000 AS epoch_s, strftime(ts, '%Y-%m-%d') AS day_str,
      date_trunc('minute', ts) AS minute_ts,
      dayofweek(ts) + 1 AS dow,
      CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
      datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_in,
      last_day(CAST(ts AS DATE)) AS month_end
      FROM events"""))

  /** String-function breadth over part names. */
  val qStringFuncs = Q("q_string_funcs",
    (s, dir) => t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      substring(col("p_name"), 1, 4).as("pre4"),
      length(col("p_name")).as("len"),
      lpad(col("p_brand"), 10, "#").as("padded"),
      translate(col("p_name"), "aeiou", "AEIOU").as("vowup"),
      reverse(col("p_name")).as("rev"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
      concat_ws("|", col("p_brand"), col("p_type")).as("joined")),
    Some("""SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 4) AS pre4,
      length(p_name) AS len, lpad(p_brand, 10, '#') AS padded,
      translate(p_name, 'aeiou', 'AEIOU') AS vowup,
      reverse(p_name) AS rev,
      string_split(p_name, ' ')[1] AS first_word,
      regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      concat_ws('|', p_brand, p_type) AS joined
      FROM part"""))

  /** Math-function breadth over lineitem prices (all rounded: libm
    * results agree to well past 4dp). */
  val qMathFuncs = Q("q_math_funcs",
    (s, dir) => t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(abs(col("l_extendedprice") * -1), 2).as("abs_p"),
      ceil(col("l_extendedprice")).cast("double").as("ceil_p"),
      floor(col("l_discount") * 100).cast("double").as("disc_pct"),
      round(sqrt(col("l_extendedprice")), 4).as("sqrt_p"),
      round(log10(col("l_extendedprice")), 4).as("log10_p"),
      round(pow(col("l_tax") + 1, 2), 4).as("tax_sq"),
      pmod(col("l_orderkey"), lit(7)).as("mod7"),
      sign(col("l_discount") - lit(0.05)).cast("int").as("disc_sign")),
    Some("""SELECT l_orderkey, l_linenumber,
      round(abs(l_extendedprice * -1), 2) AS abs_p,
      CAST(ceil(l_extendedprice) AS DOUBLE) AS ceil_p,
      CAST(floor(l_discount * 100) AS DOUBLE) AS disc_pct,
      round(sqrt(l_extendedprice), 4) AS sqrt_p,
      round(log10(l_extendedprice), 4) AS log10_p,
      round(pow(l_tax + 1, 2), 4) AS tax_sq,
      l_orderkey % 7 AS mod7,
      CAST(CASE WHEN l_discount > 0.05 THEN 1 WHEN l_discount < 0.05 THEN -1 ELSE 0 END AS INT) AS disc_sign
      FROM lineitem"""))

  val qEventsHourly = Q("q_events_hourly",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_v")),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
      count(*) AS n, round(sum(value),2) AS sum_v
      FROM events GROUP BY 1, 2"""))

  /** Debezium-PG envelope round-trip: serialize events into the exact
    * envelope JSON the reference consumes, run the real parse → extract →
    * compact pipeline, and compare against direct SQL over the base table.
    */
  /** Synthetic Debezium-PG envelope built from the events table — shared
    * by the envelope round-trip and DLQ queries. */
  private def pgEnvelope(ev0: DataFrame): DataFrame = {
    // stands in for Kafka-partition parallelism: the envelope build +
    // parse is the CPU-heavy narrow stage, and the single-file events
    // fixture would otherwise run it in one task (ext.Materialize.spread
    // is a no-op on well-partitioned inputs)
    val ev = ext.Materialize.spread(ev0)
    val payload = to_json(struct(
      col("user_id").as("id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      col("value").as("v")))
    ev.select(to_json(struct(
      payload.as("after"),
      struct(
        lit("2.5").as("version"), lit("postgresql").as("connector"),
        lit("pg1").as("name"), unix_millis(col("ts")).as("ts_ms"),
        lit("false").as("snapshot"), lit("appdb").as("db"),
        lit("public").as("schema"), col("event_type").as("table"),
        col("event_id").as("txId")).as("source"),
      when(col("event_type") === "error", lit("d")).otherwise(lit("u")).as("op"),
      unix_millis(col("ts")).as("ts_ms"))).as("value"),
      col("event_id"))
  }

  val qEnvelopePg = Q("q_envelope_pg",
    (s, dir) => {
      val env = pgEnvelope(t(s, dir, "events"))
      val norm = PgCdc.normalize(env, passthrough = Seq("event_id"))
      Compaction.latestPerKey(norm, Seq("db_name", "tb_name", "pk"),
          Seq("ts_ms", "event_id"))
        .select(col("db_name"), col("tb_name"), col("pk"), col("ts_ms"), col("op"))
    },
    Some("""SELECT db_name, tb_name, pk, ts_ms, op FROM (
      SELECT 'appdb' AS db_name, event_type AS tb_name,
             CAST(user_id AS VARCHAR) AS pk, epoch_ms(ts) AS ts_ms,
             CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
             row_number() OVER (PARTITION BY event_type, user_id
               ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events) x WHERE rn = 1"""))

  /** Mongo envelope round-trip incl. the merge's delete filter. */
  val qEnvelopeMongo = Q("q_envelope_mongo",
    (s, dir) => {
      val ev = ext.Materialize.spread(t(s, dir, "events"))
      val env = ev.select(to_json(struct(
        concat(lit("rid-"), col("event_id")).as("_id"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("insert")).as("operationType"),
        col("props").as("fullDocument"),
        unix_millis(col("ts")).as("ts_ms"),
        struct(lit("appdb").as("db"), col("event_type").as("coll")).as("ns"),
        to_json(struct(col("user_id").as("_id"))).as("documentKey"))).as("value"),
        col("event_id"))
      val norm = MongoCdc.normalize(env, passthrough = Seq("event_id"))
      Compaction.latestPerKey(norm, Seq("db_name", "tb_name", "pk"),
          Seq("ts_ms", "event_id"))
        .filter(col("op") =!= MongoCdc.deleteMarker)
        .select(col("db_name"), col("tb_name"), col("pk"), col("ts_ms"),
          col("payload"))
    },
    Some("""SELECT db_name, tb_name, pk, ts_ms, payload FROM (
      SELECT 'appdb' AS db_name, event_type AS tb_name,
             CAST(user_id AS VARCHAR) AS pk, epoch_ms(ts) AS ts_ms,
             props AS payload,
             CASE WHEN event_type='error' THEN 'delete' ELSE 'insert' END AS op,
             row_number() OVER (PARTITION BY event_type, user_id
               ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events) x WHERE rn = 1 AND op <> 'delete'"""))

  /** Dead-letter split: every 50th envelope is truncated mid-JSON; the
    * pipeline must route exactly those to the DLQ with their raw value,
    * and process the rest normally. The oracle counts from the
    * corruption rule itself. */
  val qEnvelopeDlq = Q("q_envelope_dlq",
    (s, dir) => {
      val env = pgEnvelope(t(s, dir, "events"))
      val corrupted = env.withColumn("value",
        when(col("event_id") % 50 === 0,
          expr("substring(value, 1, length(value) - 10)"))
          .otherwise(col("value")))
      // one-pass flagged form: the parse runs once for both halves
      PgCdc.normalizeFlagged(corrupted, Seq("event_id"))
        .select(when(col("__bad"), lit("dlq")).otherwise(lit("ok")).as("tag"))
        .groupBy(col("tag")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT CASE WHEN event_id % 50 = 0 THEN 'dlq' ELSE 'ok' END AS tag,
        count(*) AS n
      FROM events GROUP BY 1"""))

  /** DMS envelope round-trip incl. control-record filtering. */
  val qEnvelopeDms = Q("q_envelope_dms",
    (s, dir) => {
      val ev = ext.Materialize.spread(t(s, dir, "events"))
      val env = ev.select(to_json(struct(
        col("props").as("data"),
        struct(
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("timestamp"),
          when(col("event_id") % 97 === 0, lit("control")).otherwise(lit("data"))
            .as("record-type"),
          when(col("event_type") === "error", lit("delete"))
            .when(col("event_type") === "signup", lit("insert"))
            .otherwise(lit("update")).as("operation"),
          lit("schema-table").as("partition-key-type"),
          lit("appdb").as("schema-name"),
          col("event_type").as("table-name")).as("metadata"))).as("value"),
        col("event_id"), col("user_id"))
      val norm = DmsCdc(recordIdKey = "k").normalize(env,
        passthrough = Seq("event_id", "user_id"))
      Compaction.latestPerKey(
          norm.withColumn("pk", col("user_id").cast("string")),
          Seq("db_name", "tb_name", "pk"), Seq("ts_ms", "event_id"))
        .select(col("db_name"), col("tb_name"), col("pk"), col("ts_ms"), col("op"))
    },
    Some("""SELECT db_name, tb_name, pk, ts_ms, op FROM (
      SELECT 'appdb' AS db_name, event_type AS tb_name,
             CAST(user_id AS VARCHAR) AS pk, epoch_ms(ts) AS ts_ms,
             CASE WHEN event_type='error' THEN 'delete'
                  WHEN event_type='signup' THEN 'insert'
                  ELSE 'update' END AS op,
             row_number() OVER (PARTITION BY event_type, user_id
               ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events WHERE event_id % 97 <> 0) x WHERE rn = 1"""))

  // ---------------------------------------------------------------------
  // Extension: text analysis over `documents`.
  // ---------------------------------------------------------------------

  private val stopList = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")

  val qTextStats = Q("q_text_stats",
    (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.nTokens(col("text")).as("n_tokens"),
        TextOps.nBpeTokens(col("text")).as("n_bpe"),
        TextOps.nPunct(col("text")).as("n_punct"),
        TextOps.nStopwords(col("text")).as("n_stop"),
        length(col("text")).as("n_chars"))
      .select(col("doc_id"), col("n_tokens"), col("n_bpe"), col("n_punct"),
        col("n_stop"),
        TextOps.stopwordRatioBpFromCounts(col("n_tokens"), col("n_stop"))
          .as("stop_ratio_bp"),
        TextOps.qualityFromCounts(col("n_tokens"), col("n_stop"),
          col("n_punct"), col("n_chars")).as("quality")),
    Some(s"""WITH b AS (SELECT doc_id,
        len(regexp_extract_all(text, '\\S+')) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
        len(list_filter(regexp_extract_all(lower(text), '\\S+'),
            x -> x IN ($stopList))) AS n_stop,
        length(text) AS n_chars
      FROM documents)
      SELECT doc_id, n_tokens, n_bpe, n_punct, n_stop,
        CASE WHEN n_tokens > 0 THEN (n_stop * 10000) // n_tokens ELSE 0 END AS stop_ratio_bp,
        (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 10
              WHEN n_tokens < 20 THEN n_tokens // 2
              ELSE 10000 // n_tokens END) * 5
        + least((n_stop * 50) // greatest(n_tokens, 1), 10) * 3
        + (10 - least((n_punct * 50) // greatest(n_chars, 1), 10)) * 2 AS quality
      FROM b"""))

  val qTokenCount = Q("q_token_count",
    (s, dir) => t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        sum(TextOps.nTokens(col("text"))).as("total_tokens"),
        sum(TextOps.nBpeTokens(col("text"))).as("total_bpe"),
        count(lit(1)).as("n_docs")),
    Some("""SELECT lang,
      CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
      CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe,
      count(*) AS n_docs
      FROM documents GROUP BY lang"""))

  val qLangId = Q("q_lang_id",
    (s, dir) => t(s, dir, "documents").select(
      col("doc_id"),
      TextOps.langIdHeuristic(col("text")).as("lang_pred")),
    Some(s"""SELECT doc_id,
      CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
           WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
           WHEN regexp_matches(text, '[\\x{0900}-\\x{097f}]') THEN 'hi'
           WHEN len(list_filter(regexp_extract_all(lower(text), '\\S+'),
               x -> x IN ($stopList))) * 8 >= len(regexp_extract_all(text, '\\S+'))
             THEN 'en'
           ELSE 'und' END AS lang_pred
      FROM documents"""))

  /** Within-document repetition (duplicate 5-gram ratio) — the classic
    * boilerplate/spam signal in pretraining-data quality filtering.
    * Integer basis points for engine-exact parity.
    */
  val qRepetition = Q("q_repetition",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        greatest(size(split(TextOps.normalized(col("text")), " ")) - 4, lit(0))
          .as("total_5grams"),
        size(Dedup.wordShinglesUdf(col("text"), 5)).as("uniq_5grams"))
      .select(col("doc_id"), col("total_5grams"), col("uniq_5grams"),
        when(col("total_5grams") > 0,
          floor(((col("total_5grams") - col("uniq_5grams")) * 10000) / col("total_5grams")))
          .otherwise(lit(0)).cast("long").as("rep_bp")),
    Some("""WITH b AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
        FROM documents),
      c AS (
        SELECT doc_id, greatest(len(w)-4, 0) AS total_5grams,
               len(list_distinct(list_transform(
                 generate_series(1, greatest(len(w)-4, 0)),
                 i -> array_to_string(w[i:i+4], ' ')))) AS uniq_5grams
        FROM b)
      SELECT doc_id, total_5grams, uniq_5grams,
        CASE WHEN total_5grams > 0
          THEN ((total_5grams - uniq_5grams) * 10000) // total_5grams
          ELSE 0 END AS rep_bp
      FROM c"""))

  /** Session windows (30-minute inactivity gap) per user — Structured
    * Streaming's session_window in its batch form; the oracle replicates
    * with gaps-and-islands.
    */
  val qSessionize = Q("q_sessionize",
    (s, dir) => t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_v")),
    Some("""WITH x AS (
        SELECT user_id, ts, value,
               -- strict > matches Spark's verified boundary semantics: an
               -- event at exactly prev+gap still MERGES into the session
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE OR
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS brk
        FROM events),
      s AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM x)
      SELECT min(ts) AS session_start, user_id,
             count(*) AS n_events, round(sum(value),2) AS sum_v
      FROM s GROUP BY user_id, sid"""))

  val qFingerprint = Q("q_fingerprint",
    (s, dir) => t(s, dir, "documents").select(
      col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp")),
    Some("""SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents"""))

  /** End-to-end corpus curation — the composite flow a training-data
    * pipeline actually runs: language filter → quality floor →
    * repetition ceiling → exact dedup (keep lowest id per fingerprint) →
    * per-source corpus stats. Everything integer/string so the oracle is
    * exact.
    */
  val qCorpusCuration = Q("q_corpus_curation",
    (s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        TextOps.nTokens(col("text")).as("n_tokens"),
        TextOps.nStopwords(col("text")).as("n_stop"),
        TextOps.nPunct(col("text")).as("n_punct"),
        length(col("text")).as("n_chars"),
        TextOps.langIdHeuristic(col("text")).as("lang_pred"),
        greatest(size(split(TextOps.normalized(col("text")), " ")) - 4, lit(0))
          .as("total5"),
        size(Dedup.wordShinglesUdf(col("text"), 5)).as("uniq5"),
        TextOps.fingerprint(col("text")).as("fp"))
      val scored = base.select(col("*"),
        TextOps.qualityFromCounts(col("n_tokens"), col("n_stop"),
          col("n_punct"), col("n_chars")).as("quality"),
        when(col("total5") > 0,
          floor(((col("total5") - col("uniq5")) * 10000) / col("total5")))
          .otherwise(lit(0)).cast("long").as("rep_bp"))
      val kept = scored
        .filter(col("lang_pred") === "en" && col("quality") >= 60 &&
          col("rep_bp") <= 6000)
      val w = Window.partitionBy(col("fp"))
      kept.withColumn("keep_id", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("keep_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    },
    Some(s"""WITH b AS (
        SELECT doc_id, source,
          len(regexp_extract_all(text, '\\S+')) AS n_tokens,
          len(list_filter(regexp_extract_all(lower(text), '\\S+'),
              x -> x IN ($stopList))) AS n_stop,
          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
          length(text) AS n_chars,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
               WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
               WHEN regexp_matches(text, '[\\x{0900}-\\x{097f}]') THEN 'hi'
               WHEN len(list_filter(regexp_extract_all(lower(text), '\\S+'),
                   x -> x IN ($stopList))) * 8 >= len(regexp_extract_all(text, '\\S+'))
                 THEN 'en' ELSE 'und' END AS lang_pred,
          greatest(len(string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' '))-4, 0) AS total5,
          len(list_distinct(list_transform(
            generate_series(1, greatest(len(string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' '))-4, 0)),
            i -> array_to_string(string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ')[i:i+4], ' ')))) AS uniq5,
          md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents),
      scored AS (
        SELECT *,
          (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 10
                WHEN n_tokens < 20 THEN n_tokens // 2
                ELSE 10000 // n_tokens END) * 5
          + least((n_stop * 50) // greatest(n_tokens, 1), 10) * 3
          + (10 - least((n_punct * 50) // greatest(n_chars, 1), 10)) * 2 AS quality,
          CASE WHEN total5 > 0 THEN ((total5 - uniq5) * 10000) // total5
               ELSE 0 END AS rep_bp
        FROM b),
      kept AS (
        SELECT * FROM scored
        WHERE lang_pred = 'en' AND quality >= 60 AND rep_bp <= 6000),
      dedup AS (
        SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id
                       FROM kept) WHERE doc_id = keep_id)
      SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM dedup GROUP BY source"""))

  // ---------------------------------------------------------------------
  // Extension: dedup over `documents`.
  // ---------------------------------------------------------------------

  val qDedupExact = Q("dedup_exact",
    (s, dir) => Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
      .select(col("keep_id"), col("n_copies")),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"""))

  /** Exact dedup keyed on the Unicode-NFC form: composed and decomposed
    * text (é vs e+combining accent) render identically but hash
    * differently — un-normalized fingerprints silently miss those dups.
    * On this ASCII fixture the grouping equals dedup_exact's; the
    * unicode collapse itself is spec-proven (NfcSpec).
    */
  val qDedupNfc = Q("dedup_exact_nfc",
    (s, dir) => {
      graft.functions.VectorFunctions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(graft.functions.VectorFunctions.nfcNormalize(
            TextOps.normalized(col("text")))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
    },
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY md5(nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))"""))

  val qDedupJaccard = Q("dedup_ngram_jaccard",
    (s, dir) => Dedup.jaccardPairs(t(s, dir, "documents"),
      "doc_id", "text", n = 3, tau = 0.25),
    Some("""WITH docs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, len(sset) AS m, unnest(sset) AS shingle FROM sh)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) AS jacc
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.m, b.m
      HAVING round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) >= 0.25"""))

  /** Incremental dedup: an arriving batch (every 11th doc) checked
    * against the already-admitted corpus (the rest) — A-vs-B inverted
    * shingle index, no corpus self-pairing. The daily-ingest shape of
    * a growing training corpus.
    */
  val qDedupIncremental = Q("dedup_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.jaccardAgainst(
        docs.filter(col("doc_id") % 11 === 0),
        docs.filter(col("doc_id") % 11 =!= 0),
        "doc_id", "text", n = 3, tau = 0.25)
    },
    Some("""WITH docs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, len(sset) AS m, unnest(sset) AS shingle FROM sh)
      SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id,
             round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) AS jacc
      FROM ex a JOIN ex b ON a.shingle = b.shingle
        AND a.doc_id % 11 = 0 AND b.doc_id % 11 <> 0
      GROUP BY a.doc_id, b.doc_id, a.m, b.m
      HAVING round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) >= 0.25"""))

  private val minhashK = 16
  private val minhashBands = 4
  private val minhashParamsSql = Dedup.hashParams(minhashK)
    .map { case (i, a, b) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }.mkString(", ")

  val qDedupMinhash = Q("dedup_minhash",
    (s, dir) => {
      val sigs = Dedup.minhashSignatures(t(s, dir, "documents"),
        "doc_id", "text", n = 3, k = minhashK)
      Dedup.minhashCandidates(sigs, k = minhashK, bands = minhashBands)
        .filter(col("est_jacc") >= 0.25)
    },
    Some(s"""WITH params(hidx, ha, hb) AS (VALUES $minhashParamsSql),
      docs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      hv AS (
        SELECT doc_id, hidx,
               min((ha * (('0x'||substr(md5(shingle),1,8))::BIGINT) + hb)
                   % 2305843009213693951) AS mh
        FROM ex CROSS JOIN params GROUP BY doc_id, hidx),
      sig AS (SELECT doc_id, array_agg(mh ORDER BY hidx) AS sig FROM hv GROUP BY doc_id),
      bands AS (
        SELECT doc_id, sig, b.band,
               sig[b.band*4+1 : b.band*4+4] AS band_sig
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0,3)) AS band) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sig AS sa, b.sig AS sb
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
             round(len(list_filter(generate_series(1, $minhashK),
                   i -> sa[i] = sb[i]))::DOUBLE / $minhashK, 4) AS est_jacc
      FROM cand
      WHERE round(len(list_filter(generate_series(1, $minhashK),
                   i -> sa[i] = sb[i]))::DOUBLE / $minhashK, 4) >= 0.25"""))

  /** Incremental MinHash: the arriving batch's signatures banded against
    * the stored corpus signature index — corpus text never re-read. */
  val qDedupMinhashIncremental = Q("dedup_minhash_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      def sigs(side: DataFrame) = Dedup.minhashSignatures(side,
        "doc_id", "text", n = 3, k = minhashK)
      Dedup.minhashCandidatesAgainst(
        sigs(docs.filter(col("doc_id") % 11 === 0)),
        sigs(docs.filter(col("doc_id") % 11 =!= 0)),
        k = minhashK, bands = minhashBands)
        .filter(col("est_jacc") >= 0.25)
    },
    Some(s"""WITH params(hidx, ha, hb) AS (VALUES $minhashParamsSql),
      docs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      hv AS (
        SELECT doc_id, hidx,
               min((ha * (('0x'||substr(md5(shingle),1,8))::BIGINT) + hb)
                   % 2305843009213693951) AS mh
        FROM ex CROSS JOIN params GROUP BY doc_id, hidx),
      sig AS (SELECT doc_id, array_agg(mh ORDER BY hidx) AS sig FROM hv GROUP BY doc_id),
      bands AS (
        SELECT doc_id, sig, b.band,
               sig[b.band*4+1 : b.band*4+4] AS band_sig
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0,3)) AS band) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id,
               a.sig AS sa, b.sig AS sb
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig
          AND a.doc_id % 11 = 0 AND b.doc_id % 11 <> 0)
      SELECT batch_id, corpus_id,
             round(len(list_filter(generate_series(1, $minhashK),
                   i -> sa[i] = sb[i]))::DOUBLE / $minhashK, 4) AS est_jacc
      FROM cand
      WHERE round(len(list_filter(generate_series(1, $minhashK),
                   i -> sa[i] = sb[i]))::DOUBLE / $minhashK, 4) >= 0.25"""))

  /** Shared oracle prefix for the cluster-derived queries: trigram-
    * Jaccard pairs (tau 0.25) → undirected edges → recursive min-label
    * reachability. `dedup_clusters` reads it directly; `dedup_survivors`
    * builds its survivor pick on top.
    */
  private val clusterReachCte = """WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
          WITH docs AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
            FROM documents),
          sh AS (
            SELECT doc_id, list_distinct(list_transform(
              generate_series(1, greatest(len(w)-2, 0)),
              i -> array_to_string(w[i:i+2], ' '))) AS sset
            FROM docs),
          ex AS (SELECT doc_id, len(sset) AS m, unnest(sset) AS shingle FROM sh)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id, a.m, b.m
          HAVING round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) >= 0.25)),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)"""

  /** Pairs → connected components → cluster assignment: the step that
    * turns near-dup pairs into "keep one per cluster" decisions. The
    * oracle replicates min-label reachability with a recursive CTE.
    */
  val qDedupClusters = Q("dedup_clusters",
    (s, dir) => {
      val pairs = Dedup.jaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, tau = 0.25)
      Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
    },
    Some(s"""$clusterReachCte
      SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id"""))

  /** Passage-level exact dedup: per-doc retention stats after dropping
    * every non-canonical occurrence of a repeated 20-token passage.
    * Catches cross-document boilerplate that doc-level dedup misses.
    */
  val qDedupPassages = Q("dedup_passages",
    (s, dir) => Dedup.passageDedup(t(s, dir, "documents"),
        "doc_id", "text", passageTokens = 20)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("keep"), lit(0)).otherwise(lit(1))).as("n_dup_dropped"),
        max(col("n_occ")).as("max_occ"))
      .select(col("id").as("doc_id"), col("n_passages"),
        col("n_dup_dropped"), col("max_occ")),
    Some("""WITH d AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      sized AS (
        SELECT doc_id, toks,
          CASE WHEN toks = [''] THEN 0 ELSE len(toks) END AS n
        FROM d),
      chunked AS (
        SELECT doc_id, toks, greatest(CAST(ceil(n / 20.0) AS INT), 1) AS n_chunks
        FROM sized WHERE n > 0),
      pass AS (
        SELECT doc_id, c.chunk_no,
          md5(array_to_string(toks[c.chunk_no*20+1 : c.chunk_no*20+20], ' ')) AS fp
        FROM chunked, LATERAL (
          SELECT unnest(generate_series(0, n_chunks - 1)) AS chunk_no) c),
      marked AS (
        SELECT doc_id, chunk_no,
          count(*) OVER (PARTITION BY fp) AS n_occ,
          row_number() OVER (PARTITION BY fp
            ORDER BY doc_id ASC, chunk_no ASC) AS rn
        FROM pass)
      SELECT doc_id, count(*) AS n_passages,
        CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_dropped,
        max(n_occ) AS max_occ
      FROM marked GROUP BY doc_id"""))

  /** The passage-dedup REWRITE: reassemble each document from its kept
    * passages (deterministic chunk order) — the corpus a training run
    * would actually read. Hash-checked via the cleaned text's md5, so
    * the oracle pins every byte of the reassembly.
    */
  val qDedupPassageRewrite = Q("dedup_passage_rewrite",
    (s, dir) => Dedup.passageRewrite(t(s, dir, "documents"),
        "doc_id", "text", passageTokens = 20)
      .select(col("id").as("doc_id"), col("n_kept"), col("clean_fp")),
    Some("""WITH d AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      sized AS (
        SELECT doc_id, toks,
          CASE WHEN toks = [''] THEN 0 ELSE len(toks) END AS n
        FROM d),
      chunked AS (
        SELECT doc_id, toks, greatest(CAST(ceil(n / 20.0) AS INT), 1) AS n_chunks
        FROM sized WHERE n > 0),
      pass AS (
        SELECT doc_id, c.chunk_no,
          array_to_string(toks[c.chunk_no*20+1 : c.chunk_no*20+20], ' ') AS chunk_text
        FROM chunked, LATERAL (
          SELECT unnest(generate_series(0, n_chunks - 1)) AS chunk_no) c),
      marked AS (
        SELECT doc_id, chunk_no, chunk_text,
          row_number() OVER (PARTITION BY md5(chunk_text)
            ORDER BY doc_id ASC, chunk_no ASC) AS rn
        FROM pass)
      SELECT doc_id, count(*) AS n_kept,
        md5(string_agg(chunk_text, ' ' ORDER BY chunk_no)) AS clean_fp
      FROM marked WHERE rn = 1 GROUP BY doc_id"""))

  /** Char-level exact-substring duplicate spans (ExactSubstr family):
    * 40-char windows at content-defined anchors ([[graft.ext.Dedup
    * .substringDupSpans]]) — the alignment-free complement to the
    * word-shingle passage dedup above. The oracle replays anchor
    * selection (3-point char hash mod 8), window fingerprinting, and
    * the distinct-doc cut verbatim. */
  val qDedupSubstrings = Q("dedup_substrings",
    (s, dir) => Dedup.substringDupSpans(t(s, dir, "documents"),
      "doc_id", "text", winBytes = 40, anchorMod = 8),
    Some("""WITH d AS (
        SELECT doc_id,
          trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      sized AS (
        SELECT doc_id, t, length(t) AS n FROM d WHERE length(t) >= 40),
      pos AS (
        SELECT doc_id, t, unnest(generate_series(1, n - 40 + 1)) AS p
        FROM sized),
      anch AS (
        SELECT doc_id, t, p FROM pos
        WHERE (ascii(substr(t, p, 1)) * 4 + ascii(substr(t, p + 3, 1)) * 2
               + ascii(substr(t, p + 7, 1))) % 8 = 0),
      wins AS (SELECT doc_id, md5(substr(t, p, 40)) AS fp FROM anch)
      SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
             min(doc_id) AS first_doc
      FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2"""))

  /** Per-document duplicated-span coverage — ExactSubstr's decision
    * step: fraction of each document covered by corpus-repeated 40-char
    * spans, as the interval union of its duplicated windows
    * (gaps-and-islands; overlaps never double-count). The oracle
    * replays anchors, occurrence counts, the island pass, and the
    * basis-point policy cut verbatim.
    *
    * ORACLE UNITS: the SQL replay enumerates positions and windows in
    * CHARACTERS (DuckDB v1.0 has no BLOB substr/indexing, so a byte
    * replay is not expressible), which equals the operator's byte scan
    * exactly on the ASCII fixture corpus the gate runs against. The
    * byte semantics on non-ASCII text — where char and byte replays
    * diverge — are pinned by `ExtOpsSpec`'s CJK coverage battery
    * against hand-computed byte counts, not by this oracle. */
  val qDedupSubstrCoverage = Q("dedup_substr_coverage",
    (s, dir) => Dedup.substringDupCoverage(t(s, dir, "documents"),
      "doc_id", "text", winBytes = 40, anchorMod = 8, dropAtBp = 5000),
    Some("""WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      sized AS (
        SELECT doc_id, t, length(t) AS n FROM d WHERE length(t) >= 40),
      pos AS (
        SELECT doc_id, t, unnest(generate_series(1, n - 40 + 1)) AS p
        FROM sized),
      anch AS (
        SELECT doc_id, t, p FROM pos
        WHERE (ascii(substr(t, p, 1)) * 4 + ascii(substr(t, p + 3, 1)) * 2
               + ascii(substr(t, p + 7, 1))) % 8 = 0),
      wins AS (SELECT doc_id, p, md5(substr(t, p, 40)) AS fp FROM anch),
      occ AS (
        SELECT doc_id, p, count(*) OVER (PARTITION BY fp) AS n_occ
        FROM wins),
      dup AS (SELECT doc_id, p FROM occ WHERE n_occ >= 2),
      marked AS (
        SELECT doc_id, p,
          CASE WHEN p > coalesce(max(p + 40) OVER (PARTITION BY doc_id
            ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS new_isl
        FROM dup),
      isl AS (
        SELECT doc_id, p,
          sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS isl_id
        FROM marked),
      spans AS (
        SELECT doc_id, isl_id, min(p) AS s, max(p) + 40 AS e, count(*) AS n_win
        FROM isl GROUP BY 1, 2),
      cov AS (
        SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS covered_bytes,
               CAST(sum(n_win) AS BIGINT) AS n_dup_windows
        FROM spans GROUP BY 1),
      base AS (
        SELECT doc_id,
          octet_length(encode(trim(regexp_replace(lower(text),'\s+',' ','g')))) AS n_bytes
        FROM documents)
      SELECT b.doc_id AS id, CAST(b.n_bytes AS BIGINT) AS n_bytes,
        coalesce(c.n_dup_windows, 0) AS n_dup_windows,
        coalesce(c.covered_bytes, 0) AS covered_bytes,
        CASE WHEN b.n_bytes > 0
          THEN (coalesce(c.covered_bytes, 0) * 10000) // b.n_bytes
          ELSE 0 END AS cov_bp,
        (CASE WHEN b.n_bytes > 0
          THEN (coalesce(c.covered_bytes, 0) * 10000) // b.n_bytes
          ELSE 0 END) >= 5000 AS "drop"
      FROM base b LEFT JOIN cov c USING (doc_id)"""))

  /** Clusters → survivor per cluster: the decision step of the dedup
    * pipeline. Score = token count; argmax with min-id tie-break, as a
    * map-side-collapsible aggregate (no per-cluster window).
    */
  val qDedupSurvivors = Q("dedup_survivors",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.25)
      val clusters = Dedup.connectedComponents(pairs)
      val scores = docs.select(col("doc_id").as("id"),
        TextOps.nTokens(col("text")).as("score"))
      Dedup.survivors(clusters, scores)
        .withColumnRenamed("dropped_score", "dropped_tokens")
    },
    Some(s"""$clusterReachCte,
      clust AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
      scored AS (
        SELECT c.cluster_id, c.doc_id,
               len(regexp_extract_all(d.text, '\\S+')) AS score
        FROM clust c JOIN documents d USING (doc_id)),
      ranked AS (
        SELECT cluster_id, doc_id, score,
               row_number() OVER (PARTITION BY cluster_id
                 ORDER BY score DESC, doc_id ASC) AS rk,
               sum(score) OVER (PARTITION BY cluster_id) AS total_score,
               count(*) OVER (PARTITION BY cluster_id) AS n_members
        FROM scored)
      SELECT cluster_id, doc_id AS survivor_id, n_members,
             CAST(total_score - score AS BIGINT) AS dropped_tokens
      FROM ranked WHERE rk = 1"""))

  /** SimHash near-dup pairs. Oracle replicates the WHOLE pipeline —
    * portable 60-bit token hash, per-bit ±1 sums, 6×10-bit pigeonhole
    * bands, hamming ≤ 5 — in SQL (md5 and bit ops are engine-portable).
    */
  val qDedupSimhash = Q("dedup_simhash",
    (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"),
      "doc_id", "text", maxDist = 5),
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS tok
        FROM documents),
      h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h
            FROM toks WHERE tok <> ''),
      bits AS (
        SELECT doc_id, j.j,
               sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM h CROSS JOIN (SELECT unnest(generate_series(0,59)) AS j) j
        GROUP BY doc_id, j.j),
      sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
        FROM bits GROUP BY doc_id),
      banded AS (
        SELECT doc_id, sig, b.b AS band, (sig >> (b.b * 10)) & 1023 AS key
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0,5)) AS b) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
      FROM cand WHERE bit_count(xor(sa, sb)) <= 5"""))

  /** Incremental SimHash: batch signatures vs the stored 8-byte-per-doc
    * corpus index. */
  val qDedupSimhashIncremental = Q("dedup_simhash_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      def sigs(side: DataFrame) = Dedup.simhashSignatures(side, "doc_id", "text")
      Dedup.simhashAgainst(
        sigs(docs.filter(col("doc_id") % 11 === 0)),
        sigs(docs.filter(col("doc_id") % 11 =!= 0)),
        maxDist = 5)
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS tok
        FROM documents),
      h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h
            FROM toks WHERE tok <> ''),
      bits AS (
        SELECT doc_id, j.j,
               sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM h CROSS JOIN (SELECT unnest(generate_series(0,59)) AS j) j
        GROUP BY doc_id, j.j),
      sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
        FROM bits GROUP BY doc_id),
      banded AS (
        SELECT doc_id, sig, b.b AS band, (sig >> (b.b * 10)) & 1023 AS key
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0,5)) AS b) b),
      cand AS (
        SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id,
               a.sig AS sa, b.sig AS sb
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key
          AND a.doc_id % 11 = 0 AND b.doc_id % 11 <> 0)
      SELECT batch_id, corpus_id, bit_count(xor(sa, sb)) AS hamming
      FROM cand WHERE bit_count(xor(sa, sb)) <= 5"""))

  // ---------------------------------------------------------------------
  // Extension: similarity search over `embeddings`.
  // ---------------------------------------------------------------------

  val qAnnBrute = Q("ann_bruteforce",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        e.select(col("vec_id").as("id"), col("embedding")),
        e.filter(col("vec_id") < 5).select(col("vec_id").as("id"), col("embedding")),
        k = 10)
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT qid, vec_id AS nn_id,
               round(CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0 OR list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) END, 3) AS sim
        FROM embeddings CROSS JOIN q WHERE vec_id <> qid),
      ranked AS (
        SELECT qid AS query_id, nn_id, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS rank
        FROM scored)
      SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 10"""))

  val qEmbeddingNearDup = Q("dedup_embedding",
    (s, dir) => Similarity.nearDupPairs(t(s, dir, "embeddings"),
      "vec_id", "embedding", "label", tau = 0.4),
    Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(CASE WHEN list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) = 0 OR list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 3) AS sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(CASE WHEN list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) = 0 OR list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 3) >= 0.4"""))

  val qAnnIvf = Q("ann_ivf",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(
        e.select(col("vec_id").as("id"), col("embedding")),
        e.filter(col("vec_id") < 5).select(col("vec_id").as("id"), col("embedding")),
        k = 10, nCentroids = 8, nProbe = 3)
    },
    Some("""WITH cents AS (
        SELECT vec_id AS cid, embedding AS cent FROM embeddings
        ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                          c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cents c),
      cell AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
      q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      qprobe AS (
        SELECT q.qid, q.qe, c.cid AS cell,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY CASE WHEN list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(q.qe::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                          c.cid ASC) AS rn
        FROM q CROSS JOIN cents c),
      probes AS (SELECT qid, qe, cell FROM qprobe WHERE rn <= 3),
      scored AS (
        SELECT p.qid AS query_id, ce.vec_id AS nn_id,
               round(CASE WHEN list_dot_product(ce.embedding::DOUBLE[], ce.embedding::DOUBLE[]) = 0 OR list_dot_product(p.qe::DOUBLE[], p.qe::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(ce.embedding::DOUBLE[], p.qe::DOUBLE[]) END, 3) AS sim
        FROM probes p JOIN cell ce ON ce.cell = p.cell
        WHERE ce.vec_id <> p.qid),
      ranked AS (
        SELECT query_id, nn_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nn_id) AS rank
        FROM scored)
      SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 10"""))

  /** Semantic decontamination: corpus vectors cosine-close (≥0.35) to
    * any benchmark vector (every 97th) — catches paraphrased
    * contamination that n-gram overlap (q_decontam) misses. Broadcast
    * benchmark, single corpus scan.
    */
  val qDecontamEmbedding = Q("q_decontam_embedding",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        e.filter(col("vec_id") % 97 =!= 0),
        e.filter(col("vec_id") % 97 === 0),
        "vec_id", "embedding", tau = 0.35)
        .select(col("id").as("vec_id"), col("n_matches"), col("max_sim"))
    },
    Some("""WITH b AS (SELECT vec_id AS b_id, embedding AS b_emb
              FROM embeddings WHERE vec_id % 97 = 0),
      c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0),
      scored AS (
        SELECT c.vec_id,
          round(CASE WHEN list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]) = 0 OR list_dot_product(b.b_emb::DOUBLE[], b.b_emb::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(c.embedding::DOUBLE[], b.b_emb::DOUBLE[]) END, 3) AS sim
        FROM c CROSS JOIN b)
      SELECT vec_id, count(*) AS n_matches, max(sim) AS max_sim
      FROM scored WHERE sim >= 0.35 GROUP BY vec_id"""))

  /** Label-free embedding near-dup at scale: SRP-LSH buckets as the
    * blocking key (6 tables × 6-bit signatures), exact cosine verify
    * within buckets. Deterministic hyperplanes (md5 parity) let the
    * oracle rebuild the identical buckets — an APPROXIMATE operator
    * whose exact output is still hash-certified.
    */
  val qEmbeddingNearDupSrp = Q("dedup_embedding_srp",
    (s, dir) => Similarity.nearDupPairsSrp(t(s, dir, "embeddings"),
      "vec_id", "embedding", tau = 0.4, dim = 64, nBits = 6, nTables = 6),
    Some("""WITH signs AS (
        SELECT t.t, i.i, j.j,
          CASE WHEN ('0x'||substr(md5(t.t||':'||i.i||':'||j.j),1,2))::INT % 2 = 0
               THEN 1.0 ELSE -1.0 END AS s
        FROM (SELECT unnest(generate_series(0,5)) AS t) t
        CROSS JOIN (SELECT unnest(generate_series(0,5)) AS i) i
        CROSS JOIN (SELECT unnest(generate_series(0,63)) AS j) j),
      planes AS (
        SELECT t, i, list(s ORDER BY j) AS sv FROM signs GROUP BY t, i),
      dots AS (
        SELECT e.vec_id, p.t, p.i,
          list_reduce(list_transform(generate_series(1,64),
            j -> e.embedding[j]::DOUBLE * p.sv[j]), (a,b) -> a+b) AS dot
        FROM embeddings e CROSS JOIN planes p),
      sigs AS (
        SELECT vec_id, t,
          CAST(coalesce(sum(CASE WHEN dot > 0 THEN (1::BIGINT << i) END), 0) AS BIGINT) AS sig
        FROM dots GROUP BY vec_id, t),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
      SELECT c.id_a, c.id_b,
        round(CASE WHEN list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]) = 0 OR list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) END, 3) AS sim
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b
      WHERE round(CASE WHEN list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]) = 0 OR list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) END, 3) >= 0.4"""))

  /** SemDeDup composite: k-means cells (deterministic lowest-id seeds
    * for the oracle) → within-cell cosine near-dup → connected
    * components → keep the member FARTHEST from its centroid. The
    * oracle replays cell assignment (the q_kmeans_assign pattern),
    * per-cell pairs (the dedup_embedding pattern), min-label
    * reachability (the dedup_clusters recursive CTE), and the survivor
    * argmin — the full composite hash-certified.
    */
  val qDedupSemantic = Q("dedup_semantic",
    (s, dir) => Similarity.semanticDedup(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, tau = 0.4)
      .select(col("id").as("vec_id"), col("cell"), col("cluster_id"),
        col("cent_sim"), col("keep")),
    Some("""WITH RECURSIVE cents AS (
        SELECT embedding AS cent, row_number() OVER (ORDER BY vec_id) - 1 AS c
        FROM embeddings ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT e.vec_id, e.embedding, c.c,
          round(CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END, 3) AS cs,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                     c.c ASC) AS rn
        FROM embeddings e CROSS JOIN cents c),
      cell AS (
        SELECT vec_id, embedding, c AS cell, cs AS cent_sim
        FROM assign WHERE rn = 1),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE round(CASE WHEN list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) = 0 OR list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 3) >= 0.4),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
      clus AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
      scored AS (
        SELECT ce.vec_id, ce.cell,
          coalesce(cl.cluster, ce.vec_id) AS cluster_id, ce.cent_sim
        FROM cell ce LEFT JOIN clus cl ON cl.id = ce.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
            ORDER BY cent_sim ASC, vec_id ASC) AS krn
        FROM scored)
      SELECT vec_id, cell, cluster_id, cent_sim, krn = 1 AS "keep"
      FROM ranked"""))

  /** IVF at scale posture: 64 k-means-trained centroids (2 Lloyd
    * iterations), 8-cell probes. Lloyd training isn't SQL-expressible,
    * so the trained neighbor lists have no portable oracle — instead the
    * query is PROPERTY-CHECKED against the exact brute-force top-10
    * (whose own query, ann_bruteforce, is hash-matched), on two
    * invariants the oracle asserts literally TRUE:
    *  - full_probe_exact: with nProbe = nCentroids the probe covers
    *    every cell, so IVF MUST reproduce brute force row-for-row
    *    (same rounding and tie-break) — a sharp machinery check that
    *    every vector lands in exactly one cell and scoring/ranking is
    *    identical; a lost or duplicated vector flips the hash;
    *  - recall_floor_ok: aggregate recall@10 across the queries at the
    *    8-of-64-cell operating point ≥ 0.6. Random probing at 8/64
    *    cells would give ≈ 0.125; the floor certifies the TRAINED
    *    coarse quantizer concentrates true neighbors ~5× better
    *    (measured 0.74–0.86 at sf0.001–0.1; this synthetic embedding
    *    table is near-isotropic, which bounds honest IVF recall — real
    *    clustered corpora sit far higher).
    * Also still proves the centroid set rides as ONE array literal (no
    * plan blowup at k=64) and benches the trained path.
    */
  val qAnnIvfTrained = Q("ann_ivf_trained",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("id"), col("embedding"))
      val cents = 64
      val trained = Similarity.ivfTopK(corpus, queries,
        k = 10, nCentroids = cents, nProbe = 8, trainIters = 2)
      val full = Similarity.ivfTopK(corpus, queries,
        k = 10, nCentroids = cents, nProbe = cents, trainIters = 2)
      val truth = Similarity.bruteForceTopK(corpus, queries, k = 10)
      val hits = truth.select(col("query_id"), col("nn_id"))
        .join(trained.select(col("query_id"), col("nn_id")),
          Seq("query_id", "nn_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      val perQ = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      val floor = perQ.agg((sum(col("n_hits")).cast("double")
          >= lit(0.6) * sum(col("n_true"))).as("recall_floor_ok"))
      // full-probe result must equal truth on every (rank, nn_id, sim);
      // renamed columns keep the self-derived join unambiguous
      val exact = truth
        .select(col("query_id"), col("rank"),
          col("nn_id").as("t_nn"), col("sim").as("t_sim"))
        .join(full.select(col("query_id"), col("rank"),
          col("nn_id").as("f_nn"), col("sim").as("f_sim")),
          Seq("query_id", "rank"), "full")
        .groupBy(col("query_id")).agg(
          (sum(when(col("t_nn") === col("f_nn")
              && col("t_sim") === col("f_sim"), 0L).otherwise(1L)) === 0L)
            .as("full_probe_exact"))
      perQ.select(col("query_id"), col("n_true"))
        .join(exact, Seq("query_id"))
        .crossJoin(broadcast(floor))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      ranked AS (
        SELECT qid, row_number() OVER (PARTITION BY qid
          ORDER BY round(CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0 OR list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) END, 3) DESC,
                   vec_id) AS rank
        FROM embeddings CROSS JOIN q WHERE vec_id <> qid)
      SELECT qid AS query_id, count(*) AS n_true, TRUE AS full_probe_exact,
        TRUE AS recall_floor_ok
      FROM ranked WHERE rank <= 10 GROUP BY qid"""))

  /** Diversity sampling: per-semantic-cell quotas over the embedding
    * space (deterministic lowest-id cells + portable-hash quota, so the
    * whole pipeline is oracle-checkable).
    */
  val qDiversitySample = Q("q_diversity_sample",
    (s, dir) => Similarity.diversitySample(
        t(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding")),
        "id", "embedding", nCells = 8, quota = 20)
      .select(col("cell"), col("sample_rank"), col("id").as("vec_id")),
    Some("""WITH cents AS (
        SELECT vec_id AS cid, embedding AS cent FROM embeddings
        ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                          c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cents c),
      cell AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      ranked AS (
        SELECT cell, vec_id,
               row_number() OVER (PARTITION BY cell
                 ORDER BY ('0x'||substr(md5(vec_id::VARCHAR),1,15))::BIGINT,
                          vec_id) AS sample_rank
        FROM cell)
      SELECT cell, sample_rank, vec_id FROM ranked WHERE sample_rank <= 20"""))

  /** PQ-compressed ANN: 8-byte codes, ADC scan with exact cosine re-rank
    * of a 60-candidate shortlist. Deterministic codebooks (`iters = 0`:
    * the lowest-id vectors' subvectors, the [[Similarity.ivfTopK]]
    * untrained convention) make the FULL pipeline oracle-checkable —
    * normalize, per-subspace argmin encode, ADC table lookups and the
    * shortlist cut are all index-order IEEE folds the oracle replays
    * exactly. Lloyd-trained codebooks (no portable oracle) are covered
    * by PqSpec: codebook determinism, quantization error bound, recall
    * vs brute force.
    */
  val qAnnPq = Q("ann_pq",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      val books = graft.ext.Pq.train(corpus, "id", "embedding",
        dim = 64, m = 8, nCodes = 16, iters = 0)
      graft.ext.Pq.searchAdc(corpus,
        e.filter(col("vec_id") < 5).select(col("vec_id").as("id"), col("embedding")),
        k = 10, books, refine = 60)
    },
    Some("""WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
      n2 AS (
        SELECT vec_id, ed,
          list_reduce(list_transform(ed, x -> x*x), (a,b) -> a+b) AS nn
        FROM e),
      normed AS (
        SELECT vec_id,
          CASE WHEN nn > 0 THEN
            list_transform(ed, x -> CAST(CAST(x / sqrt(nn) AS REAL) AS DOUBLE))
          ELSE ed END AS nv
        FROM n2),
      init AS (
        SELECT nv, row_number() OVER (ORDER BY vec_id) - 1 AS c
        FROM normed ORDER BY vec_id LIMIT 16),
      books AS (
        SELECT s.s, i.c, i.nv[s.s*8+1 : s.s*8+8] AS cent
        FROM init i CROSS JOIN (SELECT unnest(generate_series(0,7)) AS s) s),
      vsub AS (
        SELECT v.vec_id, b.s, b.c,
          list_reduce(list_transform(generate_series(1,8),
            j -> (v.nv[b.s*8 + j] - b.cent[j]) * (v.nv[b.s*8 + j] - b.cent[j])),
            (a,x) -> a + x) AS d
        FROM normed v CROSS JOIN books b),
      codes AS (
        SELECT vec_id, s, c AS code FROM (
          SELECT vec_id, s, c,
            row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC) AS rn
          FROM vsub) WHERE rn = 1),
      adist AS (
        SELECT qd.vec_id AS query_id, cv.vec_id AS nn_id,
          list_reduce(list(qd.d ORDER BY qd.s), (a,b) -> a+b) AS ad
        FROM codes cv
        JOIN vsub qd ON qd.s = cv.s AND qd.c = cv.code
        WHERE qd.vec_id < 5 AND cv.vec_id <> qd.vec_id
        GROUP BY qd.vec_id, cv.vec_id),
      short AS (
        SELECT query_id, nn_id FROM (
          SELECT query_id, nn_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY ad ASC, nn_id ASC) AS arank
          FROM adist) WHERE arank <= 60),
      rer AS (
        SELECT s.query_id, s.nn_id,
          round(CASE WHEN list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]) = 0 OR list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) END, 3) AS sim
        FROM short s
        JOIN embeddings c ON c.vec_id = s.nn_id
        JOIN embeddings q ON q.vec_id = s.query_id),
      ranked AS (
        SELECT query_id, nn_id, sim,
          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nn_id) AS rank
        FROM rer)
      SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 10"""))

  /** Full IVF-PQ: coarse cells prune WHICH vectors are scored (nProbe=6
    * of 16 cells), PQ codes shrink WHAT is scored (8 bytes/vector),
    * exact cosine re-ranks the shortlist — the billion-scale ANN shape.
    * Deterministic parameterization (lowest-id coarse centroids — the
    * untrained [[Similarity.ivfTopK]] convention — and `iters = 0`
    * codebooks), so cell assignment, probes, encode, ADC and both rank
    * cuts all replay in the oracle. The Lloyd-trained composite is
    * covered by PqSpec's probe-all ≡ un-pruned-ADC identity and
    * ann_ivf_trained's trained coarse path.
    */
  val qAnnIvfPq = Q("ann_ivf_pq",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      val cents = corpus.orderBy(col("id")).limit(16)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val books = graft.ext.Pq.train(corpus, "id", "embedding",
        dim = 64, m = 8, nCodes = 16, iters = 0)
      graft.ext.Pq.searchIvfAdc(corpus,
        e.filter(col("vec_id") < 5).select(col("vec_id").as("id"), col("embedding")),
        k = 10, cents, books, nProbe = 6, refine = 60)
    },
    Some("""WITH cents AS (
        SELECT vec_id AS cid, embedding AS cent FROM embeddings
        ORDER BY vec_id LIMIT 16),
      assign AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                          c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cents c),
      cell AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      qprobe AS (
        SELECT q.vec_id AS qid, c.cid AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY CASE WHEN list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(q.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                          c.cid ASC) AS rn
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5),
      probes AS (SELECT qid, cell FROM qprobe WHERE rn <= 6),
      cand AS (
        SELECT p.qid AS query_id, ce.vec_id AS nn_id
        FROM probes p JOIN cell ce ON ce.cell = p.cell
        WHERE ce.vec_id <> p.qid),
      e2 AS (
        SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
      n2 AS (
        SELECT vec_id, ed,
          list_reduce(list_transform(ed, x -> x*x), (a,b) -> a+b) AS nn
        FROM e2),
      normed AS (
        SELECT vec_id,
          CASE WHEN nn > 0 THEN
            list_transform(ed, x -> CAST(CAST(x / sqrt(nn) AS REAL) AS DOUBLE))
          ELSE ed END AS nv
        FROM n2),
      init AS (
        SELECT nv, row_number() OVER (ORDER BY vec_id) - 1 AS c
        FROM normed ORDER BY vec_id LIMIT 16),
      books AS (
        SELECT s.s, i.c, i.nv[s.s*8+1 : s.s*8+8] AS cent
        FROM init i CROSS JOIN (SELECT unnest(generate_series(0,7)) AS s) s),
      vsub AS (
        SELECT v.vec_id, b.s, b.c,
          list_reduce(list_transform(generate_series(1,8),
            j -> (v.nv[b.s*8 + j] - b.cent[j]) * (v.nv[b.s*8 + j] - b.cent[j])),
            (a,x) -> a + x) AS d
        FROM normed v CROSS JOIN books b),
      codes AS (
        SELECT vec_id, s, c AS code FROM (
          SELECT vec_id, s, c,
            row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC) AS rn
          FROM vsub) WHERE rn = 1),
      adist AS (
        SELECT ca.query_id, ca.nn_id,
          list_reduce(list(qd.d ORDER BY qd.s), (a,b) -> a+b) AS ad
        FROM cand ca
        JOIN codes cv ON cv.vec_id = ca.nn_id
        JOIN vsub qd ON qd.vec_id = ca.query_id AND qd.s = cv.s AND qd.c = cv.code
        GROUP BY ca.query_id, ca.nn_id),
      short AS (
        SELECT query_id, nn_id FROM (
          SELECT query_id, nn_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY ad ASC, nn_id ASC) AS arank
          FROM adist) WHERE arank <= 60),
      rer AS (
        SELECT s.query_id, s.nn_id,
          round(CASE WHEN list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]) = 0 OR list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) END, 3) AS sim
        FROM short s
        JOIN embeddings c ON c.vec_id = s.nn_id
        JOIN embeddings q ON q.vec_id = s.query_id),
      ranked AS (
        SELECT query_id, nn_id, sim,
          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nn_id) AS rank
        FROM rer)
      SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 10"""))

  /** Multi-table SRP LSH top-k. Approximate vs brute force, but fully
    * deterministic: hyperplane signs are md5-parity of "table:plane:dim",
    * so the oracle rebuilds the same planes, signatures, hamming-1
    * probes and rerank in SQL. `list_reduce` folds the dot product in
    * index order — the same IEEE accumulation sequence as [[graft.functions.SrpSignature]].
    */
  val qAnnLsh = Q("ann_lsh",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(
        e.select(col("vec_id").as("id"), col("embedding")),
        e.filter(col("vec_id") < 5).select(col("vec_id").as("id"), col("embedding")),
        k = 10, dim = 64, nBits = 6, nTables = 8)
    },
    Some("""WITH signs AS (
        SELECT t.t, i.i, j.j,
          CASE WHEN ('0x'||substr(md5(t.t||':'||i.i||':'||j.j),1,2))::INT % 2 = 0
               THEN 1.0 ELSE -1.0 END AS s
        FROM (SELECT unnest(generate_series(0,7)) AS t) t
        CROSS JOIN (SELECT unnest(generate_series(0,5)) AS i) i
        CROSS JOIN (SELECT unnest(generate_series(0,63)) AS j) j),
      planes AS (
        SELECT t, i, list(s ORDER BY j) AS sv FROM signs GROUP BY t, i),
      dots AS (
        SELECT e.vec_id, p.t, p.i,
          list_reduce(list_transform(generate_series(1,64),
            j -> e.embedding[j]::DOUBLE * p.sv[j]), (a,b) -> a+b) AS dot
        FROM embeddings e CROSS JOIN planes p),
      sigs AS (
        SELECT vec_id, t,
          CAST(coalesce(sum(CASE WHEN dot > 0 THEN (1::BIGINT << i) END), 0) AS BIGINT) AS sig
        FROM dots GROUP BY vec_id, t),
      qprobe AS (
        SELECT vec_id AS qid, t, sig AS key FROM sigs WHERE vec_id < 5
        UNION
        SELECT vec_id, t, xor(sig, (1::BIGINT << b.b))
        FROM sigs CROSS JOIN (SELECT unnest(generate_series(0,5)) AS b) b
        WHERE vec_id < 5),
      cand AS (
        SELECT DISTINCT p.qid AS query_id, cs.vec_id AS nn_id
        FROM qprobe p JOIN sigs cs ON cs.t = p.t AND cs.sig = p.key
        WHERE cs.vec_id <> p.qid),
      scored AS (
        SELECT c.query_id, c.nn_id,
          round(CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) END, 3) AS sim
        FROM cand c
        JOIN embeddings e ON e.vec_id = c.nn_id
        JOIN embeddings q ON q.vec_id = c.query_id),
      ranked AS (
        SELECT query_id, nn_id, sim,
          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nn_id) AS rank
        FROM scored)
      SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 10"""))

  // ---------------------------------------------------------------------
  // Extension: temporal relational operators (as-of join, range join,
  // SCD2 history reconstruction) — see graft.operators.Temporal.
  // ---------------------------------------------------------------------

  /** As-of join: each purchase event gets the user's most recent view
    * event at-or-before it. Spark side is the single-shuffle
    * union+carry-forward plan; oracle is DuckDB's native ASOF JOIN over
    * the same tie-compacted right side.
    */
  val qAsofJoin = Q("q_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val views = Compaction.latestPerKey(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), col("value")),
        Seq("user_id", "ts"), Seq("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.Temporal.asOf(purchases, views, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          carry = Seq("event_id", "value"), prefix = "view_")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("view_event_id"), col("view_value"))
    },
    Some("""WITH views AS (
        SELECT user_id, ts, event_id, value FROM (
          SELECT user_id, ts, event_id, value,
                 row_number() OVER (PARTITION BY user_id, ts
                   ORDER BY event_id DESC) AS rn
          FROM events WHERE event_type = 'view') WHERE rn = 1),
      p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
             v.event_id AS view_event_id, v.value AS view_value
      FROM p ASOF JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts"""))

  /** Range (interval) join: events within one hour after each signup. */
  val qRangeJoin = Q("q_range_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val sgn = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
          col("ts").as("s_ts"))
      val e = ev.select(col("event_id").as("e_id"),
        col("user_id").as("e_user"), col("ts").as("e_ts"))
      sgn.join(e, col("e_user") === col("s_user") &&
          col("e_ts") > col("s_ts") &&
          col("e_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy(col("s_id"), col("s_user"))
        .agg(count(col("e_id")).as("n_follow"))
        .select(col("s_id").as("event_id"), col("s_user").as("user_id"),
          col("n_follow"))
    },
    Some("""SELECT s.event_id, s.user_id, count(e.event_id) AS n_follow
      FROM (SELECT * FROM events WHERE event_type='signup') s
      LEFT JOIN events e ON e.user_id = s.user_id AND e.ts > s.ts
        AND e.ts <= s.ts + INTERVAL 1 HOUR
      GROUP BY s.event_id, s.user_id"""))

  /** SCD2 reconstruction: the event stream becomes validity intervals. */
  val qScd2 = Q("q_scd2",
    (s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Temporal.scd2(ev, Seq("user_id"),
          timeMs = unix_millis(col("ts")), tiebreak = col("event_id"))
        .select(col("user_id"), col("event_id"),
          col("event_type").as("state"),
          col("valid_from_ms"), col("valid_to_ms"), col("is_current"))
    },
    Some("""SELECT user_id, event_id, event_type AS state,
        epoch_ms(ts) AS valid_from_ms,
        coalesce(lead(epoch_ms(ts)) OVER w, 253402300799999) AS valid_to_ms,
        CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)"""))

  /** Exact group percentiles. Two cross-engine IEEE traps, both fixed
    * here by construction:
    *  - interpolation formula: DuckDB's `quantile_cont` computes
    *    `lo + (hi-lo)·d`, Spark's `percentile` computes
    *    `(ceil(h)-h)·lo + (h-floor(h))·hi` — an ulp apart; the oracle
    *    replays SPARK'S formula over the sorted list;
    *  - rounding: Spark's `round` works on the shortest decimal repr,
    *    DuckDB's multiplies by 10^s in doubles — they disagree when
    *    x·100 lands exactly on .5. Both sides therefore round as
    *    `floor(x·100 + 0.5)/100`, which is pure double arithmetic and
    *    bit-identical everywhere.
    */
  private def r2(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5) / 100

  val qPercentiles = Q("q_percentiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        r2(expr("percentile(l_extendedprice, 0.25)")).as("p25"),
        r2(expr("percentile(l_extendedprice, 0.5)")).as("p50"),
        r2(expr("percentile(l_extendedprice, 0.75)")).as("p75"),
        r2(expr("percentile(l_extendedprice, 0.95)")).as("p95")),
    Some("""WITH s AS (
        SELECT l_returnflag,
          list(l_extendedprice ORDER BY l_extendedprice) AS xs,
          count(*) AS n
        FROM lineitem GROUP BY 1),
      m AS (
        -- p must be DOUBLE: a bare 0.5 literal is DECIMAL in DuckDB and
        -- the whole interpolation would run in exact decimal, not IEEE
        SELECT l_returnflag, p.p, xs, n,
          p.p::DOUBLE * (n - 1) AS h,
          CAST(floor(p.p::DOUBLE * (n - 1)) AS BIGINT) AS lo,
          ceil(p.p::DOUBLE * (n - 1)) AS hi
        FROM s CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p) p),
      v AS (
        SELECT l_returnflag, p,
          CASE WHEN hi = lo THEN xs[lo + 1]
               ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
          END AS q
        FROM m)
      SELECT l_returnflag,
        floor(max(CASE WHEN p = 0.25 THEN q END) * 100 + 0.5) / 100 AS p25,
        floor(max(CASE WHEN p = 0.5  THEN q END) * 100 + 0.5) / 100 AS p50,
        floor(max(CASE WHEN p = 0.75 THEN q END) * 100 + 0.5) / 100 AS p75,
        floor(max(CASE WHEN p = 0.95 THEN q END) * 100 + 0.5) / 100 AS p95
      FROM v GROUP BY l_returnflag"""))

  /** Deterministic hash sample (portable md5, no seed/partitioning
    * dependence) — the reproducible-subset primitive every training-data
    * pipeline needs. Aggregated so the oracle certifies the exact sample.
    */
  val qSample = Q("q_sample",
    (s, dir) => Corpus.hashSample(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), pct = 5)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price")),
    Some("""SELECT l_returnflag, count(*) AS n,
        round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE ('0x'||substr(md5(l_orderkey||':'||l_linenumber),1,15))::BIGINT % 100 < 5
      GROUP BY l_returnflag"""))

  /** The same sample via the xxhash64 production fast path (no md5 per
    * row). DuckDB has no xxhash64, so the sample MEMBERSHIP has no
    * portable oracle — instead the query is PROPERTY-CHECKED: the
    * realized sample rate must sit inside a 6σ binomial interval around
    * the requested 5% (σ = √(p(1−p)/n); xxhash64 is deterministic, so
    * the boolean can't flap). A hash-quality or thresholding regression
    * flips the hash; determinism and exact-rate behavior stay
    * spec-asserted, and the portable-mode twin above certifies the
    * shared plumbing. */
  val qSampleFast = Q("q_sample_fast",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val total = li.agg(count(lit(1)).as("n_total"))
      val samp = Corpus.hashSample(li,
          Seq("l_orderkey", "l_linenumber"), pct = 5, portable = false)
        .agg(count(lit(1)).as("n_samp"))
      total.crossJoin(broadcast(samp))
        .select(col("n_total"),
          (abs(col("n_samp").cast("double") / col("n_total") - lit(0.05))
            <= lit(6.0) * sqrt(lit(0.05 * 0.95) / col("n_total")))
            .as("rate_in_bounds"))
    },
    Some("SELECT count(*) AS n_total, TRUE AS rate_in_bounds FROM lineitem"))

  // ---------------------------------------------------------------------
  // Extension: corpus-level text operators (TF-IDF, vocabulary, PII
  // scrub) — see graft.ext.Corpus.
  // ---------------------------------------------------------------------

  val qTfidf = Q("q_tfidf",
    (s, dir) => Corpus.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", k = 5)
      .select(col("id").as("doc_id"), col("rank"), col("token"), col("score")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * ln(n.n::DOUBLE / dfq.df), 4) AS score
        FROM tf JOIN dfq USING (token) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, token, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, token) AS rank
        FROM scored)
      SELECT doc_id, rank, token, score FROM ranked WHERE rank <= 5"""))

  /** Okapi BM25 top-k retrieval for a bag-of-words query — per-(doc,
    * term) contributions fixed-pointed to integer x10k before the
    * per-doc sum, ranked on the total order (score desc, doc asc).
    */
  val qBm25 = Q("q_bm25",
    (s, dir) => Corpus.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("hash", "join", "merge", "vector"), k = 20)
      .select(col("id").as("doc_id"), col("score_x10k"), col("n_terms")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      -- guard: string_split('') yields [''] where Spark's \S+ extract
      -- yields []; without it an empty doc shifts avgdl corpus-wide
      tokg AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tokg GROUP BY 1),
      stats AS (SELECT (SELECT count(*) FROM tokg)::DOUBLE
                         / (SELECT count(*) FROM documents) AS avgdl,
                       (SELECT count(*) FROM documents) AS n_docs),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
             WHERE token IN ('hash', 'join', 'merge', 'vector')
             GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
          CAST(floor(
            ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
            * (tf.tf * (1.2 + 1.0))
            / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
            * 10000 + 0.5) AS BIGINT) AS contrib_x10k
        FROM tf JOIN dfq d USING (token) JOIN dl l USING (doc_id)
        CROSS JOIN stats s)
      SELECT doc_id, CAST(sum(contrib_x10k) AS BIGINT) AS score_x10k,
             count(*) AS n_terms
      FROM scored GROUP BY 1
      ORDER BY score_x10k DESC, doc_id LIMIT 20"""))

  /** Hybrid retrieval: BM25 lexical top-50 fused with cosine vector
    * top-50 (query = embedding 0) by reciprocal-rank fusion — the
    * standard lexical+dense combiner, integer-exact so the fused list
    * is hash-certified end to end. Docs found by BOTH modalities rise
    * (n_lists = 2); rank-only fusion needs no score calibration.
    */
  val qHybridRetrieval = Q("q_hybrid_retrieval",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lexical = Corpus.bm25TopK(docs, "doc_id", "text",
          terms = Seq("hash", "join", "merge", "vector"), k = 50)
        .withColumn("rank", row_number().over( // 50 rows post-TakeOrdered
          Window.orderBy(col("score_x10k").desc, col("id").asc)))
        .select(col("id"), col("rank"))
      val vector = Similarity.bruteForceTopK(
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.filter(col("vec_id") === 0)
            .select(col("vec_id").as("id"), col("embedding")), k = 50)
        .select(col("nn_id").as("id"), col("rank"))
      Corpus.rrfFuse(Seq(lexical, vector), topK = 20)
        .select(col("id").as("doc_id"), col("rrf_score"), col("n_lists"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      tokg AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tokg GROUP BY 1),
      stats AS (SELECT (SELECT count(*) FROM tokg)::DOUBLE
                         / (SELECT count(*) FROM documents) AS avgdl,
                       (SELECT count(*) FROM documents) AS n_docs),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
             WHERE token IN ('hash', 'join', 'merge', 'vector')
             GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      bscored AS (
        SELECT tf.doc_id,
          CAST(floor(
            ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
            * (tf.tf * (1.2 + 1.0))
            / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
            * 10000 + 0.5) AS BIGINT) AS contrib_x10k
        FROM tf JOIN dfq d USING (token) JOIN dl l USING (doc_id)
        CROSS JOIN stats s),
      bagg AS (
        SELECT doc_id, sum(contrib_x10k) AS score_x10k FROM bscored
        GROUP BY 1 ORDER BY score_x10k DESC, doc_id LIMIT 50),
      lex AS (
        SELECT doc_id AS id,
          row_number() OVER (ORDER BY score_x10k DESC, doc_id) AS rank
        FROM bagg),
      vq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      vscored AS (
        SELECT vec_id AS id,
          round(CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0 OR list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) END, 3) AS sim
        FROM embeddings CROSS JOIN vq WHERE vec_id <> 0),
      vec AS (
        SELECT id, rank FROM (
          SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS rank
          FROM vscored) WHERE rank <= 50),
      pts AS (
        SELECT id, 1000000000 // (60 + rank) AS pts FROM lex
        UNION ALL
        SELECT id, 1000000000 // (60 + rank) AS pts FROM vec)
      SELECT id AS doc_id, CAST(sum(pts) AS BIGINT) AS rrf_score,
             count(*) AS n_lists
      FROM pts GROUP BY id
      ORDER BY rrf_score DESC, id LIMIT 20"""))

  val qVocab = Q("q_vocab",
    (s, dir) => Corpus.vocabulary(t(s, dir, "documents"), "text", topN = 100),
    Some("""WITH tok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
      SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank, token, cnt
      FROM counts ORDER BY rank LIMIT 100"""))

  /** Unrolled-SQL replay of [[graft.ext.Bpe.learn]]: vocab build + one
    * (pair-count → argmax → merge) CTE block per round. The wrapped-
    * symbol string representation (each symbol in U+001F) makes the
    * merge a literal `replace`, identical in both engines — which is
    * what lets even BPE LEARNING be hash-certified.
    */
  private def bpeLearnCtes(nMerges: Int): String = {
    // MATERIALIZED: each v_r is read twice (pair counts + next round)
    // and the chain is nMerges deep — inlining would re-evaluate the
    // whole prefix per reference (exponential); materialized it's one
    // pass per round, exactly like the Spark loop's per-round cache
    val base = """WITH v0 AS MATERIALIZED (
        SELECT regexp_replace(w, '(.)', chr(31)||'\1'||chr(31), 'g') AS s, cnt
        FROM (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(regexp_extract_all(
              trim(regexp_replace(lower(replace(text, chr(31), '')),'\s+',' ','g')),
              '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS w
            FROM documents)
          GROUP BY w ORDER BY cnt DESC, w ASC LIMIT 65536))"""
    val rounds = (0 until nMerges).map { r =>
      s"""
      p$r AS (
        SELECT sy[ix.i] AS l, sy[ix.i+1] AS r, sum(cnt) AS c
        FROM (SELECT cnt,
                string_split(trim(s, chr(31)), chr(31)||chr(31)) AS sy
              FROM v$r),
             LATERAL (SELECT unnest(generate_series(1, len(sy)-1)) AS i) ix
        GROUP BY 1, 2),
      b$r AS MATERIALIZED (
        SELECT l, r FROM p$r ORDER BY c DESC, l ASC, r ASC LIMIT 1),
      v${r + 1} AS MATERIALIZED (
        SELECT replace(s,
          (SELECT chr(31)||l||chr(31)||chr(31)||r||chr(31) FROM b$r),
          (SELECT chr(31)||l||r||chr(31) FROM b$r)) AS s, cnt
        FROM v$r)"""
    }.mkString(",", ",", "")
    base + rounds
  }

  /** BPE merge-table learning (8 rounds over the documents corpus) —
    * the table itself is the query output, hash-matched rank by rank.
    */
  val qBpeLearn = Q("q_bpe_learn",
    (s, dir) => {
      val merges = graft.ext.Bpe.learn(t(s, dir, "documents"), "text",
        nMerges = 8)
      import s.implicits._
      merges.zipWithIndex.map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "lhs", "rhs")
    },
    Some(bpeLearnCtes(8) + "\n" +
      (0 until 8).map(r =>
        s"SELECT ${r + 1} AS rank, l AS lhs, r AS rhs FROM b$r")
        .mkString("\nUNION ALL\n")))

  /** The encode half of the BPE oracle, shared by `q_bpe_encode` and
    * the `q_corpus_prep_v2` composite: merge-pattern scalars from the
    * learned `b0..b7` + per-word replace chain + per-doc token list.
    * Appended after [[bpeLearnCtes]]; exposes `agg(doc_id, all_toks)`.
    */
  private val bpeEncodeCtes: String = s"""
      m AS (SELECT ${(0 until 8).map(r =>
        s"(SELECT chr(31)||l||chr(31)||chr(31)||r||chr(31) FROM b$r) AS pat$r, " +
        s"(SELECT chr(31)||l||r||chr(31) FROM b$r) AS rep$r").mkString(", ")}),
      dw AS (
        SELECT doc_id, ix.i, ws[ix.i] AS w
        FROM (
          SELECT doc_id, regexp_extract_all(
            trim(regexp_replace(lower(replace(text, chr(31), '')),'\\s+',' ','g')),
            '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ws
          FROM documents),
          LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) ix),
      et AS (
        SELECT doc_id, i, string_split(trim(${(0 until 8).foldLeft(
          "regexp_replace(w, '(.)', chr(31)||'\\1'||chr(31), 'g')")(
          (acc, r) => s"replace($acc, m.pat$r, m.rep$r)")},
          chr(31)), chr(31)||chr(31)) AS toks
        FROM dw, m),
      agg AS (
        SELECT doc_id, flatten(list(toks ORDER BY i)) AS all_toks
        FROM et GROUP BY doc_id)"""

  /** Learn-then-encode: every document re-tokenized with the learned
    * table; per-doc subword count + an md5 over the full token stream,
    * so the oracle pins every emitted symbol of every document.
    */
  val qBpeEncode = Q("q_bpe_encode",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      docs.select(col("doc_id"),
          graft.ext.Bpe.encode(col("text"), merges).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_bpe_tokens"),
          md5(concat_ws(" ", col("toks"))).as("tok_fp"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """
      SELECT d.doc_id,
        CAST(coalesce(len(a.all_toks), 0) AS BIGINT) AS n_bpe_tokens,
        md5(coalesce(array_to_string(a.all_toks, ' '), '')) AS tok_fp
      FROM documents d LEFT JOIN agg a USING (doc_id)"""))

  /** Fraction-based decontamination: the published-eval policy form —
    * per doc, bp of its distinct word bigrams that appear anywhere in
    * the benchmark slice, with the ≥ 2500 bp drop verdict. Portable
    * md5-prefix shingle hashes keep even collisions engine-identical.
    */
  val qDecontamFraction = Q("q_decontam_fraction",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.decontaminateFraction(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 2, dropAtBp = 2500)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_shared"),
          col("overlap_bp"), col("drop"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-1, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+1], ' ')))
          AS sset
        FROM documents),
      ex0 AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      ex AS (SELECT doc_id,
               ('0x'||substr(md5(shingle),1,15))::BIGINT AS h
             FROM ex0),
      bench AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0),
      scored AS (
        SELECT doc_id, count(*) AS n_shingles,
          count(CASE WHEN h IN (SELECT h FROM bench) THEN 1 END) AS n_shared
        FROM ex WHERE doc_id % 97 <> 0 GROUP BY doc_id)
      SELECT d.doc_id,
        coalesce(s.n_shingles, 0) AS n_shingles,
        coalesce(s.n_shared, 0) AS n_shared,
        CASE WHEN coalesce(s.n_shingles, 0) > 0
          THEN (s.n_shared * 10000) // s.n_shingles ELSE 0 END AS overlap_bp,
        (CASE WHEN coalesce(s.n_shingles, 0) > 0
          THEN (s.n_shared * 10000) // s.n_shingles ELSE 0 END) >= 2500 AS "drop"
      FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
      LEFT JOIN scored s USING (doc_id)"""))

  /** Temperature resampling at alpha = 0.5 (the standard multilingual
    * rebalance): per-source keep rate = sqrt(share ratio) in exact ppm
    * via the integer-sqrt form, admission by portable-hash threshold —
    * the whole mixture reweight hash-certified.
    */
  val qTemperatureSample = Q("q_temperature_sample",
    (s, dir) => Corpus.temperatureSample(t(s, dir, "documents"),
        "source", Seq("doc_id"), alpha = 0.5)
      .select(col("doc_id"), col("source"), col("keep_rate_ppm")),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      m AS (SELECT max(n) AS nmax FROM c),
      r AS (SELECT source,
        CAST(floor(sqrt(
          (((n::HUGEINT) * 1000000 * 1000000) // (SELECT nmax FROM m))::DOUBLE))
          AS BIGINT) AS keep_rate_ppm
        FROM c)
      SELECT d.doc_id, d.source, r.keep_rate_ppm
      FROM documents d JOIN r USING (source)
      WHERE ('0x'||substr(md5(d.doc_id::VARCHAR),1,15))::BIGINT % 1000000
            < r.keep_rate_ppm"""))

  /** Temperature resampling at alpha = 0.25 — the exact-oracle family
    * extended to rational alphas (r9): rate = floor((c/cmax)^(1/4)·ppm)
    * via the DOUBLE integer-sqrt, floor(x^(1/4)) = isqrt(isqrt(⌊x⌋)).
    * The radicand c·ppm⁴/cmax is ≤ ppm⁴ (c ≤ cmax), so the oracle's
    * inner sqrt needs only a ±1 integer correction after the double
    * conversion (abs error on sqrt ≤ ~2·10⁻⁴ at 10¹² scale), and the
    * outer radicand is ≤ ppm² < 2^52 — correctly-rounded IEEE, exact.
    */
  val qTemperatureSampleA25 = Q("q_temperature_sample_a25",
    (s, dir) => Corpus.temperatureSample(t(s, dir, "documents"),
        "source", Seq("doc_id"), alpha = 0.25)
      .select(col("doc_id"), col("source"), col("keep_rate_ppm")),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      m AS (SELECT max(n) AS nmax FROM c),
      rad AS (SELECT source,
          ((n::HUGEINT) * 1000000::HUGEINT * 1000000 * 1000000 * 1000000)
            // (SELECT nmax FROM m) AS radi
        FROM c),
      cand AS (SELECT source, radi,
          CAST(floor(sqrt(radi::DOUBLE)) AS HUGEINT) AS c0 FROM rad),
      i1 AS (SELECT source,
          CASE WHEN (c0+1)*(c0+1) <= radi THEN c0+1
               WHEN c0*c0 <= radi THEN c0 ELSE c0-1 END AS s1
        FROM cand),
      r AS (SELECT source,
          CAST(floor(sqrt(s1::DOUBLE)) AS BIGINT) AS keep_rate_ppm
        FROM i1)
      SELECT d.doc_id, d.source, r.keep_rate_ppm
      FROM documents d JOIN r USING (source)
      WHERE ('0x'||substr(md5(d.doc_id::VARCHAR),1,15))::BIGINT % 1000000
            < r.keep_rate_ppm"""))

  /** Temperature resampling at alpha = 0.75 — same double-isqrt family
    * on the cubed-share radicand c³·ppm⁴/cmax³ (≤ ppm⁴). The 128-bit
    * oracle replay needs the intermediate c³·ppm⁴ < 2^127 (per-stratum
    * counts ≲ 5·10⁴ at ppm = 10⁶ — holds through sf0.1); the operator
    * itself computes in BigInt and has no such bound.
    */
  val qTemperatureSampleA75 = Q("q_temperature_sample_a75",
    (s, dir) => Corpus.temperatureSample(t(s, dir, "documents"),
        "source", Seq("doc_id"), alpha = 0.75)
      .select(col("doc_id"), col("source"), col("keep_rate_ppm")),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      m AS (SELECT max(n) AS nmax FROM c),
      rad AS (SELECT source,
          ((n::HUGEINT) * n * n * 1000000::HUGEINT * 1000000 * 1000000 * 1000000)
            // ((SELECT nmax FROM m)::HUGEINT
               * (SELECT nmax FROM m) * (SELECT nmax FROM m)) AS radi
        FROM c),
      cand AS (SELECT source, radi,
          CAST(floor(sqrt(radi::DOUBLE)) AS HUGEINT) AS c0 FROM rad),
      i1 AS (SELECT source,
          CASE WHEN (c0+1)*(c0+1) <= radi THEN c0+1
               WHEN c0*c0 <= radi THEN c0 ELSE c0-1 END AS s1
        FROM cand),
      r AS (SELECT source,
          CAST(floor(sqrt(s1::DOUBLE)) AS BIGINT) AS keep_rate_ppm
        FROM i1)
      SELECT d.doc_id, d.source, r.keep_rate_ppm
      FROM documents d JOIN r USING (source)
      WHERE ('0x'||substr(md5(d.doc_id::VARCHAR),1,15))::BIGINT % 1000000
            < r.keep_rate_ppm"""))

  /** Mixture sampling: per-source keep rates (the data-mixing step) —
    * up-weight two sources, down-weight two, default the rest.
    */
  val qMixtureSample = Q("q_mixture_sample",
    (s, dir) => Corpus.mixtureSample(t(s, dir, "documents"), "source",
        Seq("doc_id"),
        pctByStratum = Map("src0" -> 80, "src1" -> 80,
          "src2" -> 30, "src3" -> 30),
        defaultPct = 10)
      .select(col("doc_id"), col("source")),
    Some("""SELECT doc_id, source FROM documents
      WHERE ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100 <
        CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 80
                    WHEN 'src2' THEN 30 WHEN 'src3' THEN 30 ELSE 10 END"""))

  /** Weighted sampling without replacement (A-ES exponential keys over
    * the portable hash): longer documents proportionally likelier, the
    * exact sample certified by the oracle replaying the key formula.
    */
  val qWeightedSample = Q("q_weighted_sample",
    (s, dir) => Corpus.weightedSample(t(s, dir, "documents"),
        Seq("doc_id"), col("n_chars"), k = 50)
      .select(col("doc_id"), col("source"), col("n_chars"), col("sample_key")),
    Some("""SELECT doc_id, source, n_chars,
        CAST(floor(-ln((('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT + 1.0)
          / 1152921504606846976.0)
          * (SELECT sum(n_chars)::DOUBLE / count(*) FROM documents WHERE n_chars > 0)
          / n_chars * 1000000.0) AS BIGINT) AS sample_key
      FROM documents WHERE n_chars > 0
      ORDER BY sample_key, doc_id LIMIT 50"""))

  /** Unigram-LM surprisal scoring (the perplexity-filter shape). Fixed-
    * point integer surprisal per token before any unordered aggregate,
    * so the oracle hash-matches exactly.
    */
  val qLmSurprisal = Q("q_lm_surprisal",
    (s, dir) => Corpus.unigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tok"),
        col("surprisal_x10k"), col("mean_surprisal_x10k")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM tok),
      scored AS (
        SELECT t.doc_id,
          CAST(floor(-ln(f.cnt::DOUBLE / o.n_total) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM tok t JOIN freq f USING (token) CROSS JOIN tot o)
      SELECT doc_id, count(*) AS n_tok,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** Bigram-LM surprisal: conditional −ln p(t2|t1) under the corpus's
    * own bigram counts — context totals derived from the bigram counts,
    * fixed-point before the per-doc sum, <2-token docs drop out.
    */
  val qLmBigram = Q("q_lm_bigram",
    (s, dir) => Corpus.bigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bigrams"),
        col("surprisal_x10k"), col("mean_surprisal_x10k")),
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      bg AS (
        SELECT doc_id, toks[g.i] AS t1, toks[g.i + 1] AS t2
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      c2 AS (SELECT t1, t2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT t1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      scored AS (
        SELECT bg.doc_id,
          CAST(floor(-ln(c2.c2::DOUBLE / c1.c1) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM bg JOIN c2 USING (t1, t2) JOIN c1 USING (t1))
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** Stupid Backoff trigram LM surprisal (Brants et al. 2007): the
    * trigram→bigram→unigram ladder with fixed α = 0.4, count cutoff 2
    * (without a cutoff, a self-trained corpus never backs off — every
    * observed trigram has c ≥ 1). No normalization means no per-context
    * discount pass, which is exactly what keeps the score one unordered
    * aggregation and fixed-point oracle-able; backoff-level tallies make
    * a regression visible at the level it happened.
    */
  val qLmBackoff = Q("q_lm_backoff",
    (s, dir) => Corpus.backoffSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_trigrams"), col("n_tri_hits"),
        col("n_bi_backoff"), col("n_uni_backoff"),
        col("surprisal_x10k"), col("mean_surprisal_x10k")),
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      uni AS (SELECT t, count(*) AS cu FROM (
          SELECT unnest(toks) AS t FROM d WHERE NOT toks = ['']) GROUP BY 1),
      tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM uni),
      bi AS (SELECT a, b, count(*) AS cb FROM (
          SELECT toks[g.i] AS a, toks[g.i + 1] AS b
          FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
          WHERE NOT toks = ['']) GROUP BY 1, 2),
      tg AS (
        SELECT doc_id, toks[g.i] AS t1, toks[g.i + 1] AS t2,
               toks[g.i + 2] AS t3
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 2)) AS i) g
        WHERE NOT toks = ['']),
      tri AS (SELECT t1, t2, t3, count(*) AS ct FROM tg GROUP BY 1, 2, 3),
      scored AS (
        SELECT tg.doc_id,
          CASE WHEN tri.ct >= 2 THEN 3 WHEN b2.cb >= 2 THEN 2
               ELSE 1 END AS lvl,
          CAST(floor(-ln(
            CASE WHEN tri.ct >= 2 THEN tri.ct::DOUBLE / b1.cb
                 WHEN b2.cb >= 2 THEN 0.4 * b2.cb / u2.cu
                 ELSE 0.16 * u3.cu / o.n_total END) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM tg
        JOIN tri USING (t1, t2, t3)
        JOIN bi b1 ON b1.a = tg.t1 AND b1.b = tg.t2
        JOIN bi b2 ON b2.a = tg.t2 AND b2.b = tg.t3
        JOIN uni u2 ON u2.t = tg.t2
        JOIN uni u3 ON u3.t = tg.t3
        CROSS JOIN tot o)
      SELECT doc_id, count(*) AS n_trigrams,
        CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
        CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_backoff,
        CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_backoff,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** fastText-style quality-classifier scoring: hashed unigram+bigram
    * features, fixed integer weight table (here hash-derived so the
    * oracle replays generation → lookup → sum end-to-end), exact
    * integer logits. The keep verdict thresholds the MEAN weight at 0
    * by integer cross-multiply — no float anywhere.
    */
  val qQualityScore = Q("q_quality_score",
    (s, dir) => {
      val w = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      Corpus.qualityScore(t(s, dir, "documents"), "doc_id", "text", w,
          nBuckets = 1024, thrMilli = 0L)
        .select(col("id").as("doc_id"), col("n_features"),
          col("logit"), col("keep"))
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      w AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      feats AS (
        SELECT doc_id, unnest(toks) AS f FROM d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM feats),
      scored AS (
        SELECT fb.doc_id, count(*) AS n_features,
          CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS logit
        FROM fb LEFT JOIN w USING (bucket) GROUP BY fb.doc_id)
      SELECT doc_id, n_features, logit,
        logit * 1000 >= 0 * n_features AS keep
      FROM scored"""))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank each
    * source's documents by self-trained LM surprisal and cut into
    * head/middle/tail terciles — the standard "keep head+middle, drop
    * tail" web-curation admission. Composes [[Corpus.unigramSurprisal]]
    * with a fully-deterministic tercile (ties broken by doc_id), so the
    * bucket boundaries, per-bucket counts, and surprisal ranges all
    * hash-match the SQL replay — which still uses a literal `ntile`.
    *
    * The Spark side deliberately does NOT use `ntile.over(partitionBy
    * (source))`: that plan is a full single-partition sort per stratum
    * (`ntile` gets no `WindowGroupLimit` prune), i.e. one task chewing a
    * whole source at 100 TB. [[graft.ext.Prefix.stratifiedNtile]]
    * reproduces ntile's exact remainder distribution from a distributed
    * rank + a broadcast per-source (first_rank, count) table.
    */
  val qPerplexityBuckets = Q("q_perplexity_buckets",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = Corpus.unigramSurprisal(docs, "doc_id", "text")
        .select(col("id").as("doc_id"), col("mean_surprisal_x10k"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      graft.ext.Prefix.stratifiedNtile(scored, Seq(col("source")),
          Seq(col("mean_surprisal_x10k"), col("doc_id")), 3, "bucket")
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("mean_surprisal_x10k")).as("min_mean_x10k"),
          max(col("mean_surprisal_x10k")).as("max_mean_x10k"))
        .withColumn("keep", col("bucket") <= 2)
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM tok),
      scored AS (
        SELECT t.doc_id,
          CAST(floor(-ln(f.cnt::DOUBLE / o.n_total) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM tok t JOIN freq f USING (token) CROSS JOIN tot o),
      perdoc AS (
        SELECT doc_id, CAST(sum(nat10k) AS BIGINT) // count(*) AS m
        FROM scored GROUP BY doc_id),
      ranked AS (
        SELECT d.source, p.m,
          ntile(3) OVER (PARTITION BY d.source
            ORDER BY p.m, p.doc_id) AS bucket
        FROM perdoc p JOIN documents d USING (doc_id))
      SELECT source, bucket, count(*) AS n_docs,
        min(m) AS min_mean_x10k, max(m) AS max_mean_x10k,
        bucket <= 2 AS keep
      FROM ranked GROUP BY source, bucket"""))

  /** Gopher rule battery (Rae et al. 2021): the canonical heuristic
    * quality gate — word-count and mean-word-length windows,
    * symbol-to-word and alphabetic-word ratios, ≥2 distinct stopwords —
    * every rule an integer/boolean over normalized text, the whole
    * battery and verdict hash-matched.
    */
  val qGopherRules = Q("q_gopher_rules",
    (s, dir) => Corpus.gopherRules(t(s, dir, "documents"), "doc_id", "text",
        stopwords = graft.ext.TextOps.Stopwords)
      .select(col("id").as("doc_id"), col("n_words"), col("mean_len_x100"),
        col("symbol_bp"), col("alpha_bp"), col("n_stop_distinct"),
        col("r_wordcount"), col("r_meanlen"), col("r_symbol"),
        col("r_alpha"), col("r_stopwords"), col("keep")),
    Some("""WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      b AS (
        SELECT doc_id, t, string_split(t, ' ') AS toks,
          CASE WHEN t = '' THEN 0
               ELSE len(string_split(t, ' ')) END AS n
        FROM d),
      m AS (
        SELECT doc_id, CAST(n AS BIGINT) AS n_words,
          CASE WHEN n > 0
            THEN ((length(t) - (n - 1)) * 100) // n ELSE 0 END AS mean_len_x100,
          CASE WHEN n > 0 THEN
            (((length(t) - length(replace(t, '#', '')))
              + (length(t) - length(replace(t, '...', ''))) // 3) * 10000) // n
          ELSE 0 END AS symbol_bp,
          CASE WHEN n > 0 THEN
            (len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 10000) // n
          ELSE 0 END AS alpha_bp,
          CAST(len(list_intersect(list_distinct(toks),
            ['the','a','an','of','and','to','in','is','on','for','it',
             'with','as','at','by','be','this','that','from','or'])) AS BIGINT)
            AS n_stop_distinct
        FROM b)
      SELECT doc_id, n_words,
        CAST(mean_len_x100 AS BIGINT) AS mean_len_x100,
        CAST(symbol_bp AS BIGINT) AS symbol_bp,
        CAST(alpha_bp AS BIGINT) AS alpha_bp, n_stop_distinct,
        n_words BETWEEN 50 AND 100000 AS r_wordcount,
        mean_len_x100 BETWEEN 300 AND 1000 AS r_meanlen,
        symbol_bp <= 1000 AS r_symbol,
        alpha_bp >= 8000 AS r_alpha,
        n_stop_distinct >= 2 AS r_stopwords,
        (n_words BETWEEN 50 AND 100000) AND (mean_len_x100 BETWEEN 300 AND 1000)
          AND symbol_bp <= 1000 AND alpha_bp >= 8000
          AND n_stop_distinct >= 2 AS keep
      FROM m"""))

  /** Gopher repetition battery (Rae et al. 2021, table A1's other
    * half): duplicate line/paragraph fractions by occurrence and by
    * character mass, top-{2,3,4}-gram character coverage, duplicated-
    * {5..10}-gram character mass — all exact integer basis points (the
    * occurrence-mass forms documented at [[Corpus.repetitionSignals]]),
    * whole battery + verdict hash-matched. The oracle groups units by
    * their strings where Spark groups by xxhash64 — identical counts
    * barring a 64-bit collision inside one document.
    */
  val qGopherRepetition = Q("q_gopher_repetition",
    (s, dir) => Corpus.repetitionSignals(t(s, dir, "documents"),
        "doc_id", "text")
      .withColumnRenamed("id", "doc_id"),
    Some("WITH " + repetitionCtes("") + """
      SELECT * FROM bp"""))

  /** Repetition-battery oracle CTE chain, name-prefixed so composites
    * can embed it (the [[dsirCtesNamed]] convention). Exposes
    * `${px}bp(doc_id, n_lines, n_paras, total_chars, *_bp, keep)` —
    * [[Corpus.repetitionSignals]]'s exact output. Units are grouped by
    * their strings where Spark groups by xxhash64 — identical counts
    * barring a 64-bit collision inside one document.
    */
  private def repetitionCtes(px: String, top2Max: Int = 2000,
                             top3Max: Int = 1800,
                             top4Max: Int = 1600): String = s"""${px}base AS (
        SELECT doc_id, text AS raw,
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents),
      ${px}b AS MATERIALIZED (
        SELECT doc_id, raw, t, length(t) AS tc, string_split(t, ' ') AS ts
        FROM ${px}base WHERE t <> ''),
      ${px}lu0 AS (
        SELECT doc_id, unnest(string_split(raw, chr(10))) AS u0 FROM ${px}b),
      ${px}lu AS (
        SELECT doc_id, 0 AS k,
          trim(regexp_replace(lower(u0), '\\s+', ' ', 'g')) AS unit
        FROM ${px}lu0),
      ${px}pu0 AS (
        SELECT doc_id, unnest(string_split(raw, chr(10)||chr(10))) AS u0
        FROM ${px}b),
      ${px}pu AS (
        SELECT doc_id, 1 AS k,
          trim(regexp_replace(lower(u0), '\\s+', ' ', 'g')) AS unit
        FROM ${px}pu0),
      ${px}bn AS (
        SELECT doc_id, ts, unnest(generate_series(2, 10)) AS n FROM ${px}b),
      ${px}ng AS (
        SELECT doc_id, n AS k,
          array_to_string(ts[g.i:g.i + n - 1], ' ') AS unit
        FROM ${px}bn,
          LATERAL (SELECT unnest(generate_series(1, len(ts) - n + 1)) AS i) g),
      ${px}units AS (
        SELECT doc_id, k, unit FROM ${px}lu WHERE unit <> ''
        UNION ALL SELECT doc_id, k, unit FROM ${px}pu WHERE unit <> ''
        UNION ALL SELECT doc_id, k, unit FROM ${px}ng),
      ${px}counted AS (
        SELECT doc_id, k, unit, count(*) AS cnt, length(unit) AS chars
        FROM ${px}units GROUP BY 1, 2, 3, length(unit)),
      ${px}perdoc AS (
        SELECT doc_id,
          CAST(sum(CASE WHEN k = 0 THEN cnt ELSE 0 END) AS BIGINT) AS nl,
          CAST(sum(CASE WHEN k = 1 THEN cnt ELSE 0 END) AS BIGINT) AS np,
          CAST(sum(CASE WHEN k = 0 AND cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dl,
          CAST(sum(CASE WHEN k = 1 AND cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dp,
          CAST(sum(CASE WHEN k = 0 THEN cnt * chars ELSE 0 END) AS BIGINT) AS ml,
          CAST(sum(CASE WHEN k = 1 THEN cnt * chars ELSE 0 END) AS BIGINT) AS mp,
          CAST(sum(CASE WHEN k = 0 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS dml,
          CAST(sum(CASE WHEN k = 1 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS dmp,
          CAST(max(CASE WHEN k = 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS t2,
          CAST(max(CASE WHEN k = 3 THEN cnt * chars ELSE 0 END) AS BIGINT) AS t3,
          CAST(max(CASE WHEN k = 4 THEN cnt * chars ELSE 0 END) AS BIGINT) AS t4,
          CAST(sum(CASE WHEN k = 5 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d5,
          CAST(sum(CASE WHEN k = 6 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d6,
          CAST(sum(CASE WHEN k = 7 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d7,
          CAST(sum(CASE WHEN k = 8 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d8,
          CAST(sum(CASE WHEN k = 9 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d9,
          CAST(sum(CASE WHEN k = 10 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d10
        FROM ${px}counted GROUP BY 1),
      ${px}bp0 AS (
        SELECT p.doc_id, p.nl AS n_lines, p.np AS n_paras,
          CAST(b.tc AS BIGINT) AS total_chars,
          CASE WHEN p.nl > 0 THEN least(10000, (p.dl * 10000) // p.nl) ELSE 0 END AS dup_line_bp,
          CASE WHEN p.ml > 0 THEN least(10000, (p.dml * 10000) // p.ml) ELSE 0 END AS dup_line_char_bp,
          CASE WHEN p.np > 0 THEN least(10000, (p.dp * 10000) // p.np) ELSE 0 END AS dup_para_bp,
          CASE WHEN p.mp > 0 THEN least(10000, (p.dmp * 10000) // p.mp) ELSE 0 END AS dup_para_char_bp,
          least(10000, (p.t2 * 10000) // b.tc) AS top2_bp,
          least(10000, (p.t3 * 10000) // b.tc) AS top3_bp,
          least(10000, (p.t4 * 10000) // b.tc) AS top4_bp,
          least(10000, (p.d5 * 10000) // b.tc) AS dup5_bp,
          least(10000, (p.d6 * 10000) // b.tc) AS dup6_bp,
          least(10000, (p.d7 * 10000) // b.tc) AS dup7_bp,
          least(10000, (p.d8 * 10000) // b.tc) AS dup8_bp,
          least(10000, (p.d9 * 10000) // b.tc) AS dup9_bp,
          least(10000, (p.d10 * 10000) // b.tc) AS dup10_bp
        FROM ${px}perdoc p JOIN ${px}b b USING (doc_id)),
      ${px}bp AS (
        SELECT *,
          dup_line_bp <= 3000 AND dup_para_bp <= 3000
            AND dup_line_char_bp <= 2000 AND dup_para_char_bp <= 2000
            AND top2_bp <= $top2Max AND top3_bp <= $top3Max
            AND top4_bp <= $top4Max
            AND dup5_bp <= 1500 AND dup6_bp <= 1400 AND dup7_bp <= 1300
            AND dup8_bp <= 1200 AND dup9_bp <= 1100 AND dup10_bp <= 1000
            AS keep
        FROM ${px}bp0)"""

  /** Shared CTE block of the DSIR oracles: features → per-side counts →
    * smoothed fixed-point λ table → exact-integer doc scores, exposing
    * `scored(doc_id, n_features, dsir_x10k)`.
    */
  /** DSIR oracle CTE chain, name-prefixed (so composites can embed it
    * without colliding with their other CTE blocks) and parameterized
    * on the raw-side source (so a ladder can train λ on its own
    * survivor pool instead of the whole corpus). `px = ""` with the
    * default raw filter reproduces the standalone q_dsir_* oracles.
    */
  private def dsirCtesNamed(px: String, rawSrc: String): String = s"""${px}d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ') AS toks
        FROM documents),
      ${px}feats AS (
        SELECT doc_id, unnest(toks) AS f FROM ${px}d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM ${px}d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      ${px}fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM ${px}feats),
      ${px}rawf AS ($rawSrc),
      ${px}tgtf AS (SELECT * FROM ${px}fb WHERE doc_id % 97 = 0),
      ${px}cr AS (SELECT bucket, count(*) AS cr FROM ${px}rawf GROUP BY 1),
      ${px}ct AS (SELECT bucket, count(*) AS ct FROM ${px}tgtf GROUP BY 1),
      ${px}nr AS (SELECT count(*) AS nr FROM ${px}rawf),
      ${px}nt AS (SELECT count(*) AS nt FROM ${px}tgtf),
      ${px}lam AS (
        SELECT i AS bucket,
          CAST(floor(ln(((coalesce(ct.ct, 0) + 1.0) * (nr.nr + 1024)) /
                        ((coalesce(cr.cr, 0) + 1.0) * (nt.nt + 1024)))
               * 10000 + 0.5) AS BIGINT) AS lam
        FROM range(0, 1024) t(i)
        LEFT JOIN ${px}cr cr ON cr.bucket = i
        LEFT JOIN ${px}ct ct ON ct.bucket = i
        CROSS JOIN ${px}nr nr CROSS JOIN ${px}nt nt),
      ${px}scored AS (
        SELECT doc_id, count(*) AS n_features,
          CAST(sum(lam.lam) AS BIGINT) AS dsir_x10k
        FROM ${px}rawf rawf JOIN ${px}lam lam USING (bucket)
        GROUP BY doc_id)"""

  private val dsirCtes: String =
    "WITH " + dsirCtesNamed("", "SELECT * FROM fb WHERE doc_id % 97 <> 0")

  /** DSIR data selection (Xie et al. 2023): importance-score every raw
    * document by the smoothed hashed-n-gram log-likelihood ratio of a
    * held-out target slice vs the raw corpus, then take the top-50 —
    * the "make the corpus look like the target" counterpart of the
    * quality classifier's absolute gate. Per-bucket log-ratios
    * fixed-pointed once; doc scores are exact integer sums, so
    * estimation → λ table → scoring → selection all hash-match.
    */
  val qDsirSelect = Q("q_dsir_select",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirScore(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_features"), col("dsir_x10k"))
        .orderBy(col("dsir_x10k").desc, col("doc_id")).limit(50)
    },
    Some(dsirCtes + """
      SELECT doc_id, n_features, dsir_x10k
      FROM scored ORDER BY dsir_x10k DESC, doc_id LIMIT 50"""))

  /** DSIR proper — Gumbel-top-k importance RESAMPLING (the paper's
    * selection mode, vs q_dsir_select's deterministic top-scores):
    * P(selected) ∝ w(x) without replacement via the Gumbel-max trick,
    * noise from the portable hash at the score's own fixed-point scale,
    * so the stochastic sample itself is exact and hash-matched.
    */
  val qDsirResample = Q("q_dsir_resample",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirResample(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 50, nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_features"),
          col("dsir_x10k"), col("key_x10k"))
    },
    Some(dsirCtes + """
      SELECT doc_id, n_features, dsir_x10k,
        dsir_x10k + CAST(floor(-ln(-ln(
          (('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT + 1.0)
            / 1152921504606846976.0)) * 10000 + 0.5) AS BIGINT) AS key_x10k
      FROM scored ORDER BY key_x10k DESC, doc_id LIMIT 50"""))

  /** Heavy hitters via the Misra-Gries candidate sketch + exact recount.
    * The oracle is the plain exact top-k SQL — a hash match proves the
    * sketch path changes nothing (fixture vocab 31 << capacity, so the
    * sketch is lossless here by the MG bound; FreqSketchSpec exercises
    * real pruning at 10k distinct items).
    */
  val qHeavyHitters = Q("q_heavy_hitters",
    (s, dir) => Corpus.heavyHitters(t(s, dir, "documents"), "text",
      k = 10, capacity = 512),
    Some("""WITH tok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
      SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank, token, cnt
      FROM counts ORDER BY rank LIMIT 10"""))

  val qPiiScrub = Q("q_pii_scrub",
    (s, dir) => {
      val (scrubbed, hits) = Corpus.scrub(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
        hits.as("n_hits"), md5(scrubbed).as("fp_scrubbed"))
    },
    Some("""SELECT doc_id,
        len(regexp_extract_all(text, '[0-9]+')) AS n_hits,
        md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS fp_scrubbed
      FROM documents"""))

  /** Full PII battery over documents with deterministic synthetic PII
    * injected (the corpus is a clean word salad, so the scrubber must be
    * SHOWN to fire): emails, URLs, IPv4, phone numbers, digit runs —
    * scrubbed in specificity order, hit counts per stage, result
    * certified by fingerprint. All regexes RE2-compatible → the whole
    * battery replays in the oracle.
    */
  val qPiiFull = Q("q_pii_full",
    (s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@ex.com http://ex.org/p/"),
          col("doc_id"), lit(" ip 10.2."), col("doc_id") % 256,
          lit(".7 tel +1555"), col("doc_id") + 1000000).as("s"))
      val (scrubbed, counts) = Corpus.scrubAll(col("s"))
      withPii.select(col("doc_id") +:
        counts.map { case (n, c) => c.as(s"n_$n") } :+
        md5(scrubbed).as("fp_scrubbed"): _*)
    },
    Some("""WITH t0 AS (
        SELECT doc_id, text || ' contact u' || doc_id || '@ex.com http://ex.org/p/'
          || doc_id || ' ip 10.2.' || (doc_id % 256) || '.7 tel +1555'
          || (doc_id + 1000000) AS s
        FROM documents),
      s1 AS (SELECT doc_id,
          len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
          regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g') AS s
        FROM t0),
      s2 AS (SELECT doc_id, n_email,
          len(regexp_extract_all(s, 'https?://[^\s]+')) AS n_url,
          regexp_replace(s, 'https?://[^\s]+', '<url>', 'g') AS s
        FROM s1),
      s3 AS (SELECT doc_id, n_email, n_url,
          len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
          regexp_replace(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ip>', 'g') AS s
        FROM s2),
      s4 AS (SELECT doc_id, n_email, n_url, n_ipv4,
          len(regexp_extract_all(s, '\+\d{7,15}')) AS n_phone,
          regexp_replace(s, '\+\d{7,15}', '<phone>', 'g') AS s
        FROM s3),
      s5 AS (SELECT doc_id, n_email, n_url, n_ipv4, n_phone,
          len(regexp_extract_all(s, '[0-9]+')) AS n_number,
          regexp_replace(s, '[0-9]+', '<num>', 'g') AS s
        FROM s4)
      SELECT doc_id, n_email, n_url, n_ipv4, n_phone, n_number,
        md5(s) AS fp_scrubbed
      FROM s5"""))

  /** Symmetric int8 quantization of the embedding column — the 4×
    * storage/IO shrink for vector corpora — with the int8 values
    * themselves oracle-certified (double-precision scale math + floor
    * rounding is engine-exact; arrays serialized to strings for the
    * hash compare).
    */
  val qQuantize = Q("q_quantize",
    (s, dir) => t(s, dir, "embeddings").select(col("vec_id"),
      concat_ws(",", transform(Similarity.quantizeInt8(col("embedding")),
        _.cast("string"))).as("q8")),
    Some("""WITH scaled AS (
        SELECT vec_id, embedding,
          list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max') AS m
        FROM embeddings)
      SELECT vec_id,
        array_to_string(list_transform(embedding,
          x -> CAST(floor(x::DOUBLE * 127 / m + 0.5) AS INT)), ',') AS q8
      FROM scaled"""))

  /** Analytic-window breadth: lag/lead/ntile/percent_rank/cume_dist in
    * one deterministic ordering (ts then event_id). Rank fractions are
    * small-integer divisions — identical IEEE results in both engines —
    * rounded at 6dp for safety. */
  val qWindowFuncs = Q("q_window_funcs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_v"),
        lead(col("value"), 1).over(w).as("next_v"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
    },
    Some("""SELECT user_id, event_id,
        lag(value) OVER w AS prev_v, lead(value) OVER w AS next_v,
        ntile(4) OVER w AS quartile,
        round(percent_rank() OVER w, 6) AS pct_rank,
        round(cume_dist() OVER w, 6) AS cume
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  /** Window frames beyond running totals: a 90-day RANGE-interval frame
    * (peer rows by VALUE, not position) plus first/last/nth_value over
    * an explicit unbounded frame. */
  val qWindowFrames = Q("q_window_frames",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_wf")
      s.sql("""SELECT o_orderkey, o_custkey,
          round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW), 2) AS sum90d,
          round(first_value(o_totalprice) OVER w, 2) AS first_p,
          round(last_value(o_totalprice) OVER w, 2) AS last_p,
          round(nth_value(o_totalprice, 2) OVER w, 2) AS second_p
        FROM orders_wf
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")
    },
    Some("""SELECT o_orderkey, o_custkey,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW), 2) AS sum90d,
        round(first_value(o_totalprice) OVER w, 2) AS first_p,
        round(last_value(o_totalprice) OVER w, 2) AS last_p,
        round(nth_value(o_totalprice, 2) OVER w, 2) AS second_p
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  /** Set operations: INTERSECT / EXCEPT on yearly customer cohorts. */
  val qSetOps = Q("q_set_ops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      // each cohort feeds both set ops: materialize once (lazy cache on
      // the tiny distinct sets) instead of re-scanning orders 4x
      def cohort(y: Int) = ext.Materialize.multiScan(
        o.filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey")).distinct())
      val c95 = cohort(1995)
      val c96 = cohort(1996)
      c95.intersect(c96)
        .select(lit("both").as("tag"), col("o_custkey"))
        .unionByName(c95.except(c96)
          .select(lit("only95").as("tag"), col("o_custkey")))
    },
    Some("""WITH c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
      UNION ALL
      SELECT 'only95' AS tag, o_custkey FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)"""))

  /** Pivot: per-user event-type counts as columns. */
  val qPivot = Q("q_pivot",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count().na.fill(0L),
    Some("""SELECT user_id,
        count(CASE WHEN event_type='click' THEN 1 END) AS click,
        count(CASE WHEN event_type='error' THEN 1 END) AS error,
        count(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
        count(CASE WHEN event_type='signup' THEN 1 END) AS signup,
        count(CASE WHEN event_type='view' THEN 1 END) AS view
      FROM events GROUP BY user_id"""))

  /** CUBE aggregation (all grouping-set combinations). Two-phase: the
    * raw relation is aggregated to the finest grouping ONCE, and cube's
    * Expand (which multiplies its input by the number of grouping sets)
    * runs over those few rows instead of the full table — sums of sums
    * and sums of counts are exact, and at 100 TB this is the difference
    * between scanning the table once and four times. */
  val qCube = Q("q_cube",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("cnt"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("sq")), 2).as("qty"), sum(col("cnt")).as("n")),
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS qty, count(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Fuzzy (edit-distance) matching: near-identical part names within a
    * brand block — the classic blocked record-linkage shape; the block
    * key bounds the pair space, levenshtein is unit-cost in both engines. */
  val qFuzzyPairs = Q("q_fuzzy_pairs",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          length(col("p_name")).as("len"))
      // the probe side arrives as a single ~MB parquet split, which
      // would run the whole pair enumeration + levenshtein in ONE task;
      // spread it explicitly (REPARTITION_BY_NUM shuffles are exempt
      // from AQE coalescing, which would happily fold 1 MB back into
      // one partition). 4x cores saturates the pool even with skewed
      // (brand, len) blocks.
      val nSlices = s.sparkContext.defaultParallelism * 4
      val a = p.repartition(nSlices, col("p_partkey")).as("a")
      // the |len diff| <= 3 prune as a JOIN KEY, not a post-enumeration
      // filter: side b probes every length within the edit radius
      // (edit distance <= 3 forces |len(a)-len(b)| <= 3), so the equi
      // key (brand, len) confines pair enumeration to length-compatible
      // rows — the quadratic blowup happens per (brand, length) bucket
      // instead of per brand, and each qualifying pair matches exactly
      // once (b has one length; a's length hits one probe value).
      val b = p.withColumn("probe_len",
          explode(sequence(col("len") - 3, col("len") + 3)))
        .as("b")
      // the natural `levenshtein <= 3` predicate: BoundedLevenshteinRule
      // rewrites it to the thresholded banded-DP form during
      // optimization, and running it INSIDE the join predicate means
      // non-matches die during the join — the candidate set is never
      // materialized; dist is recomputed only for survivors.
      a.join(b, col("a.p_brand") === col("b.p_brand") &&
          col("a.len") === col("b.probe_len") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name"), 3).as("dist"))
    },
    Some("""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 3"""))

  /** Sorted-neighborhood linkage: candidates are the 5 successors in
    * p_name order — O(n·w) pairs instead of per-block quadratic, the
    * scale path when blocks are too coarse (cf. q_fuzzy_pairs). */
  val qFuzzySnm = Q("q_fuzzy_snm",
    (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      Corpus.sortedNeighborhood(p, Seq("p_name"), "p_partkey", window = 5)
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name"), 3).as("dist"))
        .filter(col("dist") >= 0)
    },
    Some("""WITH ranked AS (
        SELECT p_partkey, p_name,
               row_number() OVER (ORDER BY p_name, p_partkey) AS rn
        FROM part)
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM ranked a JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + 5
      WHERE levenshtein(a.p_name, b.p_name) <= 3"""))

  /** Array-function breadth over tokenized documents (arrays serialized
    * to strings for the hash compare: engines stringify arrays
    * differently, joined strings identically). */
  val qArrayFuncs = Q("q_array_funcs",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        split(TextOps.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        concat_ws(",", slice(sort_array(col("toks")), 1, 3)).as("first3_sorted"),
        array_contains(col("toks"), "the").cast("int").as("has_the"),
        concat_ws(",", slice(col("toks"), 1, 2)).as("first2"),
        element_at(col("toks"), -1).as("last_tok")),
    Some("""WITH b AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents)
      SELECT doc_id, len(toks) AS n,
        len(list_distinct(toks)) AS n_uniq,
        array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
        CAST(list_contains(toks, 'the') AS INT) AS has_the,
        array_to_string(toks[1:2], ',') AS first2,
        toks[-1] AS last_tok
      FROM b"""))

  /** Correlated subqueries (EXISTS + scalar) through the SQL surface —
    * Catalyst rewrites these to semi-joins / single-row aggregates. */
  val qSubqueries = Q("q_subqueries",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      s.sql("""
        SELECT c.c_custkey, c.c_mktsegment,
          (SELECT count(*) FROM orders_sq o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)""")
    },
    Some("""SELECT c.c_custkey, c.c_mktsegment,
        (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)"""))

  /** Salted skew join ≡ plain join (the oracle is the unsalted SQL):
    * correctness certificate for the explicit skew tool in
    * [[graft.ext.Layout.saltedJoin]]. */
  val qSaltedJoin = Q("q_salted_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ext.Layout.saltedJoin(li, o, "l_orderkey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
        round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  /** UNPIVOT (wide→long melt) via `stack`: per-part numeric attributes
    * become (attribute, value) rows — the normalization step before
    * generic per-metric aggregation. */
  val qUnpivot = Q("q_unpivot",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"), expr(
        "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (attr, val)"))
      .groupBy(col("attr"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("total")),
    Some("""SELECT attr, count(*) AS n, round(sum(val), 2) AS total
      FROM (
        SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)
      GROUP BY attr"""))

  /** Explicit GROUPING SETS (beyond rollup/cube), via the SQL surface. */
  val qGroupingSets = Q("q_grouping_sets",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity), 2) AS qty, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS qty, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""))

  /** Stratified quota sample: exactly 50 rows per returnflag, selected
    * by portable-hash order — deterministic balanced subsetting. */
  val qStratified = Q("q_stratified_sample",
    (s, dir) => Corpus.quotaSample(t(s, dir, "lineitem"),
        Seq("l_returnflag"), Seq("l_orderkey", "l_linenumber"), quota = 50)
      .select(col("l_returnflag"), col("sample_rank"),
        col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_returnflag, sample_rank, l_orderkey, l_linenumber FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY ('0x'||substr(md5(l_orderkey||':'||l_linenumber),1,15))::BIGINT,
                     l_orderkey, l_linenumber) AS sample_rank
        FROM lineitem) WHERE sample_rank <= 50"""))

  /** K-means (Lloyd, cosine assignment, deterministic init): float
    * centroid means aren't portably reproducible, so the fitted cells
    * have no portable oracle — instead the query is PROPERTY-CHECKED on
    * two invariants the oracle asserts literally TRUE:
    *  - per-iteration objective monotonicity (spherical-k-means: both
    *    Lloyd half-steps are non-decreasing in Σ cos(x, c_assign(x)),
    *    see [[Similarity.kmeansFit]]), with a relative-epsilon guard so
    *    benign float accumulation noise can't flap the boolean;
    *  - assignment consistency: the native [[graft.functions
    *    .NearestCentroid]] argmax over the trained centroids agrees
    *    row-for-row with an independent compositional argmax (explode +
    *    window rank — the q_kmeans_assign machinery) on the same
    *    centroids.
    * A Lloyd-update or argmax regression flips the hash. n_points keeps
    * an exact oracle-checkable count in the row. */
  val qKmeans = Q("q_kmeans",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      val maxIter = 3
      val (cents, objs) = Similarity.kmeansFit(corpus, k = 8, maxIter = maxIter)
      val monotone = objs.sliding(2).map { w =>
        w(1) >= w(0) - 1e-9 * math.max(1.0, math.abs(w(0))) }.toSeq
      val idx = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val native = corpus.withColumn("cell_n",
        graft.functions.VectorFunctions.nearestCentroid(col("embedding"), idx))
      val centsDf = idx.toSeq.toDF("c", "cent")
      val comp = corpus.crossJoin(broadcast(centsDf))
        .withColumn("rn", row_number().over(Window.partitionBy(col("id"))
          .orderBy(Similarity.cosine(col("embedding"), col("cent")).desc,
                   col("c").asc)))
        .filter(col("rn") === 1).select(col("id"), col("c").as("cell_c"))
      val mism = native.join(comp, "id")
        .agg(sum(when(col("cell_n") === col("cell_c"), 0L).otherwise(1L))
          .as("mism"))
      val nPoints = corpus.agg(count(lit(1)).as("n_points"))
      val iters = (1 to maxIter).map(i => (i.toLong, monotone(i - 1)))
        .toDF("iter", "obj_nondecreasing")
      iters.crossJoin(broadcast(nPoints)).crossJoin(broadcast(mism))
        .select(col("iter"), col("obj_nondecreasing"),
          (col("mism") === 0L).as("assign_consistent"), col("n_points"))
    },
    Some("""SELECT i AS iter, TRUE AS obj_nondecreasing,
        TRUE AS assign_consistent,
        (SELECT count(*) FROM embeddings) AS n_points
      FROM range(1, 4) t(i)"""))

  /** The k-means ASSIGNMENT step with a full oracle: `maxIter = 0` pins
    * the centroids to the k lowest-id vectors (the same deterministic
    * seeding q_kmeans's Lloyd loop starts from), so the
    * nearest-centroid argmax — the piece every per-iteration aggregate
    * and every IVF probe reuses — hash-checks in SQL. The float-centroid
    * Lloyd path stays covered by q_kmeans (rows-only) + spec. */
  val qKmeansAssign = Q("q_kmeans_assign",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.kmeans(e.select(col("vec_id").as("id"), col("embedding")),
          k = 8, maxIter = 0)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"))
    },
    Some("""WITH cents AS (
        SELECT embedding AS cent, row_number() OVER (ORDER BY vec_id) - 1 AS c
        FROM embeddings ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT e.vec_id, c.c,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                     c.c ASC) AS rn
        FROM embeddings e CROSS JOIN cents c)
      SELECT c AS cell, count(*) AS n, min(vec_id) AS min_id
      FROM assign WHERE rn = 1 GROUP BY c"""))

  /** Point-in-time snapshot (time travel): the compacted state of the
    * keyed stream as of a cutoff — latest event per key among those at
    * or before T. The CDC read-side primitive for "what did the table
    * look like on the 15th?". */
  val qTimeTravel = Q("q_time_travel",
    (s, dir) => {
      val cutoffMs = 1705276800000L // 2024-01-15T00:00:00Z
      val ev = t(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
        .filter(col("ts_ms") <= cutoffMs)
      Compaction.latestPerKey(ev, Seq("user_id"), Seq("ts_ms", "event_id"))
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
    },
    Some("""SELECT user_id, event_id, ts_ms, event_type FROM (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        FROM events WHERE epoch_ms(ts) <= 1705276800000) WHERE rn = 1"""))

  /** Data-quality audit: all expectations in one scan/aggregate. */
  val qDataQuality = Q("q_data_quality",
    (s, dir) => DataQuality.audit(t(s, dir, "orders"),
      Seq(
        DataQuality.notNull("n_null_cust", col("o_custkey")),
        DataQuality.inRange("n_bad_price", col("o_totalprice"), 0.01, 1e9),
        DataQuality.matches("n_bad_status", col("o_orderstatus"), "^[A-Z]$")),
      uniqueKeyCols = Seq("o_orderkey")),
    Some("""SELECT count(*) AS n_rows,
        count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null_cust,
        count(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.01
                     OR o_totalprice > 1e9 THEN 1 END) AS n_bad_price,
        count(CASE WHEN o_orderstatus IS NULL
                     OR NOT regexp_matches(o_orderstatus, '^[A-Z]$') THEN 1 END) AS n_bad_status,
        count(*) - count(DISTINCT o_orderkey) AS n_dup_key
      FROM orders"""))

  /** KMV distinct sketch: unlike HLL, the k-minimum-values estimator
    * over the portable md5 hash is bit-reproducible in any engine, so
    * the SKETCH ITSELF is oracle-checked — the distributed-sketch
    * correctness proof q_hll can't have. */
  val qKmv = Q("q_kmv_distinct",
    (s, dir) => graft.ext.Sketch.kmvDistinct(t(s, dir, "lineitem"),
      Seq("l_returnflag"), "l_partkey", k = 64),
    Some("""WITH hashed AS (
        SELECT DISTINCT l_returnflag,
          ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,15))::BIGINT AS h
        FROM lineitem),
      ranked AS (
        SELECT l_returnflag, h,
          row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        FROM hashed),
      agg AS (
        SELECT l_returnflag, max(rn) AS n_seen, max(h) AS h_k
        FROM ranked WHERE rn <= 64 GROUP BY l_returnflag)
      SELECT l_returnflag,
        CAST(CASE WHEN n_seen < 64 THEN n_seen
             ELSE CAST(floor(63.0 * 1152921504606846976.0 / h_k) AS BIGINT)
             END AS BIGINT) AS est_distinct
      FROM agg"""))

  /** HLL sketch distinct counts (approx_count_distinct): DuckDB's
    * approx_distinct uses a different sketch, so the estimate itself has
    * no portable oracle — instead the query is PROPERTY-CHECKED: it
    * computes the exact distinct count alongside (which the oracle CAN
    * replay) and asserts the estimate inside 3× the sketch's configured
    * relative standard deviation (rsd 0.05 → 15%; HLL++ is deterministic
    * for a given dataset — register merges are max, partitioning-
    * independent — so the boolean can't flap). An estimator regression
    * flips the hash. */
  val qHll = Q("q_hll",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double")
          <= lit(0.15) * col("exact_parts")).as("within_bound")),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        count(*) AS n, TRUE AS within_bound
      FROM lineitem GROUP BY l_returnflag"""))

  /** Count-Min-sketch frequency estimates for the corpus's top-20 tokens,
    * reported against the exact counts. The grid ([[graft.ext.Sketch
    * .cmsCells]]) uses the portable md5 hash, so DuckDB rebuilds the
    * identical cells and min-reads — the estimate itself is
    * oracle-checked, not just bounded. Two tokenize passes (grid build +
    * exact probe counts), the same audited trade as q_heavy_hitters:
    * re-running the codegen'd tokenizer is cheaper and
    * smaller-footprint than caching the exploded postings. */
  val qCmsFreq = Q("q_cms_freq",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextOps.tokens(TextOps.normalized(col("text"))))
          .as("token"))
      val probes = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token").asc)
        .limit(20)
      graft.ext.Sketch.cmsEstimate(toks, "token", probes, "token",
        depth = 4, width = 512)
    },
    Some("""WITH tok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS t
        FROM documents),
      cells AS (
        SELECT d.d,
          ('0x'||substr(md5(t || '#' || d.d),1,15))::BIGINT % 512 AS bucket,
          count(*) AS c
        FROM tok CROSS JOIN (SELECT unnest(generate_series(0,3)) AS d) d
        GROUP BY 1, 2),
      exact AS (
        SELECT t AS token, count(*) AS exact_n FROM tok GROUP BY 1
        ORDER BY exact_n DESC, token ASC LIMIT 20)
      SELECT e.token, e.exact_n, min(c.c) AS cms_n
      FROM exact e
      CROSS JOIN (SELECT unnest(generate_series(0,3)) AS d) d
      JOIN cells c ON c.d = d.d
        AND c.bucket = ('0x'||substr(md5(e.token || '#' || d.d),1,15))::BIGINT % 512
      GROUP BY 1, 2"""))

  // ---------------------------------------------------------------------
  // Extension: multimodal column plumbing (decode stubbed — no codecs in
  // this environment; schema/batching/partitioning are real).
  // ---------------------------------------------------------------------

  val qMultimodal = Q("multimodal_meta",
    (s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "text/plain")
      media.select(
        col("media_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.checksum").as("checksum"),
        Multimodal.fakeDecodeMeta(col("content")).as("dec"))
        .select(col("media_id"), col("n_bytes"), col("checksum"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          col("dec.n_frames").as("n_frames"))
    },
    Some("""SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
      md5(text) AS checksum,
      64 + octet_length(encode(text)) % 512 AS width,
      64 + (octet_length(encode(text)) * 7) % 512 AS height,
      1 + octet_length(encode(text)) % 16 AS n_frames
      FROM documents"""))

  /** Frame sampling over media columns: every 2nd frame of each media
    * row (frame count from the decode stub), one row per sampled frame
    * with a content-derived fingerprint. */
  val qMultimodalFrames = Q("multimodal_frames",
    (s, dir) => Multimodal.sampleFrames(
      Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "text/plain"),
      step = 2),
    Some("""SELECT media_id, n_frames, frame_no,
        md5(checksum||':'||frame_no) AS frame_fp
      FROM (SELECT doc_id AS media_id, md5(text) AS checksum,
              1 + octet_length(encode(text)) % 16 AS n_frames
            FROM documents),
      LATERAL (SELECT unnest(generate_series(1, n_frames, 2)) AS frame_no)"""))

  /** Content-addressed frame-store dedup — the multimodal × dedup
    * composition: media (built on a coarse 12-char clip key so real
    * duplicates exist) explode to frames, and identical frames across
    * media collapse to one stored copy + a refcount — the storage-dedup
    * step of a video corpus. Frame fingerprints are md5-derived
    * (decode stub), so the whole pipeline replays in the oracle.
    */
  val qFrameDedup = Q("multimodal_frame_dedup",
    (s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          substring(TextOps.normalized(col("text")), 1, 12).as("clip")),
        "doc_id", "clip", "video/fake")
      Multimodal.sampleFrames(media, step = 1)
        .groupBy(col("frame_fp"))
        .agg(min(col("media_id")).as("keep_media"),
          count(lit(1)).as("n_copies"))
    },
    Some("""WITH media AS (
        SELECT doc_id AS media_id,
          substr(trim(regexp_replace(lower(text),'\s+',' ','g')), 1, 12) AS clip
        FROM documents),
      m2 AS (
        SELECT media_id, md5(clip) AS checksum,
          1 + octet_length(encode(clip)) % 16 AS n_frames
        FROM media),
      frames AS (
        SELECT media_id, md5(checksum||':'||f.frame_no) AS frame_fp
        FROM m2, LATERAL (
          SELECT unnest(generate_series(1, n_frames, 1)) AS frame_no) f)
      SELECT frame_fp, min(media_id) AS keep_media, count(*) AS n_copies
      FROM frames GROUP BY frame_fp"""))

  /** End-to-end training-corpus preparation — the composition story:
    * language/quality gate → exact-dedup survivors → per-source quota
    * balancing (portable-hash order) → per-source token budget. Every
    * stage is integer/string-deterministic, so the whole pipeline is
    * oracle-checked as one unit.
    */
  val qCorpusPrep = Q("q_corpus_prep",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = docs.select(
        col("doc_id"), col("source"),
        TextOps.nTokens(col("text")).as("n_tokens"),
        TextOps.nStopwords(col("text")).as("n_stop"),
        TextOps.nPunct(col("text")).as("n_punct"),
        length(col("text")).as("n_chars"),
        TextOps.langIdHeuristic(col("text")).as("lang_pred"),
        TextOps.fingerprint(col("text")).as("fp"))
        .withColumn("quality", TextOps.qualityFromCounts(col("n_tokens"),
          col("n_stop"), col("n_punct"), col("n_chars")))
      val kept = scored.filter(col("lang_pred") === "en" && col("quality") >= 55)
      val surv = kept.withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id"))
      Corpus.quotaSample(surv, Seq("source"), Seq("doc_id"), quota = 30)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("budget_tokens"))
    },
    Some(s"""WITH scored AS (
        SELECT doc_id, source,
          len(regexp_extract_all(text, '\\S+')) AS n_tokens,
          len(list_filter(regexp_extract_all(lower(text), '\\S+'),
              x -> x IN ($stopList))) AS n_stop,
          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
          length(text) AS n_chars,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
               WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
               WHEN regexp_matches(text, '[\\x{0900}-\\x{097f}]') THEN 'hi'
               WHEN len(list_filter(regexp_extract_all(lower(text), '\\S+'),
                   x -> x IN ($stopList))) * 8 >= len(regexp_extract_all(text, '\\S+'))
                 THEN 'en'
               ELSE 'und' END AS lang_pred,
          md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents),
      q AS (
        SELECT *,
          (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 10
                WHEN n_tokens < 20 THEN n_tokens // 2
                ELSE 10000 // n_tokens END) * 5
          + least((n_stop * 50) // greatest(n_tokens, 1), 10) * 3
          + (10 - least((n_punct * 50) // greatest(n_chars, 1), 10)) * 2 AS quality
        FROM scored),
      kept AS (SELECT * FROM q WHERE lang_pred = 'en' AND quality >= 55),
      surv AS (
        SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id
                       FROM kept) WHERE doc_id = keep_id),
      quota AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT,
                     doc_id) AS sample_rank
          FROM surv) WHERE sample_rank <= 30)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS budget_tokens
      FROM quota GROUP BY source"""))

  /** End-to-end training-corpus preparation — the composition story:
    * duplicated-span coverage gate ([[Dedup.substringDupCoverage]]) +
    * quality-classifier gate ([[Corpus.qualityScore]], mean hashed-
    * n-gram weight ≥ −2) → fraction decontamination vs a held-out
    * benchmark ([[Corpus.decontaminateFraction]]) → exact-dedup
    * survivors → temperature mixture rebalance at α = 0.5
    * ([[Corpus.temperatureSample]]) → per-source budgets in LEARNED
    * subword tokens ([[Bpe.learn]] on the raw corpus + [[Bpe.encode]]).
    * Six stages, one hash-matched oracle: every intermediate set and
    * the final per-source token budgets are pinned.
    *
    * Stage independence the oracle relies on: coverage, quality, and
    * per-doc overlap fractions are doc-local scores (a doc's verdict
    * does not depend on which OTHER docs survived earlier stages), so
    * the SQL computes them over the full table and intersects the keeps —
    * while the temperature RATES are derived from the survivors' own
    * per-source counts, exactly as the operator does on its input.
    * The coverage block inherits `dedup_substr_coverage`'s oracle-unit
    * caveat: char-replayed windows == the operator's byte scan on the
    * ASCII fixture; non-ASCII byte semantics are spec-pinned.
    */
  val qCorpusPrepV2 = Q("q_corpus_prep_v2",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val covKeep = Dedup.substringDupCoverage(docs, "doc_id", "text",
          winBytes = 40, anchorMod = 8, dropAtBp = 5000)
        .filter(!col("drop")).select(col("id").as("doc_id"))
      // quality gate (fastText-style hashed-n-gram linear scorer, the
      // q_quality_score fixture weights): mean weight >= -2 admits the
      // bulk and trims the worst tail — doc-local like the coverage
      // gate, so the oracle computes both over the full table and
      // intersects the keeps
      val wTable = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      val qualKeep = Corpus.qualityScore(docs, "doc_id", "text", wTable,
          nBuckets = 1024, thrMilli = -2000L)
        .filter(col("keep")).select(col("id").as("doc_id"))
      // cached: read by the decontamination stage AND the keep join
      val afterCov = graft.ext.Materialize.multiScan(
        docs.join(covKeep, Seq("doc_id")).join(qualKeep, Seq("doc_id")))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      // trigrams, not bigrams: this corpus draws from a small
      // vocabulary, and at sf0.1 the benchmark's BIGRAM set covers
      // nearly the whole bigram space — every doc would exceed any
      // sane overlap threshold and the stage would empty the corpus
      val deconKeep = Corpus.decontaminateFraction(
          afterCov.filter(col("doc_id") % 97 =!= 0), bench,
          "doc_id", "text", n = 3, dropAtBp = 2500)
        .filter(!col("drop")).select(col("id").as("doc_id"))
      val afterDecon = afterCov.join(deconKeep, Seq("doc_id"))
      // cached: temperatureSample's rate collect and the final budget
      // aggregation would otherwise each re-run the whole gate prefix
      val surv = graft.ext.Materialize.multiScan(afterDecon
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id")))
      val sampled = Corpus.temperatureSample(surv, "source",
        Seq("doc_id"), alpha = 0.5)
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      sampled.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(graft.ext.Bpe.encode(col("text"), merges)))
            .cast("long").as("bpe_tokens"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """,
      qw AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      qd AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      qfeats AS (
        SELECT doc_id, unnest(toks) AS f FROM qd WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM qd, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      qsc AS (
        SELECT fb.doc_id, count(*) AS nf,
          CAST(sum(coalesce(qw.w, 0)) AS BIGINT) AS logit
        FROM (SELECT doc_id,
                ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket
              FROM qfeats) fb
        LEFT JOIN qw USING (bucket) GROUP BY fb.doc_id),
      qkeep AS (SELECT doc_id FROM qsc WHERE logit * 1000 >= -2000 * nf),
      cd AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      csized AS (
        SELECT doc_id, t, length(t) AS n FROM cd WHERE length(t) >= 40),
      cpos AS (
        SELECT doc_id, t, unnest(generate_series(1, n - 40 + 1)) AS p
        FROM csized),
      canch AS (
        SELECT doc_id, t, p FROM cpos
        WHERE (ascii(substr(t, p, 1)) * 4 + ascii(substr(t, p + 3, 1)) * 2
               + ascii(substr(t, p + 7, 1))) % 8 = 0),
      cwins AS (SELECT doc_id, p, md5(substr(t, p, 40)) AS fp FROM canch),
      cocc AS (
        SELECT doc_id, p, count(*) OVER (PARTITION BY fp) AS n_occ
        FROM cwins),
      cdup AS (SELECT doc_id, p FROM cocc WHERE n_occ >= 2),
      cmarked AS (
        SELECT doc_id, p,
          CASE WHEN p > coalesce(max(p + 40) OVER (PARTITION BY doc_id
            ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS new_isl
        FROM cdup),
      cisl AS (
        SELECT doc_id, p,
          sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS isl_id
        FROM cmarked),
      cspans AS (
        SELECT doc_id, isl_id, min(p) AS s, max(p) + 40 AS e
        FROM cisl GROUP BY 1, 2),
      ccov AS (
        SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS covered_bytes
        FROM cspans GROUP BY 1),
      covkeep AS (
        SELECT b.doc_id
        FROM (SELECT doc_id,
                octet_length(encode(trim(regexp_replace(lower(text),'\s+',' ','g')))) AS nb
              FROM documents) b
        LEFT JOIN ccov c USING (doc_id)
        WHERE NOT ((CASE WHEN b.nb > 0
          THEN (coalesce(c.covered_bytes, 0) * 10000) // b.nb
          ELSE 0 END) >= 5000)),
      fsh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-2, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+2], ' ')))
          AS sset
        FROM documents),
      fex0 AS (SELECT doc_id, unnest(sset) AS shingle FROM fsh),
      fex AS (SELECT doc_id,
                ('0x'||substr(md5(shingle),1,15))::BIGINT AS h
              FROM fex0),
      fbench AS (SELECT DISTINCT h FROM fex WHERE doc_id % 97 = 0),
      fscored AS (
        SELECT doc_id, count(*) AS n_shingles,
          count(CASE WHEN h IN (SELECT h FROM fbench) THEN 1 END) AS n_shared
        FROM fex WHERE doc_id % 97 <> 0 GROUP BY doc_id),
      deconkeep AS (
        SELECT k.doc_id
        FROM covkeep k JOIN qkeep USING (doc_id)
          LEFT JOIN fscored f USING (doc_id)
        WHERE k.doc_id % 97 <> 0
          AND NOT ((CASE WHEN coalesce(f.n_shingles, 0) > 0
            THEN (f.n_shared * 10000) // f.n_shingles ELSE 0 END) >= 2500)),
      surv AS (
        SELECT doc_id, source FROM (
          SELECT d.doc_id, d.source,
            min(d.doc_id) OVER (PARTITION BY
              md5(trim(regexp_replace(lower(d.text),'\s+',' ','g')))) AS keep_id
          FROM documents d JOIN deconkeep USING (doc_id))
        WHERE doc_id = keep_id),
      tc AS (SELECT source, count(*) AS n FROM surv GROUP BY source),
      tm AS (SELECT max(n) AS nmax FROM tc),
      tr AS (SELECT source,
        CAST(floor(sqrt(
          (((n::HUGEINT) * 1000000 * 1000000) // (SELECT nmax FROM tm))::DOUBLE))
          AS BIGINT) AS rate
        FROM tc),
      samp AS (
        SELECT sv.doc_id, sv.source
        FROM surv sv JOIN tr USING (source)
        WHERE ('0x'||substr(md5(sv.doc_id::VARCHAR),1,15))::BIGINT % 1000000
              < tr.rate)
      SELECT sp.source, count(*) AS n_docs,
        CAST(sum(coalesce(len(a.all_toks), 0)) AS BIGINT) AS bpe_tokens
      FROM samp sp LEFT JOIN agg a USING (doc_id)
      GROUP BY sp.source"""))

  /** Curation ladder v3 — the full published web-curation pipeline as
    * ONE composite with ONE end-to-end oracle, chaining the round-8
    * scorers the way a production corpus build runs them:
    *
    *   1. the FULL Gopher filter (Rae 2021) — shape battery AND
    *     repetition battery ([[Corpus.repetitionSignals]]), both
    *     doc-local gates;
    *   2. CCNet perplexity terciles (Wenzek 2020) — unigram-LM
    *     surprisal trained on the FULL corpus, ranked per source over
    *     the Gopher survivors via [[graft.ext.Prefix.stratifiedNtile]]
    *     (no ntile window — the q_perplexity_buckets scale shape),
    *     tail tercile dropped;
    *   3. DSIR Gumbel-top-k resampling (Xie 2023) — λ trained on the
    *     LADDER SURVIVOR pool vs the held-out benchmark slice (the
    *     ladder variant of [[dsirCtesNamed]]; benchmark docs are never
    *     selectable), top-100 by the exact fixed-point Gumbel key —
    *     a binding cut of the ~160-doc survivor pool at sf0.01, so the
    *     stochastic selection itself is exercised and pinned;
    *   4. temperature mixture rebalance at α = 0.5 (mT5) on the
    *     selected set's own per-source counts;
    *   5. contiguous packing budgeted in LEARNED BPE subword tokens
    *     (budget 2000, merges learned on the raw corpus — the shared
    *     unrolled CTEs).
    *
    * Rank-dependent stages (terciles, top-k, temperature rates) are
    * computed over the surviving set at that rung — exactly what the
    * oracle replays; doc-local scores (rules, surprisal, λ features)
    * compute over their defining corpus and intersect. Output is the
    * packed-corpus summary: every upstream admission decision moves
    * some pack's token count, so the hash pins the whole ladder.
    */
  val qCorpusPrepV3 = Q("q_corpus_prep_v3",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // 1. the FULL Gopher filter — shape battery AND repetition battery,
      // both doc-local
      val gKeep = Corpus.gopherRules(docs, "doc_id", "text",
          stopwords = graft.ext.TextOps.Stopwords)
        .filter(col("keep")).select(col("id").as("doc_id"))
        // top-n-gram dials tightened to the corpus (the stoplist
        // precedent): Rae's web-text 20/18/16% coverages are vacuous on
        // a 2k-vocab synthetic corpus whose shape survivors top out
        // near 9%, so the published dials would gate nothing here —
        // 7/8/9% makes the rung BINDING (drops 40 of 234 at sf0.01),
        // which is what lets the end-to-end hash pin the wiring
        .join(Corpus.repetitionSignals(docs, "doc_id", "text",
            topBpMax = Map(2 -> 700L, 3 -> 800L, 4 -> 900L))
          .filter(col("keep")).select(col("id").as("doc_id")),
          Seq("doc_id"))
      // 2. per-source surprisal terciles over the Gopher survivors
      val surp = Corpus.unigramSurprisal(docs, "doc_id", "text")
        .select(col("id").as("doc_id"), col("mean_surprisal_x10k"))
      val ranked = graft.ext.Prefix.stratifiedNtile(
        surp.join(gKeep, Seq("doc_id"))
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id")),
        Seq(col("source")),
        Seq(col("mean_surprisal_x10k"), col("doc_id")), 3, "bucket")
      val pKeep = ranked.filter(col("bucket") <= 2).select("doc_id")
      // 3. DSIR Gumbel-top-k: λ on the survivor pool, bench never selectable
      val sel = Corpus.dsirResample(
          docs.join(pKeep, Seq("doc_id")).filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 100, nBuckets = 1024)
        .select(col("id").as("doc_id"))
      // cached: temperatureSample derives rates from this relation and
      // then filters it — two scans of the whole gate prefix otherwise
      val selSrc = graft.ext.Materialize.multiScan(
        sel.join(docs.select(col("doc_id"), col("source"), col("text")),
          Seq("doc_id")))
      // 4. temperature rebalance on the selected set's source mix
      val sampled = Corpus.temperatureSample(selSrc, "source",
        Seq("doc_id"), alpha = 0.5)
      // 5. BPE-budgeted packing (merges from the raw corpus)
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      Corpus.pack(sampled, "doc_id", "text", budget = 2000,
          tokenCounter = c => size(graft.ext.Bpe.encode(c, merges)))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("pack_tokens"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + "," +
      repetitionCtes("r", top2Max = 700, top3Max = 800, top4Max = 900) + """,
      gd AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      gb AS (
        SELECT doc_id, t, string_split(t, ' ') AS toks,
          CASE WHEN t = '' THEN 0
               ELSE len(string_split(t, ' ')) END AS n
        FROM gd),
      gm AS (
        SELECT doc_id, CAST(n AS BIGINT) AS n_words,
          CASE WHEN n > 0
            THEN ((length(t) - (n - 1)) * 100) // n ELSE 0 END AS mean_len_x100,
          CASE WHEN n > 0 THEN
            (((length(t) - length(replace(t, '#', '')))
              + (length(t) - length(replace(t, '...', ''))) // 3) * 10000) // n
          ELSE 0 END AS symbol_bp,
          CASE WHEN n > 0 THEN
            (len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 10000) // n
          ELSE 0 END AS alpha_bp,
          CAST(len(list_intersect(list_distinct(toks),
            ['the','a','an','of','and','to','in','is','on','for','it',
             'with','as','at','by','be','this','that','from','or'])) AS BIGINT)
            AS n_stop_distinct
        FROM gb),
      gkeep AS (
        SELECT gm.doc_id FROM gm JOIN rbp USING (doc_id)
        WHERE (n_words BETWEEN 50 AND 100000)
          AND (mean_len_x100 BETWEEN 300 AND 1000)
          AND symbol_bp <= 1000 AND alpha_bp >= 8000
          AND n_stop_distinct >= 2 AND rbp.keep),
      ptok AS MATERIALIZED (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      pfreq AS (SELECT token, count(*) AS cnt FROM ptok GROUP BY 1),
      ptot AS (SELECT count(*) AS n_total FROM ptok),
      ppd AS (
        SELECT doc_id, CAST(sum(nat10k) AS BIGINT) // count(*) AS m
        FROM (
          SELECT t.doc_id,
            CAST(floor(-ln(f.cnt::DOUBLE / o.n_total) * 10000 + 0.5) AS BIGINT)
              AS nat10k
          FROM ptok t JOIN pfreq f USING (token) CROSS JOIN ptot o)
        GROUP BY doc_id),
      pranked AS (
        SELECT p.doc_id,
          ntile(3) OVER (PARTITION BY d.source
            ORDER BY p.m, p.doc_id) AS bucket
        FROM ppd p JOIN gkeep USING (doc_id)
          JOIN documents d USING (doc_id)),
      pkeep AS (SELECT doc_id FROM pranked WHERE bucket <= 2),
      """ + dsirCtesNamed("x",
        "SELECT xfb.* FROM xfb JOIN pkeep USING (doc_id) WHERE doc_id % 97 <> 0") + """,
      resamp AS (
        SELECT doc_id FROM (
          SELECT doc_id,
            dsir_x10k + CAST(floor(-ln(-ln(
              (('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT + 1.0)
                / 1152921504606846976.0)) * 10000 + 0.5) AS BIGINT) AS key_x10k
          FROM xscored)
        ORDER BY key_x10k DESC, doc_id LIMIT 100),
      tsrc AS (
        SELECT r.doc_id, d.source
        FROM resamp r JOIN documents d USING (doc_id)),
      tc AS (SELECT source, count(*) AS n FROM tsrc GROUP BY source),
      tm AS (SELECT max(n) AS nmax FROM tc),
      tr AS (SELECT source,
        CAST(floor(sqrt(
          (((n::HUGEINT) * 1000000 * 1000000) // (SELECT nmax FROM tm))::DOUBLE))
          AS BIGINT) AS rate
        FROM tc),
      samp AS (
        SELECT sv.doc_id
        FROM tsrc sv JOIN tr USING (source)
        WHERE ('0x'||substr(md5(sv.doc_id::VARCHAR),1,15))::BIGINT % 1000000
              < tr.rate),
      psz AS (
        SELECT s.doc_id, coalesce(len(a.all_toks), 0) AS n_tokens
        FROM samp s LEFT JOIN agg a USING (doc_id)),
      prn AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM psz)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM prn GROUP BY 1"""))

  /** Overlapping token-window chunking (size 40, overlap 8). */
  val qChunk = Q("q_chunk",
    (s, dir) => Corpus.chunk(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 40, overlap = 8)
      .select(col("id").as("doc_id"), col("chunk_no"), col("tok_start"),
        md5(col("chunk_text")).as("chunk_fp")),
    Some("""WITH d AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      sized AS (
        SELECT doc_id, toks,
          CASE WHEN toks = [''] THEN 0 ELSE len(toks) END AS n
        FROM d),
      chunked AS (
        SELECT doc_id, toks,
          greatest(CAST(ceil((n - 8) / 32.0) AS INT), 1) AS n_chunks
        FROM sized WHERE n > 0)
      SELECT doc_id, c.chunk_no, c.chunk_no * 32 + 1 AS tok_start,
        md5(array_to_string(toks[c.chunk_no*32+1 : c.chunk_no*32+40], ' ')) AS chunk_fp
      FROM chunked, LATERAL (
        SELECT unnest(generate_series(0, n_chunks - 1)) AS chunk_no) c"""))

  /** Contiguous sequence packing, budgeted in LEARNED BPE subword
    * tokens instead of whitespace tokens — the form a tokenizer-aware
    * training pipeline actually ships (context windows are subword
    * budgets). Exercises `pack`'s pluggable tokenCounter with
    * [[graft.ext.Bpe.encode]] on the corpus-learned table end-to-end;
    * the oracle replays learning + encoding (the shared unrolled CTEs)
    * and then the same running-sum pack assignment.
    */
  val qPackBpe = Q("q_pack_bpe",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      Corpus.pack(docs, "doc_id", "text", budget = 2000,
          tokenCounter = c => size(graft.ext.Bpe.encode(c, merges)))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("pack_tokens"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """,
      psized AS (
        SELECT doc_id, coalesce(len(a.all_toks), 0) AS n_tokens
        FROM documents LEFT JOIN agg a USING (doc_id)),
      pruns AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM psized)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM pruns GROUP BY 1"""))

  /** Contiguous sequence packing into 2000-token budgets. */
  val qPack = Q("q_pack",
    (s, dir) => Corpus.pack(t(s, dir, "documents"), "doc_id", "text",
        budget = 2000)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens")),
    Some("""WITH toks AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents),
      runs AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM toks)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM runs GROUP BY 1"""))

  /** Benchmark decontamination: flag corpus docs sharing any 5-gram with
    * the benchmark set (stand-in: every 97th document). */
  val qDecontam = Q("q_decontam",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Corpus.decontaminate(docs.filter(col("doc_id") % 97 =!= 0), bench,
          "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), col("n_shared"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-4, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+4], ' ')))
          AS sset
        FROM documents),
      ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0),
      corpus AS (SELECT doc_id, shingle FROM ex WHERE doc_id % 97 <> 0)
      SELECT c.doc_id, count(*) AS n_shared
      FROM corpus c WHERE c.shingle IN (SELECT shingle FROM bench)
      GROUP BY c.doc_id"""))

  /** Bloom-accelerated decontamination: BoomAgg-built filter prunes the
    * corpus postings inside the scan stage, exact semi-join restores
    * exactness — so the oracle is the SAME SQL as q_decontam, and a hash
    * match proves the bloom path changes nothing but the plan.
    */
  val qDecontamBloom = Q("q_decontam_bloom",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Corpus.decontaminateBloom(docs.filter(col("doc_id") % 97 =!= 0), bench,
          "doc_id", "text", n = 5, nBits = 1 << 20, k = 5)
        .select(col("id").as("doc_id"), col("n_shared"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-4, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+4], ' ')))
          AS sset
        FROM documents),
      ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0),
      corpus AS (SELECT doc_id, shingle FROM ex WHERE doc_id % 97 <> 0)
      SELECT c.doc_id, count(*) AS n_shared
      FROM corpus c WHERE c.shingle IN (SELECT shingle FROM bench)
      GROUP BY c.doc_id"""))

  /** Every declared query, in gate order. */
  val all: Seq[Q] = Seq(
    q1Pricing, q3TopRevenue, q5RegionRevenue, qTopParts, qAggStats, qRollup,
    qSemiAnti, qSemiJoin, qWindowRunning,
    qCdcLatest, qCdcLatestAgg, qCdcMerge, qCdcTargets, qJsonExtract, qVariant,
    qSchemaInference, qDateFuncs, qStringFuncs, qMathFuncs, qEventsHourly,
    qEnvelopePg, qEnvelopeMongo, qEnvelopeDms, qEnvelopeDlq,
    qTextStats, qTokenCount, qLangId, qRepetition, qSessionize, qFingerprint,
    qCorpusCuration,
    qDedupExact, qDedupNfc, qDedupJaccard, qDedupIncremental, qDedupMinhash,
    qDedupMinhashIncremental, qDedupClusters, qDedupSurvivors, qDedupPassages,
    qDedupPassageRewrite, qDedupSubstrings, qDedupSubstrCoverage, qDedupSimhash,
    qDedupSimhashIncremental,
    qAnnBrute, qEmbeddingNearDup, qEmbeddingNearDupSrp, qDedupSemantic,
    qDecontamEmbedding,
    qAnnIvf, qAnnIvfTrained, qAnnPq, qAnnIvfPq, qAnnLsh, qDiversitySample,
    qAsofJoin, qRangeJoin, qScd2, qPercentiles, qSample, qSampleFast,
    qTfidf, qBm25, qHybridRetrieval, qVocab, qBpeLearn, qBpeEncode,
    qHeavyHitters,
    qLmSurprisal, qLmBigram, qLmBackoff, qQualityScore, qDsirSelect,
    qDsirResample, qPerplexityBuckets, qGopherRules, qGopherRepetition,
    qMixtureSample, qWeightedSample,
    qPiiScrub, qPiiFull, qQuantize, qHll, qKmv, qCmsFreq,
    qWindowFuncs, qWindowFrames, qSetOps, qPivot, qUnpivot, qCube,
    qFuzzyPairs, qFuzzySnm,
    qGroupingSets, qArrayFuncs, qSubqueries, qSaltedJoin, qStratified, qKmeans,
    qKmeansAssign,
    qTimeTravel, qDataQuality,
    qMultimodal, qMultimodalFrames, qFrameDedup, qCorpusPrep, qCorpusPrepV2,
    qCorpusPrepV3,
    qChunk, qPack, qPackBpe, qDecontam, qDecontamBloom, qDecontamFraction,
    qTemperatureSample, qTemperatureSampleA25, qTemperatureSampleA75)
}

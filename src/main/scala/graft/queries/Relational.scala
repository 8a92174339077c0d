package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator pack — the SURVEY §2 shapes that map to built-in
  * Catalyst operators (A* aggregations, F* filters, J* joins, R* resume
  * anti-joins, W* windows, O* top-k). Each query is written so that its
  * result is bit-stable across engines: double aggregation goes through
  * exact DECIMAL sums before a final cast to DOUBLE, so Spark and the
  * DuckDB oracle agree to the last bit regardless of summation order.
  */
object Relational {

  private def li(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def ord(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  private def cust(s: SparkSession, dir: String) = s.read.parquet(s"$dir/customer.parquet")
  private def nat(s: SparkSession, dir: String) = s.read.parquet(s"$dir/nation.parquet")
  private def reg(s: SparkSession, dir: String) = s.read.parquet(s"$dir/region.parquet")
  private def ev(s: SparkSession, dir: String) = s.read.parquet(s"$dir/events.parquet")
  private def docs(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** A1/A3-shape pricing summary (TPC-H Q1 skeleton): map-side partial
    * aggregation, one shuffle on the two grouping keys. Exact decimal sums.
    */
  val q01PricingAgg = QueryDef(
    "q01_pricing_agg",
    (s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
          (sum(dec2(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc")
        )
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""
      SELECT l_returnflag, l_linestatus,
             count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.trim)
  )

  /** F1/O4-shape selective scan: predicate + projection pushed to the
    * parquet reader (verify via PushedFilters/ReadSchema in explain).
    */
  val q02FilterPushdown = QueryDef(
    "q02_filter_pushdown",
    (s, dir) =>
      li(s, dir)
        .filter(col("l_quantity") >= 10 && col("l_quantity") < 20 && col("l_discount") > 0.05)
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_linenumber"), col("l_quantity"),
          (dec2(col("l_extendedprice")) * dec2(col("l_discount"))).cast("double").as("disc_amount")
        )
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc_amount
      FROM lineitem
      WHERE l_quantity >= 10 AND l_quantity < 20 AND l_discount > 0.05
      ORDER BY l_orderkey, l_linenumber
    """.trim)
  )

  /** J1/J2-shape dimension enrichment: two broadcast-able small-side joins
    * (region, nation) plus one shuffle join to orders; revenue per region.
    */
  val q03JoinEnrich = QueryDef(
    "q03_join_enrich",
    (s, dir) => {
      val o = ord(s, dir)
      val c = cust(s, dir)
      val n = broadcast(nat(s, dir))
      val r = broadcast(reg(s, dir))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_rev")
        )
        .orderBy("r_name", "o_orderstatus")
    },
    Some("""
      SELECT r_name, o_orderstatus, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, o_orderstatus
      ORDER BY r_name, o_orderstatus
    """.trim)
  )

  /** J7/R1-shape skip-if-computed resume: LEFT ANTI join — the Spark form
    * of the reference's output-exists check (predict.py:137-143).
    */
  val q04AntiJoinResume = QueryDef(
    "q04_antijoin_resume",
    (s, dir) => {
      val c = cust(s, dir)
      val o = ord(s, dir).filter(col("o_totalprice") > 200000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_no_order"),
             sum(dec2(col("c_acctbal"))).cast("double").as("bal_sum"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_no_order,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """.trim)
  )

  /** R3-shape cache-hit retention: LEFT SEMI join (EXISTS). */
  val q05SemiJoin = QueryDef(
    "q05_semi_join",
    (s, dir) => {
      val c = cust(s, dir)
      val o = ord(s, dir).filter(col("o_totalprice") > 150000.0)
      val n = broadcast(nat(s, dir))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name, count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      GROUP BY n_name ORDER BY n_name
    """.trim)
  )

  /** A6/W-shape ordered running aggregate per key (the repetition-signal
    * window of model.py:418-439 restated relationally): running decimal
    * sum + row_number over (user, ts).
    */
  val q06WindowRunning = QueryDef(
    "q06_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn(
          "run_value",
          sum(dec2(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
        )
        .select("event_id", "user_id", "rn", "run_value")
        .orderBy("user_id", "rn")
    },
    Some("""
      SELECT event_id, user_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_value
      FROM events ORDER BY user_id, rn
    """.trim)
  )

  /** O2/O3-shape deterministic top-k per group (argmax with total-order
    * tiebreak, the Spark form of np.argmax at split_md_to_pages.py:428).
    */
  val q07TopkPerGroup = QueryDef(
    "q07_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      ord(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rk")
    },
    Some("""
      SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        FROM orders) t
      WHERE rk <= 3 ORDER BY o_orderpriority, rk
    """.trim)
  )

  /** W3-shape repeated-run detection via lead(): the relational skeleton
    * of the hallucinated-reference line scan (postprocessing.py:190-230).
    */
  val q08LeadRuns = QueryDef(
    "q08_lead_runs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("rep", when(col("next_type") === col("event_type"), 1).otherwise(0))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("rep")).as("n_repeats"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CASE WHEN next_type = event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_repeats
      FROM (SELECT user_id, event_type,
                   lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
            FROM events) t
      GROUP BY user_id ORDER BY user_id
    """.trim)
  )

  /** W8-shape ordered per-doc reassembly: sorted concat within group
    * (predict.py:196-204 page join, relational form).
    */
  val q09Reassembly = QueryDef(
    "q09_reassembly",
    (s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(
          array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
                      x => x.getField("text")),
            "\n"
          ).as("doc_concat"),
          count(lit(1)).as("n_docs")
        )
        .select(col("source"), col("n_docs"), length(col("doc_concat")).as("concat_len"),
                substring(col("doc_concat"), 1, 64).as("head64"))
        .orderBy("source"),
    Some("""
      SELECT source, count(*) AS n_docs,
             length(string_agg(text, chr(10) ORDER BY doc_id)) AS concat_len,
             substring(string_agg(text, chr(10) ORDER BY doc_id), 1, 64) AS head64
      FROM documents GROUP BY source ORDER BY source
    """.trim)
  )

  /** A7/F8-shape distinct: per lang, number of distinct sources. */
  val q10Distinct = QueryDef(
    "q10_distinct",
    (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(countDistinct(col("source")).as("n_sources"), count(lit(1)).as("n_docs"))
        .orderBy("lang"),
    Some("""
      SELECT lang, count(DISTINCT source) AS n_sources, count(*) AS n_docs
      FROM documents GROUP BY lang ORDER BY lang
    """.trim)
  )

  /** F6-shape regex page filter (broken-ref rejection,
    * split_htmls_to_pages.py:105-107 analog) + O5 limit shape.
    */
  val q11RegexFilter = QueryDef(
    "q11_regex_filter",
    (s, dir) =>
      docs(s, dir)
        .filter(!regexp_like(col("text"), lit("(slow slow|error error)")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("lang"),
    Some("""
      SELECT lang, count(*) AS n_kept FROM documents
      WHERE NOT regexp_matches(text, '(slow slow|error error)')
      GROUP BY lang ORDER BY lang
    """.trim)
  )

  /** J6-shape keyed prediction↔truth pairing (never positional): equi-join
    * events to users' first event via min_by, producing a keyed zip.
    */
  val q12KeyedZip = QueryDef(
    "q12_keyed_zip",
    (s, dir) => {
      val e = ev(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val firsts = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id").as("u"), col("event_type").as("first_type"))
      e.join(firsts, e("user_id") === firsts("u"))
        .groupBy("event_type", "first_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "first_type")
    },
    Some("""
      WITH firsts AS (
        SELECT user_id AS u, event_type AS first_type FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events) t WHERE rn = 1)
      SELECT event_type, first_type, count(*) AS n
      FROM events JOIN firsts ON user_id = u
      GROUP BY event_type, first_type ORDER BY event_type, first_type
    """.trim)
  )

  /** A6: the repetition-signal sliding variance (RunningVarTorch,
    * model.py:418-439) restated relationally — var over a 15-row window
    * per key, computed EXACTLY via decimal Σx/Σx² so both engines agree
    * to the bit: var = (n·Σx² − (Σx)²) / (n·(n−1)).
    */
  val q30WindowVariance = QueryDef(
    "q30_window_variance",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-14, 0)
      val x = col("value").cast("decimal(18,2)")
      val n = count(lit(1)).over(w)
      val sx = sum(x).over(w)
      val sx2 = sum(x * x).over(w)
      ev(s, dir)
        .withColumn("n", n)
        .withColumn("var_num", (col("n") * sx2 - sx * sx).cast("double"))
        .select(col("event_id"), col("user_id"), col("n"),
          when(col("n") > 1, col("var_num") / (col("n") * (col("n") - 1)))
            .otherwise(0.0).as("run_var"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      WITH t AS (
        SELECT event_id, user_id,
               count(*) OVER wnd AS n,
               sum(CAST(value AS DECIMAL(18,2))) OVER wnd AS sx,
               sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER wnd AS sx2
        FROM events
        WINDOW wnd AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, n,
             CASE WHEN n > 1 THEN CAST(n * sx2 - sx * sx AS DOUBLE) / (n * (n - 1))
                  ELSE 0.0 END AS run_var
      FROM t ORDER BY user_id, event_id
    """.trim)
  )

  /** BATCH sessionization — the oracle-gated audit twin of the
    * streaming `EventStreams.sessionize` (flatMapGroupsWithState):
    * same gap rule (a session merges events whose inter-arrival gap is
    * ≤ 30 min; strictly greater starts a new one), same (ts, event_id)
    * tie order, expressed as the classic gaps-and-islands window chain
    * so an independent engine replays it bit-exactly. The stream emits
    * sessions incrementally (closed on gap or idle timeout); this
    * query derives the complete final session set — the shape used to
    * AUDIT a streaming sessionizer's state handling after the fact.
    *
    * Scale: two stacked windows on the same (user_id) partitioning —
    * one Exchange, both window passes pipelined — then the session
    * rollup reuses that partitioning (no second shuffle on user_id).
    * Exact decimal sums for the value total.
    */
  val q61Sessions = QueryDef(
    "q61_sessions",
    (s, dir) => {
      val gapUs = 30L * 60L * 1000000L
      val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // parquet NTZ timestamp → epoch micros; sessions run UTC so the
      // NTZ→TZ cast is identity wall-clock and matches DuckDB epoch_us
      val tsu = unix_micros(col("ts").cast("timestamp"))
      ev(s, dir)
        .withColumn("new_session",
          when(lag(tsu, 1).over(order).isNull ||
            tsu - lag(tsu, 1).over(order) > gapUs, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          sum(dec2(col("value"))).cast("double").as("total_value"),
          min(tsu).as("started_us"),
          max(tsu).as("ended_us"))
        .orderBy("user_id", "session_idx")
    },
    Some("""
      WITH o AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS tsu,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      m AS (
        SELECT user_id, event_id, value, tsu,
               CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM o),
      x AS (
        SELECT user_id, value, tsu,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM m)
      SELECT user_id, session_idx,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             min(tsu) AS started_us,
             max(tsu) AS ended_us
      FROM x GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(
    q01PricingAgg, q02FilterPushdown, q03JoinEnrich, q04AntiJoinResume,
    q05SemiJoin, q06WindowRunning, q07TopkPerGroup, q08LeadRuns,
    q09Reassembly, q10Distinct, q11RegexFilter, q12KeyedZip, q30WindowVariance,
    q61Sessions
  )
}

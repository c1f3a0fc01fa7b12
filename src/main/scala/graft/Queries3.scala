package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functional
import graft.operators.AsOfJoin
import graft.streaming.EventsStream

/** Round-2 queries: the custom-Catalyst as-of join, rollup subtotals,
  * and the fully-oracled exact n-gram Jaccard. Naming/oracle/float
  * conventions as in [[Queries]].
  */
object Queries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(25, 4))).cast(DoubleType)

  // ---- custom Catalyst operator: backward as-of join ------------------

  /** For every click, the latest preceding purchase by the same user —
    * executed by AsOfJoinExec (plans/AsOfJoin.scala): one co-partitioned
    * merge pass after Catalyst-inserted exchange+sort. Timestamps are
    * µs-truncated on BOTH sides (DuckDB reads TIMESTAMP(NANOS) at µs);
    * the purchase side is pre-deduped to one row per (user, µs) so the
    * as-of match is deterministic in any engine. */
  def q24AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id", expr("ts div 1000").as("us"))
    // repartition by user BEFORE the (user, µs) dedup: clustering by a
    // subset of the group keys satisfies the aggregate's distribution,
    // and the as-of join then reuses the same exchange — one shuffle of
    // the purchase side instead of two
    val purchases = ev.where($"event_type" === "purchase")
      .repartition($"user_id")
      .groupBy($"user_id".as("p_user"), expr("ts div 1000").as("p_us"))
      .agg(max($"event_id").as("purchase_id"))
    AsOfJoin.asof(clicks, purchases, Seq("user_id"), Seq("p_user"),
        "us", "p_us")
      .select($"event_id", $"user_id", $"purchase_id",
        ($"us" - $"p_us").as("lag_us"))
      .orderBy($"event_id")
  }

  val q24Sql: String =
    """SELECT c.event_id, c.user_id, p.purchase_id, c.us - p.p_us AS lag_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS us
      |      FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id AS p_user, epoch_us(ts) AS p_us,
      |                MAX(event_id) AS purchase_id
      |                FROM events WHERE event_type = 'purchase'
      |                GROUP BY 1, 2) p
      |  ON c.user_id = p.p_user AND c.us >= p.p_us
      |ORDER BY c.event_id""".stripMargin

  // ---- rollup subtotals (free Catalyst capability, SURVEY §2.4 note) --

  /** Hierarchical subtotals via rollup; null grouping markers coalesced
    * to 'ALL' on both sides so ordering and hashing are engine-neutral. */
  def q25Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty_sum"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"qty_sum")
      .orderBy($"returnflag", $"linestatus")

  val q25Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS qty_sum
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---- exact n-gram Jaccard, fully oracled ----------------------------

  /** Character-3-gram Jaccard over a bounded doc subset, computed from
    * first principles with array built-ins on BOTH engines (identical
    * shingle definition: substr(text, i, 3) for i in 1..len-2,
    * distinct). Unlike q42 (hash-based LSH pipeline, rows-only check)
    * every value here is DuckDB-verified. The subset bound keeps the
    * all-pairs step at 19,900 pairs; at corpus scale the same jaccard
    * expression runs on LSH candidates only (q42 path). */
  def q44JaccardExact(s: SparkSession, dir: String): DataFrame = {
    // shingles hashed to 64-bit and kept as sorted distinct sets: the
    // per-pair jaccard is then ONE merge scan (Kernels.jaccardSorted)
    // instead of a string-array intersect per pair. |∩|/|∪| is
    // unchanged up to 64-bit collisions (~1e-12 at these set sizes);
    // the oracle computes the same ratio over the raw shingle strings.
    val sh = sort_array(array_distinct(transform(
      sequence(lit(1), length($"text") - 2),
      i => xxhash64($"text".substr(i, lit(3))))))
    // length >= 3 guard: sequence(1, len-2) would DESCEND for shorter
    // docs (e.g. [1,0]) and fabricate shingles the oracle's half-open
    // range(1, len-1) never produces
    val d = t(s, dir, "documents")
      .where($"doc_id" < 200 && length($"text") >= 3)
      .select($"doc_id", sh.as("sh"))
    val a = d.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = d.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    a.join(broadcast(b), $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        graft.functions.Functional.jaccardSorted($"sh_a", $"sh_b").as("j"))
      .where($"j" >= 0.60)
      .select($"id_a", $"id_b", round($"j", 4).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  val q44Sql: String =
    """WITH d AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS sh
      |  FROM documents WHERE doc_id < 200 AND length(text) >= 3),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS i,
      |    len(a.sh) AS na, len(b.sh) AS nb
      |  FROM d a, d b WHERE a.doc_id < b.doc_id)
      |SELECT id_a, id_b,
      |  ROUND(CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE), 4) AS jaccard
      |FROM p WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.60
      |ORDER BY id_a, id_b""".stripMargin

  // ---- range join via time-bucketing ----------------------------------

  /** For each error event, the count of same-user clicks in the
    * preceding 24 h — a range join executed the scalable way: clicks
    * are exploded to the (at most 2) day-buckets they can serve, the
    * join runs on (user, bucket) equality, and the exact range filter
    * prunes within buckets. No inequality-join cross product: shuffle
    * volume is O(|events| × 2), each bucket-group is tiny. The DuckDB
    * oracle states the same query as a plain inequality join. */
  def q26RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = t(s, dir, "events")
    val errors = ev.where($"event_type" === "error")
      .select($"event_id", $"user_id", expr("ts div 1000").as("e_us"))
      .withColumn("bucket", expr(s"e_us div $dayUs"))
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", expr("ts div 1000").as("c_us"))
      // a click can only match errors in its own or the next day-bucket
      .withColumn("bucket", explode(array(expr(s"c_us div $dayUs"),
        expr(s"c_us div $dayUs") + 1)))
    errors.join(clicks, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        $"c_us".isNotNull && $"c_us" >= $"e_us" - dayUs && $"c_us" < $"e_us")
      .groupBy($"event_id")
      .agg(sum(when($"hit", 1L).otherwise(0L)).cast(LongType).as("n_clicks"))
      .orderBy($"event_id")
  }

  val q26Sql: String =
    """SELECT e.event_id, COUNT(c.us) AS n_clicks
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS us
      |      FROM events WHERE event_type = 'error') e
      |LEFT JOIN (SELECT user_id, epoch_us(ts) AS us
      |           FROM events WHERE event_type = 'click') c
      |ON e.user_id = c.user_id
      |AND c.us >= e.us - 86400000000 AND c.us < e.us
      |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin

  // ---- rolling window (reference's commented-out `rolling` sketch,
  //      velox_rt/dataframe_cpu.py:2472-2482, realized on Spark) --------

  /** Rolling 3-order mean/min of order totals per customer. */
  def q27Rolling(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        round(avg($"o_totalprice").over(w), 4).as("roll_avg"),
        min($"o_totalprice").over(w).as("roll_min"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q27Sql: String =
    """SELECT o_custkey, o_orderkey,
      |ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS roll_avg,
      |MIN(o_totalprice) OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_min
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- UDF surface at the gate (§2.13 map/filter over JVM closures) ---

  /** The reference's df.map(fn)/filter(pred) UDF path end-to-end:
    * filterRows drops low-quantity rows with a JVM predicate, mapRows
    * computes a charged price with a JVM function (mapPartitions
    * underneath — batch-amortized, no shuffle); the oracle states the
    * same logic in SQL. Proves the closure path produces the exact
    * values the declarative path would. The dict form of map
    * (Functional.mapDict, icolumn.py:420-518) rides the same gate:
    * line numbers 1/2 map through a literal dict, the rest fall to the
    * defaultdict default. */
  def q29UdfMap(s: SparkSession, dir: String): DataFrame = {
    import graft.frame.TFrame
    val li = TFrame(t(s, dir, "lineitem"))
    li.keep("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_tax")
      .filterRows(Seq("l_quantity"))(v => v.head.asInstanceOf[Double] >= 30.0)
      .mapRows(
        StructType(Seq(
          StructField("l_orderkey", LongType, nullable = false),
          StructField("l_linenumber", IntegerType, nullable = false),
          StructField("charged", DoubleType, nullable = false))),
        Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_tax")) {
        case Seq(ok, ln, price, tax) =>
          // Seq[Any] is load-bearing: a bare Seq(Long, Int, Double)
          // harmonizes all elements to Double (Scala numeric widening)
          Seq[Any](ok.asInstanceOf[Long], ln.asInstanceOf[Int],
            price.asInstanceOf[Double] * (1.0 + tax.asInstanceOf[Double]))
      }
      .withCol("line_band", Functional.mapDict($"l_linenumber",
        Map(1 -> "first", 2 -> "second"), default = Some("rest")))
      .sort(Seq("l_orderkey", "l_linenumber"))
      .df
  }

  val q29Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |l_extendedprice * (1.0 + l_tax) AS charged,
      |CASE l_linenumber WHEN 1 THEN 'first' WHEN 2 THEN 'second'
      |  ELSE 'rest' END AS line_band
      |FROM lineitem WHERE l_quantity >= 30.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- lookup_indices at the gate (§2.14 vocab path) ------------------

  /** Token→id lookup over a literal vocabulary with default index
    * (text/vocab_ops.h surface): ids of the first 5 tokens of each doc
    * summed; oracle replicates the vocab as a CASE expression. */
  def q34VocabLookup(s: SparkSession, dir: String): DataFrame = {
    val vocab = Map("the" -> 1L, "of" -> 2L, "and" -> 3L, "to" -> 4L,
      "data" -> 5L, "model" -> 6L)
    val toks = slice(split(trim(lower($"text")), "\\s+"), 1, 5)
    t(s, dir, "documents")
      .select($"doc_id",
        aggregate(
          graft.functions.Functional.lookupIndices(vocab, 0L)(toks),
          lit(0L), (acc, x) => acc + x).as("id_sum"))
      .orderBy($"doc_id")
  }

  val q34Sql: String = {
    val cases = Seq("the" -> 1, "of" -> 2, "and" -> 3, "to" -> 4,
      "data" -> 5, "model" -> 6)
      .map { case (w, i) => s"WHEN '$w' THEN $i" }.mkString(" ")
    s"""SELECT doc_id, CAST(list_sum(list_transform(
       |  list_slice(string_split_regex(trim(lower(text)), '\\s+'), 1, 5),
       |  t -> CASE t $cases ELSE 0 END)) AS BIGINT) AS id_sum
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- exact quantiles (§2.4 quantile/percentile surface) -------------

  /** Exact continuous-interpolation percentiles per group — the
    * reference's quantile(q, 'linear') (inumerical_column.py:357-413).
    * Both engines interpolate linearly; rounding absorbs expression-
    * form fp noise. */
  def q28Percentiles(s: SparkSession, dir: String): DataFrame = {
    // one percentile() aggregate computes all three order statistics in
    // a single per-group pass; scalar output columns (the driver's
    // compare cannot hash list columns)
    val q = percentile($"l_extendedprice",
      array(lit(0.25), lit(0.5), lit(0.75)))
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(q.as("q"),
        round(percentile($"l_quantity", lit(0.9)), 4).as("qty_p90"))
      .select($"l_returnflag",
        round($"q".getItem(0), 4).as("p25"),
        round($"q".getItem(1), 4).as("p50"),
        round($"q".getItem(2), 4).as("p75"),
        $"qty_p90")
      .orderBy($"l_returnflag")
  }

  val q28Sql: String =
    """SELECT l_returnflag,
      |round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- bool reductions all/any at the gate (§2.4) ---------------------

  /** Grouped all/any (null-skipping bool reductions) — the reference's
    * col.all/col.any lifted through groupby. */
  def q35BoolAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        min(($"l_quantity" < 50).cast(BooleanType)).as("all_small"),
        max(($"l_discount" > 0.05).cast(BooleanType)).as("any_disc"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")

  val q35Sql: String =
    """SELECT l_returnflag, BOOL_AND(l_quantity < 50) AS all_small,
      |BOOL_OR(l_discount > 0.05) AS any_disc, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- IVF ANN (the second scale path beside LSH; rows-only:
  //      approximate by construction) --------------------------------

  /** Self-checking (round 8): (a) planted-twin guarantee — an exact
    * copy of each probe in the corpus must rank first (same IVF cell
    * by construction) — and (b) recall@10 vs the exact brute-force
    * ranking, raise_error below the pinned floor. The floor is the
    * deterministic measured result on this synthetic corpus
    * (0.52/0.52/0.56 at sf0.001/0.01/0.1 with the hash-ordered
    * quantizer sample, round 11): near-uniform vectors have no cluster
    * structure for the coarse quantizer to exploit, so nProbe/nCells =
    * 4/16 recall tracks the 25% scan fraction. On data WITH cluster
    * structure the sampling discipline is what separates working IVF
    * from noise — SimilaritySpec pins 1.00-vs-0.53 hash-vs-first-N.
    * See Queries2.annTwinCheck/annRecallCheck. */
  def q52KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val probes = emb.where($"vec_id" < 5)
    def run(corpus: DataFrame): DataFrame =
      graft.operators.Similarity.ivfTopK(corpus, probes, "embedding",
        "vec_id", "vec_id", k = 10, nCells = 16, nProbe = 4)
    val ivf = run(emb)
    val brute = graft.operators.Similarity.bruteForceTopK(emb, probes,
      "embedding", "vec_id", "vec_id", k = 10)
    ivf.select($"probe_id", $"id", $"rank")
      .crossJoin(broadcast(Queries2.annRecallCheck(ivf, brute, "q52", 0.50)))
      .crossJoin(broadcast(Queries2.annTwinCheck(run, emb, probes, "q52", 5)))
      .orderBy($"probe_id", $"rank")
  }

  // ---- streaming dedup (stateful dropDuplicates under readStream) -----

  /** Distinct (user, event_type) pairs computed by a real streaming
    * query with dropDuplicates state; oracle = batch SELECT DISTINCT. */
  def q81StreamDedup(s: SparkSession, dir: String): DataFrame =
    EventsStream.streamDedup(s, dir)

  val q81Sql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** TTL-bounded streaming dedup (dropDuplicatesWithinWatermark) —
    * bounded state under an unbounded stream; same distinct result as
    * q81 within the watermark, so the same batch oracle applies. */
  def q100StreamDedupTtl(s: SparkSession, dir: String): DataFrame =
    EventsStream.streamDedupTtl(s, dir)

  /** Stream-static join: events enriched with a broadcast customer
    * dimension under readStream; oracle = the batch join. */
  def q82StreamJoin(s: SparkSession, dir: String): DataFrame =
    EventsStream.streamStaticJoin(s, dir)

  val q82Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      |CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_asof_join" -> (q24AsofJoin _),
    "q25_rollup" -> (q25Rollup _),
    "q26_range_join" -> (q26RangeJoin _),
    "q27_rolling" -> (q27Rolling _),
    "q28_percentiles" -> (q28Percentiles _),
    "q29_udf_map" -> (q29UdfMap _),
    "q34_vocab_lookup" -> (q34VocabLookup _),
    "q35_bool_agg" -> (q35BoolAgg _),
    "q44_jaccard_exact" -> (q44JaccardExact _),
    "q52_knn_ivf" -> (q52KnnIvf _),
    "q81_stream_dedup" -> (q81StreamDedup _),
    "q100_stream_dedup_ttl" -> (q100StreamDedupTtl _),
    "q82_stream_join" -> (q82StreamJoin _)
  )

  val oracles: Map[String, String] = Map(
    "q24_asof_join" -> q24Sql,
    "q25_rollup" -> q25Sql,
    "q26_range_join" -> q26Sql,
    "q27_rolling" -> q27Sql,
    "q28_percentiles" -> q28Sql,
    "q29_udf_map" -> q29Sql,
    "q34_vocab_lookup" -> q34Sql,
    "q35_bool_agg" -> q35Sql,
    "q44_jaccard_exact" -> q44Sql,
    "q81_stream_dedup" -> q81Sql,
    "q100_stream_dedup_ttl" -> q81Sql,
    "q82_stream_join" -> q82Sql
  )
}

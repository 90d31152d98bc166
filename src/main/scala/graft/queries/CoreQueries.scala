package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.catalog.{FK, M2M, TableDef}
import graft.query.{Q, QuerySet}
import graft.eav.{F, FeatureStore}
import graft.artifact.Versions
import graft.lineage.Graph

/** Registry-semantics + TPC-H-shape queries over the driver's tables.
  *
  * Every entry returns a deterministic, explicitly-ordered DataFrame and
  * has a DuckDB oracle in `oracle` producing identical values. Numeric
  * aggregates go through DECIMAL so sums are exact and engine-independent,
  * then cast to DOUBLE for a stable output type.
  */
object CoreQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalized to session-TZ TIMESTAMP whatever the parquet
    * physical type: TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ (cast is
    * shift-free under the UTC session), while legacy TIMESTAMP(NANOS) —
    * which Spark's vectorized reader rejects — is read nanos-as-long and
    * converted with integer division (a double division would lose
    * microseconds at 1.7e18 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** TableDefs over the TPC-H-ish tables so the full lookup language
    * (FK/M2M traversal) runs against them.
    */
  def tpchEnv(spark: SparkSession, dir: String): QuerySet.MapEnv = {
    def df(n: String) = t(spark, dir, n)
    def td(name: String, pk: String, fks: Map[String, FK] = Map.empty,
           m2ms: Map[String, M2M] = Map.empty): (TableDef, DataFrame) = {
      val d = df(name)
      (TableDef(name, d.schema, fks = fks, m2ms = m2ms, pk = pk), d)
    }
    new QuerySet.MapEnv(Map(
      "region" -> td("region", "r_regionkey"),
      "nation" -> td("nation", "n_nationkey",
        fks = Map("region" -> FK("region", "region", "n_regionkey", "r_regionkey"))),
      "customer" -> td("customer", "c_custkey",
        fks = Map("nation" -> FK("nation", "nation", "c_nationkey", "n_nationkey")),
        m2ms = Map("orders" -> M2M("orders", "orders", "o_custkey", "o_orderkey", "orders"))),
      "supplier" -> td("supplier", "s_suppkey",
        fks = Map("nation" -> FK("nation", "nation", "s_nationkey", "n_nationkey"))),
      "part" -> td("part", "p_partkey"),
      "orders" -> td("orders", "o_orderkey",
        fks = Map("customer" -> FK("customer", "customer", "o_custkey", "c_custkey")),
        m2ms = Map("parts" -> M2M("parts", "lineitem", "l_orderkey", "l_partkey", "part"))),
      "lineitem" -> td("lineitem", "l_orderkey")
    ))
  }

  /** documents + a derived branch_id/uid so branch-visibility and uid
    * semantics are oracle-checkable from the base table alone.
    */
  private def docsWithBranch(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("branch_id", (col("doc_id") % 5 - 1).cast("long"))
      .withColumn("uid", md5(col("doc_id").cast("string")))

  /** documents + a derived space_id (1..4; 1 = the "all" space) so the
    * space default-visibility scoping (reference: Space,
    * `models/sqlrecord.py:1702`) is oracle-checkable from the base table
    * alone.
    */
  private def docsWithSpace(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("space_id", (col("doc_id") % 4 + 1).cast("long"))
      .withColumn("uid", md5(col("doc_id").cast("string")))

  // ------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_tpch_agg" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // exact scaled-long sums (see ExactSum): deterministic like the
          // decimal casts they replace, but primitive codegen arithmetic
          ExactSum.sumFixed(col("l_quantity"), 2).as("sum_qty"),
          ExactSum.sumFixed(col("l_extendedprice"), 2).as("sum_base_price"),
          ExactSum.sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_lookup_suite" -> ((spark, dir) => {
      tpchEnv(spark, dir).querySet("part")
        .filter(
          "p_name__contains" -> "bolt",
          "p_size__gte" -> 10,
          "p_type__in" -> Seq("ECONOMY", "PROMO"))
        .orderBy("p_partkey").df
    }),

    "q03_q_or_not" -> ((spark, dir) => {
      tpchEnv(spark, dir).querySet("customer")
        .filterQ(Q("c_mktsegment" -> "BUILDING") | Q("c_acctbal__gt" -> 9000))
        .excludeQ(Q("c_nationkey__in" -> Seq(1, 2, 3)))
        .orderBy("c_custkey").df
    }),

    "q04_fk_traversal" -> ((spark, dir) => {
      tpchEnv(spark, dir).querySet("customer")
        .filter("nation__region__r_name" -> "ASIA")
        .orderBy("c_custkey").df
    }),

    "q05_m2m_semi_join" -> ((spark, dir) => {
      tpchEnv(spark, dir).querySet("orders")
        .filter("parts__p_type" -> "PROMO", "o_orderstatus" -> "O")
        .orderBy("o_orderkey").df
    }),

    "q06_anti_join" -> ((spark, dir) => {
      tpchEnv(spark, dir).querySet("customer")
        .excludeQ(Q("orders__o_totalprice__gt" -> 400000))
        .orderBy("c_custkey").df
    }),

    "q07_branch_injection" -> ((spark, dir) => {
      QuerySet.over(docsWithBranch(spark, dir), "documents", pk = "doc_id")
        .filter("lang" -> "en")
        .orderBy("doc_id").df
        .select("doc_id", "lang", "branch_id", "n_chars")
    }),

    "q08_branch_bypass_uid" -> ((spark, dir) => {
      // exact uid/id/hash keys bypass branch-default injection
      // (`query_set.py:273-293`): doc 3 sits on branch 2 (invisible by
      // default) yet is returned when addressed by uid
      QuerySet.over(docsWithBranch(spark, dir), "documents", pk = "doc_id", uidLen = 32)
        .filter("uid" -> "eccbc87e4b5ce2fe28308fd9f2a7baf3")
        .orderBy("doc_id").df
        .select("doc_id", "uid", "branch_id")
    }),

    "q28_space_injection" -> ((spark, dir) => {
      // default read scopes to the "all" space (id 1) plus granted
      // spaces (here: space 3) — the default-visibility convenience over
      // Space (`models/sqlrecord.py:1702`), mirroring branch injection
      QuerySet.over(docsWithSpace(spark, dir), "documents", pk = "doc_id",
          visibleSpaceIds = Seq(1L, 3L))
        .filter("lang" -> "en")
        .orderBy("doc_id").df
        .select("doc_id", "lang", "space_id", "n_chars")
    }),

    "q29_space_bypass" -> ((spark, dir) => {
      // an explicit space filter replaces the default scope, exactly like
      // branch (q07/q08): space 2 is outside the default grant yet its
      // rows return when addressed directly — deliberate convenience
      // semantics, weaker than the reference's non-bypassable RLS (see
      // QuerySet.spaceInjection doc)
      QuerySet.over(docsWithSpace(spark, dir), "documents", pk = "doc_id")
        .filter("space" -> 2L, "lang" -> "en")
        .orderBy("doc_id").df
        .select("doc_id", "lang", "space_id")
    }),

    "q09_search_rank" -> ((spark, dir) => {
      tpchEnv(spark, dir).querySet("part")
        .search("red", fields = Seq("p_name", "p_type"), limit = 20)
        .select("p_partkey", "p_name", "rank")
    }),

    "q24_search_truncated" -> ((spark, dir) => {
      // suggest-mode fuzzy search: query loses its final 20% and the name
      // field gains a startswith x2 rank term (query_manager.py:99-163)
      graft.query.Search.rank(t(spark, dir, "part"), "widget",
          Seq("p_name", "p_type"), limit = 20,
          caseSensitive = false, pk = "p_partkey",
          truncateString = true, nameField = Some("p_name"))
        .select("p_partkey", "p_name", "rank")
    }),

    "q47_suggest_similar" -> ((spark, dir) => {
      // suggest_records_with_similar_names (sqlrecord.py:608-650): an
      // exact name hit returns the record and NO suggestions; a miss
      // runs the truncated fuzzy search (q24's mode) and proposes up to
      // 3 similar records. Replayed over fixed probes spanning an exact
      // hit, a plural near-miss, and a prefix typo.
      import spark.implicits._
      val qs = tpchEnv(spark, dir).querySet("part")
      val rows = suggestProbes.flatMap { p =>
        val (exact, similar) = qs.suggestSimilarNames("p_name", p)
        exact.map(r => (p, "exact", 1L, r.getAs[String]("p_name"))).toSeq ++
          similar.zipWithIndex.map { case (s, i) => (p, "similar", i + 1L, s) }
      }
      rows.toDF("probe", "kind", "pos", "name").orderBy("probe", "kind", "pos")
    }),

    "q26_asof_join" -> ((spark, dir) => {
      // backward as-of: each click matched to the user's most recent
      // prior-or-equal error event — one user_id shuffle, no range join
      val ev = events(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("err_id"),
          col("value").as("err_value"))
      graft.ext.AsOfJoin.asOf(clicks, errors, "user_id", "ts", "ts",
          Seq("err_id", "err_value"))
        .select("event_id", "user_id", "asof_err_id", "asof_err_value")
        .orderBy("event_id")
    }),

    "q27_range_join" -> ((spark, dir) => {
      // point-in-interval: clicks falling inside any [error_ts,
      // error_ts + 2h] window of the same user — bucketed so the range
      // predicate joins as (user_id, bucket) equi-keys
      val ev = events(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val windows = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
      graft.ext.RangeJoin.pointInInterval(clicks, windows, "user_id",
          "ts", "start_ts", "end_ts", bucketWidthSec = 7200L)
        .select("click_id", "error_id", "user_id")
        .orderBy("click_id", "error_id")
    }),

    "q25_quantiles" -> ((spark, dir) => {
      // exact interpolated percentiles (both engines use linear
      // interpolation) + exact distinct counts per group, on the
      // split plan (no Expand, no ObjectHashAggregate sort fallback —
      // see Sketches.exactGroupStats)
      graft.ext.Sketches
        .exactGroupStats(t(spark, dir, "documents"),
          "lang", "source", "n_chars", Seq(0.5, 0.9))
        .select(col("lang"), col("n_distinct").as("n_sources"),
          round(col("q").getItem(0), 6).as("median_chars"),
          round(col("q").getItem(1), 6).as("p90_chars"))
        .orderBy("lang")
    }),

    "q32_include_annotation" -> ((spark, dir) => {
      // to_dataframe(include=[...]) annotation (`query_set.py:1191-1260`):
      // an FK path lands as a single-valued column, an M2M path as a
      // sorted per-row set (stringified for the compare, like q16)
      val included = tpchEnv(spark, dir).querySet("customer")
        .filter("c_mktsegment" -> "BUILDING")
        .withIncluded(Seq("nation__n_name", "orders__o_orderkey"))
      included
        .withColumn("order_keys",
          array_join(transform(col("orders__o_orderkey"), _.cast("string")), "|"))
        .select(col("c_custkey"), col("nation__n_name").as("nation_name"), col("order_keys"))
        .orderBy("c_custkey")
    }),

    "q10_is_latest_window" -> ((spark, dir) => {
      Versions.markLatest(t(spark, dir, "orders"), col("o_custkey"), col("o_orderkey"))
        .select("o_custkey", "o_orderkey", "is_latest")
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q11_eav_filter" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      val store = docFeatureStore(spark, docs)
      store.filter(docs, "doc_id", F("n_chars") > 300, F("lang") === "en")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "q12_eav_pivot" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      val store = docFeatureStore(spark, docs)
      store.pivotWide(docs, "doc_id").orderBy("doc_id")
    }),

    "q13_eav_feature_ne" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      val store = docFeatureStore(spark, docs)
      store.filter(docs, "doc_id", F("source") =!= "src3")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    "q36_feature_isnull" -> ((spark, dir) => {
      // isnull = anti-join against the feature's value rows: docs that
      // never got a `title` value (the reference's exclusion semantics)
      val docs = t(spark, dir, "documents")
      sparseCatFeatureStore(spark, docs)
        .filter(docs, "doc_id", F("title").isNull)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    "q37_feature_categorical" -> ((spark, dir) => {
      // categorical feature: the value resolves through the label
      // registry then the link table, not the JSON value rows
      val docs = t(spark, dir, "documents")
      sparseCatFeatureStore(spark, docs)
        .filter(docs, "doc_id", F("topic") === "src3")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    "q44_lookup_namespace" -> ((spark, dir) => {
      // Registry.lookup(): all rows keyed by a field, keys normalized to
      // python identifiers ('-' -> '_'), last-in wins on duplicates —
      // with a deterministic ascending order, last-in = max(doc_id)
      import spark.implicits._
      val d = t(spark, dir, "documents")
        .withColumn("key", concat_ws("-", col("source"), col("lang")))
      val m = QuerySet.over(d, "documents", pk = "doc_id")
        .orderBy("doc_id")
        .lookup("key", pythonic = true)
      m.toSeq.map { case (k, r) => (k, r.getAs[Long]("doc_id")) }
        .toDF("key", "doc_id").orderBy("key")
    }),

    "q45_field_error" -> ((spark, dir) => {
      // unknown-field suggestion: the FieldError message enumerates the
      // available fields (sorted) — pinned verbatim against the oracle
      import spark.implicits._
      val qs = QuerySet.over(t(spark, dir, "documents"), "documents", pk = "doc_id")
      Seq("langg", "source_id").map { f =>
        val msg =
          try { qs.filter(f -> 1).df.head(1); "no error" }
          catch { case e: graft.query.FieldError => e.getMessage }
        (f, msg)
      }.toDF("probe", "message").orderBy("probe")
    }),

    "q14_bfs_lineage" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      val edges = docs.filter(col("doc_id") >= 1)
        .select(floor((col("doc_id") - 1) / 2).cast("long").as("parent"),
          col("doc_id").as("child"))
      val start = docs.sparkSession.range(0, 1).select(col("id").as("node"))
      Graph.descendants(edges, start, "parent", "child", maxDepth = 3)
        .select(col("node"), col("depth").cast("long").as("depth"))
        .orderBy("node")
    }),

    "q15_union_outer" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"))
        .withColumn("src", lit("customer"))
      val s = t(spark, dir, "supplier")
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
          col("s_nationkey").cast("long").as("nation_id"))
        .withColumn("src", lit("supplier"))
      c.unionByName(s, allowMissingColumns = true).orderBy("src", "id")
    }),

    "q16_group_collect_set" -> ((spark, dir) => {
      t(spark, dir, "documents").groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          array_join(sort_array(collect_set(col("source"))), "|").as("sources"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    "q17_topk" -> ((spark, dir) => {
      t(spark, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    "q18_json_extract" -> ((spark, dir) => {
      events(spark, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    }),

    "q19_window_tumbling" -> ((spark, dir) => {
      events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          ExactSum.sumFixed(col("value"), 6).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    "q23_filtered_annotate" -> ((spark, dir) => {
      // FilteredRelation semantics: label branch visibility is a JOIN
      // predicate, not a post-filter — docs whose labels are all hidden
      // still appear with an empty label set
      val docs = t(spark, dir, "documents")
      val srcLabels = docs.select(col("source").as("name")).distinct()
        .withColumn("branch_id",
          (expr("CAST(substr(name, 4, 10) AS INT)") % 5 - 1).cast("long"))
      val langLabels = docs.select(col("lang").as("name")).distinct()
        .withColumn("branch_id", lit(1L))
      val labels = srcLabels.unionByName(langLabels)
      val links = docs.select(col("doc_id"), col("source").as("label_name"))
        .unionByName(docs.select(col("doc_id"), col("lang").as("label_name")))
      graft.eav.Annotate.labels(docs.select("doc_id"), "doc_id",
          links, "doc_id", "label_name", labels, "name", "name")
        .select(col("doc_id"), array_join(col("labels"), "|").as("labels"))
        .orderBy("doc_id")
    }),

    "q20_date_parts" -> ((spark, dir) => {
      t(spark, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("order_year")
    })
  )

  /** documents EAV long form: n_chars (num), lang (str), source (str) —
    * JSON-encoded values exactly like the reference's RecordJson rows.
    */
  private def docFeatureStore(spark: SparkSession, docs: DataFrame): FeatureStore = {
    import spark.implicits._
    val features = Seq((1L, "lang", "str"), (2L, "n_chars", "num"), (3L, "source", "str"))
      .toDF("id", "name", "dtype")
    val values = docs.select(col("doc_id").as("record_id"), lit(2L).as("feature_id"),
        col("n_chars").cast("string").as("value_json"))
      .unionByName(docs.select(col("doc_id").as("record_id"), lit(1L).as("feature_id"),
        concat(lit("\""), col("lang"), lit("\"")).as("value_json")))
      .unionByName(docs.select(col("doc_id").as("record_id"), lit(3L).as("feature_id"),
        concat(lit("\""), col("source"), lit("\"")).as("value_json")))
    new FeatureStore(features, values)
  }

  /** docFeatureStore + a SPARSE `title` feature (only doc_id % 3 == 0
    * carries it) and a CATEGORICAL `topic` feature whose labels are the
    * source names, linked through a label-link table — the full EAV
    * surface (`_feature_manager.py:934-971`).
    */
  private def sparseCatFeatureStore(spark: SparkSession, docs: DataFrame): FeatureStore = {
    import spark.implicits._
    val features = Seq(
      (1L, "lang", "str"), (2L, "n_chars", "num"), (3L, "source", "str"),
      (4L, "title", "str"), (5L, "topic", "cat[ULabel]"))
      .toDF("id", "name", "dtype")
    val values = docs.select(col("doc_id").as("record_id"), lit(2L).as("feature_id"),
        col("n_chars").cast("string").as("value_json"))
      .unionByName(docs.select(col("doc_id").as("record_id"), lit(1L).as("feature_id"),
        concat(lit("\""), col("lang"), lit("\"")).as("value_json")))
      .unionByName(docs.select(col("doc_id").as("record_id"), lit(3L).as("feature_id"),
        concat(lit("\""), col("source"), lit("\"")).as("value_json")))
      .unionByName(docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("record_id"), lit(4L).as("feature_id"),
          concat(lit("\"t"), col("doc_id").cast("string"), lit("\"")).as("value_json")))
    val labels = docs.select(col("source").as("name")).distinct()
      .withColumn("id", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("name")).cast("long"))
    val links = docs.select(col("doc_id").as("record_id"), col("source"))
      .join(labels.select(col("id").as("label_id"), col("name").as("source")), "source")
      .select(col("record_id"), lit(5L).as("feature_id"), col("label_id"))
    new FeatureStore(features, values, Some(links), Some(labels))
  }

  // -------------------------------------------------------------- oracles

  /** q47 probes + the reference's truncation rule (drop the final 20%
    * of a query longer than 5 chars, `query_manager.py:99-103`) —
    * shared by the Spark query and the generated oracle SQL so both
    * replay the same rule on the same literals.
    */
  private val suggestProbes = Seq("red widget", "red widgets", "large bol")
  private def truncatedQuery(q: String): String =
    (if (q.length > 5) q.substring(0, (q.length * 0.8).toInt) else q).strip()

  /** DuckDB SQL mirror of `Search.rankColumn` for literal query strings
    * (no regex metacharacters).
    */
  def searchRankSql(fields: Seq[String], query: String): (String, String) = {
    val lq = query.trim.toLowerCase
    def fe(f: String) = s"coalesce(CAST($f AS VARCHAR), '')"
    def rx(f: String, pat: String, w: Int) =
      s"(CASE WHEN regexp_matches(${fe(f)}, '$pat') THEN $w ELSE 0 END)"
    val rankTerms = fields.flatMap { f =>
      Seq(
        s"(CASE WHEN lower(${fe(f)}) = '$lq' THEN 200 ELSE 0 END)",
        rx(f, "(?i)(?:^|.*\\|)" + query + "(?:\\|.*|$)", 200),
        rx(f, "(?i)(?:^|.*[ \\|\\.,;:])" + query + "(?:[ \\|\\.,;:].*|$)", 10),
        rx(f, "(?i)(?:^|.*\\|)" + query + "[^ ]*(?:\\|.*|$)", 8),
        rx(f, "(?i)(?:^|.*[ \\|])" + query + ".*", 2),
        rx(f, "(?i).*" + query + "(?:$|[ \\|\\.,;:].*)", 2),
        s"(CASE WHEN contains(lower(${fe(f)}), '$lq') THEN 1 ELSE 0 END)")
    }
    val prefilter = fields.map(f => s"contains(lower(${fe(f)}), '$lq')").mkString(" OR ")
    (rankTerms.mkString(" + "), prefilter)
  }

  val oracle: Map[String, String] = {
    val (rankExpr, prefilter) = searchRankSql(Seq("p_name", "p_type"), "red")
    // truncated mode: "widget" -> first 80% = "widg", plus name startswith x2
    val (trRank, trPre) = searchRankSql(Seq("p_name", "p_type"), "widg")
    val trExpr = trRank +
      " + (CASE WHEN lower(coalesce(CAST(p_name AS VARCHAR), '')) LIKE 'widg%' THEN 2 ELSE 0 END)"
    // q47: per probe — the exact-name hit (pk-ordered first()) XOR the
    // truncated fuzzy top-3 (same rank SQL as q24 + the name-startswith
    // x2 bonus), both replayed verbatim
    val suggestSql = suggestProbes.map { p =>
      val tq = truncatedQuery(p)
      val (rk, pre) = searchRankSql(Seq("p_name"), tq)
      val rkx = rk + s" + (CASE WHEN lower(coalesce(CAST(p_name AS VARCHAR), ''))" +
        s" LIKE '${tq.toLowerCase}%' THEN 2 ELSE 0 END)"
      s"""SELECT * FROM (
         |  SELECT '$p' AS probe, 'exact' AS kind, CAST(1 AS BIGINT) AS pos, p_name AS name
         |  FROM part WHERE p_name = '$p' ORDER BY p_partkey LIMIT 1)
         |UNION ALL
         |SELECT '$p' AS probe, 'similar' AS kind,
         |  CAST(row_number() OVER (ORDER BY rank DESC, p_partkey) AS BIGINT) AS pos,
         |  p_name AS name
         |FROM (SELECT p_partkey, p_name, CAST($rkx AS INT) AS rank FROM part WHERE $pre
         |      ORDER BY rank DESC, p_partkey LIMIT 3) s
         |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_name = '$p')""".stripMargin
    }.mkString("SELECT probe, kind, pos, name FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY probe, kind, pos")
    Map(
      "q47_suggest_similar" -> suggestSql,

      "q24_search_truncated" ->
        s"""SELECT p_partkey, p_name, CAST($trExpr AS INT) AS rank
           |FROM part WHERE $trPre
           |ORDER BY rank DESC, p_partkey LIMIT 20""".stripMargin,
      "q01_tpch_agg" ->
        s"""SELECT l_returnflag, l_linestatus,
          |  ${ExactSum.sumFixedSql("l_quantity", 2)} AS sum_qty,
          |  ${ExactSum.sumFixedSql("l_extendedprice", 2)} AS sum_base_price,
          |  ${ExactSum.sumRevenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
          |  count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q02_lookup_suite" ->
        """SELECT * FROM part
          |WHERE p_name LIKE '%bolt%' AND p_size >= 10 AND p_type IN ('ECONOMY','PROMO')
          |ORDER BY p_partkey""".stripMargin,

      "q03_q_or_not" ->
        """SELECT * FROM customer
          |WHERE (c_mktsegment = 'BUILDING' OR c_acctbal > 9000)
          |  AND NOT (c_nationkey IN (1, 2, 3))
          |ORDER BY c_custkey""".stripMargin,

      "q04_fk_traversal" ->
        """SELECT c.* FROM customer c
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |JOIN region r ON n.n_regionkey = r.r_regionkey
          |WHERE r.r_name = 'ASIA' ORDER BY c.c_custkey""".stripMargin,

      "q05_m2m_semi_join" ->
        """SELECT * FROM orders
          |WHERE o_orderkey IN (
          |  SELECT l_orderkey FROM lineitem WHERE l_partkey IN (
          |    SELECT p_partkey FROM part WHERE p_type = 'PROMO'))
          |  AND o_orderstatus = 'O'
          |ORDER BY o_orderkey""".stripMargin,

      "q06_anti_join" ->
        """SELECT * FROM customer
          |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin,

      "q07_branch_injection" ->
        """SELECT doc_id, lang, CAST(doc_id % 5 - 1 AS BIGINT) AS branch_id, n_chars
          |FROM documents WHERE lang = 'en' AND (doc_id % 5 - 1) = 1
          |ORDER BY doc_id""".stripMargin,

      "q08_branch_bypass_uid" ->
        """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS uid, CAST(doc_id % 5 - 1 AS BIGINT) AS branch_id
          |FROM documents WHERE md5(CAST(doc_id AS VARCHAR)) = 'eccbc87e4b5ce2fe28308fd9f2a7baf3'
          |ORDER BY doc_id""".stripMargin,

      "q28_space_injection" ->
        """SELECT doc_id, lang, CAST(doc_id % 4 + 1 AS BIGINT) AS space_id, n_chars
          |FROM documents WHERE lang = 'en' AND (doc_id % 4 + 1) IN (1, 3)
          |ORDER BY doc_id""".stripMargin,

      "q29_space_bypass" ->
        """SELECT doc_id, lang, CAST(doc_id % 4 + 1 AS BIGINT) AS space_id
          |FROM documents WHERE lang = 'en' AND (doc_id % 4 + 1) = 2
          |ORDER BY doc_id""".stripMargin,

      "q09_search_rank" ->
        s"""SELECT p_partkey, p_name, CAST($rankExpr AS INT) AS rank
           |FROM part WHERE $prefilter
           |ORDER BY rank DESC, p_partkey LIMIT 20""".stripMargin,

      "q26_asof_join" ->
        """SELECT l.event_id, l.user_id, r.event_id AS asof_err_id, r.value AS asof_err_value
          |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
          |ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error') r
          |  ON l.user_id = r.user_id AND l.ts >= r.ts
          |ORDER BY l.event_id""".stripMargin,

      "q27_range_join" ->
        """SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id
          |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
          |JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
          |  ON c.user_id = e.user_id
          |  AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 2 HOUR
          |ORDER BY click_id, error_id""".stripMargin,

      "q25_quantiles" ->
        """SELECT lang, count(DISTINCT source) AS n_sources,
          |  round(quantile_cont(n_chars, 0.5), 6) AS median_chars,
          |  round(quantile_cont(n_chars, 0.9), 6) AS p90_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q32_include_annotation" ->
        """WITH ord AS (
          |  SELECT o_custkey,
          |         array_to_string(list_sort(list(DISTINCT o_orderkey)), '|') AS order_keys
          |  FROM orders GROUP BY o_custkey)
          |SELECT c.c_custkey, n.n_name AS nation_name, o.order_keys
          |FROM customer c
          |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
          |LEFT JOIN ord o ON c.c_custkey = o.o_custkey
          |WHERE c.c_mktsegment = 'BUILDING'
          |ORDER BY c.c_custkey""".stripMargin,

      "q36_feature_isnull" ->
        """SELECT doc_id, lang FROM documents
          |WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,

      "q37_feature_categorical" ->
        """SELECT doc_id, source FROM documents
          |WHERE source = 'src3' ORDER BY doc_id""".stripMargin,

      "q44_lookup_namespace" ->
        """SELECT replace(source || '-' || lang, '-', '_') AS key,
          |       max(doc_id) AS doc_id
          |FROM documents GROUP BY source, lang ORDER BY key""".stripMargin,

      "q45_field_error" ->
        """SELECT * FROM (VALUES
          |  ('langg', 'Unknown field ''langg'' for documents. ' ||
          |   'Available: doc_id, lang, n_chars, source, text.'),
          |  ('source_id', 'Unknown field ''source_id'' for documents. ' ||
          |   'Available: doc_id, lang, n_chars, source, text.'))
          |  AS t(probe, message)
          |ORDER BY probe""".stripMargin,

      "q10_is_latest_window" ->
        """SELECT o_custkey, o_orderkey,
          |  (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1) AS is_latest
          |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

      "q11_eav_filter" ->
        """SELECT doc_id, lang, n_chars FROM documents
          |WHERE n_chars > 300 AND lang = 'en' ORDER BY doc_id""".stripMargin,

      "q12_eav_pivot" ->
        """SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS n_chars, source
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q13_eav_feature_ne" ->
        """SELECT doc_id, source FROM documents
          |WHERE NOT (source = 'src3') ORDER BY doc_id""".stripMargin,

      "q14_bfs_lineage" ->
        """WITH RECURSIVE r(node, depth) AS (
          |  SELECT CAST(0 AS BIGINT), 0
          |  UNION ALL
          |  SELECT d.doc_id, r.depth + 1 FROM r
          |  JOIN documents d ON (d.doc_id - 1) // 2 = r.node AND d.doc_id >= 1
          |  WHERE r.depth < 3)
          |SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM r GROUP BY node ORDER BY node""".stripMargin,

      "q15_union_outer" ->
        """SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
          |       'customer' AS src, NULL AS nation_id
          |FROM customer
          |UNION ALL
          |SELECT s_suppkey AS id, s_name AS name, NULL AS acctbal,
          |       'supplier' AS src, CAST(s_nationkey AS BIGINT) AS nation_id
          |FROM supplier
          |ORDER BY src, id""".stripMargin,

      "q16_group_collect_set" ->
        """SELECT lang, count(*) AS n_docs,
          |  array_to_string(list_sort(list(DISTINCT source)), '|') AS sources,
          |  CAST(sum(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q17_topk" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,

      "q18_json_extract" ->
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q19_window_tumbling" ->
        s"""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
          |  ${ExactSum.sumFixedSql("value", 6)} AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

      "q23_filtered_annotate" ->
        """WITH labels AS (
          |  SELECT DISTINCT source AS name,
          |    CAST(substr(source, 4) AS INTEGER) % 5 - 1 AS branch_id
          |  FROM documents
          |  UNION ALL
          |  SELECT DISTINCT lang, 1 FROM documents),
          |links AS (
          |  SELECT doc_id, source AS name FROM documents
          |  UNION ALL SELECT doc_id, lang FROM documents),
          |vis AS (SELECT name FROM labels WHERE branch_id = 1),
          |ann AS (SELECT l.doc_id, list_sort(list(DISTINCT l.name)) AS ls
          |        FROM links l JOIN vis USING (name) GROUP BY l.doc_id)
          |SELECT d.doc_id, coalesce(array_to_string(a.ls, '|'), '') AS labels
          |FROM documents d LEFT JOIN ann a USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      "q20_date_parts" ->
        """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, count(*) AS n_orders,
          |  count(DISTINCT o_custkey) AS n_customers
          |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin
    )
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.curate.{Curate, SchemaValidator}

/** Curation-layer queries (SURVEY §2.11): membership validation, synonym
  * standardization, from_values split, categorical schema violations —
  * each oracle-checkable because registries and synonym dictionaries are
  * derived from the driver's base tables.
  */
object CurateQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** region registry with synonyms "lower|UNDERSCORED" (pipe field like
    * the reference's `synonyms`).
    */
  private def regionRegistry(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region").select(
      col("r_name").as("name"),
      concat_ws("|", lower(col("r_name")), regexp_replace(col("r_name"), " ", "_")).as("synonyms"))

  /** c07's fixture: the curation MUTATION set end-to-end
    * (`curators/core.py:834-881` standardize, `CatVector.standardize`
    * `:1505-2028`, `DataFrameCatManager.add_new`) — a lang registry with
    * uppercase synonyms; a dataset column where doc_id%7 rows carry an
    * unknown `x`-prefixed lang and the remaining doc_id%3 rows an
    * uppercase synonym form; `standardizeDataset` fills the missing
    * `quality` column with its schema default, `standardizeColumn` maps
    * the synonym forms back in place, `addNew` registers the leftover
    * unknowns. Cached per sf dir: the registry mutates exactly once.
    */
  private val mutCat = scala.collection.concurrent.TrieMap
    .empty[String, (graft.catalog.Catalog, DataFrame)]

  private def mutationFixture(spark: SparkSession, dir: String)
      : (graft.catalog.Catalog, DataFrame) =
    mutCat.getOrElseUpdate(dir, {
      val root = LifecycleQueries.TempRoot.dir("graft_cur")
      val cat = graft.catalog.Catalog.deterministic(spark, root)
      val d = t(spark, dir, "documents")
      d.select("lang").distinct().orderBy("lang").collect().map(_.getString(0))
        .foreach(l => cat.insert("ulabel",
          Map("name" -> l, "synonyms" -> l.toUpperCase)): Unit)
      val messy = d.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(lit("x"), col("lang")))
          .when(col("doc_id") % 3 === 0, upper(col("lang")))
          .otherwise(col("lang")).as("lang"))
      val spec = graft.curate.SchemaSpec(Seq(
        graft.curate.FeatureSpec("doc_id", "int"),
        graft.curate.FeatureSpec("lang", "str"),
        graft.curate.FeatureSpec("quality", "num")))
      val conformed = Curate.standardizeDataset(messy, spec, Map("quality" -> 1.0))
      val std = Curate.standardizeColumn(conformed, "lang", cat.table("ulabel"), "name")
      val created = Curate.addNew(std, "lang", cat, "ulabel")
      require(created.nonEmpty, "add_new must register the unknown values")
      (cat, std)
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c07_curate_mutations" -> ((spark, dir) => {
      // end state of the mutation pipeline: per-value counts of the
      // standardized column (synonym forms folded back, unknowns passed
      // through) with the schema-default quality sum riding along, plus
      // the registry after add_new
      val (cat, std) = mutationFixture(spark, dir)
      val colAgg = std.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("quality")).as("q"))
        .select(lit("col").as("kind"), col("lang").as("value"), col("n"), col("q"))
      val regRows = cat.table("ulabel").select(
        lit("reg").as("kind"), col("name").as("value"),
        lit(1L).as("n"), lit(null).cast("double").as("q"))
      colAgg.unionByName(regRows).orderBy("kind", "value")
    }),

    "c01_validate" -> ((spark, dir) => {
      val values = t(spark, dir, "part").select(col("p_type").as("value")).distinct()
        .unionByName(Seq("PLASTIC", "WOODEN").toDF(spark)("value"))
      val registry = t(spark, dir, "part").filter(col("p_size") >= 20)
      Curate.validate(values, "value", registry, "p_type")
        .orderBy("value")
    }),

    "c02_standardize" -> ((spark, dir) => {
      val region = t(spark, dir, "region")
      val values = region.select(lower(col("r_name")).as("value"))
        .unionByName(region.select(col("r_name").as("value")))
        .unionByName(Seq("atlantis").toDF(spark)("value"))
      Curate.standardize(values, "value", regionRegistry(spark, dir), "name")
        .orderBy("value", "standardized")
    }),

    "c03_from_values" -> ((spark, dir) => {
      // existing vs creatable split over region names + synonyms + unknowns
      val region = t(spark, dir, "region")
      val values = region.select(lower(col("r_name")).as("value"))
        .unionByName(Seq("atlantis", "lemuria").toDF(spark)("value"))
      val r = Curate.fromValues(values, "value", regionRegistry(spark, dir), "name")
      r.existing.select(col("name").as("value"), lit("existing").as("status"))
        .unionByName(r.creatable.select(col("value"), lit("creatable").as("status")))
        .orderBy("status", "value")
    }),

    "c05_inspect_buckets" -> ((spark, dir) => {
      val region = t(spark, dir, "region")
      val values = region.select(lower(col("r_name")).as("value"))
        .unionByName(region.select(col("r_name").as("value")))
        .unionByName(Seq("atlantis").toDF(spark)("value"))
      Curate.inspectBuckets(values, "value", regionRegistry(spark, dir), "name")
        .select("value", "bucket")
        .orderBy("bucket", "value")
    }),

    "c06_inspect_public" -> ((spark, dir) => {
      // fresh-instance scenario: the instance registry knows only regions
      // 0-2; the public ontology (all regions + synonyms) catches the
      // rest as creatable-from-public; atlantis stays truly unknown
      val region = t(spark, dir, "region")
      val instance = regionRegistry(spark, dir)
        .join(region.filter(col("r_regionkey") < 3).select(col("r_name").as("name")),
          Seq("name"), "left_semi")
      val values = region.select(lower(col("r_name")).as("value"))
        .unionByName(region.select(col("r_name").as("value")))
        .unionByName(Seq("atlantis").toDF(spark)("value"))
      Curate.inspectBucketsWithPublic(values, "value",
          instance, "name", regionRegistry(spark, dir), "name")
        .select("value", "bucket")
        .orderBy("bucket", "value")
    }),

    "c04_cat_violations" -> ((spark, dir) => {
      // schema allows only three segments: the other two must be reported
      // as non-validated values with counts (ValidationError listing)
      val customers = t(spark, dir, "customer")
      val allowed = Seq("BUILDING", "MACHINERY", "FURNITURE").toDF(spark)("segment")
      SchemaValidator.catViolations(customers, "c_mktsegment", allowed, "segment")
    })
  )

  private implicit class SeqToDF(s: Seq[String]) {
    def toDF(spark: SparkSession)(colName: String): DataFrame = {
      val session = spark
      import session.implicits._
      localSeqToDatasetHolder(s).toDF(colName)
    }
  }

  val oracle: Map[String, String] = Map(
    "c07_curate_mutations" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 THEN 'x' || lang
        |              ELSE lang END AS value
        |  FROM documents),
        |colagg AS (
        |  SELECT 'col' AS kind, value, count(*) AS n,
        |         CAST(count(*) AS DOUBLE) AS q
        |  FROM m GROUP BY value),
        |reg AS (
        |  SELECT 'reg' AS kind, value, CAST(1 AS BIGINT) AS n,
        |         CAST(NULL AS DOUBLE) AS q
        |  FROM (SELECT DISTINCT lang AS value FROM documents
        |        UNION
        |        SELECT DISTINCT 'x' || lang FROM documents WHERE doc_id % 7 = 0))
        |SELECT kind, value, n, q FROM colagg
        |UNION ALL SELECT kind, value, n, q FROM reg
        |ORDER BY kind, value""".stripMargin,

    "c01_validate" ->
      """WITH vals AS (
        |  SELECT DISTINCT p_type AS value FROM part
        |  UNION ALL SELECT 'PLASTIC' UNION ALL SELECT 'WOODEN'),
        |reg AS (SELECT DISTINCT p_type FROM part WHERE p_size >= 20)
        |SELECT value, value IN (SELECT p_type FROM reg) AS validated
        |FROM vals ORDER BY value""".stripMargin,

    "c02_standardize" ->
      """WITH reg AS (
        |  SELECT r_name AS name,
        |         lower(r_name) || '|' || replace(r_name, ' ', '_') AS synonyms
        |  FROM region),
        |dict AS (
        |  SELECT name, name AS synonym, 0 AS prio FROM reg
        |  UNION ALL
        |  SELECT name, unnest(string_split(synonyms, '|')) AS synonym, 1 AS prio FROM reg),
        |best AS (
        |  SELECT synonym, min(prio || ':' || name) AS tagged FROM dict GROUP BY synonym),
        |vals AS (
        |  SELECT lower(r_name) AS value FROM region
        |  UNION ALL SELECT r_name FROM region
        |  UNION ALL SELECT 'atlantis')
        |SELECT value,
        |  coalesce((SELECT substr(b.tagged, 3) FROM best b WHERE b.synonym = vals.value), value)
        |    AS standardized
        |FROM vals ORDER BY value, standardized""".stripMargin,

    "c03_from_values" ->
      """WITH reg AS (
        |  SELECT r_name AS name,
        |         lower(r_name) || '|' || replace(r_name, ' ', '_') AS synonyms
        |  FROM region),
        |dict AS (
        |  SELECT name, name AS synonym FROM reg
        |  UNION ALL
        |  SELECT name, unnest(string_split(synonyms, '|')) AS synonym FROM reg),
        |vals AS (
        |  SELECT lower(r_name) AS value FROM region
        |  UNION ALL SELECT 'atlantis' UNION ALL SELECT 'lemuria')
        |SELECT DISTINCT d.name AS value, 'existing' AS status
        |FROM vals v JOIN dict d ON v.value = d.synonym
        |UNION ALL
        |SELECT DISTINCT v.value, 'creatable' AS status
        |FROM vals v WHERE v.value NOT IN (SELECT synonym FROM dict)
        |ORDER BY status, value""".stripMargin,

    "c05_inspect_buckets" ->
      """WITH reg AS (
        |  SELECT r_name AS name,
        |         lower(r_name) || '|' || replace(r_name, ' ', '_') AS synonyms
        |  FROM region),
        |syn AS (SELECT unnest(string_split(synonyms, '|')) AS synonym FROM reg),
        |vals AS (
        |  SELECT lower(r_name) AS value FROM region
        |  UNION ALL SELECT r_name FROM region
        |  UNION ALL SELECT 'atlantis')
        |SELECT value,
        |  CASE WHEN value IN (SELECT name FROM reg) THEN 'validated'
        |       WHEN value IN (SELECT synonym FROM syn) THEN 'synonym_match'
        |       ELSE 'nonvalidated' END AS bucket
        |FROM vals ORDER BY bucket, value""".stripMargin,

    "c06_inspect_public" ->
      """WITH pub AS (
        |  SELECT r_name AS name,
        |         lower(r_name) || '|' || replace(r_name, ' ', '_') AS synonyms
        |  FROM region),
        |inst AS (SELECT * FROM pub WHERE name IN
        |  (SELECT r_name FROM region WHERE r_regionkey < 3)),
        |instsyn AS (SELECT unnest(string_split(synonyms, '|')) AS synonym FROM inst),
        |pubkeys AS (
        |  SELECT name AS k FROM pub
        |  UNION ALL SELECT unnest(string_split(synonyms, '|')) FROM pub),
        |vals AS (
        |  SELECT lower(r_name) AS value FROM region
        |  UNION ALL SELECT r_name FROM region
        |  UNION ALL SELECT 'atlantis')
        |SELECT value,
        |  CASE WHEN value IN (SELECT name FROM inst) THEN 'validated'
        |       WHEN value IN (SELECT synonym FROM instsyn) THEN 'synonym_match'
        |       WHEN value IN (SELECT k FROM pubkeys) THEN 'public_hit'
        |       ELSE 'nonvalidated' END AS bucket
        |FROM vals ORDER BY bucket, value""".stripMargin,

    "c04_cat_violations" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY', 'FURNITURE')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}

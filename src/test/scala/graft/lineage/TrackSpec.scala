package graft.lineage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.catalog.Catalog

class TrackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same source reuses the transform row; new source revises the family") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("track"))
    val lin = new Lineage(cat)
    val (t1, r1) = lin.track("analysis.scala", "val x = 1")
    val (t2, r2) = lin.track("analysis.scala", "val x = 1")
    assert(t2 === t1)                 // same source hash -> same transform
    assert(r2 !== r1)                 // but a NEW run every time
    assert(cat.table("transform").count() === 1)
    // changed source under the same key: new version in the SAME family
    val (t3, _) = lin.track("analysis.scala", "val x = 2")
    assert(t3 !== t1)
    val uids = cat.table("transform").orderBy("id").select("uid")
      .collect().map(_.getString(0))
    assert(uids.length === 2)
    assert(uids(1).take(12) === uids(0).take(12)) // shared stem
    val heads = cat.table("transform").filter(col("is_latest"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(heads === Seq(t3))         // head flipped to the revision
    lin.finish()
  }

  test("params JSON redacts sensitive keys and credential values") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("track"))
    val lin = new Lineage(cat)
    val (_, runId) = lin.track("fit.scala", "code", params = Map(
      "learning_rate" -> 0.01, "epochs" -> 10, "name" -> "run-a",
      "openai_api_key" -> "sk-abc123", "dbUrl" -> "postgresql://u:pw@host:5432/db",
      "skip_me" -> null, "empty" -> Seq.empty[String], "tags" -> Seq("a", "b")))
    val pj = cat.table("run").filter(col("id") === runId)
      .select("params_json").head().getString(0)
    assert(pj.contains(""""learning_rate":0.01"""))
    assert(pj.contains(""""epochs":10"""))
    assert(pj.contains(""""tags":["a","b"]"""))
    assert(pj.contains(""""openai_api_key":"***REDACTED***""""))
    assert(pj.contains(""""dbUrl":"***REDACTED***""""))  // value-pattern match
    assert(!pj.contains("sk-abc123") && !pj.contains("u:pw@"))
    assert(!pj.contains("skip_me") && !pj.contains("empty")) // null/empty skipped
  }

  test("persisted source is redacted; hash covers the original; env refs survive") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("track"))
    val lin = new Lineage(cat)
    val source =
      """val apiKey = "sk-live-XYZ"
        |val url = "postgresql://admin:hunter2@db:5432/prod"
        |val fromEnv = os.getenv("OPENAI_API_KEY")
        |val plain = "hello"""".stripMargin
    val (t1, _) = lin.track("secrets.scala", source)
    val row = cat.table("transform").filter(col("id") === t1).head()
    val stored = row.getAs[String]("source_code")
    assert(stored.contains("\"***REDACTED***\""))
    assert(!stored.contains("sk-live-XYZ") && !stored.contains("hunter2"))
    assert(stored.contains("os.getenv(\"OPENAI_API_KEY\")")) // env lookup untouched
    assert(stored.contains("\"hello\""))                     // benign literal untouched
    // hash is over the ORIGINAL source: tracking the same secretful code
    // again reuses the transform
    assert(lin.track("secrets.scala", source)._1 === t1)
  }

  test("redaction unit behavior matches the reference patterns") {
    assert(Redaction.isSensitiveKey("OPENAI_API_KEY"))
    assert(Redaction.isSensitiveKey("clientSecret"))      // camelCase normalized
    assert(Redaction.isSensitiveKey("db.password"))
    assert(!Redaction.isSensitiveKey("keyboard"))          // 'key' must be a segment
    assert(!Redaction.isSensitiveKey("monotonic"))
    assert(Redaction.isSensitiveValue("postgres://u:p@h/db"))
    assert(!Redaction.isSensitiveValue("postgres://host/db")) // no inline creds
    val (red, n) = Redaction.redactSource(
      """os.environ["API_KEY"] = "abc"
        |{"client_secret": "xyz"}""".stripMargin)
    assert(n === 2)
    assert(!red.contains("abc") && !red.contains("xyz"))
  }

  test("trackEnvironment writes a per-run JVM manifest under the catalog root") {
    val root = graft.TestSpark.tmpDir("trackenv")
    val cat = Catalog.deterministic(spark, root)
    val lin = new Lineage(cat)
    intercept[IllegalStateException](lin.trackEnvironment()) // no active run
    val (_, runId) = lin.track("env.scala", "src")
    val path = lin.trackEnvironment()
    assert(path === s"$root/environments/run_$runId/run_env_jvm.txt")
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(content.contains(s"spark.version=${spark.version}"))
    assert(content.contains("java.version="))
    assert(content.contains("spark.sql.session.timeZone=UTC"))
    lin.finish()
  }
}

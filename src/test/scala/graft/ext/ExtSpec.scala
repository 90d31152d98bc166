package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog again and again"),     // near dup (first token dropped)
    (4L, "completely different content about spark query engines and shuffles here")
  ).toDF("doc_id", "text")

  test("exact dedup marks content groups") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "keeper_id", "is_dup").as[(Long, Long, Boolean)].collect()
    assert(r.toSeq === Seq((1L, 1L, false), (2L, 1L, true), (3L, 3L, false), (4L, 4L, false)))
  }

  test("minhash LSH finds planted near-dups and exact dups, skips distinct docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, computed only for candidates") {
    val cand = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(cand, docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 4L)) < 0.1)
  }

  test("simhash: identical -> 0 hamming, near dup small, different large") {
    val cands = Dedup.simhashCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cands((1L, 2L)) === 0L)
    cands.get((1L, 3L)).foreach(h => assert(h <= 16))
  }

  test("cosine top-k: identical vector ranks first with sim 1") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 1), "vec_id", "embedding", 2)
      .select("neighbor_id", "sim", "rank").as[(Long, Double, Long)].collect()
    assert(r(0)._1 === 2L && r(0)._2 === 1.0)
    assert(r(1)._1 === 4L)
  }

  test("LSH ANN: buckets route identical vectors together; results subset of brute force") {
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 5, nBits = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(ann.nonEmpty)
    // every ANN hit is a real vector pair; recall vs brute is non-zero
    assert(ann.toSet.intersect(brute).nonEmpty)
  }

  test("IVF ANN: probed-cell search overlaps brute force; ranks well-formed") {
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        k = 5, nCentroids = 8, nProbe = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.toSet.map((t: (Long, Long, Long)) => (t._1, t._2)).intersect(brute).nonEmpty)
    // per-query ranks are 1..n without gaps
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("kmeansFit separates obvious blobs; trained centroids feed ivfTopK") {
    // two tight clusters around orthogonal axes
    val rnd = new scala.util.Random(11)
    def blob(center: Array[Float], n: Int, base: Long) = (0 until n).map { i =>
      (base + i, center.map(c => c + rnd.nextFloat() * 0.05f))
    }
    val emb = (blob(Array(1f, 0f, 0f, 0f), 20, 0L) ++ blob(Array(0f, 1f, 0f, 0f), 20, 100L))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 2, iters = 4)
    val cs = cents.orderBy("vec_id").as[(Long, Array[Double])].collect()
    assert(cs.length === 2)
    // each trained centroid points at one blob axis
    val axes = cs.map(_._2.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes === Set(0, 1))
    // trained index answers queries sensibly
    val r = Similarity.ivfTopK(emb, emb.filter($"vec_id" === 0L), "vec_id", "embedding",
      k = 3, nProbe = 1, centroids = Some(cents))
    val neighbors = r.select("neighbor_id").as[Long].collect()
    assert(neighbors.nonEmpty && neighbors.forall(_ < 100L)) // same-blob neighbors only
  }

  test("text ops: tokens, subwords, fingerprint stability, quality flags") {
    val r = docs.select(
      TextOps.tokenCount($"text").as("n"),
      TextOps.subwordCount($"text").as("sw"),
      TextOps.fingerprint($"text").as("fp"))
      .orderBy("n").collect()
    assert(r.head.getAs[Long]("n") > 0)
    // fingerprint invariant under case/punct/whitespace edits
    val fp = docs.filter($"doc_id" === 1).select(TextOps.fingerprint($"text")).head().getString(0)
    val fp2 = Seq("THE QUICK,,, brown fox   jumps over the lazy dog AGAIN and again!!")
      .toDF("text").select(TextOps.fingerprint($"text")).head().getString(0)
    assert(fp === fp2)

    val q = TextOps.qualityColumns(docs, "text")
    assert(q.columns.contains("quality_ok"))
    assert(q.filter($"doc_id" === 1).head().getAs[Boolean]("quality_ok") === false) // 12 tokens < 20
  }

  test("native CharNGrams matches the transform/substr composition exactly") {
    // the legacy composition trigramsOfNormalized replaced (interpreted
    // higher-order eval, O(len²) substr rescans) — kept here as the
    // semantic reference, including the <n-char one-element contract
    def legacy(norm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(length(norm) >= 3,
        transform(sequence(lit(1), length(norm) - 2), i => norm.substr(i, lit(3))))
        .otherwise(array(norm))
    val cases = Seq("", "a", "ab", "abc", "abcd", " the cat sat ",
      "héllo wörld", "日本語のテキスト", "aé中😀z", "  x  ")
      .toDF("s").select(col("s"), TextOps.normalized(col("s")).as("norm"))
    val both = cases.select(
      TextOps.trigramsOfNormalized(col("norm")).as("native"),
      legacy(col("norm")).as("ref"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString) }
    // raw (un-normalized) strings too, where the short-string branch fires
    val raw = cases.select(
      TextOps.trigramsOfNormalized(col("s")).as("native"), legacy(col("s")).as("ref"))
    raw.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString) }
    // null input is the ONE pinned divergence from the legacy
    // composition: native is null-in/null-out (standard Spark scalar
    // semantics); legacy's otherwise-branch produced [null]
    val nullRow = Seq(Tuple1(null: String)).toDF("s").select(
      TextOps.trigramsOfNormalized(col("s")).as("native"), legacy(col("s")).as("ref"))
      .head()
    assert(nullRow.isNullAt(0), "native: null text -> NULL array")
    assert(nullRow.getSeq[String](1) === Seq(null), "legacy: null text -> [null]")
    // stays inside whole-stage codegen (the point of the native
    // expression) — over a non-foldable source so the project survives
    // to the physical plan instead of constant-folding away
    val ranged = spark.range(5)
      .select(TextOps.trigramsOfNormalized(concat(lit(" ab"), col("id"), lit("c "))).as("g"))
    val plan = ranged.queryExecution.executedPlan.toString
    // the "*(1)" stage marker = the Project runs inside WholeStageCodegen
    assert(plan.contains("*(1) Project") && plan.contains("graft_char_ngrams"), plan)
    assert(ranged.collect().forall(_.getSeq[String](0).nonEmpty))
  }

  test("langid classifies by trigram profile") {
    val labeled = Seq(
      (1L, "the cat sat on the mat with the hat", "en"),
      (2L, "el gato se sienta en la alfombra con el sombrero", "es"),
      (3L, "the dog ran to the park with the ball", "en"),
      (4L, "el perro corre al parque con la pelota", "es")
    ).toDF("doc_id", "text", "lang")
    val pred = TextOps.langId(labeled, labeled, "doc_id", "text", "lang")
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(pred(1L) === "en" && pred(3L) === "en")
    assert(pred(2L) === "es" && pred(4L) === "es")

    // split API parity: trainProfiles + classify must reproduce the fused
    // langId output exactly (the bench times classify against a model
    // trained once in the warmup region)
    val profiles = TextOps.trainProfiles(labeled, "text", "lang")
    val split = TextOps.classify(labeled, "doc_id", "text", profiles)
      .select("doc_id", "predicted_lang", "overlap").collect().toSet
    val fused = TextOps.langId(labeled, labeled, "doc_id", "text", "lang")
      .select("doc_id", "predicted_lang", "overlap").collect().toSet
    assert(split === fused)
  }

  test("multimodal: payload -> fake decode -> resize plan is deterministic and typed") {
    val withP = Multimodal.withFakePayload(docs, "doc_id", "text")
    assert(withP.schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    val meta = Multimodal.decodeMetaFake(withP, "doc_id", "payload")
    val plan = Multimodal.resizePlan(meta, 512).orderBy("doc_id").collect()
    assert(plan.length === 4)
    // exact dups decode identically
    assert(plan(0).getAs[org.apache.spark.sql.Row]("meta") ===
      plan(1).getAs[org.apache.spark.sql.Row]("meta"))
    val w = plan(0).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width")
    assert(w >= 64 && w <= 1024)
    assert(plan.forall { r =>
      val tw = r.getAs[Int]("target_width"); tw <= 512 || !r.getAs[Boolean]("needs_resize")
    })
  }

  test("multimodal: real PNG encode round-trips through ImageIO decode") {
    val withPng = Multimodal.encodeImages(docs, "doc_id", "text")
    val rows = withPng.collect()
    // the payloads are genuine PNG files (magic bytes), distinct per distinct text
    assert(rows.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      p(0) == 0x89.toByte && p(1) == 'P'.toByte && p(2) == 'N'.toByte && p(3) == 'G'.toByte
    })
    val meta = Multimodal.decodeMeta(withPng, "doc_id", "payload")
      .select($"doc_id", $"meta.width", $"meta.height", $"meta.channels", $"meta.content_hash")
      .orderBy("doc_id").collect()
    // the decoder must read back exactly the dims the encoder planned from md5(text)
    val texts = docs.orderBy("doc_id").select("text").as[String].collect()
    meta.zip(texts).foreach { case (r, text) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val (w, h, c) = Multimodal.plannedDims(md5)
      assert(r.getInt(1) === w, s"width for '$text'")
      assert(r.getInt(2) === h)
      assert(r.getInt(3) === c)
    }
    // identical text -> identical PNG bytes -> identical content hash (docs 1,2 are dups)
    assert(meta(0).getString(4) === meta(1).getString(4))
    // a corrupt payload must fail loudly, not decode garbage
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(bad, "doc_id", "payload").collect()
    }
  }

  test("as-of join: latest prior-or-equal right row per key, null when none") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val left = Seq(
      (10L, 1L, ts(100)), // after r at 50 -> matches 50
      (11L, 1L, ts(200)), // equal to r at 200 -> inclusive match
      (12L, 1L, ts(40)),  // before any right row -> null
      (13L, 2L, ts(500))  // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(50), 90L, 1.5),
      (1L, ts(200), 91L, 2.5),
      (1L, ts(300), 92L, 3.5) // later than every left row: never matched
    ).toDF("user_id", "ts", "err_id", "err_value")
    val r = AsOfJoin.asOf(left, right, "user_id", "ts", "ts", Seq("err_id", "err_value"))
      .orderBy("event_id").collect()
    assert(r.map(x => Option(x.getAs[java.lang.Long]("asof_err_id"))).toSeq ===
      Seq(Some(90L), Some(91L), None, None))
    assert(r(1).getAs[Double]("asof_err_value") === 2.5)
    // left columns survive untouched
    assert(r.map(_.getAs[Long]("event_id")).toSeq === Seq(10L, 11L, 12L, 13L))
  }

  test("chunking: overlap windows, clamped tail, short-doc single chunk") {
    val df = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 toks, C=8 S=6 -> 3 chunks
      (2L, "a b c")                                   // shorter than one chunk
    ).toDF("doc_id", "text")
    val r = TextOps.chunkColumns(df, "doc_id", "text", chunkSize = 8, stride = 6)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: starts at 0, 6, 12 -> 1 + ceil((20-8)/6) = 3 chunks
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.length === 3)
    assert(d1(0).getAs[String]("chunk_text") === (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1(1).getAs[String]("chunk_text") === (7 to 14).map(i => s"t$i").mkString(" "))
    assert(d1(2).getAs[String]("chunk_text") === (13 to 20).map(i => s"t$i").mkString(" "))
    assert(d1.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(8L, 8L, 8L))
    // doc 2: one clamped chunk
    val d2 = r.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2(0).getAs[Long]("n_chunk_tokens") === 3L)
    // consecutive chunks overlap by chunkSize - stride = 2 tokens
    assert(d1(0).getAs[String]("chunk_text").split(" ").takeRight(2).toSeq ===
      d1(1).getAs[String]("chunk_text").split(" ").take(2).toSeq)
  }

  test("bucketed range join matches the naive BETWEEN join, plans equi-keys") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val points = Seq(
      (10L, 1L, ts(100)), (11L, 1L, ts(7300)), (12L, 1L, ts(14500)),
      (13L, 2L, ts(100)), (14L, 1L, ts(7200)) // exactly at an interval end
    ).toDF("pid", "k", "pts")
    val intervals = Seq(
      (90L, 1L, ts(0), ts(7200)),     // covers 100 and the boundary 7200
      (91L, 1L, ts(7000), ts(14200)), // covers 7200, 7300
      (92L, 3L, ts(0), ts(99999))     // other key: matches nothing
    ).toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "pts", "s", "e", 7200L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"pts" >= $"s" && $"pts" <= $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((10L, 90L), (14L, 90L), (14L, 91L), (11L, 91L)))
    // the plan joins on equi-keys (no nested loop / cartesian)
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "pts", "s", "e", 7200L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("pii detection counts each shape once and redacts with typed tags") {
    val df = Seq(
      (1L, "reach me at jo.doe+x@mail.example.org or 555-867-5309"),
      (2L, "ssn 123-45-6789 from host 192.168.0.1"),
      (3L, "clean text, no identifiers at all"),
      (4L, "two mails: a@b.co c@d.io")
    ).toDF("doc_id", "text")
    val r = TextOps.piiColumns(df, "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_emails") === 1 && r(0).getAs[Long]("n_phones") === 1)
    assert(r(0).getAs[String]("redacted") === "reach me at [EMAIL] or [PHONE]")
    assert(r(1).getAs[Long]("n_ssn") === 1 && r(1).getAs[Long]("n_ipv4") === 1)
    assert(r(1).getAs[String]("redacted") === "ssn [SSN] from host [IP]")
    // phone (3-3-4) never double-counts as SSN (3-2-4) and vice versa
    assert(r(0).getAs[Long]("n_ssn") === 0 && r(1).getAs[Long]("n_phones") === 0)
    assert(!r(2).getAs[Boolean]("has_pii"))
    assert(r(3).getAs[Long]("n_emails") === 2)
  }

  test("repetition metrics: duplicate lines, top bigram, single-token edge") {
    val df = Seq(
      (1L, "x y x y x y x y x y x y x y x y"), // 16 toks: two identical 8-tok lines
      (2L, "all these words differ from each other fully"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionColumns(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 2 lines, both dups -> frac 0.5; dup chars 30 of 31;
    // top bigram "x y" appears 8x, 3 chars -> 24/31
    assert(r(0).getAs[Long]("n_lines") === 2)
    assert(r(0).getAs[Double]("dup_line_frac") === 0.5)
    assert(math.abs(r(0).getAs[Double]("dup_line_char_frac") - 30.0 / 31) < 1e-9)
    assert(r(0).getAs[String]("top_bigram") === "x y")
    assert(math.abs(r(0).getAs[Double]("top_bigram_char_frac") - 24.0 / 31) < 1e-9)
    assert(!r(0).getAs[Boolean]("repetition_ok"))
    // doc 2: no repetition at all
    assert(r(1).getAs[Double]("dup_line_frac") === 0.0)
    assert(r(1).getAs[Boolean]("repetition_ok"))
    // doc 3: one token -> one line, no bigrams, empty top_bigram
    assert(r(2).getAs[Long]("n_lines") === 1)
    assert(r(2).getAs[String]("top_bigram") === "")
    assert(r(2).getAs[Double]("top_bigram_char_frac") === 0.0)
  }

  test("resizeImages: oversize images shrink under the max edge, small ones pass byte-identical") {
    val png = Multimodal.encodeImages(docs, "doc_id", "text") // dims in 8..23
    val before = png.orderBy("doc_id").collect().map(_.getAs[Array[Byte]]("payload"))
    // maxEdge 64: everything already fits -> byte-identical pass-through
    val same = Multimodal.resizeImages(png, "doc_id", "payload", maxEdge = 64)
      .orderBy("doc_id").collect().map(_.getAs[Array[Byte]]("payload"))
    assert(before.zip(same).forall { case (a, b) => java.util.Arrays.equals(a, b) })
    // maxEdge 8: every image shrinks to max edge exactly 8, channels kept
    val shrunk = Multimodal.decodeMeta(
      Multimodal.resizeImages(png, "doc_id", "payload", maxEdge = 8), "doc_id", "payload")
      .select($"meta.width", $"meta.height", $"meta.channels").collect()
    assert(shrunk.forall(r => math.max(r.getInt(0), r.getInt(1)) <= 8))
    assert(shrunk.exists(r => r.getInt(2) === 1) || shrunk.exists(r => r.getInt(2) === 3))
  }

  test("rolling min-hash fingerprint is shift-sensitive but deterministic") {
    val a = docs.filter($"doc_id" === 1).select(TextOps.rollingMinHash($"text")).head().getLong(0)
    val b = docs.filter($"doc_id" === 1).select(TextOps.rollingMinHash($"text")).head().getLong(0)
    assert(a === b)
  }

  test("salted and skew-adaptive joins match the plain join on skewed data") {
    // key 0 owns 80% of the left rows — a genuine hot key
    val left = spark.range(0, 1000)
      .select(when($"id" % 5 =!= 0, $"id" % 7).otherwise(0L).as("k"), $"id".as("lv"))
    val right = spark.range(0, 7).select($"id".as("rk"), ($"id" * 10).as("rv"))
    val expected = left.join(right, $"k" === $"rk")
      .groupBy("rk").agg(count(lit(1)).as("n"), sum("lv").as("s"))
      .orderBy("rk").as[(Long, Long, Long)].collect().toSeq

    val salted = Skew.saltedJoin(left, right, "k", "rk", nSalts = 4, saltBy = Seq("lv"))
      .groupBy("rk").agg(count(lit(1)).as("n"), sum("lv").as("s"))
      .orderBy("rk").as[(Long, Long, Long)].collect().toSeq
    assert(salted === expected)

    // threshold 100: only key 0 qualifies as hot -> mixed salted+plain path
    val adaptive = Skew.skewJoin(left, right, "k", "rk", nSalts = 4, hotKeyThreshold = 100)
      .groupBy("rk").agg(count(lit(1)).as("n"), sum("lv").as("s"))
      .orderBy("rk").as[(Long, Long, Long)].collect().toSeq
    assert(adaptive === expected)

    // threshold high: no hot keys -> pure plain-join path
    val plainPath = Skew.skewJoin(left, right, "k", "rk", hotKeyThreshold = 100000)
      .groupBy("rk").agg(count(lit(1)).as("n"), sum("lv").as("s"))
      .orderBy("rk").as[(Long, Long, Long)].collect().toSeq
    assert(plainPath === expected)
  }

  test("sampled hot-key detection finds the planted key and keeps join parity") {
    // 40k rows on key 0 + uniform tail; threshold 2000 with the default
    // 1% sample => expected 400 sampled rows for the hot key, cut at 10:
    // the SAMPLED detection branch (threshold*fraction = 20 >= 20) must
    // fire, find key 0, and produce the exact plain-join result
    val left = spark.range(0, 50000)
      .select(when($"id" < 40000, 0L).otherwise($"id").as("k"), lit(1L).as("lv"))
    val right = spark.range(0, 200).select($"id".as("rk"), ($"id" * 10).as("rv"))
    val expected = left.join(right, $"k" === $"rk")
      .groupBy("rk").agg(count(lit(1)).as("n")).orderBy("rk")
      .as[(Long, Long)].collect().toSeq
    val adaptive = Skew.skewJoin(left, right, "k", "rk",
        nSalts = 4, hotKeyThreshold = 2000, saltBy = Seq("k", "lv"))
      .groupBy("rk").agg(count(lit(1)).as("n")).orderBy("rk")
      .as[(Long, Long)].collect().toSeq
    assert(adaptive === expected)
  }
}

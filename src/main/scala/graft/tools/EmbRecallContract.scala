package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Threshold-boundary recall contract for the banded embedding LSH
  * (e11, `Dedup.embeddingCosinePairsLSHBanded`) — the RecallContract
  * pattern pointed at the hyperplane-LSH sampling trade (round-15
  * verdict ask #4).
  *
  * The adaptive band width w (`Similarity.lshBandBits`: 2^w ≥ 16n)
  * keeps candidates linear by making boundary-cosine pairs a SAMPLE:
  * a pair at cosine c agrees on one hyperplane sign with
  * p = 1 − arccos(c)/π, on a w-bit band with p^w, and surfaces with
  * closed-form probability 1 − (1 − p^w)^bands. Exact duplicates
  * (c = 1, identical band keys) must ALWAYS surface.
  *
  * Protocol: for each cosine level, take `nBases` deterministic base
  * vectors and plant one partner at EXACTLY that cosine — partner =
  * |v|·(c·v̂ + √(1−c²)·ŵ) with ŵ a deterministic unit vector
  * orthogonalized against v̂, so cos(v, partner) = c up to float
  * storage (~1e-7, far inside the 0.001 margin the levels keep from
  * the 0.95 threshold). Levels: 1.0 (exact-dup contract), then
  * boundary samples above threshold, plus one level BELOW threshold
  * whose planted pairs must never reach the output (the exact-cosine
  * verify step is the precision guarantee, independent of banding).
  *
  * Contract assertions:
  *  - exact-dup surfaced fraction == 1.0;
  *  - below-threshold planted pairs in the output == 0;
  *  - each boundary level's surfaced fraction within
  *    max(0.08, 5σ) of the closed form (σ = binomial error at nBases).
  *
  * Run at sf1.0 and sf10 (adaptive w differs: the contract holds at
  * BOTH widths); one JSON line per run, recorded in SCALING.md.
  */
object EmbRecallContract {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-local/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val threshold = 0.95
    val bands = 4
    // (level index, cosine, aboveThreshold)
    val levels = Seq((1, 1.0, true), (2, 0.98, true), (3, 0.96, true),
      (4, 0.951, true), (5, 0.93, false))
    val off = graft.queries.TextQueries.DupOffset

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val nVecs = emb.count()
    val nBases = math.min(1000L, nVecs / 10).toInt
    val step = math.max(1L, nVecs / nBases)

    val bases = emb.filter(col("vec_id") % step === 0)
      .as[(Long, Array[Float])].collect().sortBy(_._1).take(nBases)

    /** Deterministic unit vector orthogonal to v̂ (shader-style hash for
      * the raw direction; no Random so reruns are bit-stable). */
    def orthoUnit(id: Long, v: Array[Double]): Array[Double] = {
      val dim = v.length
      val nv = math.sqrt(v.map(x => x * x).sum)
      val vh = v.map(_ / nv)
      val w0 = Array.tabulate(dim) { d =>
        val x = math.sin(id * 12.9898 + d * 78.233) * 43758.5453
        x - math.floor(x) - 0.5
      }
      val proj = (0 until dim).map(d => w0(d) * vh(d)).sum
      val w = Array.tabulate(dim)(d => w0(d) - proj * vh(d))
      val nw = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / nw)
    }

    val plants: Seq[(Long, Array[Float])] = for {
      (lvl, c, _) <- levels
      (id, vf) <- bases
    } yield {
      val v = vf.map(_.toDouble)
      val plantId = off + lvl * 10000000L + id
      if (c == 1.0) (plantId, vf)
      else {
        val nv = math.sqrt(v.map(x => x * x).sum)
        val vh = v.map(_ / nv)
        val wh = orthoUnit(id, v)
        val s = math.sqrt(1.0 - c * c)
        (plantId, Array.tabulate(v.length)(d => (nv * (c * vh(d) + s * wh(d))).toFloat))
      }
    }

    val corpus = emb.unionByName(plants.toDF("vec_id", "embedding"))
    val nCorpus = nVecs + plants.size
    val w = graft.ext.Similarity.lshBandBits(nCorpus)

    val t0 = System.nanoTime()
    val out = graft.ext.Dedup.embeddingCosinePairsLSHBanded(
        corpus, "vec_id", "embedding", dim = 64, threshold = threshold, bands = bands)
      .filter(col("id_b") >= off) // planted partners only — keeps the collect tiny
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9

    def closedForm(c: Double): Double = {
      val p = 1.0 - math.acos(c) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, w), bands)
    }

    val rows = levels.map { case (lvl, c, above) =>
      val surfaced = bases.count { case (id, _) => out((id, off + lvl * 10000000L + id)) }
      val frac = surfaced.toDouble / bases.length
      val pred = if (above) closedForm(c) else 0.0
      (lvl, c, above, frac, pred)
    }

    val levelJson = rows.map { case (_, c, above, frac, pred) =>
      f""""c$c%.3f":{"observed":$frac%.4f,"closed_form":$pred%.4f,"above_threshold":$above}"""
    }.mkString("{", ",", "}")
    println(s"""{"sf_dir":"$sfDir","n_vecs":$nVecs,"n_corpus":$nCorpus,""" +
      f""""bands":$bands,"band_bits":$w,"n_bases":${bases.length},""" +
      f""""levels":$levelJson,"secs":$secs%.1f}""")

    rows.foreach { case (lvl, c, above, frac, pred) =>
      if (c == 1.0)
        require(frac == 1.0, f"EMB RECALL CONTRACT: exact dups $frac%.4f != 1.0")
      else if (!above)
        require(frac == 0.0,
          f"EMB RECALL CONTRACT: below-threshold pairs leaked (level $lvl: $frac%.4f)")
      else {
        val sigma = math.sqrt(pred * (1 - pred) / bases.length)
        val tol = math.max(0.08, 5 * sigma)
        require(math.abs(frac - pred) <= tol,
          f"EMB RECALL CONTRACT: c=$c%.3f observed $frac%.4f vs closed form $pred%.4f (tol $tol%.4f)")
      }
    }
    spark.stop()
  }
}

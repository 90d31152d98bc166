package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.streaming.EventStream

/** Streaming + multimodal pipeline queries. The streaming entry runs a
  * REAL Structured Streaming query (memory sink, drained synchronously)
  * whose result must hash-match the same aggregation in DuckDB — stream/
  * batch parity is the check. Multimodal entries run a REAL javax.imageio
  * PNG encode->decode round-trip whose decoded dims the oracle predicts
  * from md5(text).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_stream_window" -> ((spark, dir) => {
      EventStream.runStreaming(spark, dir, s"graft_stream_${dir.replaceAll("\\W", "_")}")
        .orderBy("hour", "event_type")
    }),

    "s03_stream_enrich" -> ((spark, dir) => {
      // stream-static join: events stream enriched with a broadcast user
      // dimension, then hourly per-segment aggregation
      EventStream.runEnrichedStreaming(spark, dir,
          s"graft_enrich_${dir.replaceAll("\\W", "_")}")
        .orderBy("hour", "segment")
    }),

    "s02_session_window" -> ((spark, dir) => {
      // REAL streaming session windows (append mode): a session is
      // emitted exactly once when the watermark passes its end; the
      // oracle replays the same sessions as gaps-and-islands SQL with
      // the same finalization predicate
      // 4 state-store partitions: the store open+commit cost per
      // partition dominates a one-shot local session stream (sweep: 4 ->
      // 4.1 s, 8 -> 4.5, 32 -> 9.3 at sf0.1); a long-lived cluster job
      // would size this up with the key space
      EventStream.runSessionStreaming(spark, dir, "8 hours",
          s"graft_sessions_${dir.replaceAll("\\W", "_")}", shufflePartitions = 4)
        .orderBy("session_start", "user_id")
    }),

    "s05_stream_interval_join" -> ((spark, dir) => {
      // REAL stream-stream interval join (two file streams, watermarked
      // both sides): purchases joined to same-user clicks in the prior
      // 30 minutes; parity with the equivalent batch join is the check
      EventStream.runAttributionStreaming(spark, dir,
          s"graft_attr_${dir.replaceAll("\\W", "_")}")
        .orderBy("user_id", "purchase_ts", "click_ts")
    }),

    "s04_stream_dedup" -> ((spark, dir) => {
      // REAL streaming dropDuplicates (watermark-bounded state): the
      // surviving key set must equal batch DISTINCT — stream/batch parity
      EventStream.runDedupStreaming(spark, dir,
          s"graft_dedup_${dir.replaceAll("\\W", "_")}")
        .orderBy("user_id", "event_type")
    }),

    "s06_stream_zarr_append" -> ((spark, dir) => {
      // REAL streaming ingest into a zarr store: a 3-file source stream
      // (maxFilesPerTrigger=1 -> 3 microbatches), each batch APPENDED in
      // place via appendRows (boundary + new chunks only, batch-id
      // ledger for redelivery); the reopened store must match the batch
      // aggregate — stream/batch parity, order-insensitive by design
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val coo = docs.select(col("doc_id"), col("lang"))
        .crossJoin(spark.range(4).select(col("id").as("k")))
        .select(concat(lit("d"), col("doc_id")).as("obs_name"), col("lang"),
          ((col("doc_id") * 7 + col("k") * 3) % 16).as("var_id"),
          ((col("doc_id") + col("k")) % 9 * 0.5).as("value"))
      val stage = LifecycleQueries.TempRoot.dir("graft_s06src")
      val store = s"$stage/grow.zarr"
      // the source staging write and the empty-store bootstrap touch
      // disjoint directories — overlap them (guide §2.6; Par.jobs)
      graft.core.Par.jobs(
        () => coo.repartitionByRange(3, col("obs_name")).write
          .mode("overwrite").parquet(s"$stage/src"),
        () => graft.zarr.AnnZarrWriter.write(graft.artifact.AnnDataset(
          spark.range(0).select(col("id").as("obs_id"),
            concat(lit("c"), col("id")).as("obs_name"), lit("xx").as("lang")),
          spark.range(16).select(col("id").as("var_id"),
            concat(lit("g"), col("id")).as("var_name")),
          spark.range(0).select(col("id").as("obs_id"), col("id").as("var_id"),
            col("id").cast("double").as("value"))), store, chunkElems = 512))
      val q = graft.streaming.ZarrStreamSink.streamAppendZarr(
        spark.readStream.schema(coo.schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$stage/src"),
        store, Seq("lang"), s"$stage/ckpt")
      try q.processAllAvailable() finally q.stop()
      val ds = graft.zarr.AnnZarr.open(spark, store)
      ds.x.join(ds.obs.select("obs_id", "lang"), "obs_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("nnz"),
          sum(col("value")).cast("double").as("sum_value"))
        .orderBy("lang")
    }),

    "s07_stream_embed_ann" -> ((spark, dir) => {
      // END-TO-END embedding ingest + search: the embeddings table
      // streams (3 microbatches) into a DENSE zarr store through the
      // format-routed sink — each batch is a chunk-row-band append —
      // then ANN runs over the REOPENED store: rows keyed back to
      // vec_id through obs_name, cosine top-3 per query via one
      // var_id-join dot product + per-row norms (the brute-force
      // verification tier; e05's LSH is the scale path)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val coo = emb.select(col("vec_id"), posexplode(col("embedding")))
        .select(concat(lit("v"), col("vec_id")).as("obs_name"),
          col("pos").cast("long").as("var_id"),
          col("col").cast("double").as("value"))
      val stage = LifecycleQueries.TempRoot.dir("graft_s07src")
      val store = s"$stage/emb.zarr"
      // disjoint-directory writes overlap (guide §2.6; Par.jobs)
      graft.core.Par.jobs(
        () => coo.repartitionByRange(3, col("obs_name")).write
          .mode("overwrite").parquet(s"$stage/src"),
        () => graft.zarr.AnnZarrWriter.write(graft.artifact.AnnDataset(
          spark.range(0).select(col("id").as("obs_id"),
            concat(lit("v"), col("id")).as("obs_name")),
          spark.range(dim).select(col("id").as("var_id"),
            concat(lit("d"), col("id")).as("var_name")),
          spark.range(0).select(col("id").as("obs_id"), col("id").as("var_id"),
            col("id").cast("double").as("value"))),
          store, chunkElems = 4096, denseSlots = Set("X")))
      val q = graft.streaming.ZarrStreamSink.streamAppendZarr(
        spark.readStream.schema(coo.schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$stage/src"),
        store, Seq(), s"$stage/ckpt")
      try q.processAllAvailable() finally q.stop()
      val ds = graft.zarr.AnnZarr.open(spark, store)
      val rows = ds.x.join(ds.obs.select("obs_id", "obs_name"), "obs_id")
        .select(regexp_extract(col("obs_name"), "v(\\d+)", 1)
          .cast("long").as("vec_id"), col("var_id"), col("value"))
      val norms = rows.groupBy("vec_id")
        .agg(sqrt(sum(col("value") * col("value"))).as("norm"))
      val queries = rows.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("var_id"),
          col("value").as("qv"))
      val sims = queries
        .join(rows.select(col("vec_id").as("neighbor_id"), col("var_id"),
          col("value").as("cv")), "var_id")
        .filter(col("neighbor_id") =!= col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(sum(col("qv") * col("cv")).as("dot"))
        .join(norms.select(col("vec_id").as("query_id"),
          col("norm").as("qn")), "query_id")
        .join(norms.select(col("vec_id").as("neighbor_id"),
          col("norm").as("cn")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          round(col("dot") / (col("qn") * col("cn")), 6).as("sim"))
      sims.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
        .filter(col("rank") <= 3)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "s08_stream_mu_modality" -> ((spark, dir) => {
      // streaming append INTO A MUDATA MODALITY end-to-end: bootstrap a
      // container with a static `adt` modality + an empty `rna` one,
      // stream 3 microbatches into mod/rna through the format-routed
      // sink, refresh the ROOT consolidation snapshot (modality growth
      // must become visible to container-level opens), then aggregate
      // BOTH modalities through openMu — container read path, not the
      // nested store path
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cooRna = docs.select(col("doc_id"), col("lang"))
        .crossJoin(spark.range(4).select(col("id").as("k")))
        .select(concat(lit("d"), col("doc_id")).as("obs_name"), col("lang"),
          ((col("doc_id") * 5 + col("k")) % 12).as("var_id"),
          ((col("doc_id") + col("k") * 2) % 9 * 0.5).as("value"))
      val stage = LifecycleQueries.TempRoot.dir("graft_s08src")
      val mu = s"$stage/mu.zarr"
      // static adt modality derived from the sources table: obs_id must
      // be a DENSE 0..n-1 row index (the zarr writer addresses X rows by
      // it), and sources is a bounded domain (a handful of values at
      // every tier) — assign ids driver-side over the sorted distinct
      // set rather than row_number() over a global window, which forces
      // a single-partition WindowExec and printed its warning into every
      // bench artifact tail (round-16 verdict ask #5). Nulls are
      // rejected up front (getString(0) would NPE) and the sort compares
      // UTF-8 bytes unsigned — Java's UTF-16 String ordering diverges
      // from Spark's UTF8String binary ordering on supplementary
      // characters, so only the byte sort keeps the replaced
      // row_number() output bit-identical on any source domain
      // (r17 ADVICE).
      val srcRows = docs.select("source").distinct().collect()
      require(srcRows.forall(!_.isNullAt(0)), "null source in documents")
      val srcNames = srcRows.map(_.getString(0)).sortWith { (a, b) =>
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      }
      val adtObs = spark.createDataFrame(
        srcNames.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq)
        .toDF("obs_id", "obs_name")
      val adtVars = spark.range(4).select(col("id").as("var_id"),
        concat(lit("p"), col("id")).as("var_name"))
      val adtX = adtObs
        .select(col("obs_id"), substring(col("obs_name"), 4, 10).cast("int").as("sfx"))
        .crossJoin(spark.range(4).select(col("id").as("k")))
        .select(col("obs_id"), col("k").as("var_id"),
          ((col("sfx") * 3 + col("k")) % 5 * 1.0).as("value"))
      // the source staging write is independent of the container
      // bootstrap chain (disjoint subdirs of `stage`); overlap them
      // (guide §2.6; Par.jobs). The chain itself stays sequential:
      // writeMu deletes+recreates the container root, so the rna
      // modality may only bootstrap after it returns.
      graft.core.Par.jobs(
        () => cooRna.repartitionByRange(3, col("obs_name")).write
          .mode("overwrite").parquet(s"$stage/src"),
        () => {
          graft.zarr.AnnZarrWriter.writeMu(
            Map("adt" -> graft.artifact.AnnDataset(adtObs, adtVars, adtX)), mu)
          // empty rna modality bootstrapped under the container root
          graft.zarr.AnnZarrWriter.write(graft.artifact.AnnDataset(
            spark.range(0).select(col("id").as("obs_id"),
              concat(lit("d"), col("id")).as("obs_name"), lit("xx").as("lang")),
            spark.range(12).select(col("id").as("var_id"),
              concat(lit("g"), col("id")).as("var_name")),
            spark.range(0).select(col("id").as("obs_id"), col("id").as("var_id"),
              col("id").cast("double").as("value"))), s"$mu/mod/rna", chunkElems = 512)
        })
      val q = graft.streaming.ZarrStreamSink.streamAppendZarr(
        spark.readStream.schema(cooRna.schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$stage/src"),
        s"$mu/mod/rna", Seq("lang"), s"$stage/ckpt")
      try q.processAllAvailable() finally q.stop()
      // root snapshot refresh: merge the grown modality's OWN (per-batch
      // patched) consolidation into the container root — two metadata
      // GETs + one PUT, never an O(container) re-walk
      graft.zarr.ZarrStore.patchConsolidatedSubtree(mu, "mod/rna")
      val mods = graft.zarr.AnnZarr.openMu(spark, mu)
      mods.toSeq.sortBy(_._1).map { case (m, ds) =>
        ds.x.agg(count(lit(1)).as("nnz"),
            sum(col("value")).cast("double").as("sum_value"))
          .select(lit(m).as("modality"), lit(ds.obs.count()).as("n_obs"),
            col("nnz"), col("sum_value"))
      }.reduce(_ unionByName _).orderBy("modality")
    }),

    "m01_multimodal_decode" -> ((spark, dir) => {
      // REAL codec round-trip: encode genuine PNG bytes per doc with
      // javax.imageio (dims planned from md5(text) so the oracle can
      // predict them), then decode with ImageIO.read — width/height/
      // channels in the output come from the decoded raster
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val withPayload = Multimodal.encodeImages(docs, "doc_id", "text")
      val meta = Multimodal.decodeMeta(withPayload, "doc_id", "payload")
      Multimodal.resizePlan(meta, maxEdge = 16)
        .select(col("doc_id"), col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.channels").as("channels"), col("target_width"), col("target_height"),
          col("needs_resize"))
        .orderBy("doc_id")
    }),

    "m03_resize_roundtrip" -> ((spark, dir) => {
      // REAL pixel pipeline: encode PNG -> Graphics2D resize to max edge
      // 12 -> decode again; the oracle predicts the post-resize dims from
      // md5(text) through the same ceil(scale) math
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val png = Multimodal.encodeImages(docs, "doc_id", "text")
      val resized = Multimodal.resizeImages(png, "doc_id", "payload", maxEdge = 12)
      Multimodal.decodeMeta(resized, "doc_id", "payload")
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.channels").as("channels"))
        .orderBy("doc_id")
    }),

    "m04_audio_meta" -> ((spark, dir) => {
      // REAL audio codec round-trip: PCM WAV bytes written with
      // javax.sound.sampled, header parsed back by AudioSystem; the
      // oracle predicts rate/frames/duration from md5(text)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val wavs = Multimodal.encodeWavs(docs, "doc_id", "text")
      Multimodal.decodeAudioMeta(wavs, "doc_id", "audio")
        .orderBy("doc_id")
    }),

    "m02_frame_sample" -> ((spark, dir) => {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), (col("n_chars") % 100 + 1).cast("long").as("n_frames"))
      Multimodal.frameSamplePlan(docs, "doc_id", "n_frames", every = 10, cap = 8)
        .orderBy("doc_id", "frame_idx")
    }),

    "l01_label_weights" -> ((spark, dir) => {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      graft.ml.MappedDataset.labelWeights(docs.select("doc_id", "lang"), "lang")
        .select(col("doc_id"), col("lang"), round(col("label_weight"), 9).as("label_weight"))
        .orderBy("doc_id")
    }),

    "l02_mapped_routing" -> ((spark, dir) => {
      // two stores (doc_id parity split) unioned with explicit routing -
      // the MappedCollection global->local index contract
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang")
      val stores = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      graft.ml.MappedDataset.mapped(stores, join = "inner", orderCol = Some("doc_id"))
        .select("store_idx", "local_idx", "doc_id", "lang")
        .orderBy("store_idx", "local_idx")
    }),

    "l04_worker_shard" -> ((spark, dir) => {
      // parallel-loader split: batch b -> worker b % 3 over the routed
      // union, batch size 32 (torch DataLoader round-robin contract)
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang")
      val stores = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      val m = graft.ml.MappedDataset.mapped(stores, join = "inner", orderCol = Some("doc_id"))
      graft.ml.MappedDataset.workerShard(m, Seq("store_idx", "local_idx"),
          batchSize = 32, numWorkers = 3)
        .select("store_idx", "local_idx", "doc_id", "global_idx", "batch_idx", "worker_id")
        .orderBy("global_idx")
    }),

    "l03_mapped_filtered_encoded" -> ((spark, dir) => {
      // obs_filter + unknown_label parity: per-store isin masks applied
      // AFTER local-index assignment (rows keep their in-store position),
      // and the 'src0' label is removed from the encoder's category set
      // (codes stay dense from 0) while encoding to -1
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "source")
      val stores = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      val m = graft.ml.MappedDataset.mapped(stores, join = "inner",
        orderCol = Some("doc_id"), obsFilter = Map("lang" -> Seq("en", "fr")))
      val (enc, _) = graft.ml.MappedDataset.encodeLabels(m, "source",
        unknownLabel = Some("src0"))
      enc.select(col("store_idx"), col("local_idx"), col("doc_id"), col("lang"),
          col("label_code").as("source_code"))
        .orderBy("store_idx", "local_idx")
    })
  )

  val oracle: Map[String, String] = Map(
    "s01_stream_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "s03_stream_enrich" ->
      """SELECT date_trunc('hour', ts) AS hour,
        |  'seg' || CAST(user_id % 7 AS VARCHAR) AS segment,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, segment""".stripMargin,

    "s02_session_window" ->
      // sessions as gaps-and-islands: a new island when the gap from the
      // previous event exceeds 8h STRICTLY (Spark merges at exactly
      // last+gap); only sessions finalized at the terminal watermark
      // (max event time, delay 0) are emitted by the append-mode stream
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 8 HOUR
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |agg AS (
        |  SELECT min(ts) AS session_start, max(ts) + INTERVAL 8 HOUR AS session_end,
        |    user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM s GROUP BY user_id, sid)
        |SELECT session_start, session_end, user_id, n, sum_value
        |FROM agg WHERE session_end <= (SELECT max(ts) FROM events)
        |ORDER BY session_start, user_id""".stripMargin,

    "s04_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "s06_stream_zarr_append" ->
      """SELECT lang, count(*) AS nnz,
        |       CAST(sum((doc_id + k) % 9 * 0.5) AS DOUBLE) AS sum_value
        |FROM documents, range(4) t(k)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "s08_stream_mu_modality" ->
      """WITH srcs AS (SELECT DISTINCT source FROM documents),
        |adt AS (
        |  SELECT COUNT(*) AS nnz,
        |         CAST(SUM((CAST(SUBSTRING(source, 4) AS INT) * 3 + k) % 5 * 1.0)
        |              AS DOUBLE) AS sum_value,
        |         COUNT(DISTINCT source) AS n_obs
        |  FROM srcs, range(4) t(k)),
        |rna AS (
        |  SELECT COUNT(*) AS nnz,
        |         CAST(SUM((doc_id + k * 2) % 9 * 0.5) AS DOUBLE) AS sum_value,
        |         COUNT(DISTINCT doc_id) AS n_obs
        |  FROM documents, range(4) t(k))
        |SELECT 'adt' AS modality, n_obs, nnz, sum_value FROM adt
        |UNION ALL SELECT 'rna', n_obs, nnz, sum_value FROM rna
        |ORDER BY modality""".stripMargin,

    "s07_stream_embed_ann" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |           FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(c.e, q.e), 6) AS sim
        |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 3),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |         ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM sims)
        |SELECT query_id, neighbor_id, sim, rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "s05_stream_interval_join" ->
      """SELECT p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
        |  p.value AS purchase_value
        |FROM events p JOIN events c ON p.user_id = c.user_id
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
        |ORDER BY p.user_id, purchase_ts, click_ts""".stripMargin,

    "m01_multimodal_decode" ->
      // the PNG encoder plans dims from md5(text) bytes 0..2, so what the
      // ImageIO decoder must read back is derivable from documents.text:
      // a dims mismatch anywhere in the encode->decode round-trip fails
      // the hash compare
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS b4,
        |    CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS b5,
        |    CAST(('0x' || substr(md5(text), 5, 2)) AS INTEGER) AS b6
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(8 + b4 % 16 AS INTEGER) AS width,
        |    CAST(8 + b5 % 16 AS INTEGER) AS height,
        |    CAST(1 + (b6 % 2) * 2 AS INTEGER) AS channels
        |  FROM b),
        |r AS (SELECT *, least(1.0, 16 / CAST(greatest(width, height) AS DOUBLE)) AS scale FROM m)
        |SELECT doc_id, width, height, channels,
        |  CAST(ceil(width * scale) AS INTEGER) AS target_width,
        |  CAST(ceil(height * scale) AS INTEGER) AS target_height,
        |  scale < 1.0 AS needs_resize
        |FROM r ORDER BY doc_id""".stripMargin,

    "l01_label_weights" ->
      """SELECT doc_id, lang,
        |  round(CAST(1.0 AS DOUBLE) / (count(*) OVER (PARTITION BY lang)), 9) AS label_weight
        |FROM documents ORDER BY doc_id""".stripMargin,

    "l02_mapped_routing" ->
      """SELECT CAST(doc_id % 2 AS INTEGER) AS store_idx,
        |  CAST(row_number() OVER (PARTITION BY doc_id % 2 ORDER BY doc_id) - 1 AS BIGINT) AS local_idx,
        |  doc_id, lang
        |FROM documents ORDER BY store_idx, local_idx""".stripMargin,

    "l04_worker_shard" ->
      """WITH m AS (
        |  SELECT CAST(doc_id % 2 AS INTEGER) AS store_idx,
        |    CAST(row_number() OVER (PARTITION BY doc_id % 2 ORDER BY doc_id) - 1 AS BIGINT) AS local_idx,
        |    doc_id
        |  FROM documents),
        |g AS (SELECT *, CAST(row_number() OVER (ORDER BY store_idx, local_idx) - 1 AS BIGINT) AS global_idx FROM m)
        |SELECT store_idx, local_idx, doc_id, global_idx,
        |  CAST(global_idx // 32 AS BIGINT) AS batch_idx,
        |  CAST((global_idx // 32) % 3 AS INTEGER) AS worker_id
        |FROM g ORDER BY global_idx""".stripMargin,

    "l03_mapped_filtered_encoded" ->
      """WITH m AS (
        |  SELECT CAST(doc_id % 2 AS INTEGER) AS store_idx,
        |    CAST(row_number() OVER (PARTITION BY doc_id % 2 ORDER BY doc_id) - 1 AS BIGINT) AS local_idx,
        |    doc_id, lang, source
        |  FROM documents),
        |dict AS (
        |  SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 AS INTEGER) AS code
        |  FROM (SELECT DISTINCT source FROM documents WHERE source <> 'src0')),
        |f AS (SELECT * FROM m WHERE lang IN ('en', 'fr'))
        |SELECT store_idx, local_idx, doc_id, lang,
        |  CAST(coalesce(d.code, -1) AS INTEGER) AS source_code
        |FROM f LEFT JOIN dict d USING (source)
        |ORDER BY store_idx, local_idx""".stripMargin,

    "m03_resize_roundtrip" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS b4,
        |    CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS b5,
        |    CAST(('0x' || substr(md5(text), 5, 2)) AS INTEGER) AS b6
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(8 + b4 % 16 AS INTEGER) AS w,
        |    CAST(8 + b5 % 16 AS INTEGER) AS h,
        |    CAST(1 + (b6 % 2) * 2 AS INTEGER) AS channels
        |  FROM b),
        |r AS (SELECT *, least(1.0, 12 / CAST(greatest(w, h) AS DOUBLE)) AS scale FROM m)
        |SELECT doc_id,
        |  CAST(ceil(w * scale) AS INTEGER) AS width,
        |  CAST(ceil(h * scale) AS INTEGER) AS height,
        |  channels
        |FROM r ORDER BY doc_id""".stripMargin,

    "m04_audio_meta" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS b4,
        |    CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS b5
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(8000 + (b4 % 8) * 1000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(16 AS INTEGER) AS bits,
        |  CAST(100 + b5 AS BIGINT) AS n_frames,
        |  CAST(100 + b5 AS DOUBLE) * 1000.0 / (8000 + (b4 % 8) * 1000) AS duration_ms
        |FROM b ORDER BY doc_id""".stripMargin,

    "m02_frame_sample" ->
      """SELECT doc_id, unnest(range(0, least(n_chars % 100 + 1 - 1, 70) + 1, 10)) AS frame_idx
        |FROM (SELECT doc_id, n_chars FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}

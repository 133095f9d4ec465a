package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing and event-time windowed aggregation.
  *
  * Multimodal contract: media payloads are opaque `binary` columns with
  * typed metadata alongside. All container parses are real — PNG
  * (signature + IHDR + CRC, m01/m03), WAV (RIFF/fmt/data, m04), MP4
  * (ISO-BMFF box walk, m06), and AVI frame walking (RIFF movi chunk
  * index, m02) — byte-for-byte in mapPartitions paths; only
  * codec-level pixel/sample decode is out of scope (this container
  * has no codecs). See graft.multimodal.MediaPipeline.
  */
object Media {

  import Num.{dsum, sqlDsum}

  // ---------------------------------------------------------------------
  // M1 — multimodal metadata extraction over a binary payload column,
  // REAL image path: each doc gets a spec-valid synthetic PNG whose
  // IHDR encodes doc_id-derived dimensions, and the pipeline parses
  // the actual bytes back out (signature + IHDR + CRC check) inside
  // mapPartitions. The oracle recomputes the dimensions from doc_id
  // directly — so what the gate verifies is that the PNG write→parse
  // round trip over the binary column is lossless. The WAV (m04), MP4
  // (m06), and AVI-frame (m02) paths follow the same pattern; see
  // graft.multimodal.MediaPipeline.
  // ---------------------------------------------------------------------
  private def syntheticPngs(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[graft.multimodal.MediaPipeline.MediaRow] = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => MediaPipeline.MediaRow(id, MediaPipeline.pngBytes(
        (320 + id % 1280).toInt, (240 + id * 7 % 720).toInt)))
  }
  private def m01(s: SparkSession, d: String): DataFrame = {
    graft.multimodal.MediaPipeline.extractMeta(syntheticPngs(s, d)).toDF()
      .select(col("media_id").as("doc_id"), col("byte_len"), col("width"),
        col("height"), col("frames"), col("codec"))
      .orderBy("doc_id")
  }
  private val m01Sql =
    s"""SELECT doc_id,
       |  ${graft.multimodal.MediaPipeline.SyntheticPngLen} AS byte_len,
       |  320 + doc_id % 1280 AS width,
       |  240 + (doc_id * 7) % 720 AS height,
       |  1 AS frames, 'png' AS codec
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // M6 — video metadata extraction over REAL ISO-BMFF (MP4) headers:
  // each doc gets a spec-valid ftyp+moov prefix whose mvhd/tkhd boxes
  // encode doc_id-derived timescale/duration/dimensions, and the
  // pipeline walks the actual box structure back out inside
  // mapPartitions (m01/m04's round-trip pattern — with this, all
  // three modalities parse real container bytes; only codec-level
  // pixel/sample decode stays out of scope). The oracle recomputes
  // the fields from doc_id, so the gate proves the box write→parse
  // loop lossless, including the 16.16 fixed-point dimension encode.
  // ---------------------------------------------------------------------
  private def m06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    val vids = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => MediaPipeline.MediaRow(id, MediaPipeline.mp4Bytes(
        (320 + id % 1280).toInt, (240 + id * 7 % 720).toInt,
        600, (((id % 3600) + 1) * 600).toInt)))
    MediaPipeline.extractVideoMeta(vids).toDF()
      .select(col("media_id").as("doc_id"), col("timescale"),
        col("duration_units"),
        expr("duration_units div timescale").as("duration_s"),
        col("width"), col("height"))
      .orderBy("doc_id")
  }
  private val m06Sql =
    """SELECT doc_id, 600 AS timescale,
      |  ((doc_id % 3600) + 1) * 600 AS duration_units,
      |  (doc_id % 3600) + 1 AS duration_s,
      |  320 + doc_id % 1280 AS width,
      |  240 + (doc_id * 7) % 720 AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // ST1 — event-time tumbling-window aggregation (batch form; the
  // streaming form with watermarks lives in graft.streaming and is
  // asserted equal to this in tests).
  // ---------------------------------------------------------------------
  private def st01(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type")
  }
  private val st01Sql =
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
       |  COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""
      .stripMargin

  // ---------------------------------------------------------------------
  // ST4 — event-time SLIDING windows (2 h window, 1 h slide): st01's
  // tumbling form generalized to overlap. Spark's `window()` assigns
  // each event to its duration/slide covering windows executor-side (a
  // 2× row expansion here — never a self-join); the oracle enumerates
  // the same two epoch-aligned starts per event. Streaming form is the
  // identical expression under readStream + watermark (same parity
  // contract as st01, EventStreamSpec).
  // ---------------------------------------------------------------------
  private def st04(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")
  }
  private val st04Sql =
    s"""WITH w AS (
       |  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR
       |           AS window_start,
       |         event_type, value
       |  FROM events, UNNEST([0, 1]) AS t(k))
       |SELECT window_start, event_type, COUNT(*) AS n_events,
       |  ${sqlDsum("value")} AS total_value
       |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"""
      .stripMargin

  // ---------------------------------------------------------------------
  // ST5 — streaming exact dedup, batch form: the at-least-once
  // redelivery guard. Input replays every 20th event (the duplicate
  // delivery an ingestion retry produces); the SHARED
  // StreamDedup.dedup transform drops repeats on (user_id, event_id).
  // The streaming twin is `dropDuplicatesWithinWatermark` — state
  // bounded by the watermark horizon, eviction proven by
  // StreamDedupSpec — so this oracle row pins the semantics both
  // execution modes share. Output: per event_type, delivered vs
  // surviving row counts.
  // ---------------------------------------------------------------------
  private def st05(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"))
    val redelivered =
      ev.unionByName(ev.filter(col("event_id") % 20 === 0))
    val in = redelivered.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_delivered"))
    val out = graft.streaming.StreamDedup.dedup(redelivered)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_deduped"))
    in.join(out, Seq("event_type")).orderBy("event_type")
  }
  private val st05Sql =
    """WITH r AS (
      |  SELECT event_id, user_id, event_type FROM events
      |  UNION ALL
      |  SELECT event_id, user_id, event_type FROM events
      |  WHERE event_id % 20 = 0),
      |i AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_delivered
      |  FROM r GROUP BY 1),
      |o AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_deduped
      |  FROM (SELECT DISTINCT user_id, event_id, event_type FROM r)
      |  GROUP BY 1)
      |SELECT i.event_type, n_delivered, n_deduped
      |FROM i JOIN o USING (event_type) ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // ST6 — stream-static enrichment, batch form: the SHARED
  // Enrich.bySegment transform (purchase events decorated with the
  // customer dimension, rolled up per market segment). The streaming
  // twin plans the same broadcast hash join fresh per micro-batch —
  // no watermark, no join state, zero shuffle of the stream
  // (EnrichSpec proves batch≡stream). This oracle row pins the
  // numbers both modes must produce.
  // ---------------------------------------------------------------------
  private def st06(s: SparkSession, d: String): DataFrame =
    graft.streaming.Enrich.bySegment(Tables.events(s, d),
        Tables.customer(s, d))
      .orderBy("c_mktsegment")
  private val st06Sql =
    """SELECT c.c_mktsegment, COUNT(*) AS n_purchases,
      |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS VARCHAR)
      |    AS DOUBLE) AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE e.event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // M2 — frame sampling over REAL container bytes: each doc gets a
  // spec-valid MJPEG-style AVI (RIFF → hdrl/avih → movi with one 00dc
  // chunk per frame, doc_id-derived frame count and sizes), and the
  // pipeline WALKS the actual chunk structure back out inside
  // mapPartitions — every 2nd frame's true in-file offset, length,
  // and first data byte (m01/m04/m06's round-trip pattern, now for
  // the frame index itself). The oracle recomputes offsets from
  // doc_id by the same cumulative chunk arithmetic, so the gate
  // proves the AVI write→walk loop lossless including RIFF word
  // alignment. Only the codec-level pixel decode of each located
  // frame is out of scope (no codecs in this container).
  // ---------------------------------------------------------------------
  private def m02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    val avis = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => MediaPipeline.MediaRow(id, MediaPipeline.aviBytes(
        (1 + id % 30).toInt,
        i => (16 + (id + i) % 32).toInt,
        i => ((id + i) % 251).toInt)))
    MediaPipeline.sampleFrames(avis, 2).toDF()
      .select(col("media_id").as("doc_id"), col("frame_idx"),
        col("offset"), col("byte_len"), col("feature"))
      .orderBy("doc_id", "frame_idx")
  }
  private val m02Sql = {
    val base = graft.multimodal.MediaPipeline.AviMoviStart + 8
    s"""WITH f AS (
       |  SELECT doc_id, CAST(j AS INTEGER) AS frame_idx,
       |    16 + (doc_id + j) % 32 AS len
       |  FROM documents,
       |    unnest(generate_series(0, doc_id % 30)) AS t(j)),
       |o AS (
       |  SELECT doc_id, frame_idx, len,
       |    CAST($base + COALESCE(SUM(8 + len + len % 2) OVER (
       |      PARTITION BY doc_id ORDER BY frame_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS "offset"
       |  FROM f)
       |SELECT doc_id, frame_idx, "offset",
       |  CAST(len AS INTEGER) AS byte_len,
       |  CAST((doc_id + frame_idx) % 251 AS DOUBLE) / 255.0 AS feature
       |FROM o WHERE frame_idx % 2 = 0
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  // ---------------------------------------------------------------------
  // M3 — resize planning: letterbox each PNG-decoded image (real
  // header parse — m01's round trip) into the model's square input
  // (224×224), preserving aspect ratio. All integer arithmetic (scaled
  // multiply + floor division), so the plan is exact in both engines —
  // the real resize kernel would execute this plan inside
  // MediaPipeline's partition-parallel decode.
  // ---------------------------------------------------------------------
  private val TargetSide = 224

  private def m03(s: SparkSession, d: String): DataFrame = {
    graft.multimodal.MediaPipeline.extractMeta(syntheticPngs(s, d)).toDF()
      .select(col("media_id").as("doc_id"), col("width"), col("height"))
      .withColumn("long_side", greatest(col("width"), col("height")))
      .withColumn("out_w", expr(s"(width * $TargetSide) div long_side"))
      .withColumn("out_h", expr(s"(height * $TargetSide) div long_side"))
      .withColumn("pad_x", expr(s"($TargetSide - out_w) div 2"))
      .withColumn("pad_y", expr(s"($TargetSide - out_h) div 2"))
      .withColumn("upscaled", col("long_side") < TargetSide)
      .select("doc_id", "width", "height", "out_w", "out_h",
        "pad_x", "pad_y", "upscaled")
      .orderBy("doc_id")
  }
  private val m03Sql =
    s"""WITH d AS (
       |  SELECT doc_id, 320 + doc_id % 1280 AS width,
       |    240 + (doc_id * 7) % 720 AS height FROM documents),
       |r AS (SELECT *, GREATEST(width, height) AS long_side FROM d)
       |SELECT doc_id, width, height,
       |  (width * $TargetSide) // long_side AS out_w,
       |  (height * $TargetSide) // long_side AS out_h,
       |  ($TargetSide - (width * $TargetSide) // long_side) // 2 AS pad_x,
       |  ($TargetSide - (height * $TargetSide) // long_side) // 2 AS pad_y,
       |  long_side < $TargetSide AS upscaled
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // ST2 — gap-based sessionization (batch form): the same 1800 s gap
  // rule as streaming Sessionize (flatMapGroupsWithState), expressed as
  // lag → new-session flag → running sum, all windows partitioned by
  // user (scale = shuffle on user_id once, never a global sort). Gap
  // math is in integer epoch-micros — the precision contract the
  // streaming twin documents — so both engines agree exactly.
  // ---------------------------------------------------------------------
  private val GapUs = 1800L * 1000000L

  private def st02(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("tus"))
    Tables.events(s, d)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("prev", lag(col("tus"), 1).over(wUser))
      .withColumn("is_new",
        when(col("prev").isNull ||
          col("tus") - col("prev") > GapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id", "session_idx")
  }
  private val st02Sql =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, value FROM events),
       |m AS (
       |  SELECT user_id, tus, value,
       |    CASE WHEN lag(tus) OVER w IS NULL
       |           OR tus - lag(tus) OVER w > $GapUs
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
       |s AS (
       |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS session_idx
       |  FROM m)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  COUNT(*) AS n_events, MIN(tus) AS start_us, MAX(tus) AS end_us,
       |  ${sqlDsum("value")} AS total_value
       |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------------
  // ST3 — stream-stream interval join (batch form): purchases
  // attributed to a preceding view by the same user within 30 minutes.
  // The SAME graft.streaming.StreamJoin.attributed transform runs as a
  // watermarked two-stream join (state bounded to the horizon — proven
  // by StreamJoinSpec's eviction test); this batch twin pins the pair
  // semantics against the oracle. Plan: equi-join on user_id (one keyed
  // shuffle) with the time bound as a residual — never a theta join.
  // Output timestamps in integer epoch-micros, the precision contract
  // both engines agree on exactly.
  // ---------------------------------------------------------------------
  private def st03(s: SparkSession, d: String): DataFrame = {
    graft.streaming.StreamJoin.attributed(Tables.events(s, d))
      .select(col("user_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("purchase_value"))
      .orderBy("user_id", "view_us", "purchase_us")
  }
  private val st03Sql =
    """WITH v AS (
      |  SELECT user_id, epoch_us(ts) AS view_us FROM events
      |  WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, epoch_us(ts) AS purchase_us, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT v.user_id AS user_id, view_us, purchase_us,
      |       p.value AS purchase_value
      |FROM v JOIN p ON v.user_id = p.user_id
      |  AND purchase_us >= view_us
      |  AND purchase_us <= view_us + 1800000000
      |ORDER BY user_id, view_us, purchase_us""".stripMargin

  // ---------------------------------------------------------------------
  // ST7 — left-outer stream-stream interval join (batch form): views
  // with NO purchase inside the attribution window surface as
  // null-matched rows — the conversion-failure/abandonment stream.
  // The streaming twin (StreamJoin.startOuter) can only emit those
  // nulls after the watermark proves no match can still arrive;
  // StreamJoinSpec pins that trailing-emission behavior and the final
  // stream≡batch row set. Same one-keyed-shuffle plan as st03 with
  // left_outer semantics.
  // ---------------------------------------------------------------------
  private def st07(s: SparkSession, d: String): DataFrame = {
    graft.streaming.StreamJoin.attributedOuter(Tables.events(s, d))
      .select(col("user_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("purchase_value"),
        col("purchase_ts").isNotNull.as("converted"))
      .orderBy("user_id", "view_us", "purchase_us")
  }
  private val st07Sql =
    """WITH v AS (
      |  SELECT user_id, epoch_us(ts) AS view_us FROM events
      |  WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id AS p_user_id, epoch_us(ts) AS purchase_us,
      |         value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT v.user_id AS user_id, view_us, purchase_us,
      |       p.value AS purchase_value,
      |       purchase_us IS NOT NULL AS converted
      |FROM v LEFT JOIN p ON v.user_id = p.p_user_id
      |  AND purchase_us >= view_us
      |  AND purchase_us <= view_us + 1800000000
      |ORDER BY user_id, view_us, purchase_us""".stripMargin

  // ---------------------------------------------------------------------
  // M4 — audio chunking over REAL WAV headers (m01's round-trip
  // pattern for audio): each doc gets a spec-valid PCM WAV header
  // with doc_id-derived rate/length, the pipeline parses the actual
  // RIFF/fmt/data fields back out inside mapPartitions, then splits
  // into fixed 10-second windows (the segmentation step before
  // feature extraction / ASR batching). Chunk boundaries are pure
  // integer arithmetic; the 1→N explode is the same generator shape
  // as m02 — per-row work, zero shuffle. The last chunk is ragged
  // (end clamped to n_samples), which the oracle pins exactly; the
  // oracle recomputes rate/length from doc_id, so the gate proves the
  // WAV write→parse loop lossless.
  // ---------------------------------------------------------------------
  private def m04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    val wavs = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => MediaPipeline.MediaRow(id, MediaPipeline.wavBytes(
        if (id % 2 == 0) 16000 else 44100, 1, (id % 997 + 1) * 4000)))
    MediaPipeline.extractAudioMeta(wavs).toDF()
      .select(col("media_id").as("doc_id"), col("sample_rate"),
        col("n_samples"))
      .withColumn("chunk_samples", col("sample_rate").cast("long") * 10)
      .withColumn("chunk_idx", explode(expr(
        "sequence(0, (n_samples - 1) div chunk_samples)")))
      .select(col("doc_id"), col("sample_rate"), col("chunk_idx"),
        (col("chunk_idx") * col("chunk_samples")).as("start_sample"),
        least(col("chunk_idx") * col("chunk_samples")
          + col("chunk_samples"), col("n_samples")).as("end_sample"))
      .orderBy("doc_id", "chunk_idx")
  }
  private val m04Sql =
    """WITH a AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END
      |      AS sample_rate,
      |    (doc_id % 997 + 1) * 4000 AS n_samples
      |  FROM documents),
      |c AS (SELECT *, CAST(sample_rate AS BIGINT) * 10
      |        AS chunk_samples FROM a)
      |SELECT doc_id, sample_rate,
      |  unnest(generate_series(0, (n_samples - 1) // chunk_samples))
      |    AS chunk_idx,
      |  unnest(generate_series(0, (n_samples - 1) // chunk_samples))
      |    * chunk_samples AS start_sample,
      |  LEAST(unnest(generate_series(0, (n_samples - 1) // chunk_samples))
      |    * chunk_samples + chunk_samples, n_samples) AS end_sample
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------
  // M5 — perceptual-hash near-dup over media payloads: the image-dedup
  // member of the dedup family (same banding discipline as x03's
  // SimHash). The "pHash" is a deterministic 20-bit stand-in derived
  // from the payload via the native PolyHash kernel (no codecs in this
  // container — a real deploy swaps in a pHash/dHash decode inside
  // MediaPipeline and NOTHING else changes). Near-dup = Hamming ≤ 1
  // over the 20 bits: split into two 10-bit bands, docs sharing a band
  // bucket are candidates (pigeonhole: ≤1 wrong bit leaves one band
  // intact → exact recall), each bucket size-capped as the skew guard,
  // and pairs are emitted exactly once via a first-matching-band
  // FILTER (pos 0, or pos 1 only when the low bands differ) — never a
  // distinct-pairs shuffle. Never all-pairs at any scale.
  // ---------------------------------------------------------------------
  private def m05(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("ph",
        pmod(graft.functions.PolyHash(col("payload").cast("string")),
          lit(1048576L)))
      .select(col("doc_id"), col("ph"))
    val banded = docs.select(col("doc_id"), col("ph"),
      posexplode(array(pmod(col("ph"), lit(1024L)),
        expr("ph div 1024"))).as(Seq("pos", "band")))
    val capped = banded.withColumn("__n",
        count(lit(1)).over(Window.partitionBy("pos", "band")))
      .filter(col("__n") <= 2000).drop("__n")
    val a = capped.select(col("pos"), col("band"),
      col("doc_id").as("a"), col("ph").as("pha"))
    val b = capped.select(col("pos"), col("band"),
      col("doc_id").as("b"), col("ph").as("phb"))
    a.join(b, Seq("pos", "band")).filter(col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(pha ^ phb)"))
      .filter(col("hamming") <= 1)
      .filter(col("pos") === 0 ||
        pmod(col("pha"), lit(1024L)) =!= pmod(col("phb"), lit(1024L)))
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a")).as("n_left_docs"))
      .orderBy("hamming")
  }
  private val m05Sql =
    """WITH ph AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(list_filter(string_split(text, ''),
      |          ch -> ch <> ''),
      |          ch -> CAST(unicode(ch) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 1000000007) % 1048576 AS ph
      |  FROM documents),
      |banded AS (
      |  SELECT doc_id, ph, 0 AS pos, ph % 1024 AS band FROM ph
      |  UNION ALL
      |  SELECT doc_id, ph, 1, ph // 1024 FROM ph),
      |capped AS (
      |  SELECT * FROM banded
      |  QUALIFY COUNT(*) OVER (PARTITION BY pos, band) <= 2000),
      |pairs AS (
      |  SELECT x.pos, x.ph AS pha, y.ph AS phb,
      |         x.doc_id AS a, y.doc_id AS b,
      |         bit_count(xor(x.ph, y.ph)) AS hamming
      |  FROM capped x JOIN capped y
      |    ON x.pos = y.pos AND x.band = y.band AND x.doc_id < y.doc_id)
      |SELECT hamming, COUNT(*) AS n_pairs,
      |  COUNT(DISTINCT a) AS n_left_docs
      |FROM pairs
      |WHERE hamming <= 1
      |  AND (pos = 0 OR pha % 1024 <> phb % 1024)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // M7 — cross-modality token budgeting: the mix-planning step a
  // multimodal training run executes over its media METADATA (never
  // the payloads — the whole point of the metadata extract is that
  // planning touches bytes_per_item-sized rows, not the 100 TB of
  // media). Each modality's token cost comes from its own real
  // container walk (PNG header, WAV fmt/data chunks, MP4 mvhd):
  // images cost a fixed 256 patch tokens; audio 50 tokens/second at
  // the walked sample rate ((50·n_samples) div sample_rate — exact);
  // video 256 tokens/second of walked duration. Per modality the plan
  // reports item count, token mass, exact-ppm share of the corpus,
  // the fixed target mix (image 40% / audio 30% / video 30% of a 1M
  // budget) and the coverage that allocation actually buys
  // (alloc capped at the available mass; keep_frac in ppm).
  // Scale: three metadata scans union into ONE 3-row rollup; the
  // grand-total is a 1-row scalar crossJoin (a17's pattern).
  // ---------------------------------------------------------------------
  private def m07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    val ids = Tables.documents(s, d).select(col("doc_id")).as[Long]
    val imgs = MediaPipeline.extractMeta(
      ids.filter(col("doc_id") % 3 === 0).map(id =>
        MediaPipeline.MediaRow(id, MediaPipeline.pngBytes(
          (320 + id % 1280).toInt, (240 + id * 7 % 720).toInt)))).toDF()
      .select(lit("image").as("modality"), lit(256L).as("tok"))
    val auds = MediaPipeline.extractAudioMeta(
      ids.filter(col("doc_id") % 3 === 1).map(id =>
        MediaPipeline.MediaRow(id, MediaPipeline.wavBytes(
          if (id % 2 == 0) 16000 else 44100, 1,
          (id % 997 + 1) * 4000)))).toDF()
      .select(lit("audio").as("modality"),
        expr("(50L * n_samples) div sample_rate").as("tok"))
    val vids = MediaPipeline.extractVideoMeta(
      ids.filter(col("doc_id") % 3 === 2).map(id =>
        MediaPipeline.MediaRow(id, MediaPipeline.mp4Bytes(
          (320 + id % 1280).toInt, (240 + id * 7 % 720).toInt,
          600, (((id % 3600) + 1) * 600).toInt)))).toDF()
      .select(lit("video").as("modality"),
        expr("256L * (duration_units div timescale)").as("tok"))
    val per = imgs.union(auds).union(vids)
      .groupBy("modality")
      .agg(count(lit(1)).as("n_items"), sum("tok").as("total_tok"))
    val grand = per.agg(sum("total_tok").as("grand_tok"))
    per.crossJoin(broadcast(grand))
      .withColumn("share_ppm",
        expr("(1000000L * total_tok) div grand_tok"))
      .withColumn("target_ppm", expr(
        "CASE modality WHEN 'image' THEN 400000L " +
          "WHEN 'audio' THEN 300000L ELSE 300000L END"))
      // with a 1M-token budget, the target token count IS target_ppm
      .withColumn("alloc_tok", least(col("total_tok"), col("target_ppm")))
      .withColumn("keep_frac_ppm",
        expr("(1000000L * alloc_tok) div total_tok"))
      .select("modality", "n_items", "total_tok", "share_ppm",
        "target_ppm", "alloc_tok", "keep_frac_ppm")
      .orderBy("modality")
  }
  private val m07Sql =
    """WITH costs AS (
      |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
      |           WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    CASE doc_id % 3
      |      WHEN 0 THEN 256
      |      WHEN 1 THEN (50 * ((doc_id % 997 + 1) * 4000))
      |        // (CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END)
      |      ELSE 256 * ((((doc_id % 3600) + 1) * 600) // 600) END AS tok
      |  FROM documents),
      |per AS (
      |  SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_items,
      |    CAST(SUM(tok) AS BIGINT) AS total_tok
      |  FROM costs GROUP BY 1),
      |grand AS (SELECT CAST(SUM(total_tok) AS BIGINT) AS grand_tok
      |          FROM per)
      |SELECT modality, n_items, total_tok,
      |  (1000000 * total_tok) // grand_tok AS share_ppm,
      |  CAST(CASE modality WHEN 'image' THEN 400000
      |    WHEN 'audio' THEN 300000 ELSE 300000 END AS BIGINT)
      |    AS target_ppm,
      |  LEAST(total_tok,
      |    CAST(CASE modality WHEN 'image' THEN 400000
      |      WHEN 'audio' THEN 300000 ELSE 300000 END AS BIGINT))
      |    AS alloc_tok,
      |  (1000000 * LEAST(total_tok,
      |    CAST(CASE modality WHEN 'image' THEN 400000
      |      WHEN 'audio' THEN 300000 ELSE 300000 END AS BIGINT)))
      |    // total_tok AS keep_frac_ppm
      |FROM per CROSS JOIN grand
      |ORDER BY modality""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("m01_multimodal_meta", Some(m01Sql), m01),
    QueryDef("m07_modality_mix", Some(m07Sql), m07),
    QueryDef("m05_phash_neardup", Some(m05Sql), m05),
    QueryDef("m02_frame_sample", Some(m02Sql), m02),
    QueryDef("m03_resize_plan", Some(m03Sql), m03),
    QueryDef("m04_audio_chunks", Some(m04Sql), m04),
    QueryDef("m06_video_meta", Some(m06Sql), m06),
    QueryDef("st01_event_windows", Some(st01Sql), st01),
    QueryDef("st04_sliding_windows", Some(st04Sql), st04),
    QueryDef("st05_stream_dedup", Some(st05Sql), st05),
    QueryDef("st06_stream_enrich", Some(st06Sql), st06),
    QueryDef("st02_sessionize", Some(st02Sql), st02),
    QueryDef("st03_stream_join", Some(st03Sql), st03),
    QueryDef("st07_outer_attribution", Some(st07Sql), st07)
  )
}

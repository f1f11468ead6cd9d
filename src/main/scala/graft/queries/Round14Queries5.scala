package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.{ImageCodec, MediaSynth}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 wave 5: the multimodal intake tier over the real codecs —
  * streaming perceptual-signature admission (x367), WAV decimation through
  * the real RIFF parse (x368), and the multimodal curation capstone
  * composing decode, quality gates, and perceptual dedup in one dataflow
  * (x369). */
object Round14Queries5 {

  /** x367: STREAMING media intake gate — the media twin of the SimHash
    * text gate: each arriving video is decoded for real, its 15-bit dHash
    * is the admission bucket, and `nearDupGate`'s keyed state holds the
    * first-seen canonical per signature so perceptual repeats drop at
    * ingestion time instead of in a batch dedup pass. Three ascending
    * doc_id slices stand in for CDC arrival order, so the streamed
    * verdicts equal the batch rule (min doc_id per signature) — the same
    * equivalence the offset-CDC connector guarantees. Scale: state is one
    * Long per DISTINCT signature (bounded by the hash space, not the
    * corpus); decode is partition-local. */
  def streamMediaGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x367").toString
    // r16: snapshot once — the max() probe + three staged slices each
    // re-scanned documents before
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      .localCheckpoint(true)
    val n = docs.agg(max($"doc_id")).head().getLong(0)
    val cuts = Seq(n / 3, 2 * n / 3)
    val bounds = (Long.MinValue +: cuts) zip (cuts :+ Long.MaxValue)
    QueryUtil.stageFrames(bounds.map { case (lo, hi) =>
      docs.filter($"doc_id" >= lo && $"doc_id" < hi)
    }, s"$base/src")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val sigs = MediaSynth.dhashReal(MediaSynth.synthVideos(stream))
      .map(h => (h.doc_id, h.phash.toLong))
    val verdicts = graft.streaming.IncrementalStream.nearDupGate(sigs)
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, verdicts.toDF(), base, "append")
    }
    QueryUtil.deleteRecursively(base)
    import org.apache.spark.sql.functions.col
    emitted.select(col("doc_id"), col("bucket"),
      col("is_first").cast("int").as("is_first"), col("canonical"))
      .orderBy("doc_id")
  }

  private val streamMediaGateOracle =
    MediaOracleSql.dhashCtes + s""",
       |canon AS (SELECT phash, min(doc_id) AS canonical FROM dh GROUP BY phash)
       |SELECT dh.doc_id, dh.phash AS bucket,
       |       CAST(dh.doc_id = canon.canonical AS INTEGER) AS is_first,
       |       canon.canonical
       |FROM dh JOIN canon ON canon.phash = dh.phash
       |ORDER BY dh.doc_id""".stripMargin

  /** x368: audio decimation through the REAL RIFF parse — decode the WAV,
    * halve the sample rate (mean of adjacent pairs, truncating integer;
    * odd tail passes through), re-encode, re-decode, emit the audited
    * stats. Both encode passes and both chunk walks sit in the oracle
    * path: a length/offset defect anywhere in the WAV layer diverges
    * n_out/bytes_out, an arithmetic defect diverges energy_out. */
  def wavDownsample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)].map { case (docId, text) =>
        val pcm = ImageCodec.decodeWav(ImageCodec.encodeWav(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 8000))
        val in = pcm.samples
        // ascii() oracle ⇒ ASCII-only fixture contract; fail loudly (x361)
        require(in.length == text.length,
          s"doc $docId: non-ASCII text — x368's ascii() oracle does not apply")
        val nOut = (in.length + 1) / 2
        val out = new Array[Byte](nOut)
        var k = 0
        while (k < nOut) {
          val a = in(2 * k) & 0xff
          out(k) = (if (2 * k + 1 < in.length) (a + (in(2 * k + 1) & 0xff)) / 2
                    else a).toByte
          k += 1
        }
        val re = ImageCodec.decodeWav(ImageCodec.encodeWav(out, 4000))
        var energy = 0L
        re.samples.foreach(b => energy += (b & 0xff))
        (docId, in.length, re.samples.length, re.sampleRate, energy,
          44 + re.samples.length)
      }.toDF("doc_id", "n_in", "n_out", "rate_out", "energy_out", "bytes_out")
      .orderBy("doc_id")
  }

  private val wavDownsampleOracle =
    s"""WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |d AS (SELECT doc_id, n, (n + 1) // 2 AS nout,
       |        coalesce(list_sum(list_transform(range(0, (n + 1) // 2), k ->
       |          CASE WHEN 2 * k + 2 <= n
       |               THEN (ascii(substr(text, CAST(2 * k + 1 AS INTEGER), 1))
       |                     + ascii(substr(text, CAST(2 * k + 2 AS INTEGER), 1))) // 2
       |               ELSE ascii(substr(text, CAST(2 * k + 1 AS INTEGER), 1)) END)), 0) AS energy
       |      FROM c)
       |SELECT doc_id, CAST(n AS INTEGER) AS n_in, CAST(nout AS INTEGER) AS n_out,
       |       4000 AS rate_out, CAST(energy AS BIGINT) AS energy_out,
       |       CAST(44 + nout AS INTEGER) AS bytes_out
       |FROM d
       |ORDER BY doc_id""".stripMargin

  /** Mean-luma admission band for x369 (cross-multiplied integers: a doc
    * passes when LumaLo * n_pixels <= luma_sum <= LumaHi * n_pixels).
    * md5 pixels average ~127.5 with per-doc-mean sd ~6, so the band
    * admits a nontrivial fraction on both sides at every SF. */
  private val LumaLo = 124L
  private val LumaHi = 131L

  /** x369: multimodal curation capstone v1 — the composed intake pipeline
    * a vision-language corpus runs, one dataflow over the REAL decode:
    * (1) parse every frame; (2) exposure gate on mean luma (exact
    * cross-multiplied band); (3) liveness gate n_frames >= 2 (stills
    * can't motion-sample); (4) perceptual dedup among the gate-passers —
    * canonical = min doc_id per 15-bit dHash. Emits the full per-doc
    * audit (gate flags + canonicality + final admission), ONE oracle
    * statement over the shared pixel CTEs. Scale: stages share a single
    * decode; dedup is a signature groupBy, never pairwise. */
  def mediaCurationV1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vids = MediaSynth.synthVideos(Tables.documents(spark, dir))
      .localCheckpoint(true) // decode feeds two consumers (meta + dhash)
    val meta = MediaSynth.decodeVideoMeta(vids).toDF()
      .select($"doc_id", $"width", $"height", $"n_frames", $"luma_sum")
      .withColumn("n_pixels",
        $"width".cast("long") * $"height" * $"n_frames")
      .withColumn("pass_luma",
        ($"luma_sum" >= lit(LumaLo) * $"n_pixels" &&
          $"luma_sum" <= lit(LumaHi) * $"n_pixels").cast("int"))
      .withColumn("pass_frames", ($"n_frames" >= 2).cast("int"))
    val sigs = MediaSynth.dhashReal(vids).toDF()
    val gated = meta.join(sigs, "doc_id")
    val canon = gated.filter($"pass_luma" === 1 && $"pass_frames" === 1)
      .groupBy($"phash").agg(min($"doc_id").as("canonical"))
    gated.join(canon, Seq("phash"), "left")
      .select($"doc_id", $"pass_luma", $"pass_frames",
        when($"pass_luma" === 1 && $"pass_frames" === 1 && $"doc_id" === $"canonical", 1)
          .otherwise(0).as("admitted"))
      .orderBy("doc_id")
  }

  private val mediaCurationOracle =
    MediaOracleSql.dhashCtes + s""",
       |tot AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS luma_sum FROM lm GROUP BY doc_id),
       |meta AS (SELECT s.doc_id, s.nf,
       |           CAST(s.w AS BIGINT) * s.h * s.nf AS n_pixels, t.luma_sum
       |         FROM s JOIN tot t ON t.doc_id = s.doc_id),
       |gates AS (SELECT m.doc_id, dh.phash,
       |            CASE WHEN m.luma_sum >= $LumaLo * m.n_pixels
       |                  AND m.luma_sum <= $LumaHi * m.n_pixels THEN 1 ELSE 0 END AS pass_luma,
       |            CASE WHEN m.nf >= 2 THEN 1 ELSE 0 END AS pass_frames
       |          FROM meta m JOIN dh ON dh.doc_id = m.doc_id),
       |canon AS (SELECT phash, min(doc_id) AS canonical FROM gates
       |          WHERE pass_luma = 1 AND pass_frames = 1 GROUP BY phash)
       |SELECT g.doc_id, g.pass_luma, g.pass_frames,
       |       CASE WHEN g.pass_luma = 1 AND g.pass_frames = 1
       |             AND g.doc_id = c.canonical THEN 1 ELSE 0 END AS admitted
       |FROM gates g LEFT JOIN canon c ON c.phash = g.phash
       |ORDER BY g.doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x367_stream_media_gate",
      "streaming media admission: real-decode dHash signatures through the keyed first-seen gate, CDC arrival == batch min-id rule (X7+X6)",
      streamMediaGate, Some(streamMediaGateOracle)),
    QueryDef("x368_wav_downsample",
      "audio decimation through the real RIFF parse: decode -> halve rate (pair means) -> re-encode -> audited stats (X7)",
      wavDownsample, Some(wavDownsampleOracle)),
    QueryDef("x369_media_curation_v1",
      "multimodal curation capstone: one decode feeding exposure gate + liveness gate + perceptual dedup, one oracle statement (X7+X1)",
      mediaCurationV1, Some(mediaCurationOracle)))
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 fifty-fifth tier: audio fingerprint matching (x232) — the
  * Shazam-style landmark-pair hash over x72's window stage, the
  * multimodal family's near-dup detector for AUDIO (x74's pHash is the
  * image analogue). */
object Round10Queries55 {

  /** Landmark pairing fan-out bound (windows). */
  private val FpMaxDelta = 8L

  /** Published matches. */
  private val FpTop = 20

  /** x232: audio fingerprint matching — the constellation recipe on the
    * stubbed sample stream: (1) x72's overlapping windows (the typed
    * partition-local decode), (2) landmark windows = strict local peak
    * maxima vs both neighbors, (3) fingerprints = (peak₁, peak₂, Δt)
    * packed into one integer for each landmark and its successor within
    * [[FpMaxDelta]] windows, (4) docs sharing a fingerprint pair up and
    * rank by shared-print count. Every stage is exact integer
    * arithmetic over the deterministic fake audio; a real codec swaps
    * in behind stage 1 (the Multimodal contract).
    *
    * Scale: landmarks are a per-doc window pass (one doc_id-keyed
    * exchange shared with the lag/lead); the match join is an
    * equi-join on the fingerprint key with hot-print capping handled
    * by the landmark sparsity (strict maxima thin the stream ~4×) —
    * the same blocked-join discipline as the LSH families. */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // Constructed probes (the x191/x130 convention): every 25th doc is
    // cloned into the negative keyspace with its first 64 bytes (two
    // hops) removed — the "same recording, later start" case landmark
    // fingerprints exist to catch. The dt-pairs are shift-invariant and
    // the 64-byte cut keeps the window grid aligned, so each clone MUST
    // share most prints with its original — the match list is provably
    // non-empty at every SF instead of hoping for natural collisions.
    val clones = docs.filter($"doc_id" % 25 === 0 && $"doc_id" > 0)
      .select((-$"doc_id").as("doc_id"), expr("substr(text, 65)").as("text"))
    val media = Multimodal.attachFakeMedia(
      docs.select($"doc_id", $"text").unionByName(clones))
    val win = Multimodal.audioWindows(media, frame = 64, hop = 32).toDF()
    val w = Window.partitionBy($"doc_id").orderBy($"win_idx")
    val landmarks = win
      .select($"doc_id", $"win_idx".cast("long").as("t"), $"energy",
        lag($"energy", 1).over(w).as("el"), lead($"energy", 1).over(w).as("er"))
      .filter($"el".isNotNull && $"er".isNotNull &&
        $"energy" > $"el" && $"energy" > $"er")
    val wl = Window.partitionBy($"doc_id").orderBy($"t")
    val prints = landmarks
      .select($"doc_id", $"t", ($"energy" % 4096L).as("p1"),
        (lead($"energy", 1).over(wl) % 4096L).as("p2"),
        (lead($"t", 1).over(wl) - $"t").as("dt"))
      .filter($"p2".isNotNull && $"dt" <= FpMaxDelta)
      .select($"doc_id", (($"p1" * 4096L + $"p2") * 16L + $"dt").as("fp"))
      .distinct()
      .localCheckpoint(true)
    val matches = prints.toDF("a", "fp")
      .join(prints.toDF("b", "fp"), "fp")
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_shared"))
    matches.withColumn("rk", row_number().over(
      Window.orderBy($"n_shared".desc, $"a", $"b")).cast("long"))
      .filter($"rk" <= FpTop)
      .select($"rk", $"a", $"b", $"n_shared")
      .orderBy($"rk")
  }

  private val audioFingerprintOracle = {
    val codes = "list_transform(range(k * 32 + 1, least(k * 32 + 64, n) + 1)," +
      " i -> ascii(substr(text, CAST(i AS INTEGER), 1)))"
    s"""WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents
       |           UNION ALL
       |           SELECT -doc_id, substr(text, 65), length(substr(text, 65))
       |           FROM documents WHERE doc_id % 25 = 0 AND doc_id > 0),
       |e AS (SELECT doc_id, text, n, unnest(range(0, ((n - 1) // 32) + 1)) AS k
       |      FROM c WHERE n > 0),
       |win AS MATERIALIZED (
       |  SELECT doc_id, CAST(k AS BIGINT) AS t,
       |         CAST(list_sum($codes) AS BIGINT) AS energy
       |  FROM e),
       |landmarks AS MATERIALIZED (
       |  SELECT doc_id, t, energy FROM (
       |    SELECT doc_id, t, energy,
       |           lag(energy) OVER w AS el, lead(energy) OVER w AS er
       |    FROM win WINDOW w AS (PARTITION BY doc_id ORDER BY t)) x
       |  WHERE el IS NOT NULL AND er IS NOT NULL
       |    AND energy > el AND energy > er),
       |prints AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, (p1 * 4096 + p2) * 16 + dt AS fp FROM (
       |    SELECT doc_id, energy % 4096 AS p1,
       |           lead(energy) OVER w2 % 4096 AS p2,
       |           lead(t) OVER w2 - t AS dt
       |    FROM landmarks WINDOW w2 AS (PARTITION BY doc_id ORDER BY t)) y
       |  WHERE p2 IS NOT NULL AND dt <= $FpMaxDelta),
       |matches AS (
       |  SELECT pa.doc_id AS a, pb.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM prints pa JOIN prints pb ON pa.fp = pb.fp AND pa.doc_id < pb.doc_id
       |  GROUP BY pa.doc_id, pb.doc_id)
       |SELECT rk, a, b, n_shared FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY n_shared DESC, a, b) AS BIGINT)
       |           AS rk, a, b, n_shared
       |  FROM matches) t
       |WHERE rk <= $FpTop
       |ORDER BY rk""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x232_audio_fingerprint",
      "Shazam-style landmark-pair audio fingerprints over x72 windows: strict local peaks, packed (p1,p2,dt) prints, top shared-print doc pairs",
      audioFingerprint, Some(audioFingerprintOracle)))
}

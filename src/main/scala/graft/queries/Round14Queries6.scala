package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 wave 6: three missing named operators — Aho–Corasick
  * multi-pattern scanning (x370), rendezvous/HRW shard routing with a
  * node-removal remap audit (x371), and merge-on-read deletion-vector
  * maintenance with a compaction decision (x372). */
object Round14Queries6 {

  /** x370's dictionary: literal patterns over the fixture vocabulary,
    * deliberately including substring-of-another-pattern cases ("an" in
    * "scan", "win" in "window", "der" in "order") — those matches are only
    * findable through the automaton's fail/output links — and two-token
    * phrases. */
  private val AcPatterns = Seq("scan", "an", "order", "der", "window",
    "win", "batch", "stream", "merge", "hash", "table scan", "key order")

  /** x370: Aho–Corasick multi-pattern scan — one O(N + matches) pass per
    * document counts ALL occurrences of every dictionary pattern (the
    * blocklist/PII/contamination-gate scan shape; x95's gate does term
    * joins, this is the byte-level scanner for patterns that need not be
    * whole tokens). The oracle counts positions i where
    * substr(text, i, len) = pattern — the same all-occurrences semantics,
    * O(N * P) in SQL, which is exactly why the engine side ships the
    * automaton. Full (doc x pattern) grid, zeros kept. */
  def ahoCorasickScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pats = AcPatterns // stable local for the closure
    Tables.documents(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)].mapPartitions { it =>
        val ac = new graft.operators.AhoCorasick(pats)
        it.flatMap { case (docId, text) =>
          val counts = ac.countAll(text)
          pats.indices.iterator.map(i => (docId, pats(i), counts(i)))
        }
      }.toDF("doc_id", "pattern", "n")
      .orderBy("doc_id", "pattern")
  }

  private val ahoCorasickOracle = {
    val patList = AcPatterns.map(p => s"'${p}'").mkString(", ")
    s"""WITH p AS (SELECT unnest([$patList]) AS pattern),
       |d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |cnt AS (SELECT d.doc_id, p.pattern,
       |          CAST(coalesce(list_sum(list_transform(
       |            range(1, greatest(d.n - length(p.pattern) + 2, 1)),
       |            i -> CASE WHEN substr(d.text, CAST(i AS INTEGER), length(p.pattern)) = p.pattern
       |                      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n
       |        FROM d CROSS JOIN p)
       |SELECT doc_id, pattern, n
       |FROM cnt
       |ORDER BY doc_id, pattern""".stripMargin
  }

  /** x371's node ring (weights equal) and the node whose removal the
    * audit replays. */
  private val HrwNodes = Seq("n0", "n1", "n2", "n3", "n4", "n5", "n6", "n7")
  private val HrwRemoved = "n3"

  /** x371: rendezvous (highest-random-weight) shard routing — the
    * shuffle-free assignment a 100 TB ingest tier uses so that adding or
    * removing a node remaps ONLY that node's keys (consistent-hashing's
    * guarantee without the ring): route(key) = argmax over nodes of
    * hash(key, node). Hash = first 8 md5 hex chars as an integer (the
    * x53 cross-engine recipe widened to 32 bits), ties broken by node
    * name. The audit routes every doc twice — full ring, then with n3
    * removed — and emits per-node loads plus moved-in counts; HRW's
    * minimal-disruption property materializes as moved_in = 0 everywhere
    * except keys that were ON the removed node (their per-node argmax
    * order among survivors is unchanged). */
  def rendezvousShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nodes = array(HrwNodes.map(lit): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"hv".desc, $"node")
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", explode(nodes).as("node"))
      .select($"doc_id", $"node",
        QueryUtil.md5Int(concat_ws("|", lit("hrw"), $"doc_id", $"node"), 8).as("hv"))
      .localCheckpoint(true) // both routings rank the same scored frame
    val full = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).select($"doc_id", $"node".as("shard_full"))
    val survivors = scored.filter($"node" =!= HrwRemoved)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).select($"doc_id", $"node".as("shard_after"))
    full.join(survivors, "doc_id")
      .groupBy($"shard_after")
      .agg(count(lit(1)).as("load_after"),
        sum(($"shard_full" === $"shard_after").cast("long")).as("stayed"),
        sum(($"shard_full" =!= $"shard_after").cast("long")).as("moved_in"),
        sum(($"shard_full" === HrwRemoved).cast("long")).as("from_removed"))
      .select($"shard_after".as("node"), $"load_after", $"stayed",
        $"moved_in", $"from_removed")
      .orderBy("node")
  }

  private val rendezvousOracle = {
    val nodeList = HrwNodes.map(n => s"'$n'").mkString(", ")
    s"""WITH nodes AS (SELECT unnest([$nodeList]) AS node),
       |scored AS (SELECT d.doc_id, nodes.node,
       |             CAST(${QueryUtil.md5IntSql("concat_ws('|', 'hrw', CAST(d.doc_id AS VARCHAR), nodes.node)", 8)} AS BIGINT) AS hv
       |           FROM documents d CROSS JOIN nodes),
       |full_r AS (SELECT doc_id, node AS shard_full
       |           FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hv DESC, node) AS rk
       |                 FROM scored) WHERE rk = 1),
       |surv AS (SELECT doc_id, node AS shard_after
       |         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hv DESC, node) AS rk
       |               FROM scored WHERE node <> '$HrwRemoved') WHERE rk = 1)
       |SELECT s.shard_after AS node,
       |       CAST(count(*) AS BIGINT) AS load_after,
       |       CAST(sum(CASE WHEN f.shard_full = s.shard_after THEN 1 ELSE 0 END) AS BIGINT) AS stayed,
       |       CAST(sum(CASE WHEN f.shard_full <> s.shard_after THEN 1 ELSE 0 END) AS BIGINT) AS moved_in,
       |       CAST(sum(CASE WHEN f.shard_full = '$HrwRemoved' THEN 1 ELSE 0 END) AS BIGINT) AS from_removed
       |FROM full_r f JOIN surv s ON s.doc_id = f.doc_id
       |GROUP BY s.shard_after
       |ORDER BY node""".stripMargin
  }

  /** x372 file granularity and the rewrite threshold (deleted/total >
    * 3/10, compared as cross-multiplied integers). */
  private val DvFileRows = 100L
  private val RewriteNum = 3L
  private val RewriteDen = 10L

  /** x372: merge-on-read deletion vectors — the Iceberg/Delta maintenance
    * loop: the table is laid out in files (event_id ranges), a purge
    * predicate (user_id % 17 = 0) lands as per-file deletion vectors
    * instead of eager rewrites, reads subtract the DV, and the compactor
    * rewrites a file only once its dead fraction clears the threshold.
    * Emits the per-file audit: rows, deleted, live, and the rewrite
    * decision — exact integers, one aggregate over the fact table. At
    * 100 TB this is why deletes are O(deleted) not O(table): the DV is
    * metadata until the threshold trips. */
  def deletionVectors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(expr(s"event_id DIV $DvFileRows").as("file_id"),
        ($"user_id" % 17 === 0).cast("long").as("deleted"))
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n_rows"), sum($"deleted").as("n_deleted"))
      .select($"file_id", $"n_rows", $"n_deleted",
        ($"n_rows" - $"n_deleted").as("n_live"),
        ($"n_deleted" * lit(RewriteDen) > $"n_rows" * lit(RewriteNum))
          .cast("int").as("rewrite"))
      .orderBy("file_id")
  }

  private val deletionVectorsOracle =
    s"""WITH f AS (SELECT event_id // $DvFileRows AS file_id,
       |             CASE WHEN user_id % 17 = 0 THEN 1 ELSE 0 END AS deleted
       |           FROM events),
       |a AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       |        CAST(sum(deleted) AS BIGINT) AS n_deleted
       |      FROM f GROUP BY file_id)
       |SELECT file_id, n_rows, n_deleted, n_rows - n_deleted AS n_live,
       |       CAST(n_deleted * $RewriteDen > n_rows * $RewriteNum AS INTEGER) AS rewrite
       |FROM a
       |ORDER BY file_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x370_aho_corasick",
      "Aho-Corasick multi-pattern scan: one automaton pass counts all occurrences incl. dictionary-substring matches (X4)",
      ahoCorasickScan, Some(ahoCorasickOracle)),
    QueryDef("x371_rendezvous_shards",
      "rendezvous (HRW) shard routing + node-removal remap audit: only the removed node's keys move (X6/engine-ops)",
      rendezvousShards, Some(rendezvousOracle)),
    QueryDef("x372_deletion_vectors",
      "merge-on-read deletion vectors: per-file DV counts, live reads, threshold-gated compaction decision (engine-ops)",
      deletionVectors, Some(deletionVectorsOracle)))
}

package graft.queries

import graft.multimodal.MediaSynth

/** DuckDB-side re-derivation of the synthetic media pixels (see
  * [[graft.multimodal.MediaSynth]]): the oracle computes every pixel
  * directly from md5 formulas over `documents.text`, while the Spark path
  * goes pixels → real BMP/PPM bytes → real parse → features. A decoder
  * defect (channel order, row flip, padding, header grammar, container
  * lengths) diverges the features and fails the driver's hash compare —
  * so these CTEs are what makes the byte-exact codec oracle-GATED. */
private[queries] object MediaOracleSql {
  private val Hex = "'0123456789abcdef'"
  private def nib(expr: String, k: Int) =
    s"(strpos($Hex, substr(md5($expr), ${k + 1}, 1)) - 1)"
  /** Byte value from hex chars [pos, pos+1] (1-based) of column `hx`. */
  private def hb(pos: String) =
    s"((strpos($Hex, substr(hx, CAST($pos AS INTEGER), 1)) - 1) * 16 " +
      s"+ (strpos($Hex, substr(hx, CAST(($pos) + 1 AS INTEGER), 1)) - 1))"

  /** CTE chain ending in `lm(doc_id, nf, w, h, i, y, x, l)` — integer luma
    * per pixel of every frame, plus `s` carrying per-doc geometry and `px`
    * the per-channel values. `prefix` lets a consumer that appends a
    * recursive CTE open with "WITH RECURSIVE". */
  def pixelCtesWith(prefix: String): String =
    s"""$prefix m AS (SELECT doc_id, text, length(text) AS clen,
       |             1 + ${nib("text", 0)} % ${MediaSynth.NFramesMod} AS nf,
       |             4 + ${nib("text", 1)} % ${MediaSynth.WidthMod} AS w,
       |             4 + ${nib("text", 2)} % ${MediaSynth.HeightMod} AS h
       |           FROM documents),
       |s AS (SELECT doc_id, text, clen, nf, w, h,
       |        greatest(1, clen // (nf * h)) AS stride FROM m),
       |fr AS (SELECT doc_id, text, nf, w, h, stride, unnest(range(0, nf)) AS i FROM s),
       |rw AS (SELECT doc_id, nf, w, h, i, y,
       |         md5(substr(text, CAST((i * h + y) * stride + 1 AS INTEGER),
       |                    CAST(stride AS INTEGER))) AS hx
       |       FROM (SELECT *, unnest(range(0, h)) AS y FROM fr)),
       |px AS (SELECT doc_id, nf, w, h, i, y, x,
       |         ${hb("6 * x + 1")} AS r, ${hb("6 * x + 3")} AS g, ${hb("6 * x + 5")} AS b
       |       FROM (SELECT *, unnest(range(0, w)) AS x FROM rw)),
       |lm AS (SELECT doc_id, nf, w, h, i, y, x,
       |         (299 * r + 587 * g + 114 * b) // 1000 AS l
       |       FROM px)""".stripMargin

  val pixelCtes: String = pixelCtesWith("WITH")

  /** Appends `fq(doc_id, nf, frame_idx, s0..s3)` — per-frame quadrant luma
    * sums (quadrant split at 2x>=w / 2y>=h, matching MediaSynth.quadSums). */
  val frameQuadCtes: String =
    pixelCtes + s""",
       |fq AS (SELECT doc_id, nf, CAST(i AS INTEGER) AS frame_idx,
       |         sum(CASE WHEN 2 * y < h AND 2 * x < w THEN l ELSE 0 END) AS s0,
       |         sum(CASE WHEN 2 * y < h AND 2 * x >= w THEN l ELSE 0 END) AS s1,
       |         sum(CASE WHEN 2 * y >= h AND 2 * x < w THEN l ELSE 0 END) AS s2,
       |         sum(CASE WHEN 2 * y >= h AND 2 * x >= w THEN l ELSE 0 END) AS s3
       |       FROM lm GROUP BY doc_id, nf, i)""".stripMargin

  /** Appends `dh(doc_id, phash)` — the 15-bit dHash over frame 0 resized to
    * 4x4 by nearest-neighbor (source index = target*src // 4, truncating). */
  def dhashCtesWith(prefix: String): String =
    pixelCtesWith(prefix) + s""",
       |tg AS (SELECT doc_id, w, h, ty, tx,
       |         (ty * h) // ${MediaSynth.DhashH} AS sy,
       |         (tx * w) // ${MediaSynth.DhashW} AS sx
       |       FROM (SELECT doc_id, w, h, ty, unnest(range(0, ${MediaSynth.DhashW})) AS tx
       |             FROM (SELECT doc_id, w, h, unnest(range(0, ${MediaSynth.DhashH})) AS ty
       |                   FROM s))),
       |rs AS (SELECT t.doc_id, t.ty * ${MediaSynth.DhashW} + t.tx AS p, lm.l
       |       FROM tg t JOIN lm ON lm.doc_id = t.doc_id AND lm.i = 0
       |                        AND lm.y = t.sy AND lm.x = t.sx),
       |bt AS (SELECT doc_id, p, l,
       |         lead(l) OVER (PARTITION BY doc_id ORDER BY p) AS nxt FROM rs),
       |dh AS (SELECT doc_id,
       |         CAST(coalesce(sum(CASE WHEN l > nxt THEN 1 << CAST(p AS INTEGER) ELSE 0 END), 0) AS BIGINT) AS phash
       |       FROM bt WHERE p < ${MediaSynth.DhashW * MediaSynth.DhashH - 1}
       |       GROUP BY doc_id)""".stripMargin

  val dhashCtes: String = dhashCtesWith("WITH")
}

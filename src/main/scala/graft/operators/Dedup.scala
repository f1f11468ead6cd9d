package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level deduplication operators for the LLM-data-pipeline surface
  * (north star X1/X2): exact content-hash dedup, MinHash+LSH near-dup
  * candidate generation, SimHash bucketing, and n-gram Jaccard verification.
  *
  * All signatures/bands are built from md5 (built-in, codegen'd, and exactly
  * reproducible in the DuckDB oracle). Hash-function family j is
  * `md5(j || ':' || shingle)`; the MinHash is the lexicographic min of the
  * hex digests — a valid min-wise permutation family because md5 is uniform
  * on hex strings.
  *
  * Scale (100 TB): signatures/bands are per-row narrow work. The only
  * shuffles are the band-bucket exchange (keyed on (band, bandHash) — small,
  * high-cardinality keys) and the candidate-pair verify join. Giant buckets
  * (degenerate content) should be capped with a per-bucket count filter
  * before the self-join — `lshCandidates` takes `maxBucket` for exactly that.
  */
object Dedup {

  /** MinHash signature columns mh0..mh{k-1} over a (distinct) shingle array. */
  def minhashSig(shingles: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { j =>
      array_min(transform(shingles, s => md5(concat(lit(s"$j:"), s)))).as(s"mh$j")
    }

  /** LSH band hash over rows `[bandIdx*rowsPerBand, ...)` of the signature. */
  def bandHash(bandIdx: Int, rowsPerBand: Int): Column =
    md5(concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh${bandIdx * rowsPerBand + r}")): _*))

  /** Candidate near-dup pairs (a < b on `idCol`) from banded MinHash: docs
    * sharing any band bucket. `df` must already carry mh0..mh{bands*rows-1}.
    * Buckets larger than `maxBucket` are dropped (skew guard — a degenerate
    * bucket of size m contributes m² pairs). */
  def lshCandidates(df: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
                    maxBucket: Int = 1000): DataFrame = {
    val banded = df.select(
      col(idCol),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandHash(b, rowsPerBand).as("bh"))): _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val pruned = banded
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val l = pruned.select(col(idCol).as("a"), col("band"), col("bh"))
    val r = pruned.select(col(idCol).as("b"), col("band"), col("bh"))
    l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Jaccard similarity of two pre-distinct array columns, as double.
    * |A∩B| / (|A| + |B| − |A∩B|) — the subtraction form matches the oracle,
    * which counts the intersection with list_filter/list_contains. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** SimHash over a (distinct) token array: `bits`-wide sign-of-sums
    * signature rendered as a '0'/'1' string (string form keeps exact DuckDB
    * parity — no cross-engine integer-width concerns). Bit p of a token is
    * bit (3 - p%4) of hex nibble p/4 of md5(token). */
  def simhashBits(toks: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { p =>
      val nibbleIdx = p / 4 + 1
      val shift = 3 - p % 4
      val contrib = (t: Column) => {
        // instr(Column, Column) has no direct Scala binding — call by name.
        val nibble = call_function("instr",
          lit("0123456789abcdef"), substring(md5(t), nibbleIdx, 1)) - 1
        val bit = shiftright(nibble, shift).bitwiseAND(lit(1))
        when(bit === 1, 1).otherwise(-1)
      }
      val s = aggregate(toks, lit(0), (acc, t) => acc + contrib(t))
      when(s > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }
}

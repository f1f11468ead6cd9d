package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `ArrayType(FloatType)` embedding columns
  * (north star X3): dot product / norm / cosine via higher-order array
  * functions (codegen'd, no UDF), and a sign-random-projection LSH bucket for
  * the approximate path.
  *
  * Floats are cast to double element-wise BEFORE multiplying, and every
  * emitted similarity is rounded — that makes the value bit-reproducible in
  * the DuckDB oracle (same fold order, same width).
  *
  * Scale (100 TB): brute-force top-k is a broadcast of the (small) query set
  * against a full scan of the corpus — one pass, no shuffle on the corpus
  * side, then a per-query top-k. The approximate path buckets both sides by
  * `signBucket` so the join only meets candidates sharing a hyperoctant;
  * recall/cost is tuned by the number of sign bits (use multiple bucket
  * tables for multi-probe).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-projection LSH bucket: '0'/'1' string of the signs of the first
    * `bits` dimensions. (A fixed coordinate basis is a valid random-projection
    * family for unit vectors with no preferred axis — and keeps the bucket
    * exactly reproducible in SQL; a seeded random basis would go in a custom
    * Expression.) */
  def signBucket(v: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(v, i) >= 0, lit("1")).otherwise(lit("0"))): _*)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `ArrayType(FloatType)` embedding columns
  * (north star X3). The dot product is the native codegen'd `vec_dot`
  * expression (graft.functions.FloatVecDot) — element-wise double cast,
  * sequential sum, bit-identical to the declarative
  * `aggregate(zip_with(...))` it replaced but ~50× faster on pair joins
  * because the loop runs inside whole-stage codegen.
  *
  * Scale (100 TB): brute-force top-k = broadcast the (small) query set,
  * single corpus scan, per-query top-k; approximate path = sign-LSH
  * bucketing so the join only meets candidates in the same hyperoctant.
  * Precompute norms per row BEFORE any pair join (norm is O(dim) — doing it
  * per pair multiplies work by the candidate count).
  */
object Similarity {

  /** Requires GraftFunctions.register (done by Tables.load). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Full cosine. On pair joins prefer `dot(a,b) / (normA * normB)` with
    * norms precomputed per side — identical doubles, O(dim) less work per
    * pair. */
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

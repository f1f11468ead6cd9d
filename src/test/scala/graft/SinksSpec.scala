package graft

import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink-side semantics: create-if-absent, full refresh, idempotent append,
  * partition-local batching (SNK1-SNK3, S3). */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("hash", StringType), StructField("v", IntegerType)))

  test("SNK2: ensureExists creates empty sink once, second call no-ops") {
    val path = tmpDir("sink") + "/t"
    Sinks.ensureExists(spark, path, schema)
    assert(spark.read.parquet(path).count() == 0)
    Sinks.ensureExists(spark, path, schema) // must not throw (exists)
    assert(spark.read.parquet(path).schema.fieldNames.toSeq == Seq("hash", "v"))
  }

  test("SNK3: bulkReplace overwrites prior contents") {
    val path = tmpDir("sink") + "/t"
    Sinks.bulkReplace(Seq(("a", 1), ("b", 2)).toDF("hash", "v"), path)
    Sinks.bulkReplace(Seq(("c", 3)).toDF("hash", "v"), path)
    assert(spark.read.parquet(path).as[(String, Int)].collect().toSeq == Seq(("c", 3)))
  }

  test("SNK1: appendNew inserts only novel hashes, reports insert count") {
    val path = tmpDir("sink") + "/t"
    val n1 = Sinks.appendNew(spark, Seq(("a", 1), ("b", 2), ("a", 9)).toDF("hash", "v"), path, "hash", Seq("v"))
    assert(n1 == 2) // within-batch dup of "a" collapsed (keeps v=1)
    val n2 = Sinks.appendNew(spark, Seq(("b", 5), ("c", 3)).toDF("hash", "v"), path, "hash", Seq("v"))
    assert(n2 == 1) // only "c" novel
    val rows = spark.read.parquet(path).orderBy("hash").as[(String, Int)].collect().toSeq
    assert(rows == Seq(("a", 1), ("b", 2), ("c", 3)))
    // idempotence: replaying the same batch inserts nothing
    assert(Sinks.appendNew(spark, Seq(("b", 5), ("c", 3)).toDF("hash", "v"), path, "hash", Seq("v")) == 0)
  }

  test("S3: foreachBatched groups rows into batch-size chunks") {
    // closure ships to executors — collect batch sizes via accumulator
    val acc = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    Sinks.foreachBatched(spark.range(0, 25).toDF().coalesce(1), batchSize = 10) { g =>
      acc.add(g.size); ()
    }
    val s = scala.jdk.CollectionConverters.ListHasAsScala(acc.value).asScala.toSeq
    assert(s.nonEmpty && s.sum == 25 && s.forall(_ <= 10))
  }
}

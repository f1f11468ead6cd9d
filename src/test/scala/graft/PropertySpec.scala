package graft

import graft.operators.Etl
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3): dedup idempotence,
  * incremental-vs-bulk equivalence under arbitrary page splits with
  * arbitrary boundary overlaps, and content-hash stability. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest-scalacheck bridge
  * artifact isn't in the offline cache). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.oneOf((1 to 25).map(i => s"h$i")), Gen.choose(0, 9)))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: dedup is idempotent — dedup(dedup(x)) == dedup(x)") {
    (1L to 8L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("hash", "v")
      val once = Etl.dedupByHash(df, "hash", Seq("v"))
      val twice = Etl.dedupByHash(once, "hash", Seq("v"))
      assert(once.except(twice).count() == 0 && twice.except(once).count() == 0,
        s"seed=$seed")
    }
  }

  test("property: bulk == incremental for any page split with overlap re-fetch") {
    (1L to 6L).foreach { seed =>
      val rows = sample(rowsGen, seed).distinct
      val pageSize = 5 + (seed % 7).toInt
      val overlap = (seed % 4).toInt
      val bulk = Etl.dedupByHash(rows.toDF("hash", "v"), "hash", Seq("v"))
      val pages = rows.grouped(pageSize).toList
      val incremental = pages.zipWithIndex.foldLeft(Seq.empty[(String, Int)].toDF("hash", "v")) {
        case (sink, (page, i)) =>
          // S1 semantics: re-fetch up to `overlap` rows of the previous
          // page's tail before this page; dedup swallows the replay.
          // localCheckpoint truncates lineage — mergeIncremental references
          // `sink` twice, so an unbroken fold grows the plan exponentially.
          val tail = if (i == 0) Nil else pages(i - 1).takeRight(overlap)
          Etl.mergeIncremental(sink,
            Etl.dedupByHash((tail ++ page).toDF("hash", "v"), "hash", Seq("v")))
            .localCheckpoint(true)
      }
      assert(bulk.select("hash").except(incremental.select("hash")).count() == 0, s"seed=$seed")
      assert(incremental.select("hash").except(bulk.select("hash")).count() == 0, s"seed=$seed")
    }
  }

  test("property: contentHash is 16 lowercase hex, collision-free on distinct small sets") {
    (1L to 8L).foreach { seed =>
      val strs = sample(Gen.listOfN(30, Gen.alphaNumStr.map(_.take(12))), seed).distinct
      val hs = strs.toDF("s")
        .select($"s", Etl.contentHash($"s").as("h"))
        .as[(String, String)].collect()
      assert(hs.forall(_._2.matches("[0-9a-f]{16}")), s"seed=$seed")
      assert(hs.map(_._2).distinct.length == strs.length, s"seed=$seed")
    }
  }
}

package graft.operators

/** Aho–Corasick multi-pattern string matching — the single-pass scan a
  * blocklist/PII/contamination gate runs at 100 TB, where P patterns over
  * N bytes must cost O(N + matches), not O(N * P) indexOf loops. Counts
  * ALL occurrences of every pattern (including matches overlapping each
  * other and patterns that are substrings of other patterns — found via
  * the fail/output links, the part naive scanners miss).
  *
  * Build once per partition from a broadcast/constant pattern list; the
  * automaton is immutable after construction and thread-safe to share. */
final class AhoCorasick(patterns: Seq[String]) {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")

  // trie: per-node char -> child, fail link, and matched pattern ids
  private val children = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)

  patterns.zipWithIndex.foreach { case (p, id) =>
    var node = 0
    p.foreach { ch =>
      node = children(node).getOrElseUpdate(ch, {
        children += scala.collection.mutable.Map.empty[Char, Int]
        out += Nil
        fail += 0
        children.size - 1
      })
    }
    out(node) = id :: out(node)
  }

  // BFS fail links; output links merged so a terminal state reports every
  // pattern ending there, including dictionary suffixes ("an" inside "scan")
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
        out(v) = out(v) ::: out(fail(v))
        queue += v
      }
    }
  }

  /** Occurrence count per pattern id over `text` (all positions). */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.size)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !children(node).contains(ch)) node = fail(node)
      node = children(node).getOrElse(ch, 0)
      out(node).foreach(id => counts(id) += 1)
      i += 1
    }
    counts
  }
}

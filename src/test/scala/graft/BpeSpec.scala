package graft

import graft.operators.Bpe

/** BPE merge training must reproduce a sequential reference
  * implementation of the Sennrich recurrence exactly — including the
  * greedy left-to-right non-overlap rule on runs of identical symbols,
  * which a naive replace-all would get wrong. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: the paper's algorithm, word-freq weighted. */
  private def reference(texts: Seq[String],
                        rounds: Int): Seq[(Int, String, String, Long)] = {
    val words = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
      .filter(_.nonEmpty).foreach(w => words(w) = words.getOrElse(w, 0L) + 1))
    var state: Map[String, Vector[String]] =
      words.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (w, syms) =>
        syms.indices.dropRight(1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          cnt(k) = cnt.getOrElse(k, 0L) + words(w)
        }
      }
      if (cnt.nonEmpty) {
        val ((a, b), c) = cnt.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r, a, b, c))
        state = state.map { case (w, syms) =>
          val res = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
              res += a + b; i += 2
            } else { res += syms(i); i += 1 }
          }
          w -> res.toVector
        }
      }
    }
    out.toSeq
  }

  test("train matches the sequential reference on a mixed corpus") {
    val texts = Seq(
      "low lower lowest low low",
      "newer newest new low wider wide",
      "the theme then the them")
    val got = Bpe.train(texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"),
      "text", rounds = 5)
    assert(got == reference(texts, 5))
    assert(got.size == 5)
  }

  test("greedy non-overlap: a run of k identical symbols merges floor(k/2) pairs") {
    // corpus dominated by 'aaaa': pair (a, a) wins round 1 with count 9
    // (3 adjacent positions x freq 3 — ALL positions count), but the
    // MERGE must produce [aa, aa, </w>] (floor(4/2) = 2 merges, greedy
    // non-overlap). An overlap-buggy fold changes round 2's counts,
    // which the reference equality below would catch.
    val texts = Seq("aaaa aaaa aaaa bb")
    val got = Bpe.train(texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"),
      "text", rounds = 3)
    assert(got == reference(texts, 3))
    assert(got.head._2 == "a" && got.head._3 == "a" && got.head._4 == 9L)
    // round 2 winner count is 3 either way the tie falls ((aa,</w>) vs
    // (aa,aa), both once per aaaa occurrence); a wrong fold inflates it
    assert(got(1)._1 == 2 && got(1)._4 == 3L)
  }

  test("stops early when nothing is left to merge") {
    // single 1-char word: syms = [x, </w>] -> one merge exhausts it
    val got = Bpe.train(Seq((1L, "x x x")).toDF("doc_id", "text"),
      "text", rounds = 5)
    assert(got.size >= 1 && got.head._2 == "x" && got.head._3 == "</w>")
    // after x</w> merges, every word is a single symbol: no pairs remain
    assert(got.size == 1)
  }

  test("encode: ordered merges replay by hand on a known vocabulary") {
    val merges = Seq("e" -> "</w>", "s" -> "</w>", "d" -> "</w>",
      "t" -> "h", "th" -> "e</w>", "i" -> "n", "a" -> "n", "o" -> "u",
      "r" -> "e", "an" -> "d</w>")
    // the→[the</w>]=1, then→[th,e,n,</w>]=4, and→[and</w>]=1, sand→[s,and</w>]=2
    val out = Bpe.encode(
        Seq((1L, "the then and sand")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .select("doc_id", "n_words", "n_subwords", "subwords_per_word")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 4L, 8L, 2.0)))
  }

  test("encode: train's merges compress what train saw (round trip)") {
    val docs = Seq((1L, "low low low lower lower newest newest"),
      (2L, "newest widest widest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", rounds = 6)
      .map(m => (m._2, m._3))
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "subwords_per_word").as[(Long, Double)]
      .collect().toMap
    // 6 learned merges must strictly compress below the char+1 baseline
    assert(enc.values.forall(_ < 4.0))
  }
}

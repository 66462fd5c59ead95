package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Pins the native PolyFp expressions to independent plain-Scala
  * reference implementations on seeded-random inputs (the DuckDB oracle
  * is the cross-engine check; this is the in-repo one, covering
  * multi-byte UTF-8 and empty/short edge cases the test corpus lacks).
  */
class PolyFpRefSpec extends SparkSuite {
  import spark.implicits._

  private val Mod = 1000000007L
  private val P = 2147483647L
  private def a(i: Int): Long = (i + 1) * 15485863L
  private def b(i: Int): Long = i * 32452843L + 11L

  private def refFp(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % Mod)

  private def refMinhash(text: String, n: Int, k: Int): Option[Seq[Long]] = {
    val toks = text.split(" ", -1)
    val shingles = toks.sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq
    if (shingles.isEmpty) None
    else Some((0 until k).map { i =>
      shingles.map(s => (a(i) * refFp(s) + b(i)) % P).min
    })
  }

  private def refSimhash(text: String): Long = {
    val counts = new Array[Int](64)
    text.split(" ", -1).filter(_.nonEmpty).foreach { tok =>
      val x = refFp(tok)
      for (j <- 0 until 64)
        if (((a(j) * x + b(j)) % P & 1L) == 1L) counts(j) += 1
        else counts(j) -= 1
    }
    (0 until 64).foldLeft(0L)((h, j) =>
      if (counts(j) > 0) h | (1L << j) else h)
  }

  private val rnd = new scala.util.Random(13)
  private val words = // 1-, 2-, 3-, and 4-byte (astral) UTF-8 tokens
    "the quick brown fox jümps ovér 日本語 æøå x1 €42 a 😀ok 𝒳y".split(" ")
  private val docs: Seq[(Long, String)] = (0L until 60L).map { i =>
    val len = rnd.nextInt(8) // includes 0..2-token docs (no shingles)
    (i, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
  }

  test("fingerprint matches the code-point fold reference") {
    val got = docs.toDF("id", "text")
      .select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refFp(text), s"doc $id '$text'")
    }
  }

  test("native minhash signature matches the reference for every doc") {
    val got = Dedup.minhashSigsNative(docs.toDF("id", "text"),
        $"id", $"text", n = 3, k = 32)
      .as[(Long, Option[Seq[Long]])].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refMinhash(text, 3, 32), s"doc $id '$text'")
    }
  }

  test("native simhash matches the reference for every doc") {
    val got = Dedup.simhash(docs.toDF("id", "text"), $"id", $"text")
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refSimhash(text), s"doc $id '$text'")
    }
  }
}

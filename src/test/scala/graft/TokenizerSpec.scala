package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenizer
import graft.functions.BpeUtil
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer training: merge-pass semantics, learned-merge
  * determinism, tie-breaking, and the vocab-not-corpus scale shape.
  */
class TokenizerSpec extends SparkSuite {
  import spark.implicits._

  private def merge(syms: Seq[String], l: String, r: String): Seq[String] =
    BpeUtil.mergeOnce(syms.map(UTF8String.fromString).toArray,
      UTF8String.fromString(l), UTF8String.fromString(r))
      .map(_.toString).toSeq

  test("mergeOnce is a left-to-right non-overlapping pass") {
    // overlap run: leftmost pair wins, scan resumes AFTER the merge
    assert(merge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    // consecutive distinct matches both merge in one pass
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    // a newly created token never re-merges within the same pass
    assert(merge(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    // no match is identity (same array back, no copy)
    assert(merge(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(merge(Seq.empty, "a", "b") === Seq.empty)
    assert(merge(Seq("a"), "a", "a") === Seq("a"))
  }

  test("codePoints splits by code point, including multi-byte") {
    def cps(s: String): Seq[String] =
      BpeUtil.codePoints(UTF8String.fromString(s)).map(_.toString).toSeq
    assert(cps("abc") === Seq("a", "b", "c"))
    assert(cps("") === Seq.empty)
    assert(cps("héllo") === Seq("h", "é", "l", "l", "o"))
    assert(cps("日本語") === Seq("日", "本", "語"))
    assert(cps("a𝄞b") === Seq("a", "𝄞", "b")) // supplementary plane
  }

  test("bpeTrain learns the classic merge sequence with deterministic ties") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 — the
    // textbook BPE example; first merges are (e,s) 9, then (es,t) 9
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))
    ).toDF("doc_id", "text")
    val ms = Tokenizer.bpeTrain(docs, col("text"), 3)
    assert(ms.map(m => (m.step, m.lhs, m.rhs, m.freq)) === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
    // deterministic: retraining yields the identical list
    val ms2 = Tokenizer.bpeTrain(docs, col("text"), 3)
    assert(ms2 === ms)
  }

  test("bpeTrain tiebreak is (freq DESC, l ASC, r ASC) bytewise") {
    // "ba" and "ab" tie at 3 occurrences: (a,b) < (b,a) bytewise
    val docs = Seq((1L, "ab ab ab ba ba ba")).toDF("doc_id", "text")
    val ms = Tokenizer.bpeTrain(docs, col("text"), 1)
    assert(ms.head.lhs === "a" && ms.head.rhs === "b" &&
      ms.head.freq === 3L)
  }

  test("bpeTokens applies merges in learned order; stats aggregate per doc") {
    val docs = Seq(
      (1L, "newest newest lowest"),
      (2L, "low low")
    ).toDF("doc_id", "text")
    val ms = Tokenizer.bpeTrain(docs, col("text"), 2)
    // (e,s) then (es,t): "newest" → n e w est (4 syms)
    val toks = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .select(Tokenizer.bpeTokens(col("w"), ms).as("t"))
      .as[Seq[String]].collect()
    assert(toks.contains(Seq("n", "e", "w", "est")))
    val stats = Tokenizer.bpeTokenStats(docs, col("doc_id"), col("text"), ms)
      .orderBy("id").collect()
    assert(stats.map(_.getLong(1)).toSeq === Seq(3L, 2L)) // n_words
    // doc 2: "low" has no learned merges → 3 syms per word
    assert(stats(1).getLong(2) === 6L)
  }

  test("bpeTrain early-stops when no pair remains") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // all words are single symbols — zero merges learnable
    assert(Tokenizer.bpeTrain(docs, col("text"), 5) === Seq.empty)
  }

  test("training iterations run on the vocab, not the corpus (scale shape)") {
    val docs = (1 to 200).map(i => (i.toLong,
      "alpha beta gamma alpha beta alpha")).toDF("doc_id", "text")
    val vocab = Tokenizer.wordVocab(docs, col("text"))
    // 3 distinct words regardless of 200 docs × 6 words
    assert(vocab.count() === 3L)
    val ms = Tokenizer.bpeTrain(docs, col("text"), 1)
    // weighted by occurrences: "alpha" 600 × pairs — (a,l) wins? no:
    // (l,p),(p,h),(h,a),(a,l) each 600; (b,e),(e,t),(t,a) 400;
    // (a,m),(m,m),(g,a) 200; tie among the 600s → (a,l) bytewise min
    assert(ms.head.lhs === "a" && ms.head.rhs === "l" &&
      ms.head.freq === 600L)
  }

  test("bpeCompressionStats: per-group chars-per-token; the merged " +
      "group compresses, the unmergeable one stays at 1 char/token") {
    // merges learned on the union: (e,s) then (e,w) (all "newest"
    // pairs tie at 3, bytewise-min l wins each round) — "en" docs are
    // all "newest" (6 chars → n ew es t = 4 tokens), "xx" docs are
    // single chars (no pair ever forms inside a 1-char word)
    val docs = Seq(
      (1L, "en", "newest newest"), (2L, "en", "newest"),
      (3L, "xx", "a b c"), (4L, "xx", "d e")
    ).toDF("doc_id", "lang", "text")
    val ms = Tokenizer.bpeTrain(docs, col("text"), 2)
    val got = Tokenizer.bpeCompressionStats(docs, col("lang"),
        col("text"), ms)
      .orderBy("grp")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // en: 3 words × 6 chars = 18 chars, 3 × 4 tokens = 12 → 1.5
    // xx: 5 words × 1 char, 5 tokens → 1.0
    assert(got === Seq(("en", 3L, 18L, 12L, 1.5),
      ("xx", 5L, 5L, 5L, 1.0)))
  }
}

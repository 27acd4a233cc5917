package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{UnigramKernel, UnigramModel}

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def model(costs: (String, Long)*): UnigramModel =
    new UnigramModel(costs, maxPieceLen = 6, unkCostMicro = Unigram.UnkCostMicro)

  private def seg(word: String, m: UnigramModel): Seq[String] =
    UnigramKernel.segmentWord(
      org.apache.spark.unsafe.types.UTF8String.fromString(word), m)
      .array.toSeq.map(_.toString)

  test("Viterbi picks the min-cost segmentation (hand-computed)") {
    // costs: ab=100, a=200, b=200, c=300, abc=350
    val m = model("ab" -> 100L, "a" -> 200L, "b" -> 200L, "c" -> 300L,
      "abc" -> 350L)
    // abc: [abc]=350 beats [ab,c]=400 and [a,b,c]=700
    assert(seg("abc", m) == Seq("abc"))
    // abab: [ab,ab]=200 beats [a,b,ab]=500 and [a,b,a,b]=800
    assert(seg("abab", m) == Seq("ab", "ab"))
    // abcb: [ab,c,b]=600 beats [abc,b]=550? no: 350+200=550 — wins
    assert(seg("abcb", m) == Seq("abc", "b"))
    // counts agree with the segmentation kernel
    assert(UnigramKernel.encodeWordCount("abab", m) == 2)
    assert(UnigramKernel.encodeWordCount("abc", m) == 1)
  }

  test("total-cost tie goes to the longer piece; unknown chars fall back at unk cost") {
    // ab=400 exactly ties a+b=200+200 — the longer piece must win
    val m = model("ab" -> 400L, "a" -> 200L, "b" -> 200L)
    assert(seg("ab", m) == Seq("ab"))
    // x is not in the vocabulary: single-char unk fallback, never a crash
    assert(seg("axb", m) == Seq("a", "x", "b"))
    assert(UnigramKernel.encodeWordCount("xxx", m) == 3)
  }

  test("tokenCount tokenizes like the training side and sums word counts") {
    val m = model("he" -> 100L, "llo" -> 100L, "h" -> 500L, "e" -> 500L,
      "l" -> 500L, "o" -> 500L, "w" -> 500L, "r" -> 500L, "d" -> 500L)
    val t = org.apache.spark.unsafe.types.UTF8String.fromString(
      "Hello, WORLD! hello")
    // hello → [he,llo] = 2 (twice); world → w,o,r,l,d = 5
    assert(UnigramKernel.tokenCount(t, m) == 2 + 5 + 2)
  }

  test("trainVocab: whole repeated words become pieces; encode uses them") {
    val docs = Seq.tabulate(50)(i => (i.toLong, "hello world hello spark"))
      .toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, "text", vocabSize = 32)
    val pieces = vocab.map(_.piece).toSet
    // coverage floor: every corpus char survives as a single
    "helowrdspak".foreach(c => assert(pieces.contains(c.toString), s"lost '$c'"))
    // the dominant whole words are the best covers and must be pieces
    assert(pieces.contains("hello"), s"vocab: $pieces")
    assert(pieces.contains("world"))
    assert(pieces.contains("spark"))
    // encode: 4 words → 4 whole-word tokens per doc
    val counts = Unigram.encodeTokenCounts(docs, "doc_id", "text", vocab)
      .select("n_unigram_tokens").as[Int].collect()
    assert(counts.forall(_ == 4), s"got ${counts.toSeq.distinct}")
    // model invariants the driver row gates on
    assert(vocab.size <= 32)
    assert(vocab.forall(p => p.costMicro > 0 && p.count > 0))
    assert(vocab.sortBy(p => (-p.count, p.piece)) == vocab)
  }

  test("degenerate one-token corpus: costs clamp to >= 1, never 0") {
    // a single repeated char makes one piece hold the whole mass —
    // ln(1) = 0 would quantize to a zero (free-insertion) cost without
    // the clamp, flipping unigram_vocab's positive-cost gate
    val docs = Seq.tabulate(5)(i => (i.toLong, "aaaa")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, "text", vocabSize = 2)
    assert(vocab.nonEmpty)
    assert(vocab.forall(_.costMicro >= 1L), s"zero-cost piece: $vocab")
    // the degenerate model still segments (bounded by chars)
    val n = Unigram.encodeTokenCounts(docs, "doc_id", "text", vocab)
      .select("n_unigram_tokens").as[Int].head()
    assert(n >= 1 && n <= 4, s"got $n")
  }

  test("trainVocab is deterministic and EM prunes unused seed pieces") {
    val docs = Seq.tabulate(20)(i => (i.toLong, "banana bandana"))
      .toDF("doc_id", "text")
    val v1 = Unigram.trainVocab(docs, "text", vocabSize = 16, emIters = 2)
    val v2 = Unigram.trainVocab(docs, "text", vocabSize = 16, emIters = 2)
    assert(v1 == v2, "training not deterministic")
    assert(v1.size <= 16)
    // bounds contract of the apply kernel: words ≤ tokens ≤ chars
    val row = Unigram.encodeTokenCounts(docs, "doc_id", "text", v1)
      .select("n_unigram_tokens").as[Int].head()
    assert(row >= 2 && row <= 13, s"got $row")
  }
}

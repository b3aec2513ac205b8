package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextFunctions
import graft.operators.{Chunking, Rake}
import graft.pipeline.Predicates
import graft.streaming.Sync

/** ScalaCheck invariants for the pure kernels (SURVEY.md §5: property
  * testing for the function surface; DataFrame twins are covered by
  * the golden-value specs). */
object GraftProperties extends Properties("graft") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("tokenize is idempotent on its own output") = forAll(text) { t =>
    val toks = TextFunctions.tokenize(t)
    TextFunctions.tokenize(toks.mkString(" ")) == toks
  }

  property("tokens are lowercase, >=2 chars, never stopwords") =
    forAll(Gen.asciiPrintableStr) { t =>
      TextFunctions.tokenize(t).forall(tok =>
        tok == tok.toLowerCase && tok.length >= 2 &&
          !TextFunctions.EnglishStopwords(tok))
    }

  property("mock embedding is a unit vector for any text and dim") =
    forAll(Gen.asciiStr, Gen.chooseNum(8, 256)) { (t, dim) =>
      val v = TextFunctions.mockEmbeddingDouble(t, dim)
      v.length == dim && math.abs(v.map(x => x * x).sum - 1.0) < 1e-9
    }

  property("jaccard is symmetric, bounded, and 1 on self") =
    forAll(Gen.listOf(word), Gen.listOf(word)) { (a, b) =>
      val j1 = TextFunctions.jaccard(a, b)
      val j2 = TextFunctions.jaccard(b, a)
      j1 == j2 && j1 >= 0.0 && j1 <= 1.0 &&
        (a.isEmpty || TextFunctions.jaccard(a, a) == 1.0)
    }

  private val chunkCfg = for {
    max <- Gen.chooseNum(10, 200)
    ov <- Gen.chooseNum(0, max / 2)
  } yield Chunking.ChunkConfig(minTokens = 5, maxTokens = max,
    overlapTokens = ov)

  property("character chunks: substring, monotone, token-capped") =
    forAll(text, chunkCfg) { (t, cfg) =>
      val chunks = Chunking.character(t, cfg)
      val sub = chunks.forall(c => c.text == t.substring(c.start, c.end))
      val mono = chunks.sliding(2).forall {
        case Seq(a, b) => a.start < b.start
        case _ => true
      }
      val capped = t.length / cfg.charsPerToken < cfg.minTokens ||
        chunks.forall(_.tokenCount <= cfg.maxTokens)
      sub && mono && capped
    }

  property("recursive chunks cover all non-space content in order") =
    forAll(text, chunkCfg) { (t, cfg) =>
      // chunks may duplicate the previous chunk's tail (overlap splice),
      // so coverage is checked on offset spans, not on concatenation
      val chunks = Chunking.recursive(t, cfg)
      val covered = new Array[Boolean](t.length)
      chunks.foreach(c => java.util.Arrays.fill(covered, c.start, c.end, true))
      t.indices.forall(i => covered(i) || t.charAt(i).isWhitespace) &&
        chunks.map(_.start).sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        } &&
        chunks.forall(c => c.text == t.substring(c.start, c.end))
    }

  property("RAKE keywords contain no stopwords and respect top_k") =
    forAll(text, Gen.chooseNum(1, 10)) { (t, k) =>
      val kws = Rake.extract(t, topK = k)
      kws.size <= k &&
        kws.forall { case (p, s) =>
          s > 0 && p.split(" ").forall(w => !Rake.StopWords(w))
        } &&
        kws.map(_._2).sliding(2).forall {
          case Seq(a, b) => a >= b
          case _ => true
        }
    }

  property("glob compilation: literal strings match only themselves") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val re = Predicates.globToRegex(s)
      s.matches(re) && !(s + "x").matches(re)
    }

  property("glob *: prefix patterns match extensions of the prefix") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      (a + b).matches(Predicates.globToRegex(a + "*"))
    }

  property("retry backoff is monotone and capped") =
    forAll(Gen.chooseNum(0, 64), Gen.chooseNum(0, 64)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      Sync.retryBackoffSeconds(lo) <= Sync.retryBackoffSeconds(hi) &&
        Sync.retryBackoffSeconds(hi) <= 300.0
    }

  property("simhash-style bit ops: shouldHalt iff a run of N failures") =
    forAll(Gen.listOf(Gen.oneOf(true, false)), Gen.chooseNum(1, 5)) {
      (statuses, n) =>
        val expected = statuses.foldLeft((0, false)) {
          case ((run, halted), ok) =>
            if (ok) (0, halted)
            else (run + 1, halted || run + 1 >= n)
        }._2
        Sync.shouldHalt(statuses, n) == expected
    }
}

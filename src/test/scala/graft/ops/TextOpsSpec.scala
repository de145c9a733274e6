package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit cases for text operators whose edge shapes the corpus oracle never
  * exercises (degenerate documents).
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("repetitionMetrics: known gram shares, single-token and repeated docs") {
    val docs = Seq(
      (1L, "a a a b"),        // unigrams a:3/4 → 7500; bigrams "a a"x2 of 3 → 6666
      (2L, "one two three"),  // all grams unique → 3333 / 5000
      (3L, "solo"),           // one token → 10000; no bigrams → 0
      (4L, "x x x x")         // degenerate loop → 10000 / 10000
    ).toDF("doc_id", "text")
    val out = Text.repetitionMetrics(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_token_bp"), r.getAs[Long]("top_bigram_bp"))).toMap
    assert(out(1L) == (7500L, 6666L))
    assert(out(2L) == (3333L, 5000L))
    assert(out(3L) == (10000L, 0L))
    assert(out(4L) == (10000L, 10000L))
  }

  test("bpePairCounts: hand-computed adjacent pairs; 1-char tokens contribute nothing") {
    val docs = Seq((1L, "abc ab x"), (2L, "abc")).toDF("doc_id", "text")
    // "abc" x2 → ab, bc each twice; "ab" → ab once; "x" length-1 → nothing
    val out = Text.bpePairCounts(docs).as[(String, Long)].collect().toMap
    assert(out == Map("ab" -> 3L, "bc" -> 2L))
  }

  test("bpeTrain: merge trajectory matches an independent reference BPE") {
    // independent reference: the textbook dict-based trainer (Sennrich '16)
    def refBpe(words: Map[String, Long], k: Int): Seq[(Long, String, Long)] = {
      var vocab = words.map { case (w, n) => (w.map(_.toString).toVector, n) }
      (1 to k).flatMap { it =>
        val counts = vocab.toSeq.flatMap { case (syms, n) =>
          syms.zip(syms.drop(1)).map(p => (p, n))
        }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
        if (counts.isEmpty) None
        else {
          val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
          vocab = vocab.map { case (syms, cnt) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) { // greedy left-to-right scan
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), cnt)
          }
          Some((it.toLong, s"$a $b", n))
        }
      }
    }
    // corpus with ties, single-char words, and symbol-on-symbol merges
    val text = "low low low lower lower lowest a be be"
    val docs = Seq((1L, text), (2L, "low lowest")).toDF("doc_id", "text")
    val words = (text.split(" ") ++ "low lowest".split(" "))
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
    val got = Text.bpeTrain(docs, k = 6).as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == refBpe(words, 6))
    // sanity: later iterations DID merge merged symbols (pair with len>2 side)
    assert(got.exists { case (_, p, _) => p.split(" ").exists(_.length > 1) })

    // apply side: subtoken counts per doc under the same reference merges
    def refSegment(w: String): Int = {
      var syms = w.map(_.toString).toVector
      refBpe(words, 6).foreach { case (_, pair, _) =>
        val Array(a, b) = pair.split(" ", 2)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val applied = Text.bpeTokenCounts(docs, k = 6)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exp1 = text.split(" ")
    assert(applied(1L) == (exp1.length.toLong,
      exp1.map(refSegment(_).toLong).sum))
    val exp2 = "low lowest".split(" ")
    assert(applied(2L) == (exp2.length.toLong,
      exp2.map(refSegment(_).toLong).sum))
    // merges actually compress: fewer subtokens than characters
    assert(applied(1L)._2 < exp1.map(_.length.toLong).sum)
  }

  test("unigramDocScores: sum_freq is the sum of corpus frequencies per occurrence") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // corpus freqs: a=3, b=1, c=1
    val out = Text.unigramDocScores(docs).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (3L, 3L + 3L + 1L))
    assert(out(2L) == (2L, 3L + 1L))
  }

  test("unigramSurprisal: hand-computed micro-nat costs, rare tokens " +
      "dominate the log domain, partition-invariant, empties absent") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "")).toDF("doc_id", "text")
    // N=5, P(a)=0.6, P(b)=P(c)=0.2 (both exact at 6dp);
    // cost(a)=⌊−ln(0.6)·1e6⌋=510825, cost(b)=cost(c)=⌊−ln(0.2)·1e6⌋=1609437
    val want = Map(
      1L -> (3L, 2 * 510825L + 1609437L, (2 * 510825L + 1609437L) / 3),
      2L -> (2L, 510825L + 1609437L, (510825L + 1609437L) / 2))
    def run(d: org.apache.spark.sql.DataFrame) =
      Text.unigramSurprisal(d).as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(run(docs) == want) // doc 3 (no tokens) absent
    assert(run(docs.repartition(7)) == want, "scores moved with partitioning")
    // the log domain weights rarity correctly: "a c" (one rare token in
    // two) out-surprises "a a b" even though both contain one rare token —
    // the frequency-SUM sibling (unigramDocScores) ranks them the other
    // way (5 vs 7), which is exactly why perplexity filtering needs logs
    assert(want(2L)._3 > want(1L)._3)
  }

  test("unigramSurprisalAgainst: stored-LM scoring, OOV prices at the " +
      "clamp maximum, matches self-trained scoring on the same corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val lm = Text.tokenCounts(docs) // a=3, b=1, c=1, N=5 — same LM as self
    def got(d: org.apache.spark.sql.DataFrame) =
      Text.unigramSurprisalAgainst(d, lm)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // same corpus + same LM ≡ the self-trained scorer bit-for-bit
    val self = Text.unigramSurprisal(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(docs) == self)
    // OOV: 'z' is not in the LM → cost = ⌊−ln(1e-6)·1e6⌋ = 13815510
    val oov = got(Seq((9L, "a z")).toDF("doc_id", "text"))(9L)
    assert(oov == (2L, 510825L + 13815510L, (510825L + 13815510L) / 2),
      s"got $oov")
  }

  test("tokenFrequencyHistogram: exact power-of-two bucket boundaries") {
    // freqs: a=1 (bucket 1), b=2, c=3 (bucket 2), d=4 (bucket 3)
    val docs = Seq((1L, "a b b c c c d d"), (2L, "d d")).toDF("doc_id", "text")
    val out = Text.tokenFrequencyHistogram(docs).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("charEntropy: hand-computed entropies, uniform and degenerate") {
    val d = Seq(
      (1L, "abcd"), // 4 distinct chars, uniform → 2 bits
      (2L, "aabb"), // 2×2 → 1 bit
      (3L, "aaaa"), // degenerate → 0 bits
      (4L, "ab ab") // 'a','b',' ' with counts 2,2,1 → H(2/5,2/5,1/5)
    ).toDF("doc_id", "text")
    val got = Text.charEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def h(ns: Seq[Int]): Double = {
      val n = ns.sum.toDouble
      val raw = ns.map(c => -c / n * (math.log(c / n) / math.log(2))).sum
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == ((4L, 2.0)))
    assert(got(2L) == ((4L, 1.0)))
    assert(got(3L) == ((4L, 0.0)))
    assert(got(4L)._1 == 5L && math.abs(got(4L)._2 - h(Seq(2, 2, 1))) < 2e-4)
  }

  test("bm25TopK: term-matching docs rank by overlap; non-matching docs absent") {
    val docs = Seq(
      (1L, "spark join spark join fast engine"), // both terms, high tf
      (2L, "spark appears once here only today"),
      (3L, "nothing relevant in this document at all"),
      (4L, "join join join join join join") // one term, saturating tf
    ).toDF("doc_id", "text")
    val queries = Seq(("q1", Seq("spark", "join"))).toDF("qid", "terms")
    val got = Text.bm25TopK(docs, queries, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._3).toSet == Set(1L, 2L, 4L)) // doc 3 never appears
    assert(got.find(_._2 == 1L).get._3 == 1L) // both-terms doc ranks first
    // scores strictly decrease down the ranking (ties impossible here)
    val scores = got.sortBy(_._2).map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a > b })
  }

  test("oovStats: occurrence-level OOV vs vocabulary, language-scoped, no row blowup") {
    val corpus = Seq((1L, "en", "alpha beta beta"), (2L, "de", "alpha und"))
      .toDF("doc_id", "lang", "text")
    // en batch: 'beta' known (count 2 in vocab — must not double rows),
    // 'gamma' x2 OOV; 'alpha' in DE vocab only → OOV for de? no: de batch
    // has 'alpha' (known in de) and 'beta' (en-only → OOV in de)
    val batch = Seq((10L, "en", "beta gamma gamma alpha"),
      (11L, "de", "alpha beta")).toDF("doc_id", "lang", "text")
    val out = Text.oovStats(batch, Text.vocabulary(corpus))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "en" -> ((4L, 2L, 5000L)),  // beta, alpha known; gamma x2 OOV
      "de" -> ((2L, 1L, 5000L)))) // alpha known; beta OOV in de
  }

  test("chunkWindows: coverage, overlap, tail chunk, short and exact-size docs") {
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc(60)), (2L, doc(10)), (3L, doc(32)), (4L, doc(33)))
      .toDF("doc_id", "text")
    val out = Text.chunkWindows(docs, 32, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text").split(" "))))
      .toMap
    // chunk counts: 1 + ceil(max(n-32,0)/24)
    assert(out.keys.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2))
    // doc 1 (60 toks): chunks start at 1, 25, 49; tail is 12 long
    assert(out((1L, 0L))._2.head == "t1" && out((1L, 0L))._1 == 32L)
    assert(out((1L, 1L))._2.head == "t25" && out((1L, 1L))._1 == 32L)
    assert(out((1L, 2L))._2.head == "t49" && out((1L, 2L))._1 == 12L)
    assert(out((1L, 2L))._2.last == "t60")
    // consecutive full chunks share exactly `overlap` tokens
    assert(out((1L, 0L))._2.toSet.intersect(out((1L, 1L))._2.toSet).size == 8)
    // every token of every doc is covered by the union of its chunks
    for ((id, n) <- Seq(1L -> 60, 2L -> 10, 3L -> 32, 4L -> 33)) {
      val covered = out.collect { case ((d, _), (_, ts)) if d == id => ts }
        .flatten.toSet
      assert(covered == (1 to n).map(i => s"t$i").toSet, s"doc $id coverage")
    }
    // short doc: single chunk, unpadded, verbatim
    assert(out((2L, 0L))._1 == 10L &&
      out((2L, 0L))._2.sameElements((1 to 10).map(i => s"t$i")))
  }

  test("topPVocabulary: integer cut rule, count-then-token order, boundary inclusion") {
    // en counts: a=5, b=3, c=1, d=1 (total 10). At p=80%:
    //   a: cum_before 0  < 8000·10/10⁴? 0·10⁴ < 8000·10 → keep (cum 5)
    //   b: 5·10⁴ < 8·10⁴ → keep (cum 8); c: 8·10⁴ < 8·10⁴ FALSE → cut.
    val docs = Seq((1L, "en", "a a a b b"), (2L, "en", "a a b c d"),
      (3L, "de", "x y")).toDF("doc_id", "lang", "text")
    val out = Text.topPVocabulary(docs, pBp = 8000)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(("en", "a"), ("en", "b"), ("de", "x"), ("de", "y")))
    assert(out(("en", "a")) == ((5L, 5L, 1L)))
    assert(out(("en", "b")) == ((3L, 8L, 2L)))
    // de: x and y tie at 1 of total 2 — token order ranks x first; y kept
    // because cum_before 1·10⁴ < 8000·2 = 16000
    assert(out(("de", "x")) == ((1L, 1L, 1L)))
    assert(out(("de", "y")) == ((1L, 2L, 2L)))
  }

  test("spanNovelty: seen spans counted, all-new doc at 10000bp, short docs absent") {
    def doc(ts: Seq[String]) = ts.mkString(" ")
    val w = (1 to 12).map(i => s"w$i")
    val corpus = Seq((100L, doc(w))).toDF("doc_id", "text")
    val batch = Seq(
      // 10 tokens → 3 spans, all inside the corpus doc's span set
      (1L, doc(w.take(10))),
      // 9 tokens of new words → 2 spans, none seen
      (2L, doc((1 to 9).map(i => s"n$i"))),
      // spans 1: w1..w8 seen; nope — mixed doc: first 8 = corpus span,
      // rest shifts out of corpus vocabulary
      (3L, doc(w.take(8) ++ Seq("zz"))),
      (4L, "too short")).toDF("doc_id", "text")
    val idx = graft.ops.Dedup.spanIndex(corpus, 8)
    val out = graft.ops.Dedup.spanNovelty(batch, idx)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))   // doc 4 has no spans
    assert(out(1L) == ((3L, 0L, 0L)))       // fully-contained excerpt
    assert(out(2L) == ((2L, 2L, 10000L)))   // entirely new text
    assert(out(3L) == ((2L, 1L, 5000L)))    // one seen span + one new
  }

  test("fuzzyPairsEd1 equals the quadratic levenshtein scan (lossless blocking)") {
    // covers substitution (abc/abd), deletion (abc/abcd), double letters
    // (aab/ab), a distance-2 pair sharing a variant (ab/ba share "a" and
    // "b" — must be filtered), and an isolated string
    val strs = Seq("abc", "abd", "abcd", "aab", "ab", "ba", "zzzz")
      .toDF("s")
    val got = graft.ops.Text.fuzzyPairsEd1(strs)
      .as[(String, String)].collect().toSet
    val brute = strs.select(col("s").as("a")).crossJoin(strs.select(col("s").as("b")))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .as[(String, String)].collect().toSet
    assert(got == brute)
    assert(got.contains(("abc", "abd")) && got.contains(("abc", "abcd")))
    assert(!got.contains(("ab", "ba")))     // shared variant, distance 2
    assert(!got.exists(p => p._1 == "zzzz" || p._2 == "zzzz"))
  }

  test("phraseSearch: positional conjunction, duplicate tokens, no false hits") {
    val docs = Seq(
      (1L, "x a b a y"),     // contains "a b a" and "a b"
      (2L, "a x b a"),       // has all tokens of "a b a" but never adjacent
      (3L, "b a b"),         // contains "a b" (at pos 2) and "b a b"
      (4L, "c c c")).toDF("doc_id", "text")
    val phrases = Seq("a b a", "a b", "b a b", "missing z").toDF("phrase")
    val got = graft.ops.Text.phraseSearch(docs, phrases)
      .as[(String, Long)].collect().toSet
    assert(got == Set(
      ("a b a", 1L), ("a b", 1L), ("a b", 3L), ("b a b", 3L)))
  }

  test("bigramLmScores: counts, known hits, and frequency sums by hand") {
    val ref = Seq((0L, "a b a b c"), (2L, "a b x"))  // LM: "a b"->3, "b a"->1,
      .toDF("doc_id", "text")                        //     "b c"->1, "b x"->1
    val lm = graft.ops.Text.bigramLm(ref)
    val lmMap = lm.as[(String, Long)].collect().toMap
    assert(lmMap == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L, "b x" -> 1L))
    val tgt = Seq(
      (1L, "a b c"),     // "a b"(3) known, "b c"(1) known → 2/2, sum 4
      (3L, "c a q b"),   // "c a","a q","q b" all unknown → 3 bigrams, 0 known
      (5L, "solo"))      // <2 tokens → no bigrams, absent
      .toDF("doc_id", "text")
    val got = graft.ops.Text.bigramLmScores(tgt, lm)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((2L, 2L, 4L)), 3L -> ((3L, 0L, 0L))))
  }

  test("pmiPairs equals the brute-force windowed co-occurrence definition") {
    val texts = Seq(
      "the quick brown fox the quick brown cat",
      "the quick red fox jumps",
      "quick the quick the quick",
      "solo",
      "a b a b a b a b")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = 2
    val fast = Text.pmiPairs(docs, window = w, topK = 1000, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // brute force in plain Scala over the same definition
    val tokss = texts.map(_.split(" ").toSeq)
    val pairs = tokss.flatMap { l =>
      for (i <- l.indices; d <- 1 to w; if i + d < l.size)
        yield (Seq(l(i), l(i + d)).min, Seq(l(i), l(i + d)).max)
    }
    val nTok = tokss.map(_.size).sum.toDouble
    val nP = pairs.size.toDouble
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val slow = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
      .map { case ((a, b), c) =>
        val pmi = math.log(c.toDouble * nTok * nTok / (nP * uni(a) * uni(b)))
        (a, b) -> (c, BigDecimal(pmi).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(fast == slow)
  }

  test("mergePmiState: merged batch states equal the full-corpus state") {
    val docs = Seq(
      (0L, "a b c a b"), (1L, "b c d"), (2L, "a b a b"),
      (3L, "x"), (4L, "c d e f")).toDF("doc_id", "text")
    def asMap(st: org.apache.spark.sql.DataFrame) = st
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2))) -> r.getLong(3)).toMap
    val full = asMap(Text.pmiState(docs, window = 2))
    val merged = asMap(Text.mergePmiState(
      Text.pmiState(docs.filter($"doc_id" % 2 === 0), window = 2)
        .unionByName(Text.pmiState(docs.filter($"doc_id" % 2 =!= 0), window = 2))))
    assert(full.nonEmpty && merged == full)
    // a pair split across batches keeps full multiplicity
    assert(full(("p", "a", Some("b"))) >= 4L)
    // and the read side agrees row-for-row with the one-shot path
    val direct = Text.pmiPairs(docs, window = 2, topK = 100, minCount = 2)
      .collect().toSeq
    val viaMerge = Text.pmiFromState(Text.mergePmiState(
        Text.pmiState(docs.filter($"doc_id" % 2 === 0), window = 2)
          .unionByName(Text.pmiState(docs.filter($"doc_id" % 2 =!= 0), window = 2))),
      topK = 100, minCount = 2).collect().toSeq
    assert(direct == viaMerge)
  }

  test("mergeBigramLm: merged batch counts equal the full recompute") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "b c d"),
      (3L, "x"), (4L, "a b")).toDF("doc_id", "text")
    val full = graft.ops.Text.bigramLm(docs)
      .as[(String, Long)].collect().toMap
    val merged = graft.ops.Text.mergeBigramLm(
        graft.ops.Text.bigramLm(docs.filter($"doc_id" % 2 === 0)),
        graft.ops.Text.bigramLm(docs.filter($"doc_id" % 2 =!= 0)))
      .as[(String, Long)].collect().toMap
    assert(full.nonEmpty && merged == full)
    assert(full("a b") == 4L)  // multiplicity survives across batches
  }

  test("gopherQualityFlags: each rule fails exactly its planted doc") {
    val good = (1 to 30).map(_ => "the quicker and lazier doggos").mkString(" ")
    val docs = Seq(
      (1L, good),                               // passes everything
      (2L, "the and of to"),                    // too short → r_count
      (3L, (1 to 30).map(_ => "the a of xx").mkString(" ")), // avg len < 4
      (4L, (1 to 30).map(_ => "12345 67890 4711 0815").mkString(" ")), // no alpha, no stopwords
      (5L, (1 to 30).map(_ => "zorp blick frumble quex").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val out = graft.ops.Text.gopherQualityFlags(docs)
      .select("doc_id", "r_count", "r_avg_len", "r_alpha", "r_stop", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true)))
    assert(!out(2L)._2 && !out(2L)._6)          // count rule
    assert(!out(3L)._3 && !out(3L)._6)          // avg-length rule
    assert(!out(4L)._4 && !out(4L)._5 && !out(4L)._6) // alpha + stop rules
    assert(out(5L)._4 && !out(5L)._5 && !out(5L)._6)  // stop rule only
  }

  test("featureHash: md5 buckets and signs by hand; tf sums to token count") {
    // md5("alpha") = 2c1743a3… → bucket 0x2c1743a % 64 = 58, 8th nibble
    // 3 (odd) → sign −1; md5("beta") = 987bcab0… → bucket 43, nibble 0
    // (even) → +1. Repeats accumulate tf and signed weight; empty-string
    // tokens (doc 2's double space) are dropped, not hashed.
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta  beta"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.ops.Text.featureHash(docs, 64)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      (1L, 58L) -> ((2L, -2L)), (1L, 43L) -> ((1L, 1L)),
      (2L, 43L) -> ((2L, 2L))))
    // invariant on real data: Σtf per doc = its non-empty token count
    val corpus = graft.tables.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val sums = graft.ops.Text.featureHash(corpus, 16)
      .groupBy("doc_id").agg(sum("tf").as("s"))
    val want = corpus.select(col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).as("w"))
    assert(sums.join(want, "doc_id").filter(col("s") =!= col("w")).count() == 0)
  }

  test("JaroWinklerBp: textbook scores as exact basis points") {
    import graft.functions.JaroWinklerBp.scoreStr
    // Winkler's canonical example: m=6, t=1, l=3 →
    // jaro = 17/18, jw = 173/180 = 0.96111…
    assert(scoreStr("MARTHA", "MARHTA") == 9611L)
    // m=4, t=0, l=2 → jaro = 23/30 > 0.7 → jw = 244/300 = 0.81333…
    assert(scoreStr("DIXON", "DICKSONX") == 8133L)
    assert(scoreStr("same", "same") == 10000L)
    assert(scoreStr("", "") == 10000L)
    assert(scoreStr("a", "") == 0L && scoreStr("", "a") == 0L)
    assert(scoreStr("abc", "xyz") == 0L) // no matches
    // jaro = 5/9 ≤ 0.7: the shared "ab" prefix must NOT boost
    assert(scoreStr("abcdef", "abzzzz") == 5555L)
    // symmetric
    assert(scoreStr("DIXON", "DICKSONX") == scoreStr("DICKSONX", "DIXON"))
  }

  test("JaroWinklerBp: long inputs take the BigInt path without overflow") {
    import graft.functions.JaroWinklerBp.scoreStr
    // 30k chars is past the Long-safe bound (~28k; the old all-Long code
    // could go negative). Identical strings hit the boost path: 10000.
    val a30 = "a" * 30000
    assert(scoreStr(a30, a30) == 10000L)
    // half-overlap: m=15000, t=0 → jaro = (1/2 + 1/2 + 1)/3 = 2/3, no
    // boost → floor(10000·2/3) = 6666. Same formula, BigInt arithmetic.
    val half = ("a" * 15000) + ("b" * 15000)
    val s = scoreStr(a30, half)
    assert(s == 6666L, s"expected 6666, got $s")
    // boundary agreement: the two paths compute the identical rational
    val x = "ab" * 10000 // exactly 20000 → Long path
    val y = "ab" * 10001 // 20002 → BigInt path
    assert(scoreStr(x, x) == 10000L && scoreStr(y, y) == 10000L)
    assert(scoreStr(x, y) >= 9900L && scoreStr(x, y) <= 10000L)
  }

  test("jaroLinkagePairs: blocking excludes first-char mismatches, " +
      "threshold filters, scores exact") {
    val df = Seq("martha", "marhta", "xartha", "mzzzzz", "martha")
      .toDF("nm") // duplicate collapses via distinct
    val got = Text.jaroLinkagePairs(df, "nm", 9000L)
      .as[(String, String, Long)].collect().toSet
    // xartha is 1 edit from martha but first char differs → blocked out;
    // mzzzzz shares the block but scores far below τ
    assert(got == Set(("marhta", "martha", 9611L)))
    intercept[IllegalArgumentException] {
      Text.jaroLinkagePairs(df, "nm", 10001L)
    }
  }

  test("dirichletQlTopK: decomposed score equals the definitional " +
      "log-likelihood; cf=0 terms drop; no-match docs and dead queries absent") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c d"))
      .toDF("doc_id", "text")
    val queries = Seq(
      ("q1", Seq("a")),
      ("q2", Seq("a", "zzz")), // zzz: cf = 0 → dropped → identical to q1
      ("q3", Seq("zzz"))) // every term dead → query never appears
      .toDF("qid", "terms")
    val got = Text.dirichletQlTopK(docs, queries, 10, mu = 2.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // definitional check: P(a|d) = (tf + μ·cf/|C|)/(dl + μ), |C| = 9,
    // cf(a) = 3 → d1: (2 + 2/3)/5 = 8/15; d2: (1 + 2/3)/4 = 5/12; d3 has
    // no 'a' and must be absent
    val q1 = got.filter(_._1 == "q1")
    assert(q1.map(t => (t._2, t._3)).toSeq == Seq((1L, 1L), (2L, 2L)))
    assert(math.abs(q1(0)._4 - math.log(8.0 / 15.0)) < 1e-4)
    assert(math.abs(q1(1)._4 - math.log(5.0 / 12.0)) < 1e-4)
    // the dead term changes nothing — scores AND ranks identical
    assert(got.filter(_._1 == "q2").map(t => (t._2, t._3, t._4)).toSeq ==
      q1.map(t => (t._2, t._3, t._4)).toSeq)
    assert(!got.exists(_._1 == "q3"))
  }

  test("stripMarkup: tags removed, link-dense lines dropped, mixed lines " +
      "kept with anchor text, entities decoded last (&amp;lt; stays " +
      "literal), quality metrics shift sane-ward post-strip") {
    val html = Seq(
      "<html><head><title>Sample</title></head><body>",
      "<nav class=\"navigation-menu-container\"><a href=\"/\">Home</a>" +
        " <a href=\"/blog\">Blog</a> <a href=\"/about\">About</a></nav>",
      "<p>the quick brown fox jumps over the lazy dog and then the" +
        " dog naps by the open door</p>",
      "<p>Fish &amp; chips &lt;b&gt; &quot;q&quot; &#39;s&#39;" +
        " A&nbsp;B &amp;lt;esc&amp;gt;</p>",
      "<p>Read more about this fine topic <a href=\"/next\">on the" +
        " next page</a> soon</p>",
      "<div class=\"footer-link-collection\"><a href=\"/x\">x</a>" +
        " <a href=\"/y\">yy</a></div>",
      "</body></html>").mkString("\n")
    val df = Seq((1L, html)).toDF("doc_id", "text")
    val clean = df.select(Text.stripMarkup(col("text")).as("c"))
      .as[String].head()
    val lines = clean.split("\n").toSeq
    // boilerplate gone, content kept — LINE functions, not substring luck
    assert(lines == Seq(
      "Sample",
      "the quick brown fox jumps over the lazy dog and then the dog" +
        " naps by the open door",
      "Fish & chips <b> \"q\" 's' A B &lt;esc&gt;",
      "Read more about this fine topic on the next page soon"))
    // idempotent on already-clean prose with no markup
    val again = Seq((1L, lines(1))).toDF("doc_id", "text")
      .select(Text.stripMarkup(col("text")).as("c")).as[String].head()
    assert(again == lines(1))
    // quality shift: markup tokens blow up mean token length; the strip
    // brings it back into the prose range and raises the stopword share
    def metrics(d: org.apache.spark.sql.DataFrame) =
      Text.qualityMetrics(d).select(col("avg_token_len_bp"),
        col("stopword_bp")).as[(Long, Long)].head()
    val raw = metrics(df)
    val stripped = metrics(df.select(col("doc_id"),
      Text.stripMarkup(col("text")).as("text")))
    assert(raw._1 > 60000 && stripped._1 < 60000,
      s"avg token len bp: raw ${raw._1} vs stripped ${stripped._1}")
    assert(stripped._2 > raw._2,
      s"stopword bp: raw ${raw._2} vs stripped ${stripped._2}")
    // the Gopher gate itself flips at the same boundary
    def gopher(d: org.apache.spark.sql.DataFrame) =
      Text.gopherQualityFlags(d, maxAvgLenBp = 60000)
        .select(col("pass")).as[Boolean].head()
    assert(!gopher(df))
    assert(gopher(df.select(col("doc_id"),
      Text.stripMarkup(col("text")).as("text"))))
  }
}

package graft.functions

import graft.SparkSpec

/** Pins TokenizerStats.topPairs — the distributed BPE merge-candidate
  * scan. */
class TokenizerStatsSpec extends SparkSpec {
  import spark.implicits._

  test("counts and deterministic ordering on a closed-form corpus") {
    // pairs: (a,b)x3  (b,a)x1  (b,c)x2  (c,b)x1
    val docs = Seq((1L, "a b a b"), (2L, "a b c b c")).toDF("doc_id", "text")
    val out = TokenizerStats.topPairs(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 3L), ("b", "c", 2L), ("b", "a", 1L)))
  }

  test("ties at the cut break on the pair, not partition order") {
    // every pair occurs exactly once → order is purely lexicographic
    val docs = Seq((1L, "d c"), (2L, "b a"), (3L, "a z"), (4L, "c q")).toDF("doc_id", "text")
    val out = TokenizerStats.topPairs(docs, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "z"), ("b", "a")))
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TokenizerStats.topPairs(docs, "text").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n${plan.take(1200)}")
  }

  test("short docs contribute nothing and break nothing") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val out = TokenizerStats.topPairs(docs, "text").collect()
    // "" normalizes to [""] (1 token, no pairs); "solo" has no pairs
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("x", "y", 1L)))
  }

  // ---- BPE trainer ------------------------------------------------------

  /** Straight single-node reference BPE (Sennrich et al. alg.): word
    * frequencies, then per round count weighted adjacent pairs, take
    * the (count desc, pair asc) argmax, fuse greedily left-to-right.
    */
  private def referenceBpe(corpus: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    def tok(s: String): Seq[String] =
      s.toLowerCase.map(c => if (c.isLetterOrDigit) c else ' ').mkString
        .split(" +").toSeq.filter(_.nonEmpty) match {
        case Nil => Seq("")
        case t => t
      }
    val wordFreq = scala.collection.mutable.Map.empty[String, Long]
    corpus.flatMap(tok).foreach(w => wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1)
    var words: Map[Vector[String], Long] =
      wordFreq.toMap.map { case (w, f) => (w.toVector.map(_.toString), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (pairs.nonEmpty) {
        val ((a, b), n) = pairs.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((r.toLong, a, b, n))
        words = words.toSeq.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b) acc(acc.length - 1) = a + b
            else acc += x
          }
          (acc.toVector, f)
        }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
      }
    }
    out.toSeq
  }

  test("bpeTrain equals a straight single-node BPE on a hand corpus") {
    val corpus = Seq(
      "the cat sat on the mat", "the cat ate the rat", "a cat and a bat",
      "low lower lowest", "new newer newest", "wider wide widest",
      "banana bandana", "aaaa aaa aa")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val expected = referenceBpe(corpus, rounds = 10)
    val got = TokenizerStats.bpeTrain(docs, "text", rounds = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("mergeOnce fuses greedily left-to-right, non-overlapping") {
    val df = Seq(
      (Seq("x", "x", "x", "x"), "x", "x"), // → xx xx
      (Seq("a", "a", "a"), "a", "a"),      // → aa a
      (Seq("a", "b", "a", "b"), "a", "b"), // → ab ab
      (Seq("b", "a", "b"), "a", "b"),      // → b ab
      (Seq("q"), "a", "b")                 // untouched
    ).toDF("s", "a", "b")
    import org.apache.spark.sql.functions.col
    def run(syms: Seq[String], a: String, b: String): Seq[String] = {
      val one = Seq(Tuple1(syms)).toDF("s")
      one.select(TokenizerStats.mergeOnce(col("s"), a, b).as("m"))
        .collect()(0).getSeq[String](0)
    }
    assert(run(Seq("x", "x", "x", "x"), "x", "x") == Seq("xx", "xx"))
    assert(run(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(run(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(run(Seq("b", "a", "b"), "a", "b") == Seq("b", "ab"))
    assert(run(Seq("q"), "a", "b") == Seq("q"))
    assert(run(Seq(), "a", "b") == Seq())
    df.count() // silence the unused frame
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // single-char words only → round 1 has no intra-word pairs at all
    val out = TokenizerStats.bpeTrain(docs, "text", rounds = 5).collect()
    assert(out.isEmpty, "no intra-word pairs → no merges learned")
  }

  test("bpeEncodeCounts: hand-checked token counts under the learned merges") {
    // corpus: "aaab aaab ab xyz" per doc → merges learn (a,a) then (aa,a)
    // or similar; verify counts against a from-scratch replay
    val corpus = Seq("aaab aaab ab", "xyz aaab", "")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rounds = 3
    val out = TokenizerStats.bpeEncodeCounts(docs, "doc_id", "text", rounds)
      .orderBy("doc_id").collect()
    // independent replay: train merges via the (already spec-pinned)
    // local trainer, then encode each word by the same greedy fuse
    val wordFreq = scala.collection.mutable.Map.empty[String, Long]
    def tok(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    corpus.flatMap(tok).foreach(w => wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1)
    val merges = TokenizerStats.bpeTrainLocal(wordFreq.toArray, rounds).map(m => (m._2, m._3))
    def encode(w: String): Int = {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
          else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms.length
    }
    corpus.zipWithIndex.foreach { case (t, i) =>
      // the pinned tokenizer convention: empty text yields ONE empty
      // token (the reference's `case Nil => Seq("")`), which encodes
      // to zero symbols — so an empty doc reports (1, 0, 0.0), not null
      val words0 = tok(t)
      val words = if (words0.isEmpty) Array("") else words0
      val r = out(i)
      assert(r.getLong(1) == words.length.toLong, s"doc $i n_words: $r")
      val expTok = words.map(encode(_).toLong).sum
      assert(r.getLong(2) == expTok, s"doc $i n_bpe_tokens: ${r.getLong(2)} vs $expTok")
      assert(r.getDouble(3) == expTok.toDouble / words.length, s"doc $i ratio: $r")
    }
  }

  test("local-finish threshold: driver-local merges equal the distributed loop verdict-for-verdict") {
    // ties on purpose (every bigram of "abab"/"baba" shows up twice;
    // "zz zz" vs "yy yy" tie on count and must break on the pair),
    // plus enough rounds to exhaust one word family mid-run
    val corpus = Seq(
      "abab baba abab", "zz zz yy yy", "the cat sat on the mat",
      "mississippi mississippi", "deterministic deterministic merge")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val local = table(TokenizerStats.bpeTrain(docs, "text", rounds = 15)) // default: local finish
    val dist = table(TokenizerStats.bpeTrain(docs, "text", rounds = 15,
      localFinishMaxVocab = 0)) // knob at 0 forces the distributed loop
    assert(local.nonEmpty && local == dist,
      s"\nlocal: $local\ndist:  $dist")
    // early-exhaustion parity: both venues stop at the same round
    val tiny = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val l2 = table(TokenizerStats.bpeTrain(tiny, "text", rounds = 10))
    val d2 = table(TokenizerStats.bpeTrain(tiny, "text", rounds = 10, localFinishMaxVocab = 0))
    assert(l2 == d2 && l2.length == 1, s"one learnable merge: $l2 vs $d2")
  }
}

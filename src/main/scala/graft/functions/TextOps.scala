package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-training-data pipeline
  * (SURVEY.md §2 rows 27-30). Everything here is pure built-in Column
  * composition — codegen'd, shuffle-free, scales linearly over
  * documents. Each op has a DuckDB twin (see SparkEntry oracles) whose
  * expressions mirror these term-for-term.
  */
object TextOps {

  /** Canonical text normalization shared by all dedup/text ops:
    * lowercase, strip non-alphanumerics, collapse whitespace.
    * Evaluated by the one-pass NormalizeKernel (single char loop for
    * ASCII, exact JVM-call replication otherwise) — bit-identical to
    * the declarative pipeline below (NormalizeTokensSpec pins it on
    * edge strings and the real corpus).
    */
  def normalize(c: Column): Column = graft.plans.NormalizeKernel.normalize(c)

  def tokens(c: Column): Column = graft.plans.NormalizeKernel.tokens(c)

  /** Declarative specifications the kernels mirror. */
  def normalizeDeclarative(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  def tokensDeclarative(c: Column): Column = split(normalizeDeclarative(c), " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: letter runs, single digits, and isolated
    * punctuation — a cheap stand-in for a real tokenizer's token count.
    *
    * Whitespace is an EXPLICIT class, not `\s`: Java's ASCII `\s`
    * includes vertical tab (0x0B) while RE2's excludes it, so the two
    * engines disagreed on every real document carrying a VT (22 of the
    * real corpus' 518 — found by the r18 real_text_tokens gate). The
    * explicit `[ \t\n\x0B\f\r]` is Java-`\s`-identical and parses the
    * same in both engines; VT counts as whitespace, not a token.
    */
  def bpeishCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"))

  /** 60-bit deterministic string hash: the first 15 hex chars of md5.
    * Chosen because BOTH engines compute it exactly: Spark
    * `conv(substr(md5(x),1,15),16,10)`, DuckDB
    * `('0x' || substr(md5(x),1,15))::bigint`. 60 bits keeps every
    * downstream product `a*(h%M)` inside signed int64 (DuckDB errors on
    * overflow rather than wrapping, so wraparound tricks are out).
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Token-shingle strings of size `n` (space-joined), empty array when
    * the document has fewer than `n` tokens.
    *
    * Built from `slice` + nested `zip_with`, NOT `element_at` inside a
    * `transform` lambda: a lambda body re-evaluates any captured
    * expression per element, so indexing an unmaterialized `toks`
    * expression would re-run tokenization O(n_shingles × n) times per
    * document (observed 30s for 5k docs). slice/zip_with children are
    * evaluated once per row.
    */
  def shingles(toks: Column, n: Int): Column = {
    val len = size(toks) - (n - 1)
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), len))
    val joined = parts.reduceLeft((acc, p) => zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
    when(size(toks) >= n, joined).otherwise(array().cast("array<string>"))
  }

  /** Per-language stopword sets for the language-ID heuristic. Tiny on
    * purpose: language ID at 100 TB must be a cheap scan, not a model.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"))

  /** DISTINCT stopword hits for one language over a token array.
    * array_intersect (native set op), not filter+lambda: the
    * interpreted per-token lambda was ~50× slower. Distinct-hit
    * semantics are equivalent for argmax language ID with short word
    * lists; the DuckDB twin uses list_intersect identically.
    */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** argmax language by stopword hits; ties and zero hits → "und"
    * (undetermined). Deterministic: languages compared in declaration
    * order, strict improvement required.
    */
  def langid(toks: Column): Column = {
    val hits = stopwords.map { case (l, ws) => (l, stopwordHits(toks, ws)) }
    val best = hits.foldLeft((lit("und"), lit(0))) { case ((bl, bh), (l, h)) =>
      (when(h > bh, lit(l)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    best._1
  }

  /** Heuristic quality score in [0,1]: mix of alpha ratio, stopword
    * ratio, and mean token length sweet-spot. Formula is arbitrary but
    * FIXED — the oracle reproduces it bit-for-bit.
    */
  /** Shannon entropy (nats) of the token distribution — vocabulary
    * diversity; low entropy flags repetitive/degenerate text. One-pass
    * kernel (plans.TokenEntropy), lex-ordered fold shared with the SQL
    * twin.
    */
  def tokenEntropy(text: Column): Column =
    graft.plans.TextHashKernels.tokenEntropy(tokens(text))

  /** Gopher/C4-style repetition signal: the fraction of n-gram
    * occurrences that are duplicates of an earlier occurrence in the
    * same document — `1 − distinct/total` over the token n-grams.
    * High values flag boilerplate and degenerate generations. 0.0 for
    * documents with fewer than n tokens (no n-grams ⇒ nothing
    * repeated). Exact ratios of small ints, engine-identical.
    */
  def repetitionRatio(text: Column, n: Int): Column =
    repetitionRatioFromHashes(tokenHashes32Kernel(text), n)

  /** 32-bit token hashes via the one-pass TokenHash60 kernel — ONE md5
    * per token. Callers computing several n-gram statistics over the
    * same document should materialize this once and feed the
    * `FromHashes` forms: the md5 work is then paid once per token, not
    * once per (n, shingle).
    */
  def tokenHashes32Kernel(text: Column): Column =
    graft.plans.TextHashKernels.tokenHash60(tokens(text), 4294967296L)

  /** Repetition ratio over precomputed token hashes: n-gram identity is
    * the Horner code h(g) = fold(acc·131 + th_i) over the gram's token
    * hashes — pure long arithmetic, no md5, no shingle strings; the SQL
    * twin folds the same values in the same order so the distinct
    * counts (ratios of small ints) are engine-identical. Distinct
    * grams collide only when 131-weighted hash differences cancel
    * (~2^-32 per pair) — both engines see the same collision, and the
    * statistic moves by ~1/grams in the rare hit.
    */
  def repetitionRatioFromHashes(th: Column, n: Int): Column = {
    val grams = gramHashes(th, n)
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Horner n-gram codes over precomputed token hashes (see
    * [[repetitionRatioFromHashes]] for the identity/collision story) —
    * an n-gram's identity as ONE int64, no md5, no shingle strings.
    * `th` must be a MATERIALIZED column (tokenHashes32Kernel behind a
    * projection boundary): the lambda body re-evaluates captured
    * expressions per element.
    */
  def gramHashes(th: Column, n: Int): Column =
    when(size(th) >= n,
      transform(sequence(lit(1), size(th) - (n - 1)),
        i => (0 until n).map(j => element_at(th, i + lit(j)))
          .reduceLeft((acc, x) => acc * lit(131L) + x)))
      .otherwise(array().cast("array<bigint>"))

  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val chars = length(text).cast("double")
    // empty text: 0 alpha chars of 0 chars scores 0, not a
    // divide-by-zero (ANSI mode faults x/0 — surfaced by the edge
    // fixture's empty-doc row); n is never 0 (tokens('') = [''])
    val alphaRatio = when(chars > lit(0.0),
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / chars)
      .otherwise(lit(0.0))
    val stopRatio = stopwordHits(toks, stopwords.flatMap(_._2)).cast("double") / n
    val meanTokLen = (length(regexp_replace(normalize(text), " ", "")).cast("double")) / n
    val lenScore = when(meanTokLen >= 3.0 && meanTokLen <= 8.0, lit(1.0)).otherwise(lit(0.5))
    (alphaRatio * lit(0.4)) + (least(stopRatio * lit(4.0), lit(1.0)) * lit(0.3)) + (lenScore * lit(0.3))
  }

  /** Rolling polynomial fingerprint over token hashes:
    * fold h = (h*131 + (h60(tok) % M)) % M. Order-sensitive (unlike a
    * bag-of-words hash) — reordered documents fingerprint differently.
    * Evaluated by the one-pass FingerprintKernel (md5 from digest
    * bytes, no hex-string round-trip); `fingerprintDeclarative` is the
    * Column-form specification it mirrors bit-for-bit (spec-pinned).
    */
  val FpMod = 2147483647L
  def fingerprint(toks: Column): Column =
    graft.plans.TextHashKernels.fingerprint(toks, FpMod)

  def fingerprintDeclarative(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(131L) + pmod(h60(t), lit(FpMod)), lit(FpMod)))

  /** Per-token 32-bit hashes for simhash. Materialize this as its own
    * column before calling simhash32FromHashes: the 32 bit-filters each
    * re-evaluate their child, so hashing must sit behind a projection
    * boundary (CollapseProject keeps multi-referenced non-cheap
    * expressions un-inlined).
    */
  def tokenHashes32(toks: Column): Column =
    transform(toks, t => pmod(h60(t), lit(4294967296L)))

  /** 32-bit SimHash over pre-hashed tokens: bit j is the majority vote
    * of bit j across token hashes; ties → 1.
    */
  def simhash32FromHashes(hs: Column): Column = {
    val n = size(hs)
    (0 until 32).map { j =>
      val setCnt = size(filter(hs, h => (shiftright(h, j).bitwiseAND(lit(1L))) === 1L))
      when(setCnt * 2 >= n, lit(1L << j)).otherwise(lit(0L))
    }.reduceLeft[Column](_ + _)
  }

  /** Convenience single-expression form (fine for small frames/tests;
    * prefer the two-projection form in pipelines).
    */
  def simhash32(toks: Column): Column = simhash32FromHashes(tokenHashes32(toks))

  /** MinHash signature: k permutations h_i(x) = (a_i*(h60(x)%M)+b_i)%M
    * over the shingle set; deterministic (a_i, b_i) from a fixed seed.
    */
  val MinhashMod = 2147483647L
  def minhashParams(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Base hashes for minhash: one md5 per shingle (the perms then work
    * on int64s — 16 perms ≠ 16 md5 passes).
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(h60(s), lit(MinhashMod)))

  /** Permuted minima over a pre-hashed shingle array (shingleHashes). */
  def minhashSig(hashesCol: Column, params: Seq[(Long, Long)]): Seq[Column] =
    params.map { case (a, b) =>
      array_min(transform(hashesCol, h => pmod(lit(a) * h + lit(b), lit(MinhashMod))))
    }

  /** PII patterns, deliberately restricted to syntax with identical
    * semantics in Java regex (Spark codegen) and RE2 (the DuckDB
    * oracle): character classes, bounded/unbounded counted repeats,
    * optional — no backrefs, no lookaround.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-shaped runs: optional +, then ≥8 chars of digits/hyphens
    * bounded by digits. Applied AFTER email redaction so digit runs
    * inside addresses are already gone.
    */
  val PhoneRe = "\\+?[0-9][0-9-]{6,}[0-9]"

  /** Scrub emails then phone numbers — the standard pre-training PII
    * hygiene pass. Pure codegen'd regexp_replace: map-only, no
    * shuffle, linear over the corpus.
    */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailRe), lit(0)))

  /** Counted on the email-redacted text — same visibility rule as
    * [[redactPii]]'s second pass.
    */
  def phoneCount(c: Column): Column =
    size(regexp_extract_all(regexp_replace(c, EmailRe, "<EMAIL>"), lit(PhoneRe), lit(0)))

  /** Feature-hashing (hashing-trick) vectorizer, Weinberger et al.
    * 2009: token → bucket h mod dim, contribution ±1 by an independent
    * hash bit (bit 16 — disjoint from the low bucket bits for dim ≤
    * 65536), summed per bucket — the fixed-width sparse-text encoding
    * linear classifiers (fastText/VW-style quality models) train on.
    * Signed hashing makes collisions cancel in expectation instead of
    * biasing counts upward. Integer sums over the token-hash array —
    * MAP-ONLY (no shuffle, no vocabulary), association-free, exact
    * cross-engine. Returns the dim feature Columns (f0..f{dim-1}).
    */
  def hashFeatures(text: Column, dim: Int): Seq[Column] = {
    require(dim >= 2 && dim <= 65536, s"dim must be in [2, 65536], got $dim")
    val th = tokenHashes32Kernel(text)
    (0 until dim).map { b =>
      aggregate(
        filter(th, h => pmod(h, lit(dim.toLong)) === b),
        lit(0L),
        (acc, h) => acc + lit(1L) - lit(2L) * shiftright(h, 16).bitwiseAND(lit(1L)))
        .as(s"f$b")
    }
  }

  /** The production form of [[hashFeatures]]: ALL dim bucket sums in
    * ONE kernel pass over the token hashes (plans.HashFeatureVec) —
    * the per-bucket filter+aggregate spec form above traverses the
    * hash array dim times per row (a measured ~6× on the 16-bucket
    * query). Value-identical (parity spec-pinned); consume via a
    * two-level select so CollapseProject cannot inline the kernel
    * once per extracted bucket (the text_repetition caveat).
    */
  def hashFeatureVec(text: Column, dim: Int): Column = {
    require(dim >= 2 && dim <= 65536, s"dim must be in [2, 65536], got $dim")
    graft.plans.HashExpressions.hashFeatureVec(tokenHashes32Kernel(text), dim)
  }
}

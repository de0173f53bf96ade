package graft.functions

import graft.ts.OracleGen.litD

/** DuckDB SQL fragments mirroring TextOps/VectorOps/Dedup/Multimodal
  * Column expressions term-for-term (same association order, E-notation
  * double literals, 1-based list indexing on both engines). These exist
  * so every LLM-pipeline operator keeps a hash-exact oracle.
  */
object SqlTwins {

  /** TextOps.normalize — NOTE the 'g' flag: DuckDB regexp_replace is
    * first-match-only by default, Spark replaces all.
    *
    * The chr(304) pre-replace replays the ONE token-affecting case
    * mapping the engines disagree on (found by the real-corpus gate,
    * r17): Spark/JVM lower('İ' U+0130) expands to 'i' + combining dot
    * U+0307 (the dot then normalizes to a token-splitting space:
    * "İstanbul" → "i stanbul"), while DuckDB's utf8proc maps it 1:1 to
    * 'i' ("istanbul"). A full-Unicode word-context sweep found no
    * other code point whose lower() difference survives the
    * [^a-z0-9 ] strip, so this single replace makes the twins
    * hash-exact on any corpus. (Both sides of the JVM mapping assume
    * a non-Turkish default locale — the same assumption Spark's own
    * lower() makes.)
    */
  /** Simple-OLS statistics from the six raw sums (k, sx, sy, sxx,
    * syy, sxy) as portable SQL — the same TEXT parses on both engines
    * (the rank-diagnostics parity pattern), so the only cross-engine
    * surface is the sums' aggregation order ⇒ round(…,4). Degenerate
    * designs (zero x or y variance) null on the shared ≤ 0 guard.
    */
  val OlsFitSqls: Map[String, String] = {
    val vx = "(k * sxx - sx * sx)"
    val vy = "(k * syy - sy * sy)"
    val cov = "(k * sxy - sx * sy)"
    // round(…,4) + 0.0E0: a tiny-negative slope/intercept lands in
    // (-5e-5, 0), where DuckDB's round preserves -0.0 and Spark's
    // normalizes to +0.0 — the trailing add canonicalizes both
    // engines to +0.0 (exact identity elsewhere, null-safe).
    Map(
      "slope" -> s"round(case when $vx <= 0.0E0 then null else $cov / $vx end, 4) + 0.0E0",
      "intercept" -> (s"round(case when $vx <= 0.0E0 then null " +
        s"else (sy - ($cov / $vx) * sx) / k end, 4) + 0.0E0"),
      "r2" -> (s"round(case when $vx <= 0.0E0 or $vy <= 0.0E0 then null " +
        s"else ($cov * $cov) / ($vx * $vy) end, 4) + 0.0E0"))
  }

  def norm(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower(replace($c, chr(304), 'i' || chr(775))), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  def toks(c: String): String = s"string_split(${norm(c)}, ' ')"

  /** TextOps.h60 */
  def h60(s: String): String = s"cast(('0x' || substr(md5($s), 1, 15)) as bigint)"

  /** TextOps.shingles (t = token-list sql, 1-based slicing both sides) */
  def shingles(t: String, n: Int): String = {
    val concat = (0 until n).map(k => s"$t[i + $k]").mkString(" || ' ' || ")
    s"case when len($t) >= $n then list_transform(range(1, len($t) - ${n - 2}), i -> $concat) else [] end"
  }

  /** TextOps.shingleHashes */
  def shingleHashes(sh: String): String =
    s"list_transform($sh, s -> ${h60("s")} % ${TextOps.MinhashMod})"

  /** TextOps.tokenHashes32Kernel over a token-list sql (one md5/token). */
  def tokenHashes32(t: String): String =
    s"list_transform($t, s -> ${h60("s")} % 4294967296)"

  /** TextOps.gramHashes over a pre-hashed list sql: Horner codes
    * (…((th_i · 131) + th_{i+1}) · 131 …) — the same left fold as the
    * Column form, pure int64 arithmetic.
    */
  def gramHashes(th: String, n: Int): String = {
    val code = (1 until n).foldLeft(s"$th[i]")((acc, j) => s"(($acc) * 131) + $th[i + $j]")
    s"case when len($th) >= $n then list_transform(range(1, len($th) - ${n - 2}), i -> $code) else [] end"
  }

  /** TextOps.minhashSig for one (a,b) permutation over pre-hashed sql. */
  def minhashOne(hs: String, a: Long, b: Long): String =
    s"list_min(list_transform($hs, h -> ($a * h + $b) % ${TextOps.MinhashMod}))"

  /** TextOps.simhash32 over a token-list sql. */
  def simhash32(t: String): String =
    simhash32FromHashes(s"list_transform($t, s -> ${h60("s")} % 4294967296)")

  /** TextOps.simhash32 over a pre-hashed int list sql (a CTE column):
    * inlining the tokenize+md5 chain into all 64 bit-term references
    * made the real-corpus twin re-tokenize every doc 64× in DuckDB
    * (180 s → 1.6 s by hashing once in a materialized CTE).
    */
  def simhash32FromHashes(hs: String): String =
    (0 until 32).map { j =>
      s"(case when len(list_filter($hs, h -> ((h >> $j) & 1) = 1)) * 2 >= len($hs) then ${1L << j} else 0 end)"
    }.reduceLeft((x, y) => s"($x + $y)")

  /** TextOps.fingerprint: left fold (init 0 ≡ DuckDB's first-element
    * init because (0*131 + h) % M = h for h < M).
    */
  def fingerprint(t: String): String =
    s"list_reduce(list_transform($t, s -> ${h60("s")} % ${TextOps.FpMod}), (a, b) -> (a * 131 + b) % ${TextOps.FpMod})"

  /** TextOps.stopwordHits (distinct-hit semantics via set intersect) */
  def stopwordHits(t: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_intersect($t, $arr))"
  }

  /** TextOps.langid: first language (declaration order) reaching the
    * max hit count; zero hits → 'und'. Equivalent to the strict-> fold.
    *
    * Emitted as nested one-element lambda bindings (`list_transform([x],
    * __v -> body)[1]`): DuckDB inlines every CTE/expression reference,
    * so the naive form re-ran the tokenize chain once per language per
    * comparison (8×) and each list_intersect twice — 12.2 s → 2.5 s
    * on the 518-doc real corpus, value-identical (pure expressions).
    */
  def langidSelect(textCol: String): String = {
    val hitList = TextOps.stopwords
      .map { case (_, ws) => stopwordHits("__t", ws) }.mkString("[", ", ", "]")
    val g = TextOps.stopwords.indices
      .map(i => s"__h[${i + 1}]").mkString("greatest(", ", ", ")")
    val chain = TextOps.stopwords.zipWithIndex
      .map { case ((l, _), i) => s"when __h[${i + 1}] = $g then '$l'" }.mkString(" ")
    s"list_transform([${toks(textCol)}], __t -> " +
      s"list_transform([$hitList], __h -> case when $g = 0 then 'und' $chain end)[1])[1]"
  }

  /** TextOps.qualityScore, identical association. Same one-element
    * lambda-binding shape as [[langidSelect]]: the normalized string
    * binds once as `__n`, its token split once as `__t` — the naive
    * form re-ran the normalize regexes for the token count, the
    * stopword hits, AND the mean-token-length term.
    */
  def qualityScore(textCol: String): String = {
    val n = "cast(len(__t) as double)"
    val chars = s"cast(length($textCol) as double)"
    // empty text: 0, not x/0 (mirrors TextOps.qualityScore's guard)
    val alphaRatio = s"(case when $chars = 0 then ${litD(0.0)} else (cast(length(regexp_replace($textCol, '[^A-Za-z]', '', 'g')) as double) / $chars) end)"
    val stopRatio = s"(cast(${stopwordHits("__t", TextOps.stopwords.flatMap(_._2))} as double) / $n)"
    val meanTokLen = s"(cast(length(regexp_replace(__n, ' ', '', 'g')) as double) / $n)"
    val lenScore = s"(case when __m >= ${litD(3.0)} and __m <= ${litD(8.0)} then ${litD(1.0)} else ${litD(0.5)} end)"
    val body = s"((($alphaRatio * ${litD(0.4)}) + (least($stopRatio * ${litD(4.0)}, ${litD(1.0)}) * ${litD(0.3)})) + ($lenScore * ${litD(0.3)}))"
    s"list_transform([${norm(textCol)}], __n -> " +
      s"list_transform([string_split(__n, ' ')], __t -> " +
      s"list_transform([$meanTokLen], __m -> $body)[1])[1])[1]"
  }

  /** VectorOps.dot for fixed dim: 0.0-seeded left fold ≡ list_reduce
    * first-element init (0.0 + x == x in IEEE).
    */
  def dot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> cast($a[i] as double) * cast($b[i] as double)), (x, y) -> x + y)"

  def cosine(a: String, b: String, dim: Int): String =
    s"(${dot(a, b, dim)} / (sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)})))"

  /** VectorOps.planeDot / lshBucket with literal plane values. */
  def planeDot(v: String, plane: Array[Double]): String =
    plane.zipWithIndex.map { case (p, i) => s"(${litD(p)} * cast($v[${i + 1}] as double))" }
      .reduceLeft((x, y) => s"($x + $y)")

  def lshBucket(v: String, planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (plane, j) =>
      s"(case when ${planeDot(v, plane)} >= ${litD(0.0)} then ${1L << j} else 0 end)"
    }.reduceLeft((x, y) => s"($x + $y)")
}

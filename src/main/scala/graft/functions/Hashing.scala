package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable hashing primitives for the dedup / similarity /
  * fingerprinting operators.
  *
  * Everything here must produce IDENTICAL values in Spark and in the
  * DuckDB oracle, so the primitive is md5 (same bytes everywhere) with
  * the first 15 hex digits parsed as a 60-bit non-negative long —
  * NOT Spark's murmur3 `hash()` (seed/implementation-specific) and NOT
  * DuckDB's `hash()`. All fold orders are left-to-right so double
  * arithmetic is bit-identical too.
  *
  * Each Column builder has a `*Sql` twin generating the equivalent DuckDB
  * expression from the same constants; queries build both sides from one
  * definition so they cannot drift.
  */
object Hashing {
  /** Modulus for permutation hashing: 2^31 - 1 (Mersenne prime). */
  val P: Long = 2147483647L

  /** MinHash permutation count and LSH banding (16 = 4 bands × 4 rows).
    * For ~0.5 Jaccard threshold: P(candidate) = 1-(1-s^4)^4, ≈0.88 at
    * s=0.7, ≈0.24 at s=0.4 — candidates are exact-verified afterwards so
    * band false positives only cost compute, never correctness.
    */
  val MinhashK = 16
  val BandRows = 4
  val NumBands: Int = MinhashK / BandRows

  /** Deterministic permutation coefficients from a splitmix-style LCG —
    * fixed literals shared by the Spark and SQL sides.
    */
  val perms: Seq[(Long, Long)] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.abs(x) % (P - 1) + 1 }
    Seq.fill(MinhashK)((next(), next()))
  }

  // ------------------------------------------------------------------ 60-bit md5 hash
  /** Stable 60-bit hash of a string (first 15 hex digits of md5). */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def stableHash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  // ------------------------------------------------------------------ word shingles
  /** Whitespace words. */
  def words(text: Column): Column = split(text, " ")
  def wordsSql(e: String): String = s"string_split($e, ' ')"

  /** Distinct word n-gram shingles from a WORDS ARRAY column (empty
    * array when the doc is shorter than n words).
    *
    * Callers should pass an attribute (pre-projected `words(text)`), not
    * the `split` expression itself: higher-order-function lambdas are
    * interpreted and re-evaluate every subtree they reference per
    * element — an inline `split` would run n+1 times per shingle.
    */
  def shinglesFromWords(w: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))
    array_distinct(when(size(w) >= n, grams).otherwise(array()))
  }

  /** Convenience wrapper — ONLY for cold paths; see shinglesFromWords. */
  def shingles(text: Column, n: Int): Column = shinglesFromWords(words(text), n)

  /** Word n-grams WITH multiplicity (no array_distinct) — repetition
    * statistics need the counts that shingling deliberately collapses.
    */
  def ngramsFromWords(w: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))
    when(size(w) >= n, grams).otherwise(array())
  }

  def ngramsSql(e: String, n: Int): String = {
    val parts = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($e) - ${n - 2}), i -> $parts)"
      .replace("w[", s"$e[")
  }

  def shinglesSql(e: String, n: Int): String = {
    val parts = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($e) - ${n - 2}), i -> $parts))"
      .replace("w[", s"$e[")
  }

  // ------------------------------------------------------------------ minhash
  /** 60-bit shingle hashes reduced mod P (array<long>, values in [0, P)). */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, s => pmod(stableHash60(s), lit(P)))

  /** MinHash signature (array of MinhashK longs) from reduced hashes.
    * `a*h + b < 2^62` so the arithmetic never overflows a long.
    */
  def minhashSignature(hashes: Column): Column =
    array(perms.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * a + b, lit(P))))
    }: _*)

  /** DuckDB twin: signature as a list expression over `hs` (list of reduced hashes). */
  def minhashSignatureSql(hs: String): String =
    perms.map { case (a, b) =>
      s"list_aggregate(list_transform($hs, h -> (h * ${a}::BIGINT + ${b}::BIGINT) % ${P}::BIGINT), 'min')"
    }.mkString("[", ", ", "]")

  // ------------------------------------------------------------------ simhash
  /** 96-bit fingerprint, stored as TWO 48-bit longs (`sim_lo`, `sim_hi`).
    *
    * Width is a scale decision, not cosmetics: candidate blocking buckets
    * on equal fingerprint chunks, and bucket population ~ |corpus| / 2^w
    * for chunk width w. The previous 48-bit / 6×8-bit design put
    * ~|corpus|/256 docs in each bucket — ~4M docs per bucket at 10⁹ docs,
    * quadratic within bucket. 96 bits banded 8×12 keeps pigeonhole
    * losslessness up to hamming 7 while cutting bucket population 16×
    * (~|corpus|/4096).
    */
  val SimhashBits = 96
  /** Bits per fingerprint word (each word fills the low 48 bits of a long). */
  val SimhashWordBits = 48

  /** 48-bit stable hash from a DISJOINT 12-hex-digit slice of the md5
    * (slice 0 = digits 1-12, slice 1 = digits 13-24) — two independent
    * hash words from one md5 evaluation per word.
    */
  def stableHash48(c: Column, slice: Int): Column =
    conv(substring(md5(c), 1 + slice * 12, 12), 16, 10).cast("long")

  def stableHash48Sql(e: String, slice: Int): String =
    s"CAST('0x' || substr(md5($e), ${1 + slice * 12}, 12) AS BIGINT)"

  /** Per-word 0/1 value of bit `b` — branch-free, so the 96 per-bit
    * aggregates are pure shift-and-mask sums. The classic ±1 vote is
    * recovered as `2·sum_b - n` (n = word count), and the "vote >= 0"
    * bit rule becomes `2·sum_b >= n` — same ties, half the per-row work
    * of a CASE WHEN ±1 contribution.
    */
  def simBitValue(wordHash: Column, b: Int): Column =
    shiftright(wordHash, b).bitwiseAND(1)

  def simBitValueSql(h: String, b: Int): String =
    s"(($h >> $b) & 1)"

  /** Assemble one simhash word from per-bit 1-counts plus the total word
    * count (bit set when 2·sum >= n ⟺ vote sum >= 0; the >= makes the
    * zero-tie deterministic).
    */
  def simhashFromBitSums(sums: Seq[Column], n: Column): Column =
    sums.zipWithIndex.map { case (s, b) =>
      when(s * 2 >= n, lit(1L) * (1L << b)).otherwise(0L)
    }.reduce(_ + _)

  def simhashFromBitSumsSql(sums: Seq[String], n: String): String =
    sums.zipWithIndex.map { case (s, b) =>
      s"CASE WHEN $s * 2 >= $n THEN ${1L << b}::BIGINT ELSE 0::BIGINT END"
    }.mkString(" + ")

  // ------------------------------------------------------------------ embeddings
  /** Left-fold dot product of two double arrays of length `dim` — the fold
    * order is explicit so Spark and DuckDB produce bit-identical doubles.
    *
    * Three implementations were measured; this is the third:
    *   1. flat 64-term expanded sum — 2× slower than the HOF (9.3 s vs
    *      4.6 s q_embed_neardup at sf0.1): 64 inlined null-checked
    *      element_at terms per dot blow generated method sizes;
    *   2. `aggregate` HOF — interpreted per ELEMENT, and when nested
    *      inside another HOF lambda (centroid scoring) the per-term
    *      virtual-eval overhead multiplies;
    *   3. [[graft.functions.DotProductExpr]] (current) — one
    *      JIT-compiled while loop per CALL, a single static call in
    *      generated code, the identical 0.0-seeded left fold (so every
    *      oracle twin built from [[dotFoldSql]] still hash-matches).
    */
  def dotFold(a: Column, b: Column, dim: Int): Column =
    DotProductCol.dot(a, b, dim)

  def dotFoldSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  def cosine(a: Column, b: Column, dim: Int): Column =
    dotFold(a, b, dim) / (sqrt(dotFold(a, a, dim)) * sqrt(dotFold(b, b, dim)))

  def cosineSql(a: String, b: String, dim: Int): String =
    s"${dotFoldSql(a, b, dim)} / (sqrt(${dotFoldSql(a, a, dim)}) * sqrt(${dotFoldSql(b, b, dim)}))"

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * derived from the stable hash of "hp_<plane>_<dim>".
    */
  def hyperplane(plane: Int, d: Int): Double = {
    // Matches stableHash60Sql('hp_j_d') % 2001 — precomputed on the Scala
    // side (the planes are constants, not data-dependent).
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp_${plane}_$d".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    ((h % 2001L) - 1000L) / 1000.0
  }

  /** Sign-LSH bucket id (NumPlanes bits) of an embedding column.
    * `planeOffset` selects a disjoint plane family — multi-table LSH
    * uses offset t·numPlanes for table t.
    *
    * Each plane's dot product is a [[dotFold]] against a typedlit plane
    * vector, NOT an expanded dim-term sum: the expanded form inlines
    * dim×numPlanes multiply-adds into the generated Java (4096 terms
    * for 8-table banding), which blows janino's 64 KB method limit and
    * silently drops the whole stage to interpreted execution. The fold
    * is a compact CodegenFallback call, so plane count never multiplies
    * generated-code size (CodegenSpec compiles these strict). Values
    * are unchanged: the 0.0-seeded left fold adds the same terms in the
    * same order as the flat chain (a leading `-0.0` can flip to `+0.0`,
    * which the `>= 0` sign test cannot observe).
    */
  def signBucket(v: Column, dim: Int, numPlanes: Int, planeOffset: Int = 0): Column =
    (0 until numPlanes).map { j =>
      val plane = typedlit((1 to dim).map(d => hyperplane(planeOffset + j, d)))
      when(dotFold(v, plane, dim) >= 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)

  def signBucketSql(v: String, dim: Int, numPlanes: Int, planeOffset: Int = 0): String =
    (0 until numPlanes).map { j =>
      val dot = (1 to dim).map(d => s"$v[$d] * (${hyperplane(planeOffset + j, d)})").mkString(" + ")
      s"CASE WHEN $dot >= 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END"
    }.mkString(" + ")
}

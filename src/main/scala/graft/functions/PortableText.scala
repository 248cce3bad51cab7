package graft.functions

/** Portable text-hashing expression fragments (SURVEY §6).
  *
  * Engine-specific `hash()` functions (Spark murmur3 vs DuckDB's) can
  * never hash-match across the oracle boundary, so every sketch in the
  * dedup family is built from explicit integer arithmetic that both
  * engines evaluate identically: a polynomial rolling hash over
  * codepoints mod p, affine re-hashes for minhash, and sign-of-sum for
  * simhash. The Spark fragment and the DuckDB fragment for each
  * primitive live side by side here so they cannot drift apart.
  *
  * All arithmetic stays below 2^63: acc < p ≈ 1e9, coefficients < 32,
  * so `acc*31+c` and `(2j+3)*x` max out near 3.1e10.
  */
object PortableText {
  val P = 1000000007L
  /** minhash signature length and LSH banding (bands × rows = k). */
  val MinHashK = 8
  val Bands = 4
  /** simhash bit width. Token hashes are mod p ≈ 2^30, so bits ≥ 30
    * vote uniformly 0 — 30 informative bits. 32 divides evenly into
    * the 4 pigeonhole bands of [[graft.operators.TextDedup.simHashPairs]]. */
  val SimHashBits = 32

  // ---------- Spark SQL fragments ----------
  /** whitespace tokens, empties dropped (split-on-space is the
    * tokenization the reference's pandas code implies). */
  val tokens = "filter(split(text, ' '), t -> t != '')"
  /** distinct-token polynomial hashes — via the native codegen'd
    * [[PolyHash]] expression (registered as `graft_polyhash`), which
    * evaluates the same fold as the HOF spelling
    * `aggregate(split(t,''), 0L, (a,c) -> (a*31+ascii(c)) % p)`
    * without per-char array allocation or lambda interpretation. */
  val tokenHashes: String =
    s"transform(array_distinct($tokens), t -> graft_polyhash(t))"
  /** k minhashes via affine re-hash (a_j = 2j+3, b_j = 5j+7) — native
    * [[MinHashes]] expression (registered as `graft_minhashes`); same
    * fold as the HOF spelling `transform(sequence(0, k-1), j ->
    * array_min(transform(th, x -> ((2j+3)x + 5j+7) % p)))` without
    * k·|th| interpreted lambda calls per row. */
  val minHashes: String = s"graft_minhashes(th, $MinHashK)"
  /** simhash: sign of per-bit vote sum over token hashes — native
    * [[SimHash64]] expression (registered as `graft_simhash`); same
    * exact-integer votes as the HOF spelling `aggregate(sequence(0,
    * bits-1), 0L, (s, i) -> s + CASE WHEN aggregate(th, 0L, (a, x) ->
    * a + CASE WHEN shiftright(x, i) % 2 = 1 THEN 1 ELSE -1 END) > 0
    * THEN shiftleft(1L, i) ELSE 0L END)` without bits·|th| interpreted
    * lambda calls per row. */
  val simHash: String = s"graft_simhash(th, $SimHashBits)"
  /** whole-document polynomial fingerprint (native [[PolyHash]]). */
  val docFingerprint: String = "graft_polyhash(text)"
  /** count of tokens appearing in `words` — the stopword/marker-hit
    * fragment shared by quality scoring, language-ID voting, and the
    * corpus quality filter, so the counting semantics (and the quoted
    * in-list construction) cannot drift between them. */
  def wordHits(words: Seq[String]): String = {
    require(words.forall(!_.contains("'")),
      s"word list entries must not contain quotes: $words")
    val list = words.map(w => s"'$w'").mkString(", ")
    s"size(filter($tokens, t -> t IN ($list)))"
  }
  /** distinct character 3-grams — native [[CharGrams]] expression
    * (registered as `graft_grams`); same set and order as the HOF
    * spelling `array_distinct(transform(sequence(1, length(text)-2),
    * i -> substring(text, i, 3)))`. */
  val grams3: String = "graft_grams(text, 3)"

  // ---------- DuckDB duals (same semantics, DuckDB syntax) ----------
  /** The multiplicative doc_id hash (CorpusPipeline.hashOrder) in
    * DuckDB SQL: first reduction spelled ((x % P + P) % P) — pmod —
    * so NEGATIVE ids agree with Spark (SQL `%` follows the dividend
    * sign); after it every term is non-negative and plain `%`
    * suffices. ONE definition shared by every oracle that ranks or
    * splits by this hash — hand-copied spellings are how cross-engine
    * hash divergence sneaks in. */
  def duckHashOrder(idCol: String): String =
    s"((($idCol % $P + $P) % $P) * 2654435761) % $P"
  val duckTokens = "list_filter(string_split(text, ' '), t -> t <> '')"
  val duckTokenHashes: String =
    s"list_transform(list_distinct($duckTokens), t -> " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % $P))"
  val duckMinHashes: String =
    s"list_transform(range($MinHashK), j -> " +
      s"list_min(list_transform(th, x -> ((2*j + 3) * x + 5*j + 7) % $P)))"
  val duckSimHash: String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range($SimHashBits), i -> " +
      "CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(th, x -> " +
      "CASE WHEN ((x >> i) & 1) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), " +
      "(a, b) -> a + b) > 0 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)), " +
      "(a, b) -> a + b)"
  /** polynomial rolling hash of an arbitrary string-typed SQL
    * expression — the DuckDB dual of `graft_polyhash(expr)`. */
  def duckPolyHash(strExpr: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($strExpr, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % $P)"
  val duckDocFingerprint: String = duckPolyHash("text")
  val duckGrams3: String =
    "list_distinct(list_transform(range(1, length(text) - 1), " +
      "i -> substr(text, CAST(i AS INT), 3)))"
}

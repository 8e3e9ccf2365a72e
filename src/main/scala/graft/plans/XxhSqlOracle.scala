package graft.plans

/** DuckDB-SQL replay of Spark's XXH64 string hash (seed 42) for the
  * oracle gate — the machinery that turns "hash-defined, rows-only"
  * into value-checked for [[SimHash64]]-based queries.
  *
  * The algorithm (xxHash64, the same spec `XXH64.hashUTF8String`
  * implements) is pure 64-bit wraparound arithmetic. SQL has no
  * wrapping 64-bit integer, so every operation is generated over
  * HUGEINT with an explicit mod 2^64:
  *  - multiplication by the (constant) primes splits the constant into
  *    32-bit halves so no intermediate exceeds HUGEINT's 127-bit range;
  *  - rotl is a multiply + integer-divide pair;
  *  - xor bridges through signed BIGINT (two's complement is exactly
  *    the mod-2^64 representation) and back.
  * Strings stay under 32 bytes on the corpora this gate runs against
  * (word/shingle tokens), so only the tail path (≤3 8-byte words, one
  * 4-byte word, ≤7 bytes) is generated — unrolled into chained CTE
  * stages, one column per step, because DuckDB evaluates plain column
  * expressions vectorized while `list_reduce` lambdas interpret per
  * row (measured 10-50× slower).
  *
  * The generated SQL is validated end-to-end: the `dedup_simhash` and
  * `dedup_simhash_pairs` oracles built from [[simhashCore]] hash-match
  * the Spark output at sf0.01 and sf0.1, which pins byte extraction,
  * every arithmetic step, the avalanche, the sign convention and the
  * bit-vote aggregation at once.
  */
object XxhSqlOracle {
  private val M64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val M63 = "CAST('9223372036854775808' AS HUGEINT)"
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  private def h(v: BigInt): String = s"CAST('$v' AS HUGEINT)"

  /** x * constant mod 2^64; the constant is split into 32-bit halves so
    * intermediates stay inside HUGEINT. */
  private def mult(x: String, p: BigInt): String = {
    val lo = p % (BigInt(1) << 32)
    val hi = p >> 32
    s"((($x) * ${h(lo)} + ((($x) * ${h(hi)}) % ${h(BigInt(1) << 32)})" +
      s" * ${h(BigInt(1) << 32)}) % $M64)"
  }

  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${h(BigInt(1) << r)}) % $M64) + (($x) // ${h(BigInt(1) << (64 - r))}))"

  /** xor via the signed-BIGINT bridge. */
  private def xor(a: String, b: String): String = {
    def sgn(v: String) =
      s"CAST(CASE WHEN ($v) >= $M63 THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"
    val x = s"xor(${sgn(a)}, ${sgn(b)})"
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64" +
      s" ELSE CAST(($x) AS HUGEINT) END)"
  }

  private def shr(x: String, r: Int): String =
    s"(($x) // ${h(BigInt(1) << r)})"

  private def addm(xs: String*): String =
    xs.mkString("((", " + ", s") % $M64)")

  /** Re-sign a HUGEINT-mod-2^64 value to Java-long BIGINT. */
  def sign64(v: String): String =
    s"CAST(CASE WHEN ($v) >= $M63 THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"

  private def step8(acc: String, k: String): String =
    addm(mult(rotl(xor(acc, mult(rotl(mult(k, P2), 31), P1)), 27), P1), h(P4))
  private def step4(acc: String, k: String): String =
    addm(mult(rotl(xor(acc, mult(k, P1)), 23), P2), h(P3))
  private def stepB(acc: String, b: String): String =
    mult(rotl(xor(acc, mult(b, P5)), 11), P1)

  /** Byte at 0-based index `pos` (a SQL expression) of hex column hx. */
  private def byteAt(pos: String): String =
    s"CAST((strpos('0123456789ABCDEF', substr(hx, CAST(($pos)*2+1 AS INT), 1)) - 1) * 16" +
      s" + (strpos('0123456789ABCDEF', substr(hx, CAST(($pos)*2+2 AS INT), 1)) - 1) AS HUGEINT)"

  private def leWord(start: String, nBytes: Int): String =
    (0 until nBytes)
      .map(j => s"${byteAt(s"$start+$j")} * ${h(BigInt(1) << (8 * j))}")
      .mkString("(", " + ", ")")

  /** SELECT list turning (g, hx, nb) into the scalar hash inputs. */
  private def scalarExtract: String = {
    val off = "(nb // 8) * 8 + CASE WHEN nb % 8 >= 4 THEN 4 ELSE 0 END"
    val words = (0 until 3).map(w =>
      s"(CASE WHEN nb >= ${8 * (w + 1)} THEN ${leWord((8 * w).toString, 8)}" +
        s" ELSE ${h(0)} END) AS k8_$w")
    val k4 = s"(CASE WHEN nb % 8 >= 4 THEN ${leWord("(nb // 8) * 8", 4)}" +
      s" ELSE ${h(0)} END) AS k4w"
    val offCol = s"CAST($off AS BIGINT) AS offv"
    val tails = (0 until 7).map(t =>
      s"(CASE WHEN $off + $t < nb THEN ${byteAt(s"$off+$t")}" +
        s" ELSE ${h(0)} END) AS tb$t")
    (Seq("g", "nb") ++ words ++ Seq(k4, offCol) ++ tails).mkString(", ")
  }

  /** The (name, expr) stage chain computing the hash from the scalars. */
  private def hashStages: Seq[(String, String)] = {
    val head = Seq("w0v" -> addm("CAST(42 AS HUGEINT)", h(P5), "CAST(nb AS HUGEINT)")) ++
      (0 until 3).map { w =>
        s"w${w + 1}v" ->
          s"(CASE WHEN nb >= ${8 * (w + 1)} THEN ${step8(s"w${w}v", s"k8_$w")} ELSE w${w}v END)"
      } :+ ("f4v" -> s"(CASE WHEN nb % 8 >= 4 THEN ${step4("w3v", "k4w")} ELSE w3v END)")
    val (tails, last) = (0 until 7).foldLeft(
        (Seq.empty[(String, String)], "f4v")) { case ((acc, prev), t) =>
      (acc :+ (s"t${t}v" ->
        s"(CASE WHEN offv + $t < nb THEN ${stepB(prev, s"tb$t")} ELSE $prev END)"),
        s"t${t}v")
    }
    val av = Seq(
      "x1v" -> xor(last, shr(last, 33)), "x2v" -> mult("x1v", P2),
      "x3v" -> xor("x2v", shr("x2v", 29)), "x4v" -> mult("x3v", P3),
      "x5v" -> xor("x4v", shr("x4v", 32)))
    head ++ tails ++ av
  }

  /** Shared CTE prefix ending in `sigs(doc_id, simhash)`: tokenize,
    * hash the DISTINCT word vocabulary once (instances join back — the
    * big win: hash cost scales with vocabulary, not token count), then
    * the 64 bit-votes as one conditional aggregation. */
  lazy val simhashCore: String = {
    val chain = hashStages.zipWithIndex.map { case ((n, e), i) =>
      s"s${i + 1} AS (SELECT *, $e AS $n FROM s$i)"
    }.mkString(",\n")
    val votes = (0 until 64)
      .map(b => s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val sig = (0 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN ${h(BigInt(1) << b)} ELSE ${h(0)} END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS g
       |  FROM documents),
       |vocab AS (SELECT DISTINCT g FROM toks),
       |sb AS (
       |  SELECT g, hex(encode(g)) AS hx,
       |    CAST(octet_length(encode(g)) AS BIGINT) AS nb
       |  FROM vocab),
       |s0 AS (SELECT $scalarExtract FROM sb),
       |$chain,
       |whash AS (SELECT g, ${sign64("x5v")} AS h FROM s${hashStages.size}),
       |hashed AS (SELECT toks.doc_id, whash.h FROM toks JOIN whash USING (g)),
       |votes AS (SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id),
       |sigs AS (SELECT doc_id, ${sign64(s"($sig)")} AS simhash FROM votes)""".stripMargin
  }

  val simhashSql: String =
    simhashCore + "\nSELECT doc_id, simhash FROM sigs ORDER BY doc_id"

  val simhashPairsSql: String =
    simhashCore +
      """
        |SELECT a.doc_id AS id1,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 1
        |ORDER BY id1""".stripMargin
}

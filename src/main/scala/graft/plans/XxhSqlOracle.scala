package graft.plans

/** DuckDB-SQL replay of Spark's XXH64 hash family (seed 42) for the
  * oracle gate — the machinery that turns "hash-defined, rows-only"
  * into value-checked for [[SimHash64]]- and [[MinHashSig]]-based
  * queries.
  *
  * The algorithm (xxHash64, the same spec `XXH64.hashUTF8String` /
  * `hashInt` / `hashLong` implement) is pure 64-bit wraparound
  * arithmetic. SQL has no wrapping 64-bit integer, so every operation
  * is generated over HUGEINT with an explicit mod 2^64:
  *  - multiplication by the (constant) primes splits the constant into
  *    32-bit halves so no intermediate exceeds HUGEINT's 127-bit range;
  *  - rotl is a multiply + integer-divide pair;
  *  - xor bridges through signed BIGINT (two's complement is exactly
  *    the mod-2^64 representation) and back.
  * Strings stay under 32 bytes on the corpora this gate runs against
  * (word/shingle tokens — max observed 26 bytes), so only the tail
  * path (≤3 8-byte words, one 4-byte word, ≤7 bytes) is generated; a
  * token of 32+ bytes would need the unstriped stripe loop, so the
  * byte-length CTE raises a named `error()` instead of silently
  * computing a wrong hash. Chains are unrolled into stacked CTE
  * stages, one column per step, because DuckDB evaluates plain column
  * expressions vectorized while `list_reduce` lambdas interpret per
  * row (measured 10-50× slower).
  *
  * Three Spark hash entry points are replayed (fold semantics verified
  * against `XXH64` directly: `xxhash64(arr)` folds `hashLong` from
  * seed 42; `xxhash64(x, j)` continues the fold with `hashInt(j, ·)`;
  * `xxhash64(str, j)` is `hashInt(j, hashUTF8String(str, 42))` — the
  * exact seed chain [[MinHashSig]] exploits):
  *  - string tail hash  → [[simhashCore]] / [[minhashCtes]] base hash;
  *  - `hashInt(j, base)` → the K per-seed minhash values;
  *  - `hashLong` fold    → LSH band hashes and signature digests.
  *
  * The generated SQL is validated end-to-end: the `dedup_simhash`,
  * `dedup_simhash_pairs`, `dedup_minhash`, `dedup_minhash_kshingle`
  * and `dedup_incremental_near` oracles built here hash-match the
  * Spark output at sf0.01 and sf0.1, which pins byte extraction,
  * every arithmetic step, the avalanche, the sign convention, the
  * signed-min fold and the band-hash chain at once.
  */
object XxhSqlOracle {
  private[plans] val M64 = "CAST('18446744073709551616' AS HUGEINT)"
  private[plans] val M63 = "CAST('9223372036854775808' AS HUGEINT)"
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  private[plans] def h(v: BigInt): String = s"CAST('$v' AS HUGEINT)"

  /** x * constant mod 2^64; the constant is split into 32-bit halves so
    * intermediates stay inside HUGEINT. */
  private[plans] def mult(x: String, p: BigInt): String = {
    val lo = p % (BigInt(1) << 32)
    val hi = p >> 32
    s"((($x) * ${h(lo)} + ((($x) * ${h(hi)}) % ${h(BigInt(1) << 32)})" +
      s" * ${h(BigInt(1) << 32)}) % $M64)"
  }

  private[plans] def rotl(x: String, r: Int): String =
    s"(((($x) * ${h(BigInt(1) << r)}) % $M64) + (($x) // ${h(BigInt(1) << (64 - r))}))"

  /** xor via the signed-BIGINT bridge. */
  private[plans] def xor(a: String, b: String): String = {
    def sgn(v: String) =
      s"CAST(CASE WHEN ($v) >= $M63 THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"
    val x = s"xor(${sgn(a)}, ${sgn(b)})"
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64" +
      s" ELSE CAST(($x) AS HUGEINT) END)"
  }

  private[plans] def shr(x: String, r: Int): String =
    s"(($x) // ${h(BigInt(1) << r)})"

  private[plans] def addm(xs: String*): String =
    xs.mkString("((", " + ", s") % $M64)")

  /** Re-sign a HUGEINT-mod-2^64 value to Java-long BIGINT. */
  def sign64(v: String): String =
    s"CAST(CASE WHEN ($v) >= $M63 THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"

  /** Signed BIGINT column → HUGEINT mod-2^64 representation. */
  private[plans] def unsign64(v: String): String =
    s"(CASE WHEN ($v) < 0 THEN CAST(($v) AS HUGEINT) + $M64" +
      s" ELSE CAST(($v) AS HUGEINT) END)"

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

  /** (g, hx, nb) byte table over a vocabulary CTE — with the 32-byte
    * guard: the stripe path is not generated, so a long token must fail
    * with a named cause instead of a silent wrong hash surfacing later
    * as an inscrutable oracle value-mismatch. */
  private def byteTableCte(name: String, vocabCte: String): String =
    s"""$name AS (
       |  SELECT g, hex(encode(g)) AS hx,
       |    CAST(CASE WHEN octet_length(encode(g)) >= 32
       |              THEN error('xxh64 oracle: token >= 32 bytes — stripe path not generated')
       |              ELSE octet_length(encode(g)) END AS BIGINT) AS nb
       |  FROM $vocabCte)""".stripMargin

  /** Chained CTE stack: each stage (colName, expr) appends one column;
    * CTE names are `<prefix>1..N` reading from `src`. Returns
    * (cteListSql, lastCteName). */
  private[plans] def chain(src: String, prefix: String,
      stages: Seq[(String, String)]): (String, String) = {
    val ctes = stages.zipWithIndex.map { case ((n, e), i) =>
      val from = if (i == 0) src else s"$prefix$i"
      s"$prefix${i + 1} AS (SELECT *, $e AS $n FROM $from)"
    }
    (ctes.mkString(",\n"), s"$prefix${stages.size}")
  }

  /** fmix avalanche: 5 stages ending in column `<p>x5`. */
  private[plans] def fmixStages(p: String, in: String): Seq[(String, String)] = Seq(
    s"${p}x1" -> xor(in, shr(in, 33)),
    s"${p}x2" -> mult(s"${p}x1", P2),
    s"${p}x3" -> xor(s"${p}x2", shr(s"${p}x2", 29)),
    s"${p}x4" -> mult(s"${p}x3", P3),
    s"${p}x5" -> xor(s"${p}x4", shr(s"${p}x4", 32)))

  /** XXH64.hashInt(j, seed): stages ending in `<p>x5` (unsigned).
    * `acc` and `j` are unsigned-HUGEINT column expressions. */
  private[plans] def hashIntStages(p: String, acc: String, j: String): Seq[(String, String)] =
    Seq(
      s"${p}a1" -> addm(acc, h(P5 + 4)),
      s"${p}a2" -> xor(s"${p}a1", mult(j, P1)),
      s"${p}a3" -> addm(mult(rotl(s"${p}a2", 23), P2), h(P3))
    ) ++ fmixStages(p, s"${p}a3")

  /** XXH64.hashLong(input, seed): stages ending in `<p>x5` (unsigned). */
  private[plans] def hashLongStages(p: String, acc: String, in: String): Seq[(String, String)] =
    Seq(
      s"${p}k1" -> mult(rotl(mult(in, P2), 31), P1),
      s"${p}a2" -> xor(addm(acc, h(P5 + 8)), s"${p}k1"),
      s"${p}a3" -> addm(mult(rotl(s"${p}a2", 27), P1), h(P4))
    ) ++ fmixStages(p, s"${p}a3")

  /** The (name, expr) stage chain computing hashUTF8String(g, 42) from
    * the scalar byte columns of [[scalarExtract]]; ends in `x5v`. */
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

  /** CTE stack hashing every row of `vocabCte` (one column `g`) with
    * Spark's `xxhash64(stringCol)` = XXH64.hashUTF8String(g, 42):
    * appendable after a caller-provided vocab CTE, ends in
    * `outCte(g, h)` with h signed BIGINT (Java-long identical). The
    * public entry point for oracles that replay string-hash routing
    * (group-holdout splits, shard assignment, …). */
  def stringHashCtes(vocabCte: String, outCte: String): String = {
    val (chainSql, lastCte) = chain("gh0", "gh", hashStages)
    s"""${byteTableCte("ghb", vocabCte)},
       |gh0 AS (SELECT $scalarExtract FROM ghb),
       |$chainSql,
       |$outCte AS (SELECT g, ${sign64("x5v")} AS h FROM $lastCte)""".stripMargin
  }

  /** CTE stack hashing every row of `vocabCte` (one BIGINT column `v`)
    * with Spark's `xxhash64(longCol)` = XXH64.hashLong(v, 42): ends in
    * `outCte(v, h)`, h signed BIGINT. The numeric sibling of
    * [[stringHashCtes]] for id-keyed routing/sampling replays. */
  def longHashCtes(vocabCte: String, outCte: String): String = {
    val stages = hashLongStages("lh", "CAST(42 AS HUGEINT)", "vu")
    val (chainSql, lastCte) = chain("lh0", "lhc", stages)
    s"""lh0 AS (SELECT v, ${unsign64("v")} AS vu FROM $vocabCte),
       |$chainSql,
       |$outCte AS (SELECT v, ${sign64("lhx5")} AS h FROM $lastCte)""".stripMargin
  }

  /** Shared CTE prefix ending in `sigs(doc_id, simhash)`: tokenize,
    * hash the DISTINCT word vocabulary once (instances join back — the
    * big win: hash cost scales with vocabulary, not token count), then
    * the 64 bit-votes as one conditional aggregation. */
  lazy val simhashCore: String = {
    val (chainSql, lastCte) = chain("s0", "s", hashStages)
    val votes = (0 until 64)
      .map(b => s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val sig = (0 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN ${h(BigInt(1) << b)} ELSE ${h(0)} END")
      .mkString(" + ")
    // MATERIALIZED on the multiply-referenced CTEs (r18): DuckDB
    // inlines plain CTEs at every reference, so `toks` (vocab + hashed)
    // and the self-joined `sigs` otherwise recompute the whole hash
    // chain per reference — pure evaluation hint, results identical.
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS g
       |  FROM documents),
       |vocab AS (SELECT DISTINCT g FROM toks),
       |${byteTableCte("sb", "vocab")},
       |s0 AS (SELECT $scalarExtract FROM sb),
       |$chainSql,
       |whash AS (SELECT g, ${sign64("x5v")} AS h FROM $lastCte),
       |hashed AS (SELECT toks.doc_id, whash.h FROM toks JOIN whash USING (g)),
       |votes AS (SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id),
       |sigs AS MATERIALIZED (SELECT doc_id, ${sign64(s"($sig)")} AS simhash FROM votes)""".stripMargin
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

  // ---------------------------------------------------------------------
  // MinHash replay
  // ---------------------------------------------------------------------

  /** toks body for word-SET shingles (Dedup.wordSet: array_distinct of
    * the space-split lowercased text — DISTINCT per (doc, word)). */
  private val wordSetToks =
    "SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS g FROM documents"

  /** toks body for positional k-word shingles (plans.WordKGrams: k-gram
    * windows, `< k words → the whole text as one gram` fallback,
    * list_distinct per doc — same replay dedup_contamination pins). */
  /** Public form of [[kgramToks]] for oracles that consume the raw
    * shingle stream without the minhash pipeline (e.g. gram novelty). */
  def kgramToksSql(k: Int): String = kgramToks(k)

  private def kgramToks(k: Int): String =
    s"""SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len(w) - ${k - 1}, 1)),
       |    i -> CASE WHEN len(w) >= $k THEN array_to_string(w[i:i+${k - 1}], ' ')
       |         ELSE array_to_string(w, ' ') END))) AS g
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)""".stripMargin

  /** CTE stack ending in `msig(doc_id, m0..m{k-1})` — the [[MinHashSig]]
    * replay: base = hashUTF8String(g, 42) once per DISTINCT shingle,
    * then hashInt(j, base) per seed j (cross join with the seed list —
    * one vectorized chain instead of K generated column sets), min over
    * the doc's shingle set taken over SIGNED values (Java long order,
    * exactly MinHashSig's `h < mins(j)`). Also leaves `toks(doc_id, g)`
    * in scope for downstream exact-Jaccard verification. */
  private def minhashCtes(k: Int, toksBody: String,
      matToks: Boolean = true): String = {
    val (strChain, strLast) = chain("s0", "s", hashStages)
    val (seedChain, seedLast) =
      chain("sj0", "mh", hashIntStages("mh", "bs", "ju"))
    val pivot = (0 until k)
      .map(j => s"max(CASE WHEN j = $j THEN mh END) AS m$j")
      .mkString(",\n    ")
    // MATERIALIZED on the multiply-referenced CTEs (r18): plain CTEs
    // inline at every reference in DuckDB — `toks` feeds vocab + the
    // min fold (+ downstream exact-Jaccard), `msig` feeds the band
    // folds; without the hint each reference recomputes the whole
    // chain. Evaluation hint only — results identical. `matToks` is
    // measured per call site: with ≥3 toks references (the exact-
    // Jaccard verifiers) materializing wins ~5×; with only the two
    // prunable references (kshingle digest) it LOSES 2× because the
    // inlined copies each prune to the columns they need.
    s"""WITH toks AS ${if (matToks) "MATERIALIZED " else ""}(
       |  $toksBody),
       |vocab AS (SELECT DISTINCT g FROM toks),
       |${byteTableCte("sb", "vocab")},
       |s0 AS (SELECT $scalarExtract FROM sb),
       |$strChain,
       |wbase AS (SELECT g, x5v AS bs FROM $strLast),
       |sj0 AS (SELECT g, j, CAST(j AS HUGEINT) AS ju, bs
       |        FROM wbase CROSS JOIN (SELECT unnest(range(0, $k)) AS j) seeds),
       |$seedChain,
       |wh AS (SELECT g, j, ${sign64("mhx5")} AS hv FROM $seedLast),
       |mins AS (SELECT t.doc_id, w.j, min(w.hv) AS mh
       |         FROM toks t JOIN wh w USING (g) GROUP BY t.doc_id, w.j),
       |msig AS MATERIALIZED (SELECT doc_id,
       |    $pivot
       |  FROM mins GROUP BY doc_id)""".stripMargin
  }

  /** CTE stack from `msig` ending in `bb(doc_id, band, bh)` — the LSH
    * banding replay: bh = xxhash64(slice(sig, band*rows+1, rows), band),
    * i.e. a hashLong fold over the band's signature slice from seed 42
    * continued by hashInt(band, ·) (Spark's multi-arg xxhash64 chain,
    * verified against XXH64 directly). Band slices are long-form (one
    * row per (doc, band), `rows` element columns) so the fold is ONE
    * generated column chain instead of bands× copies. */
  private def bandedCtes(k: Int, bands: Int): String = {
    val rows = k / bands
    def elemCase(r: Int): String =
      (0 until bands).map(b => s"WHEN $b THEN ${unsign64(s"m${b * rows + r}")}")
        .mkString("(CASE band ", " ", " END)")
    val elems = (0 until rows).map(r => s"${elemCase(r)} AS e$r").mkString(",\n    ")
    val foldStages = (0 until rows).flatMap { r =>
      val acc = if (r == 0) "CAST(42 AS HUGEINT)" else s"bf${r - 1}x5"
      hashLongStages(s"bf$r", acc, s"e$r")
    } ++ hashIntStages("bi", s"bf${rows - 1}x5", "CAST(band AS HUGEINT)")
    val (foldChain, foldLast) = chain("be", "bf", foldStages)
    s"""bandsl AS (SELECT unnest(range(0, $bands)) AS band),
       |be AS (SELECT doc_id, band,
       |    $elems
       |  FROM msig CROSS JOIN bandsl),
       |$foldChain,
       |bb AS MATERIALIZED (SELECT doc_id, band, ${sign64("bix5")} AS bh FROM $foldLast)""".stripMargin
  }

  /** Exact word-set Jaccard CTEs over candidate pairs `<candCte>(id1,
    * id2)` against `toks`; ends in `jac(id1, id2, jaccard)` with the
    * raw-double `inter / (n1 + n2 - inter)` Spark computes (same IEEE
    * int→double division — bit-identical). Pairs with zero shared
    * shingles never reach `jac` (inner join) — they cannot pass any
    * positive threshold, matching Spark's jaccard=0 filter-out. */
  private def jaccardCtes(candCte: String): String =
    s"""tsz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
       |ixc AS (SELECT c.id1, c.id2, count(*) AS ic
       |        FROM $candCte c
       |        JOIN toks w1 ON w1.doc_id = c.id1
       |        JOIN toks w2 ON w2.doc_id = c.id2 AND w2.g = w1.g
       |        GROUP BY c.id1, c.id2),
       |jac AS (SELECT ixc.id1, ixc.id2,
       |    CAST(ixc.ic AS DOUBLE) / (s1.n + s2.n - ixc.ic) AS jaccard
       |  FROM ixc JOIN tsz s1 ON s1.doc_id = ixc.id1
       |           JOIN tsz s2 ON s2.doc_id = ixc.id2)""".stripMargin

  /** dedup_minhash replay: word-set MinHash (K=32), 8 bands × 4 rows,
    * bucket size ∈ [2, 64] (the maxBucket skew cap), within-bucket
    * ordered pairs deduped across bands, exact-Jaccard ≥ 0.8 verify. */
  val minhashPairsSql: String =
    s"""${minhashCtes(32, wordSetToks)},
       |${bandedCtes(32, 8)},
       |bsz AS (SELECT band, bh, count(*) AS n FROM bb GROUP BY band, bh),
       |okb AS MATERIALIZED (SELECT bb.doc_id, bb.band, bb.bh
       |        FROM bb JOIN bsz USING (band, bh) WHERE bsz.n BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |         FROM okb a JOIN okb b
       |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |${jaccardCtes("cand")}
       |SELECT id1, id2, jaccard FROM jac
       |WHERE jaccard >= 0.8
       |ORDER BY id1, id2""".stripMargin

  /** dedup_minhash_kshingle replay: positional 3-word shingles, K=16
    * signature, digested by xxhash64(sig) — a hashLong fold over the 16
    * signature longs from seed 42. */
  val minhashKshingleSql: String = {
    val foldStages = (0 until 16).flatMap { r =>
      val acc = if (r == 0) "CAST(42 AS HUGEINT)" else s"dg${r - 1}x5"
      hashLongStages(s"dg$r", acc, unsign64(s"m$r"))
    }
    val (foldChain, foldLast) = chain("msig", "dg", foldStages)
    s"""${minhashCtes(16, kgramToks(3), matToks = false)},
       |$foldChain
       |SELECT doc_id, ${sign64(s"dg15x5")} AS sig_hash FROM $foldLast
       |ORDER BY doc_id""".stripMargin
  }

  /** dedup_incremental_near replay: per-doc band hashes are independent
    * of the history/today split, so ONE signature+banding pipeline over
    * all documents splits by doc-id parity afterwards — history buckets
    * capped at 64 (index-side only, no lower bound), today × index
    * candidates, exact-Jaccard ≥ 0.8, anti-join survivors. */
  val incrementalNearSql: String =
    s"""${minhashCtes(32, wordSetToks)},
       |${bandedCtes(32, 8)},
       |hb AS MATERIALIZED (SELECT * FROM bb WHERE doc_id % 2 = 0),
       |tb AS (SELECT * FROM bb WHERE doc_id % 2 = 1),
       |hsz AS (SELECT band, bh, count(*) AS n FROM hb GROUP BY band, bh),
       |okidx AS (SELECT hb.doc_id, hb.band, hb.bh
       |          FROM hb JOIN hsz USING (band, bh) WHERE hsz.n <= 64),
       |cand AS (SELECT DISTINCT t.doc_id AS id1, o.doc_id AS id2
       |         FROM tb t JOIN okidx o ON t.band = o.band AND t.bh = o.bh),
       |${jaccardCtes("cand")},
       |matched AS (SELECT DISTINCT id1 AS doc_id FROM jac WHERE jaccard >= 0.8)
       |SELECT doc_id FROM documents
       |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM matched)
       |ORDER BY doc_id""".stripMargin

  /** CTE stack ending in `bkt(g, b)` — b = pmod(xxhash64(g), buckets)
    * for each DISTINCT g of `vocabCte` (replays Spark's single-arg
    * xxhash64 = hashUTF8String(g, seed 42)). Unsigned mod equals
    * Spark's pmod-of-signed exactly when `buckets` divides 2^64, hence
    * the power-of-two requirement. Feature-hashing replays (DSIR
    * importance buckets) build on this. */
  def hashBucketCtes(vocabCte: String, buckets: Int): String = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val (chainSql, lastCte) = chain("hb0", "hbs", hashStages)
    s"""${byteTableCte("hbb", vocabCte)},
       |hb0 AS (SELECT $scalarExtract FROM hbb),
       |$chainSql,
       |bkt AS MATERIALIZED (SELECT g, CAST(x5v % $buckets AS BIGINT) AS b FROM $lastCte)""".stripMargin
  }

  /** sql_native_fns replay: poly_hash64 (31-polynomial fold — mirrors
    * the TextOps text_fingerprint oracle, seed = plans.PolyHash64.Seed),
    * simhash64 over the word multiset, and xxhash64(minhash_sig(words,
    * 8)) — the K=8 word-set MinHash digested by a hashLong fold. The
    * three sub-replays share one tokenization. */
  val nativeFnsSql: String = {
    val foldStages = (0 until 8).flatMap { r =>
      val acc = if (r == 0) "CAST(42 AS HUGEINT)" else s"nf${r - 1}x5"
      hashLongStages(s"nf$r", acc, unsign64(s"m$r"))
    }
    val (foldChain, foldLast) = chain("msig", "nf", foldStages)
    val votes = (0 until 64)
      .map(b => s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val sig = (0 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN ${h(BigInt(1) << b)} ELSE ${h(0)} END")
      .mkString(" + ")
    s"""${minhashCtes(8, wordSetToks)},
       |$foldChain,
       |mdig AS (SELECT doc_id, ${sign64("nf7x5")} AS mh_digest FROM $foldLast),
       |allw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS g
       |         FROM documents),
       |shh AS (SELECT allw.doc_id, wb2.h
       |        FROM allw JOIN (SELECT g, ${sign64("bs")} AS h FROM wbase) wb2
       |        USING (g)),
       |shv AS (SELECT doc_id,
       |    $votes
       |  FROM shh GROUP BY doc_id),
       |shs AS (SELECT doc_id, ${sign64(s"($sig)")} AS sh FROM shv),
       |pfp AS (
       |  SELECT doc_id,
       |    ${sign64("ph")} AS fp
       |  FROM (
       |    SELECT doc_id,
       |      list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |        list_transform(range(0, CAST(len(hex(encode(text))) AS BIGINT) // 2), i ->
       |          CAST((strpos('0123456789ABCDEF',
       |                       substr(hex(encode(text)), CAST(i * 2 + 1 AS INT), 1)) - 1) * 16
       |             + (strpos('0123456789ABCDEF',
       |                       substr(hex(encode(text)), CAST(i * 2 + 2 AS INT), 1)) - 1)
       |            AS HUGEINT))),
       |        (a, x) -> (a * 31 + x) % $M64) AS ph
       |    FROM documents))
       |SELECT d.doc_id, pfp.fp, shs.sh, mdig.mh_digest
       |FROM documents d
       |JOIN pfp ON pfp.doc_id = d.doc_id
       |JOIN shs ON shs.doc_id = d.doc_id
       |JOIN mdig ON mdig.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}

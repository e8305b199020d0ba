package graft.queries

/** Shared DuckDB-oracle SQL fragments. Every fragment here has exactly one
  * Spark twin (named in the comment); fixing semantics means fixing BOTH
  * places — keeping each fragment single-sourced is what makes that a
  * 2-file change instead of a hunt. */
object DuckSql {

  /** Python-str.strip() (Spark twin: TextFunctions.pyStrip). */
  def strip(e: String): String =
    "regexp_replace(" + e + ", '^\\s+|\\s+$', '', 'g')"

  /** Java String.trim(): strips chars ≤ U+0020 from both ends (Spark twin:
    * the .trim calls inside RecursiveSplitter/ChunkOps). Distinct from
    * [[strip]]: \s misses most C0 controls that Java trim removes. */
  def jtrim(e: String): String =
    "regexp_replace(regexp_replace(" + e +
      ", '^[\\x00-\\x20]+', ''), '[\\x00-\\x20]+$', '')"

  /** F1 content cleaning (Spark twin: TextFunctions.cleanContent). */
  def clean(e: String): String =
    strip(s"""
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace($e, '\\n\\s*\\n\\s*\\n', chr(10)||chr(10), 'g'),
                   ' +', ' ', 'g'),
                 'Cookie Policy|Privacy Policy|Terms of Service', '', 'gi'),
               'Subscribe to.*newsletter', '', 'gi'),
             'Follow us on.*', '', 'gi'),
           '<[^>]+>|&\\w+;', '', 'g')""")

  /** Python-str.split() word count (Spark twin: TextFunctions.wordCount). */
  def wc(e: String): String =
    "CASE WHEN " + strip(e) + " = '' THEN 0 ELSE len(string_split_regex(" +
      strip(e) + ", '\\s+')) END"

  /** Cosine over DOUBLE[] casts (Spark twin: VectorFunctions.cosineSimilarity). */
  def cos(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** lucene-ish tokens (Spark twin: TextSearch.tokens). */
  def words(e: String): String =
    s"list_filter(string_split_regex(lower($e), '[^a-z0-9]+'), t -> length(t) > 0)"

  /** Quality score with null title/url branches (Spark twin:
    * TextFunctions.qualityScore). */
  val quality: String =
    s"""LEAST(1.0e0, GREATEST(0.0e0,
        (CASE WHEN ${wc("text")} > 100 THEN 0.2e0 * LEAST(1.0e0, ${wc("text")} / 1000.0e0) ELSE 0.0e0 END)
        + 0.15e0 * LEAST(1.0e0,
            (CASE WHEN len(regexp_extract_all(text, '(?m)^#{1,6}\\s+.+')) > 0 THEN 0.4e0 ELSE 0.0e0 END)
          + (CASE WHEN len(regexp_extract_all(text, '(?m)^\\s*[-*+]\\s+.+')) > 0 THEN 0.3e0 ELSE 0.0e0 END))
        + 0.25e0 * LEAST(1.0e0,
            len(regexp_extract_all(text, '(?m)^#{1,6}\\s+.+|^\\s*[-*+]\\s+.+|^\\s*\\d+\\.\\s+.+')) / 10.0e0)
        + 0.2e0 * GREATEST(0.0e0, 1.0e0 - ABS(
            (list_sum(list_transform(string_split_regex(text, '[.!?]+'),
               s -> ${wc("s")}))
             * 1.0e0 / len(string_split_regex(text, '[.!?]+'))) - 17.0e0) / 17.0e0)
        + 0.2e0 * 0.5e0))"""

  /** Recursive-CTE replay of the BPE encoder under a fixed merge table
    * (Spark twin: operators.Bpe.tokensScala): WITH-less fragment — prepend
    * WITH RECURSIVE — defining `m` (rank, ' l r ', ' lr '), `dw` (distinct
    * corpus words), `st` (one leftmost-occurrence splice per step, lowest
    * applicable rank first — provably the kernel's merge-all order, see
    * Bpe's scaladoc), `enc` (fixpoint state per word) and
    * `wtok(w, n)` — per-word BPE token counts. Symbols are [a-z0-9]+ by
    * the words() tokenization, so embedding them as SQL literals is safe.
    * Encoding runs once per DISTINCT word — vocabulary-shaped, exactly
    * like the kernel's memo. */
  def bpeWordTokenCtes(merges: Seq[(String, String)],
                       srcRel: String = "documents"): String = {
    val values = merges.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1}, ' $l $r ', ' $l$r ')" }
      .mkString(", ")
    // `srcRel` must be the SAME relation the per-doc counts are later
    // taken over: an inner join against a word set built from a different
    // text (e.g. unscrubbed documents under a scrubbed count) would
    // silently DROP any word the transform introduced, undercounting
    // instead of failing parity
    s"""m(rank, pat, rep) AS (VALUES $values),
        dw AS (SELECT DISTINCT unnest(${words("text")}) AS w FROM $srcRel),
        st AS (
          SELECT w, ' ' || array_to_string(
              list_transform(range(1, length(w) + 1), i -> w[i]), ' ') || ' ' AS s,
            0 AS it
          FROM dw
          UNION ALL
          SELECT st.w,
            substr(st.s, 1, b.p - 1) || b.rep || substr(st.s, b.p + length(b.pat)),
            st.it + 1
          FROM st, LATERAL (
            SELECT m.pat AS pat, m.rep AS rep, position(m.pat IN st.s) AS p
            FROM m WHERE position(m.pat IN st.s) > 0
            ORDER BY m.rank LIMIT 1) b),
        enc AS (SELECT w, s FROM (
          SELECT w, s, it, row_number() OVER (PARTITION BY w ORDER BY it DESC) AS rn
          FROM st) WHERE rn = 1),
        wtok AS (SELECT w, len(string_split_regex(trim(s), '\\s+')) AS n FROM enc)"""
  }

  // ------------------------------------------------------------ chunker SQL

  /** Pure-SQL replay of RecursiveSplitter.splitText (Spark twin:
    * ChunkOps.chunkFlat / the graft_chunk generator): WITH-less fragment —
    * the caller prepends WITH RECURSIVE — that turns `srcCte(gid, txt)`
    * into `<pfx>_chunks(gid, ord, chunk, seq)` with `seq` the 0-based
    * chunk index per gid (splitText's zipWithIndex order) and `chunk` the
    * raw splitText output (merged runs arrive trimmed, unsplittable big
    * pieces untrimmed — exactly the kernel's contract).
    *
    * Shape: the recursion over the fixed separator hierarchy
    * ["\n\n","\n"," ",""] unrolls into FOUR level blocks (the separator
    * list shrinks on every recursion, so depth ≤ 4); each node picks the
    * first separator present in ITS text (tracked by `rem`), splits with
    * keep-separator semantics, and big pieces (≥ chunkSize) either recurse
    * into the next level or — at the char level — emit as-is. Runs of
    * consecutive small pieces feed the greedy merge-with-overlap loop,
    * replayed as a recursive CTE over (i, j) window state with prefix-sum
    * lists: the backtracking while-loop collapses to "smallest j' with a
    * non-violating window" (violation is monotone in j'), and emissions
    * join back to the pieces by index range. Hierarchical order is encoded
    * in zero-padded fixed-width path strings so lexicographic ORDER BY =
    * document order. Fuzz-pinned against the Scala kernel over 6 (size,
    * overlap) configs × 6k adversarial texts during development;
    * oracle-pinned every round by the pipe_* chunk rows. */
  def chunkCtes(pfx: String, srcCte: String, chunkSize: Int, overlap: Int): String = {
    val pad = 9
    val sepExpr = "CASE ci WHEN 0 THEN chr(10)||chr(10) WHEN 1 THEN chr(10) ELSE ' ' END"
    val blocks = scala.collection.mutable.ListBuffer.empty[String]
    val chunkStreams = scala.collection.mutable.ListBuffer.empty[String]
    blocks += s"""${pfx}_n1 AS (
      SELECT gid, '' AS path, 0 AS rem, txt FROM $srcCte
      WHERE txt IS NOT NULL AND txt <> '')"""
    for (lv <- 1 to 4) {
      val nd = s"${pfx}_n$lv"
      val nx = s"${pfx}_n${lv + 1}"
      val p = s"${pfx}_l$lv"
      // a) first separator present in this node's text, at or after `rem`
      blocks += s"""${p}_sep AS (
      SELECT gid, path, rem, txt, CASE
        WHEN rem <= 0 AND position(chr(10)||chr(10) IN txt) > 0 THEN 0
        WHEN rem <= 1 AND position(chr(10) IN txt) > 0 THEN 1
        WHEN rem <= 2 AND position(' ' IN txt) > 0 THEN 2
        ELSE 3 END AS ci
      FROM $nd)"""
      // b) keep-separator split: separator attaches to the START of the
      // following piece; the empty separator explodes into chars
      blocks += s"""${p}_lst AS (
      SELECT gid, path, ci, CASE
        WHEN ci = 3 THEN list_transform(range(1, length(txt) + 1), i -> txt[i])
        ELSE list_transform(string_split(txt, $sepExpr),
               (x, i) -> CASE WHEN i = 1 THEN x ELSE ($sepExpr) || x END)
        END AS pl
      FROM ${p}_sep)"""
      // c) nonempty pieces, contiguous ordinal k, small/big classification
      blocks += s"""${p}_pc AS MATERIALIZED (
      SELECT gid, path, ci, piece,
             row_number() OVER (PARTITION BY gid, path ORDER BY i0) AS k,
             length(piece) < $chunkSize AS good
      FROM (SELECT gid, path, ci, unnest(pl) AS piece, generate_subscripts(pl, 1) AS i0
            FROM ${p}_lst)
      WHERE piece <> '')"""
      // big pieces with no separators left emit as chunks, untrimmed
      chunkStreams += s"""SELECT gid,
             path || lpad(CAST(k AS VARCHAR), $pad, '0') || lpad('0', $pad, '0') AS ord,
             piece AS chunk
      FROM ${p}_pc WHERE NOT good AND ci = 3"""
      // big pieces with separators left recurse into the next level
      if (lv < 4)
        blocks += s"""$nx AS (
      SELECT gid, path || lpad(CAST(k AS VARCHAR), $pad, '0') AS path,
             ci + 1 AS rem, piece AS txt
      FROM ${p}_pc WHERE NOT good AND ci < 3)"""
      // d) runs (islands) of consecutive small pieces; per-run piece list T
      // and prefix-sum list P (P[1]=0, P[i+1]=len(p1..pi), so piece i's
      // length is P[i+1]-P[i])
      blocks += s"""${p}_gr AS MATERIALIZED (
      SELECT gid, path,
             k - row_number() OVER (PARTITION BY gid, path ORDER BY k) AS rid,
             piece, k
      FROM ${p}_pc WHERE good)"""
      blocks += s"""${p}_gp AS MATERIALIZED (
      SELECT gid, path, rid, min(k) AS anchor, CAST(count(*) AS INTEGER) AS n,
             list(piece ORDER BY k) AS T,
             [0] || list(sp ORDER BY k) AS P
      FROM (SELECT gid, path, rid, piece, k,
                   CAST(SUM(length(piece)) OVER (PARTITION BY gid, path, rid ORDER BY k
                        ROWS UNBOUNDED PRECEDING) AS INTEGER) AS sp
            FROM ${p}_gr)
      GROUP BY gid, path, rid)"""
      // e) the greedy merge as a state machine over (i = next piece,
      // j = window start): emit (j, i-1) when adding piece i would overflow
      // a nonempty window, then backtrack j to the smallest non-violating
      // window (monotone, so list_min over the candidate range)
      blocks += s"""${p}_mrg AS (
      SELECT gid, path, rid, anchor, n, P, 1 AS i, 1 AS j,
             CAST(NULL AS INTEGER) AS ea, CAST(NULL AS INTEGER) AS eb
      FROM ${p}_gp
      UNION ALL
      SELECT gid, path, rid, anchor, n, P, i + 1,
        CASE WHEN (P[i] - P[j]) + (P[i+1] - P[i]) > $chunkSize AND j < i THEN
          list_min(list_filter(range(j, i + 1), kk ->
            NOT ((P[i] - P[kk]) > $overlap
                 OR ((P[i] - P[kk]) + (P[i+1] - P[i]) > $chunkSize AND (P[i] - P[kk]) > 0))))
        ELSE j END,
        CASE WHEN (P[i] - P[j]) + (P[i+1] - P[i]) > $chunkSize AND j < i THEN j END,
        CASE WHEN (P[i] - P[j]) + (P[i+1] - P[i]) > $chunkSize AND j < i THEN i - 1 END
      FROM ${p}_mrg WHERE i <= n)"""
      // f) emissions: transition emissions carry the destination state's i;
      // the terminal window flushes from the same i = n+1 row, so it gets
      // i+1 to sort strictly after the last transition emission
      blocks += s"""${p}_em AS (
      SELECT gid, path, rid, anchor, i AS st, ea, eb FROM ${p}_mrg WHERE ea IS NOT NULL
      UNION ALL
      SELECT gid, path, rid, anchor, i + 1 AS st, j AS ea, n AS eb
      FROM ${p}_mrg WHERE i = n + 1)"""
      chunkStreams += s"""SELECT e.gid,
             e.path || lpad(CAST(e.anchor AS VARCHAR), $pad, '0')
                    || lpad(CAST(row_number() OVER (PARTITION BY e.gid, e.path, e.rid ORDER BY e.st) AS VARCHAR), $pad, '0') AS ord,
             ${jtrim("array_to_string(g.T[e.ea:e.eb], '')")} AS chunk
      FROM ${p}_em e JOIN ${p}_gp g USING (gid, path, rid)"""
    }
    blocks += s"""${pfx}_c0 AS (${chunkStreams.mkString("\n      UNION ALL\n      ")})"""
    blocks += s"""${pfx}_chunks AS MATERIALIZED (
      SELECT gid, ord, chunk,
             CAST(row_number() OVER (PARTITION BY gid ORDER BY ord) - 1 AS INTEGER) AS seq
      FROM ${pfx}_c0 WHERE chunk <> '')"""
    blocks.mkString(",\n    ")
  }

  // ----------------------------------------------------------- embedder SQL

  /** Pure-SQL replay of scala.util.hashing.MurmurHash3.stringHash (the
    * Embedder's hash): WITH-less fragment turning `srcCte(g, seed)` into
    * `mh(g, seed, h)` with `h` the signed 32-bit hash. State is unsigned
    * BIGINT in [0, 2^32): 32-bit wrapping multiplies route through HUGEINT
    * then mask, rotl splits into disjoint shifted halves (their sum is the
    * or), xor/shift-right are exact on the unsigned domain. The char-pair
    * loop (two UTF-16 units per mix round; ord() equals the UTF-16 unit for
    * the BMP text these fixtures carry) runs as a recursive CTE; the odd
    * tail takes mixLast and every string finalizes with the avalanche.
    * Fuzz-pinned against the Scala kernel on 3.7k random words × both
    * seeds plus 24 ground-truth hashes during development; oracle-pinned
    * every round through `emb_vectors`/`pipe_flagship`. */
  def murmurCtes(srcCte: String): String = {
    def mul(a: String, b: Long): String =
      s"CAST((CAST(($a) AS HUGEINT) * $b) % 4294967296 AS BIGINT)"
    def rot(x: String, r: Int): String =
      s"((($x) * ${1L << r}) % 4294967296 + (($x) // ${1L << (32 - r)}))"
    def mixLast(h: String, k0: String): String = {
      val kk1 = mul(k0, 0xcc9e2d51L)
      val kk2 = rot(kk1, 15)
      val kk3 = mul(kk2, 0x1b873593L)
      s"xor($h, $kk3)"
    }
    def mix(h: String, k0: String): String = {
      val h3 = mixLast(h, k0)
      s"((${rot(h3, 13)}) % 4294967296 * 5 + 3864292196) % 4294967296"
    }
    val pair = "(ord(g[p]) * 65536 + ord(g[p+1]))"
    s"""mst AS (
      SELECT g, seed, length(g) AS L, 1 AS p, CAST(seed AS BIGINT) AS h FROM $srcCte
      UNION ALL
      SELECT g, seed, L, p + 2, ${mix("h", pair)}
      FROM mst WHERE p + 1 <= L),
    mfin AS (
      SELECT g, seed, L,
        CASE WHEN p <= L THEN ${mixLast("h", "ord(g[p])")} ELSE h END AS h2
      FROM mst WHERE p + 1 > L AND p <= L + 1),
    mav1 AS (SELECT g, seed, xor(xor(h2, L), xor(h2, L) // 65536) AS a1 FROM mfin),
    mav2 AS (SELECT g, seed, ${mul("a1", 0x85ebca6bL)} AS a2 FROM mav1),
    mav3 AS (SELECT g, seed, xor(a2, a2 // 8192) AS a3 FROM mav2),
    mav4 AS (SELECT g, seed, ${mul("a3", 0xc2b2ae35L)} AS a4 FROM mav3),
    mh AS MATERIALIZED (
      SELECT g, seed,
        CAST(CASE WHEN a5 >= 2147483648 THEN a5 - 4294967296 ELSE a5 END AS BIGINT) AS h
      FROM (SELECT g, seed, xor(a4, a4 // 65536) AS a5 FROM mav4))"""
  }

  /** Pure-SQL replay of Embedder.embedText (Spark twin: Embedder.embed /
    * featurePipeline's embedding column): WITH-less fragment turning
    * `srcCte(gid, txt)` into `emb(gid, dim, val)` — the NONZERO components
    * of the 384-dim l2-normalized hashing embedding. Exact to the bit
    * despite float32 on the Spark side: bucket accumulation is ±1 counts
    * (integers are exact in float32), so the only rounding is the final
    * CAST(v × (1/√norm) AS REAL), replayed verbatim (multiply by the
    * double reciprocal, NOT division — a different rounding). Tokens and
    * '#'-padded char trigrams hash through [[murmurCtes]] once per
    * DISTINCT gram (vocabulary-shaped, like the kernel's inner loop).
    * lower() vs Java toLowerCase(ROOT) agree on the ASCII fixtures (the
    * documented UTF divergence class of DuckSql.words applies). */
  def embedCtes(srcCte: String): String =
    s"""tok0 AS (SELECT gid, unnest(list_filter(string_split_regex(lower(txt), '[^a-z0-9]+'),
             t -> t <> '')) AS tok FROM $srcCte),
    grams0 AS MATERIALIZED (
      SELECT gid, tok AS g, ${graft.operators.Embedder.TokenSeed} AS seed FROM tok0
      UNION ALL
      SELECT gid, substr(p3, CAST(i AS INTEGER), 3) AS g,
             ${graft.operators.Embedder.TrigramSeed} AS seed
      FROM (SELECT gid, '#' || tok || '#' AS p3 FROM tok0),
           LATERAL unnest(range(1, length(p3) - 1)) AS u(i)),
    grams AS MATERIALIZED (SELECT DISTINCT g, seed FROM grams0),
    ${murmurCtes("grams")},
    hx AS MATERIALIZED (
      SELECT g, seed, ((h % 384) + 384) % 384 AS idx,
             CASE WHEN h >= 0 THEN 1 ELSE -1 END AS sgn
      FROM mh),
    bk AS (SELECT gid, idx, CAST(SUM(sgn) AS BIGINT) AS v
           FROM grams0 JOIN hx USING (g, seed)
           GROUP BY gid, idx
           HAVING SUM(sgn) <> 0),
    nm AS (SELECT gid, CAST(SUM(v * v) AS DOUBLE) AS n2 FROM bk GROUP BY gid),
    emb AS MATERIALIZED (
      SELECT gid, CAST(idx AS INTEGER) AS dim,
             CAST(CAST(v AS DOUBLE) * (1.0 / sqrt(n2)) AS REAL) AS val
      FROM bk JOIN nm USING (gid))"""

  // ------------------------------------------------------------- Porter SQL

  /** CV pattern of a lowercase token: vowels → V (y vocalic after a
    * consonant — the '([^V])y' pass; leftmost non-overlapping replacement
    * naturally alternates runs of y), everything else → C. Prefix-stable
    * (a char's class depends only on chars at or before it), so conditions
    * on any candidate stem are prefix reads of the whole word's pattern. */
  private def cvOf(x: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($x, '[aeiou]', 'V', 'g')," +
      s" '([^V])y', '\\1V', 'g'), '[^V]', 'C', 'g')"

  /** Porter measure m over a CV-pattern fragment: number of VC runs =
    * count of 'VC' occurrences (replace each with 'V' and diff lengths). */
  private def mOf(cp: String): String =
    s"(length($cp) - length(replace($cp, 'VC', 'V')))"

  private def hasV(n: String): String =
    s"position('V' IN substr(c, 1, $n)) > 0"

  /** *o (cvc) on the stem of length `n`: pattern ends CVC and the last
    * char is not w/x/y. */
  private def cvcAt(n: String): String =
    s"($n >= 3 AND substr(c, ($n)-2, 3) = 'CVC'" +
      s" AND substr(s, $n, 1) NOT IN ('w','x','y'))"

  /** One CASE arm per (suffix, replacement) rule, first match consumes —
    * a matched suffix whose measure condition fails leaves the word
    * unchanged, exactly like PorterStemmer.replace. */
  private def ruleCases(rules: Seq[(String, String)], mFloor: Int): String =
    rules.map { case (suf, rep) =>
      val k = suf.length
      val stem = s"substr(s, 1, length(s)-$k)"
      val stemC = s"substr(c, 1, length(s)-$k)"
      val cond =
        if (suf == "ion")
          s"${mOf(stemC)} > 1 AND length(s) > 3 AND substr(s, length(s)-3, 1) IN ('s','t')"
        else s"${mOf(stemC)} > $mFloor"
      val repSql = if (rep.isEmpty) stem else s"$stem || '$rep'"
      s"WHEN s LIKE '%$suf' THEN CASE WHEN $cond THEN $repSql ELSE s END"
    }.mkString("\n      ")

  /** Pure-SQL replay of [[graft.functions.PorterStemmer]] (Spark twin:
    * TextSearch.stemmedTokens): WITH-less fragment — prepend WITH — that
    * turns `srcCte(w)` (distinct lowercase tokens) into `stems(w, stem)`.
    * Stage CTEs apply the five rule steps in order; each stage that needs
    * measure/vowel conditions recomputes the CV pattern column `c` once
    * (per DISTINCT word — vocabulary-shaped, like the BPE replay). Rule
    * tables come from PorterStemmer.Step{2,3,4}Rules, so the two
    * implementations cannot drift; fuzz-pinned over 9k+ words (published
    * vectors + random + vowel/y-adversarial) during development and
    * oracle-pinned every round by `txt_porter_stems`. `stems` is
    * MATERIALIZED: letting DuckDB inline the 15-stage chain into a
    * downstream join explodes the expression tree (the un-materialized
    * stemmed-BM25 oracle did not finish; materialized it runs in ~0.5 s). */
  def porterStemCtes(srcCte: String): String = {
    import graft.functions.PorterStemmer.{Step2Rules, Step3Rules, Step4Rules}
    val cvs = cvOf("s")
    s"""p0 AS (SELECT w, w AS s FROM $srcCte WHERE length(w) > 2),
        p1a AS (SELECT w, CASE
          WHEN s LIKE '%sses' THEN substr(s, 1, length(s)-2)
          WHEN s LIKE '%ies' THEN substr(s, 1, length(s)-2)
          WHEN s LIKE '%ss' THEN s
          WHEN s LIKE '%s' THEN substr(s, 1, length(s)-1)
          ELSE s END AS s FROM p0),
        p1bc AS (SELECT w, s, $cvs AS c FROM p1a),
        p1b1 AS (SELECT w, s, c, CASE
          WHEN s LIKE '%eed' THEN 0
          WHEN s LIKE '%ed' AND ${hasV("length(s)-2")} THEN length(s)-2
          WHEN s LIKE '%ing' AND ${hasV("length(s)-3")} THEN length(s)-3
          ELSE -1 END AS tl FROM p1bc),
        p1b AS (SELECT w, CASE
          WHEN tl = 0 THEN CASE WHEN ${mOf("substr(c, 1, length(s)-3)")} > 0
            THEN substr(s, 1, length(s)-1) ELSE s END
          WHEN tl = -1 THEN s
          WHEN tl >= 2 AND substr(s, tl-1, 2) IN ('at','bl','iz') THEN substr(s, 1, tl) || 'e'
          WHEN tl >= 2 AND substr(s, tl, 1) = substr(s, tl-1, 1) AND substr(c, tl, 1) = 'C'
               AND substr(s, tl, 1) NOT IN ('l','s','z') THEN substr(s, 1, tl-1)
          WHEN ${mOf("substr(c, 1, tl)")} = 1 AND ${cvcAt("tl")} THEN substr(s, 1, tl) || 'e'
          ELSE substr(s, 1, tl) END AS s FROM p1b1),
        p1cc AS (SELECT w, s, $cvs AS c FROM p1b),
        p1c AS (SELECT w, CASE WHEN s LIKE '%y' AND ${hasV("length(s)-1")}
          THEN substr(s, 1, length(s)-1) || 'i' ELSE s END AS s FROM p1cc),
        p2c AS (SELECT w, s, $cvs AS c FROM p1c),
        p2 AS (SELECT w, CASE
          ${ruleCases(Step2Rules, 0)}
          ELSE s END AS s FROM p2c),
        p3c AS (SELECT w, s, $cvs AS c FROM p2),
        p3 AS (SELECT w, CASE
          ${ruleCases(Step3Rules, 0)}
          ELSE s END AS s FROM p3c),
        p4c AS (SELECT w, s, $cvs AS c FROM p3),
        p4 AS (SELECT w, CASE
          ${ruleCases(Step4Rules, 1)}
          ELSE s END AS s FROM p4c),
        p5c AS (SELECT w, s, $cvs AS c FROM p4),
        p5a AS (SELECT w, CASE WHEN s LIKE '%e' AND (${mOf("substr(c, 1, length(s)-1)")} > 1
                OR (${mOf("substr(c, 1, length(s)-1)")} = 1 AND NOT ${cvcAt("length(s)-1")}))
          THEN substr(s, 1, length(s)-1) ELSE s END AS s FROM p5c),
        p5bc AS (SELECT w, s, $cvs AS c FROM p5a),
        p5b AS (SELECT w, CASE WHEN s LIKE '%ll' AND ${mOf("c")} > 1
          THEN substr(s, 1, length(s)-1) ELSE s END AS s FROM p5bc),
        stems AS MATERIALIZED (SELECT w, s AS stem FROM p5b
                  UNION ALL SELECT w, w FROM $srcCte WHERE length(w) <= 2)"""
  }

  /** Shared BM25 scoring program: `tokensCtes` must define a CTE
    * `tokens(doc_id, term)` in the query's analyzer space; `terms` are the
    * query terms in the SAME space. Doc length / N / avgdl come from ALL
    * documents — including zero-token ones — matching Lucene docCount
    * semantics (stemming rewrites tokens 1:1, so the plain token count is
    * the stemmed doc length too, exactly like size(analyzer(text)) on the
    * Spark side). */
  private def bm25Body(tokensCtes: String, terms: Seq[String]): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH doclen AS (SELECT doc_id, len(${words("text")}) AS dl FROM documents),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avgdl
                  FROM doclen),
        $tokensCtes,
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tokens
               WHERE term IN ($termList) GROUP BY doc_id, term),
        dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term)
        SELECT tf.doc_id AS doc_id,
          round(CAST(SUM(CAST(
            ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
              * (tf * (1.2e0 + 1.0e0))
              / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
            AS DECIMAL(38,12))) AS DOUBLE), 6) AS text_score
        FROM tf JOIN dfreq USING(term) JOIN doclen USING(doc_id) CROSS JOIN stats
        GROUP BY tf.doc_id"""
  }

  /** BM25 of ('spark','join','vector') over `documents` (Spark twin:
    * TextSearch.bm25). */
  val bm25: String = bm25Body(
    s"tokens AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents)",
    Seq("spark", "join", "vector"))

  /** BM25 with the Porter-stemmed analyzer (Spark twin: TextSearch.bm25
    * with stemmedTokens): tokens map through the SQL stemmer — computed
    * once per DISTINCT corpus word, then joined back onto occurrences —
    * and `queryStems` must already be stemmed (TextSearch.stemQueryTerms,
    * mirroring how the Spark query is built). */
  def bm25Stemmed(queryStems: Seq[String]): String = bm25Body(
    s"""dw AS (SELECT DISTINCT unnest(${words("text")}) AS w FROM documents),
        ${porterStemCtes("dw")},
        tok0 AS (SELECT doc_id, unnest(${words("text")}) AS w FROM documents),
        tokens AS (SELECT doc_id, stem AS term FROM tok0 JOIN stems USING (w))""",
    queryStems)
}

package graft.operators

/** Generates DuckDB SQL that replays our custom hash builtins
  * (graft.functions.HashImpl) bit-for-bit, so the hash-bearing queries
  * get full value oracles instead of rows-only checks.
  *
  * DuckDB has no FNV-1/murmur2-64A/murmur3-32 builtins, but it does
  * have HUGEINT (INT128) arithmetic, bitwise xor/shift on HUGEINT, and
  * list lambdas — enough to express each hash as a single (generated)
  * SQL expression:
  *   - all mod-2^64 state is carried as HUGEINT in [0, 2^64);
  *   - `a * P mod 2^64` where both operands approach 2^64 is a split
  *     mulmod `((a>>32)*P mod 2^32)<<32 + (a&0xffffffff)*P` so every
  *     intermediate stays under 2^97 (a naive product of two ~2^64
  *     operands overflows INT128);
  *   - a poor-man's let-binding `list_transform([e], v -> body)[1]`
  *     keeps the generated SQL linear in the number of hash steps
  *     (naive inlining duplicates subexpressions exponentially);
  *   - bytes come from `ascii(s[i])`, which equals the UTF-8 byte for
  *     ASCII data — exact on the generated tables (TPC-H names are
  *     ASCII); non-ASCII data would need a blob-byte walk instead.
  *
  * The signed BIGINT view of the final 2^64 state matches the JVM's
  * two's-complement Long exactly.
  */
object DuckHashSql {
  private val U64 = "18446744073709551616::HUGEINT"
  private val P64 = "14313749767032793493::HUGEINT" // 0xc6a4a7935bd1e995
  private val M32 = "4294967296::HUGEINT"

  /** let-binding: evaluate `e` once, name it `v` inside `body`. */
  private def let(e: String, v: String, body: String): String =
    s"list_transform([$e], $v -> $body)[1]"

  /** unsigned-2^64 HUGEINT -> signed BIGINT (two's complement). */
  private def toSigned(e: String): String =
    let(e, "sv", s"(CASE WHEN sv >= 9223372036854775808::HUGEINT THEN sv - $U64 ELSE sv END)::BIGINT")

  /** `v * c mod 2^64` via split mulmod (`(v_hi*c mod 2^32)<<32 +
    * v_lo*c`, every intermediate < 2^97); `v` must be a bound
    * identifier (it is referenced twice), `c` a constant < 2^64. */
  private def mulC(v: String, c: String): String =
    s"((($v >> 32) * $c::HUGEINT) % $M32) * $M32 + ($v & 4294967295::HUGEINT) * $c::HUGEINT"

  private def mulP(v: String): String =
    s"(${mulC(v, "14313749767032793493")}) % $U64"

  /** unsigned-2^64 HUGEINT expr -> signed BIGINT, public for callers
    * that compute a shared unsigned state in a CTE and project several
    * views of it (e.g. simhash + its top-bits bucket). */
  def toSignedBigint(e: String): String = toSigned(e)

  /** FNV-1 64 (HashImpl.fnv64) of string `s` with byte length `n`, as
    * the unsigned 2^64 state. `s` may be a column or a lambda var. */
  def fnv64U(s: String, n: String): String = {
    val bytes = s"list_transform(range(1, ($n)+1), fi -> ascii(($s)[fi])::HUGEINT)"
    s"list_reduce(list_prepend(14695981039346656037::HUGEINT, $bytes), " +
      s"(fh, fx) -> xor((fh * 1099511628211::HUGEINT) % $U64, fx))"
  }

  /** FNV-1 64 of string col `s` with byte length `n`, signed. */
  def fnv64(s: String, n: String): String = toSigned(fnv64U(s, n))

  /** SimHash-64 (HashImpl.simhash64) over a VARCHAR[] expr: per-token
    * FNV-1 votes on each of the 64 bits; sign of the tally forms the
    * signature. Unsigned 2^64 state. */
  def simhash64U(toks: String): String = {
    val tokenHashes = s"list_transform($toks, tw -> ${fnv64U("tw", "length(tw)")})"
    val vote = "list_reduce(list_prepend(0, list_transform(hs, " +
      "sh -> CASE WHEN (sh >> sb) & 1 = 1 THEN 1 ELSE -1 END)), (va,vb) -> va+vb)"
    val bits = s"list_transform(range(0,64), sb -> CASE WHEN $vote > 0 THEN 1::HUGEINT << sb ELSE 0::HUGEINT END)"
    let(tokenHashes, "hs", s"list_reduce(list_prepend(0::HUGEINT, $bits), (sa,sx) -> sa+sx)")
  }

  /** The pipeline's whitespace tokenizer (Dedup.tokens /
    * TextAnalysis.words: split(trim(lower(text)), "\\s+")) in DuckDB. */
  def tokensSql(text: String): String =
    s"regexp_split_to_array(trim(lower($text)), '\\s+')"

  /** MurmurHash2-64A seed 0 (HashImpl.murmur2_64) of string col `s`. */
  def murmur2_64(s: String, n: String): String = {
    val blocks = s"list_transform(range(0, ($n)//8), bi -> " +
      s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(1,9), " +
      s"bb -> ascii(($s)[8*bi+bb])::HUGEINT << (8*(bb-1)))), (ba,bx) -> ba + bx))"
    val h0 = s"((($n)::HUGEINT * $P64) % $U64)"
    val step =
      let(mulP("mx"), "k1",
        let("xor(k1, k1 >> 47)", "k2",
          let(mulP("k2"), "k3",
            let("xor(mh, k3)", "hx", mulP("hx")))))
    val red = s"list_reduce(list_prepend($h0, $blocks), (mh, mx) -> $step)"
    val tail = s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(1, ($n)%8+1), " +
      s"tj -> ascii(($s)[(($n)//8)*8+tj])::HUGEINT << (8*(tj-1)))), (ta,tx) -> ta+tx)"
    val fin =
      let(red, "h1",
        let(s"(CASE WHEN ($n)%8 > 0 THEN ${let(s"xor(h1, $tail)", "ht", mulP("ht"))} ELSE h1 END)", "h2",
          let("xor(h2, h2 >> 47)", "h3",
            let(mulP("h3"), "h4", "xor(h4, h4 >> 47)"))))
    toSigned(fin)
  }

  /** Winnowing fingerprint (HashImpl.fingerprint64, k=8): signed min of
    * the mod-2^64 polynomial (base 257) hashes of all 8-byte grams. */
  def fingerprint64(s: String, n: String): String = {
    val gram = s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(0, least(8, $n)), " +
      s"gj -> ascii(($s)[gi+gj])::HUGEINT)), (gh,gx) -> (gh * 257::HUGEINT + gx) % $U64)"
    val grams = s"list_transform(range(1, ($n)-least(8, $n)+2), gi -> ${toSigned(gram)})"
    s"list_min($grams)"
  }

  /** One murmur3_x86_32 block mix: h' from state `h` and block `k`
    * (both bound identifiers holding values < 2^32). */
  private def mm32Block(h: String, k: String): String =
    let(s"(($k * 3432918353::HUGEINT) % $M32)", "w1",
      let(s"(((w1 << 15) % $M32) + (w1 >> 17))", "w2",
        let(s"((w2 * 461845907::HUGEINT) % $M32)", "w3",
          let(s"xor($h, w3)", "w4",
            let(s"(((w4 << 13) % $M32) + (w4 >> 19))", "w5",
              s"((w5 * 5 + 3864292196::HUGEINT) % $M32)")))))

  /** murmur3_x86_32 finalizer over state expr `h` and byte length `n`. */
  private def mm32Fmix(h: String, n: String): String =
    let(h, "z0",
      let(s"xor(z0, ($n)::HUGEINT)", "z1",
        let("xor(z1, z1 >> 16)", "z2",
          let(s"((z2 * 2246822507::HUGEINT) % $M32)", "z3",
            let("xor(z3, z3 >> 13)", "z4",
              let(s"((z4 * 3266489909::HUGEINT) % $M32)", "z5",
                "xor(z5, z5 >> 16)"))))))

  /** Iceberg bucket[`buckets`] of a string col: murmur3_32(utf8 bytes),
    * then (hash & Int.MaxValue) % N — `& 0x7fffffff` is `% 2^31` on the
    * unsigned view. */
  def icebergBucketStr(s: String, n: String, buckets: Int): String = {
    val blocks = s"list_transform(range(0, ($n)//4), ci -> " +
      s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(1,5), " +
      s"cb -> ascii(($s)[4*ci+cb])::HUGEINT << (8*(cb-1)))), (ca,cx) -> ca + cx))"
    val red = s"list_reduce(list_prepend(0::HUGEINT, $blocks), (qh, qk) -> ${mm32Block("qh", "qk")})"
    val tailK = s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(1, ($n)%4+1), " +
      s"dj -> ascii(($s)[(($n)//4)*4+dj])::HUGEINT << (8*(dj-1)))), (da,dx) -> da+dx)"
    val tailMix =
      let(tailK, "t0",
        let(s"((t0 * 3432918353::HUGEINT) % $M32)", "t1",
          let(s"(((t1 << 15) % $M32) + (t1 >> 17))", "t2",
            s"((t2 * 461845907::HUGEINT) % $M32)")))
    val withTail = let(red, "r0", s"(CASE WHEN ($n)%4 > 0 THEN xor(r0, $tailMix) ELSE r0 END)")
    s"((${mm32Fmix(withTail, n)} % 2147483648::HUGEINT) % $buckets::HUGEINT)::INT"
  }

  /** Iceberg bucket[`buckets`] of a non-negative BIGINT col: the spec
    * hashes the 8-byte little-endian long, i.e. exactly two 4-byte
    * blocks (v mod 2^32, v div 2^32), no tail. */
  def icebergBucketLong(v: String, buckets: Int): String = {
    val h1 = let(s"(($v)::HUGEINT % $M32)", "lb", mm32Block("0::HUGEINT", "lb"))
    val h2 = let(h1, "lh", let(s"(($v)::HUGEINT // $M32)", "lc", mm32Block("lh", "lc")))
    s"((${mm32Fmix(h2, "8")} % 2147483648::HUGEINT) % $buckets::HUGEINT)::INT"
  }

  // ---- splitmix64 / XXH64 / the minhash-LSH candidate pipeline ------

  /** signed BIGINT expr -> unsigned 2^64 HUGEINT (two's complement). */
  private def toUnsigned(e: String): String =
    let(e, "uv", s"(CASE WHEN uv < 0 THEN uv::HUGEINT + $U64 ELSE uv::HUGEINT END)")

  /** splitmix64 finalizer (HashImpl.splitmix64) over unsigned expr `x`. */
  private def splitmix64(x: String): String =
    let(s"(($x) + 11400714819323198485::HUGEINT) % $U64", "z0",
      let("xor(z0, z0 >> 30)", "z1",
        let(s"(${mulC("z1", "13787848793156543929")}) % $U64", "z2",
          let("xor(z2, z2 >> 27)", "z3",
            let(s"(${mulC("z3", "10723151780598845931")}) % $U64", "z4", "xor(z4, z4 >> 31)")))))

  // XXH64 primes (public xxHash spec; Spark's XXH64 implements the same)
  private val X1 = "11400714785074694791"
  private val X2 = "14029467366897019727"
  private val X3 = "1609587929392839161"
  private val X4 = "9650029242287828579"
  private val X5 = "2870177450012600261"

  private def rotl64(v: String, r: Int): String =
    s"((($v << $r) % $U64) + ($v >> ${64 - r}))"

  private def xxhFmix(h: String): String =
    let(s"xor($h, $h >> 33)", "f1",
      let(s"(${mulC("f1", X2)}) % $U64", "f2",
        let("xor(f2, f2 >> 29)", "f3",
          let(s"(${mulC("f3", X3)}) % $U64", "f4", "xor(f4, f4 >> 32)"))))

  /** XXH64 of one int field with `seed` (Spark XXH64.hashInt). `i` must
    * be a small non-negative constant/expr. */
  private def xxh64Int(i: String, seed: String): String =
    let(s"(($seed) + $X5::HUGEINT + 4) % $U64", "a0",
      let(s"xor(a0, (($i)::HUGEINT * $X1::HUGEINT) % $U64)", "a1",
        let(rotl64("a1", 23), "a2",
          let(s"(${mulC("a2", X2)}) % $U64", "a3",
            let(s"(a3 + $X3::HUGEINT) % $U64", "a4", xxhFmix("a4"))))))

  /** XXH64 of one long field with `seed` (Spark XXH64.hashLong);
    * `l` is the unsigned 2^64 view of the long's bits. */
  private def xxh64Long(l: String, seed: String): String =
    let(s"(($seed) + $X5::HUGEINT + 8) % $U64", "b0",
      let(l, "bl",
        let(s"(${mulC("bl", X2)}) % $U64", "b1",
          let(rotl64("b1", 31), "b2",
            let(s"(${mulC("b2", X1)}) % $U64", "b3",
              let("xor(b0, b3)", "b4",
                let(rotl64("b4", 27), "b5",
                  let(s"(${mulC("b5", X1)}) % $U64", "b6",
                    let(s"(b6 + $X4::HUGEINT) % $U64", "b7", xxhFmix("b7"))))))))))

  /** HashImpl.hashedShingles(text, k): token FNV hashes -> each run of
    * k chained through splitmix64 -> distinct. Unsigned HUGEINT list
    * (order: first-occurrence, which jaccard/minhash don't depend on). */
  private def hashedShinglesU(text: String, k: Int): String = {
    val tokh = s"list_transform(${tokensSql(text)}, tw -> ${fnv64U("tw", "length(tw)")})"
    val chain = s"list_reduce(list_prepend(0::HUGEINT, " +
      s"list_transform(range(0, kk), sm -> th[sj+sm])), (sa, sx) -> ${splitmix64("xor(sa, sx)")})"
    let(tokh, "th",
      let(s"least($k, len(th))", "kk",
        s"list_distinct(list_transform(range(1, len(th)-kk+2), sj -> $chain))"))
  }

  /** Just the hashed-shingle CTE `msh(doc_id, su)` over `rel(doc_id,
    * text)` — for oracles that verify set overlap without the minhash
    * banding (e.g. the P49 containment pipeline). */
  def shingleCte(rel: String, k: Int = 3): String =
    s"""msh AS (
       |  SELECT doc_id, ${hashedShinglesU("text", k)} AS su FROM $rel
       |)""".stripMargin

  /** The minhash-LSH candidate CTE chain (HashImpl.minhashSig semantics:
    * perm p takes the SIGNED min of splitmix64(v xor p*goldenGamma);
    * band hash = Spark xxhash64(band, sig[2b], sig[2b+1]), seed 42).
    * Appends CTEs `msh(doc_id, su)` (unsigned shingle sets) and
    * `mpairs(doc_a, doc_b)` (distinct band-collision candidates) over
    * relation `rel(doc_id, text)`. Parameters pinned to
    * Dedup.minhashCandidates defaults: k=3, 8 bands x 2 rows, bucket
    * cap 1000 on the ascending-sorted id list. `groupCols` (e.g.
    * Seq("source")) scopes banding the way Dedup.ngramJaccardPairs
    * does: the columns ride along msh→msig→mbands, buckets group by
    * (groupCols, band, bh) — so candidates only form within a group —
    * and mpairs carries them. */
  def minhashCtes(rel: String, k: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                  groupCols: Seq[String] = Nil): String = {
    val perms = bands * rowsPerBand
    val golden = BigInt("9e3779b97f4a7c15", 16)
    val sigEntries = (0 until perms).map { p =>
      val c = (golden * p).mod(BigInt(2).pow(64))
      s"list_min(list_transform(su, mv -> ${toSigned(splitmix64(s"xor(mv, $c::HUGEINT)"))}))"
    }.mkString(", ")
    val bandStructs = (0 until bands).map { b =>
      val s0 = xxh64Int(b.toString, "42::HUGEINT")
      val s1 = xxh64Long(toUnsigned(s"sg[${b * rowsPerBand + 1}]"), s0)
      val s2 = xxh64Long(toUnsigned(s"sg[${b * rowsPerBand + 2}]"), s1)
      s"{'band': $b, 'bh': ${toSigned(s2)}}"
    }.mkString(", ")
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ", ")
    val gGroup = if (groupCols.isEmpty) "" else groupCols.mkString(", ") + ", "
    s"""msh AS (
       |  SELECT ${g}doc_id, ${hashedShinglesU("text", k)} AS su FROM $rel
       |), msig AS (
       |  SELECT ${g}doc_id, [$sigEntries] AS sg FROM msh
       |), mbands AS (
       |  SELECT ${g}doc_id, unnest([$bandStructs]) AS u FROM msig
       |), mbuckets AS (
       |  SELECT ${g}u.band, u.bh, list_sort(list(doc_id))[1:1000] AS ids
       |  FROM mbands GROUP BY ${gGroup}u.band, u.bh HAVING count(*) > 1
       |), mpairs AS (
       |  SELECT DISTINCT ${g}p[1] AS doc_a, p[2] AS doc_b
       |  FROM (SELECT ${g}unnest(flatten(list_transform(range(1, len(ids)), pi ->
       |         list_transform(ids[pi+1:], px -> [ids[pi], px])))) AS p FROM mbuckets)
       |)""".stripMargin
  }

  /** Exact Jaccard of two distinct shingle-set columns, rounded to 4
    * places like the Spark side. */
  def jaccardSql(a: String, b: String): String =
    s"round(len(list_intersect($a, $b))::DOUBLE / " +
      s"(len($a) + len($b) - len(list_intersect($a, $b))), 4)"

  // ---- RHP-LSH signatures + exact cosine ----------------------------

  /** VectorImpl.rhpSignature replayed over embedding col `e`: the
    * hyperplane components are pure constants (splitmix64 of
    * p*1000003+i), so instead of replaying splitmix per term (150x
    * slower in DuckDB's expression interpreter) the generator bakes the
    * signed longs into a literal `planes x dim` matrix and the SQL only
    * does the dot-product folds. gaussianish's 9.223372036854776e18
    * divisor parses to exactly 2^63 as a double, so `/ 2^63` matches
    * bit-for-bit. Pinned to `dim` (the testdata embedding width):
    * longer vectors would index past the literal matrix and null out.
    */
  def rhpSigSql(e: String, planes: Int = 24, dim: Int = 64): String = {
    val g = (0 until planes).map { p =>
      (0 until dim).map(i => graft.functions.HashImpl.splitmix64(p * 1000003L + i))
    }
    val gLit = g.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val acc = s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($e)+1), " +
      s"ri -> (($e)[ri])::DOUBLE * ((gm[rp][ri])::DOUBLE / 9223372036854775808.0))), (ra, rx) -> ra + rx)"
    let(gLit, "gm",
      s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${planes + 1}), " +
        s"rp -> CASE WHEN $acc > 0 THEN (1::BIGINT << (rp-1)) ELSE 0::BIGINT END)), (sa, sx) -> sa + sx)")
  }

  /** VectorImpl.cosine replayed with the same left-to-right double
    * accumulation (dot/nx/ny in one pass, then dot/(sqrt*sqrt)) — bit
    * -identical, so it is safe for UNROUNDED threshold comparisons
    * (list_cosine_similarity's internal op order is unspecified). */
  def cosineExactSql(a: String, b: String): String = {
    val elems = s"list_transform(range(1, len($a)+1), ci -> " +
      s"{'d': (($a)[ci])::DOUBLE * (($b)[ci])::DOUBLE, " +
      s"'x': (($a)[ci])::DOUBLE * (($a)[ci])::DOUBLE, " +
      s"'y': (($b)[ci])::DOUBLE * (($b)[ci])::DOUBLE})"
    val red = s"list_reduce(list_prepend({'d': 0.0::DOUBLE, 'x': 0.0::DOUBLE, 'y': 0.0::DOUBLE}, " +
      s"$elems), (cs, ce) -> {'d': cs.d + ce.d, 'x': cs.x + ce.x, 'y': cs.y + ce.y})"
    let(red, "cz", "CASE WHEN cz.x = 0.0 OR cz.y = 0.0 THEN 0.0 ELSE cz.d / (sqrt(cz.x) * sqrt(cz.y)) END")
  }

  /** Full XXH64 of a STRING expr (Spark's single-arg xxhash64, seed
    * 42 by default) — the complete public xxHash64 algorithm including
    * the 4-accumulator >= 32-byte path, 8/4/1-byte tails and the
    * avalanche, over ascii-recovered bytes. Every fold keeps uniform
    * element types (lane values, not offsets) because list_reduce
    * requires accumulator type == element type. */
  def xxh64StrSql(s: String, seed: Long = 42L): String = {
    val n = "length(xs)"
    def lane8(o: String) = s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(0,8), " +
      s"lb -> ascii(xs[($o)+lb])::HUGEINT << (8*lb))), (la,lx) -> la+lx)"
    def lane4(o: String) = s"list_reduce(list_prepend(0::HUGEINT, list_transform(range(0,4), " +
      s"lb -> ascii(xs[($o)+lb])::HUGEINT << (8*lb))), (la,lx) -> la+lx)"
    def round(acc: String, lane: String) =
      let(lane, "rl", let(s"($acc + (${mulC("rl", X2)}) % $U64) % $U64", "rs",
        let(rotl64("rs", 31), "rr", s"(${mulC("rr", X1)}) % $U64")))
    val stripeElems = s"list_transform(range(0, ($n)//32), si -> " +
      s"{'a': ${lane8("1 + si*32")}, 'b': ${lane8("1 + si*32 + 8")}, " +
      s"'c': ${lane8("1 + si*32 + 16")}, 'd': ${lane8("1 + si*32 + 24")}})"
    val stripeStep = s"{'a': ${round("st.a", "se.a")}, 'b': ${round("st.b", "se.b")}, " +
      s"'c': ${round("st.c", "se.c")}, 'd': ${round("st.d", "se.d")}}"
    val init = s"{'a': ($seed::HUGEINT + $X1::HUGEINT + $X2::HUGEINT) % $U64, " +
      s"'b': ($seed::HUGEINT + $X2::HUGEINT) % $U64, 'c': $seed::HUGEINT, " +
      s"'d': ($seed::HUGEINT + $U64 - $X1::HUGEINT) % $U64}"
    val stripes = s"list_reduce(list_prepend($init, $stripeElems), (st, se) -> $stripeStep)"
    def merge(h: String, v: String) =
      let(v, "mv", let(h, "mh",
        let(s"xor(mh, ${round("0::HUGEINT", "mv")})", "mx",
          s"((${mulC("mx", X1)}) % $U64 + $X4::HUGEINT) % $U64")))
    val big = let(stripes, "sf",
      let(s"(${rotl64("sf.a", 1)} + ${rotl64("sf.b", 7)} + ${rotl64("sf.c", 12)} + ${rotl64("sf.d", 18)}) % $U64", "h0",
        let(merge("h0", "sf.a"), "h1",
          let(merge("h1", "sf.b"), "h2",
            let(merge("h2", "sf.c"), "h3", merge("h3", "sf.d"))))))
    val hInit = s"(CASE WHEN ($n) >= 32 THEN $big ELSE ($seed::HUGEINT + $X5::HUGEINT) % $U64 END)"
    val withLen = s"(($hInit + ($n)::HUGEINT) % $U64)"
    val t8Step = let(round("0::HUGEINT", "tle"), "tk",
      let("xor(th, tk)", "tx", let(rotl64("tx", 27), "tr",
        s"((${mulC("tr", X1)}) % $U64 + $X4::HUGEINT) % $U64")))
    val t8 = s"list_reduce(list_prepend($withLen, list_transform(range(0, (($n) % 32) // 8), " +
      s"ti -> ${lane8(s"1 + (($n)//32)*32 + ti*8")})), (th, tle) -> $t8Step)"
    val t4Body = let(s"xor(t4h, (${mulC("l4", X1)}) % $U64)", "f4x",
      let(rotl64("f4x", 23), "f4r", s"((${mulC("f4r", X2)}) % $U64 + $X3::HUGEINT) % $U64"))
    val t4 = let(t8, "t4h",
      s"CASE WHEN ($n) % 8 >= 4 THEN ${let(lane4(s"1 + (($n)//8)*8"), "l4", t4Body)} ELSE t4h END")
    val bStep = let(s"xor(bh, (${mulC("bb", X5)}) % $U64)", "bx",
      let(rotl64("bx", 11), "br", s"(${mulC("br", X1)}) % $U64"))
    val tb = s"list_reduce(list_prepend($t4, list_transform(range(0, ($n) % 4), " +
      s"bi -> ascii(xs[1 + (($n)//4)*4 + bi])::HUGEINT)), (bh, bb) -> $bStep)"
    val fin = let(tb, "g1", let("xor(g1, g1 >> 33)", "g2",
      let(s"(${mulC("g2", X2)}) % $U64", "g3",
        let("xor(g3, g3 >> 29)", "g4",
          let(s"(${mulC("g4", X3)}) % $U64", "g5", "xor(g5, g5 >> 32)")))))
    let(s, "xs", toSigned(fin))
  }

  /** The multi-table RHP bucket CTE chain shared by the LSH queries:
    * `rsig(…, sig)` then `rbkt(…, tbl, bucket)` — 4 tables x 6 bits
    * sliced off one 24-plane signature, like Similarity's `buckets`.
    * `extraCols` ride along (e.g. label, embedding). */
  def rhpBucketCtes(rel: String, extraCols: Seq[String]): String = {
    val cols = (Seq("vec_id") ++ extraCols).mkString(", ")
    s"""rsig AS (
       |  SELECT $cols, ${rhpSigSql("embedding")} AS sig FROM $rel
       |), rbkt0 AS (
       |  SELECT $cols,
       |    unnest(list_transform(range(0,4), t -> {'tbl': t, 'bucket': (sig >> (t*6)) & 63})) AS u
       |  FROM rsig
       |), rbkt AS (
       |  SELECT $cols, u.tbl AS tbl, u.bucket AS bucket FROM rbkt0
       |)""".stripMargin
  }
}

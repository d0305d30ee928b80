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

  /** `v * 0xc6a4a7935bd1e995 mod 2^64` via split mulmod; `v` must be a
    * bound identifier (it is referenced twice). */
  private def mulP(v: String): String =
    s"(((($v >> 32) * $P64) % $M32) * $M32 + ($v & 4294967295::HUGEINT) * $P64) % $U64"

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
}

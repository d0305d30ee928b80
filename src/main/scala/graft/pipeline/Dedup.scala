package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftFunctions

/** Deduplication operators for large-scale text corpora (SURVEY.md §2
  * P1–P5). The scale discipline: nothing here ever materializes an n²
  * pair set — candidates always come from an equi-join on a BOUNDED
  * bucket key (hash group, LSH band — never an unbounded key like
  * `source` alone), so at 100 TB each reducer sees only its capped
  * bucket. Exact dedup is a hash groupBy; near-dup is MinHash+LSH
  * banding (Broder 1997) with an exact Jaccard verify on the candidate
  * pairs only.
  */
object Dedup {

  /** One live cache per operator: persisting the shingle projection is
    * what keeps the pair stages from recomputing the feature pipeline,
    * but a long-lived session running many dedup calls must not pin
    * every historical cache — each new call releases the previous one. */
  private[pipeline] def cacheReplacing(df: DataFrame,
      slot: java.util.concurrent.atomic.AtomicReference[DataFrame]): DataFrame =
    graft.CacheSlot.replace(df, slot)
  private val minhashSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val ngramSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val incrSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val containSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val containExSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct k-word shingles; short docs fall back to the whole token
    * string so every doc has at least one shingle. */
  def shingles(text: Column, k: Int = 3): Column = {
    val w = tokens(text)
    array_distinct(
      when(size(w) >= k,
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", slice(w, i + lit(1), lit(k)))))
        .otherwise(array(concat_ws(" ", w))))
  }

  /** Shingles reduced to 64-bit hashes: Jaccard over the hashed sets is
    * the same value (collisions are ~n²/2⁶⁴), while shuffle payloads and
    * intersections shrink ~3× vs raw strings — the form that survives a
    * 100 TB pair-join. Fused single-pass expression (tokenize → token
    * hash → shingle combine → sort+dedup, no intermediate strings — see
    * graft.functions.HashedShingles). */
  def hashedShingles(text: Column, k: Int = 3): Column =
    call_function("hashed_shingles", text, lit(k))

  /** Builtin-composed variant of [[hashedShingles]] (kept as the
    * readable spec of the same computation, and for engines without our
    * extensions). */
  def hashedShinglesComposed(text: Column, k: Int = 3): Column =
    sort_array(array_distinct(transform(shingles(text, k), s => xxhash64(s))))

  /** MinHash signature via the fused custom expression (one loop for
    * all permutations — see graft.functions.MinHashSig). */
  def minhashSig(sh: Column, perms: Int): Column =
    call_function("minhash_sig", sh, lit(perms))

  /** Exact Jaccard of two hashed-shingle sets (sorted long arrays) via
    * the fused merge-walk expression. */
  def jaccard(a: Column, b: Column): Column = call_function("jaccard_sorted", a, b)

  /** Generic (unsorted, any element type) Jaccard from builtins. */
  def jaccardGeneric(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Exact-duplicate groups: one row per distinct text hash. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** Exact dedup keeping the first (lowest doc_id) row per text hash. */
  def exactKeepFirst(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** MinHash+LSH near-duplicate candidate pairs with exact-Jaccard
    * verification. bands×rowsPerBand permutations; candidates = pairs
    * sharing ≥1 band bucket; output pairs with verified Jaccard ≥
    * minJaccard. The band explode keeps the join an equi-join on
    * (band, band_hash) — shuffle-partitionable at any corpus size. */
  def minhashCandidates(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 2,
                        minJaccard: Double = 0.2, maxBucket: Int = 1000): DataFrame = {
    val perms = bands * rowsPerBand
    // Feature extraction runs ONCE: a self-join would re-execute the
    // whole shingle pipeline per side (3× at 100 TB). MEMORY_AND_DISK so
    // executors spill instead of OOM on big corpora.
    GraftFunctions.register(docs.sparkSession)
    val sh = cacheReplacing(
      docs.select(col("doc_id"), hashedShingles(col("text")).as("sh")), minhashSlot)
    val withSig = sh.select(col("doc_id"), minhashSig(col("sh"), perms).as("sig"))
    val banded = withSig.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1))): _*)): _*)).as(Seq("band", "bh")))
    // Candidates from bucket grouping, not a self-join: each band bucket
    // expands to its in-bucket pairs (i<j over the sorted id list), so a
    // bucket is one reducer's work and pathological buckets are capped.
    val buckets = banded.groupBy("band", "bh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // no silent caps: the maxBucket truncation below loses candidate
      // pairs in hot buckets — surface how often via observed metrics
      // (rides the existing job; read with a QueryExecutionListener)
      .observe("minhash_lsh_buckets",
        count(lit(1)).as("buckets"),
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L)).as("truncated_buckets"),
        max(size(col("ids"))).as("max_bucket_size"))
      .select(slice(col("ids"), 1, maxBucket).as("ids"))
    // compiled pair expansion — the nested transform/slice/flatten
    // builtin form evaluates interpreted per produced pair
    val pairs = buckets.select(explode(call_function("pair_expand", col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct() // a pair may collide in several bands — verify once
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** (band, bh) explode of a minhash signature derived from shingle
    * column `shCol` — the one banding implementation shared by the
    * batch (P43) and streaming (T19) incremental gates, so their band
    * keys are joinable against the same persisted index. */
  def bandExplode(df: DataFrame, shCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    df.withColumn("sig", minhashSig(col(shCol), bands * rowsPerBand))
      .select(df.columns.map(col) :+
        posexplode(array((0 until bands).map(b =>
          xxhash64((lit(b) +: (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(i => element_at(col("sig"), i + 1))): _*)): _*)).as(Seq("band", "bh")): _*)

  /** P43: incremental-ingest near-dup gate — dedup a NEW batch of
    * documents against the EXISTING corpus, the shape every production
    * pipeline actually runs (data arrives in increments; re-deduping
    * 100 TB from scratch per ingest is not an option). The corpus
    * contributes only its banded minhash index — at scale that index is
    * a persisted table bucketed by (band, bh), maintained by appending
    * each accepted batch's bands — so an ingest shuffles ONLY the new
    * batch plus an equi-join against the index; the corpus itself is
    * never re-read. Exact-Jaccard verification then touches only the
    * candidate corpus rows. Same banding math as minhashCandidates, so
    * the DuckDB replay machinery (DuckHashSql.minhashCtes) oracles this
    * end-to-end.
    *
    * Output: one row per batch doc — is_novel, the kept corpus twin
    * (min doc_id among verified matches), best Jaccard, match count. */
  def incrementalLshGate(docs: DataFrame, isNew: Column, bands: Int = 8,
                         rowsPerBand: Int = 2, minJaccard: Double = 0.1): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // In this bounded demo both sides' shingles derive inline from one
    // scan; in production the !isNew side is read from the index table.
    val sh = cacheReplacing(
      docs.select(col("doc_id"), isNew.as("is_new"),
        hashedShingles(col("text")).as("sh")), incrSlot)
    val banded = bandExplode(sh, "sh", bands, rowsPerBand).drop("sh")
    val newB = banded.filter(col("is_new"))
      .select(col("doc_id").as("doc_new"), col("band"), col("bh"))
    val idxB = banded.filter(!col("is_new"))
      .select(col("doc_id").as("doc_old"), col("band"), col("bh"))
    val cand = newB.join(idxB, Seq("band", "bh"))
      .select("doc_new", "doc_old").distinct()
    val ver = cand
      .join(sh.select(col("doc_id").as("doc_new"), col("sh").as("sh_n")), Seq("doc_new"))
      .join(sh.select(col("doc_id").as("doc_old"), col("sh").as("sh_o")), Seq("doc_old"))
      .select(col("doc_new"), col("doc_old"),
        round(jaccard(col("sh_n"), col("sh_o")), 4).as("j"))
      .filter(col("j") >= minJaccard)
    val hits = ver.groupBy("doc_new").agg(
      min(col("doc_old")).as("dup_of"),
      max(col("j")).as("best_jaccard"),
      count(lit(1)).as("n_matches"))
    docs.filter(isNew).select(col("doc_id"))
      .join(hits, col("doc_id") === col("doc_new"), "left")
      .select(col("doc_id"), col("dup_of").isNull.as("is_novel"), col("dup_of"),
        col("best_jaccard"), coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  // ---- P43b: the persisted band index the gate's doc promises ------

  /** Materialize the corpus's near-dup index as TWO parquet tables —
    * `indexDir/bands` (doc_id, band, bh) and `indexDir/shingles`
    * (doc_id, sh) — so ingests stop recomputing corpus features
    * entirely: the gate's candidate join reads `bands`, its verify
    * join reads only the candidate rows of `shingles`. Build cost is
    * one corpus scan; each accepted batch maintains the index by
    * APPENDING its own rows ([[lshIndexAppend]]) — the full loop a
    * production pipeline runs, with the corpus never re-read. */
  def lshIndexWrite(docs: DataFrame, indexDir: String,
                    bands: Int = 8, rowsPerBand: Int = 2): Unit = {
    GraftFunctions.register(docs.sparkSession)
    val sh = docs.select(col("doc_id"), hashedShingles(col("text")).as("sh"))
    sh.write.mode("overwrite").parquet(s"$indexDir/shingles")
    bandExplode(sh, "sh", bands, rowsPerBand).drop("sh")
      .write.mode("overwrite").parquet(s"$indexDir/bands")
  }

  /** Append an accepted batch's bands + shingles to the index. */
  def lshIndexAppend(docs: DataFrame, indexDir: String,
                     bands: Int = 8, rowsPerBand: Int = 2): Unit = {
    GraftFunctions.register(docs.sparkSession)
    val sh = docs.select(col("doc_id"), hashedShingles(col("text")).as("sh"))
    sh.write.mode("append").parquet(s"$indexDir/shingles")
    bandExplode(sh, "sh", bands, rowsPerBand).drop("sh")
      .write.mode("append").parquet(s"$indexDir/bands")
  }

  /** [[incrementalLshGate]] against a PERSISTED index: identical
    * verdict contract, but the corpus side comes from the index tables
    * — batch features compute row-locally, the candidate join touches
    * `bands`, the verify join touches only candidate `shingles` rows.
    * Band math is [[bandExplode]] on both paths, so verdicts are
    * exactly the inline gate's (spec-pinned). */
  def incrementalLshGateIndexed(spark: SparkSession, indexDir: String, batch: DataFrame,
                                bands: Int = 8, rowsPerBand: Int = 2,
                                minJaccard: Double = 0.1): DataFrame = {
    GraftFunctions.register(spark)
    val batchSh = batch.select(col("doc_id"), hashedShingles(col("text")).as("sh"))
    val newB = bandExplode(batchSh, "sh", bands, rowsPerBand)
      .select(col("doc_id").as("doc_new"), col("band"), col("bh"))
    val idxB = spark.read.parquet(s"$indexDir/bands")
      .select(col("doc_id").as("doc_old"), col("band"), col("bh"))
    val cand = newB.join(idxB, Seq("band", "bh"))
      .select("doc_new", "doc_old").distinct()
    val ver = cand
      .join(batchSh.select(col("doc_id").as("doc_new"), col("sh").as("sh_n")), Seq("doc_new"))
      .join(spark.read.parquet(s"$indexDir/shingles")
        .select(col("doc_id").as("doc_old"), col("sh").as("sh_o")), Seq("doc_old"))
      .select(col("doc_new"), col("doc_old"),
        round(jaccard(col("sh_n"), col("sh_o")), 4).as("j"))
      .filter(col("j") >= minJaccard)
    val hits = ver.groupBy("doc_new").agg(
      min(col("doc_old")).as("dup_of"),
      max(col("j")).as("best_jaccard"),
      count(lit(1)).as("n_matches"))
    batch.select(col("doc_id"))
      .join(hits, col("doc_id") === col("doc_new"), "left")
      .select(col("doc_id"), col("dup_of").isNull.as("is_novel"), col("dup_of"),
        col("best_jaccard"), coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  /** SimHash per doc (custom codegen expression) + a 12-bit prefix
    * bucket — Hamming-close docs collide in the bucket at scale. */
  def simhashBuckets(spark: SparkSession, docs: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    docs.select(col("doc_id"),
      call_function("simhash64", tokens(col("text"))).as("simhash"))
      .withColumn("bucket", shiftrightunsigned(col("simhash"), 52))
  }

  /** Word-3gram Jaccard pairs within a `source`, with candidates from
    * the SAME LSH band machinery as [[minhashCandidates]] (shared
    * [[bandExplode]] math, banding scoped per source) and an exact
    * hashed-shingle Jaccard verify on candidates only. Round 8: the
    * previous all-pairs-within-source join was O(Σ n_source²) pairs —
    * one spam-heavy domain at 100 TB made it a scale-killer; banding
    * makes candidate generation an equi-join on (source, band, bh)
    * whose buckets are capped (observed truncation, like P3's).
    *
    * The band prefilter is RECALL-LOSSY by design (Broder 1997): a
    * same-source pair surfaces only if some band of their minhash
    * signatures collides — P(candidate) = 1-(1-j^rows)^bands, so
    * low-Jaccard pairs are mostly not enumerated. Reported pairs carry
    * their EXACT Jaccard. The DuckDB oracle replays the identical
    * pipeline (DuckHashSql.minhashCtes with groupCols=source), so the
    * result stays hash-exact end-to-end. */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double, bands: Int = 8,
                        rowsPerBand: Int = 2, maxBucket: Int = 1000): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val withSh = cacheReplacing(
      docs.select(col("source"), col("doc_id"), hashedShingles(col("text")).as("sh")), ngramSlot)
    val banded = bandExplode(withSh, "sh", bands, rowsPerBand).drop("sh")
    // Bucket grouping, not a self-join (the minhashCandidates shape):
    // each (source, band, bh) bucket expands to its in-bucket pairs, so
    // a bucket is one reducer's work and pathological buckets are capped.
    val buckets = banded.groupBy("source", "band", "bh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .observe("ngram_jaccard_buckets",
        count(lit(1)).as("buckets"),
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L)).as("truncated_buckets"),
        max(size(col("ids"))).as("max_bucket_size"))
      .select(col("source"), slice(col("ids"), 1, maxBucket).as("ids"))
    val pairs = buckets
      .select(col("source"), explode(call_function("pair_expand", col("ids"))).as("p"))
      .select(col("source"), col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct() // a pair may collide in several bands — verify once
    pairs
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("source"), col("doc_a"), col("doc_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Index location + write-once memo for the registry query (the
    * IcebergQueries.ensureTable pattern: Verify builds on first use,
    * Bench pre-builds untimed via Fixtures). Keyed by the ABSOLUTE
    * dir's hash AND the JVM pid, not the basename alone: two
    * concurrent JVMs (parallel bench+verify) or two checkouts sharing
    * an SF name must never race one mode("overwrite") write against
    * the other's reads under a shared /tmp path (ADVICE r7). */
  /** P49: CONTAINMENT near-dup — the asymmetric overlap Jaccard misses.
    * A short document pasted inside a long one has tiny Jaccard (the
    * union is the big doc) but containment |A∩B|/|A| ≈ 1, so minhash
    * banding — tuned to Jaccard — never surfaces the pair. Candidates
    * instead come from a shingle INVERTED INDEX (the PPJoin/entity-
    * matching device, Xiao et al. 2008): explode hashed shingles, drop
    * "stop-grams" whose document frequency exceeds `maxDf` (they carry
    * no signal and would blow up buckets — counted via `observe`, never
    * silently), and pair docs within each surviving shingle bucket —
    * every bucket is ≤ maxDf docs, so per-reducer work is bounded and
    * nothing is doc×doc. The verify step computes exact containment
    * both directions on the full shingle sets; the threshold compares
    * in integers (inter·10 ≥ |set|·8 ⇔ containment ≥ 0.8) so every
    * engine agrees. */
  def containmentPairs(docs: DataFrame, minContainmentTenths: Int = 8,
                       maxDf: Int = 50): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val withSh = cacheReplacing(
      docs.select(col("doc_id"), hashedShingles(col("text")).as("sh")), containSlot)
    // Gram document frequency via aggregate-then-join-back, NOT a
    // count-over-window: a window partitioned by g must buffer and
    // sort EVERY occurrence of a gram in one task, so a hot stop-gram
    // (df in the millions at 100 TB) is a single-task skew hotspot —
    // the r9 windowed rewrite quietly reintroduced exactly the skew
    // the old map-side-partial aggregate avoided (round-10 ADVICE).
    // This shape keeps both properties the r8 fusion bought: the
    // exploded stream recomputes cheaply from the CACHED shingle
    // arrays (never re-scans text), and no stop-gram bucket is ever
    // collected — the df <= maxDf inner join drops stop occurrences
    // before any collect_list. Hot keys are safe at every step: the
    // df aggregate partial-aggregates map-side, and the annotate join
    // is an equi-join AQE's skew handling can split, where a window
    // cannot be.
    val exploded = withSh.select(col("doc_id"), explode(col("sh")).as("g"))
    // One row per distinct gram — the observe metrics (distinct grams
    // / distinct stop-grams) ride on this bounded frame, same meaning
    // as the windowed rn==1 markers they replace.
    val dfAgg = exploded.groupBy("g").agg(count(lit(1)).as("df"))
      .observe("containment_grams",
        count(lit(1)).as("grams"),
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("stop_grams"))
    // Sub-maxDf occurrences with df attached; consumed twice (per-doc
    // counts, buckets) → cached. Stop-gram occurrences end here: they
    // never shuffle again (per-doc slack is derived by subtraction —
    // shingle arrays are distinct, so len - n_nonstop IS the per-doc
    // stop count the prefilter needs).
    val nonStop = cacheReplacing(
      exploded.join(dfAgg.filter(col("df") <= maxDf), Seq("g")), containExSlot)
    val nonStopCnt = nonStop.groupBy("doc_id").agg(count(lit(1)).as("n_nonstop"))
    val stats = withSh.select(col("doc_id"), size(col("sh")).cast("long").as("len"))
      .join(nonStopCnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len"),
        (col("len") - coalesce(col("n_nonstop"), lit(0L))).as("n_stop"))
    val buckets = nonStop.filter(col("df") >= 2)
      .groupBy("g").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    val pairs = buckets.select(explode(call_function("pair_expand", col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
    // COUNT filtering (the PPJoin device, exact): the pair expansion
    // already yields each pair once per shared mid-df gram, so the
    // group count IS the intersection restricted to indexed grams.
    // full inter = shared_mid + shared_stop and shared_stop ≤
    // min(n_stop_a, n_stop_b), so the integer test below is a pure
    // upper-bound implication of the final threshold — no survivor is
    // lost, and the expensive array verify runs on the few pairs that
    // can still qualify instead of every co-bucketed pair (1.1 M pairs
    // → hundreds at sf0.1; 14 s → ~2 s, results bit-identical).
    val sharedMid = pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_mid"))
    val pre = sharedMid
      .join(stats.select(col("doc_id").as("doc_a"), col("len").as("len_a"),
        col("n_stop").as("stop_a")), Seq("doc_a"))
      .join(stats.select(col("doc_id").as("doc_b"), col("len").as("len_b"),
        col("n_stop").as("stop_b")), Seq("doc_b"))
      .filter((col("shared_mid") + least(col("stop_a"), col("stop_b"))) * 10 >=
        least(col("len_a"), col("len_b")) * minContainmentTenths)
      .select("doc_a", "doc_b")
    pre
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      // fused sorted-merge count — no intermediate array per pair
      .withColumn("inter",
        call_function("intersect_count_sorted", col("sh_a"), col("sh_b")).cast("int"))
      .filter(col("inter") * 10 >= size(col("sh_a")) * minContainmentTenths ||
        col("inter") * 10 >= size(col("sh_b")) * minContainmentTenths)
      .select(col("doc_a"), col("doc_b"),
        col("inter").cast("long").as("common_shingles"),
        round(col("inter").cast("double") / size(col("sh_a")), 4).as("cont_a"),
        round(col("inter").cast("double") / size(col("sh_b")), 4).as("cont_b"))
  }

  /** P55: cross-source duplication ATTRIBUTION — the provenance
    * analytics a corpus owner runs over the near-dup graph: which
    * source PAIRS the duplication lives between (mirror sites,
    * syndication, scraped re-posts) and how much of it stays inside a
    * single source. Pairs come from the shared minhash machinery; the
    * rollup is |sources|² at most, never documents². The source pair
    * is ordered lexicographically so (a, b) and (b, a) collapse. */
  def crossSourceDup(docs: DataFrame, minJaccard: Double = 0.1): DataFrame = {
    val s = docs.select(col("doc_id"), col("source"))
    minhashCandidates(docs, minJaccard = minJaccard)
      .join(s.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(s.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        col("jaccard"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
      .withColumn("within_source", col("source_a") === col("source_b"))
  }

  /** P48: cross-document LINE-level dedup (boilerplate removal) — the
    * RefinedWeb/CCNet pre-cleaning step: a line (navigation bar, cookie
    * banner, footer) that recurs verbatim in `minDocs`+ DISTINCT
    * documents is boilerplate and is struck from every document; unique
    * lines survive in order. The reference has no corpus analogue — its
    * closest device is per-row string surgery (be/src/exprs
    * string-functions.cc) — so the shape is Spark-native: explode to
    * (doc, pos, line), count distinct docs per line (ONE shuffle on the
    * line key, map-side partial dedup), anti-join the exploded lines
    * against the hot set (equi-join — the hot set is unbounded at
    * 100 TB, so it is NOT broadcast), and reassemble per doc. No stage
    * ever pairs documents; per-reducer work is bounded by the hottest
    * line's doc count, which is exactly what the operator removes. */
  def lineDedup(docs: DataFrame, minDocs: Int = 3): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val hot = lines.filter(length(trim(col("line"))) > 0)
      .groupBy(col("line").as("hot_line"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("hot_line")
    val rebuilt = lines.join(hot, col("line") === col("hot_line"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** The synthetic corpus carries no newlines, so the P48 query entry
    * first reflows each document into fixed 3-word lines — a
    * deterministic adapter both engines replay identically; the
    * operator itself splits on real newlines. */
  def reflowLines(docs: DataFrame, wordsPerLine: Int = 3): DataFrame = {
    // compiled single-pass reflow (paragraph width Int.MaxValue → plain
    // "\n" joins): the transform/slice/array_join builtin composition
    // evaluates interpreted and re-runs once per consumer — lineDedup
    // reads the reflowed text three times (hot set, rebuild, n_lines)
    GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      call_function("reflow_paragraphs", col("text"),
        lit(wordsPerLine), lit(Int.MaxValue)).as("text"))
  }

  def lshIndexPath(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    s"/tmp/graft_lsh_index_${new java.io.File(dir).getName}_" +
      s"${abs.hashCode.toHexString}_p${ProcessHandle.current().pid()}"
  }
  private val lshIdxBuilt = new scala.collection.concurrent.TrieMap[String, Boolean]()
  def ensureLshIndex(spark: SparkSession, dir: String): String = {
    val p = lshIndexPath(dir)
    lshIdxBuilt.getOrElseUpdate(p, {
      lshIndexWrite(Tables(spark, dir).documents
        .filter(pmod(col("doc_id"), lit(5)) =!= 0), p)
      true
    })
    p
  }
  private[graft] def invalidateLshIndex(dir: String): Unit =
    lshIdxBuilt.remove(lshIndexPath(dir))

  // ---- queries()/oracle entries -------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> ((spark, dir) => {
      exactGroups(Tables(spark, dir).documents).orderBy("h")
    }),
    "dedup_exact_rows" -> ((spark, dir) => {
      exactKeepFirst(Tables(spark, dir).documents)
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),
    "dedup_minhash_lsh" -> ((spark, dir) => {
      minhashCandidates(Tables(spark, dir).documents, minJaccard = 0.1)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(200)
    }),
    "dedup_simhash" -> ((spark, dir) => {
      simhashBuckets(spark, Tables(spark, dir).documents).orderBy("doc_id")
    }),
    // Every 5th doc plays the incoming batch; the rest are the corpus.
    "dedup_incremental_lsh" -> ((spark, dir) => {
      incrementalLshGate(Tables(spark, dir).documents,
        pmod(col("doc_id"), lit(5)) === 0).orderBy("doc_id")
    }),
    // Same gate served from the PERSISTED index tables (P43b): the
    // verdict math is identical, so it shares the inline gate's oracle.
    "dedup_incremental_indexed" -> ((spark, dir) => {
      val p = ensureLshIndex(spark, dir)
      incrementalLshGateIndexed(spark, p,
        Tables(spark, dir).documents.filter(pmod(col("doc_id"), lit(5)) === 0))
        .orderBy("doc_id")
    }),
    "dedup_ngram_jaccard" -> ((spark, dir) => {
      ngramJaccardPairs(Tables(spark, dir).documents, 0.05)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(200)
    }),
    "dedup_lines" -> ((spark, dir) => {
      lineDedup(reflowLines(Tables(spark, dir).documents), minDocs = 3)
        .orderBy("doc_id")
    }),
    "dedup_containment" -> ((spark, dir) => {
      containmentPairs(Tables(spark, dir).documents)
        .orderBy(col("common_shingles").desc, col("doc_a"), col("doc_b")).limit(200)
    }),
    "dedup_cross_source" -> ((spark, dir) => {
      crossSourceDup(Tables(spark, dir).documents).orderBy("source_a", "source_b")
    }),
  )

  private lazy val incrementalOracle: String = {
    import graft.operators.DuckHashSql._
    s"""WITH ${minhashCtes("documents")},
       |icand AS (
       |  SELECT DISTINCT nb.doc_id AS doc_new, ob.doc_id AS doc_old
       |  FROM mbands nb JOIN mbands ob
       |    ON nb.u.band = ob.u.band AND nb.u.bh = ob.u.bh
       |  WHERE nb.doc_id % 5 = 0 AND ob.doc_id % 5 <> 0),
       |iver AS (
       |  SELECT doc_new, doc_old, ${jaccardSql("a.su", "b.su")} AS j
       |  FROM icand JOIN msh a ON icand.doc_new = a.doc_id
       |             JOIN msh b ON icand.doc_old = b.doc_id),
       |ihits AS (
       |  SELECT doc_new, min(doc_old) AS dup_of, max(j) AS best_jaccard,
       |         CAST(count(*) AS BIGINT) AS n_matches
       |  FROM iver WHERE j >= 0.1 GROUP BY doc_new)
       |SELECT d.doc_id, h.dup_of IS NULL AS is_novel, h.dup_of,
       |  h.best_jaccard, coalesce(h.n_matches, 0) AS n_matches
       |FROM documents d LEFT JOIN ihits h ON d.doc_id = h.doc_new
       |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact_rows" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // minhash IS oracle-able: DuckDB replays the whole candidate
    // pipeline bit-for-bit — FNV token hashes, splitmix64 shingle
    // chains and permutations, Spark-xxhash64 band hashes — via
    // generated HUGEINT arithmetic (DuckHashSql.minhashCtes).
    "dedup_minhash_lsh" -> {
      import graft.operators.DuckHashSql._
      s"""WITH ${minhashCtes("documents")}
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, ${jaccardSql("a.su", "b.su")} AS jaccard
         |  FROM mpairs JOIN msh a ON mpairs.doc_a = a.doc_id
         |              JOIN msh b ON mpairs.doc_b = b.doc_id)
         |WHERE jaccard >= 0.1
         |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 200""".stripMargin
    },

    // The incremental gate reuses the vetted minhash replay: mbands
    // carries every doc's band hashes, so the batch-vs-corpus candidate
    // join is a side-constrained self-join over it (the unused
    // mbuckets/mpairs CTEs are dead code DuckDB never evaluates).
    // The indexed variant (P43b) computes the same verdicts from the
    // persisted tables — one oracle text serves both keys.
    "dedup_incremental_indexed" -> incrementalOracle,
    "dedup_incremental_lsh" -> incrementalOracle,

    // simhash IS oracle-able: DuckDB replays per-token FNV-1 bit votes
    // via generated HUGEINT arithmetic (DuckHashSql.simhash64U).
    "dedup_simhash" -> {
      import graft.operators.DuckHashSql._
      s"""WITH s AS (SELECT doc_id, ${simhash64U(tokensSql("text"))} AS sigu FROM documents)
         |SELECT doc_id, ${toSignedBigint("sigu")} AS simhash, (sigu >> 52)::BIGINT AS bucket
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // ngram jaccard IS oracle-able end-to-end: DuckDB replays the full
    // per-source LSH candidate pipeline bit-for-bit (FNV shingles,
    // splitmix64 permutations, xxhash64 bands, banding grouped by
    // source via minhashCtes groupCols) and the exact hashed-shingle
    // Jaccard verify — same machinery as dedup_minhash_lsh.
    "dedup_ngram_jaccard" -> {
      import graft.operators.DuckHashSql._
      s"""WITH ${minhashCtes("documents", groupCols = Seq("source"))}
         |SELECT source, doc_a, doc_b, jaccard FROM (
         |  SELECT mpairs.source, doc_a, doc_b, ${jaccardSql("a.su", "b.su")} AS jaccard
         |  FROM mpairs JOIN msh a ON mpairs.doc_a = a.doc_id
         |              JOIN msh b ON mpairs.doc_b = b.doc_id)
         |WHERE jaccard >= 0.05
         |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 200""".stripMargin
    },

    // P48 is pure string algebra — DuckDB replays the 3-word reflow
    // (list comprehension + 1-based inclusive slicing), the hot-line
    // count, the anti-join and the ordered reassembly exactly.
    "dedup_lines" ->
      """WITH lined AS (
        |  SELECT doc_id, array_to_string(
        |    [array_to_string(words[(i*3+1):(i*3+3)], ' ')
        |     for i in range(0, greatest(CAST(ceil(len(words)/3.0) AS INT), 1))],
        |    chr(10)) AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
        |  FROM lined),
        |hot AS (
        |  SELECT line FROM lines WHERE length(trim(line)) > 0
        |  GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM lines WHERE line NOT IN (SELECT line FROM hot)
        |  GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id, CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines
        |  FROM lined)
        |SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text, b.n_lines,
        |  b.n_lines - coalesce(r.n_kept, 0) AS n_removed
        |FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // P55: the attribution rollup over the vetted minhash pair replay.
    "dedup_cross_source" -> {
      import graft.operators.DuckHashSql._
      s"""WITH ${minhashCtes("documents")},
         |ver AS (
         |  SELECT doc_a, doc_b, jaccard FROM (
         |    SELECT doc_a, doc_b, ${jaccardSql("a.su", "b.su")} AS jaccard
         |    FROM mpairs JOIN msh a ON mpairs.doc_a = a.doc_id
         |                JOIN msh b ON mpairs.doc_b = b.doc_id)
         |  WHERE jaccard >= 0.1),
         |lab AS (
         |  SELECT least(da.source, db.source) AS source_a,
         |         greatest(da.source, db.source) AS source_b, jaccard
         |  FROM ver JOIN documents da ON ver.doc_a = da.doc_id
         |           JOIN documents db ON ver.doc_b = db.doc_id)
         |SELECT source_a, source_b, count(*) AS n_pairs,
         |  max(jaccard) AS max_jaccard,
         |  source_a = source_b AS within_source
         |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // P49 replays end-to-end: the vetted hashed-shingle chain, the
    // df-filtered inverted-index candidate join, and the exact
    // integer-threshold containment verify.
    "dedup_containment" -> {
      import graft.operators.DuckHashSql._
      s"""WITH ${shingleCte("documents")},
         |ex AS (SELECT doc_id, unnest(su) AS g FROM msh),
         |buck AS (
         |  SELECT g FROM ex GROUP BY g
         |  HAVING count(*) BETWEEN 2 AND 50),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ex a JOIN buck USING (g) JOIN ex b USING (g)
         |  WHERE a.doc_id < b.doc_id),
         |ver AS (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(x.su, y.su)) AS inter,
         |    len(x.su) AS la, len(y.su) AS lb
         |  FROM cand JOIN msh x ON cand.doc_a = x.doc_id
         |            JOIN msh y ON cand.doc_b = y.doc_id)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS common_shingles,
         |  round(inter::DOUBLE / la, 4) AS cont_a,
         |  round(inter::DOUBLE / lb, 4) AS cont_b
         |FROM ver WHERE inter * 10 >= la * 8 OR inter * 10 >= lb * 8
         |ORDER BY common_shingles DESC, doc_a, doc_b LIMIT 200""".stripMargin
    },
  )
}

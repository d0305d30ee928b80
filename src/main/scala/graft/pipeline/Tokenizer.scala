package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftFunctions

/** P38: trained BPE tokenizer (Sennrich et al. 2016) — the real version
  * of P11's "BPE-ish regex" count: learn the merge table from the
  * corpus, then tokenize every document with it. A training-data
  * pipeline needs this twice — to build the tokenizer's vocabulary and
  * to count the tokens that billing/mixture math runs on.
  *
  * Scale shape (the PQ lesson, twice over): TRAINING runs on a bounded
  * deterministic sample (published practice — tokenizers train on a
  * corpus slice, not the corpus), so every per-rank pair count is a
  * sample-sized shuffle and the argmax is a 1-row TopN; the merge table
  * is O(numMerges) and folds into ONE broadcast row. ENCODING — the
  * per-corpus-word hot path — is the compiled `bpe_encode` expression
  * (graft.functions.BpeImpl), not a higher-order lambda chain: per-rank
  * left-to-right merge passes run as JVM loops inside codegen.
  *
  * Training is exact integer logic with lexicographic tie-breaks, so
  * the merge table is identical under any partitioning (asserted in
  * PipelineSpec); it is still declared rows-only because DuckDB cannot
  * replay an iterative argmax-and-rewrite loop in one SQL statement.
  */
object Tokenizer {

  private def words(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Learn `numMerges` BPE merges from the first `sampleDocs` docs.
    * Returns (rank, a, b) — rank-ordered merge rules. Each round: count
    * adjacent symbol pairs weighted by word frequency, take the most
    * frequent (ties: lexicographic), rewrite the sample's symbol
    * sequences with it. The rewrite fold is equivalent to the encoder's
    * left-to-right scan (see graft.functions.BpeImpl doc). */
  def trainMerges(spark: SparkSession, docs: DataFrame,
                  numMerges: Int = 16, sampleDocs: Int = 256): DataFrame = {
    // eager localCheckpoint per round: wf_r's plan references best_{r-1}
    // which references wf_{r-1} — without lineage truncation the
    // LOGICAL plan doubles every round (2^numMerges nodes; at 16 rounds
    // Spark OOMs building the plan STRING). Checkpoint state is
    // sample-sized and recomputable, so the local (executor-block)
    // variant is the right tool — no reliable-checkpoint gate needed,
    // unlike the corpus-sized CC labels (Cluster.scala).
    var wf = docs.orderBy("doc_id").limit(sampleDocs)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .select(expr("regexp_extract_all(word, '.', 0)").as("w"), col("freq"))
      .localCheckpoint(true)
    var merges: DataFrame = null
    var r = 0
    while (r < numMerges) {
      val best = wf.filter(size(col("w")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(w) - 1),
            |  j -> named_struct('a', element_at(w, j), 'b', element_at(w, j + 1)))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .select(lit(r.toLong).as("rank"), col("a"), col("b"))
        .localCheckpoint(true)
      merges = if (merges == null) best else merges.unionAll(best)
      // apply the winning merge to every sample word (fold ≡ scan: the
      // merged symbol a+b can never re-match a, b is non-empty)
      wf = wf.crossJoin(broadcast(best))
        .select(expr(
          """aggregate(w, CAST(array() AS ARRAY<STRING>),
            |  (acc, x) -> IF(size(acc) > 0 AND element_at(acc, size(acc)) = a AND x = b,
            |    concat(slice(acc, 1, size(acc) - 1), array(concat(a, b))),
            |    concat(acc, array(x))))""".stripMargin).as("w"), col("freq"))
        .localCheckpoint(true)
      r += 1
    }
    merges
  }

  /** Tokenize the corpus with merges trained on its own sample: per doc,
    * word count, BPE token count, and the first words' tokens as an
    * audit column (`|`-joined so merged tokens are visible). */
  def bpeTokenize(spark: SparkSession, docs: DataFrame,
                  numMerges: Int = 16, sampleDocs: Int = 256): DataFrame = {
    GraftFunctions.register(spark)
    val mrow = trainMerges(spark, docs, numMerges, sampleDocs)
      .agg(array_sort(collect_list(struct(col("rank"), col("a"), col("b")))).as("ms"))
      .select(expr("transform(ms, m -> named_struct('a', m.a, 'b', m.b))").as("merges"))
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .crossJoin(broadcast(mrow))
      .select(col("doc_id"), col("ws"),
        expr("transform(ws, w -> bpe_encode(w, merges))").as("toks"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        expr("CAST(aggregate(toks, 0, (acc, t) -> acc + size(t)) AS BIGINT)").as("n_bpe"),
        expr("concat_ws(' ', transform(slice(toks, 1, 3), t -> array_join(t, '|')))").as("bpe_head"))
  }

  // ---- queries()/oracle entries -------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // deterministic integer training + compiled encode; rows-only (an
    // iterative argmax-rewrite loop has no single-SQL DuckDB replay) +
    // PipelineSpec pinned-merge/round-trip/repartition-stability specs.
    "pipe_bpe_tokenize" -> ((spark, dir) =>
      bpeTokenize(spark, Tables(spark, dir).documents).orderBy("doc_id")),
    "pipe_bpe_merges" -> ((spark, dir) =>
      trainMerges(spark, Tables(spark, dir).documents).orderBy("rank")),
  )

  val oracles: Map[String, String] = Map.empty
}

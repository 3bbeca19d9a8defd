package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath
import graft.sample.Sampling
import graft.text.TextAnalysis.hash60Duck

/** Deterministic sampling, oracle-gated. The oracle replays the exact
  * kept-row set (hash predicate), not just expected rates — the point of
  * content-stable sampling is that the row choice itself is reproducible. */
object SampleQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(tablePath(dir, "documents"))

  /** `en` is ~2.2× over-represented in the corpus; 0.35 brings it level
    * with the other languages while they keep everything. */
  private val EnRate = 0.35
  private val BernoulliRate = 0.1

  override def queries: Seq[EngineQuery] = Seq(

    EngineQuery(
      "sample_bernoulli_docs",
      (s, dir) =>
        Sampling.bernoulli(docs(s, dir), "CAST(doc_id AS STRING)", BernoulliRate)
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars")),
      Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE ${hash60Duck("CAST(doc_id AS VARCHAR)")} < ${Sampling.threshold(BernoulliRate)}
             |GROUP BY source""".stripMargin)),

    EngineQuery(
      "sample_stratified_langs",
      (s, dir) =>
        Sampling.stratified(docs(s, dir), "CAST(doc_id AS STRING)", "lang",
            rates = Map("en" -> EnRate), defaultFrac = 1.0)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars")),
      Some(s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE ${hash60Duck("CAST(doc_id AS VARCHAR)")} <
             |  CASE WHEN lang = 'en' THEN ${Sampling.threshold(EnRate)}
             |       ELSE ${Sampling.threshold(1.0)} END
             |GROUP BY lang""".stripMargin)),

    // Data-derived rebalance: every language downsampled to the smallest
    // language's observed count — the "equal shares" pretraining mix,
    // with no rate configured anywhere.
    EngineQuery(
      "sample_rebalance_langs",
      (s, dir) =>
        Sampling.rebalance(docs(s, dir), "CAST(doc_id AS STRING)", "lang")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars")),
      Some(s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
             |r AS (SELECT lang,
             |        CAST(min(cnt) OVER () AS DOUBLE) / CAST(cnt AS DOUBLE) AS rate
             |      FROM c)
             |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents d JOIN r ON d.lang = r.lang
             |WHERE ${hash60Duck("CAST(doc_id AS VARCHAR)")} <
             |  CAST(floor(rate * 1152921504606846976.0) AS BIGINT)
             |GROUP BY d.lang""".stripMargin)),

    // Weighted sampling without replacement: 50 docs, selection biased
    // toward long documents (weight = n_chars), via deterministic
    // integer priorities. The plan is TakeOrderedAndProject (bounded
    // per-partition heaps), never a global sort.
    EngineQuery(
      "sample_weighted",
      (s, dir) =>
        Sampling.weightedTopK(
            docs(s, dir).select("doc_id", "lang", "n_chars"),
            "CAST(doc_id AS STRING)", "n_chars", k = 50),
      Some(s"""SELECT doc_id, lang, n_chars,
             |  ${hash60Duck("CAST(doc_id AS VARCHAR)")} // n_chars AS priority
             |FROM documents
             |ORDER BY priority, doc_id LIMIT 50""".stripMargin)),

    // Weight-budget rebalance: every language downsampled toward the
    // smallest language's total CHARACTER budget (the equal-token-share
    // pretraining mix), not its row count.
    EngineQuery(
      "sample_rebalance_chars",
      (s, dir) =>
        Sampling.rebalanceByWeight(docs(s, dir), "CAST(doc_id AS STRING)",
            "lang", "n_chars")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars")),
      Some(s"""WITH c AS (
             |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS wsum
             |  FROM documents GROUP BY lang),
             |r AS (SELECT lang,
             |        CAST(min(wsum) OVER () AS DOUBLE) / CAST(wsum AS DOUBLE) AS rate
             |      FROM c)
             |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents d JOIN r ON d.lang = r.lang
             |WHERE ${hash60Duck("CAST(doc_id AS VARCHAR)")} <
             |  CAST(floor(rate * 1152921504606846976.0) AS BIGINT)
             |GROUP BY d.lang""".stripMargin)),

    // EXACTLY-k-per-group deterministic reservoir: the k smallest
    // content hashes per stratum, computed with the bounded-heap
    // `topk_by` aggregate — ≤ k pairs of state per group per partition,
    // no per-group sort, no Window (q20's plan contrast). A
    // fixed-sample-SIZE guarantee where the rate-based samplers give a
    // fixed probability; same reproducibility contract (hash order is
    // content-stable, so the chosen rows replay in any engine). The
    // hash is folded to 50 bits so its DOUBLE cast (topk_by's score
    // type) stays exact.
    EngineQuery(
      "sample_group_reservoir",
      (s, dir) =>
        docs(s, dir)
          .selectExpr("lang", "doc_id",
            s"${graft.text.TextAnalysis.hash60Spark("CAST(doc_id AS STRING)")} % 1125899906842624 AS draw")
          .groupBy("lang")
          .agg(expr("topk_by(-CAST(draw AS DOUBLE), doc_id, 5)").as("top"))
          .select(col("lang"), explode(col("top")).as("t"))
          .selectExpr("lang", "t.id AS doc_id", "CAST(-t.score AS BIGINT) AS draw"),
      Some(s"""WITH h AS (SELECT lang, doc_id,
             |    ${hash60Duck("CAST(doc_id AS VARCHAR)")} % 1125899906842624 AS draw
             |  FROM documents),
             |r AS (SELECT lang, doc_id, draw,
             |    row_number() OVER (PARTITION BY lang ORDER BY draw ASC, doc_id DESC) AS rn
             |  FROM h)
             |SELECT lang, doc_id, draw FROM r WHERE rn <= 5""".stripMargin))
  )
}

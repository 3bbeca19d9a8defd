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
             |SELECT lang, doc_id, draw FROM r WHERE rn <= 5""".stripMargin)),

    // Sampler-quality audit: the Kolmogorov–Smirnov statistic between
    // the 10% hash-sample's price ECDF and the full ECDF, per return
    // flag — validates that content-stable sampling preserves the value
    // DISTRIBUTION, not just the rate. Both ECDFs come from one
    // (flag, price) count with a sampled-subcount column, one ordered
    // cumulative window per flag, and integer-ratio ECDFs — the max
    // |difference| is a max over identically-computed doubles. A small
    // KS (vs the ~0.01 sampling noise floor at this n) is the pass
    // signal; the oracle pins the exact value.
    EngineQuery(
      "sample_ks_check",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = s.read.parquet(tablePath(dir, "lineitem"))
        val thr = Sampling.threshold(BernoulliRate)
        val keySpark = "CONCAT(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))"
        val flagged = li.withColumn("in_samp",
          (expr(graft.text.TextAnalysis.hash60Spark(keySpark)) < lit(thr)).cast("long"))
        val perPrice = flagged.groupBy("l_returnflag", "l_extendedprice")
          .agg(count(lit(1)).as("c_full"), sum("in_samp").as("c_samp"))
        val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = perPrice.groupBy("l_returnflag")
          .agg(sum("c_full").as("n_full"), sum("c_samp").as("n_samp"))
        perPrice
          .withColumn("cum_full", sum("c_full").over(w))
          .withColumn("cum_samp", sum("c_samp").over(w))
          .join(broadcast(tot), "l_returnflag")
          .selectExpr("l_returnflag", "n_full", "n_samp",
            "abs(CAST(cum_full AS DOUBLE) / n_full - CAST(cum_samp AS DOUBLE) / n_samp) AS d")
          .groupBy("l_returnflag")
          .agg(max("n_full").as("n_full"), max("n_samp").as("n_samp"),
            round(max("d"), 6).as("ks"))
      },
      Some(s"""WITH f AS (SELECT l_returnflag, l_extendedprice,
             |    CASE WHEN ${hash60Duck("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} < ${Sampling.threshold(BernoulliRate)}
             |      THEN 1 ELSE 0 END AS in_samp
             |  FROM lineitem),
             |p AS (SELECT l_returnflag, l_extendedprice,
             |    CAST(count(*) AS BIGINT) AS c_full, CAST(sum(in_samp) AS BIGINT) AS c_samp
             |  FROM f GROUP BY 1, 2),
             |cum AS (SELECT l_returnflag,
             |    sum(c_full) OVER w AS cum_full, sum(c_samp) OVER w AS cum_samp
             |  FROM p
             |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |tot AS (SELECT l_returnflag, CAST(sum(c_full) AS BIGINT) AS n_full,
             |    CAST(sum(c_samp) AS BIGINT) AS n_samp
             |  FROM p GROUP BY 1)
             |SELECT c.l_returnflag, max(t.n_full) AS n_full, max(t.n_samp) AS n_samp,
             |  round(max(abs(CAST(cum_full AS DOUBLE) / t.n_full - CAST(cum_samp AS DOUBLE) / t.n_samp)), 6) AS ks
             |FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag
             |GROUP BY 1""".stripMargin))
  )
}

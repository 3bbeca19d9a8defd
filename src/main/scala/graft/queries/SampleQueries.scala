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

  /** Target training-mix weights in EPOCHS per language: >1 repeats the
    * stratum (2.4 = two full passes + a stable 40% subset), <1
    * downsamples, exactly-1 passes through. One Scala map renders into
    * BOTH engines so the thresholds are identical text. */
  private val EpochWeights = Map(
    "de" -> 2.4, "es" -> 3.0, "fr" -> 1.0, "zh" -> 1.7, "en" -> 0.5)

  private val tsSeeded =
    new graft.tables.SessionMemo[String, String]

  private def sampleTable(s: SparkSession, dir: String): String =
    tsSeeded.getOrElseUpdate(s, dir)({
      val base = graft.tables.TmpDirs.create("graft-ts").toString
      graft.streaming.ParquetTable.swap(
        s, s.read.parquet(tablePath(dir, "orders")).repartition(4), s"$base/t")
      val nm = s"smp_orders_${java.util.UUID.randomUUID.toString.replace("-", "").take(8)}"
      graft.tables.GraftSql.register(s, nm, s"$base/t", Seq("o_orderkey"))
      nm
    })

  override def queries: Seq[EngineQuery] = Seq(

    // TABLESAMPLE as SQL text — GraftSql DEFINES it as content-stable
    // hash sampling on the registered key (not an RNG): the same rows
    // are kept on any run/partitioning/cluster, which is what a
    // resampled training corpus actually needs. The predicate is a
    // codegen'd hash compare pushed at the scan; the oracle replays the
    // exact kept-row set.
    EngineQuery(
      "sql_tablesample",
      (s, dir) => graft.tables.GraftSql.sql(s,
        s"""SELECT o_orderstatus, count(*) AS n,
           |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
           |FROM ${sampleTable(s, dir)} TABLESAMPLE (10 PERCENT) REPEATABLE (7)
           |GROUP BY o_orderstatus""".stripMargin),
      Some(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders
             |WHERE ${hash60Duck("CAST(o_orderkey AS VARCHAR) || ':s7'")} < ${Sampling.threshold(0.10)}
             |GROUP BY o_orderstatus""".stripMargin)),

    // Fractional-epoch mixture oversampling (the "1.7 epochs of X"
    // training recipe): floor(w) full repeats + a content-stable
    // Bernoulli(frac(w)) extra pass, each row tagged with its epoch
    // index. One narrow projection + explode — no shuffle, no RNG; the
    // oracle replays the exact copy counts and the unnest(range) fanout.
    EngineQuery(
      "sample_epochs",
      (s, dir) =>
        Sampling.epochs(docs(s, dir), "CAST(doc_id AS STRING)", "lang", EpochWeights)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct("doc_id").as("n_docs"),
            sum("n_chars").as("sum_chars"),
            max("epoch").as("max_epoch")),
      Some {
        val fullCase = "CASE lang " + EpochWeights.toSeq.sortBy(_._1).map {
          case (k, w) => s"WHEN '$k' THEN ${math.floor(w).toLong}"
        }.mkString(" ") + " ELSE 0 END"
        val thrCase = "CASE lang " + EpochWeights.toSeq.sortBy(_._1).map {
          case (k, w) => s"WHEN '$k' THEN ${Sampling.threshold(w - math.floor(w))}"
        }.mkString(" ") + " ELSE 0 END"
        s"""WITH d AS (
           |  SELECT lang, doc_id, n_chars,
           |    $fullCase
           |    + CASE WHEN ${hash60Duck("CAST(doc_id AS VARCHAR) || ':ep'")} < $thrCase
           |        THEN 1 ELSE 0 END AS n_copies
           |  FROM documents),
           |e AS (SELECT lang, doc_id, n_chars,
           |        unnest(range(1, n_copies + 1)) AS epoch
           |      FROM d WHERE n_copies >= 1)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(max(epoch) AS BIGINT) AS max_epoch
           |FROM e GROUP BY lang""".stripMargin
      }),

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

package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}

/** Binding-cap RECALL measurement (VERDICT r9 directive 1, closing r6
  * directive 6 properly): the anchor cap on LSH candidate generation
  * bounds per-bucket pair volume at s·cap instead of s²/2, and
  * DedupCapSpec proves a NON-binding cap pair-identical — but nobody had
  * measured what a BINDING cap actually loses. This main runs
  * `minhashPairs` capped vs uncapped on a real corpus and reports:
  *
  *  - verified-pair recall  |capped ∩ uncapped| / |uncapped|
  *  - cluster-count / clustered-doc deltas (connected components over
  *    each pair set — the quantity dedup actually consumes)
  *  - bucket shape (max/p99 size, how many buckets the cap binds on)
  *
  * Usage: runMain graft.CapRecall <sfDir> [cap] [threshold]
  * Output: one JSON line (same discipline as Bench).
  */
object CapRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cap = if (args.length > 1) args(1).toInt else 64
    val threshold = if (args.length > 2) args(2).toDouble else 0.8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mh = Dedup.withMinhash(
      Dedup.gramsCached(spark, s"$sfDir/documents.parquet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = mh.count()

    // Bucket shape: how adversarial is this corpus, does the cap bind?
    val sizes = Dedup.bands(mh).groupBy("band_idx", "band_hash").count()
      .agg(
        max("count").as("max_bucket"),
        expr("percentile_approx(count, 0.99)").as("p99_bucket"),
        sum(when(col("count") > cap, 1).otherwise(0)).as("buckets_over_cap"))
      .head()

    val uncapped = Dedup.minhashPairs(mh, threshold, Int.MaxValue)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nUncapped = uncapped.count()
    val capped = Dedup.minhashPairs(mh, threshold, cap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCapped = capped.count()
    // The cap only FILTERS candidates, so capped ⊆ uncapped must hold;
    // the semi-join both verifies that and computes the intersection.
    val nKept = capped.join(uncapped, Seq("a_id", "b_id"), "left_semi").count()
    require(nKept == nCapped,
      s"cap produced $nCapped pairs but only $nKept are in the uncapped set — not a pure filter")
    val recall = if (nUncapped == 0) 1.0 else nKept.toDouble / nUncapped

    // What dedup CONSUMES is clusters, not pairs: a dropped pair whose
    // endpoints stay transitively connected through anchors costs
    // nothing. Compare component structure over the touched doc set.
    def clusterStats(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val nodes = pairs.selectExpr("a_id AS id")
        .unionByName(pairs.selectExpr("b_id AS id")).distinct()
      val lab = ConnectedComponents.labels(nodes, pairs)
      (lab.select("label").distinct().count(), lab.count())
    }
    val (clUn, docsUn) = clusterStats(uncapped)
    val (clCap, docsCap) = clusterStats(capped)

    println(
      s"""{"sf":"$sfDir","cap":$cap,"threshold":$threshold,"n_docs":$nDocs,""" +
        s""""max_bucket":${sizes.getAs[Long]("max_bucket")},""" +
        s""""p99_bucket":${sizes.getAs[Long]("p99_bucket")},""" +
        s""""buckets_over_cap":${sizes.getAs[Long]("buckets_over_cap")},""" +
        s""""pairs_uncapped":$nUncapped,"pairs_capped":$nCapped,""" +
        s""""pair_recall":$recall,""" +
        s""""clusters_uncapped":$clUn,"clusters_capped":$clCap,""" +
        s""""clustered_docs_uncapped":$docsUn,"clustered_docs_capped":$docsCap}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir for
  * SCALE SMOKES (never correctness — oracles always run on the driver's
  * own tables): each big table is replicated `k`× with all join keys
  * shifted by a common power-of-ten offset, so orders↔lineitem keys stay
  * consistent and replicas never collide.
  *
  * Document text is deterministically word-shuffled per replica
  * (hash-keyed sort) — a verbatim copy would turn every doc into a
  * k-clique of exact near-dups and quadratically inflate the pair-based
  * dedup operators beyond anything an organic corpus produces; the
  * shuffle keeps the token distribution (langid, quality, BM25 stats)
  * while breaking shingle identity. Embedding replicas get a tiny
  * deterministic per-replica rotation of the first two floats for the
  * same reason.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <dstDir> <k>
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcDir> <dstDir> <k>")
    val (src, dst, k) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val maxOrder = orders.agg(max("o_orderkey")).head.getLong(0)
    // One shared decimal offset keeps orderkeys join-consistent and
    // human-readable (replica = leading digit).
    val off = math.pow(10, math.ceil(math.log10(maxOrder + 2))).toLong

    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val reps = spark.range(k).select(col("id").as("_rep"))
      val shifted = df.crossJoin(broadcast(reps))
      shifts.foldLeft(shifted) { case (d, (c, o)) =>
        d.withColumn(c, col(c) + col("_rep") * o)
      }.drop("_rep")
    }

    replicate(orders, Map("o_orderkey" -> off))
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    replicate(li, Map("l_orderkey" -> off))
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // events.parquet's ts physical type has varied across driver data
    // generations (TIMESTAMP(NANOS), INT64, TIMESTAMP(MICROS)); the
    // nanosAsLong conf makes the RAW read succeed on all of them. The
    // replica stores that raw-read type (INT64 nanos or TIMESTAMP_NTZ,
    // NOT the normalized session-zoned TIMESTAMP) — EventsQueries
    // .events() normalizes either shape on read, so consumers see the
    // same column both ways.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    // One pass over the biggest table for both maxima.
    val evMaxes = ev.agg(max("event_id"), max("user_id")).head
    val evOff = math.pow(10, math.ceil(math.log10(evMaxes.getLong(0) + 2))).toLong
    val userOff = math.pow(10, math.ceil(math.log10(evMaxes.getLong(1) + 2))).toLong
    replicate(ev, Map("event_id" -> evOff, "user_id" -> userOff))
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docOff = math.pow(10, math.ceil(math.log10(
      docs.agg(max("doc_id")).head.getLong(0) + 2))).toLong
    replicate(docs, Map("doc_id" -> docOff))
      // Deterministic per-(doc, replica) word shuffle: sort words by
      // xxhash64(word, position-salt, doc_id) so replica 0 keeps driver
      // word order and other replicas break shingle identity.
      .withColumn("text",
        when(col("doc_id") < docOff, col("text")).otherwise(
          array_join(
            expr("transform(array_sort(transform(split(text, ' '), " +
              "(w, i) -> struct(xxhash64(w, i, doc_id) AS h, w AS w))), s -> s.w)"),
            " ")))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecOff = math.pow(10, math.ceil(math.log10(
      emb.agg(max("vec_id")).head.getLong(0) + 2))).toLong
    replicate(emb, Map("vec_id" -> vecOff))
      .withColumn("embedding",
        when(col("vec_id") < vecOff, col("embedding")).otherwise(
          // swap the first two components and nudge by the replica id —
          // cheap, deterministic, breaks exact-duplicate geometry
          expr("transform(embedding, (x, i) -> CAST(CASE " +
            "WHEN i = 0 THEN embedding[1] + CAST(vec_id DIV " + vecOff +
            " AS FLOAT) / 1000.0 " +
            "WHEN i = 1 THEN embedding[0] ELSE x END AS FLOAT))")))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"""{"scaled":"$dst","k":$k,"orders_off":$off}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir for
  * SCALE SMOKES (never correctness — oracles always run on the driver's
  * own tables): each big table is replicated `k`× with all join keys
  * shifted by a common power-of-ten offset, so orders↔lineitem keys stay
  * consistent and replicas never collide.
  *
  * Document text is deterministically perturbed per replica — a
  * verbatim copy would turn every doc into a k-clique of exact
  * near-dups and quadratically inflate the pair-based dedup operators
  * beyond anything an organic corpus produces (the r13 sf10 run
  * measured 19-62× pair growth for 10× data under the weaker r12
  * jitter). Two composed transforms:
  *   1. hash-keyed word shuffle (per doc,replica) — breaks positional
  *      shingle identity while keeping the token multiset;
  *   2. replica-salted vocabulary substitution ([[perturbText]]) — a
  *      deterministic injective map on ~30% of the vocabulary, so
  *      bag-of-words fingerprints (SimHash) differ ACROSS replicas
  *      (expected Hamming ≈ 8/32 bits, far past the ≤2/≤6 gates)
  *      while similarity WITHIN a replica is preserved (every doc in
  *      replica r sees the same vocab map).
  * Embedding replicas get a per-replica cyclic rotation + hash-keyed
  * sign flips ([[perturbEmbedding]]) — an ORTHOGONAL transform, so all
  * within-replica cosines (and norms, and component distributions) are
  * bit-for-bit the original geometry, while cross-replica cosines
  * collapse to ~N(0, 1/dim) noise: near-dup pair OUTPUTS scale ~k, not
  * k². ScaleGenSpec pins both properties.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <dstDir> <k>
  */
object ScaleGen {

  /** Replica-salted orthogonal scramble of `embedding` (replica id =
    * vec_id DIV vecOff; replica 0 = the driver's original rows, kept
    * verbatim): rotate components by 1 + (rep-1) mod (dim-1) positions
    * (never 0 for rep ≥ 1) and flip signs by xxhash64(rep, i) parity.
    * Rotation and sign-flip are both orthogonal maps, so within-replica
    * pairwise cosine/L2 structure equals the original corpus exactly as
    * real numbers — in floats, the rotation reorders the summation of
    * any cosine/norm fold, so computed values agree to fp rounding
    * (~1e-6 at dim 64; ScaleGenSpec asserts exactly that), not bit-for-
    * bit; across replicas (different rot or sign pattern) the alignment
    * is destroyed — cos concentrates at 0 like independent vectors.
    * Requires dim >= 2: the rotation modulus is dim-1 (div-by-zero on
    * scalar embeddings, which no real embedding table has). */
  def perturbEmbedding(vecOff: Long): org.apache.spark.sql.Column = {
    val rep = s"(vec_id DIV ${vecOff}L)"
    val rot = s"(1L + pmod($rep - 1L, size(embedding) - 1))"
    when(col("vec_id") < vecOff, col("embedding")).otherwise(expr(
      s"""transform(embedding, (x, i) -> CAST(
         |  (CASE WHEN pmod(xxhash64($rep, i), 2) = 0 THEN 1.0D ELSE -1.0D END)
         |  * element_at(embedding, CAST(pmod(i + $rot, size(embedding)) AS INT) + 1)
         |AS FLOAT))""".stripMargin))
  }

  /** Replica-salted vocabulary substitution over a split-word array
    * column `ws` (replica id = doc_id DIV docOff; replica 0 verbatim):
    * words whose corpus-wide hash lands in the low 30% gain a compact
    * replica-unique suffix. Salted by (word, replica) ONLY — not
    * position, not doc — so the map is one consistent injective
    * σ_r: vocab → vocab' per replica: within a replica every doc is
    * rewritten by the SAME σ_r and near-dup token overlap is preserved,
    * while the same doc's copies in two replicas share only ~70% of
    * tokens (shingle Jaccard ~0.7^n, SimHash Hamming ~8/32 — below
    * every near-dup gate). */
  def perturbText(docOff: Long, ws: String): String = {
    val rep = s"(doc_id DIV ${docOff}L)"
    s"""transform($ws, w -> CASE
       |  WHEN $rep > 0 AND pmod(xxhash64(w), 10) < 3
       |  THEN concat(w, 'x', CAST($rep AS STRING))
       |  ELSE w END)""".stripMargin
  }

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
      // Deterministic per-(doc, replica) word shuffle (positional
      // shingle break) composed with the replica-salted vocabulary
      // substitution (bag-of-words / SimHash break) — see the object
      // scaladoc for why both are needed for ~linear pair outputs.
      .withColumn("text",
        when(col("doc_id") < docOff, col("text")).otherwise(
          array_join(
            expr(perturbText(docOff,
              "transform(array_sort(transform(split(text, ' '), " +
                "(w, i) -> struct(xxhash64(w, i, doc_id) AS h, w AS w))), s -> s.w)")),
            " ")))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecOff = math.pow(10, math.ceil(math.log10(
      emb.agg(max("vec_id")).head.getLong(0) + 2))).toLong
    replicate(emb, Map("vec_id" -> vecOff))
      .withColumn("embedding", perturbEmbedding(vecOff))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"""{"scaled":"$dst","k":$k,"orders_off":$off}""")
    spark.stop()
  }
}

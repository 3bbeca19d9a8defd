package graft.text

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, BPE-ish token estimation, stopword/quality scoring,
  * n-gram language-ID, and content fingerprinting.
  *
  * Everything is expressed as Spark SQL (higher-order functions over
  * arrays — no UDFs, fully distributed, partition-local: a text operator
  * never shuffles) with a DuckDB-parallel formulation kept side by side so
  * the driver oracle computes bit-identical results:
  *  - integer arithmetic is exact in both engines;
  *  - double arithmetic uses the same operations in the same order
  *    (IEEE-754 ⇒ bit-identical);
  *  - hashing goes through md5 (same algorithm in both engines), with the
  *    first 15 hex digits read as a 60-bit non-negative BIGINT.
  *
  * Scale notes: all per-document expressions are narrow (no shuffle) and
  * pipeline into whole-stage codegen up to the HOF boundary; at 100 TB the
  * only shuffles in this module's consumers are the explicit groupBys in
  * the dedup/rollup operators.
  */
object TextAnalysis {

  /** Spark-side: lowercase whitespace tokenization. */
  val toksSpark = "filter(split(trim(lower(text)), '\\\\s+'), t -> t != '')"

  /** DuckDB-side equivalent (computed fresh in oracle CTEs). */
  val toksDuck = """list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t != '')"""

  /** 60-bit hash of a string expression: first 15 hex digits of md5. */
  def hash60Spark(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"

  def hash60Duck(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** Deterministic train/val/test assignment (80/10/10): bucket by the
    * 60-bit md5 hash of the key, modulo 100. Content-stable and
    * engine-independent — the same row lands in the same split on any
    * system, any partitioning, any run: the reproducibility contract a
    * training pipeline needs when the corpus is rebuilt incrementally.
    * Narrow (no shuffle, no sampling pass), so it costs one projection
    * at 100 TB. */
  def splitSpark(keyExpr: String): String = {
    val bucket = s"${hash60Spark(s"CAST($keyExpr AS STRING)")} % 100"
    s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END"
  }

  def splitDuck(keyExpr: String): String = {
    val bucket = s"${hash60Duck(s"CAST($keyExpr AS VARCHAR)")} % 100"
    s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END"
  }

  /** BPE-ish token-count estimate: runs of letters, runs of digits, single
    * other non-space chars. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\\\s]"
  val bpeSpark = s"CAST(size(regexp_extract_all(lower(text), '$bpePattern', 0)) AS BIGINT)"
  val bpeDuck = """CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)"""

  /** Stopword profiles for the n-gram language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you", "wo", "ta"))

  def profileHitsSpark(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    s"size(filter(toks, t -> array_contains($arr, t)))"
  }

  def profileHitsDuck(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(toks, t -> list_contains($arr, t)))"
  }

  /** Word n-gram set (distinct), joined with single spaces; short docs
    * degrade to one truncated gram (try_element_at yields NULL past the
    * end — ANSI-safe — and concat_ws skips the null tail; DuckDB list
    * indexing is NULL out-of-bounds, so both engines degrade
    * identically). */
  def gramsNSpark(n: Int): String = {
    val parts = (0 until n).map(k => s"try_element_at(toks, i + $k)").mkString(", ")
    s"array_distinct(transform(sequence(1, greatest(size(toks) - ${n - 1}, 1)), i -> concat_ws(' ', $parts)))"
  }

  def gramsNDuck(n: Int): String = {
    val parts = (0 until n).map(k => s"toks[i+$k]").mkString(", ")
    s"list_distinct([concat_ws(' ', $parts) for i in range(1, greatest(len(toks) - ${n - 1}, 1) + 1)])"
  }

  val grams3Spark: String = gramsNSpark(3)
  val grams3Duck: String = gramsNDuck(3)

  /** POSITIONAL n-grams — the full occurrence sequence, no distinct.
    * Winnowing and repetition statistics need every occurrence in
    * position order, not the set. Same degenerate-doc behavior as the
    * distinct variant (short docs yield one truncated gram, empty docs
    * one empty string). */
  def gramsNPosSpark(n: Int): String = {
    val parts = (0 until n).map(k => s"try_element_at(toks, i + $k)").mkString(", ")
    s"transform(sequence(1, greatest(size(toks) - ${n - 1}, 1)), i -> concat_ws(' ', $parts))"
  }

  def gramsNPosDuck(n: Int): String = {
    val parts = (0 until n).map(k => s"toks[i+$k]").mkString(", ")
    s"[concat_ws(' ', $parts) for i in range(1, greatest(len(toks) - ${n - 1}, 1) + 1)]"
  }

  /** JVM dual of `explode(gramsNPosSpark(n))`: one row per gram
    * OCCURRENCE (positional, duplicates kept), with a per-doc `tag`.
    * Same rationale as [[explodedGramsJvm]] — Catalyst inlines the gram
    * HOF into Generate and re-evaluates it per emitted row; the typed
    * flatMap is the optimizer-proof boundary. Parity with the SQL
    * positional expression is pinned by GramParitySpec. */
  def explodedGramsPosJvm(tagged: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING)
    implicit val outEnc = Encoders.product[DocTagGram]
    tagged.as[(Long, String, String)].mapPartitions { it =>
      it.flatMap { case (docId, tag, text) =>
        if (text == null) Iterator.single(DocTagGram(docId, tag, ""))
        else {
          val toks = text.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val upper = math.max(toks.length - (n - 1), 1)
          Iterator.range(0, upper).map { i =>
            val end = math.min(i + n, toks.length)
            DocTagGram(docId, tag, toks.slice(i, end).mkString(" "))
          }
        }
      }
    }.toDF()
  }

  final case class DocTagGram(doc_id: Long, tag: String, gram: String)

  /** JVM dual of `explode(gramsNSpark(n))`, one output row per distinct
    * gram, carrying a per-doc `tag` column (e.g. the train/test split).
    *
    * WHY: Catalyst collapses a projected gram array INTO the Generate
    * node, and GenerateExec then re-evaluates the whole interpreted HOF
    * chain once per EMITTED row — ~|doc| re-tokenizations per document
    * (measured 16s vs 0.7s at sf0.1). The typed flatMap is a hard
    * boundary the optimizer cannot inline through, and the tight loop
    * builds each gram once. Bit-parity with the SQL path (tokenization,
    * concat_ws null-skip tail, first-occurrence distinct) is pinned by
    * GramParitySpec. Partition-local, no shuffle. */
  def explodedGramsJvm(tagged: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING)
    implicit val outEnc = Encoders.product[DocTagGram]
    tagged.as[(Long, String, String)].mapPartitions { it =>
      it.flatMap { case (docId, tag, text) =>
        if (text == null) Iterator.single(DocTagGram(docId, tag, ""))
        else {
          val toks = text.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val upper = math.max(toks.length - (n - 1), 1)
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i < upper) {
            val end = math.min(i + n, toks.length)
            seen.add(toks.slice(i, end).mkString(" "))
            i += 1
          }
          import scala.jdk.CollectionConverters._
          seen.iterator().asScala.map(DocTagGram(docId, tag, _))
        }
      }
    }.toDF()
  }

  /** Document fingerprint: minimum 60-bit hash over character 5-grams of
    * the lowercased text (the winnowing/rolling-hash family collapsed to
    * its min-sketch special case — deterministic and order-independent). */
  val fp5Spark: String =
    s"array_min(transform(sequence(1, greatest(length(lower(text)) - 4, 1)), i -> ${hash60Spark("substr(lower(text), i, 5)")}))"

  val fp5Duck: String =
    s"list_min([${hash60Duck("substr(lower(text), i, 5)")} for i in range(1, greatest(length(lower(text)) - 4, 1) + 1)])"

  /** MinHash signature: one md5-derived 60-bit base hash per shingle,
    * then numHashes universal-hash mixes h_j(x) = (a_j·x + b_j) mod p
    * over the 31-bit-truncated base (keeps every product within int64).
    * 16× fewer md5 evaluations than hashing "<j>|<shingle>" per function,
    * with the same independence properties. */
  val MinhashPrime = 2147483647L // 2^31 - 1 (Mersenne)

  def minhashSigSpark(numHashes: Int): String = {
    val base = s"transform(grams, s -> ${hash60Spark("s")} % 2147483648)"
    s"transform(sequence(0, ${numHashes - 1}), j -> array_min(transform($base, x -> (CAST(2654435761 AS BIGINT) * (j + 1) % $MinhashPrime * x + j * 40503 + 1) % $MinhashPrime)))"
  }

  def minhashSigDuck(numHashes: Int): String = {
    val base = s"list_transform(grams, s -> ${hash60Duck("s")} % 2147483648)"
    s"[list_min(list_transform($base, x -> (2654435761::BIGINT * (j + 1) % $MinhashPrime * x + j * 40503 + 1) % $MinhashPrime)) for j in range(0, $numHashes)]"
  }

  /** LSH band hash: md5 over the comma-joined signature slice [start..start+rows-1] (1-based). */
  def bandHashSpark(start: Int, rows: Int): String =
    s"md5(array_join(transform(slice(sig, $start, $rows), x -> CAST(x AS STRING)), ','))"

  def bandHashDuck(start: Int, rows: Int): String =
    s"md5(list_aggregate(list_transform(sig[$start:${start + rows - 1}], x -> x::VARCHAR), 'string_agg', ','))"

  /** 32-bit SimHash over the token multiset (unit weights): for each bit,
    * +1 if the token-hash has the bit set else -1; fingerprint bit = sign.
    * Token hashes (`th`) are computed once per token — the md5 must NOT
    * sit inside the 32-bit loop (32× the hashing cost). */
  val tokenHashesSpark: String =
    s"transform(toks, t -> ${hash60Spark("t")} % 4294967296)"

  val tokenHashesDuck: String =
    s"list_transform(toks, t -> ${hash60Duck("t")} % 4294967296)"

  /** Operates on a precomputed `th` array column (tokenHashes*). */
  val simhash32Spark: String =
    """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) -> acc +
      | CASE WHEN aggregate(th, 0, (a2, h) ->
      |   a2 + CASE WHEN (h DIV shiftleft(CAST(1 AS BIGINT), b)) % 2 = 1 THEN 1 ELSE -1 END) > 0
      | THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)"""
      .stripMargin.replace("\n", "")

  val simhash32Duck: String =
    """CAST(list_sum([CASE WHEN list_sum([
      | CASE WHEN (h // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END
      | for h in th]) > 0 THEN (1::BIGINT << b) ELSE 0 END for b in range(0, 32)]) AS BIGINT)"""
      .stripMargin.replace("\n", "")
}

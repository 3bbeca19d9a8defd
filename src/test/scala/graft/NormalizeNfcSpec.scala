package graft

/** The native codegen'd NFC normalizer: UAX#15 semantics against JDK
  * reference calls, null propagation, the zero-copy fast path, and an
  * actual WholeStageCodegen placement check. All non-ASCII content is
  * written as \\u escapes so the test is editor/encoding-proof. */
class NormalizeNfcSpec extends SparkSuite {

  // e + COMBINING ACUTE (decomposed) and the precomposed form.
  private val eDec = "e\u0301"
  private val ePre = "\u00e9"

  test("nfc_normalize recomposes, is idempotent, and codegens") {
    val r = spark.sql(
      s"SELECT nfc_normalize('${eDec}cole') AS a, nfc_normalize('plain') AS b, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS n, " +
        s"nfc_normalize(nfc_normalize('${eDec}cole')) AS idem").collect().head
    assert(r.getString(0) == s"${ePre}cole")
    assert(r.getString(0).length == 5)
    assert(r.getString(1) == "plain")
    assert(r.isNullAt(2))
    assert(r.getString(3) == s"${ePre}cole", "NFC must be idempotent")

    // Matches the JDK normalizer on a mixed sample (the oracle dual is
    // DuckDB's utf8proc — both implement UAX#15; this pins OUR kernel
    // to the JDK reference on non-trivial sequences).
    val samples = Seq(
      "A\u030aring",       // A + combining ring -> precomposed Aring
      "q\u0307\u0323",    // dot-above + dot-below: canonical reordering
      "d\u0323\u0307",    // underdot first: d-underdot recomposes, dot-above appended
      "\u1100\u1161",     // Hangul jamo pair: composes to a syllable
      "\uac00")            // already-composed Hangul syllable
    val got = spark.sql(
      samples.map(x => s"nfc_normalize('$x')").mkString("SELECT ", ", ", ""))
      .collect().head
    samples.zipWithIndex.foreach { case (x, i) =>
      val want = java.text.Normalizer.normalize(x, java.text.Normalizer.Form.NFC)
      assert(got.getString(i) == want, s"sample $i diverged from JDK NFC")
    }

    // Already-normalized input returns the SAME UTF8String (zero-copy
    // fast path — the overwhelmingly-common case on ASCII corpora).
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("ascii only")
    assert(graft.expressions.NormalizeNfc.nfc(in) eq in)

    // Must sit inside a WholeStageCodegen span.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val line = docs.selectExpr("nfc_normalize(text) AS c")
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Project")).getOrElse("")
    assert(line.trim.startsWith("*("),
      "nfc_normalize should run inside a WholeStageCodegen stage")
  }
}

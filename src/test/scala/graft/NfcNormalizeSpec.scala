package graft

import graft.functions.NfcNormalize
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def norm(s: String): String =
    NfcNormalize.normalize(UTF8String.fromString(s)).toString

  test("composition semantics: combining marks fold into precomposed forms") {
    assert(norm("e\u0301") == "\u00e9") // e + combining acute -> eacute
    assert(norm("A\u030a") == "\u00c5") // A + combining ring -> Aring
    assert(norm("\u00e9") == "\u00e9") // already composed: unchanged
    assert(norm("ascii only") == "ascii only")
    assert(norm("") == "")
    // NFC does NOT touch compatibility forms (that would be NFKC)
    assert(norm("\ufb01") == "\ufb01") // fi ligature stays
  }

  test("already-normalized fast path returns the input reference untouched") {
    val in = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.normalize(in) eq in)
  }

  test("codegen path through SQL agrees with the helper and is idempotent") {
    NfcNormalize.register(spark)
    val rows = Seq("e\u0301clair", "cafe\u0301", "A\u030angstro\u0308m", "plain")
    val got = rows.toDF("s")
      .selectExpr("s", "nfc_normalize(s) AS n", "nfc_normalize(nfc_normalize(s)) AS nn")
      .as[(String, String, String)].collect()
    got.foreach { case (s, n, nn) =>
      assert(n == norm(s))
      assert(nn == n) // idempotent
    }
    assert(got.map(_._2).toSeq ==
      Seq("\u00e9clair", "caf\u00e9", "\u00c5ngstr\u00f6m", "plain"))
  }
}

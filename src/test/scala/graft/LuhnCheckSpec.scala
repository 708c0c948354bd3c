package graft

import org.apache.spark.sql.functions._

import graft.functions.LuhnCheck
import graft.operators.TextAnalysis

class LuhnCheckSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("luhn_check semantics: checksum, length gate, formatting, junk") {
    assert(LuhnCheck.isValid("4539578763621486"))          // classic test PAN
    assert(LuhnCheck.isValid("4539 5787 6362 1486"))       // spaces ok
    assert(LuhnCheck.isValid("4539-5787-6362-1486"))       // hyphens ok
    assert(!LuhnCheck.isValid("4539578763621487"))         // bad check digit
    assert(!LuhnCheck.isValid("453957876362148"))          // 15 digits, sum off
    assert(!LuhnCheck.isValid("123456789012"))             // 12 digits: too short
    assert(!LuhnCheck.isValid("12345678901234567890"))     // 20 digits: too long
    assert(!LuhnCheck.isValid("4539x578763621486"))        // non-format char
    assert(!LuhnCheck.isValid(""))
    // the 1-in-10 property: exactly one check digit in 0..9 validates
    val hits = (0 to 9).count(d => LuhnCheck.isValid("453957876362148" + d))
    assert(hits == 1)
  }

  test("codegen and interpreted paths agree; SQL function registered") {
    LuhnCheck.register(spark)
    val df = Seq(
      "4539578763621486", "4539 5787 6362 1486", "4539578763621487",
      "not a number", "4100003703703673"
    ).toDF("s")
    val viaSql = df.selectExpr("s", "luhn_check(s) AS v").as[(String, Boolean)]
      .collect().toMap
    assert(viaSql("4539578763621486") && viaSql("4539 5787 6362 1486") &&
      viaSql("4100003703703673"))
    assert(!viaSql("4539578763621487") && !viaSql("not a number"))
    // interpreted (eval) path = the same static helper
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(
        LuhnCheck(org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
          .eval(null) == LuhnCheck.isValid(s))
    }
  }

  test("redactCards masks only Luhn-valid runs") {
    val docs = Seq(
      (1L, "pay with 4539578763621486 now"),            // valid -> masked
      (2L, "invoice 4539578763621487 pending"),         // bad checksum -> kept
      (3L, "ts 1755264000000000 and id 123"),            // 16-digit non-card -> Luhn decides
      (4L, "two: 4100003703703673 and 4200004938271568") // both masked
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactCards(docs, "doc_id", "text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, "pay with [CARD] now")))
    assert(got(2L) == ((0L, "invoice 4539578763621487 pending")))
    assert(got(4L) == ((2L, "two: [CARD] and [CARD]")))
    // row 3: whatever Luhn says, it is consistent with the scalar check
    val ts = "1755264000000000"
    assert(got(3L)._1 == (if (LuhnCheck.isValid(ts)) 1L else 0L))
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("occurrences: replace-counting, non-overlapping left-to-right") {
    val df = one(" the cat the dog the ")
    assert(df.select(TextFunctions.occurrences(col("text"), " the ")).head.getLong(0) == 3L)
    // directly adjacent repeats share a space -> only the first counts
    val adj = one(" the the ")
    assert(adj.select(TextFunctions.occurrences(col("text"), " the ")).head.getLong(0) == 1L)
  }

  test("stopwordHits counts tokens, including adjacent repeats") {
    val df = one("the the cat of")
    assert(df.select(TextFunctions.stopwordHits(col("text"), "en")).head.getLong(0) == 3L)
    assert(one("").select(TextFunctions.stopwordHits(col("text"), "en")).head.getLong(0) == 0L)
  }

  test("langId picks the language with most stopword hits; und when none") {
    assert(one("the cat and a dog is here")
      .select(TextFunctions.langId(col("text"))).head.getString(0) == "en")
    assert(one("la casa y el perro es grande")
      .select(TextFunctions.langId(col("text"))).head.getString(0) == "es")
    assert(one("qwerty zxcvb")
      .select(TextFunctions.langId(col("text"))).head.getString(0) == "und")
  }

  test("fingerprint is order- and duplicate-invariant over words") {
    val a = one("b a c a").select(TextFunctions.fingerprint(col("text"))).head.getString(0)
    val b = one("c b a").select(TextFunctions.fingerprint(col("text"))).head.getString(0)
    assert(a == b)
  }

  test("dupNgramFrac counts repeated 3-gram occurrences; short docs get 0") {
    // "a b c a b c": 4 trigram occurrences ("a b c","b c a","c a b","a b c"),
    // 3 distinct -> 1 - 3/4 = 0.25
    assert(one("a b c a b c")
      .select(TextFunctions.dupNgramFrac(col("text"))).head.getDouble(0) == 0.25)
    assert(one("a b")
      .select(TextFunctions.dupNgramFrac(col("text"))).head.getDouble(0) == 0.0)
  }

  test("meanWordLen averages characters per token") {
    assert(one("ab cdef")
      .select(TextFunctions.meanWordLen(col("text"))).head.getDouble(0) == 3.0)
    assert(one("")
      .select(TextFunctions.meanWordLen(col("text"))).head.getDouble(0) == 0.0)
  }

  test("rolling-hash fingerprint: shared substrings can share the min; short docs get 0") {
    // reference value computed directly: min over windows of the polynomial hash
    def direct(s: String, w: Int = 8, b: Long = 257L): Long =
      if (s.length < w) 0L
      else (0 to s.length - w).map { i =>
        s.substring(i, i + w).foldLeft(0L)((h, c) => (h * b + c) & 0xFFFFFFFFL)
      }.min
    val texts = Seq("the quick brown fox jumps", "ab", "xyxyxyxyxyxyxy")
    texts.foreach { t =>
      val got = one(t).select(TextFunctions.rollingFingerprint(col("text"))).head.getLong(0)
      assert(got == direct(t), t)
    }
    // appending unrelated text far from the min leaves the fingerprint intact
    val base = "a shared very long common prefix here"
    val a = one(base).select(TextFunctions.rollingFingerprint(col("text"))).head.getLong(0)
    val b = one(base + " zzz unrelated suffix").select(TextFunctions.rollingFingerprint(col("text"))).head.getLong(0)
    assert(b <= a) // min can only stay or drop when text grows
  }

  test("redact masks emails, IPv4s, phones, then digit runs — in that order") {
    val s = "mail bob.smith+x@corp.example.org from 10.0.0.255 call 555-867-5309 ref 42"
    val out = one(s).select(TextFunctions.redact(col("text"))).head.getString(0)
    assert(out == "mail [EMAIL] from [IP] call [PHONE] ref #", out)
    // order matters: the email's digits survive as part of [EMAIL], the IP's
    // dotted quads are not re-mangled by the phone/digit tiers
    val noDigits = one(s).select(TextFunctions.redact(col("text"), maskDigits = false))
      .head.getString(0)
    assert(noDigits == "mail [EMAIL] from [IP] call [PHONE] ref 42", noDigits)
    // non-PII text passes through untouched
    val plain = "no sensitive content here"
    assert(one(plain).select(TextFunctions.redact(col("text"))).head.getString(0) == plain)
  }

  test("quality score is bounded in [0,1]") {
    val q = one("the a of and is " * 30)
      .select(TextFunctions.qualityScore(col("text"))).head.getDouble(0)
    assert(q >= 0.0 && q <= 1.0)
  }
}

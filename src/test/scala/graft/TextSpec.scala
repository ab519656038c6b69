package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** Text-analysis function semantics. */
class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("text").select(c.as("out")).first()

  test("bpe-ish tokenizer splits words and symbols") {
    val out = one(TextFns.bpeTokens(col("text")), "hello, world! x2")
      .getSeq[String](0)
    assert(out == Seq("hello", ",", "world", "!", "x2"))
  }

  test("shingles produce n-gram windows; short docs collapse to one") {
    val s3 = one(TextFns.shingles(TextFns.tokens(col("text"))), "a b c d")
      .getSeq[String](0)
    assert(s3 == Seq("a b c", "b c d"))
    val short = one(TextFns.shingles(TextFns.tokens(col("text"))), "a b")
      .getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("rolling hash is order-sensitive; bow fingerprint is not") {
    val rh1 = one(TextFns.rollingHash(TextFns.tokens(col("text"))), "a b c").getLong(0)
    val rh2 = one(TextFns.rollingHash(TextFns.tokens(col("text"))), "c b a").getLong(0)
    assert(rh1 != rh2)
    val fp1 = one(TextFns.bowFingerprint(col("text")), "a b c").getString(0)
    val fp2 = one(TextFns.bowFingerprint(col("text")), "c b a").getString(0)
    assert(fp1 == fp2)
  }

  test("language-ID picks the profile with most stopword hits") {
    assert(one(TextFns.langId(TextFns.tokens(col("text"))),
      "der hund und die katze ist da").getString(0) == "de")
    assert(one(TextFns.langId(TextFns.tokens(col("text"))),
      "the cat and the dog is a pet").getString(0) == "en")
    assert(one(TextFns.langId(TextFns.tokens(col("text"))),
      "xyzzy plugh").getString(0) == "und")
  }
}

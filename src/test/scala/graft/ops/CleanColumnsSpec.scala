package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D5 clean_dict behavior
  * (`/root/reference/tests/test_data_structures.py:999-1280`).
  */
class CleanColumnsSpec extends SparkSpec {
  import spark.implicits._
  import CleanColumns._

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def base = Seq(("alex", "a@x.io", 42L)).toDF("name", "email", "n")

  test("replace mode substitutes the marker") {
    val out = CleanColumns(Seq("name"), Replace)(base)
    assert(out.head() == Row("replaced (etl)", "a@x.io", 42L))
  }

  test("hash mode = sha256 hex of utf-8 bytes (exact reference parity)") {
    val out = CleanColumns(Seq("name", "email"), Hash)(base)
    assert(out.head() == Row(sha("alex"), sha("a@x.io"), 42L))
  }

  test("empty mode nulls; delete mode drops the column") {
    assert(CleanColumns(Seq("email"), Empty)(base).head() == Row("alex", null, 42L))
    assert(CleanColumns(Seq("email"), Delete)(base).columns.toSeq == Seq("name", "n"))
  }

  test("farm_fingerprint mode yields a stable 64-bit fingerprint") {
    val a = CleanColumns(Seq("name"), FarmFingerprint)(base).head().getString(0)
    val b = CleanColumns(Seq("name"), FarmFingerprint)(base).head().getString(0)
    assert(a == b && a.matches("-?[0-9]+"))
  }

  test("empty values under targeted keys are left unchanged") {
    val d = Seq(("", "x")).toDF("name", "other")
      .withColumn("none_col", lit(null).cast("string"))
    val out = CleanColumns(Seq("name", "none_col"), Hash)(d)
    assert(out.head() == Row("", "x", null))
  }

  test("skip rules: suffix keeps matching values") {
    val d = Seq(("u1@corp.com", "u2@ext.io")).toDF("a", "b")
    val out = CleanColumns(Seq("a", "b"), Replace,
      skipRules = Map(
        "a" -> Seq(Suffix("@corp.com")),
        "b" -> Seq(Suffix("@corp.com"))))(d)
    assert(out.head() == Row("u1@corp.com", "replaced (etl)"))
  }

  test("skip rules: prefix, equals, regex, predicate") {
    val d = Seq(("allow-1", "keepme", "x@partners.net", "long-secret")).toDF("p", "e", "r", "c")
    val out = CleanColumns(Seq("p", "e", "r", "c"), Replace,
      skipRules = Map(
        "p" -> Seq(Prefix("allow-")),
        "e" -> Seq(Equals("keepme")),
        "r" -> Seq(Regex("@partners\\.(com|net)$")),
        "c" -> Seq(Pred(c => length(c) < 5))))(d)
    assert(out.head() == Row("allow-1", "keepme", "x@partners.net", "replaced (etl)"))
  }

  test("truncate_strings caps all strings with the suffix, nested included") {
    val d = Seq(1).toDF("i").select(
      lit("abcdefghij").as("long"),
      struct(lit("0123456789x").as("inner")).as("s"),
      array(lit("shrt"), lit("0123456789ab")).as("arr"))
    val out = CleanColumns(Nil, Replace, truncateStrings = Some(6))(d)
    assert(out.head() == Row(
      "abcdef… truncated (etl)",
      Row("012345… truncated (etl)"),
      Seq("shrt", "012345… truncated (etl)")))
  }

  test("nested targeted keys cleaned at any depth") {
    val d = Seq(1).toDF("i").select(
      struct(lit("secret").as("token"), lit("ok").as("note")).as("meta"))
    val out = CleanColumns(Seq("token"), Hash)(d)
    assert(out.head() == Row(Row(sha("secret"), "ok")))
  }

  test("non-string hash uses string rendering of the value") {
    val out = CleanColumns(Seq("n"), Hash)(base)
    assert(out.head().getString(2) == sha("42"))
  }
}

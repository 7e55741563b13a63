package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlCanon

/** Edge cases the planted corpus can't cover: http default port, utm-only
  * query, root/empty path, fragment before query stripping, non-default
  * port preserved, param sorting stability. */
class UrlCanonSpec extends AnyFunSuite {
  import SparkTest._

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    urls.toDF("u")
      .select(UrlCanon.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
  }

  test("default ports drop scheme-appropriately; others survive") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:8443/x") === Seq(
      "http://a.com/x", "https://a.com/x",
      // :443 is NOT http's default port — it is real identity
      "http://a.com:443/x", "https://a.com:8443/x"))
  }

  test("utm-only query loses the '?'; params sort; fragment dies first") {
    assert(canon(
      "https://a.com/x?utm_campaign=c&utm_source=s",
      "https://a.com/x?z=1&y=2&x=3",
      "https://a.com/x?b=2#frag?a=1") === Seq(
      "https://a.com/x",
      "https://a.com/x?x=3&y=2&z=1",
      // everything after '#' is fragment, including a literal '?'
      "https://a.com/x?b=2"))
  }

  test("path normalization: empty → '/', root kept, one trailing slash folds") {
    assert(canon(
      "https://A.com", "https://a.com/", "https://a.com/p/",
      "https://a.com/p") === Seq(
      "https://a.com/", "https://a.com/", "https://a.com/p",
      "https://a.com/p"))
  }
}

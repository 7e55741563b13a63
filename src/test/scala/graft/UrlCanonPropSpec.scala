package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlCanon

/** Property tests for URL canonicalization (raw ScalaCheck Gen with
  * fixed seeds, as in ApplyPropertySpec):
  *  - IDEMPOTENCE: canon(canon(u)) == canon(u) — a canonicalizer that
  *    keeps rewriting its own output would split dedup groups between
  *    a first-pass and a re-ingested corpus;
  *  - DECORATION INVARIANCE: every decorated spelling of a URL (case,
  *    default port, fragment, utm keys, param order, trailing slash)
  *    canonicalizes to the plain form's canonical.
  */
class UrlCanonPropSpec extends AnyFunSuite {
  import SparkTest._

  private val hostGen = Gen.oneOf("a.com", "Sub.Host.ORG", "x-y.net")
  private val pathGen =
    Gen.oneOf("", "/", "//", "///", "/p", "/p/", "/p//", "/p/q", "/p/q/", "/p//q//")
  private val paramGen = Gen.oneOf("a=1", "b=2", "zz=9", "utm_source=s",
    "utm_medium=m", "k=v%20w")
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "Http")
    host <- hostGen
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- pathGen
    params <- Gen.listOfN(3, paramGen)
    frag <- Gen.oneOf("", "#f", "#a?b=1")
    q = if (params.isEmpty) "" else "?" + params.mkString("&")
  } yield s"$scheme://$host$port$path$q$frag"

  private def canonOf(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    urls.toDF("u").select(UrlCanon.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
  }

  test("canonicalize is idempotent over generated URLs") {
    val urls = (1 to 200).flatMap(seed =>
      urlGen.apply(Gen.Parameters.default, Seed(seed.toLong)))
    val once = canonOf(urls)
    val twice = canonOf(once)
    val diffs = urls.lazyZip(once).lazyZip(twice)
      .filter((_, c1, c2) => c1 != c2)
    assert(diffs.isEmpty, s"non-idempotent: ${diffs.take(5)}")
  }

  test("all decorations of one resource share the plain form's canonical") {
    val plain = "https://sub.host.org/p/q?a=1&b=2"
    val decorated = Seq(
      "HTTPS://Sub.Host.ORG/p/q?b=2&a=1",
      "https://sub.host.org:443/p/q?a=1&b=2#frag",
      "https://sub.host.org/p/q/?utm_source=x&b=2&a=1",
      "https://SUB.HOST.ORG:443/p/q/?b=2&utm_medium=m&a=1#a?c=3")
    val Seq(want) = canonOf(Seq(plain))
    val got = canonOf(decorated)
    assert(got.forall(_ == want), s"want $want, got $got")
  }
}

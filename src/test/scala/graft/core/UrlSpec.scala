package graft.core

import graft.ops.UrlOps
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.urlNormalize(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("urlNormalize: case, ports, fragments, tracking params, slashes") {
    assert(norm("HTTPS://WWW.Example.COM:443/Path/?utm_source=f&id=3&fbclid=x#frag")
      == Seq("https://www.example.com/Path?id=3"))
    // path/query case preserved, scheme/host lowered
    assert(norm("HTTP://HOST.ORG/CaseD?Q=UpPer") == Seq("http://host.org/CaseD?Q=UpPer"))
    // default port only for the matching scheme; other ports survive
    assert(norm("http://a.com:80/x", "https://a.com:80/x", "http://a.com:8080/x")
      == Seq("http://a.com/x", "https://a.com:80/x", "http://a.com:8080/x"))
    // param ORDER kept; bare tracking name dropped; ref= dropped
    assert(norm("https://a.com/p?b=2&utm_x&a=1&ref=tw")
      == Seq("https://a.com/p?b=2&a=1"))
    // emptied query loses the '?'; root slash drops; multi-slash tail drops
    assert(norm("https://a.com/?utm_only=1", "https://a.com/", "https://a.com/x//")
      == Seq("https://a.com", "https://a.com", "https://a.com/x"))
    // non-URLs pass through untouched
    assert(norm("not a url 7", "") == Seq("not a url 7", ""))
  }

  test("registeredDomain: two labels, multi-part suffixes, short hosts") {
    val hosts = Seq("www.example.co.uk", "a.b.example.com", "example.org",
      "localhost", "co.uk", "deep.sub.site.com.au")
    val out = hosts.toDF("h").select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("example.co.uk", "example.com", "example.org",
      "localhost", "co.uk", "site.com.au"))
  }

  test("urlNormalize is idempotent on randomized messy URLs") {
    val rnd = new scala.util.Random(83)
    val schemes = Seq("http", "HTTPS", "ftp", "Http")
    val hosts = Seq("WWW.Example.COM", "a.b.co.uk", "X.org:8080",
      "site.com:80", "s.net:443", "localhost")
    val paths = Seq("", "/", "/A/b", "/a/b/", "/x//", "/p%20q")
    val queries = Seq("", "?utm_a=1", "?a=1&utm_b=2&c=3", "?ref=x", "?a=%3D&b=2")
    val frags = Seq("", "#f", "#a?b=1")
    val urls = (1 to 200).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + "://" +
        hosts(rnd.nextInt(hosts.size)) + paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) + frags(rnd.nextInt(frags.size))
    } ++ Seq("no scheme here", "", "weird:///x")
    val df = urls.toDF("u")
    val once = df.select(UrlOps.urlNormalize(col("u")).as("n1"))
    val twice = once.select(col("n1"), UrlOps.urlNormalize(col("n1")).as("n2"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"not a fixpoint: '${r.getString(0)}' -> '${r.getString(1)}'")
    }
  }

  test("capPerDomain: bounded per domain, deterministic, partition-invariant") {
    val df = (1L to 300L).map { i =>
      (i, s"https://site${i % 3}.example.com/page/$i")
    }.toDF("id", "url")
    val capped = UrlOps.capPerDomain(df, "id", "url", n = 4, salt = "t")
    // all three sites share the registered domain example.com
    assert(capped.count() == 4)
    val a = capped.select("id").as[Long].collect().toSet
    val b = UrlOps.capPerDomain(df.repartition(13), "id", "url", 4, "t")
      .select("id").as[Long].collect().toSet
    assert(a == b, "survivors must not depend on partitioning")
    // distinct domains each get their own quota
    val two = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) s"https://x.com/$i" else s"https://y.org/$i"))
      .toDF("id", "url")
    val counts = UrlOps.capPerDomain(two, "id", "url", 10, "t")
      .groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("x.com" -> 10L, "y.org" -> 10L))
  }
}

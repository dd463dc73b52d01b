package graft.operators

import graft.SparkSpec

/** q68 PII/URL scrubbing: the sf fixtures contain neither pattern (the
  * oracle pins the identity pass), so the redaction semantics are driven
  * here by planting real addresses and URLs through the same `piiScrub`
  * body the query uses.
  */
class TextOpsScrubSpec extends SparkSpec {

  test("piiScrub redacts planted emails and URLs and counts each kind") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "contact me at alice@example.com or visit https://foo.bar/baz today"),
      (2L, "two mails a@b.co and c.d+x@e.org then one link http://x.y/z"),
      (3L, "plain text with no sensitive tokens at all"),
      // an email-shaped substring INSIDE a URL: the address is a URL
      // component, the whole token redacts to <URL>, and the counts must
      // reconcile with clean_text (no phantom email count)
      (4L, "see https://site.com/unsubscribe?u=bob@example.com now")
    ).toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("contact me at <EMAIL> or visit <URL> today", 1L, 1L)))
    assert(out(2L) === (("two mails <EMAIL> and <EMAIL> then one link <URL>", 2L, 1L)))
    assert(out(3L) === (("plain text with no sensitive tokens at all", 0L, 0L)))
    assert(out(4L) === (("see <URL> now", 0L, 1L)))
    // counts always reconcile against the output markers
    out.values.foreach { case (clean, ne, nu) =>
      assert("<EMAIL>".r.findAllIn(clean).length.toLong === ne)
      assert("<URL>".r.findAllIn(clean).length.toLong === nu)
    }
  }

  test("q68 on the fixture corpus is a pure pass-through") {
    val d = "/root/testdata/sf0.001"
    val out = TextOps.queries("q68_pii_scrub")(spark, d).collect()
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(1) === texts(r.getLong(0)), "text altered")
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L, "phantom redaction")
    }
  }
}

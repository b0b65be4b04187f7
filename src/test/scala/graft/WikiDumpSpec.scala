package graft

import org.apache.spark.sql.functions._
import graft.wiki.WikiDump

/** L6 dump distillation (`wiki/WikipediaInterface.scala:24-135`): the
  * synthetic markup corpus parses into the four DBs with redirect targets
  * fully resolved, and the distilled dictionary drives the linking path. */
class WikiDumpSpec extends SparkSuite {

  lazy val dump = WikiDump.synthDump(spark, "/root/testdata/sf0.001").cache()

  test("title-given-surface resolves every redirect hop") {
    val tgs = WikiDump.titleGivenSurface(dump).cache()
    // customer-name anchors always land on the canonical Customer_<k> page,
    // never a Cust_<k> redirect source — even for the %7 rows routed
    // through #REDIRECT
    assert(tgs.filter(col("title").startsWith("Cust_")).count() == 0)
    val named = tgs.filter(col("surface").startsWith("customer#"))
    assert(named.count() > 0)
    assert(named.filter(!col("title").startsWith("Customer_")).count() == 0)
    // bare [[Customer_N]] anchors default their surface to the target text
    assert(tgs.filter(col("surface") === "customer_3" &&
      col("title") === "Customer_3").count() == 1)
    tgs.unpersist()
  }

  test("dump stats pin redirects, categories, links, disambig") {
    val stats = WikiDump.dumpStats(dump).cache()
    val red = stats.filter(col("title").startsWith("Cust_"))
    assert(red.count() > 0)
    // redirect pages carry their target and contribute no links/categories
    assert(red.filter(col("redirect_to") === "" || col("n_links") =!= 0 ||
      col("n_categories") =!= 0).count() == 0)
    val disambig = stats.filter(col("is_disambig") === 1)
    assert(disambig.count() > 0)
    assert(disambig.filter(!col("title").endsWith(" (disambiguation)")).count() == 0)
    // every article page has exactly one category tag and ≥ 2 out-links
    val articles = stats.filter(col("title").startsWith("Customer_"))
    assert(articles.filter(col("n_categories") =!= 1).count() == 0)
    assert(articles.filter(col("n_links") < 2).count() == 0)
    stats.unpersist()
  }

  test("MediaWiki redirect rule is case-insensitive and whitespace-tolerant; " +
      "mid-text #REDIRECT is not a redirect") {
    import spark.implicits._
    val d = Seq(
      ("A", "#redirect [[Target]]"),
      ("B", "  #Redirect [[Target]]"),
      ("C", "#REDIRECT [[Target]]"),
      ("D", "an article that MENTIONS #REDIRECT mid-text. [[Other]]"))
      .toDF("title", "text")
    val r = WikiDump.redirects(d).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(r === Set(("A", "Target"), ("B", "Target"), ("C", "Target")),
      s"lowercase/whitespace redirects must classify as redirects: $r")
    // redirect stanzas are not content anchors; the mid-text mention's page is
    val a = WikiDump.anchors(d).select("from_title").distinct().collect()
      .map(_.getString(0)).toSet
    assert(a === Set("D"), s"only the article page contributes anchors: $a")
  }

  test("distilled dictionary drives Linking.link end-to-end") {
    val mentions = harness.Queries.pipeline(spark, "/root/testdata/sf0.001").mentions
    val links = graft.linking.Linking.link(mentions,
      WikiDump.titleGivenSurface(dump), WikiDump.redirects(dump))
    assert(links.count() > 0)
    assert(links.filter(col("title").startsWith("Cust_")).count() == 0)
  }
}

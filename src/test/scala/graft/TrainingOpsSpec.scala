package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** New training-pipeline operators: PII scrub, sequence packing,
  * substring-duplication coverage. Each also has a DuckDB oracle row
  * (pii_scrub / pack_sequences / dedup_span_coverage); these tests pin
  * the operator-level invariants the oracle cannot express. */
class TrainingOpsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  // ---- PII ----

  test("pii: plants are detected by type, redacted text carries no " +
       "residual match") {
    val rows = Seq(
      (1L, "write me at a.b+c@sub.example.org today"),
      (2L, "server 192.168.0.17 answered"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "a.b+c@x.io and 10.0.0.1 and +44 (020) 555-0199"),
      (5L, "nothing here"),
      (6L, "almost an ip 1.2.3 and almost a mail a@b")
    ).toDF("doc_id", "text")
    val out = Pii.scrub(rows, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Int]("n_email") == 1)
    assert(out(2L).getAs[Int]("n_ipv4") == 1)
    assert(out(3L).getAs[Int]("n_phone") == 1)
    assert(out(4L).getAs[Int]("n_pii") == 3)
    assert(out(5L).getAs[Int]("n_pii") == 0 &&
      !out(5L).getAs[Boolean]("is_dirty"))
    assert(out(6L).getAs[Int]("n_pii") == 0)
    assert(out(4L).getAs[String]("clean_text") ==
      "<EMAIL> and <IP> and <PHONE>")
    // no pattern matches anything in any scrubbed output
    val clean = Pii.scrub(rows, "doc_id", "text")
      .select(col("clean_text").as("text"), col("id").as("doc_id"))
    val rescrub = Pii.scrub(clean, "doc_id", "text").collect()
    assert(rescrub.forall(_.getAs[Int]("n_pii") == 0))
  }

  test("pii: report aggregates totals and dirty-doc counts") {
    val rows = Seq(
      (1L, "a@b.co and c@d.io"), (2L, "10.0.0.1"), (3L, "clean")
    ).toDF("doc_id", "text")
    val r = Pii.report(rows, "doc_id", "text").collect().head
    assert(r.getAs[Long]("total_email") == 2L)
    assert(r.getAs[Long]("docs_email") == 1L)
    assert(r.getAs[Long]("total_ipv4") == 1L)
    assert(r.getAs[Long]("docs_dirty") == 2L)
  }

  // ---- packing ----

  test("packing: every token packed exactly once, sequences full " +
       "except each shard's last") {
    val packed = Packing.packSequences(docs, "doc_id", "text",
      seqLen = 64, nShards = 4).cache()
    val nTokens = docs.select(sum(size(split(col("text"), " "))))
      .as[Long].head()
    // total slice tokens == total corpus tokens (nothing lost/dup'd)
    assert(packed.select(sum("n_toks")).as[Long].head() == nTokens)
    // slices of one doc are disjoint and contiguous from 0..n_tok
    val perDoc = packed.groupBy("id").agg(
      sum("n_toks").as("tot"), min("tok_start").as("lo"))
      .join(docs.select(col("doc_id").as("id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")), "id")
    assert(perDoc.where(col("tot") =!= col("n_tok") ||
      col("lo") =!= 0L).isEmpty)
    // every sequence except each shard's max seq_id holds exactly 64
    val seqTot = packed.groupBy("shard", "seq_id")
      .agg(sum("n_toks").as("seq_tok"))
    val lastSeq = seqTot.groupBy("shard")
      .agg(max("seq_id").as("last_id"))
    assert(seqTot.join(lastSeq, "shard")
      .where(col("seq_id") =!= col("last_id") &&
        col("seq_tok") =!= 64L).isEmpty)
    // slice offsets tile each sequence: min seq_off = 0, slices abut
    val bad = packed.withColumn("next_off",
        lead(col("seq_off"), 1).over(org.apache.spark.sql.expressions
          .Window.partitionBy("shard", "seq_id").orderBy("seq_off")))
      .where(col("next_off").isNotNull &&
        col("next_off") =!= col("seq_off") + col("n_toks"))
    assert(bad.isEmpty)
    packed.unpersist()
  }

  test("packing: default hashed shard map keeps the same invariants") {
    // limit() alone is nondeterministic across actions on a multi-
    // partition input — pin the subset with a filter instead
    val sub = docs.where(col("doc_id") < 200)
    val packed = Packing.packSequences(sub, "doc_id",
      "text", seqLen = 128, nShards = 4)
    val nTokens = sub
      .select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(packed.select(sum("n_toks")).as[Long].head() == nTokens)
    assert(packed.select(countDistinct("shard")).as[Long].head() > 1L)
  }

  // ---- substring duplication coverage ----

  test("span coverage: hand-computed interval union") {
    // doc 1 and 2 share the 4-gram "a b c d" (pos 0 and pos 1); doc 1
    // also repeats it internally at pos 4 (overlapping coverage)
    val rows = Seq(
      (1L, "a b c d a b c d x"), // dup 4-grams at 0,4 (+1? "b c d a" also x2)
      (2L, "z a b c d y q r s"), // dup at pos 1
      (3L, "entirely unique words only here now ok fine")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanCoverage(rows, "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // doc1: "a b c d" at 0 and 4; "b c d a" at 1; "c d a b" at 2;
    // "d a b c" at 3 occur once each within doc1... but "a b c d" twice
    // + shared with doc2 → dup starts {0,4}; union covers [0,4)+[4,8)=8
    assert(out(1L).getAs[Long]("covered_tokens") == 8L)
    assert(out(1L).getAs[Double]("dup_coverage") == 0.8889)
    assert(out(2L).getAs[Long]("covered_tokens") == 4L)
    assert(out(3L).getAs[Long]("covered_tokens") == 0L)
    assert(out(3L).getAs[Double]("dup_coverage") == 0.0)
  }

  test("span coverage: hashed-gram path ≡ exact strings on real docs") {
    val exact = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", 8)
      .orderBy("id").collect()
    val hashed = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", 8,
      hashGrams = true).orderBy("id").collect()
    assert(exact.sameElements(hashed))
    // the sf corpus has near-dups → some doc has nonzero coverage
    assert(exact.exists(_.getAs[Long]("covered_tokens") > 0L))
  }

  // ---- tf-idf ----

  test("tfidf: hand-computed scores, rank order, corpus-wide term drop") {
    val rows = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple date date date")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(rows, "doc_id", "text", k = 2,
      nDocs = 3L).collect()
      .groupBy(_.getAs[Long]("id")).view.mapValues(
        _.sortBy(_.getAs[Int]("term_rank"))).toMap
    // doc1: apple tf=2 df=2 → 2*ln(1.5)=0.8109; banana tf=1 df=2 →
    // 0.4055; cherry tf=1 df=2 → 0.4055 (banana wins tie by term asc)
    assert(out(1L)(0).getAs[String]("term") == "apple")
    assert(out(1L)(0).getAs[Double]("tfidf") == 0.8109)
    assert(out(1L)(1).getAs[String]("term") == "banana")
    // doc3: date tf=3 df=2 → 1.2164 beats apple 0.4055
    assert(out(3L)(0).getAs[String]("term") == "date")
    assert(out(3L)(0).getAs[Double]("tfidf") == 1.2164)
    // a term present in EVERY doc scores ln(1)=0 — never outranks
    val rows2 = Seq((1L, "the cat"), (2L, "the dog")).toDF("doc_id",
      "text")
    val o2 = TextAnalysis.tfidfTopK(rows2, "doc_id", "text", 1, 2L)
      .collect()
    assert(o2.forall(_.getAs[String]("term") != "the"))
  }

  test("tfidf: bounded aggregate ≡ rank window on the real corpus " +
       "for every k") {
    // rebuild the window form the aggregate replaced and compare
    // row-for-row on sf0.001 documents (ties abound: word-salad text
    // gives many equal (tf, df) pairs per doc)
    val n = docs.count()
    val tf = docs.select(col("doc_id").as("id"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf", round(col("tf") *
        log(lit(n.toDouble) / col("df")), 4))
    for (k <- Seq(1, 5)) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
        .orderBy(col("tfidf").desc, col("term"))
      val viaWindow = scored
        .withColumn("term_rank", row_number().over(w))
        .where(col("term_rank") <= k)
        .select("id", "term_rank", "term", "tf", "df", "tfidf")
        .orderBy("id", "term_rank").collect().toSeq
      val viaAgg = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k, n)
        .orderBy("id", "term_rank").collect().toSeq
      assert(viaAgg == viaWindow, s"k=$k diverged from the window form")
    }
  }

  test("TermCounts expression ≡ explode+groupBy term frequencies " +
       "(empty tokens, repeats, leading/trailing spaces, null)") {
    import spark.implicits._
    // split(text, ' ') keeps empty tokens (limit -1) — the compiled
    // expression must reproduce them; the real-corpus pin is the
    // aggregate≡window test above, which rebuilds TF the old way
    val rows = Seq(
      (1L, "a b a  b c"), // double space -> empty token
      (2L, " x"), (3L, "x "), (4L, ""), (5L, "t t t t"))
      .toDF("doc_id", "text")
    val viaExpr = rows.select(col("doc_id").as("id"),
        explode(graft.functions.TermCounts.termCounts(col("text")))
          .as("tc"))
      .select(col("id"), col("tc.term"), col("tc.tf"))
      .orderBy("id", "term").collect().toSeq
    val viaGroup = rows.select(col("doc_id").as("id"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .orderBy("id", "term").collect().toSeq
    assert(viaExpr == viaGroup)
    // null text yields null (explode drops it, like the split form)
    val withNull = Seq((9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(withNull.select(explode(
        graft.functions.TermCounts.termCounts(col("text"))))
      .count() == 0L)
  }

  // ---- URL normalization ----

  test("url normalization: case, default ports, utm runs, fragment, " +
       "trailing slash, malformed passthrough") {
    val rows = Seq(
      (1L, "HTTPS://WWW.Ex.COM:443/A/B/?utm_source=x&utm_campaign=y&q=2#top"),
      (2L, "http://h.org:80/p/"),
      (3L, "http://h.org:8080/p"),
      (4L, "https://a.b.c.net/x?a=1&utm_x=2&b=3"),
      (5L, "not a url"),
      (6L, "http://Host.COM/?utm_a=1"),
      (7L, "http://m.com/x?utm_a=1&k=2&utm_b=3&j=4")
    ).toDF("doc_id", "url")
    val out = UrlNorm.normalize(rows, "doc_id", "url").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("url_norm") ==
      "https://www.ex.com/A/B/?q=2") // path case kept, port+utm+frag gone
    assert(out(2L).getAs[String]("url_norm") == "http://h.org/p")
    assert(out(3L).getAs[String]("url_norm") == "http://h.org:8080/p")
    assert(out(4L).getAs[String]("url_norm") ==
      "https://a.b.c.net/x?a=1&b=3") // mid-query utm keeps neighbors
    assert(out(4L).getAs[String]("host") == "a.b.c.net")
    assert(out(4L).getAs[String]("domain") == "c.net")
    assert(out(5L).getAs[String]("url_norm") == "not a url")
    assert(out(5L).getAs[String]("host") == "")
    assert(out(6L).getAs[String]("url_norm") == "http://host.com/")
    // two utm runs split by non-utm params — global replace in both
    // engines (DuckDB needs the explicit 'g' flag)
    assert(out(7L).getAs[String]("url_norm") ==
      "http://m.com/x?k=2&j=4")
    // normalization is idempotent
    val renorm = UrlNorm.normalize(
      UrlNorm.normalize(rows, "doc_id", "url")
        .select(col("id").as("doc_id"), col("url_norm").as("url")),
      "doc_id", "url").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("url_norm"),
        r.getAs[String]("url"))).toSeq
    assert(renorm.forall { case (_, n, u) => n == u })
  }

  test("url normalize: caller column names other than 'url' resolve " +
      "(the chain is built AFTER the rename); default port collapses " +
      "before a query with empty path; scheme-less rows are untouched " +
      "by EVERY step") {
    val rows = Seq(
      (1L, "http://h.org:80?a=1"),         // port directly before query
      (2L, "https://h.org:443?a=1"),
      (3L, "http://h.org:80"),             // port at end of string
      (4L, "not a url #x"),                // scheme-less: fragment kept
      (5L, "plain?utm_a=1&b=2")            // scheme-less: utm kept
    ).toDF("the_doc", "page_url")          // non-default column names
    val out = UrlNorm.normalize(rows, "the_doc", "page_url").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("url_norm")).toMap
    assert(out(1L) == "http://h.org?a=1")
    assert(out(2L) == "https://h.org?a=1")
    assert(out(3L) == "http://h.org")
    assert(out(4L) == "not a url #x")
    assert(out(5L) == "plain?utm_a=1&b=2")
    // the cross-engine shared-constants check lives in the driver
    // oracle (urlNormSql); here pin idempotency over the new cases
    val renorm = UrlNorm.normalize(
      UrlNorm.normalize(rows, "the_doc", "page_url")
        .select(col("id").as("d"), col("url_norm").as("u")), "d", "u")
      .collect().map(r => (r.getAs[String]("url_norm"),
        r.getAs[String]("url")))
    assert(renorm.forall { case (n, u) => n == u })
  }

  test("url dedup: normalization groups raw-distinct twins") {
    val rows = Seq(
      (3L, "http://plain-3.com/path?a=3&utm_x=9"),
      (13L, "HTTP://Plain-3.COM:80/path?a=3&utm_y=7"),
      (4L, "http://other.com/x")
    ).toDF("doc_id", "url")
    val d = Dedup.exact(UrlNorm.normalize(rows, "doc_id", "url"),
      Seq("url_norm"), "id").collect()
    assert(d.length == 1)
    assert(d.head.getAs[String]("url_norm") ==
      "http://plain-3.com/path?a=3")
    assert(d.head.getAs[Long]("n_dups") == 2L)
    assert(d.head.getAs[Long]("first_id") == 3L)
  }

  test("packing by group: sequences are language-pure, tokens " +
       "conserved per group") {
    val packed = Packing.packSequencesBy(docs, Seq("lang"), "doc_id",
      "text", seqLen = 64, nShards = 4).cache()
    // a (lang, shard, seq_id) sequence holds docs of exactly one lang
    // by construction — verify id→lang consistency via join back
    val withLang = packed.select("lang", "id").distinct()
      .join(docs.select(col("doc_id").as("id"),
        col("lang").as("true_lang")), "id")
    assert(withLang.where(col("lang") =!= col("true_lang")).isEmpty)
    // token conservation per language
    val perLang = packed.groupBy("lang").agg(sum("n_toks").as("got"))
      .join(docs.groupBy("lang").agg(
        sum(size(split(col("text"), " "))).as("want")), "lang")
    assert(perLang.where(col("got") =!= col("want")).isEmpty)
    // full sequences except each (lang, shard)'s last
    val seqTot = packed.groupBy("lang", "shard", "seq_id")
      .agg(sum("n_toks").as("t"))
    val lastSeq = seqTot.groupBy("lang", "shard")
      .agg(max("seq_id").as("m"))
    assert(seqTot.join(lastSeq, Seq("lang", "shard"))
      .where(col("seq_id") =!= col("m") && col("t") =!= 64L).isEmpty)
    packed.unpersist()
  }

  test("packing property: invariants hold across seqLen/nShards " +
       "configs") {
    for ((seqLen, nShards) <- Seq((16, 1), (64, 3), (1000, 7))) {
      val packed = Packing.packSequences(docs, "doc_id", "text",
        seqLen, nShards).cache()
      val nTokens = docs.select(sum(size(split(col("text"), " "))))
        .as[Long].head()
      assert(packed.select(sum("n_toks")).as[Long].head() == nTokens,
        s"($seqLen,$nShards) token conservation")
      // no slice exceeds seqLen; none empty; offsets inside [0, L)
      assert(packed.where(col("n_toks") > seqLen.toLong ||
        col("n_toks") <= 0L || col("seq_off") < 0L ||
        col("seq_off") >= seqLen.toLong).isEmpty,
        s"($seqLen,$nShards) slice bounds")
      // per (shard, seq): slices tile exactly [0, L) except the last
      val seqTot = packed.groupBy("shard", "seq_id")
        .agg(sum("n_toks").as("t"), min("seq_off").as("lo"))
      val last = seqTot.join(packed.groupBy("shard")
        .agg(max("seq_id").as("m")), "shard")
      assert(last.where(col("seq_id") =!= col("m") &&
        (col("t") =!= seqLen.toLong || col("lo") =!= 0L)).isEmpty,
        s"($seqLen,$nShards) full sequences")
      packed.unpersist()
    }
  }

  test("pii property: scrub is idempotent over 300 adversarial " +
       "generated strings (batched, one job)") {
    import org.scalacheck.Gen
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("a.b+c@host.example.org"),
      Gen.const("10.1.2.3"),
      Gen.const("+1 (555) 123-4567"),
      Gen.const("@@??.. 999.999.999.999"),   // near-misses
      Gen.const("user@@double.com x@y"),
      Gen.oneOf("<EMAIL>", "<IP>", "<PHONE>"), // replacement tokens
      Gen.listOfN(5, Gen.choose(' ', '~')).map(_.mkString))
    val texts = Gen.listOfN(300,
      Gen.listOfN(6, piece).map(_.mkString(" "))).sample.get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = Pii.scrub(df, "doc_id", "text")
    val twice = Pii.scrub(once.select(col("id").as("doc_id"),
      col("clean_text").as("text")), "doc_id", "text")
    // second scrub finds nothing and changes nothing
    assert(twice.where(col("n_pii") =!= 0).isEmpty)
    val joined = once.select(col("id"), col("clean_text").as("a"))
      .join(twice.select(col("id"), col("clean_text").as("b")), "id")
    assert(joined.where(col("a") =!= col("b")).isEmpty)
  }

  test("url property: normalization is idempotent over generated " +
       "URLs (batched, one job)") {
    import org.scalacheck.Gen
    val url = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      host <- Gen.oneOf("A.Example.COM", "x.org", "Sub.Dom.NET")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/p/q/")
      q <- Gen.oneOf("", "?a=1", "?utm_s=1", "?utm_s=1&b=2",
        "?a=1&utm_x=2&b=3&utm_y=4")
      frag <- Gen.oneOf("", "#Frag")
    } yield s"$scheme://$host$port$path$q$frag"
    val urls = Gen.listOfN(300, url).sample.get
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val once = UrlNorm.normalize(df, "doc_id", "url")
    val twice = UrlNorm.normalize(once.select(
      col("id").as("doc_id"), col("url_norm").as("url")),
      "doc_id", "url")
    val joined = once.select(col("id"), col("url_norm").as("a"))
      .join(twice.select(col("id"), col("url_norm").as("b")), "id")
    assert(joined.where(col("a") =!= col("b")).isEmpty)
    // invariants: no fragment, no utm param, no scheme-DEFAULT port
    // survives (http:443 / https:80 are non-default and kept)
    assert(once.where(col("url_norm").contains("#") ||
      col("url_norm").contains("utm_") ||
      col("url_norm").rlike("^http://[^/]+:80(/|$)") ||
      col("url_norm").rlike("^https://[^/]+:443(/|$)")).isEmpty)
  }

  test("null-text semantics pinned across the new operators") {
    val rows = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // pii: null text → null counts and null flag (unknown, not clean)
    val p = Pii.scrub(rows, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(p(2L).isNullAt(p(2L).fieldIndex("n_email")))
    assert(p(2L).isNullAt(p(2L).fieldIndex("is_dirty")))
    assert(p(1L).getAs[Int]("n_pii") == 0)
    // packing: a null-text doc contributes no tokens and no slices,
    // and does NOT shift its shard's stream
    val pk = Packing.packSequences(rows, "doc_id", "text", 2, 1)
    assert(pk.where(col("id") === 2L).isEmpty)
    assert(pk.select(sum("n_toks")).as[Long].head() == 3L)
    // span coverage: null text → null n_tokens, zero coverage row kept
    val cv = Dedup.duplicateSpanCoverage(rows, "doc_id", "text", 2)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(cv(2L).isNullAt(cv(2L).fieldIndex("n_tokens")))
    assert(cv(2L).getAs[Long]("covered_tokens") == 0L)
    // vocab / tfidf: null docs contribute no terms
    assert(TextAnalysis.buildVocab(rows, "text", 1)
      .select(sum("cnt")).as[Long].head() == 3L)
    assert(TextAnalysis.tfidfTopK(rows, "doc_id", "text", 5, 2L)
      .where(col("id") === 2L).isEmpty)
    // url: null url → null url_norm (not a crash, not a phantom host)
    val un = UrlNorm.normalize(Seq((1L, "http://x.co/"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "url"),
      "doc_id", "url").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(un(2L).isNullAt(un(2L).fieldIndex("url_norm")))
  }

  // ---- embedding projection ----

  test("embedding projection: matches driver-side matmul with the " +
       "same seeded matrix") {
    val vecs = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, (0 until 64).map(j => (j % 7 - 3) * 0.25f).toArray),
      (3L, (0 until 64).map(j => math.sin(j).toFloat).toArray))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Embeddings.project(df, "vec_id", "embedding", k = 8,
      d = 64).collect().map(r => r.getAs[Long]("id") -> r).toMap
    val m = Embeddings.projectionMatrix(8, 64, 42L)
    val inv = 1.0 / math.sqrt(8.0)
    for ((id, v) <- vecs; i <- 0 until 8) {
      val raw = (0 until 64).map(j => v(j).toDouble * m(i)(j))
        .reduceLeft(_ + _) * inv
      val exp = BigDecimal(raw)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(id).getAs[Double](s"p$i") == exp,
        s"id=$id dim=$i")
    }
    // seed determinism: two builds agree
    assert(Embeddings.projectionMatrix(8, 64, 42L).flatten.toSeq ==
      Embeddings.projectionMatrix(8, 64, 42L).flatten.toSeq)
  }

  // ---- streaming sessionization ----

  test("streaming: gap sessionization splits on silence, counts " +
       "per key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sqlCtx = spark.sqlContext
    implicit val sq = sqlCtx
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "host")
    val out = graft.streaming.StreamingValidate.sessionized(df,
      "host", "ts", "5 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    def ts(m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    mem.addData(
      (ts(0), "a"), (ts(2), "a"), (ts(3), "a"), // session 1
      (ts(20), "a"),                            // new session after gap
      (ts(1), "b"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess").collect()
      .map(r => (r.getAs[String]("host"),
        r.getAs[Long]("n_events"),
        r.getAs[java.sql.Timestamp]("first_ts")))
    assert(rows.count(_._1 == "a") == 2)
    assert(rows.contains(("a", 3L, ts(0))))
    assert(rows.contains(("a", 1L, ts(20))))
    assert(rows.contains(("b", 1L, ts(1))))
  }

  // ---- vocab ----

  test("vocab: two-phase histogram rank ≡ single global window; " +
       "minCount filters") {
    import org.apache.spark.sql.expressions.Window
    val built = TextAnalysis.buildVocab(docs, "text", minCount = 2)
      .orderBy("vocab_id").collect()
    // same ids as the naive single-partition window form
    val tc = docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
    val naive = tc.withColumn("vocab_id", row_number().over(
        Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
      .select("vocab_id", "term", "cnt").orderBy("vocab_id").collect()
    assert(built.sameElements(naive))
    // dense 1..V, counts non-increasing, term-asc within equal counts
    assert(built.head.getAs[Long]("vocab_id") == 1L)
    assert(built.last.getAs[Long]("vocab_id") == built.length.toLong)
    val cnts = built.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // minCount respected
    assert(cnts.forall(_ >= 2L))
  }

  // ---- streaming PII ----

  test("streaming: windowed PII stats count planted matches per " +
       "window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sqlCtx = spark.sqlContext
    implicit val sq = sqlCtx
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val out = graft.streaming.StreamingValidate.windowedPiiStats(df,
      "text", "ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("wpii")
      .outputMode("update").start()
    def ts(m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    mem.addData(
      (ts(1), "mail me x@y.io and 10.0.0.1"),
      (ts(2), "clean text here"),
      (ts(12), "call +1 (555) 123-4567"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wpii").collect()
      .map(r => r.getStruct(0).getTimestamp(0) -> r).toMap
    assert(rows(ts(0)).getAs[Long]("n_docs") == 2L)
    assert(rows(ts(0)).getAs[Long]("n_pii") == 2L)
    assert(rows(ts(0)).getAs[Long]("n_dirty") == 1L)
    assert(rows(ts(0)).getAs[Double]("dirty_frac") == 0.5)
    assert(rows(ts(10)).getAs[Long]("n_pii") == 1L)
  }

  test("positional ngrams: index equals start token position, " +
       "distinct mode unchanged") {
    val r = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .select(graft.functions.NgramShingles
        .ngramsPositional(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(r == Seq("a b", "b a", "a b", "b a"))
    val d = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .select(graft.functions.NgramShingles.ngrams(col("text"), 2)
        .as("g")).as[Seq[String]].head()
    assert(d == Seq("a b", "b a"))
  }
}

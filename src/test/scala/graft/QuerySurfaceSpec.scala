package graft

import org.apache.spark.sql.functions._

/** Contract-level checks on SparkEntry: the flagship entry point and
  * the queries whose outputs the SQL oracle can't pin exactly
  * (sketches).
  */
class QuerySurfaceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns non-empty gold rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry works on a fresh session with default configs") {
    // the driver smokes entry() with its own session — no UTC pin, no
    // legacy confs; events() must self-configure at runtime
    val fresh = spark.newSession()
    assert(SparkEntry.entry(fresh).count() > 0)
  }

  test("every declared oracle has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("approx_count_distinct bound row: exact side matches recompute, bound holds") {
    // the query now CERTIFIES the 10% bound in-row (within_bound) so
    // the oracle can hash-check it; this pins the exact side against
    // an independent recompute and that no group escapes the bound
    val out = SparkEntry.queries("approx_distinct_users_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val exact = SparkEntry.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === exact.keySet)
    exact.foreach { case (tpe, ex) =>
      assert(out(tpe)._1 === ex, s"$tpe exact side diverged")
      assert(out(tpe)._2, s"$tpe: HLL estimate escaped the 10% bound")
    }
  }

  test("approx percentile bound row: exact side matches recompute, bound holds") {
    val out = SparkEntry.queries("approx_percentiles_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    val exact = SparkEntry.queries("value_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet === exact.keySet)
    exact.foreach { case (tpe, ex) =>
      assert(out(tpe)._1 === ex, s"$tpe exact p50 diverged")
      assert(out(tpe)._2, s"$tpe: sketch p50 escaped the 5% bound")
    }
  }

  test("deterministic hash-sample estimators track the exact values") {
    // the oracle gate pins Spark == DuckDB; this pins that the
    // deterministic spellings are also sensible ESTIMATORS (1/4
    // hash-domain sample of 15 users / ~200 rows per type at sf0.001,
    // so bounds are loose by design)
    val estD = SparkEntry.queries("approx_distinct_users")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exD = SparkEntry.queries("silver_clean_filter")(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exD.foreach { case (tpe, ex) =>
      val est = estD.get(tpe)
      assert(est.isDefined, s"$tpe missing from the sampling estimate")
      assert(est.get >= ex / 2.0 && est.get <= ex * 2.0,
        s"$tpe: distinct-sampling estimate ${est.get} vs exact $ex")
    }
    val estP = SparkEntry.queries("approx_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exP = SparkEntry.queries("value_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exP.foreach { case (tpe, ex) =>
      val est = estP.get(tpe)
      assert(est.isDefined, s"$tpe missing from the sampled percentiles")
      assert(math.abs(est.get - ex) / math.max(ex, 1.0) < 0.25,
        s"$tpe: sampled p50 ${est.get} vs exact $ex")
    }
  }

  test("LSH ranks follow its contract: rounded score desc, id asc") {
    // Verify against an independent driver-side recomputation of the
    // operator's OWN ordering contract (6-dp rounded cosine desc,
    // neighbor id tie-break) — comparing against unrounded brute-force
    // order would spuriously fail on near-tie scores that round equal.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    val lsh = SparkEntry.queries("embed_topk_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lsh.nonEmpty)
    lsh.groupBy(_._1).foreach { case (q, rows) =>
      val ordered = rows.sortBy(_._2)
        .map { case (_, _, n) => (-cos(emb(q), emb(n)), n) }
      assert(ordered === ordered.sorted,
        s"query $q: LSH rank order violates (score desc, id asc): $ordered")
    }
  }

  test("stratified sample approximates the per-stratum rates") {
    // en 50%, fr 25%, other 10% — the hash predicate is deterministic,
    // so rates converge with corpus size; at 500 docs allow wide
    // uniformity tolerance
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tot = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("docs_sample_stratified")(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(lang: String) = got.getOrElse(lang, 0L).toDouble / tot(lang)
    assert(math.abs(rate("en") - 0.50) < 0.15, s"en rate ${rate("en")}")
    assert(math.abs(rate("fr") - 0.25) < 0.15, s"fr rate ${rate("fr")}")
  }

  test("sequence packing: offsets are the per-source running token sum") {
    // independent driver-side recomputation of the concat-and-chunk
    // contract: within each source (ordered by doc_id) a doc's start
    // offset equals the sum of all earlier docs' token counts, and
    // seq_idx = start_offset / 2048
    val rows = SparkEntry.queries("docs_pack_sequences")(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      var running = 0L
      docs.sortBy(_._2).foreach { case (_, id, n, off, seq) =>
        assert(off === running, s"$src doc $id: offset $off != $running")
        assert(seq === off / 2048, s"$src doc $id: seq_idx mismatch")
        running += n
      }
    }
  }

  test("shard-composed packing: exact tiling within every (source, shard) " +
    "spine, shards partition each source") {
    // the scale-shaped pack: running sums partition by (source, shard)
    // so no window partition is ever corpus-fraction-sized. Within a
    // spine the tiling contract is the same as per-source packing:
    // offsets are the running sum in doc_id order, seq_idx =
    // offset / 512; across spines the offsets are independent (each
    // shard packs its own sequence space).
    val rows = SparkEntry.queries("docs_pack_sharded")(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(0),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val spines = rows.groupBy(t => (t._1, t._2))
    assert(spines.size > rows.map(_._1).distinct.size,
      "sharding never split a source — the composed spine is vacuous")
    spines.foreach { case ((src, sh), docs) =>
      var running = 0L
      docs.sortBy(_._3).foreach { case (_, _, id, n, off, seq) =>
        assert(off === running, s"($src,$sh) doc $id: offset $off != $running")
        assert(seq === off / 512, s"($src,$sh) doc $id: seq_idx mismatch")
        running += n
      }
    }
    // the shard key is the docs_shard_assign spelling: hash-mod,
    // deterministic, uniform enough that every shard is populated
    assert(rows.map(_._2).distinct.sorted === Seq(0, 1, 2, 3))
  }

  test("funnel matches an independent per-user sequential recompute") {
    // go through the schema-adaptive reader so this recompute keeps
    // working whatever physical ts encoding the testdata carries
    val rows = SparkEntry.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val day = 24L * 3600 * 1000000L // µs
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val v = es.filter(_._3 == "view").map(_._2).minOption
      val c = v.flatMap(t => es.filter(e => e._3 == "click" &&
        e._2 >= t && e._2 <= t + day).map(_._2).minOption)
      val p = c.flatMap(t => es.filter(e => e._3 == "purchase" &&
        e._2 >= t && e._2 <= t + day).map(_._2).minOption)
      u -> (if (p.isDefined) 3L else if (c.isDefined) 2L
            else if (v.isDefined) 1L else 0L)
    }
    val expCounts = expected.values.groupBy(identity).map { case (s1, xs) =>
      s1 -> xs.size.toLong
    }
    val got = SparkEntry.queries("events_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expCounts, s"funnel: $got vs $expCounts")
  }

  test("tfidf top-k: ranks are dense and ordered, scores consistent") {
    val rows = SparkEntry.queries("docs_tfidf_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, terms) =>
      val byRank = terms.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to terms.length).toSeq,
        s"doc $doc: ranks not dense")
      assert(terms.length <= 3, s"doc $doc: more than k rows")
      // ordering contract: (tfidf desc, word asc)
      val key = byRank.map(t => (-t._4, t._3)).toSeq
      assert(key === key.sorted, s"doc $doc: rank order violates contract")
    }
  }

  test("bigram LM: probabilities stay below 1, bigram counts add up") {
    // add-one smoothing: P = (c2+1)/(c1+V) with c2 <= c1 and V > 1,
    // so every log-prob and hence every mean must be negative
    val rows = SparkEntry.queries("docs_bigram_logprob")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, lp) =>
      assert(lp < 0.0, s"doc $doc: mean logprob $lp not negative")
      assert(n > 0, s"doc $doc: zero bigrams emitted")
    }
    // n_bigrams is tokens-1 for every doc with >= 2 tokens
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(graft.functions.Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (doc, n, _) =>
      assert(n === toks(doc) - 1L, s"doc $doc: $n bigrams vs ${toks(doc)} tokens")
    }
  }

  test("mix weights: shares sum to 1, rebalance is uniform") {
    val rows = SparkEntry.queries("docs_mix_weights")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "token shares don't sum to 1")
    // lang_tokens × mix_weight = total/n_langs for every language
    val total = rows.map(_._2).sum.toDouble
    val target = total / rows.length
    rows.foreach { case (lang, n, _, w) =>
      assert(math.abs(n * w - target) / target < 1e-4,
        s"$lang: rebalanced mass ${n * w} != $target")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketed

/** Bucketed co-located joins: correctness AND the zero-Exchange plan
  * property that is the whole point of paying the write-time shuffle.
  */
class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  private def withTables[A](names: String*)(body: => A): A =
    try body
    finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("co-bucketed join plans with zero Exchange and exact results") {
    val orders = (0 until 2000)
      .map(i => (i.toLong % 400, s"o$i", i * 1.5)).toDF("cust_id", "oid", "amt")
    val custs = (0 until 400).map(i => (i.toLong, s"name$i")).toDF("cust_id", "name")
    withTables("b_orders", "b_custs") {
      Bucketed.writeBucketed(orders, "b_orders", "cust_id", 8)
      Bucketed.writeBucketed(custs, "b_custs", "cust_id", 8)
      // broadcast would hide the property under test — force the
      // shuffle-or-colocate decision
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Bucketed.assertCoLocated(
          Bucketed.join(spark, "b_orders", "b_custs", "cust_id"))
        assert(j.count() === 2000)
        // spot-check against the plain (shuffling) join
        val plain = orders.join(custs, Seq("cust_id"))
        assert(j.select(sum("amt")).head.getDouble(0) ===
          plain.select(sum("amt")).head.getDouble(0))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucket-count mismatch is caught, not silently shuffled") {
    val a = (0 until 100).map(i => (i.toLong, i)).toDF("k", "va")
    val b = (0 until 100).map(i => (i.toLong, i * 2)).toDF("k", "vb")
    withTables("b_mismatch_a", "b_mismatch_b") {
      Bucketed.writeBucketed(a, "b_mismatch_a", "k", 4)
      Bucketed.writeBucketed(b, "b_mismatch_b", "k", 6)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 4 vs 6 buckets (not integer multiples): Spark falls back to a
      // full shuffle without an error — the assert is what surfaces it
      try intercept[IllegalArgumentException] {
        Bucketed.assertCoLocated(
          Bucketed.join(spark, "b_mismatch_a", "b_mismatch_b", "k"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("ensureBucketed writes once; repetition reuses the layout") {
    val df = (0 until 200).map(i => (i.toLong, i)).toDF("k", "v")
    withTables("b_ensure") {
      Bucketed.ensureBucketed(df, "b_ensure", "k", 4)
      val files = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "b_ensure").listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 4, "one file per bucket expected")
      val stamps = files.map(f => f.getName -> f.lastModified).toMap
      // second ensure on an existing table must be a no-op, not a
      // rewrite — this is what keeps benchmark/Verify repetition from
      // re-paying the layout shuffle every pass
      Bucketed.ensureBucketed(df.limit(10), "b_ensure", "k", 4)
      val after = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "b_ensure").listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
      assert(after === stamps, "existing bucketed table was rewritten")
      assert(spark.table("b_ensure").count() === 200)
    }
  }

  test("ensureBucketed verifies the recorded layout fingerprint") {
    val df = (0 until 200).map(i => (i.toLong, i)).toDF("k", "v")
    withTables("b_fp") {
      Bucketed.ensureBucketed(df, "b_fp", "k", 4)
      // identical layout: a no-op, no error
      Bucketed.ensureBucketed(df, "b_fp", "k", 4)
      // different bucket count under the same name: refused — reusing
      // it would silently shuffle every "co-located" join
      val e1 = intercept[IllegalArgumentException] {
        Bucketed.ensureBucketed(df, "b_fp", "k", 8)
      }
      assert(e1.getMessage.contains("b_fp"))
      // different key: refused
      intercept[IllegalArgumentException] {
        Bucketed.ensureBucketed(df, "b_fp", "v", 4)
      }
      // schema drift under the same name: refused
      intercept[IllegalArgumentException] {
        Bucketed.ensureBucketed(df.withColumn("extra", lit(1)), "b_fp", "k", 4)
      }
      // and the refusals did not clobber the existing table
      assert(spark.table("b_fp").count() === 200)
    }
  }

  test("legacy table without a fingerprint is verified and stamped, not rejected") {
    // Tables written before fingerprints existed (or under the old
    // 32-bit stamp format) live in persisted warehouses; the catalog's
    // own bucketSpec + schema are enough to verify them, after which
    // the modern fingerprint is stamped on.
    val df = (0 until 200).map(i => (i.toLong, i)).toDF("k", "v")
    withTables("b_legacy") {
      Bucketed.ensureBucketed(df, "b_legacy", "k", 4)
      spark.sql(
        "ALTER TABLE b_legacy UNSET TBLPROPERTIES ('graft.bucketed.fingerprint')")
      // same layout: accepted via catalog bucketSpec + schema...
      Bucketed.ensureBucketed(df, "b_legacy", "k", 4)
      // ...and re-stamped for cheap later checks
      val stamped = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("b_legacy"))
        .properties.get("graft.bucketed.fingerprint")
      assert(stamped.exists(_.contains("schemaSha256=")),
        s"legacy table not re-stamped: $stamped")
      // wrong layout against a legacy table: still refused (bucketSpec)
      spark.sql(
        "ALTER TABLE b_legacy UNSET TBLPROPERTIES ('graft.bucketed.fingerprint')")
      intercept[IllegalArgumentException] {
        Bucketed.ensureBucketed(df, "b_legacy", "k", 8)
      }
      // wrong schema against a legacy table: refused (catalog schema)
      intercept[IllegalArgumentException] {
        Bucketed.ensureBucketed(df.withColumn("extra", lit(1)), "b_legacy", "k", 4)
      }
      assert(spark.table("b_legacy").count() === 200)
    }
  }

  test("assertCoLocated passes a broadcast join (no data shuffle)") {
    // BroadcastExchange moves the small table, not the data being
    // co-located — the old string match on "Exchange" failed this
    // legitimate plan; the tree walk for ShuffleExchangeLike must not
    val big = (0 until 2000).map(i => (i.toLong % 100, i)).toDF("k", "v")
    val tiny = (0 until 100).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    withTables("b_bcast") {
      Bucketed.writeBucketed(big, "b_bcast", "k", 4)
      val j = spark.table("b_bcast").join(broadcast(tiny), Seq("k"))
      assert(j.queryExecution.executedPlan.toString.contains("Exchange"),
        "fixture broken: expected a BroadcastExchange in the plan")
      assert(Bucketed.assertCoLocated(j).count() === 2000)
    }
  }

  test("orphaned warehouse location from a dead JVM is reclaimed") {
    // A previous JVM's managed table leaves its directory under the
    // (persistent) warehouse dir while this JVM's catalog has no
    // entry — exactly what a Verify/Bench rerun sees. saveAsTable
    // refuses to adopt the orphan (LOCATION_ALREADY_EXISTS); the
    // writer must reclaim it instead of failing the whole run.
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "b_orphan")
    dir.mkdirs()
    val stale = new java.io.File(dir, "stale-file")
    assert(stale.createNewFile())
    withTables("b_orphan") {
      assert(!spark.catalog.tableExists("b_orphan"))
      val df = (0 until 100).map(i => (i.toLong, i)).toDF("k", "v")
      Bucketed.writeBucketed(df, "b_orphan", "k", 4)
      assert(spark.table("b_orphan").count() === 100)
      assert(!stale.exists(), "stale orphan content must be gone")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val orders = (0 until 1000)
      .map(i => (i.toLong % 50, i * 2.0)).toDF("cust_id", "amt")
    withTables("b_agg_orders") {
      Bucketed.writeBucketed(orders, "b_agg_orders", "cust_id", 8)
      val agg = spark.table("b_agg_orders")
        .groupBy("cust_id").agg(sum("amt").as("total"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key should not shuffle:\n$plan")
      assert(agg.count() === 50)
      assert(agg.filter(col("cust_id") === 0L).head.getAs[Double]("total")
        === (0 until 1000 by 50).map(_ * 2.0).sum)
    }
  }
}

package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkTestBase {

  test("approx profile: same schema, exact counts/min/max, NDV within HLL++ error") {
    val exact = Profiling.profileLineitem(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    val approxDf = Profiling.profileLineitemApprox(spark, sf)
    assert(approxDf.columns.toSeq ===
      Seq("column_name", "n_nonnull", "n_distinct", "min_value", "max_value"))
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, (nn, nd, mn, mx)) =>
      val (ann, and, amn, amx) = approx(c)
      // count/min/max are exact aggregates in both forms
      assert(ann === nn, s"$c n_nonnull")
      assert(amn === mn && amx === mx, s"$c min/max")
      // HLL++ at rsd 0.02 — allow 5% relative (2.5 sigma) plus slack on
      // tiny NDVs (small cardinalities use HLL++'s near-exact sparse mode)
      assert(math.abs(and - nd) <= math.max(2L, (nd * 0.05).toLong),
        s"$c approx NDV $and vs exact $nd")
    }
  }

  test("integrity audit: clean corpus reports zeros; planted violations count exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val clean = Profiling.auditIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean("docs_total") === 500)
    Seq("docs_empty_text", "docs_dup_id", "docs_missing_embedding",
      "embeddings_orphan", "embeddings_null_vec", "embeddings_ragged_dim",
      "orders_orphan_custkey", "lineitem_orphan_orderkey")
      .foreach(k => assert(clean(k) === 0L, k))

    // plant one violation of each doc/embedding class and count them back
    val docs = graft.core.Tables.documents(spark, sf)
    val emb = graft.core.Tables.embeddings(spark, sf)
    val docsBad = docs
      .unionAll(docs.limit(2).withColumn("text", lit("")))       // 2 dup ids, also empty text
      .unionAll(docs.limit(1).withColumn("doc_id", lit(900001L))) // no embedding
    val embBad = emb
      .unionAll(emb.limit(1).withColumn("vec_id", lit(900002L))) // orphan
      .unionAll(emb.limit(1).withColumn("vec_id", lit(900003L))
        .withColumn("embedding", slice($"embedding", 1, 3)))     // orphan + ragged
      .unionAll(emb.limit(1).withColumn("vec_id", lit(900004L))
        .withColumn("embedding", lit(null).cast("array<float>"))) // orphan + null
    val out = Profiling.auditIntegrityOf(docsBad, embBad,
        graft.core.Tables.orders(spark, sf), graft.core.Tables.customer(spark, sf),
        graft.core.Tables.lineitem(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("docs_total") === 503)
    assert(out("docs_empty_text") === 2)
    assert(out("docs_dup_id") === 2)
    assert(out("docs_missing_embedding") === 1) // planted 900001 only
    assert(out("embeddings_orphan") === 3)
    assert(out("embeddings_null_vec") === 1)
    assert(out("embeddings_ragged_dim") === 1)
  }

  test("snapshot diff: statuses exactly match the synthesis rules, unchanged filtered out") {
    import spark.implicits._
    val out = Profiling.snapshotDiff(spark, sf)
      .as[(Long, String)].collect().toMap
    val ids = graft.core.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val expected = ids.flatMap { id =>
      if (id % 10 == 9) Some(id -> "added")
      else if (id % 41 == 3) Some(id -> "removed")
      else if (id % 7 == 0) Some(id -> "changed")
      else None // unchanged: must be absent
    }.toMap
    assert(out === expected)
    assert(out.values.toSet === Set("added", "removed", "changed"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ScaleUtils

class ScaleUtilsSpec extends AnyFunSuite {
  import TestSpark._

  test("extensions expose kernel functions in plain SQL (no register call)") {
    Tables.t(spark, sfDir, "embeddings").limit(3).createOrReplaceTempView("e3")
    val r = spark.sql(
      """SELECT cosine_sim(embedding, embedding) AS c,
        |       hyperplane_bucket(embedding, 8) AS b FROM e3""".stripMargin).collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-12))
    assert(r.forall(row => row.getInt(1) >= 0 && row.getInt(1) < 256))
    val sh = spark.sql(
      "SELECT simhash64('a b c') AS s, shingle_minhash('a b c d', 3, 8) AS m").head
    assert(sh.getLong(0) != 0L)
    assert(sh.getSeq[Long](1).length == 8)
    val md5fns = spark.sql(
      """SELECT simhash_md5('a b c') AS s,
        |       winnow_fingerprint_md5('abcdefghijklmnop', 8, 4) AS w
        |""".stripMargin).head
    assert(md5fns.getLong(0) != 0L)
    assert(md5fns.getSeq[String](1).forall(_.length == 16))
    val more = spark.sql(
      """SELECT winnow_fingerprint('abcdefghijklmnop', 8, 4) AS w,
        |       hashed_tf_vector('a b c', 16) AS v,
        |       self_cosine(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS sc
        |""".stripMargin).head
    assert(more.getSeq[Long](0).nonEmpty)
    assert(more.getSeq[Float](1).length == 16)
    assert(math.abs(more.getDouble(2) - 1.0) < 1e-12)
    val r2 = spark.sql(
      """SELECT shingle_array('a b c d', 3) AS sa,
        |       shingle_tf_vector('a b c d e', 3, 32) AS stv,
        |       hyperplane_codes(shingle_tf_vector('a b c d e', 3, 32), 8, 4) AS hc,
        |       code_agreement(hyperplane_codes(shingle_tf_vector('a b c d e', 3, 32), 8, 4),
        |                      hyperplane_codes(shingle_tf_vector('a b c d e', 3, 32), 8, 4), 8) AS ca
        |""".stripMargin).head
    assert(r2.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r2.getSeq[Float](1).length == 32)
    assert(r2.getSeq[Int](2).length == 4)
    assert(r2.getDouble(3) == 1.0)
  }

  test("trigram kernel byte windows equal composed char windows (incl. non-ASCII)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, size, filter}
    val profile = Seq("the", "he ", " th", "ing", "nd ")
    val texts = Seq("the thing and the rest", "héllo the wörld thing",
      "日本語 the テキスト", "", "th", "ththth the the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val fused = df.select(col("id"),
      graft.functions.HashKernels.trigram_hits(col("text"), profile).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val composed = df.select(col("id"),
      size(filter(
        expr("CASE WHEN length(text) < 3 THEN array() ELSE transform(sequence(1, length(text) - 2), i -> substr(text, i, 3)) END"),
        t => t.isin(profile.map(org.apache.spark.sql.functions.lit): _*))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fused == composed, s"fused=$fused composed=$composed")
  }

  test("optimizer rule rewrites cosine_sim(x, x) to the one-pass SelfCosine") {
    Tables.t(spark, sfDir, "embeddings").limit(3).createOrReplaceTempView("eopt")
    val df = spark.sql("SELECT cosine_sim(embedding, embedding) AS c FROM eopt")
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!optimized.contains("cosinesimilarity") && optimized.contains("selfcosine"),
      s"self-cosine must rewrite to SelfCosine; plan was:\n$optimized")
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("self-cosine rewrite preserves NULL and zero-vector semantics") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Seq(1.0f, 2.0f))),
      (1L, None),
      (2L, Some(Seq(0.0f, 0.0f))),
      (3L, Some(Seq.empty[Float])))
      .toDF("id", "v")
    df.createOrReplaceTempView("edge_vecs")
    val rows = spark.sql("SELECT id, cosine_sim(v, v) AS c FROM edge_vecs ORDER BY id")
      .collect()
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(1), "NULL vector must stay NULL, not fold to 1.0")
    assert(rows(2).getDouble(1).isNaN, "zero vector must stay NaN")
    assert(rows(3).getDouble(1).isNaN, "empty vector must stay NaN")
  }

  test("salted join equals plain join (inner)") {
    val li = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey")).agg(
      count(lit(1)), round(sum(col("l_quantity")), 2)).head
    val salted = ScaleUtils.saltedJoin(li, o, "l_orderkey", 4).agg(
      count(lit(1)), round(sum(col("l_quantity")), 2)).head
    assert(plain == salted)
    val saltedDet = ScaleUtils.saltedJoinDeterministic(
      li, o, "l_orderkey", col("l_quantity"), 4).agg(
      count(lit(1)), round(sum(col("l_quantity")), 2)).head
    assert(plain == saltedDet)
  }

  test("skew-salted join: plan spreads the hot key, result equals plain join") {
    val q = ScaleUtils.skewSaltedJoin(spark, sfDir)
    // the salted join must shuffle on (grp_key, __salt), not grp_key
    // alone — that is what spreads the 70%-hot key over 8 reducers
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"join must be salted; plan was:\n$plan")
    assert(plan.toLowerCase.contains("sortmergejoin"),
      "merge hint must hold (a broadcast would erase the skew the salt is for)")
    // correctness: salting is plan surgery only — equal to the plain join
    val ev = Tables.t(spark, sfDir, "events")
      .withColumn("grp_key",
        when(col("user_id") % 10 < 7, lit(0L)).otherwise(col("user_id")))
    val dim = ev.select(col("grp_key")).distinct()
      .withColumn("grp_label",
        concat(lit("grp_"), (col("grp_key") % 7).cast("string")))
    val plain = ev.join(dim, Seq("grp_key"))
      .groupBy("grp_label")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("grp_label").collect().toSeq
    assert(q.collect().toSeq == plain)
  }

  test("bucketed tables join without an exchange") {
    val c = Tables.t(spark, sfDir, "customer").select("c_custkey", "c_name")
    val o = Tables.t(spark, sfDir, "orders").select("o_custkey", "o_totalprice")
    ScaleUtils.writeBucketed(c, "bkt_customer", "c_custkey", 4)
    ScaleUtils.writeBucketed(
      o.withColumnRenamed("o_custkey", "c_custkey"), "bkt_orders", "c_custkey", 4)
    // disable auto-broadcast so the planner must consider the bucketed
    // layout (at real scale neither side would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_customer").join(spark.table("bkt_orders"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-order kernel interleaves bits exactly and is exposed in SQL") {
    // 0b101 and 0b011 interleave to 0b011011 (a-bits at even positions)
    assert(graft.functions.ZOrderKernel.interleave16(5L, 3L) == 27L)
    assert(graft.functions.ZOrderKernel.interleave16(0L, 0L) == 0L)
    // only the low 16 bits participate
    assert(graft.functions.ZOrderKernel.interleave16(1L << 16, 0L) == 0L)
    assert(graft.functions.ZOrderKernel.interleave16(0xFFFFL, 0xFFFFL)
      == 0xFFFFFFFFL)
    val viaSql = spark.sql("SELECT z_order16(5L, 3L) AS z").head.getLong(0)
    assert(viaSql == 27L)
  }

  test("z-order buckets bound both dimensions more tightly than a 1-d sort") {
    val r = ScaleUtils.zorderLayout(spark, sfDir).collect()
    assert(r.nonEmpty)
    val total = r.map(_.getLong(1)).sum
    assert(total == Tables.t(spark, sfDir, "lineitem").count())
    // every bucket's rectangle is genuinely bounded in BOTH dimensions:
    // the widest per-bucket suppkey span must be far below the global
    // span (a partkey-only sort would leave suppkey spans ~global)
    val globalSupp = Tables.t(spark, sfDir, "lineitem")
      .agg(max(col("l_suppkey")) - min(col("l_suppkey"))).head.getLong(0)
    val maxBucketSupp = r.map(x => x.getLong(5) - x.getLong(4)).max
    assert(r.length > 3, "bucketing must produce multiple z-cells")
    assert(maxBucketSupp <= globalSupp,
      "bucket rectangles are within the global range")
  }

  test("key-skew profile reports exact global stats on the top-key rows") {
    val r = ScaleUtils.keySkewProfile(spark, sfDir).collect()
    assert(r.length == 5)
    val counts = Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val row1 = r.head
    assert(row1.getLong(2) == counts.values.max, "rank 1 carries the hottest key")
    assert(row1.getLong(4) == counts.size)                    // n_keys
    assert(row1.getLong(5) == counts.values.sum)              // n_rows
    val expectedP99k = {
      val sorted = counts.toSeq.sortBy(x => (x._2, x._1)).map(_._2)
      sorted(((counts.size * 99 + 99) / 100 - 1).toInt)
    }
    assert(row1.getLong(7) == expectedP99k)                   // p99_cnt
  }
}

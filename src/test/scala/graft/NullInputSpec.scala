package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-input robustness sweep, the sibling of EmptyInputSpec: every
  * catalog query must EXECUTE over a fixture where roughly half of
  * every nullable non-key column is NULL. At 100 TB null-dense slices
  * are routine (optional fields, failed upstream extractors, schema
  * evolution back-fills), and the correct engine behavior is Spark's
  * null propagation — never an NPE in a kernel or a crash in a
  * comparator. Keys stay non-null (the fixture generator never nulls
  * them; a null join key is dropped by equi-join semantics anyway);
  * value/text/payload columns are nulled on a deterministic hash so
  * the sweep is reproducible.
  */
class NullInputSpec extends AnyFunSuite {
  import TestSpark._

  test("every catalog query executes over a half-null fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    val plans = Map(
      "region" -> ("r_regionkey", Seq("r_name")),
      "nation" -> ("n_nationkey", Seq("n_name")),
      "customer" -> ("c_custkey", Seq("c_name", "c_acctbal", "c_mktsegment")),
      "supplier" -> ("s_suppkey", Seq("s_name", "s_acctbal")),
      "part" -> ("p_partkey", Seq("p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")),
      "orders" -> ("o_orderkey", Seq("o_orderstatus", "o_totalprice",
        "o_orderpriority")),
      "lineitem" -> ("l_orderkey", Seq("l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus")),
      "events" -> ("event_id", Seq("event_type", "value", "props")),
      "documents" -> ("doc_id", Seq("text", "lang", "source", "n_chars")),
      "embeddings" -> ("vec_id", Seq("embedding", "label")))
    Tables.all.foreach { n =>
      val (key, cols) = plans(n)
      val src = s"/root/testdata/sf0.001/$n.parquet"
      val df = spark.read.parquet(src)
      cols.foldLeft(df) { (acc, c) =>
        acc.withColumn(c,
          when(substring(md5(concat(lit(s"null:$c:"),
            col(key).cast("string"))), 1, 1) < lit("8"), col(c)))
      }.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val failures = SweepHarness.sweepCatalog(spark, dir)
    assert(failures.isEmpty,
      s"${failures.size} queries fail on half-null input:\n  " +
        failures.mkString("\n  "))
  }
}

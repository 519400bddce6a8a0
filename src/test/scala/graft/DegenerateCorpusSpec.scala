package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-distribution sweep, the third robustness gate next to
  * EmptyInputSpec / NullInputSpec: every catalog query must execute
  * over a fixture where every document is the SAME text, every
  * embedding the SAME vector, and every event value/price a SINGLE
  * constant. This is the zero-variance, 100%-duplicate corner a real
  * pipeline hits on a mirrored crawl or a stuck upstream producer —
  * where divisions by a zero stddev, log of a degenerate ratio, or a
  * saturated LSH band are most likely to throw instead of produce the
  * well-defined degenerate answer (null/NaN rates, one dup cluster).
  */
class DegenerateCorpusSpec extends AnyFunSuite {
  import TestSpark._

  test("every catalog query executes over a constant-value fixture") {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-const").toString
    val const: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = Map(
      "documents" -> (df => df
        .withColumn("text", lit("the same mirrored crawl document text every time"))
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("src0"))
        .withColumn("n_chars", lit(48L))),
      "embeddings" -> (df => df
        .withColumn("embedding",
          array((0 until 64).map(_ => lit(0.5f)): _*))
        .withColumn("label", lit(1))),
      "events" -> (df => df.withColumn("value", lit(1.0))),
      "orders" -> (df => df.withColumn("o_totalprice", lit(100.0))),
      "lineitem" -> (df => df
        .withColumn("l_quantity", lit(1.0))
        .withColumn("l_extendedprice", lit(100.0))
        .withColumn("l_discount", lit(0.0))
        .withColumn("l_tax", lit(0.0))))
    Tables.all.foreach { n =>
      val df = spark.read.parquet(s"$src/$n.parquet")
      const.getOrElse(n, identity[org.apache.spark.sql.DataFrame] _)(df)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val failures = SweepHarness.sweepCatalog(spark, dir)
    assert(failures.isEmpty,
      s"${failures.size} queries fail on a constant-value fixture:\n  " +
        failures.mkString("\n  "))
  }
}

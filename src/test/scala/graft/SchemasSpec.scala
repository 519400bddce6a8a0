package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{Schemas, SchemaMismatchException}

/** Declared schema-on-read (SURVEY §1.3): drifted inputs must fail fast
  * with the exact field delta, never be silently accepted. */
class SchemasSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("every fixture table at every sf validates against its declaration") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      Tables.all.foreach { n => assert(Tables.t(spark, dir, n).count() >= 0) }
    }
  }

  test("a retyped column is rejected with the field named") {
    val d = java.nio.file.Files.createTempDirectory("drift1").toString
    // c_custkey written as string instead of bigint
    Seq(("1", "alice", 1, 10.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val e = intercept[SchemaMismatchException] { Tables.t(spark, d, "customer") }
    assert(e.getMessage.contains("customer") && e.getMessage.contains("c_custkey"))
  }

  test("a missing column is rejected") {
    val d = java.nio.file.Files.createTempDirectory("drift2").toString
    Seq((1L, "doc text", "en", "src")) // n_chars missing
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val e = intercept[SchemaMismatchException] { Tables.t(spark, d, "documents") }
    assert(e.getMessage.contains("missing=n_chars"))
  }

  test("an unexpected extra column is rejected") {
    val d = java.nio.file.Files.createTempDirectory("drift3").toString
    Seq((1, "EUROPE", "oops")).toDF("r_regionkey", "r_name", "r_extra")
      .write.mode("overwrite").parquet(s"$d/region.parquet")
    val e = intercept[SchemaMismatchException] { Tables.t(spark, d, "region") }
    assert(e.getMessage.contains("unexpected=r_extra"))
  }

  test("erathia bronze drift is rejected at Silver ingest") {
    val d = java.nio.file.Files.createTempDirectory("drift4").toString
    Seq((1L, "Castle", "wrong-type-faction"))
      .toDF("town_key", "town_name", "faction_key") // faction_key should be double
      .write.mode("overwrite").parquet(s"$d/dim_town")
    val e = intercept[SchemaMismatchException] {
      Schemas.readErathia(spark, s"$d/dim_town", "dim_town")
    }
    assert(e.getMessage.contains("faction_key"))
    // and an intact bronze table passes
    erathia.DataGen.dimTown(spark).write.mode("overwrite").parquet(s"$d/dim_town_ok")
    assert(Schemas.readErathia(spark, s"$d/dim_town_ok", "dim_town").count() > 0)
  }

  test("overwriting a validated path with drifted data re-validates") {
    val d = java.nio.file.Files.createTempDirectory("drift5").toString
    // first write is intact and validates fine
    Seq((1, "EUROPE")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$d/region.parquet")
    assert(Tables.t(spark, d, "region").count() == 1)
    // same path overwritten with a drifted schema later in the session:
    // the cache must not vouch for the old contents
    Seq((1, "EUROPE", "oops")).toDF("r_regionkey", "r_name", "r_extra")
      .write.mode("overwrite").parquet(s"$d/region.parquet")
    val e = intercept[SchemaMismatchException] { Tables.t(spark, d, "region") }
    assert(e.getMessage.contains("unexpected=r_extra"))
  }

  test("nullability and column order are not drift") {
    import org.apache.spark.sql.types._
    val declared = Schemas.fixture("region")
    val reordered = StructType(declared.fields.reverse.map(_.copy(nullable = false)))
    Schemas.validate("region", declared, reordered) // must not throw
  }
}

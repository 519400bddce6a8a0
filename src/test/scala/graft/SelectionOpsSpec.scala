package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SelectionOps

/** DSIR-style selection: value-level correctness is the DuckDB gate
  * (q179/q180 carry full hash oracles); these pin the structural
  * properties the gate can't see — exact-integer determinism under
  * repartitioning, an independent recomputation of the weight math
  * around the fused kernel, report self-consistency, and the
  * one-side-empty corpus. */
class SelectionOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def copyDocs(transform: org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("dsir").toString
    transform(Tables.t(spark, sfDir, "documents"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dsir weights: exact-integer results are repartition-invariant") {
    val base = SelectionOps.dsirWeights(spark, sfDir).collect().toSeq
    val d = copyDocs(_.repartition(7))
    val re = SelectionOps.dsirWeights(spark, d).collect().toSeq
    assert(re == base)
  }

  test("dsir weights: independent recomputation around the fused kernel") {
    // Bucket stats recomputed with built-in split/array ops (the
    // interpreted path the kernel replaced) and the weight summed on
    // the driver for a handful of docs — a full differential of the
    // explode→broadcast-join→sum pipeline.
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        filter(split(col("text"), " "), w => w =!= "").as("tk"))
    val bigrams = when(size(col("tk")) < 2, array().cast("array<string>"))
      .otherwise(expr("transform(sequence(1, size(tk)-1), " +
        "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i+1)))"))
    val grams = docs.select(col("doc_id"), col("source"),
      explode(concat(array_distinct(col("tk")),
        array_distinct(bigrams))).as("gram"))
      .select(col("doc_id"), col("source"),
        substring(md5(col("gram")), 1, 4).as("bucket"))
    val isT = col("source").isin(SelectionOps.targetSources: _*)
    val stats = grams.groupBy("bucket")
      .agg(sum(when(isT, 1L).otherwise(0L)).as("ct"),
        sum(when(!isT, 1L).otherwise(0L)).as("cr"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val nt = stats.valuesIterator.map(_._1).sum
    val nr = stats.valuesIterator.map(_._2).sum
    def microlog(b: String): Long = {
      val (ct, cr) = stats(b)
      math.floor((math.log(ct + 1.0) - math.log(cr + 1.0)
        + math.log(nr + 65536.0) - math.log(nt + 65536.0)) * 1e6 + 0.5).toLong
    }
    val got = SelectionOps.dsirWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val bucketsByDoc = grams.filter(!isT)
      .filter(col("doc_id").isin(got.keys.toSeq.take(5).map(Long.box): _*))
      .collect().map(r => r.getLong(0) -> r.getString(2))
    assert(bucketsByDoc.nonEmpty)
    bucketsByDoc.groupBy(_._1).foreach { case (docId, bs) =>
      val want = (bs.length.toLong, bs.map(b => microlog(b._2)).sum)
      assert(got(docId) == want, s"doc $docId: got ${got(docId)} want $want")
    }
  }

  test("dsir select: report is self-consistent and target-free") {
    val rows = SelectionOps.dsirSelect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nDocs, nSel, bp, mass) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(!SelectionOps.targetSources.contains(src))
      assert(nSel <= nDocs)
      assert(bp == nSel * 10000 / nDocs)
      assert((nSel == 0) == (mass == 0L))
      if (nSel > 0) assert(mass > 0L, s"$src: selected mass must be positive")
    }
    val top = SelectionOps.dsirWeights(spark, sfDir).collect()
    assert(top.forall(r => !SelectionOps.targetSources.contains(r.getString(1))))
    // top-100 is weight-sorted with the doc_id tiebreak
    val keys = top.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("temperature mix: flattens toward uniform, internally consistent") {
    val rows = SelectionOps.temperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length > 1)
    // α < 1 strictly flattens: any stratum under the mean share is
    // up-weighted, any stratum over it is down-weighted.
    val meanShare = 10000L / rows.length
    rows.foreach { case (lang, _, _, share, rate, drawn, epochs) =>
      if (share < meanShare) assert(rate > share, s"$lang must be up-weighted")
      if (share > meanShare) assert(rate < share, s"$lang must be down-weighted")
      assert(drawn == rate * 100000)
      assert(epochs == drawn * 1000 / rows.find(_._1 == lang).get._3)
    }
    // integer-division rates sum to ≤ 10000 with bounded truncation loss
    val rateSum = rows.map(_._5).sum
    assert(rateSum <= 10000 && rateSum >= 10000 - rows.length)
    // exact-integer output is repartition-invariant
    val d = copyDocs(_.repartition(5))
    assert(SelectionOps.temperatureMix(spark, d).collect().toSeq ==
      SelectionOps.temperatureMix(spark, sfDir).collect().toSeq)
  }

  test("dsir: an all-target corpus yields empty selections, no errors") {
    val d = copyDocs(_.withColumn("source", lit("src1")))
    assert(SelectionOps.dsirWeights(spark, d).collect().isEmpty)
    assert(SelectionOps.dsirSelect(spark, d).collect().isEmpty)
  }

  test("quality classifier: exact-integer scores are repartition-invariant") {
    val base = SelectionOps.qualityClassifier(spark, sfDir).collect().toSeq
    val d = copyDocs(_.repartition(7))
    assert(SelectionOps.qualityClassifier(spark, d).collect().toSeq == base)
    val pipeBase = SelectionOps.classifierPipeline(spark, sfDir).collect().toSeq
    assert(SelectionOps.classifierPipeline(spark, d).collect().toSeq == pipeBase)
  }

  test("quality classifier: the distilled scorer actually tracks its teacher") {
    // The NB linear scorer is fit on the integer-exact Gopher label; on
    // the corpus it was fit on, prediction (score > 0) must agree with
    // the teacher far better than the majority-class baseline — the
    // distillation working at all. Teacher recomputed independently
    // from raw tokens, not through the fitted path.
    val docs = Tables.t(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        split(col("text"), " ").as("tk0"))
      .select(col("doc_id"),
        size(filter(col("tk0"), x => x =!= "")).cast("long").as("n_words"),
        size(filter(col("tk0"),
          x => x.isin("the", "a", "of", "to", "and", "in", "is")))
          .cast("long").as("n_stop"),
        aggregate(transform(filter(col("tk0"), x => x =!= ""),
          w => length(w).cast("long")), lit(0L), (a, x) => a + x).as("sum_wlen"))
      .select(col("doc_id"),
        (col("n_words").between(30, 80) && col("n_stop") >= 2 &&
          col("sum_wlen") * 10 >= col("n_words") * 40 &&
          col("sum_wlen") * 10 <= col("n_words") * 50).as("teacher"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // score EVERY doc through the pipeline path (classifierPipeline
    // keeps score>0; the top-100 view is truncated) — rebuild from the
    // ops' own scored frame via the public queries: predicted-keep set
    // = pipeline's pre-mixture selection. Easiest faithful probe: docs
    // in q183's top-100 with score>0 must be teacher-keeps far above
    // the corpus base rate.
    val top = SelectionOps.qualityClassifier(spark, sfDir).collect()
      .filter(_.getLong(3) > 0).map(_.getLong(0))
    assert(top.nonEmpty, "no positive-scoring docs — vacuous fixture")
    val topAgree = top.count(docs(_)).toDouble / top.length
    val baseRate = docs.values.count(identity).toDouble / docs.size
    assert(topAgree >= 0.9,
      f"top-scored docs only $topAgree%.2f teacher-keep")
    assert(topAgree > baseRate + 0.2,
      f"no lift over base rate $baseRate%.2f")
  }
}

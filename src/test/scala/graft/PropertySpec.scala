package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5): algebraic invariants of the engine's
  * building blocks over generated inputs. Cases come from a fixed-seed
  * generator (scalatestplus bridge is not in the offline cache), so runs
  * are deterministic. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new scala.util.Random(42)
  private def word: String =
    (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def words(n: Int): List[String] = List.fill(n)(word)

  test("smart date key round-trips for every day of 2000-2001") {
    val bad = spark.sql(
      """SELECT * FROM (
        |  SELECT d, date_key,
        |    make_date(CAST(date_key / 10000 AS INT),
        |              CAST(date_key / 100 AS INT) % 100,
        |              date_key % 100) AS back
        |  FROM (SELECT d, year(d)*10000 + month(d)*100 + day(d) AS date_key
        |        FROM (SELECT explode(sequence(to_date('2000-01-01'),
        |                                      to_date('2001-12-31'))) AS d)))
        |WHERE back <> d""".stripMargin)
    assert(bad.count() == 0)
  }

  test("identical docs have identical shingle sets (jaccard = 1)") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val text = words(3 + rnd.nextInt(10)).mkString(" ")
      val sets = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
        .select(graft.llm.NearDupOps.shingles(col("text"), 3).as("s"))
        .collect().map(_.getSeq[String](0).toSet)
      assert(sets(0) == sets(1) && sets(0).nonEmpty)
    }
  }

  test("simhash is token-order invariant (same multiset, same hash)") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val ws = words(2 + rnd.nextInt(10))
      val a = ws.mkString(" ")
      val b = new scala.util.Random(rnd.nextInt()).shuffle(ws).mkString(" ")
      val r = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
        .select(graft.functions.HashKernels.simhash64(col("text")).as("s"))
        .collect().map(_.getLong(0))
      assert(r(0) == r(1), s"'$a' vs '$b'")
    }
  }

  test("md5 simhash is token-order invariant and parity-matches a JVM replay") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val ws = words(2 + rnd.nextInt(10))
      val a = ws.mkString(" ")
      val b = new scala.util.Random(rnd.nextInt()).shuffle(ws).mkString(" ")
      val r = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
        .select(graft.functions.HashKernels.simhash_md5(col("text")).as("s"))
        .collect().map(_.getLong(0))
      assert(r(0) == r(1), s"'$a' vs '$b'")
      // independent replay of the oracle arithmetic: per-token leading
      // MD5 half (big-endian == substr(md5(w),1,16)), ±1 votes, sign pack
      val votes = new Array[Int](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      a.split(' ').filter(_.nonEmpty).foreach { w =>
        md.reset()
        val d = md.digest(w.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
        (0 until 64).foreach(i =>
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1)
      }
      val expect = (0 until 64).foldLeft(0L)((acc, i) =>
        if (votes(i) > 0) acc | (1L << i) else acc)
      assert(r(0) == expect, s"kernel/replay divergence on '$a'")
    }
  }

  test("md5 winnowing keeps the shift-robustness of the Karp-Rabin form") {
    import spark.implicits._
    val base = words(40).mkString(" ")
    val shifted = "NEW PREFIX WORDS HERE " + base
    val other = (0 until 40).map(i => s"zzz$i").mkString(" ")
    val fps = Seq((0L, base), (1L, shifted), (2L, other))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.HashKernels.winnow_fingerprint_md5(col("text"), 8, 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    def overlap(a: Set[String], b: Set[String]) =
      a.intersect(b).size.toDouble / math.min(a.size, b.size)
    assert(overlap(fps(0L), fps(1L)) > 0.6,
      s"prefix-shifted doc must share most md5 fingerprints, got ${overlap(fps(0L), fps(1L))}")
    assert(overlap(fps(0L), fps(2L)) < 0.2)
    assert(fps(0L).forall(h => h.length == 16 && h.forall("0123456789abcdef".contains(_))),
      "fingerprints are fixed-width lowercase hex")
  }

  test("md5 gram kernels count code points, not UTF-16 units (non-BMP parity)") {
    import spark.implicits._
    // "𝕏" (U+1D54F) is a surrogate PAIR in the JVM but ONE code point to
    // ANSI substr/len — a code-unit-indexed gram would split it and break
    // the md5(substr(text,i,k)) oracle parity the kernels claim.
    val doc = "a𝕏b c𝄞d e𝕏f padding words"
    def cpGrams(s: String, k: Int): Seq[String] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - k).map(i =>
        new String(cps, i, k))
    }
    def md5hex(s: String, bytes: Int): String = {
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(bytes).map(b => f"$b%02x").mkString
    }
    // sampledGramDigests: deterministic — must equal the code-point replay
    val k = 4
    val expectSample = cpGrams(doc, k).map(md5hex(_, 16))
      .filter(_.startsWith("0")).distinct.sorted
    val gotSample = Seq(Tuple1(doc)).toDF("text")
      .select(graft.functions.HashKernels.sampled_gram_digests(col("text"), k).as("g"))
      .collect().head.getSeq[String](0)
    assert(gotSample == expectSample, s"sampled grams diverge from code-point replay")
    // winnowFingerprintMd5: every selected fingerprint must be the md5
    // prefix of SOME code-point gram (selection is a subset by design)
    val allCp = cpGrams(doc, 8).map(md5hex(_, 8)).toSet
    val gotWin = Seq(Tuple1(doc)).toDF("text")
      .select(graft.functions.HashKernels.winnow_fingerprint_md5(col("text"), 8, 4).as("fp"))
      .collect().head.getSeq[String](0).toSet
    assert(gotWin.nonEmpty && gotWin.subsetOf(allCp),
      "winnow md5 fingerprints must come from code-point grams")
    // length guard counts code points: 6 code points but 9 UTF-16 units —
    // a gram size of 7 must yield null (too short), not a split-surrogate gram
    val short = "𝕏𝕏𝕏abc" // 6 cps, 9 code units
    val r = Seq(Tuple1(short)).toDF("text")
      .select(graft.functions.HashKernels.winnow_fingerprint_md5(col("text"), 7, 4).as("fp"))
      .collect().head
    assert(r.isNullAt(0), "cp-length guard must null out 6-cp doc at n=7")
  }

  test("minhash of a token superset is elementwise <= (min monotone)") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val base = words(3 + rnd.nextInt(6))
      val small = base.mkString(" ")
      val big = (base ++ base.take(2) ++ words(1 + rnd.nextInt(4))).mkString(" ")
      val rows = Seq((0L, small), (1L, big)).toDF("doc_id", "text")
        .select(graft.functions.HashKernels.shingle_minhash(col("text"), 1, 16).as("sig"))
        .collect().map(_.getSeq[Long](0))
      assert(rows(0).zip(rows(1)).forall { case (s, b) => b <= s })
    }
  }

  test("hyperplane bucket is scale-invariant (depends on angle only)") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val v = Array.fill(8)((rnd.nextInt(201) - 100).toFloat / 10)
        match { case a if a.forall(_ == 0f) => a.updated(0, 1.0f); case a => a }
      val scaled = v.map(_ * 3.0f)
      val r = Seq((0L, v.toSeq), (1L, scaled.toSeq)).toDF("id", "v")
        .select(graft.functions.VectorFunctions.hyperplane_bucket(col("v"), 8).as("b"))
        .collect().map(_.getInt(0))
      assert(r(0) == r(1))
    }
  }

  test("char entropy is permutation-invariant and bounded by ln(distinct)") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val chars = (1 to (2 + rnd.nextInt(40)))
        .map(_ => ('a' + rnd.nextInt(12)).toChar).mkString
      val shuffled = new scala.util.Random(rnd.nextInt())
        .shuffle(chars.toList).mkString
      val rows = Seq((0L, chars), (1L, shuffled)).toDF("doc_id", "text")
        .select(graft.functions.HashKernels.char_stats(col("text")).as("cs"))
        .select(col("cs.n_chars"), col("cs.n_distinct_chars"),
          col("cs.entropy_nats"))
        .collect()
      // same char multiset → bit-identical stats (the kernel's ordered
      // accumulation makes this exact, not approximate)
      assert(rows(0) == rows(1), s"'$chars' vs '$shuffled'")
      val distinct = rows(0).getLong(1)
      val e = rows(0).getDouble(2)
      assert(e >= 0.0, "entropy is non-negative")
      assert(e <= math.log(distinct.toDouble) + 1e-12,
        s"entropy $e above ln($distinct)")
      assert(rows(0).getLong(0) == chars.length.toLong)
    }
  }

  test("char stats count Unicode code points, not UTF-16 code units") {
    import spark.implicits._
    // "a😀😀" = 3 code points (5 UTF-16 units): counts and entropy must
    // use the code-point view, matching DuckDB's length/string_split.
    val text = "a😀😀"
    val r = Seq((0L, text)).toDF("doc_id", "text")
      .select(graft.functions.HashKernels.char_stats(col("text")).as("cs"))
      .select(col("cs.n_chars"), col("cs.n_distinct_chars"), col("cs.entropy_nats"))
      .collect().head
    assert(r.getLong(0) == 3L, s"n_chars: got ${r.getLong(0)}, want 3 code points")
    assert(r.getLong(1) == 2L)
    val p1 = 1.0 / 3; val p2 = 2.0 / 3
    val want = 0.0 - (p1 * math.log(p1) + p2 * math.log(p2))
    assert(math.abs(r.getDouble(2) - want) < 1e-12,
      s"entropy: got ${r.getDouble(2)}, want $want")
  }
}

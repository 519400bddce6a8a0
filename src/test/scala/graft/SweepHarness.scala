package graft

/** Shared driver for the catalog robustness sweeps (EmptyInputSpec /
  * NullInputSpec / DegenerateCorpusSpec): run every catalog query over
  * a synthesized fixture dir and harvest root-cause failure lines.
  *
  * Materializes through the NOOP SINK, exactly like Bench/Verify — a
  * `count()` would let Catalyst prune projection-only columns (a
  * fingerprint or norm column nothing aggregates) and the sweep would
  * under-test precisely the kernels the shipped harness executes.
  */
object SweepHarness {

  def sweepCatalog(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        var root: Throwable = e
        while (root.getCause != null && root.getCause != root)
          root = root.getCause
        Some(s"$name -> ${root.getClass.getSimpleName}: " +
          String.valueOf(root.getMessage).linesIterator.take(1).mkString)
      }
    }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, ShingleHash, TextFns}
import graft.sources.Tables

/**
 * Stage-level decomposition of the `dedup_containment` contract row —
 * the suite's widest rep spread (round-11 verdict task 6: idle reps
 * 2.13/2.67/4.85 s). The query is one fused pipeline
 * ([[Dedup.ngramContainment]]), so the bench can only see its total;
 * this main re-runs the SAME pipeline with a hard materialization
 * boundary after each internal stage and times them separately across
 * reps, so the stage carrying the spread is identifiable.
 *
 * MIRRORS [[Dedup]]'s private verifiedPairs stage-for-stage (inverted
 * h28 index → bound-prefiltered candidates → survivor string sets →
 * exact verify); if that pipeline changes shape, change this too — it
 * is a diagnostic, not a contract.
 *
 *   sbt "runMain graft.ProbeContainment /root/testdata/sf0.1 6"
 */
object ProbeContainment {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(6)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the contract row's corpus: documents + 18-word prefix copies
    def corpus() = {
      val d = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      d.unionByName(d.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          array_join(slice(TextFns.words(col("text")), 1, 18), " ")
            .as("text")))
    }

    val runs = (1 to reps).map { r =>
      val df = corpus()
      // stage 1: the checkpointed 28-bit inverted index
      val inv = df.select(col("doc_id"),
        explode(ShingleHash.h28(col("text"))).as("h"))
        .localCheckpoint(false)
      val t1 = time(inv.count())
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
      // stage 2: self-join candidates + hash-bound prefilter, checkpointed
      val cand = inv.select(col("doc_id").as("doc_a"), col("h"))
        .join(inv.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_approx"))
        .filter(col("inter_approx") >= 2)
        .join(sizes.select(col("doc_id").as("doc_a"),
          col("__n").as("__na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"),
          col("__n").as("__nb")), "doc_b")
        .filter(col("inter_approx").cast("double") /
          least(col("__na"), col("__nb")) >= 0.9)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(false)
      val t2 = time(cand.count())
      // stage 3: survivors' full shingle STRING sets, checkpointed
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val candSets = df.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), TextFns.shingles(col("text")).as("sset"))
        .localCheckpoint(false)
      val t3 = time(candSets.count())
      // stage 4: the exact verify joins + score filter
      val t4 = time(
        cand.join(candSets.select(col("doc_id").as("doc_a"),
            col("sset").as("sa")), "doc_a")
          .join(candSets.select(col("doc_id").as("doc_b"),
            col("sset").as("sb")), "doc_b")
          .withColumn("containment",
            size(array_intersect(col("sa"), col("sb"))).cast("double") /
              least(size(col("sa")), size(col("sb"))))
          .filter(col("containment") >= 0.9)
          .write.format("noop").mode("overwrite").save())
      // free this rep's checkpoint blocks so reps do not accumulate
      // block-manager pressure (the suspected spread mechanism is
      // cleaner-timing dependence — measure both with and without)
      if (sys.env.get("SPARK_GRAFT_CONTAIN_UNPERSIST").forall(_ == "1")) {
        inv.unpersist(); cand.unpersist(); candSets.unpersist()
      }
      // whole-query control: the contract row itself, same JVM
      val t5 = time(SparkEntry.queries("dedup_containment")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      (r, t1, t2, t3, t4, t5)
    }
    val cols = Seq("inv", "cand", "candSets", "verify", "whole")
    val line = "{" + cols.zipWithIndex.map { case (c, i) =>
      s""""$c":[${runs.map(t => t.productElement(i + 1).toString)
        .mkString(",")}]"""
    }.mkString(",") + s""","sf":"$sfDir","reps":$reps}"""
    println(line)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/**
 * Quantizer-quality sweep for the IVF ANN operating point: builds the
 * k-means index at several training configurations (Lloyd's iterations ×
 * training-sample density) over the given corpus and reads recall@5 +
 * probe seconds across widening nProbe — the experiment behind the
 * round-13 operating-point move (the round-12 artifact showed recall@5
 * 0.518 at 100× with cost flat across nProbe 2→64, i.e. the quantizer,
 * not the probe budget, was binding).
 *
 *   sbt "runMain graft.ProbeAnnSweep /tmp/sfx100 2,4:4,4:8,4"
 *
 * arg2: colon-separated iters,trainMod pairs (default "2,4:4,4:8,4").
 */
object ProbeAnnSweep {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // iters,trainMod[,K] triples — K defaults to the label-cell count
    val configs = args.lift(1).getOrElse("2,4:4,4:8,4").split(":").toSeq
      .map { s =>
        val p = s.split(",")
        (p(0).toInt, p(1).toInt, p.lift(2).map(_.toInt))
      }
    val nProbes = args.lift(2).getOrElse("32,64,128,256").split(",")
      .toSeq.map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-sweep")

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val probes = emb.orderBy(col("vec_id")).limit(200)
      .select(col("vec_id").as("probe_id"), col("embedding").as("__pv"))
      .localCheckpoint()
    val exact = Similarity.knnJoinWith(emb, probes, "vec_id",
      "embedding", k = 5, excludeSelf = true).localCheckpoint()
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.recallAtK(df, exact)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      math.rint(r * 1000) / 1000
    }

    val labelCells = emb.select(col("label")).distinct().count().toInt
    println(s"nVec=${emb.count()} labelCells=$labelCells")
    configs.foreach { case (iters, trainMod, kOpt) =>
      val kCells = kOpt.getOrElse(labelCells)
      val path = s"$tmp/km_${iters}_${trainMod}_$kCells"
      val buildSec = time {
        val labeled = emb.join(
          Similarity.kmeansLabels(emb, "vec_id", "embedding", k = kCells,
            iters = iters, trainMod = trainMod, superAssign = -1),
          Seq("vec_id"))
        Similarity.buildIvfIndex(labeled, "vec_id", "embedding", "cell",
          path, dims = 64)
      }
      val superProbe = sys.env.get("SPARK_GRAFT_SWEEP_SUPER")
        .flatMap(_.toIntOption).getOrElse(-1)
      val line = nProbes.map { np =>
        val q = Similarity.ivfKnnJoinIndexed(spark, path, probes,
          "vec_id", "embedding", "cell", k = 5, nProbe = np,
          superProbe = superProbe)
          .localCheckpoint(false)
        val sec = time(q.count())
        f"np=$np r=${recall(q)}%.3f s=$sec%.2f"
      }.mkString(" | ")
      println(f"CONFIG iters=$iters trainMod=$trainMod K=$kCells " +
        f"build=$buildSec%.1f :: $line")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Similarity, TextFns}
import graft.streaming.StreamOps

/** Round-9 fixes: cell-type preservation through the assignment path,
  * and the LM gate's treatment of docs with no score row. */
class Round9OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- assignAgainst: output cell type follows the centers frame ----

  test("assignAgainst preserves a long-celled index's cell type and values") {
    import spark.implicits._
    // cell ids past Int.MaxValue: the round-8 path cast through int and
    // would both truncate these values AND emit an INT32 'cell' column
    // that a later append would lay beside INT64 parquet files
    val bigA = 5000000000L
    val bigB = 6000000000L
    val centers = Seq(
      (bigA, Array(1.0, 0.0, 0.0, 0.0)),
      (bigB, Array(0.0, 1.0, 0.0, 0.0)))
      .toDF("__cell", "__center")
    val batch = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero-norm → cell -1
      .toDF("vec_id", "embedding")
    val out = Similarity.assignAgainst(centers, batch, "vec_id", "embedding")
    assert(out.schema("cell").dataType == LongType,
      "assigned cell column must carry the centers' cell type")
    val cells = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == Map(1L -> bigA, 2L -> bigB, 3L -> -1L), s"$cells")
  }

  test("assignAgainst still emits int cells for an int-celled (k-means) index") {
    import spark.implicits._
    val centers = Seq(
      (0, Array(1.0, 0.0, 0.0, 0.0)),
      (1, Array(0.0, 1.0, 0.0, 0.0)))
      .toDF("__cell", "__center")
    val batch = Seq((7L, Array(0.9f, 0.2f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.assignAgainst(centers, batch, "vec_id", "embedding")
    assert(out.schema("cell").dataType == IntegerType)
    assert(out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(7L -> 0))
  }

  // ---- LM gate: docs with no score row pass through, not vanish ----

  test("lmGate keeps a doc with no score row (null LM columns), drops low scores") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then the " +
      "cat naps while a bird sings songs about the warm summer day outside"
    val oov = "lorem ipsum dolor sit amet consectetur adipiscing elit sed " +
      "do eiusmod tempor incididunt ut labore et dolore magna aliqua"
    val model = TextFns.unigramModel(Seq(base).toDF("text"), "text")
    // doc 9's text is NULL: words(null) explodes to zero rows, so the
    // scorer emits NO row for it — the round-8 inner join dropped it
    // silently at ANY threshold, including the permissive 0.0 default
    val admitted = Seq((1L, base), (7L, oov), (9L, null: String))
      .toDF("doc_id", "text")
    val scores = TextFns.unigramLmScoreAgainst(model, admitted,
      "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("hm_prob")).toMap
    assert(!scores.contains(9L), "fixture: null text must yield no score row")
    assert(scores(7L) < scores(1L), "fixture: OOV doc must score lower")

    val permissive = StreamOps.lmGate(admitted, model, "doc_id", "text",
      minHmProb = 0.0)
    assert(permissive.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 7L, 9L), "0.0 threshold must pass every doc incl. token-less")
    assert(permissive.filter(col("doc_id") === 9L)
      .select("hm_prob", "n_tokens", "n_oov").collect()
      .forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)),
      "token-less doc must carry null LM columns")

    val thr = (scores(7L) + scores(1L)) / 2.0
    val strict = StreamOps.lmGate(admitted, model, "doc_id", "text", thr)
    assert(strict.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 9L),
      "threshold drops scored-low docs but not the token-less doc")
  }

  // ---- pruned k-means final assignment (superAssign) ----

  private def kmFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    // 4 well-separated axis clusters + jitter + one zero-norm vector
    (1 to 120).map { i =>
      val axis = i % 4
      val v = Array.tabulate(8)(d =>
        (if (d == axis * 2) 1.0f else 0.0f) + rnd.nextFloat() * 0.05f)
      (i.toLong, v)
    } :+ (999L, Array.fill(8)(0.0f))
  }

  test("kmeansLabels superAssign: degenerate width is bit-identical to exact") {
    import spark.implicits._
    val df = kmFixture.toDF("vec_id", "embedding")
    def labels(sa: Int) = Similarity.kmeansLabels(df, "vec_id",
      "embedding", k = 8, iters = 2, dims = 8, superAssign = sa,
      superBits = 2, superOffset = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = labels(0)
    // superAssign >= 2^superBits selects every supercell ⟹ every center
    // is scored with the same arithmetic and tie-break — bit-identical
    assert(labels(4) == exact,
      "degenerate pruned assignment must equal the exact assignment")
    assert(exact(999L) == -1, "zero-norm vector must get cell -1")
  }

  test("kmeansLabels superAssign: pruned path labels every vector, auto respects crossover") {
    import spark.implicits._
    val df = kmFixture.toDF("vec_id", "embedding")
    val exact = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 8,
      iters = 2, dims = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // width 3 of 4 supercells: a real cut (the degenerate-parity test
    // covers width = all), still expected to preserve most labels on
    // separated clusters — the dim-8 fixture's LSH bits are noisy, so
    // the bar is deliberately below the 64-dim production setting's
    val pruned = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 8,
      iters = 2, dims = 8, superAssign = 3, superBits = 2, superOffset = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pruned.keySet == exact.keySet,
      "pruning must not drop vectors (incl. the zero-norm row)")
    assert(pruned(999L) == -1)
    // pruning can only reassign WITHIN the scored subset: on separated
    // clusters the overwhelming majority of labels must agree
    val agree = exact.count { case (id, c) => pruned(id) == c }
    assert(agree >= (exact.size * 0.85).toInt,
      s"pruned labels diverged too far: $agree/${exact.size}")
    // auto: k=8 is under the crossover — must be the exact plan
    val auto = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 8,
      iters = 2, dims = 8, superAssign = -1, superBits = 2,
      superOffset = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(auto == exact, "auto below the crossover must stay exact")
  }
}

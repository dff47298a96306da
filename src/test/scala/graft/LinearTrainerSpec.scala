package graft

import graft.llm.LinearTrainer
import org.apache.spark.sql.functions._

/** Hinge-subgradient trainer laws the DuckDB step-replay oracle can't
  * isolate: convergence on a separable corpus, prediction self-consistency,
  * and the trajectory's shape invariants. */
class LinearTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.table(spark, sf, "documents")

  /** Linearly separable toy corpus: 'en' docs speak one vocabulary, the
    * rest another, disjoint — a linear gate must separate them. */
  private def separable = Seq(
    (0L, "alpha beta alpha", "en", "s0"),
    (1L, "beta alpha beta beta", "en", "s0"),
    (2L, "alpha alpha", "en", "s1"),
    (3L, "gamma delta gamma", "fr", "s0"),
    (4L, "delta delta gamma", "de", "s1"),
    (5L, "gamma gamma delta delta", "zh", "s1"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("train: violations hit zero on a separable corpus and classify scores 100%") {
    val traj = LinearTrainer.train(separable, d = 16, steps = 10)
      .select(col("step"), col("n_viol")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(traj.head._2 > 0L, "step 1 must see violations (w0 = 0 violates everything)")
    assert(traj.last._2 == 0L,
      s"separable corpus must converge to zero violations within 10 steps: ${traj.toSeq}")
    val cls = LinearTrainer.classify(separable, d = 16, steps = 10)
    assert(cls.filter(col("correct") === 0L).count() == 0L,
      "a converged separator must classify its own training set perfectly")
  }

  test("train: fixture trajectory is well-formed — full step x dim grid, one n_viol per step, updates move") {
    val t = LinearTrainer.train(docs)
    assert(t.count() == 3L * 16L)
    assert(t.select("step", "dim").distinct().count() == 48L)
    assert(t.groupBy("step").agg(countDistinct("n_viol").as("k"))
      .filter(col("k") =!= 1L).count() == 0L,
      "n_viol is a per-step scalar, identical across the step's dim rows")
    assert(t.filter(col("step") === 1L && col("w_micro") =!= 0L).count() > 0L,
      "step 1 must move at least one weight off zero (else the gradient path is dead)")
  }

  test("classify: one feature-pipeline materialization per call (train + scoring share the checkpoint)") {
    LinearTrainer.featureBuilds.set(0L)
    LinearTrainer.classify(separable, d = 16, steps = 3).count()
    assert(LinearTrainer.featureBuilds.get() == 1L,
      "classify must build/checkpoint the feature table exactly once and share it with the training loop")
  }

  test("train: Observation n_viol matches an independent recount of the step-1 margin violations") {
    // step 1: w = 0 everywhere, so every doc with a nonzero feature row
    // violates y*0 < 1e6 — i.e. n_viol(step 1) = count of docs with >= 1
    // feature. Recomputed independently of the Observation plumbing.
    val t = LinearTrainer.train(separable, d = 16, steps = 1)
    val nViol1 = t.filter(col("step") === 1L).select("n_viol").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(nViol1 == Seq(6L),
      s"all 6 separable docs violate the zero-weight margin; Observation saw $nViol1")
  }

  test("classify: pred is the margin sign, correct is the label match, all docs scored") {
    val c = LinearTrainer.classify(docs)
    assert(c.count() == docs.count())
    val bad = c.filter(
      (col("margin_micro") > 0L && col("pred") =!= 1L) ||
      (col("margin_micro") <= 0L && col("pred") =!= -1L) ||
      (col("pred") === col("label")) =!= (col("correct") === 1L))
    assert(bad.count() == 0L)
  }
}

package graft

import java.sql.Timestamp

import graft.operators.{ConnectedComponents, IntervalJoin}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for the distributed graph/temporal operators:
  * each case checks the Spark operator against a direct in-memory reference
  * implementation (naive pair filter; union-find), so counterexamples
  * shrink to minimal failing inputs. */
object OperatorProps extends Properties("operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genEvent: Gen[(Long, Long, Long)] = for {
    user <- Gen.choose(1L, 3L)
    // seconds within ~3 horizons so pairs straddle bin boundaries
    sec <- Gen.choose(0L, 900L)
  } yield (user, sec, sec) // event_id fixed up after (must be unique)

  property("interval join == naive in-memory pair filter") =
    Prop.forAll(Gen.listOfN(12, genEvent)) { raw =>
      val events = raw.zipWithIndex.map { case ((u, sec, _), i) =>
        (u, i.toLong, new Timestamp(1700000000000L + sec * 1000)) }
      val df = events.toDF("user_id", "event_id", "ts")
      val got = IntervalJoin.pairsWithin(df, 300)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val expected = (for {
        (ua, ia, ta) <- events
        (ub, ib, tb) <- events
        if ua == ub && ia != ib &&
          tb.getTime >= ta.getTime && tb.getTime <= ta.getTime + 300000L
      } yield (ia, ib)).toSet
      Prop(got == expected) :| s"got $got expected $expected"
    }

  /** Reference union-find. */
  private def ufLabels(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.listOfN(10, for {
      a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L) if a != b
    } yield (a, b))

  property("connected components == union-find reference") =
    Prop.forAll(genEdges) { edges =>
      val nodes = (0L until 10L).toDF("id")
      val edgeDf = edges.toDF("src", "dst")
      val got = ConnectedComponents(nodes, edgeDf)
        .as[(Long, Long)].collect().toMap
      val expected = ufLabels(10, edges)
      Prop(got == expected) :| s"got $got expected $expected"
    }

  property("alternating-fallback path == union-find reference (hash-min budget 1)") =
    Prop.forAll(genEdges) { edges =>
      // maxIter=1 forces the large-star/small-star fallback on (almost)
      // every non-trivial graph, so the property exercises contraction +
      // alternation + label join-back rather than plain hash-min
      val nodes = (0L until 10L).toDF("id")
      val got = ConnectedComponents(nodes, edges.toDF("src", "dst"), maxIter = 1)
        .as[(Long, Long)].collect().toMap
      val expected = ufLabels(10, edges)
      Prop(got == expected) :| s"got $got expected $expected"
    }
}

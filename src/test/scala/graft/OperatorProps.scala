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

  /** Clustered 32-bit fingerprints: a few base values, each perturbed by
    * flipping 0-6 random bit positions — Hamming distances straddle the
    * ≤3 banding boundary from both sides, so the property is never
    * vacuous (uniform random 32-bit values almost never pair within 3). */
  private val genFingerprints: Gen[List[Long]] = {
    val cluster = for {
      base <- Gen.choose(0L, (1L << 32) - 1)
      members <- Gen.listOfN(4,
        Gen.choose(0, 6).flatMap(k => Gen.listOfN(k, Gen.choose(0, 31))))
    } yield members.map(_.foldLeft(base)((v, b) => v ^ (1L << b)))
    Gen.listOfN(3, cluster).map(_.flatten)
  }

  property("simhash banding == brute-force Hamming<=3 over arbitrary fingerprints") =
    Prop.forAll(genFingerprints) { fps =>
      // the pigeonhole claim is encoding-blind — it must hold for ANY
      // fingerprint assignment, not just ones simhash produces
      val rows = fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      val got = graft.llm.Dedup.simhashPairsOf(rows.toDF("doc_id", "simhash"), 3)
        .as[(Long, Long, Long)].collect().toSet
      val expected = (for {
        (fa, ia) <- rows.map(r => (r._2, r._1))
        (fb, ib) <- rows.map(r => (r._2, r._1))
        if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
      } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
      Prop(got == expected) :| s"got ${got.size} expected ${expected.size}"
    }

  // duplicates on purpose: ties are the skyline's fiddly case (all copies
  // of a frontier point must survive; neither copy dominates the other)
  private val genPoints: Gen[List[(Long, Double)]] =
    Gen.listOfN(14, for {
      x <- Gen.choose(0L, 6L)
      y <- Gen.choose(0, 6).map(_.toDouble)
    } yield (x, y))

  property("skyline == brute NOT-EXISTS domination, any partitioning, ties kept") =
    Prop.forAll(genPoints, Gen.choose(1, 5)) { (pts, parts) =>
      val rows = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val df = rows.toDF("id", "x", "y").repartition(parts)
      val got = graft.operators.Skyline(df, "x", "y")
        .select("id").as[Long].collect().toSet
      val expected = rows.filter { case (_, x, y) =>
        !rows.exists { case (_, ux, uy) =>
          ux >= x && uy >= y && (ux > x || uy > y) }
      }.map(_._1).toSet
      Prop(got == expected) :| s"got $got expected $expected (parts=$parts)"
    }

  property("probeMediaSafe never raises on arbitrary bytes — fuzz the codec gate") =
    // random byte blobs (incl. prefixes that LOOK like valid magics)
    // through every dispatch arm: the contract is one row per payload,
    // decode_ok=false with null units on rejects, and NO exception —
    // the 100 TB guarantee the quarantine path rests on
    Prop.forAll(
      Gen.listOfN(6, for {
        n <- Gen.choose(0, 64)
        bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        magic <- Gen.oneOf(Array.emptyByteArray,
          "GIF89a".getBytes("US-ASCII"), "RIFF".getBytes("US-ASCII"),
          Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
        fmt <- Gen.oneOf("png", "jpeg", "wav", "gif")
      } yield (magic ++ bytes.toArray, fmt))) { blobs =>
      val media = blobs.zipWithIndex
        .map { case ((b, f), i) => (i.toLong, b, f) }
        .toDF("doc_id", "payload", "format")
      val out = graft.llm.Multimodal.probeMediaSafe(media).collect()
      val allFlagged = out.forall { r =>
        r.getBoolean(r.fieldIndex("decode_ok")) ||
          r.isNullAt(r.fieldIndex("n_units"))
      }
      Prop(out.length == blobs.length && allFlagged) :|
        s"rows=${out.length} of ${blobs.length}"
    }

  property("shuffleShards is a partition-invariant permutation for any id set") =
    Prop.forAll(Gen.listOfN(20, Gen.choose(1L, 1000000L)), Gen.choose(1, 4)) {
      (rawIds, parts) =>
        val ids = rawIds.distinct
        val docs = ids.map(i => (i, "t")).toDF("doc_id", "text")
        val out = graft.llm.TextAnalysis.shuffleShards(docs, 4)
          .as[(Long, Long, Long)].collect()
        val out2 = graft.llm.TextAnalysis.shuffleShards(docs.repartition(parts), 4)
          .as[(Long, Long, Long)].collect()
        val dense = out.groupBy(_._2).forall { case (_, g) =>
          g.map(_._3).sorted.sameElements(1L to g.length) }
        Prop(out.sortBy(_._1).sameElements(out2.sortBy(_._1)) &&
          out.length == ids.length && dense) :| s"out=${out.toList}"
    }
}

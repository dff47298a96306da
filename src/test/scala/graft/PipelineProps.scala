package graft

import java.sql.Timestamp

import graft.cdr.CdrPipeline
import graft.streaming.CsvCodec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants (SURVEY §5.4) over generated CDR micro-batches.
  * Each case runs real Spark jobs, so cases are small and minSuccessful is
  * tuned down — the point is shrinkable counterexamples on edge semantics
  * (null routing, empty ip lists, separator corner cases), not volume. */
object PipelineProps extends Properties("cdr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genToken: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(8))

  private val genIpList: Gen[String] = for {
    ips <- Gen.listOfN(3, Gen.option(genToken))
    lead <- Gen.oneOf("", ";")
    trail <- Gen.oneOf("", ";")
  } yield ips.flatten.mkString(lead, ";", trail)

  private val genCdr: Gen[(Timestamp, String, Option[Long], Option[Long], String, Long)] = for {
    epoch <- Gen.choose(1653475440000L, 1779705840000L) // reference time domain
    probe <- genToken.map(t => (t + "xx").take(6))
    imsi <- Gen.option(Gen.choose(1L, 999999L))
    msisdn <- Gen.option(Gen.choose(1L, 999999L))
    ips <- genIpList
    id <- Gen.choose(1L, 50L) // small key space forces dedup collisions
  } yield (new Timestamp(epoch), probe, imsi, msisdn, ips, id)

  private val genBatch = Gen.listOfN(20, genCdr)

  private def df(rows: List[(Timestamp, String, Option[Long], Option[Long], String, Long)]) =
    rows.toDF("start_time", "measuring_probe_name", "imsi", "msisdn",
      "ms_ip_address", "unique_cdr_id")

  property("csv roundtrip is the identity on well-formed CDRs (up to '' ≡ NULL)") =
    Prop.forAll(genBatch) { rows =>
      val src = df(rows)
      // the wire CANNOT represent an empty string distinctly from NULL:
      // null-literal='' encodes both as an empty field and decode reads an
      // empty field as NULL (reference parity — CsvCodec scaladoc). An
      // all-None ip list with no separators produces exactly such a "" (it
      // falsified this property ~1-in-5 suite runs before canonicalizing),
      // so the identity holds up to ''→NULL. Only ms_ip_address needs the
      // canonicalization: genToken is non-empty, so probe never is.
      val expected = src
        .withColumn("ms_ip_address",
          when(col("ms_ip_address") === "", lit(null)).otherwise(col("ms_ip_address")))
      val decoded = CsvCodec.decode(src.select(CsvCodec.encode(src).as("value")))
      decoded.exceptAll(expected).isEmpty && expected.exceptAll(decoded).isEmpty
    }

  property("explode emits exactly the non-empty trimmed tokens") =
    Prop.forAll(genBatch) { rows =>
      val out = CdrPipeline.explodeIps(df(rows)).select("ip").as[String].collect()
      val expected = rows.flatMap(_._5.split(";").map(_.trim).filter(_.nonEmpty))
      out.sorted.toSeq == expected.sorted && out.forall(_.nonEmpty)
    }

  property("branch gates partition every batch; full pipeline emits n1 + distinct nullish keys") =
    Prop.forAll(genBatch) { rows =>
      val src = df(rows)
      val imsiDim = Seq((1L, 10L)).toDF("imsi", "msisdn")
      val msIpDim = Seq((new Timestamp(0L), 2L, 20L, "aa", "tok"))
        .toDF("start_time", "imsi", "msisdn", "probe", "ip")
      val out = CdrPipeline.full(src, imsiDim, msIpDim)
      val n1 = rows.count(_._3.isDefined)
      // an imsi-null row with zero non-empty ip tokens is dropped by the
      // inner-LATERAL explode (reference semantics), so it contributes no key
      val n2 = rows.filter(r => r._3.isEmpty &&
        r._5.split(";").map(_.trim).exists(_.nonEmpty)).map(_._6).distinct.size
      out.count() == n1 + n2
    }

  property("dedup emits one row per key, never with _start_time > event time") =
    Prop.forAll(genBatch) { rows =>
      val ext = CdrPipeline.extendWithPartitionCols(df(rows))
      val dim = rows.take(5).map(r =>
        (r._1, 7L, 70L, r._2.take(2), r._5.split(";").map(_.trim).find(_.nonEmpty).getOrElse("x")))
        .toDF("start_time", "imsi", "msisdn", "probe", "ip")
      val joined = CdrPipeline.rangeEnrich(
        CdrPipeline.explodeIps(ext.filter(col("imsi").isNull)), dim, "left_outer")
      val dd = CdrPipeline.dedupLatest(joined)
      val perKey = dd.groupBy("unique_cdr_id").count().filter(col("count") > 1).count()
      val violations = joined.filter(col("_start_time") > col("start_time")).count()
      perKey == 0L && violations == 0L
    }
}

package graft.llm

import java.nio.charset.StandardCharsets

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal WARC/1.0 (ISO 28500) record codec over in-memory containers —
  * the web-archive format LLM crawl corpora (Common Crawl and its
  * derivatives) actually arrive in.
  *
  * The parser is Content-Length-DRIVEN and binary-safe: header lines are
  * read byte-wise to CRLF, then exactly `Content-Length` payload bytes are
  * sliced without inspection, then the record's closing CRLFCRLF is
  * required. No delimiter scanning through payload bytes — a payload that
  * itself contains "WARC/1.0" is handled correctly, which is precisely
  * where regex/split-based readers corrupt crawl data. Malformed framing
  * (bad version line, missing/overrunning Content-Length, truncated
  * terminator) throws IllegalArgumentException naming the offset — the
  * poison-gate wrapper upstream turns that into a quarantine row, never a
  * job kill (the [[Multimodal]] safe-decode convention).
  */
object WarcCodec {

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** One parsed record: type + headers of interest + payload slice. */
  final case class Rec(warcType: String, recordId: String,
      targetUri: String, payload: Array[Byte])

  /** Serialize records: (warc-type, extra headers in order, payload). */
  def build(records: Seq[(String, Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def line(s: String): Unit = {
      bos.write(s.getBytes(StandardCharsets.US_ASCII)); bos.write(Crlf)
    }
    records.foreach { case (wtype, headers, payload) =>
      line("WARC/1.0")
      line(s"WARC-Type: $wtype")
      headers.foreach { case (k, v) => line(s"$k: $v") }
      line(s"Content-Length: ${payload.length}")
      bos.write(Crlf)
      bos.write(payload)
      bos.write(Crlf); bos.write(Crlf)
    }
    bos.toByteArray
  }

  /** Parse a container; strict framing, trailing garbage is an error. */
  def parse(bytes: Array[Byte]): IndexedSeq[Rec] = {
    val out = IndexedSeq.newBuilder[Rec]
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WARC: $msg at offset $i")
    def readLine(): String = {
      val start = i
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, start, i - start, StandardCharsets.US_ASCII)
      i += 2
      s
    }
    while (i < bytes.length) {
      if (readLine() != "WARC/1.0") fail("bad version line")
      var wtype = ""; var rid = ""; var uri = ""; var clen = -1L
      var h = readLine()
      while (h.nonEmpty) {
        val sep = h.indexOf(':')
        if (sep < 0) fail(s"malformed header '$h'")
        val k = h.substring(0, sep).trim.toLowerCase
        val v = h.substring(sep + 1).trim
        k match {
          case "warc-type" => wtype = v
          case "warc-record-id" => rid = v
          case "warc-target-uri" => uri = v
          case "content-length" =>
            clen = try v.toLong catch {
              case _: NumberFormatException => fail(s"bad Content-Length '$v'")
            }
          case _ => () // other headers carried, not interpreted
        }
        h = readLine()
      }
      if (clen < 0) fail("missing Content-Length")
      if (i + clen + 4 > bytes.length) fail(s"payload of $clen bytes overruns container")
      val payload = java.util.Arrays.copyOfRange(bytes, i, (i + clen).toInt)
      i += clen.toInt
      if (!(bytes(i) == '\r' && bytes(i + 1) == '\n'
          && bytes(i + 2) == '\r' && bytes(i + 3) == '\n'))
        fail("missing record terminator")
      i += 4
      out += Rec(wtype, rid, uri, payload)
    }
    out.result()
  }
}

/** WARC ingestion as a Spark pipeline: documents → bounded per-(source,
  * shard) containers → parsed record stream → per-source ingest report.
  * The fixture writes its own containers from the documents table (the
  * [[Multimodal.realShardTable]] convention: synthetic payloads, REAL
  * codec), so the oracle can pin the parsed output against the raw table
  * — every count/byte the parser reports is re-derivable in SQL.
  *
  * Scale shape: containers are bounded at [[docsPerShard]] documents, so
  * collect_list state per group is capped and containers stream through
  * executors at a fixed memory envelope no matter the corpus size; the
  * build/parse are per-partition codec work (mapPartitions — the
  * legitimate imperative tier), everything around them is declarative.
  * At 100 TB the same two maps run over object-store shards instead of
  * in-memory columns; nothing in the plan changes. */
object WarcIngest {

  /** Container capacity — bounds the per-group collect_list state. */
  val docsPerShard = 50

  private val containerSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("shard", LongType),
    StructField("payload", BinaryType)))

  private val recordSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("shard", LongType),
    StructField("doc_id", LongType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType)))

  /** One WARC container per (source, doc_id div docsPerShard): a warcinfo
    * record then one response record per document, docs in doc_id order so
    * container bytes are deterministic. */
  def containers(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(containerSchema)
    docs
      .select(col("source"), expr(s"doc_id div $docsPerShard").as("shard"),
        struct(col("doc_id"), col("text")).as("rec"))
      .groupBy(col("source"), col("shard"))
      .agg(sort_array(collect_list(col("rec"))).as("recs"))
      .mapPartitions { rows =>
        rows.map { r =>
          val source = r.getString(0)
          val shard = r.getLong(1)
          val recs = r.getSeq[Row](2)
          val body = recs.map { d =>
            val id = d.getLong(0)
            val payload = Option(d.getString(1)).getOrElse("")
              .getBytes(StandardCharsets.UTF_8)
            ("response", Seq(
              "WARC-Record-ID" -> s"<urn:graft:doc-$id>",
              "WARC-Target-URI" -> s"https://$source.example.org/doc/$id"),
              payload)
          }
          val info = ("warcinfo", Seq(
            "WARC-Record-ID" -> s"<urn:graft:shard-$source-$shard>"),
            s"software: graft\nshard: $source/$shard\n"
              .getBytes(StandardCharsets.UTF_8))
          Row(source, shard, WarcCodec.build(info +: body))
        }
      }(enc)
  }

  /** Parse containers to the response-record stream; the doc id is read
    * BACK out of the WARC-Record-ID urn — row-level parse parity, not an
    * echo of carried columns. */
  def records(containers: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(recordSchema)
    containers.select(col("source"), col("shard"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          WarcCodec.parse(r.getAs[Array[Byte]](2))
            .filter(_.warcType == "response")
            .map { rec =>
              val id = rec.recordId.stripPrefix("<urn:graft:doc-")
                .stripSuffix(">").toLong
              Row(r.getString(0), r.getLong(1), id, rec.targetUri,
                rec.payload.length.toLong)
            }
        }
      }(enc)
  }

  /** Poison-gated twin of [[records]]: a malformed container becomes ONE
    * quarantine row (`ok = false`, the error text) instead of a job-killing
    * exception; good containers flow through unchanged. */
  def recordsSafe(containers: DataFrame): DataFrame = {
    val schema = recordSchema.add("ok", BooleanType).add("err", StringType)
    val enc = RowEncoder.encoderFor(schema)
    containers.select(col("source"), col("shard"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          try WarcCodec.parse(r.getAs[Array[Byte]](2))
            .filter(_.warcType == "response")
            .map { rec =>
              val id = rec.recordId.stripPrefix("<urn:graft:doc-")
                .stripSuffix(">").toLong
              Row(r.getString(0), r.getLong(1), id, rec.targetUri,
                rec.payload.length.toLong, true, null)
            }
          catch {
            case e: IllegalArgumentException =>
              Seq(Row(r.getString(0), r.getLong(1), null, null, null, false,
                e.getMessage))
          }
        }
      }(enc)
  }

  /** The ingest report: per source, shards seen, records parsed, payload
    * bytes recovered, id range — each number re-derivable from the raw
    * documents table, which is exactly what the oracle does. */
  def ingestReport(docs: DataFrame): DataFrame =
    records(containers(docs))
      .groupBy(col("source"))
      .agg(countDistinct(col("shard")).as("n_shards"),
        count(lit(1)).as("n_records"),
        sum(col("content_length")).as("payload_bytes"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_ingest_warc" -> ((s, dir) =>
      Util.orderAll(ingestReport(Tables.documents(s, dir)))))

  // strlen = UTF-8 bytes (the parser counts payload bytes, not chars);
  // n_shards mirrors the writer's doc_id div docsPerShard partitioning
  def oracle: Map[String, String] = Map(
    "doc_ingest_warc" -> Util.wrap(
      s"""SELECT source,
         |  count(DISTINCT doc_id // $docsPerShard) AS n_shards,
         |  count(*) AS n_records,
         |  CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM documents GROUP BY source""".stripMargin,
      Seq("source", "n_shards", "n_records", "payload_bytes", "min_doc",
        "max_doc")))
}

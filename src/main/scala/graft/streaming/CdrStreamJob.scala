package graft.streaming

import graft.cdr.CdrPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming wiring of the CDR enrichment pipeline — the
  * streaming twin of `CdrPipeline.full`, which stays a pure
  * `DataFrame => DataFrame` stack so batch (oracle) and streaming share one
  * logical plan (SURVEY §7 design stance).
  *
  * Two execution shapes, both reference-faithful:
  *
  *  - [[runForeachBatch]] (production default): micro-batch loop applies the
  *    *whole* batch pipeline per trigger with TTL-cached dimension snapshots.
  *    The per-batch argmax dedup quantizes the reference's 1 s session gap to
  *    the trigger interval — with the 20 s rollover trigger (flink.conf:55)
  *    every gap ≤ trigger, so per-batch grouping only ever merges rows the
  *    1 s gap would also have merged, plus duplicates the gap would have
  *    split across windows (a strict dedup improvement, documented).
  *  - [[enrichedStream]] + sink: fully streaming plan — stream-static
  *    broadcast joins for J2/J4 and [[SessionDedup]]'s stateful 1 s-gap
  *    timers for exact A2 parity.
  *
  * Scale notes (100 TB/day stream): the fact stream never shuffles before
  * the dedup (broadcast joins, narrow explode); the single shuffle keys on
  * `unique_cdr_id` (high-cardinality, uniform by construction). Sink files
  * roll per trigger; `maxRecordsPerFile` caps file size in place of the
  * reference's 110 MB rolling policy (flink.conf:54).
  */
object CdrStreamJob {

  // ------------------------------------------------------------- sources

  /** S1: Kafka CSV CDR source (EnrichmentApp.java:160-181). Requires the
    * spark-sql-kafka connector on the cluster classpath (not shipped in this
    * container — wiring is compile-checked, CSV decode is unit-tested). */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "latest",
                  extraOptions: Map[String, String] = Map.empty): DataFrame = {
    val raw = extraOptions.foldLeft(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrap)
          .option("subscribe", topic)
          .option("startingOffsets", startingOffsets)) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load()
    CsvCodec.decode(raw)
  }

  /** S5: rate-limited deterministic synthetic CDR source — the generator job
    * (generator/Generator.java:38-47, CsvData.java:104-152) on Spark's rate
    * source. Same LCG everywhere (batch query `cdr_generator`, oracle,
    * here), so generated streams are reproducible. */
  def rateGenerator(spark: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    syntheticCdr(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("value").as("i")))

  /** The generator's value derivation from a monotonically increasing id —
    * shared by the streaming rate source and the batch parity query. */
  def syntheticCdr(ids: DataFrame): DataFrame =
    ids.selectExpr("i", "(1103515245 * (i + 1) + 12345) % 2147483648 AS x")
      .selectExpr(
        "timestamp_micros((1653475440000 + (x * 1009) % 126230400000) * 1000) AS start_time",
        "element_at(array('DE','cl','ek','ir','kg','kh','mn','nn','ns','rd','sp','sr','st','vr','yd'), cast(x % 15 AS int) + 1) || '...' AS measuring_probe_name",
        "CASE WHEN x % 2 = 0 THEN 250000000000000 + (x * 37) % 1000000 END AS imsi",
        "CASE WHEN x % 10 = 0 THEN 79000000000 + (x * 11) % 10000000 END AS msisdn",
        "';10.' || CAST(x % 200 AS STRING) || '.' || CAST((x div 7) % 200 AS STRING) || '.' || CAST((x div 11) % 250 AS STRING) || ';' AS ms_ip_address",
        "1650000000000000 + i - i % 2 AS unique_cdr_id")

  // --------------------------------------------------------------- sinks

  /** K1: Hive-style partitioned parquet sink with the reference's layout
    * `PARTITIONED BY (event_date, probe)` (EnrichmentApp.java:183-204).
    * Trigger plays the 20 s rollover role; `maxRecordsPerFile` the 110 MB
    * file-size cap. One query per output dir (K4's two appending jobs are
    * unioned upstream — Spark forbids two writers on one sink path). */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
                  triggerMs: Long = 20000L,
                  maxRecordsPerFile: Long = 1000000L): StreamingQuery =
    df.writeStream
      .format("parquet")
      .partitionBy("event_date", "probe")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  /** K2: labeled console sink (EnrichmentApp.java:97-103). */
  def consoleSink(df: DataFrame, checkpoint: String): StreamingQuery =
    df.writeStream.format("console")
      .option("truncate", value = false)
      .option("checkpointLocation", checkpoint)
      .start()

  /** K3: Kafka CSV sink for the generator job (Generator.java:51-64).
    * At-least-once (Structured Streaming's Kafka sink has no transactional
    * exactly-once; the reference disables idempotence too, :60). */
  def kafkaCsvSink(df: DataFrame, bootstrap: String, topic: String,
                   checkpoint: String,
                   extraOptions: Map[String, String] = Map.empty): StreamingQuery =
    extraOptions.foldLeft(
        df.select(CsvCodec.encode(df).as("value"))
          .writeStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrap)
          .option("topic", topic)
          .option("checkpointLocation", checkpoint)) {
        case (w, (k, v)) => w.option(k, v)
      }
      .start()

  // ------------------------------------------------------------ pipeline

  /** Fully-streaming two-branch enrichment plan over a streaming CDR source:
    * stream-static joins (J2/J4 — static side re-planned per micro-batch ⇒
    * FOR SYSTEM_TIME AS OF proc_time semantics), stateful session dedup
    * (A1/A2), sink-schema union (P7/K4). */
  def enrichedStream(src: DataFrame, imsiMsisdn: DataFrame,
                     msIpExploded: DataFrame, gapMs: Long = 1000L): DataFrame = {
    val ext = CdrPipeline.extendWithPartitionCols(src)
    val branch1 = CdrPipeline.projectToSink(
      CdrPipeline.lookupEnrich(ext.filter(col("imsi").isNotNull), imsiMsisdn, "left_outer"))
    val joined = CdrPipeline.rangeEnrich(
      CdrPipeline.explodeIps(ext.filter(col("imsi").isNull)), msIpExploded, "left_outer")
    val branch2 = CdrPipeline.projectToSink(SessionDedup(joined, gapMs).toDF())
    branch1.unionByName(branch2)
  }

  /** Production micro-batch runner: the whole batch pipeline per trigger,
    * dimensions from TTL caches (60 s — flink.conf:38,48), idempotent write
    * to the partitioned parquet table via [[writeBatch]].
    *
    * Delivery: effectively-once under deterministic re-execution. A replayed
    * micro-batch re-reads the same offsets, and [[writeBatch]]'s dynamic
    * partition overwrite on a trailing `batch_id` sub-partition rewrites the
    * partitions it produces instead of appending twice. The caveat is the
    * dimension snapshot: if it changed between the attempts (TTL expiry or a
    * restart emptying the cache), a replayed row's argmax winner can move to
    * a different (event_date, probe) partition, stranding the failed
    * attempt's row — at-least-once in that window, the same freshness
    * non-determinism the reference accepts with its 60 s lookup cache
    * (flink.conf:38). Exact exactly-once needs a batch→partitions manifest;
    * the strict `(event_date, probe)`-layout path is [[parquetSink]], whose
    * exactly-once comes from the built-in file-sink manifest. */
  def runForeachBatch(src: DataFrame, imsiCache: DimensionCache,
                      msIpCache: DimensionCache, path: String, checkpoint: String,
                      triggerMs: Long = 20000L,
                      maxRecordsPerFile: Long = 1000000L): StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(CdrPipeline.full(batch, imsiCache.get(), msIpCache.get()),
          batchId, path, maxRecordsPerFile)
      }
      .start()

  /** Idempotent per-micro-batch parquet write: Hive layout
    * `event_date/probe/batch_id` with `partitionOverwriteMode=dynamic`, so
    * re-running the same (deterministic) batch replaces its own output
    * in place. `batch_id` trails the reference's partition columns, so
    * `event_date`/`probe` pruning is unchanged; readers of the table see one
    * extra partition column (documented layout delta vs flink.conf:56). */
  def writeBatch(out: DataFrame, batchId: Long, path: String,
                 maxRecordsPerFile: Long = 1000000L): Unit =
    out.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("event_date", "probe", "batch_id")
      .parquet(path)
}

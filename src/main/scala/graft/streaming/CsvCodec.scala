package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV line codec for the CDR wire format (S1/K3).
  *
  * The reference consumes CSV-encoded CDRs from Kafka with
  * `'value.csv.null-literal' = ''` (empty string decodes to SQL NULL) and
  * `'value.csv.ignore-parse-errors' = 'true'` (malformed lines dropped) —
  * /root/reference/src/main/java/org/example/EnrichmentApp.java:160-181 —
  * and its generator encodes with a plain comma-join of the six fields
  * (generator/CsvData.java:33-40).
  *
  * Decode uses `from_csv` (a codegen'd Catalyst expression — stays inside
  * whole-stage codegen, no UDF): PERMISSIVE mode nulls out unparsable rows,
  * and the filter on the non-null `start_time` restores DROPMALFORMED
  * semantics. Both directions are pure column expressions, so the same codec
  * serves batch oracle queries and the streaming Kafka path unchanged.
  */
object CsvCodec {

  /** Wire schema of a CDR line (EnrichmentApp.java:163-170). */
  val schema: StructType = StructType(Seq(
    StructField("start_time", TimestampType),
    StructField("measuring_probe_name", StringType),
    StructField("imsi", LongType),
    StructField("msisdn", LongType),
    StructField("ms_ip_address", StringType),
    StructField("unique_cdr_id", LongType)))

  private val tsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private val opts = Map(
    "nullValue" -> "",            // '' ↔ NULL, both directions
    "timestampFormat" -> tsFormat,
    "mode" -> "PERMISSIVE")

  /** Row → CSV line column (generator contract, CsvData.java:33-40). */
  def encode(df: DataFrame): Column =
    concat_ws(",",
      date_format(col("start_time"), tsFormat),
      col("measuring_probe_name"),
      coalesce(col("imsi").cast("string"), lit("")),
      coalesce(col("msisdn").cast("string"), lit("")),
      col("ms_ip_address"),
      col("unique_cdr_id").cast("string"))

  /** CSV `value` column → typed CDR columns; malformed lines dropped. */
  def decode(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .select(from_csv(col(valueCol).cast("string"), schema, opts).as("r"))
      .select(col("r.*"))
      .filter(col("start_time").isNotNull) // ignore-parse-errors parity
}

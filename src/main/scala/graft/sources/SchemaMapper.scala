package graft.sources

import org.apache.spark.sql.types._

/** The reference's gradual type system mapped onto Spark SQL types —
  * SURVEY.md §1.2 table, from the `Value` enum
  * (/root/reference/amadeus-types/src/value.rs:91-157).
  *
  * Unsigned integers have no JVM home; they widen by one size (u64 →
  * Decimal(20,0)) so every value round-trips losslessly through
  * parquet/CSV/JDBC and the DuckDB oracle.
  */
object SchemaMapper {

  /** amadeus type name → Spark type (SURVEY §1.2) */
  val toSpark: Map[String, DataType] = Map(
    "bool" -> BooleanType,
    "i8" -> ByteType, "u8" -> ShortType,
    "i16" -> ShortType, "u16" -> IntegerType,
    "i32" -> IntegerType, "u32" -> LongType,
    "i64" -> LongType, "u64" -> DecimalType(20, 0),
    "f32" -> FloatType, "f64" -> DoubleType,
    "date" -> DateType,                    // DateWithoutTimezone
    "time" -> LongType,                    // μs from midnight (no native type)
    "datetime" -> TimestampType,           // ms since epoch, with tz
    "datetime_without_timezone" -> TimestampNTZType,
    "timezone" -> StringType,              // IANA id
    "decimal" -> DecimalType.SYSTEM_DEFAULT,
    "bson" -> BinaryType,
    "string" -> StringType,
    "json" -> StringType,                  // + from_json on demand
    "enum" -> StringType,
    "url" -> StringType, "ip_addr" -> StringType,
    "webpage" -> StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("content", StringType))))

  /** List/Map/Group/Option composite mapping */
  def list(element: DataType, nullable: Boolean = false): DataType =
    ArrayType(element, containsNull = nullable)
  def map(k: DataType, v: DataType): DataType = MapType(k, v)
  def group(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })
  /** Option(T) = same type, nullable field */
  def option(f: StructField): StructField = f.copy(nullable = true)

  /** Spark → amadeus direction for schema display/round-trip checks */
  def fromSpark(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType => "i8"
    case ShortType => "i16"
    case IntegerType => "i32"
    case LongType => "i64"
    case d: DecimalType if d.precision == 20 && d.scale == 0 => "u64"
    case _: DecimalType => "decimal"
    case FloatType => "f32"
    case DoubleType => "f64"
    case DateType => "date"
    case TimestampType => "datetime"
    case TimestampNTZType => "datetime_without_timezone"
    case BinaryType => "bson"
    case StringType => "string"
    case ArrayType(e, _) => s"list<${fromSpark(e)}>"
    case MapType(k, v, _) => s"map<${fromSpark(k)},${fromSpark(v)}>"
    case s: StructType => s"group<${s.fields.map(f => s"${f.name}:${fromSpark(f.dataType)}").mkString(",")}>"
    case other => other.simpleString
  }
}

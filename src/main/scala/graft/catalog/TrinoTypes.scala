package graft.catalog

import org.apache.spark.sql.types._

/** Mapping between Spark SQL types and the reference engine's
  * (Trino/Athena) type vocabulary.
  *
  * The reference's only explicit type logic is the numeric-type filter
  * regex at /root/reference/aws-athena.sh:68:
  * `^(tinyint|smallint|integer|bigint|real|double|decimal.*)$`
  * applied to the `data_type` column of `information_schema.columns`.
  * Everything downstream (the 8-statistic profiler) operates only on
  * columns whose type name matches this regex, so the fidelity of this
  * mapping decides which columns get profiled.
  */
object TrinoTypes {

  /** Exact regex from /root/reference/aws-athena.sh:68. */
  val NumericTypeRegex = "^(tinyint|smallint|integer|bigint|real|double|decimal.*)$"

  private val numericPattern = NumericTypeRegex.r.pattern

  def isNumeric(trinoName: String): Boolean =
    numericPattern.matcher(trinoName).matches()

  /** Spark type → Trino type name, as it would appear in
    * `information_schema.columns.data_type` (aws-athena.sh:68 `$8`).
    */
  def name(dt: DataType): String = dt match {
    case ByteType             => "tinyint"
    case ShortType            => "smallint"
    case IntegerType          => "integer"
    case LongType             => "bigint"
    case FloatType            => "real"
    case DoubleType           => "double"
    case d: DecimalType       => s"decimal(${d.precision},${d.scale})"
    case StringType           => "varchar"
    case BooleanType          => "boolean"
    case DateType             => "date"
    case BinaryType           => "varbinary"
    case TimestampType        => "timestamp(3)"
    case TimestampNTZType     => "timestamp(3)"
    case a: ArrayType         => s"array(${name(a.elementType)})"
    case m: MapType           => s"map(${name(m.keyType)}, ${name(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${name(f.dataType)}").mkString("row(", ", ", ")")
    case other                => other.simpleString
  }

  def isNumeric(dt: DataType): Boolean = isNumeric(name(dt))
}

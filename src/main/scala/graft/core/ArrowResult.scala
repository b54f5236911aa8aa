package graft.core

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow-IPC result wire: the reference's interchange contract is a
  * serialized Arrow table shipped back to the caller (parqueryd/worker.py:28
  * `serialize_arrow`, controller.py:289-305 gather+concat), so a non-JVM
  * client can consume results zero-copy. [[toArrowBytes]] renders a FINAL
  * query result (driver-sized by definition — it is what the reference
  * collects to its controller anyway) as one Arrow record batch in an IPC
  * stream; [[fromArrowBytes]] is the inverse, giving a round-trip equality
  * gate. Bulk data movement stays on the parquet/manifest path ([[Ingest]]);
  * this is only the last-hop result contract.
  */
object ArrowResult {

  private def arrowType(dt: DataType): ArrowType = dt match {
    case BooleanType   => ArrowType.Bool.INSTANCE
    case IntegerType   => new ArrowType.Int(32, true)
    case LongType      => new ArrowType.Int(64, true)
    case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType    => ArrowType.Utf8.INSTANCE
    case BinaryType    => ArrowType.Binary.INSTANCE
    case DateType      => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
    case other => throw new BadCallException(
      s"arrow result: unsupported column type ${other.simpleString} " +
        "(project/cast the result to scalar wire types first)")
  }

  /** Serialize a (small, final) result as one Arrow IPC stream.
    * `maxResultBytes > 0` applies the typed memory-cap taxonomy
    * ([[GraftService.collectResult]]): oversized results raise
    * [[ResultTooBigException]] instead of flooding the driver. */
  def toArrowBytes(df: DataFrame, maxResultBytes: Long = 0L): Array[Byte] = {
    val sparkSchema = df.schema
    val rows = GraftService.collectResult(df, maxResultBytes)
    val fields = sparkSchema.fields.map(f =>
      new Field(f.name, FieldType.nullable(arrowType(f.dataType)), null))
    val schema = new ArrowSchema(fields.toSeq.asJava)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, allocator)
    try {
      root.allocateNew()
      sparkSchema.fields.zipWithIndex.foreach { case (f, c) =>
        val vec = root.getVector(c)
        rows.zipWithIndex.foreach { case (row, r) =>
          if (row.isNullAt(c)) vec.setNull(r)
          else (f.dataType, vec) match {
            case (BooleanType, v: BitVector)    => v.setSafe(r, if (row.getBoolean(c)) 1 else 0)
            case (IntegerType, v: IntVector)    => v.setSafe(r, row.getInt(c))
            case (LongType, v: BigIntVector)    => v.setSafe(r, row.getLong(c))
            case (FloatType, v: Float4Vector)   => v.setSafe(r, row.getFloat(c))
            case (DoubleType, v: Float8Vector)  => v.setSafe(r, row.getDouble(c))
            case (StringType, v: VarCharVector) => v.setSafe(r, row.getString(c).getBytes("UTF-8"))
            case (BinaryType, v: VarBinaryVector) => v.setSafe(r, row.getAs[Array[Byte]](c))
            case (DateType, v: DateDayVector) =>
              v.setSafe(r, row.getDate(c).toLocalDate.toEpochDay.toInt)
            case (TimestampType, v: TimeStampMicroTZVector) =>
              // floorDiv, not /: truncation flips the sub-second part of
              // pre-1970 instants by a full second
              val ts = row.getTimestamp(c)
              v.setSafe(r, Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000)
            case (dt, v) => throw new IllegalStateException(s"$dt vs ${v.getClass}")
          }
        }
        vec.setValueCount(rows.length)
      }
      root.setRowCount(rows.length)
      val out = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      writer.start(); writer.writeBatch(); writer.end(); writer.close()
      out.toByteArray
    } finally { root.close(); allocator.close() }
  }

  /** Deserialize an Arrow IPC stream back into a local DataFrame (the
    * round-trip gate; a real non-JVM client would stop at the Arrow table). */
  def fromArrowBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val allocator = new RootAllocator()
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val arrowFields = root.getSchema.getFields.asScala.toSeq
      val sparkSchema = StructType(arrowFields.map { f =>
        val dt = f.getType match {
          case _: ArrowType.Bool => BooleanType
          case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
          case t: ArrowType.Int if t.getBitWidth == 64 => LongType
          case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.SINGLE => FloatType
          case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
          case _: ArrowType.Utf8 => StringType
          case _: ArrowType.Binary => BinaryType
          case _: ArrowType.Date => DateType
          case _: ArrowType.Timestamp => TimestampType
          case other => throw new BadCallException(s"arrow result: unsupported $other")
        }
        StructField(f.getName, dt, nullable = true)
      })
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (reader.loadNextBatch()) {
        (0 until root.getRowCount).foreach { r =>
          val vals = (0 until root.getFieldVectors.size).map { c =>
            val vec = root.getVector(c)
            if (vec.isNull(r)) null
            else vec match {
              case v: BitVector     => v.get(r) == 1
              case v: IntVector     => v.get(r)
              case v: BigIntVector  => v.get(r)
              case v: Float4Vector  => v.get(r)
              case v: Float8Vector  => v.get(r)
              case v: VarCharVector => new String(v.get(r), "UTF-8")
              case v: VarBinaryVector => v.get(r)
              case v: DateDayVector =>
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(r).toLong))
              case v: TimeStampMicroTZVector =>
                val us = v.get(r)
                val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000)
                ts.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
                ts
              case other => throw new IllegalStateException(other.getClass.toString)
            }
          }
          rows += Row(vals: _*)
        }
      }
      spark.createDataFrame(rows.asJava, sparkSchema)
    } finally { reader.close(); allocator.close() }
  }
}

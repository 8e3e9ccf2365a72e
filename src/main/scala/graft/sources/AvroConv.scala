package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro ⟷ Catalyst conversion for [[AvroDataSource]] — schema mapping and
  * per-field value converters, built ONCE per schema and then applied
  * per-row (no per-row type dispatch in the hot loop).
  *
  * Supported Avro shapes (refusals are by name, in the [[MiniHdf5]]
  * style — a clear error beats a silent wrong answer):
  *  - primitives: boolean/int/long/float/double/string/bytes
  *  - logical types: date (int), timestamp-micros / timestamp-millis
  *    (long), decimal (bytes or fixed)
  *  - enum → string; fixed → binary
  *  - union of exactly [null, T] → nullable T (any other union refused)
  *  - record / array / map compose recursively
  */
object AvroConv {

  // ---------------------------------------------------------------- schema
  def toCatalyst(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros => TimestampType
      case _: LogicalTypes.TimestampMillis => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case Schema.Type.ARRAY =>
      val (et, en) = fieldType(s.getElementType)
      ArrayType(et, en)
    case Schema.Type.MAP =>
      val (vt, vn) = fieldType(s.getValueType)
      MapType(StringType, vt, vn)
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    })
    case other => throw new UnsupportedOperationException(
      s"avro source: unsupported Avro type $other at ${s.getFullName}")
  }

  /** Unwrap a [null, T] union into (catalystType, nullable). */
  private def fieldType(s: Schema): (DataType, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size != 1) throw new UnsupportedOperationException(
        "avro source: general unions are unsupported (only [null, T]); got " +
          branches.map(_.getType).mkString("[", ", ", "]"))
      (toCatalyst(nonNull.head), branches.size > nonNull.size)
    } else (toCatalyst(s), false)

  /** The non-null branch of a [null, T] union (or the schema itself). */
  private def nonNullOf(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  def toAvro(dt: DataType, name: String, nullable: Boolean,
      namespace: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, cn) =>
        Schema.createArray(toAvro(et, s"${name}_item", cn, namespace))
      case MapType(StringType, vt, vn) =>
        Schema.createMap(toAvro(vt, s"${name}_value", vn, namespace))
      case st: StructType => structToAvro(st, name, namespace)
      case other => throw new UnsupportedOperationException(
        s"avro sink: unsupported Spark type $other for column $name")
    }
    if (nullable)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  def structToAvro(st: StructType, name: String, namespace: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name,
        toAvro(f.dataType, f.name, f.nullable, s"$namespace.$name"),
        null,
        // a null default for nullable fields keeps the schema
        // evolution-friendly (readers with this field absent resolve)
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, namespace, false, fields.toList.asJava)
  }

  // ------------------------------------------------------- read converters
  /** Converter Avro runtime value → Catalyst value for one field. Built
    * once; `null` passes through at every level. */
  def reader(s: Schema, dt: DataType): AnyRef => Any = {
    val core: AnyRef => Any = (nonNullOf(s).getType, dt) match {
      case (_, BooleanType) | (_, IntegerType) | (_, LongType) |
           (_, FloatType) | (_, DoubleType) | (_, DateType) =>
        // int logical date is already Spark's internal representation
        // (days since epoch) — no conversion
        identity[AnyRef]
      case (_, TimestampType) =>
        // timestamp-micros IS Spark's internal micros; millis scale up
        nonNullOf(s).getLogicalType match {
          case _: LogicalTypes.TimestampMillis =>
            v => v.asInstanceOf[java.lang.Long].longValue() * 1000L
          case _ => identity[AnyRef]
        }
      case (_, StringType) => {
        case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
        case e: GenericEnumSymbol[_] => UTF8String.fromString(e.toString)
        case other => UTF8String.fromString(other.toString)
      }
      case (_, BinaryType) => {
        case bb: ByteBuffer => byteBufferBytes(bb)
        case gf: GenericFixed => gf.bytes().clone()
        case other => other
      }
      case (_, d: DecimalType) => {
        case bb: ByteBuffer =>
          Decimal(BigDecimal(BigInt(byteBufferBytes(bb)), d.scale), d.precision, d.scale)
        case gf: GenericFixed =>
          Decimal(BigDecimal(BigInt(gf.bytes()), d.scale), d.precision, d.scale)
      }
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val elem = reader(nonNullOf(s).getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[AnyRef]]
          val out = new Array[Any](in.size)
          var i = 0
          val it = in.iterator()
          while (it.hasNext) { out(i) = elem(it.next()); i += 1 }
          new GenericArrayData(out)
        }
      case (Schema.Type.MAP, MapType(_, vt, _)) =>
        val value = reader(nonNullOf(s).getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
          val ks = new Array[Any](in.size)
          val vs = new Array[Any](in.size)
          var i = 0
          val it = in.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            ks(i) = UTF8String.fromString(e.getKey.toString)
            vs(i) = value(e.getValue)
            i += 1
          }
          new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
        }
      case (Schema.Type.RECORD, st: StructType) =>
        val rec = recordReader(nonNullOf(s), st)
        v => rec(v.asInstanceOf[GenericRecord])
      case (at, ct) => throw new UnsupportedOperationException(
        s"avro source: cannot read Avro $at as Spark $ct")
    }
    v => if (v == null) null else core(v)
  }

  /** Row converter for a record schema projected to `st` (field lookup by
    * NAME, so it composes with reader-schema pruning). */
  def recordReader(rec: Schema, st: StructType): GenericRecord => InternalRow = {
    val fields = st.fields.map { f =>
      val af = rec.getField(f.name)
      require(af != null, s"avro source: field ${f.name} absent from " +
        s"record schema ${rec.getFullName}")
      (af.pos(), reader(af.schema(), f.dataType))
    }
    r => {
      val out = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        out(i) = fields(i)._2(r.get(fields(i)._1))
        i += 1
      }
      InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
    }
  }

  private def byteBufferBytes(bb: ByteBuffer): Array[Byte] = {
    val b = bb.duplicate()
    val out = new Array[Byte](b.remaining())
    b.get(out)
    out
  }

  // ------------------------------------------------------ write converters
  /** Converter Catalyst value (as surfaced by `InternalRow.get(i, dt)`) →
    * Avro runtime value. `avro` is the TARGET schema at this position
    * (possibly a [null, T] union) — nested records must carry the exact
    * schema instance the parent expects, or GenericData's union
    * resolution rejects them by full name. */
  def writer(dt: DataType, avro: Schema): Any => AnyRef = {
    val target = nonNullOf(avro)
    val core: Any => AnyRef = dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType =>
        v => v.asInstanceOf[AnyRef] // already int days / long micros
      case StringType => v => new Utf8(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType =>
        v => ByteBuffer.wrap(
          v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue.toByteArray)
      case ArrayType(et, _) =>
        val elem = writer(et, target.getElementType)
        v => {
          val in = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[AnyRef](in.numElements())
          var i = 0
          while (i < in.numElements()) {
            out.add(if (in.isNullAt(i)) null else elem(in.get(i, et)))
            i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val value = writer(vt, target.getValueType)
        v => {
          val in = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val out = new java.util.HashMap[Utf8, AnyRef](in.numElements())
          val ks = in.keyArray()
          val vs = in.valueArray()
          var i = 0
          while (i < in.numElements()) {
            out.put(new Utf8(ks.getUTF8String(i).getBytes),
              if (vs.isNullAt(i)) null else value(vs.get(i, vt)))
            i += 1
          }
          out
        }
      case st: StructType =>
        val rec = rowWriter(st, target)
        v => rec(v.asInstanceOf[InternalRow])
      case other => throw new UnsupportedOperationException(
        s"avro sink: unsupported Spark type $other")
    }
    v => if (v == null) null else core(v)
  }

  /** InternalRow → GenericRecord against a schema produced by
    * [[structToAvro]] (field order = struct order by construction). */
  def rowWriter(st: StructType, avro: Schema): InternalRow => GenericRecord = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      (f.dataType, writer(f.dataType, avro.getFields.get(i).schema()))
    }
    row => {
      val rec = new GenericData.Record(avro)
      var i = 0
      while (i < fields.length) {
        rec.put(i,
          if (row.isNullAt(i)) null else fields(i)._2(row.get(i, fields(i)._1)))
        i += 1
      }
      rec
    }
  }
}

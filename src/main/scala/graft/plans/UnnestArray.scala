package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Array unnest with the reference's collection-table shape: each element
  * becomes a row `(pos BIGINT, item <elem>)`, and when the element is a
  * STRUCT its fields are additionally exposed as top-level columns, the
  * way the reference's collection TableRefs materialize item subfields
  * (`fe/.../analysis/CollectionTableRef.java`, `be/.../exec/subplan-node.h`:
  * arrays are tables with an `item` column and a virtual `pos`;
  * array-of-struct items contribute their fields directly).
  *
  * Spark's own posexplode is close but types `pos` as INT and keeps
  * struct items opaque; this generator exists for dialect-exact output
  * (`pos` is BIGINT in the reference) without a second projection.
  * Used only by [[NestedTableRefs]]; evaluation is row-at-a-time
  * (generators sit outside whole-stage codegen either way — Spark's
  * GenerateExec drives them via eval, like any LATERAL VIEW).
  */
case class UnnestArray(child: Expression, flatten: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"UnnestArray needs an array input, got ${other.simpleString(10)}")
  }

  override def elementSchema: StructType = {
    val base = Seq(
      StructField("pos", LongType, nullable = false),
      StructField("item", elemType, nullable = true))
    val extra = if (flatten) elemType match {
      case st: StructType => st.fields.map(_.copy(nullable = true)).toSeq
      case _ => Nil
    } else Nil
    StructType(base ++ extra)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      val nStructFields = if (flatten) elemType match {
        case st: StructType => st.length
        case _ => 0
      } else 0
      (0 until arr.numElements()).iterator.map { i =>
        val item = if (arr.isNullAt(i)) null else arr.get(i, elemType)
        if (nStructFields == 0) InternalRow(i.toLong, item)
        else {
          val out = new Array[Any](2 + nStructFields)
          out(0) = i.toLong
          out(1) = item
          val st = elemType.asInstanceOf[StructType]
          val row = item.asInstanceOf[InternalRow]
          var j = 0
          while (j < nStructFields) {
            out(2 + j) =
              if (row == null || row.isNullAt(j)) null
              else row.get(j, st(j).dataType)
            j += 1
          }
          InternalRow.fromSeq(out.toIndexedSeq)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): UnnestArray =
    copy(child = newChild)
  override def prettyName: String = "unnest_array"
}

/** Map unnest with the reference's collection-table shape: each entry
  * becomes `(key, value)`, and when the value is a STRUCT its fields are
  * additionally exposed as top-level columns so `m.field` resolves to
  * the value's field like the reference's map TableRefs (without this,
  * `m.field` falls back to Spark's map-by-key extraction on the BASE
  * column when the map's column name equals the ref alias).
  */
case class UnnestMap(child: Expression, flatten: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val mapType: MapType = child.dataType.asInstanceOf[MapType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"UnnestMap needs a map input, got ${other.simpleString(10)}")
  }

  override def elementSchema: StructType = {
    val base = Seq(
      StructField("key", mapType.keyType, nullable = false),
      StructField("value", mapType.valueType, nullable = true))
    val extra = if (flatten) mapType.valueType match {
      case st: StructType => st.fields.map(_.copy(nullable = true)).toSeq
      case _ => Nil
    } else Nil
    StructType(base ++ extra)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val m = data.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val keys = m.keyArray()
      val values = m.valueArray()
      val nStructFields = if (flatten) mapType.valueType match {
        case st: StructType => st.length
        case _ => 0
      } else 0
      (0 until m.numElements()).iterator.map { i =>
        val k = keys.get(i, mapType.keyType)
        val v = if (values.isNullAt(i)) null
          else values.get(i, mapType.valueType)
        if (nStructFields == 0) InternalRow(k, v)
        else {
          val out = new Array[Any](2 + nStructFields)
          out(0) = k
          out(1) = v
          val st = mapType.valueType.asInstanceOf[StructType]
          val row = v.asInstanceOf[InternalRow]
          var j = 0
          while (j < nStructFields) {
            out(2 + j) =
              if (row == null || row.isNullAt(j)) null
              else row.get(j, st(j).dataType)
            j += 1
          }
          InternalRow.fromSeq(out.toIndexedSeq)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): UnnestMap =
    copy(child = newChild)
  override def prettyName: String = "unnest_map"
}

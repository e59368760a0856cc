package graft.functions

import graft.core.{Geom, GeomType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The canonical geometry struct (SURVEY.md §1.2) and its InternalRow
  * converters. Coordinates are a rank-4 nested array (polygons -> rings ->
  * positions -> doubles) with lower-rank types left-nested; a
  * GeometryCollection stores its members (one level, like the reference
  * R/wkt2geojson.R:194-205) in `parts`.
  *
  * Geometry stays columnar in Tungsten as nested UnsafeArrayData; a WKT is
  * parsed ONCE into this struct and reused (north_star: "parsed once").
  */
object GeomData {
  val coordsType: DataType =
    ArrayType(ArrayType(ArrayType(ArrayType(DoubleType, containsNull = false))))

  val partType: StructType = StructType(Seq(
    StructField("typeTag", ByteType, nullable = false),
    StructField("coords", coordsType)))

  val geometryType: StructType = StructType(Seq(
    StructField("typeTag", ByteType, nullable = false),
    StructField("coords", coordsType),
    StructField("parts", ArrayType(partType), nullable = true)))

  val centroidType: StructType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))

  val coverType: DataType = ArrayType(StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("full", BooleanType, nullable = false))))

  // ---------- Geom -> InternalRow ----------

  private def coordsToData(c: Vector[Vector[Vector[Vector[Double]]]]): ArrayData =
    new GenericArrayData(c.map { poly =>
      new GenericArrayData(poly.map { ring =>
        new GenericArrayData(ring.map { pos =>
          UnsafeArrayData.fromPrimitiveArray(pos.toArray): Any
        }.toArray)
      }.toArray[Any])
    }.toArray[Any])

  def toRow(g: Geom): InternalRow = {
    val parts: Any =
      if (g.parts.isEmpty) null
      else new GenericArrayData(g.parts.map { p =>
        new GenericInternalRow(Array[Any](p.typeTag.toByte, coordsToData(p.coords)))
      }.toArray[Any])
    new GenericInternalRow(Array[Any](g.typeTag.toByte, coordsToData(g.coords), parts))
  }

  // ---------- InternalRow -> Geom ----------

  private def dataToCoords(a: ArrayData): Vector[Vector[Vector[Vector[Double]]]] = {
    if (a == null) Vector.empty
    else Vector.tabulate(a.numElements()) { i =>
      val poly = a.getArray(i)
      Vector.tabulate(poly.numElements()) { j =>
        val ring = poly.getArray(j)
        Vector.tabulate(ring.numElements()) { k =>
          ring.getArray(k).toDoubleArray().toVector
        }
      }
    }
  }

  def fromRow(r: InternalRow): Geom = {
    val tag = r.getByte(0).toInt
    val coords = if (r.isNullAt(1)) Vector.empty[Vector[Vector[Vector[Double]]]]
                 else dataToCoords(r.getArray(1))
    val parts =
      if (r.numFields < 3 || r.isNullAt(2)) Vector.empty[Geom]
      else {
        val pa = r.getArray(2)
        Vector.tabulate(pa.numElements()) { i =>
          val pr = pa.getStruct(i, 2)
          Geom(pr.getByte(0).toInt,
            if (pr.isNullAt(1)) Vector.empty else dataToCoords(pr.getArray(1)))
        }
      }
    Geom(tag, coords, parts)
  }

  // ---------- raw Spark array readers (constructor expressions) ----------

  def readPos(a: ArrayData): Vector[Double] = a.toDoubleArray().toVector
  def readRank2(a: ArrayData): Vector[Vector[Double]] =
    Vector.tabulate(a.numElements())(i => readPos(a.getArray(i)))
  def readRank3(a: ArrayData): Vector[Vector[Vector[Double]]] =
    Vector.tabulate(a.numElements())(i => readRank2(a.getArray(i)))
  def readRank4(a: ArrayData): Vector[Vector[Vector[Vector[Double]]]] =
    Vector.tabulate(a.numElements())(i => readRank3(a.getArray(i)))
}

package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data-layout clustering — the lakehouse
  * multi-dimensional OPTIMIZE recipe: interleave the bits of several
  * clustering columns into one key, range-partition + sort files by
  * it, and min/max file statistics become selective on EVERY
  * clustering dimension at once (a single-column sort gives perfect
  * pruning on one dimension and none on the others). At 100 TB this
  * is the difference between scanning 1/256 and 1/2 of the files for
  * a 2-D box predicate; ZOrderSpec pins the pruning win
  * quantitatively against a single-column sort of the same data.
  *
  * The key is pure integer bit arithmetic (shifts, masks, adds), so
  * the driver entry is oracle-checked exactly; inputs must fit the
  * per-dimension bit budget (production normalizes dimensions to
  * ranks first — the interleave is the operator, the normalization is
  * a groupBy-free percent_rank).
  */
object ZOrder {

  /** Morton key: bit i of dimension d lands at position i * dims + d.
    * Composed from shiftright/and/shiftleft expressions — integer
    * ops, exact at every magnitude (no fractional Divide hazards).
    *
    * Inputs MUST sit in [0, 2^bits): a negative or over-wide value
    * would contribute a truncated bit pattern, silently producing a
    * non-monotone interleave that destroys the min/max pruning
    * property the operator exists for — so each dimension carries a
    * runtime guard that fails the job loudly instead of writing a
    * badly clustered 100 TB table (r11 ADVICE). One guard term per
    * dimension (adds 0 to the key), not per bit.
    */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.length <= 62,
      s"bit budget ${bits * cols.length} exceeds a long")
    val terms = for {
      (c, d) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * cols.length + d)
    val guards = cols.zipWithIndex.map { case (c, d) =>
      val v = c.cast("long")
      when(v < 0 || shiftright(v, bits) =!= 0,
        raise_error(concat(
          lit(s"zOrderKey: dimension $d value "), v.cast("string"),
          lit(s" outside [0, 2^$bits) — rank-normalize the column first")))
          .cast("long"))
        .otherwise(lit(0L))
    }
    (terms ++ guards).reduce(_ + _)
  }

  /** The DuckDB mirror of [[zOrderKey]] for oracle construction. */
  private def oZKey(cols: Seq[String], bits: Int): String =
    (for {
      (c, d) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * cols.length + d})")
      .mkString(" + ")

  /** Cluster a relation for multi-dimensional min/max pruning: one
    * range shuffle on the Morton key + an in-partition sort, i.e. the
    * same cost class as a single-column sort-by write.
    */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zOrderKey(cols.map(col), bits))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Driver entry + exact oracle: the Morton key of every order over
    * (o_custkey, days(o_orderdate)) at 21 bits per dimension —
    * custkey stays under 2^21 through sf10, epoch-days under 2^15.
    */
  val zorderEntry: Q = Q("layout_zorder",
    (s, d) => {
      Engine.configure(s)
      val orders = Engine.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).as("__days"))
      orders.select(col("o_orderkey"),
          zOrderKey(Seq(col("o_custkey"), col("__days")), 21).as("zkey"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""SELECT o_orderkey,
      |  ${oZKey(Seq("o_custkey", "DATEDIFF('day', DATE '1970-01-01', o_orderdate)"), 21)} AS zkey
      |FROM orders ORDER BY o_orderkey""".stripMargin))

  val defs: Seq[Q] = Seq(zorderEntry)
}

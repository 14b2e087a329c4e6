package graft.tools
import graft.Engine
object CharProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    val dir = "/root/testdata/sf0.001"
    def q(s: String): Unit = {
      println(s"-- $s")
      try Engine.sql(spark, dir, s).show(8, truncate = false)
      catch { case e: Throwable => println("ERROR: " + (Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(4).map(t => Option(t.getMessage).getOrElse(t.toString)).mkString(" <- ")).take(300)) }
    }
    q("drop table if exists atinsert")
    q("create table atinsert (id int, s string) using parquet partitioned by (year int, month int)")
    q("insert overwrite table atinsert partition(year=NULL, month=NULL) select 1, 'a'")
    q("select count(*) c from atinsert where year is null and month is null")
    q("insert overwrite table atinsert partition(year=NULL, month=10) select 2, 'b'")
    q("select count(*) c from atinsert where year is null and month=10")
    q("select * from atinsert order by id")
    q("insert overwrite table atinsert partition(year, month) select 3, 'c', cast(null as int), 6")
    q("select count(*) c from atinsert where year is null and month=6")
    q("drop table if exists atinsert")
    spark.stop()
  }
}

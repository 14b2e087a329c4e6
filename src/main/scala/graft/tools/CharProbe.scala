package graft.tools
import graft.Engine
object CharProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    val dir = "/root/testdata/sf0.001"
    def q(s: String): Unit = {
      println(s"-- $s")
      try Engine.sql(spark, dir, s).show(12, truncate = false)
      catch { case e: Throwable => println("ERROR: " + (e.toString + Option(e.getMessage).getOrElse("")).take(300)) }
    }
    q("set spark.sql.preserveCharVarcharTypeInfo=true")
    q("select cast('hel' as char(5)) c, length(cast('hel' as char(5))) l")
    q("select cast('xyzzzzz12' as varchar(-1))")
    q("select cast('xyzzzzz12' as char(-1))")
    q("drop table if exists chars_tiny")
    q("create table chars_tiny (cs char(5), cl char(140), vc varchar(32)) using parquet")
    q("insert into chars_tiny values (cast('6a' as char(5)), cast('6b' as char(140)), cast('6c' as varchar(32))), ('5a','5bbb','5c'), (null,null,null), ('a','b','c'), ('6a','6b','6c')")
    q("select * from chars_tiny where cs = cast('6a' as CHAR(2))")
    q("select count(*) c from chars_tiny where cs != cast('a' as char(3))")
    q("select count(DISTINCT cs) c from chars_tiny where cs = cast('5a' as char(10))")
    q("select min(cs) a, max(vc) b, ndv(cl) c, ndv(vc) d from chars_tiny")
    q("select appx_median(cs) m from chars_tiny")
    q("select cs, LAST_VALUE(cs) OVER (ORDER BY cs rows between unbounded preceding and current row) lv FROM chars_tiny")
    q("drop table if exists char_parts")
    q("create table char_parts (vc varchar(32)) using parquet partitioned by (csp char(5), clp char(140), vcp varchar(32))")
    q("insert into char_parts (csp, clp, vcp, vc) select cs, cl, vc, vc from chars_tiny")
    q("select csp, length(csp) l, vcp from char_parts where csp != cast('dne' as char(5)) order by csp")
    q("drop table if exists char_parts")
    q("drop table if exists chars_tiny")
    q("set spark.sql.preserveCharVarcharTypeInfo=false")
    spark.stop()
  }
}

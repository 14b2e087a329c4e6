package graft.tools
import graft.Engine
object CharProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    val dir = "/root/testdata/sf0.001"
    def q(s: String): Unit = {
      println(s"-- $s")
      try Engine.sql(spark, dir, s).show(12, truncate = false)
      catch { case e: Throwable => println("ERROR: " + (Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(4).map(t => Option(t.getMessage).getOrElse(t.toString)).mkString(" <- ")).take(300)) }
    }
    q("select unix_timestamp('1972||mar||03||030303', 'yyyy||MMM||dd||HHmmss') a")
    q("select unix_timestamp('1972||Mar||03||030303', 'yyyy||MMM||dd||HHmmss') a")
    q("select count(*) c from lineitem where btrim(l_comment, l_comment) != ''")
    q("select timestamp '2010-01-01' + make_interval(0,0,0,0,0,0, cast(null as tinyint)) a")
    q("select dayofyear(trunc('2014-11-11', '0')) a")
    q("select weekofyear(timestamp '2009-01-01') w, to_date(timestamp '2009-01-02 03:04:05') d")
    q("select translate('one\\ntwo', '\\n', '@') a")
    q("select regexp_match_count('aaa123a', 'a*') a, regexp_match_count('0123456789', '.?') b, regexp_match_count('abcab', '(a|ab|abc)') c, regexp_match_count('abc123efg', '[\\\\d]') d, regexp_match_count('a1b2c3d4e5!!!', '[\\\\w\\\\d]') e")
    q("select regexp_match_count('this\\nis\\nnewline', '.*', 1, '') a, regexp_match_count('IPhone\\nIPad\\nIPod', '^I.*$', 1, 'm') b, regexp_match_count('aaa', 'a*', 4, '') c")
    spark.stop()
  }
}

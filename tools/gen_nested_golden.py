#!/usr/bin/env python3
"""Generate reference-nested-subplan.test: the reference's subplan corpus
(QueryTest/nested-types-subplan.test, subplans.test,
nested-types-with-clause.test, nested-types-tpch.test) ported onto a
nested TPC-H view DERIVED FROM THE DRIVER TESTDATA.

The reference runs these against tpch_nested_parquet (its own TPC-H SF1
load), whose data does not exist here, so the expected values cannot be
lifted. Instead this script regenerates every block's expected RESULTS
with DuckDB over the SAME flat parquet the engine-side fixture nests —
an independent-oracle cross-check, the corpus-porting policy VERDICT.md
sanctioned for driver-data-dependent queries.

Fixture shape (mirrored in the emitted golden file and the DuckDB views
below): customer_nested nests each customer's HIGH-VALUE orders
(o_totalprice > 210000) as c_orders (sorted arrays of structs), each
carrying its o_lineitems. The threshold leaves customer 1 with an empty
collection, preserving the reference's empty-collection coverage
(its customer 3). Money columns are cast to DECIMAL(12,2) on both sides
so aggregates compare exactly (double sums are order-dependent).

Usage: python3 tools/gen_nested_golden.py  # writes the golden file
"""
import duckdb
import decimal
import datetime

SF = "/root/testdata/sf0.001"
OUT = "src/test/resources/golden/reference-nested-subplan.test"

con = duckdb.connect()
for t in ["customer", "orders", "lineitem", "region", "nation", "part"]:
    con.sql(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
con.sql("""create view customer_n as
  select c_custkey, c_name, c_nationkey,
         cast(c_acctbal as decimal(12,2)) c_acctbal, c_mktsegment
  from customer""")
con.sql("""create view orders_n as
  select o_orderkey, o_custkey, o_orderstatus,
         cast(o_totalprice as decimal(12,2)) o_totalprice,
         cast(cast(o_orderdate as date) as varchar) o_orderdate,
         o_orderpriority
  from orders where o_totalprice > 210000""")
con.sql("""create view lineitem_n as
  select l_orderkey, l_partkey, l_suppkey, l_linenumber,
         cast(l_quantity as decimal(12,2)) l_quantity,
         cast(l_extendedprice as decimal(12,2)) l_extendedprice,
         cast(l_discount as decimal(12,2)) l_discount,
         cast(l_tax as decimal(12,2)) l_tax,
         l_returnflag, l_linestatus,
         cast(cast(l_shipdate as date) as varchar) l_shipdate
  from lineitem where l_orderkey in (select o_orderkey from orders_n)""")


def render_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return str(v)


def duck(sql):
    return [",".join(render_val(v) for v in row) for row in con.sql(sql).fetchall()]


FIXTURE = """====
---- QUERY
# PROVENANCE: queries lifted from the reference's subplan corpus
# (QueryTest/nested-types-subplan.test, subplans.test,
# nested-types-with-clause.test, nested-types-tpch.test, per-block
# "# ref:" tags), run against a nested TPC-H view derived from the
# driver testdata (the reference's tpch_nested_parquet SF1 data does
# not exist here). Expected RESULTS are REGENERATED with DuckDB over
# the same flat tables by tools/gen_nested_golden.py — an independent
# oracle, re-runnable at any time. c_orders nests each customer's
# o_totalprice > 210000 orders (sorted struct arrays; customer 1 ends
# up with an empty collection, standing in for the reference's
# customer 3). Money columns are DECIMAL(12,2) on both sides.
# Adaptations: table name customer -> customer_nested; db prefixes
# dropped; o_shippriority (absent from driver orders) replaced in the
# one block that used it. This file is generated — edit the generator.
select 1 as provenance_header
---- RESULTS
1
====
---- QUERY
# duck:skip
create or replace temporary view customer_nested as
select c.c_custkey, c.c_name, c.c_nationkey,
       cast(c.c_acctbal as decimal(12,2)) c_acctbal, c.c_mktsegment,
       o.c_orders
from customer c left join (
  select o_custkey,
    array_sort(collect_list(struct(
      o_orderkey,
      o_orderstatus,
      cast(o_totalprice as decimal(12,2)) as o_totalprice,
      cast(cast(o_orderdate as date) as string) as o_orderdate,
      o_orderpriority,
      li.o_lineitems))) c_orders
  from orders
  left join (
    select l_orderkey,
      array_sort(collect_list(struct(
        l_partkey, l_suppkey, l_linenumber,
        cast(l_quantity as decimal(12,2)) as l_quantity,
        cast(l_extendedprice as decimal(12,2)) as l_extendedprice,
        cast(l_discount as decimal(12,2)) as l_discount,
        cast(l_tax as decimal(12,2)) as l_tax,
        l_returnflag, l_linestatus,
        cast(cast(l_shipdate as date) as string) as l_shipdate))) o_lineitems
    from lineitem group by l_orderkey) li
  on li.l_orderkey = orders.o_orderkey
  where o_totalprice > 210000
  group by o_custkey) o
on o.o_custkey = c.c_custkey
---- RESULTS
====
---- QUERY
# duck:skip — engine-side cache (the nested build is the expensive part)
cache table customer_nested
---- RESULTS
====
---- QUERY
# duck:skip
create or replace temporary view region_nested as
select r.r_regionkey, r.r_name, n.r_nations
from region r left join (
  select n_regionkey,
         array_sort(collect_list(struct(n_nationkey, n_name))) r_nations
  from nation group by n_regionkey) n
on n.n_regionkey = r.r_regionkey
---- RESULTS
"""

BLOCKS = []


def block(ref, comment, engine_sql, expected, ordered=False, catch=None):
    BLOCKS.append((ref, comment, engine_sql.strip(), expected, ordered, catch))

CLOSED_NOTE = ("Closed round 13: the rewriter flattens an inner-join tree "
               "of correlated collection refs onto ONE array-materializing "
               "Project (outer.arr AS __matN over OneRowRelation) with the "
               "Generates stacked above over LOCAL attributes, so Spark "
               "decorrelates a single correlated Project instead of "
               "rejecting two correlated Generates "
               "(plans/NestedTableRefs.scala tryFlattenMultiRef).")

CLOSED_LO_NOTE = ("Closed round 14 (was the r13 narrowed pin): Generate's "
                  "outer=true IS per-left-element left-outer semantics, so "
                  "the rewriter materializes both arrays in the ONE "
                  "correlated Project, Generates the left array, then an "
                  "outer=true Generate of filter(right_array, b -> cond) "
                  "with right-alias columns rewritten into the lambda "
                  "variable; no Join — and therefore no correlation below a "
                  "join's right side — survives the rewrite "
                  "(plans/NestedTableRefs.scala flattenLeftOuter). An empty "
                  "match set emits one row with NULL right columns, exactly "
                  "the reference SubplanNode's per-row LEFT OUTER.")


# ---------------------------------------------------------------------
# nested-types-subplan.test
# ---------------------------------------------------------------------
block("nested-types-subplan.test", "Basic subplan with an unnest + join.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c, c.c_orders o
where c_custkey in (2, 3)""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey in (2, 3)"""))

block("nested-types-subplan.test",
      "Basic subplan with a predicate on parent and nested collection.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c, c.c_orders o
where c_custkey in (2, 3) and o_orderkey % 2 = 0""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey in (2, 3) and o.o_orderkey % 2 = 0"""))

block("nested-types-subplan.test", "Test subplan with limit.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c, c.c_orders o
where c_custkey = 2
limit 2""",
      ["row_regex: 2,.*", "row_regex: 2,.*"])

block("nested-types-subplan.test",
      "Subplan with a limit applied by the unnest inside the subplan.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c, (select * from c.c_orders limit 2) v
where c_custkey in (2, 3)""",
      ["row_regex: 2,.+", "row_regex: 2,.+", "row_regex: 3,.+", "row_regex: 3,.+"])

block("nested-types-subplan.test",
      "Subplan with an unnest that evaluates a conjunct. (adapted: driver "
      "orders have no o_shippriority; coalesce against a zero literal "
      "keeps the computed-conjunct shape)",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c,
  (select *, coalesce(o_orderkey, cast(0 as bigint)) x from c.c_orders) v
where c_custkey < 4 and x % 2 = 0""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 4 and coalesce(o.o_orderkey, 0) % 2 = 0"""))

block("nested-types-subplan.test",
      "Subplan with select node on top of the unnest+limit.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c, (select * from c.c_orders limit 2) v
where c_custkey in (2, 3) and o_orderdate != ""
""",
      ["row_regex: 2,.+", "row_regex: 2,.+", "row_regex: 3,.+", "row_regex: 3,.+"])

block("nested-types-subplan.test", "Top-n inside a subplan.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c, (select * from c.c_orders order by o_totalprice limit 2) v
where c_custkey < 5""",
      duck("""select c.c_custkey, c.c_mktsegment, v.o_orderkey, v.o_orderdate
from customer_n c, lateral (select o_orderkey, o_orderdate from orders_n o
  where o.o_custkey = c.c_custkey order by o_totalprice limit 2) v
where c.c_custkey < 5"""))

block("nested-types-subplan.test", "Union inside a subplan.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c,
  (select * from c.c_orders where o_orderkey % 2 = 0
   union all
   select * from c.c_orders where o_orderkey % 2 = 1) v
where c_custkey < 4""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 4"""))

# non-grouping agg: avg computed exactly in python from sum/count
_aggrows = []
for ck, cnt, s, mx, mn in con.sql("""
    select c.c_custkey, count(o.o_orderkey), sum(o.o_totalprice),
           max(o.o_orderstatus), min(o.o_orderdate)
    from customer_n c left join orders_n o on o.o_custkey = c.c_custkey
    where c.c_custkey < 4 group by 1 order by 1""").fetchall():
    if cnt == 0:
        _aggrows.append(f"{ck},0,NULL,NULL,NULL,NULL")
    else:
        avg = (decimal.Decimal(s) / cnt).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
        _aggrows.append(f"{ck},{cnt},{s},{avg},'{mx}','{mn}'")
block("nested-types-subplan.test", "Non-grouping aggregation inside subplan.",
      """select c_custkey, v.* from customer_nested c,
  (select count(o_orderkey) c, sum(o_totalprice) s, avg(o_totalprice) a,
          max(o_orderstatus) mx, min(o_orderdate) mn
   from c.c_orders) v
where c_custkey < 4""",
      _aggrows)

block("nested-types-subplan.test",
      "Non-grouping count(*) aggregation inside subplan.",
      """select c_custkey, v.* from customer_nested c,
  (select count(*) cnt from c.c_orders) v
where c_custkey < 4""",
      duck("""select c.c_custkey,
  (select count(*) from orders_n o where o.o_custkey = c.c_custkey)
from customer_n c where c.c_custkey < 4"""))

block("nested-types-subplan.test",
      "count(*) over the two-level collection path.",
      """select c_custkey, v.* from customer_nested c,
  (select count(*) cnt from c.c_orders.o_lineitems) v
where c_custkey < 4""",
      duck("""select c.c_custkey,
  (select count(*) from orders_n o join lineitem_n l
     on l.l_orderkey = o.o_orderkey where o.o_custkey = c.c_custkey)
from customer_n c where c.c_custkey < 4"""))

_grprows = []
for ck, pr, cnt, s, mx, mn in con.sql("""
    select c.c_custkey, o.o_orderpriority, count(o.o_orderkey),
           sum(o.o_totalprice), max(o.o_orderstatus), min(o.o_orderdate)
    from customer_n c join orders_n o on o.o_custkey = c.c_custkey
    where c.c_custkey < 4 group by 1, 2 order by 1, 2""").fetchall():
    avg = (decimal.Decimal(s) / cnt).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
    _grprows.append(f"{ck},'{pr}',{cnt},{s},{avg},'{mx}','{mn}'")
block("nested-types-subplan.test",
      "Test grouping aggregation inside a subplan.",
      """select c_custkey, v.* from customer_nested c,
  (select o_orderpriority, count(o_orderkey) c, sum(o_totalprice) s,
          avg(o_totalprice) a, max(o_orderstatus) mx,
          min(o_orderdate) mn
   from c.c_orders
   group by o_orderpriority) v
where c_custkey < 4""",
      _grprows)

_anrows = []
for ck, cnt, s, mx, mn in con.sql("""
    select c.c_custkey, count(o.o_orderkey), sum(o.o_totalprice),
           max(o.o_orderstatus), min(o.o_orderdate)
    from customer_n c join orders_n o on o.o_custkey = c.c_custkey
    where c.c_custkey < 4 group by 1 order by 1""").fetchall():
    avg = (decimal.Decimal(s) / cnt).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
    _anrows += [f"{ck},{cnt},{s},{avg},'{mx}','{mn}'"] * cnt
block("nested-types-subplan.test",
      "Analytic functions without partition by / order by inside a subplan.",
      """select c_custkey, v.* from customer_nested c,
  (select count(o_orderkey) over() c, sum(o_totalprice) over() s,
          avg(o_totalprice) over() a, max(o_orderstatus) over() mx,
          min(o_orderdate) over() mn
   from c.c_orders) v
where c_custkey < 4""",
      _anrows)

_parows = []
for ck, st, cnt, s, mx, mn in con.sql("""
    select c.c_custkey, o.o_orderstatus, count(o.o_orderkey),
           sum(o.o_totalprice), max(o.o_orderstatus), min(o.o_orderdate)
    from customer_n c join orders_n o on o.o_custkey = c.c_custkey
    where c.c_custkey < 4 group by 1, 2 order by 1, 2""").fetchall():
    avg = (decimal.Decimal(s) / cnt).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
    _parows += [f"{ck},'{st}',{cnt},{s},{avg},'{mx}','{mn}'"] * cnt
block("nested-types-subplan.test",
      "Analytic functions with partition by inside a subplan.",
      """select c_custkey, v.* from customer_nested c,
(select o_orderstatus,
  count(o_orderkey) over(partition by o_orderstatus) c,
  sum(o_totalprice) over(partition by o_orderstatus) s,
  avg(o_totalprice) over(partition by o_orderstatus) a,
  max(o_orderstatus) over(partition by o_orderstatus) mx,
  min(o_orderdate) over(partition by o_orderstatus) mn
from c.c_orders) v
where c_custkey < 4""",
      _parows)

block("nested-types-subplan.test",
      "Test left outer join of a relative table ref.",
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c left outer join c.c_orders
where c_custkey < 4""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderdate
from customer_n c left join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 4"""))

block("nested-types-subplan.test",
      "Test left semi join of a relative table ref.",
      """select c_custkey, c_mktsegment
from customer_nested c left semi join c.c_orders
where c_custkey < 4""",
      duck("""select c.c_custkey, c.c_mktsegment from customer_n c
where c.c_custkey < 4
  and exists (select 1 from orders_n o where o.o_custkey = c.c_custkey)"""))

block("nested-types-subplan.test",
      "Test left anti join on a relative table ref.",
      """select c_custkey, c_mktsegment
from customer_nested c left anti join c.c_orders
where c_custkey < 4""",
      duck("""select c.c_custkey, c.c_mktsegment from customer_n c
where c.c_custkey < 4
  and not exists (select 1 from orders_n o where o.o_custkey = c.c_custkey)"""))

block("nested-types-subplan.test",
      "Test hash join inside a subplan. " + CLOSED_NOTE,
      """select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from customer_nested c,
  (select o1.o_orderkey, o2.o_orderdate
   from c.c_orders o1, c.c_orders o2
   where o1.o_orderkey = o2.o_orderkey) v
where c_custkey < 4""",
      duck("""select c.c_custkey, c.c_mktsegment, o1.o_orderkey, o2.o_orderdate
from customer_n c
join orders_n o1 on o1.o_custkey = c.c_custkey
join orders_n o2 on o2.o_custkey = c.c_custkey
where o1.o_orderkey = o2.o_orderkey and c.c_custkey < 4"""))

block("nested-types-subplan.test",
      "Test uncorrelated scalar subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, c_acctbal
from customer_nested c
where c_custkey < 10
  and c_acctbal < (select avg(o_totalprice) from c.c_orders)""",
      duck("""select c.c_custkey, c.c_mktsegment, c.c_acctbal
from customer_n c
where c.c_custkey < 10 and c.c_acctbal <
  (select avg(o.o_totalprice) from orders_n o
   where o.o_custkey = c.c_custkey)"""))

block("nested-types-subplan.test",
      "Test correlated scalar subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, c_acctbal
from customer_nested c
where c_custkey < 10
  and c_acctbal < (select avg(o_totalprice) from c.c_orders o
                   where c.c_custkey != o.o_orderkey)""",
      duck("""select c.c_custkey, c.c_mktsegment, c.c_acctbal
from customer_n c
where c.c_custkey < 10 and c.c_acctbal <
  (select avg(o.o_totalprice) from orders_n o
   where o.o_custkey = c.c_custkey and c.c_custkey != o.o_orderkey)"""))

block("nested-types-subplan.test",
      "Test uncorrelated EXISTS subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, c_acctbal
from customer_nested c
where c_custkey < 10
  and exists (select o_orderkey from c.c_orders where o_orderkey % 2 = 0)""",
      duck("""select c.c_custkey, c.c_mktsegment, c.c_acctbal
from customer_n c
where c.c_custkey < 10 and exists
  (select 1 from orders_n o
   where o.o_custkey = c.c_custkey and o.o_orderkey % 2 = 0)"""))

block("nested-types-subplan.test",
      "Test uncorrelated NOT EXISTS subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, c_acctbal
from customer_nested c
where c_custkey < 10
  and not exists (select o_orderkey from c.c_orders where o_orderkey % 2 = 0)""",
      duck("""select c.c_custkey, c.c_mktsegment, c.c_acctbal
from customer_n c
where c.c_custkey < 10 and not exists
  (select 1 from orders_n o
   where o.o_custkey = c.c_custkey and o.o_orderkey % 2 = 0)"""))

block("nested-types-subplan.test",
      "Test correlated EXISTS subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, c_acctbal
from customer_nested c
where c_custkey < 10
  and exists (select o_orderkey from c.c_orders o
              where c.c_acctbal * 10 > o.o_totalprice)""",
      duck("""select c.c_custkey, c.c_mktsegment, c.c_acctbal
from customer_n c
where c.c_custkey < 10 and exists
  (select 1 from orders_n o
   where o.o_custkey = c.c_custkey and c.c_acctbal * 10 > o.o_totalprice)"""))

block("nested-types-subplan.test",
      "Test correlated NOT EXISTS subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, c_acctbal
from customer_nested c
where c_custkey < 10
  and not exists (select o_orderkey from c.c_orders o
                  where c.c_acctbal * 10 > o.o_totalprice)""",
      duck("""select c.c_custkey, c.c_mktsegment, c.c_acctbal
from customer_n c
where c.c_custkey < 10 and not exists
  (select 1 from orders_n o
   where o.o_custkey = c.c_custkey and c.c_acctbal * 10 > o.o_totalprice)"""))

block("nested-types-subplan.test",
      "Test uncorrelated IN subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
from customer_nested c, c.c_orders o
where c_custkey < 10
  and cast(o_orderdate as timestamp) + interval 13 days in
    (select cast(l_shipdate as timestamp) from o.o_lineitems)""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice,
       o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 10
  and cast(o.o_orderdate as timestamp) + interval 13 day in
    (select cast(l.l_shipdate as timestamp) from lineitem_n l
     where l.l_orderkey = o.o_orderkey)"""))

block("nested-types-subplan.test",
      "Test correlated IN subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
from customer_nested c, c.c_orders o
where c_custkey < 10
  and cast(o_orderdate as timestamp) + interval 13 days in
    (select cast(l_shipdate as timestamp) from o.o_lineitems
     where c_acctbal > l_extendedprice * l_tax)""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice,
       o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 10
  and cast(o.o_orderdate as timestamp) + interval 13 day in
    (select cast(l.l_shipdate as timestamp) from lineitem_n l
     where l.l_orderkey = o.o_orderkey
       and c.c_acctbal > l.l_extendedprice * l.l_tax)"""))

block("nested-types-subplan.test",
      "Test uncorrelated NOT IN subquery with a relative table ref.",
      """select c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
from customer_nested c, c.c_orders o
where c_custkey < 10
  and o_orderdate like "1995%"
  and cast(o_orderdate as timestamp) + interval 13 days not in
      (select cast(l_shipdate as timestamp)
       from o.o_lineitems)""",
      duck("""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice,
       o.o_orderdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 10
  and o.o_orderdate like '1995%'
  and cast(o.o_orderdate as timestamp) + interval 13 day not in
    (select cast(l.l_shipdate as timestamp) from lineitem_n l
     where l.l_orderkey = o.o_orderkey)"""))

_k2 = [r[0] for r in con.sql(
    "select o_orderkey from orders_n where o_custkey in (2, 3) limit 2").fetchall()]
block("nested-types-subplan.test",
      "Nested subplans with predicates on every table ref.",
      f"""select c_custkey, c_mktsegment, o_orderkey, o_orderdate, l_linenumber, l_shipdate
from customer_nested c, c.c_orders o, o.o_lineitems i
where c_custkey in (2, 3) and o_orderkey in ({_k2[0]}, {_k2[1]})
  and l_linenumber % 2 = 0""",
      duck(f"""select c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderdate,
       l.l_linenumber, l.l_shipdate
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
join lineitem_n l on l.l_orderkey = o.o_orderkey
where c.c_custkey in (2, 3) and o.o_orderkey in ({_k2[0]}, {_k2[1]})
  and l.l_linenumber % 2 = 0"""))

block("nested-types-subplan.test",
      "IMPALA-2289: left outer join over an empty collection.",
      """select c_custkey, o_orderkey
from customer_nested c left outer join c.c_orders
where c_custkey = 1""",
      duck("""select c.c_custkey, o.o_orderkey
from customer_n c left join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey = 1"""))

block("nested-types-subplan.test",
      "IMPALA-2289: anti join count over a key range.",
      """select count(*) from customer_nested c left anti join c.c_orders
where c_custkey between 1 and 150""",
      duck("""select count(*) from customer_n c
where c.c_custkey between 1 and 150
  and not exists (select 1 from orders_n o where o.o_custkey = c.c_custkey)"""))

block("nested-types-subplan.test",
      "IMPALA-2539: empty union operands containing relative table refs.",
      """select c_custkey, o_orderkey
from customer_nested c,
 (select o_orderkey from c.c_orders o1
  union distinct
  select o_orderkey from c.c_orders o2
  where false
  union all
  select o_orderkey from c.c_orders o3
  where false
 ) v1
where c_custkey = 2""",
      duck("""select c.c_custkey, o.o_orderkey
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey = 2"""))

# ---------------------------------------------------------------------
# subplans.test
# ---------------------------------------------------------------------
block("subplans.test",
      "Test a union inside a subplan with some constant operands.",
      """select c_custkey, o_orderkey from customer_nested c,
  (select o_orderkey from c.c_orders
   union all
   values(100), (200), (300)) v
where c_custkey in (1, 2, 3)""",
      duck("""select c.c_custkey, v.o_orderkey from customer_n c, lateral (
  select o.o_orderkey from orders_n o where o.o_custkey = c.c_custkey
  union all select * from (values (100), (200), (300)) t(o_orderkey)) v
where c.c_custkey in (1, 2, 3)"""))

block("subplans.test",
      "Test an order by + limit (topn node) inside a subplan.",
      """select c_custkey, o_orderkey from customer_nested c,
  (select o_orderkey from c.c_orders
   order by o_orderkey desc limit 2) v
where c_custkey in (1, 2, 3)""",
      duck("""select c.c_custkey, v.o_orderkey from customer_n c, lateral (
  select o.o_orderkey from orders_n o where o.o_custkey = c.c_custkey
  order by o.o_orderkey desc limit 2) v
where c.c_custkey in (1, 2, 3)"""))

block("subplans.test", "Test a select node inside a subplan.",
      """select c_custkey, o_orderkey from customer_nested c,
  (select o_orderkey from c.c_orders
   order by o_orderkey desc limit 2) v
where c_custkey in (1, 2, 3) and o_orderkey % 2 = 0""",
      duck("""select c_custkey, o_orderkey from (
  select c.c_custkey, v.o_orderkey from customer_n c, lateral (
    select o.o_orderkey from orders_n o where o.o_custkey = c.c_custkey
    order by o.o_orderkey desc limit 2) v
  where c.c_custkey in (1, 2, 3)) where o_orderkey % 2 = 0"""))

block("subplans.test",
      "Analytic function that requires a sort inside a subplan.",
      """select c_custkey, o_orderstatus, o_orderdate, o_orderkey, r
from customer_nested c,
  (select o_orderstatus, o_orderdate, o_orderkey,
   row_number() over (partition by o_orderstatus order by o_orderdate, o_orderkey) r
   from c.c_orders) v
where c_custkey in (2, 3)""",
      duck("""select c.c_custkey, o.o_orderstatus, o.o_orderdate, o.o_orderkey,
  row_number() over (partition by c.c_custkey, o.o_orderstatus
                     order by o.o_orderdate, o.o_orderkey)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey in (2, 3)"""))

block("subplans.test",
      "Analytic function that does not require a sort inside a subplan.",
      """select c_custkey, mp from customer_nested c,
  (select max(o_totalprice) over () mp
   from c.c_orders) v
where c_custkey in (2, 3)""",
      duck("""select c.c_custkey,
  max(o.o_totalprice) over (partition by c.c_custkey)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey in (2, 3)"""))

_mxavg = []
for ck, avgmax in con.sql("""
  select c_custkey, avg(maxp) from (
    select c.c_custkey, max(o.o_totalprice) maxp
    from customer_n c join orders_n o on o.o_custkey = c.c_custkey
    where c.c_custkey < 3 group by c.c_custkey, o.o_orderpriority)
  group by 1 order by 1""").fetchall():
    # duck avg(decimal) is double; recompute exactly below
    pass
for ck, in con.sql("select distinct c_custkey from customer_n where c_custkey < 3 and exists (select 1 from orders_n o where o.o_custkey = c_custkey) order by 1").fetchall():
    rows = con.sql(f"""select max(o_totalprice) from orders_n
                      where o_custkey = {ck} group by o_orderpriority""").fetchall()
    s = sum((decimal.Decimal(r[0]) for r in rows), decimal.Decimal(0))
    avg = (s / len(rows)).quantize(decimal.Decimal("0.000001"),
                                   rounding=decimal.ROUND_HALF_UP)
    _mxavg.append(f"{ck},{avg}")
block("subplans.test", "Aggregate over a grouped subplan aggregate.",
      """SELECT c_custkey, avg(maxp)
FROM customer_nested c,
  (SELECT MAX(o_totalprice) maxp
   FROM c.c_orders GROUP BY o_orderpriority) v
WHERE c_custkey < 3
GROUP BY c_custkey""",
      _mxavg)

block("subplans.test", "Test a self-join inside a subplan. " + CLOSED_NOTE,
      """SELECT count(okey), opriority
FROM customer_nested c,
  (SELECT ca.o_orderkey okey, ca.o_orderpriority opriority
   FROM c.c_orders ca, c.c_orders cb
   WHERE ca.o_orderkey = cb.o_orderkey) v
GROUP BY opriority""",
      duck("""SELECT count(ca.o_orderkey), ca.o_orderpriority
FROM customer_n c
JOIN orders_n ca ON ca.o_custkey = c.c_custkey
JOIN orders_n cb ON cb.o_custkey = c.c_custkey
WHERE ca.o_orderkey = cb.o_orderkey
GROUP BY ca.o_orderpriority"""))

block("subplans.test",
      "Test a join inside a subplan (empty result). " + CLOSED_NOTE,
      """SELECT count(okey), opriority
FROM customer_nested c,
  (SELECT ca.o_orderkey okey, ca.o_orderpriority opriority
   FROM c.c_orders ca, c.c_orders cb
   WHERE ca.o_orderkey = cb.o_orderkey
   AND ca.o_totalprice + cb.o_totalprice < 2) v
GROUP BY opriority""",
      duck("""SELECT count(ca.o_orderkey), ca.o_orderpriority
FROM customer_n c
JOIN orders_n ca ON ca.o_custkey = c.c_custkey
JOIN orders_n cb ON cb.o_custkey = c.c_custkey
WHERE ca.o_orderkey = cb.o_orderkey
  AND ca.o_totalprice + cb.o_totalprice < 2
GROUP BY ca.o_orderpriority"""))

block("subplans.test",
      "Test a left outer join inside a subplan. " + CLOSED_LO_NOTE,
      """SELECT count(okey), opriority
FROM customer_nested c,
  (SELECT ca.o_orderkey okey, ca.o_orderpriority opriority
   FROM c.c_orders ca LEFT OUTER JOIN c.c_orders cb
   ON ca.o_orderkey = cb.o_orderkey) v
GROUP BY opriority""",
      duck("""SELECT count(ca.o_orderkey), ca.o_orderpriority
FROM customer_n c
JOIN orders_n ca ON ca.o_custkey = c.c_custkey
LEFT OUTER JOIN orders_n cb
  ON cb.o_custkey = ca.o_custkey AND ca.o_orderkey = cb.o_orderkey
GROUP BY ca.o_orderpriority"""))

block("subplans.test",
      "Left outer join inside a subplan where most left rows have NO "
      "match — pins the NULL-emission path of the round-14 closure "
      "(count(cbkey) counts only matched rights).",
      """SELECT count(okey) n_left, count(cbkey) n_matched
FROM customer_nested c,
  (SELECT ca.o_orderkey okey, cb.o_orderkey cbkey
   FROM c.c_orders ca LEFT OUTER JOIN c.c_orders cb
   ON cb.o_orderkey = ca.o_orderkey + 1) v""",
      duck("""SELECT count(ca.o_orderkey) n_left, count(cb.o_orderkey) n_matched
FROM customer_n c
JOIN orders_n ca ON ca.o_custkey = c.c_custkey
LEFT OUTER JOIN orders_n cb
  ON cb.o_custkey = ca.o_custkey AND cb.o_orderkey = ca.o_orderkey + 1"""))

# ---------------------------------------------------------------------
# nested-types-with-clause.test
# ---------------------------------------------------------------------
_ck4 = duck("""select c.c_custkey, o.o_orderkey
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey = 4""")
block("nested-types-with-clause.test",
      "IMPALA-2414: correlated WITH clause view.",
      """select c_custkey, o_orderkey from customer_nested c join
  (with w as (select o_orderkey from c.c_orders) select o_orderkey from w) v
where c_custkey = 4""",
      _ck4)

block("nested-types-with-clause.test",
      "IMPALA-2414: correlated WITH clause view nested in another WITH.",
      """select c_custkey, o_orderkey from customer_nested c join
  (with w1 as (with w2 as (select o_orderkey from c.c_orders) select * from w2)
   select o_orderkey from w1) v
where c_custkey = 4""",
      _ck4)

# ---------------------------------------------------------------------
# nested-types-tpch.test
# ---------------------------------------------------------------------
block("nested-types-tpch.test", "count over 3 levels with predicates.",
      f"""select count(*)
from customer_nested c, c.c_orders o, o.o_lineitems i
where c_custkey in (2, 3) and o_orderkey in ({_k2[0]}, {_k2[1]})""",
      duck(f"""select count(*)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
join lineitem_n l on l.l_orderkey = o.o_orderkey
where c.c_custkey in (2, 3) and o.o_orderkey in ({_k2[0]}, {_k2[1]})"""))

block("nested-types-tpch.test", "count(*) over all nested lineitems.",
      """select count(*)
from customer_nested c, c.c_orders o, o.o_lineitems i""",
      duck("""select count(*)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
join lineitem_n l on l.l_orderkey = o.o_orderkey"""))

block("nested-types-tpch.test",
      "count(l_linenumber) via the full uncorrelated collection path.",
      """select count(l_linenumber)
from customer_nested.c_orders.o_lineitems i""",
      duck("""select count(l.l_linenumber)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
join lineitem_n l on l.l_orderkey = o.o_orderkey"""))

block("nested-types-tpch.test",
      "count(*) via the full uncorrelated collection path.",
      """select count(*)
from customer_nested.c_orders.o_lineitems i""",
      duck("""select count(*)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
join lineitem_n l on l.l_orderkey = o.o_orderkey"""))

block("nested-types-tpch.test",
      "Relational version (almost) of the count query.",
      """select c_custkey, count(*)
from customer join orders on c_custkey = o_custkey
where c_custkey < 10 and o_totalprice > 210000
group by c_custkey
order by c_custkey""",
      duck("""select c.c_custkey, count(*)
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 10 group by 1 order by 1"""),
      ordered=True)

block("nested-types-tpch.test", "anti join over the nested collection.",
      """select c_custkey from customer_nested c left anti join c.c_orders
where c_custkey < 10 order by c_custkey""",
      duck("""select c.c_custkey from customer_n c
where c.c_custkey < 10
  and not exists (select 1 from orders_n o where o.o_custkey = c.c_custkey)
order by 1"""),
      ordered=True)

block("nested-types-tpch.test", "Exercise TOP-N node with array data.",
      """select c_custkey, c_name, o_orderkey, o_orderpriority
from customer_nested c, c.c_orders o
where c_custkey < 100
order by o_orderpriority, o_orderkey
limit 10""",
      duck("""select c.c_custkey, c.c_name, o.o_orderkey, o.o_orderpriority
from customer_n c join orders_n o on o.o_custkey = c.c_custkey
where c.c_custkey < 100
order by o.o_orderpriority, o.o_orderkey limit 10"""),
      ordered=True)

block("nested-types-tpch.test",
      "IMPALA-2229: exchange dedup with zero-width tuples (region_nested; "
      "straight_join hint dropped — exchange planning is Spark's).",
      """SELECT r_regionkey, p_retailprice
FROM (SELECT p1.p_partkey, p2.p_retailprice
      FROM part p1 INNER JOIN part p2 ON p1.p_partkey = p2.p_partkey
      WHERE p1.p_partkey < 100 AND p2.p_partkey < 100) t2
RIGHT JOIN (SELECT r_name, r_regionkey
            FROM region_nested r, r.r_nations
            WHERE r_name = 'AFRICA') t1
  ON t1.r_regionkey = t2.p_partkey""",
      duck("""SELECT t1.r_regionkey, t2.p_retailprice
FROM (SELECT p1.p_partkey, p2.p_retailprice
      FROM part p1 INNER JOIN part p2 ON p1.p_partkey = p2.p_partkey
      WHERE p1.p_partkey < 100 AND p2.p_partkey < 100) t2
RIGHT JOIN (SELECT r.r_name, r.r_regionkey
            FROM region r join nation n on n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'AFRICA') t1
  ON t1.r_regionkey = t2.p_partkey"""))

block("nested-types-tpch.test",
      "IMPALA-2338 shape: outer relational join mixed with a two-level "
      "correlated unnest, grouped with HAVING. (adapted: the p_partkey "
      "< 100 conjunct makes the LEFT JOIN effectively inner, so the "
      "COALESCE always resolves to p_size — as in the reference.)",
      """SELECT COALESCE(t2.p_size, t4.pos, o_orderkey) AS int_col,
  COUNT(*) AS cnt
FROM customer_nested t1
LEFT JOIN part t2 ON t1.c_custkey = t2.p_partkey,
t1.c_orders t3,
t3.o_lineitems t4
WHERE t1.c_custkey < 100 AND t2.p_partkey < 100
GROUP BY 1
HAVING int_col <= 5
ORDER BY 1""",
      duck("""SELECT t2.p_size AS int_col, COUNT(*) AS cnt
FROM customer_n t1
JOIN part t2 ON t1.c_custkey = t2.p_partkey
JOIN orders_n o ON o.o_custkey = t1.c_custkey
JOIN lineitem_n l ON l.l_orderkey = o.o_orderkey
WHERE t1.c_custkey < 100 AND t2.p_partkey < 100
GROUP BY 1
HAVING int_col <= 5
ORDER BY 1"""),
      ordered=True)


block("nested-types-tpch.test",
      "IMPALA-2357: analytic with order by on top of a collection "
      "self-join on pos — stresses the sort above many subplan rows.",
      """SELECT o_orderkey, r FROM
  (SELECT o2.o_orderkey, COUNT(o1.pos) OVER (ORDER BY o2.o_orderkey DESC) r
   FROM customer_nested c
   JOIN c.c_orders o1
   JOIN c.c_orders o2 ON (o1.pos = o2.pos)) v
ORDER BY o_orderkey LIMIT 1""",
      duck("""WITH po AS (SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 pos
  FROM orders_n),
j AS (SELECT o2.o_orderkey FROM po o1 JOIN po o2
      ON o1.o_custkey = o2.o_custkey AND o1.pos = o2.pos),
w AS (SELECT o_orderkey, COUNT(*) OVER (ORDER BY o_orderkey DESC) r FROM j)
SELECT o_orderkey, r FROM w ORDER BY o_orderkey LIMIT 1"""),
      ordered=True)


def emit():
    parts = [FIXTURE.rstrip()]
    for ref, comment, sql, expected, ordered, catch in BLOCKS:
        lines = ["====", "---- QUERY", f"# ref:{ref}"]
        import textwrap
        for cl in textwrap.wrap(comment, 68):
            lines.append("# " + cl)
        lines.append("# duck:skip — expected below IS the DuckDB result "
                     "(regenerated by tools/gen_nested_golden.py)")
        lines.append(sql)
        if ordered:
            lines.append("---- OPTIONS")
            lines.append("order_sensitive")
        if catch:
            lines.append("---- CATCH")
            lines.append(catch)
        else:
            lines.append("---- RESULTS")
            lines.extend(expected)
        parts.append("\n".join(lines))
    with open(OUT, "w") as f:
        f.write("\n".join(parts) + "\n====\n")
    print(f"wrote {OUT}: {len(BLOCKS)} blocks")


emit()

#!/usr/bin/env python3
"""Generate reference-tpcds.test: the reference's TPC-DS corpus
(testdata/workloads/tpcds/queries/tpcds-q*.test) ported onto a TPC-DS
dimensional schema DERIVED FROM THE DRIVER TESTDATA.

The reference runs these against its own TPC-DS load, whose data does not
exist here, so the expected values cannot be lifted. Following the
VERDICT-sanctioned policy (partsupp / nested-subplan precedents), the ten
TPC-DS tables the corpus touches (store_sales, date_dim, item, store,
customer, customer_address, customer_demographics, household_demographics,
time_dim, promotion) are derived deterministically from the driver's
TPC-H-ish parquet via integer/modular arithmetic and calendar math that is
bit-identical across engines, and every block's expected RESULTS are
REGENERATED with DuckDB over the same derivation (plus exact python-decimal
mirroring of Spark's decimal avg/division result types where the two
engines' SQL type systems diverge).

Derivation highlights (mirrored verbatim in the emitted golden file):
 - d_date_sk is the REAL Julian Day Number (1995-01-01 = 2449719), so the
   reference queries' partition-key filters (2450815 = 1998-01-01 etc.)
   and d_dow/d_day_name/week alignments hold.
 - d_month_seq = months since 1900 (2001-01 = 1212), matching the
   constants in q53/q59/q63/q65.
 - store_sales derives from lineitem x orders; ss_ticket_number is
   o_orderkey (one ticket = one visit = one date, the real TPC-DS
   property), per-ticket demographics, money columns are exact
   DECIMAL(7,2)/(9,2) built from integer cents so SUM() is
   association-free on both engines.
 - Adapted constants are flagged per block with "# adapted:" comments
   (driver data spans 1995-01..2001-08 at 1/1000 TPC-DS scale, so a few
   of the reference's selectivity constants would select zero rows).

Usage: python3 tools/gen_tpcds_golden.py   # writes the golden file
"""
import duckdb
import decimal
from decimal import Decimal

SF = "/root/testdata/sf0.001"
OUT = "src/test/resources/golden/reference-tpcds.test"

decimal.getcontext().prec = 60

# ---------------------------------------------------------------------------
# Portable-SQL helpers: these emit text that parses and evaluates
# IDENTICALLY in Spark SQL and DuckDB.
# ---------------------------------------------------------------------------

def case_mod(expr, values, quote=True):
    """CASE (expr) WHEN 0 THEN v0 WHEN 1 THEN v1 ... END over len(values)."""
    arms = " ".join(
        f"when {i} then " + (f"'{v}'" if quote else str(v))
        for i, v in enumerate(values[:-1]))
    last = f"'{values[-1]}'" if quote else str(values[-1])
    return f"(case ({expr}) {arms} else {last} end)"


SYL = ["ought", "able", "pri", "ese", "anti",
       "cally", "ation", "eing", "n st", "bar"]

# i_brand list includes every brand constant q53/q63 filter on.
BRANDS = ["scholaramalgamalg #14", "scholaramalgamalg #7",
          "exportiunivamalg #9", "scholaramalgamalg #9",
          "amalgimporto #1", "edu packscholar #1", "exportiimporto #1",
          "importoamalg #1", "exportischolar #2", "corpbrand #6",
          "amalgamalg #2", "univnameless #3"]
CLASSES = ["personal", "portable", "reference", "self-help",
           "accessories", "classical", "fragrances", "pants",
           "toddlers", "pop", "lighting", "costume",
           "travel", "football", "dresses", "computers"]
CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
              "Men", "Music", "Shoes", "Sports", "Women"]
COUNTIES = ["Williamson County", "Ziebach County",
            "Walker County", "Daviess County"]
CITIES = ["Midway", "Fairview", "Concord", "Spring Hill",
          "Brownsville", "Greenville", "Pleasant Hill", "Oak Grove"]
STATES = ["TN", "CA", "TX", "FL", "WA", "WI", "OH", "GA"]
ZIPS = ["89436", "30868", "65085", "22977",
        "83927", "77557", "58429", "40697"]
FIRST = ["James", "Mary", "John", "Patricia", "Robert", "Jennifer",
         "Michael", "Linda", "William", "Barbara", "David", "Susan"]
SALUT = ["Mr.", "Mrs.", "Ms.", "Dr.", "Sir", "Miss"]
EDUC = ["Primary", "Secondary", "College", "2 yr Degree",
        "4 yr Degree", "Advanced Degree", "Unknown"]
MARITAL = ["M", "S", "D", "W", "U"]
BUYPOT = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500",
          "Unknown"]


def dec2(cents, p=7):
    """Exact DECIMAL(p,2) from integer cents — portable and exact in both
    engines (int * decimal-literal product is exact, the final cast is a
    no-op on values with <= 2 decimals)."""
    return f"cast(({cents}) * 0.01 as decimal({p},2))"


# syllable rendering of a non-negative int (last two digits), used for
# names the queries only pass through
def syl1(expr):
    return case_mod(f"({expr}) % 10", SYL)


# ---------------------------------------------------------------------------
# Engine-specific fragments
# ---------------------------------------------------------------------------

def parq(table, engine):
    if engine == "spark":
        return f"parquet.`{SF}/{table}.parquet`"
    return f"read_parquet('{SF}/{table}.parquet')"


def series_dates(engine):
    if engine == "spark":
        return ("(select explode(sequence(date'1995-01-01', "
                "date'2002-12-31')) as d_date)")
    return ("(select cast(unnest(generate_series(date '1995-01-01', "
            "date '2002-12-31', interval 1 day)) as date) as d_date)")


def series_int(lo, hi, engine):
    if engine == "spark":
        return f"(select explode(sequence({lo}, {hi})) as i)"
    return f"(select unnest(generate_series({lo}, {hi})) as i)"


def datediff95(col, engine):
    if engine == "spark":
        return f"datediff(cast({col} as date), date'1995-01-01')"
    return f"datediff('day', date '1995-01-01', cast({col} as date))"


# ---------------------------------------------------------------------------
# Table derivations (single source of truth; rendered per engine)
# ---------------------------------------------------------------------------

def v_date_dim(engine):
    return f"""select d_date_sk,
  d_date,
  cast(year(d_date) as int) d_year,
  cast(month(d_date) as int) d_moy,
  cast(day(d_date) as int) d_dom,
  cast((d_date_sk + 1) % 7 as int) d_dow,
  {case_mod('(d_date_sk + 1) % 7',
            ['Sunday', 'Monday', 'Tuesday', 'Wednesday', 'Thursday',
             'Friday', 'Saturday'])} d_day_name,
  (year(d_date) - 1900) * 12 + month(d_date) - 1 d_month_seq,
  cast(floor((d_date_sk - 2415021) / 7) as int) d_week_seq,
  (case when month(d_date) <= 3 then 1 when month(d_date) <= 6 then 2
        when month(d_date) <= 9 then 3 else 4 end) d_qoy
from (select 2449719 + {datediff95('d_date', engine)} as d_date_sk, d_date
      from {series_dates(engine)} s) base"""


def v_time_dim(engine):
    return f"""select cast(i as int) t_time_sk,
  cast(floor(i / 3600) as int) t_hour,
  cast(floor((i % 3600) / 60) as int) t_minute
from {series_int(0, 86399, engine)} s"""


def v_household_demographics(engine):
    return f"""select cast(i as int) hd_demo_sk,
  {case_mod('i % 6', BUYPOT)} hd_buy_potential,
  cast(i % 10 as int) hd_dep_count,
  cast(i % 5 as int) hd_vehicle_count
from {series_int(1, 7200, engine)} s"""


def v_customer_demographics(engine):
    return f"""select cast(i as int) cd_demo_sk,
  {case_mod('i % 2', ['M', 'F'])} cd_gender,
  {case_mod('i % 5', MARITAL)} cd_marital_status,
  {case_mod('i % 7', EDUC)} cd_education_status
from {series_int(1, 2000, engine)} s"""


def v_promotion(engine):
    return f"""select cast(i as int) p_promo_sk,
  {case_mod('i % 2', ['Y', 'N'])} p_channel_dmail,
  {case_mod('i % 3', ['Y', 'N', 'N'])} p_channel_email,
  {case_mod('i % 5', ['Y', 'N', 'N', 'N', 'N'])} p_channel_tv,
  {case_mod('i % 4', ['Y', 'N', 'N', 'N'])} p_channel_event
from {series_int(1, 300, engine)} s"""


def v_item(engine):
    p = "p_partkey"
    return f"""select {p} i_item_sk,
  concat('AAAA', lpad(cast({p} % 500 as varchar(12)), 12, '0')) i_item_id,
  concat('Description of item number ', cast({p} as varchar(12)),
         ' for sale') i_item_desc,
  {case_mod(f'{p} % 12', BRANDS)} i_brand,
  cast(({p} % 12 + 1) * 1001 as int) i_brand_id,
  cast(({p} * 7) % 1000 as int) i_manufact_id,
  concat({syl1(f'({p} * 7) % 1000')}, {syl1(f'cast(floor(({p} * 7) / 10) as int)')}) i_manufact,
  {case_mod(f'cast(floor({p} / 10) as int) % 16', CLASSES)} i_class,
  {case_mod(f'{p} % 10', CATEGORIES)} i_category,
  cast({p} % 10 + 1 as int) i_category_id,
  cast(cast(floor({p} / 20) as int) % 100 + 1 as int) i_manager_id,
  {dec2(f'({p} * 17) % 9900 + 100')} i_current_price,
  {dec2(f'({p} * 11) % 6000 + 80')} i_wholesale_cost
from {parq('part', engine)}"""


def v_store(engine):
    sk = "(n_nationkey + 1)"
    return f"""select cast({sk} as int) s_store_sk,
  concat('AAAAAAAA', lpad(cast({sk} as varchar(4)), 4, '0')) s_store_id,
  {syl1(sk)} s_store_name,
  cast(200 + (n_nationkey * 7) % 100 as int) s_number_employees,
  {case_mod(f'{sk} % 4', COUNTIES)} s_county,
  {case_mod(f'({sk} * 3) % 8', CITIES)} s_city,
  {case_mod(f'{sk} % 8', STATES)} s_state,
  {case_mod(f'{sk} % 8', ZIPS)} s_zip,
  {case_mod(f'{sk} % 2', [-5, -6], quote=False)} s_gmt_offset,
  concat({syl1(f'{sk} % 10')}, ' and sons') s_company_name
from {parq('nation', engine)}"""


def v_customer(engine):
    ck = "c_custkey"
    return f"""select {ck} c_customer_sk,
  (({ck} * 3 + 7) % cc.ccnt) + 1 c_current_addr_sk,
  {case_mod(f'({ck} * 7) % 12', FIRST)} c_first_name,
  concat({syl1(ck)}, {syl1(f'cast(floor({ck} / 10) as int)')}) c_last_name,
  {case_mod(f'{ck} % 6', SALUT)} c_salutation,
  {case_mod(f'{ck} % 3', ['Y', 'N', 'N'])} c_preferred_cust_flag
from {parq('customer', engine)}
cross join (select count(*) ccnt from {parq('customer', engine)}) cc"""


def v_customer_address(engine):
    ck = "c_custkey"
    return f"""select {ck} ca_address_sk,
  {case_mod(f'({ck} * 5) % 8', CITIES)} ca_city,
  {case_mod(f'({ck} * 3) % 8', STATES)} ca_state,
  {case_mod(f'{ck} % 8', ZIPS)} ca_zip,
  {case_mod(f'{ck} % 4', COUNTIES)} ca_county,
  {case_mod(f'{ck} % 2', [-5, -6], quote=False)} ca_gmt_offset,
  'United States' ca_country
from {parq('customer', engine)}"""


def v_store_sales(engine):
    # all money columns are exact DECIMALs built from integer cents;
    # per-ticket (= per-order) attributes depend only on o_orderkey so a
    # ticket is one store visit on one date, as in real TPC-DS
    list_c = "((l_orderkey * 31 + l_partkey * 7 + l_linenumber * 3) % 9900 + 100)"
    disc = "((l_orderkey * 11 + l_linenumber * 5) % 50)"
    whole = f"cast(floor({list_c} * (50 + (l_orderkey * 13 + l_linenumber * 7) % 30) / 100.0) as bigint)"
    sales = f"cast(floor({list_c} * (100 - {disc}) / 100.0) as bigint)"
    coup = ("(case when (l_orderkey + l_linenumber) % 5 = 0 then "
            "(l_orderkey * 7 + l_linenumber * 3) % 2000 else 0 end)")
    qty = "((l_orderkey * 7 + l_linenumber * 13) % 99 + 1)"
    return f"""select ss.*,
  cast(ss_sales_price * ss_quantity as decimal(9,2)) ss_ext_sales_price,
  cast(ss_list_price * ss_quantity as decimal(9,2)) ss_ext_list_price,
  {dec2('cast(floor(ss_sales_cents * ss_quantity * 8 / 100.0) as bigint)', 9)} ss_ext_tax,
  cast(ss_sales_price * ss_quantity
       - ss_wholesale_cost * ss_quantity as decimal(9,2)) ss_net_profit
from (
  select 2449719 + {datediff95('o.o_orderdate', engine)} ss_sold_date_sk,
    cast(28800 + (l.l_orderkey * 7919) % 43200 as int) ss_sold_time_sk,
    l.l_partkey ss_item_sk,
    o.o_custkey ss_customer_sk,
    cast((l.l_orderkey * 13) % 2000 + 1 as int) ss_cdemo_sk,
    cast((l.l_orderkey * 17) % 7200 + 1 as int) ss_hdemo_sk,
    ((o.o_custkey * 5 + l.l_orderkey) % cc.ccnt) + 1 ss_addr_sk,
    cast(l.l_orderkey % 25 + 1 as int) ss_store_sk,
    cast((l.l_orderkey * 3 + l.l_linenumber) % 300 + 1 as int) ss_promo_sk,
    l.l_orderkey ss_ticket_number,
    cast({qty} as int) ss_quantity,
    {dec2(list_c)} ss_list_price,
    {dec2(sales)} ss_sales_price,
    {sales} ss_sales_cents,
    {dec2(whole)} ss_wholesale_cost,
    {dec2(coup)} ss_coupon_amt
  from {parq('lineitem', engine)} l
  join {parq('orders', engine)} o on l.l_orderkey = o.o_orderkey
  cross join (select count(*) ccnt from {parq('customer', engine)}) cc
) ss"""


VIEWS = [
    ("date_dim", v_date_dim),
    ("time_dim", v_time_dim),
    ("household_demographics", v_household_demographics),
    ("customer_demographics", v_customer_demographics),
    ("promotion", v_promotion),
    ("item", v_item),
    ("store", v_store),
    ("customer", v_customer),
    ("customer_address", v_customer_address),
    ("store_sales", v_store_sales),
]

# ---------------------------------------------------------------------------
# DuckDB setup
# ---------------------------------------------------------------------------

con = duckdb.connect()
for name, fn in VIEWS:
    con.sql(f"create view {name} as {fn('duck')}")


# ---------------------------------------------------------------------------
# Spark decimal-arithmetic mirroring (exact, python Decimal)
# ---------------------------------------------------------------------------

def spark_adjust(p, s):
    """Spark DecimalType.adjustPrecisionScale."""
    if p <= 38:
        return p, s
    int_digits = p - s
    min_scale = min(s, 6)
    adj = max(38 - int_digits, min_scale)
    return 38, adj


def dec_q(v, s):
    """Quantize HALF_UP to scale s (Spark's decimal rounding)."""
    return v.quantize(Decimal(1).scaleb(-s), rounding=decimal.ROUND_HALF_UP)


def spark_avg(values, s_in):
    """avg(decimal(p,s)) -> decimal(p+4, s+4), HALF_UP; None on empty."""
    vals = [v for v in values if v is not None]
    if not vals:
        return None
    total = sum((Decimal(v) for v in vals), Decimal(0))
    return dec_q(total / len(vals), s_in + 4)


def spark_div(a, ta, b, tb):
    """a/b with Spark's division result type; returns (value, (p, s))."""
    (p1, s1), (p2, s2) = ta, tb
    s = max(6, s1 + p2 + 1)
    p = p1 - s1 + s2 + s
    p, s = spark_adjust(p, s)
    if a is None or b is None or b == 0:
        return None, (p, s)
    return dec_q(Decimal(a) / Decimal(b), s), (p, s)


def spark_mul(a, ta, b, tb):
    """a*b with Spark's multiplication result type; returns (value, (p, s))."""
    (p1, s1), (p2, s2) = ta, tb
    p, s = p1 + p2 + 1, s1 + s2
    p, s = spark_adjust(p, s)
    if a is None or b is None:
        return None, (p, s)
    return dec_q(Decimal(a) * Decimal(b), s), (p, s)


# ---------------------------------------------------------------------------
# Rendering (mirrors GoldenRunner.render)
# ---------------------------------------------------------------------------

def render_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return str(v)


def duck(sql):
    return [",".join(render_val(v) for v in row)
            for row in con.sql(sql).fetchall()]


BLOCKS = []


def block(ref, comment, engine_sql, expected, ordered=False):
    BLOCKS.append((ref, comment, engine_sql.strip(), expected, ordered))


def check_boundary(sql_no_limit, order_cols, limit, rows):
    """Warn when a LIMIT would truncate at a tie on the sort key (would make
    the golden expectation engine-dependent)."""
    if len(rows) < limit:
        return
    full = con.sql(sql_no_limit).fetchall()
    if len(full) <= limit:
        return
    a, b = full[limit - 1], full[limit]
    ka = [a[i] for i in order_cols]
    kb = [b[i] for i in order_cols]
    if ka == kb:
        raise SystemExit(
            f"LIMIT boundary tie — add a tiebreaker: {sql_no_limit[:120]}")


# ---------------------------------------------------------------------------
# Query blocks. Reference text verbatim except "# adapted:" notes — the
# derived data is 1/1000 TPC-DS scale over 1995-01..2001-08, so a few of
# the reference's selectivity constants would select zero rows.
# ---------------------------------------------------------------------------

# --- count.test ------------------------------------------------------------
for t in ["customer", "customer_address", "customer_demographics",
          "date_dim", "household_demographics", "item", "promotion",
          "store", "time_dim", "store_sales"]:
    q = f"select count(*) from {t}"
    block("tpcds/count.test", f"TPCDS-COUNT-{t.upper()}", q, duck(q))

# --- q3 --------------------------------------------------------------------
Q3 = """select
  dt.d_year,
  item.i_brand_id brand_id,
  item.i_brand brand,
  sum(ss_ext_sales_price) sum_agg
from
  date_dim dt,
  store_sales,
  item
where
  dt.d_date_sk = store_sales.ss_sold_date_sk
  and store_sales.ss_item_sk = item.i_item_sk
  and item.i_manufact_id = 434
  and dt.d_moy = 12
  and (ss_sold_date_sk between 2451149 and 2451179
    or ss_sold_date_sk between 2451514 and 2451544
    or ss_sold_date_sk between 2451880 and 2451910
    or ss_sold_date_sk between 2452245 and 2452275
    or ss_sold_date_sk between 2452610 and 2452640)
group by
  dt.d_year,
  item.i_brand,
  item.i_brand_id
order by
  dt.d_year,
  sum_agg desc,
  brand_id
limit 100"""
block("tpcds-q3.test",
      "TPCDS-Q3. adapted: i_manufact_id 436 -> 434 (derived manufact ids "
      "at this SF are (p_partkey*7)%1000 with p<=200).",
      Q3, duck(Q3))

# --- q19 -------------------------------------------------------------------
Q19 = """select
  i_brand_id brand_id,
  i_brand brand,
  i_manufact_id,
  i_manufact,
  sum(ss_ext_sales_price) ext_price
from
  date_dim,
  store_sales,
  item,
  customer,
  customer_address,
  store
where
  d_date_sk = ss_sold_date_sk
  and ss_item_sk = i_item_sk
  and i_manager_id = 7
  and d_moy = 11
  and d_year = 1999
  and ss_customer_sk = c_customer_sk
  and c_current_addr_sk = ca_address_sk
  and substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  and ss_store_sk = s_store_sk
  and ss_sold_date_sk between 2451484 and 2451513
group by
  i_brand,
  i_brand_id,
  i_manufact_id,
  i_manufact
order by
  ext_price desc,
  i_brand,
  i_brand_id,
  i_manufact_id,
  i_manufact
limit 100"""
block("tpcds-q19.test", "TPCDS-Q19.", Q19, duck(Q19))

# --- q42 -------------------------------------------------------------------
Q42 = """select
  dt.d_year,
  item.i_category_id,
  item.i_category,
  sum(ss_ext_sales_price)
from
  date_dim dt,
  store_sales,
  item
where
  dt.d_date_sk = store_sales.ss_sold_date_sk
  and store_sales.ss_item_sk = item.i_item_sk
  and item.i_manager_id = 1
  and dt.d_moy = 12
  and dt.d_year = 1998
  and ss_sold_date_sk between 2451149 and 2451179
group by
  dt.d_year,
  item.i_category_id,
  item.i_category
order by
  sum(ss_ext_sales_price) desc,
  dt.d_year,
  item.i_category_id,
  item.i_category
limit 100"""
block("tpcds-q42.test", "TPCDS-Q42.", Q42, duck(Q42))

# --- q43 -------------------------------------------------------------------
Q43 = """select
  s_store_name,
  s_store_id,
  sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
  sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
  sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
  sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
  sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
  sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
  sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
from
  date_dim,
  store_sales,
  store
where
  d_date_sk = ss_sold_date_sk
  and s_store_sk = ss_store_sk
  and s_gmt_offset = -5
  and d_year = 1998
  and ss_sold_date_sk between 2450816 and 2451179
group by
  s_store_name,
  s_store_id
order by
  s_store_name,
  s_store_id,
  sun_sales,
  mon_sales,
  tue_sales,
  wed_sales,
  thu_sales,
  fri_sales,
  sat_sales
limit 100"""
block("tpcds-q43.test", "TPCDS-Q43.", Q43, duck(Q43))

# --- q52 -------------------------------------------------------------------
Q52 = """select
  dt.d_year,
  item.i_brand_id brand_id,
  item.i_brand brand,
  sum(ss_ext_sales_price) ext_price
from
  date_dim dt,
  store_sales,
  item
where
  dt.d_date_sk = store_sales.ss_sold_date_sk
  and store_sales.ss_item_sk = item.i_item_sk
  and item.i_manager_id = 1
  and dt.d_moy = 12
  and dt.d_year = 1998
  and ss_sold_date_sk between 2451149 and 2451179
group by
  dt.d_year,
  item.i_brand,
  item.i_brand_id
order by
  dt.d_year,
  ext_price desc,
  brand_id
limit 100"""
block("tpcds-q52.test", "TPCDS-Q52.", Q52, duck(Q52))

# --- q55 -------------------------------------------------------------------
Q55 = """select
  i_brand_id brand_id,
  i_brand brand,
  sum(ss_ext_sales_price) ext_price
from
  date_dim,
  store_sales,
  item
where
  d_date_sk = ss_sold_date_sk
  and ss_item_sk = i_item_sk
  and i_manager_id = 6
  and d_moy = 12
  and d_year = 2000
  and ss_sold_date_sk between 2451880 and 2451910
group by
  i_brand,
  i_brand_id
order by
  ext_price desc,
  i_brand_id
limit 100"""
block("tpcds-q55.test",
      "TPCDS-Q55. adapted: d_year 2001 -> 2000 and the partition-key "
      "range to 2000-12 (driver orders end 2001-08, so 2001-12 is "
      "empty); i_manager_id 36 -> 6 (20-item manager blocks cover "
      "1..11 at this SF).",
      Q55, duck(Q55))

# --- q34 -------------------------------------------------------------------
Q34 = """select
  c_last_name,
  c_first_name,
  c_salutation,
  c_preferred_cust_flag,
  ss_ticket_number,
  cnt
from
  (select
    ss_ticket_number,
    ss_customer_sk,
    count(*) cnt
  from
    store_sales,
    date_dim,
    store,
    household_demographics
  where
    store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (date_dim.d_dom between 1 and 3
      or date_dim.d_dom between 25 and 28)
    and (household_demographics.hd_buy_potential = '>10000'
      or household_demographics.hd_buy_potential = 'unknown')
    and household_demographics.hd_vehicle_count > 0
    and (case when household_demographics.hd_vehicle_count > 0 then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count else null end) > 1.2
    and date_dim.d_year in (1998, 1998 + 1, 1998 + 2)
    and store.s_county in ('Saginaw County', 'Sumner County', 'Appanoose County', 'Daviess County', 'Fairfield County', 'Raleigh County', 'Ziebach County', 'Williamson County')
    and ss_sold_date_sk between 2450816 and 2451910
  group by
    ss_ticket_number,
    ss_customer_sk
  ) dn,
  customer
where
  ss_customer_sk = c_customer_sk
  and cnt between 4 and 8
order by
  c_last_name,
  c_first_name,
  c_salutation,
  c_preferred_cust_flag desc
limit 100000"""
block("tpcds-q34.test",
      "TPCDS-Q34. adapted: cnt between 15 and 20 -> between 4 and 8 "
      "(derived tickets carry the driver's 1-12 lineitems per order).",
      Q34, duck(Q34))

# --- q46 -------------------------------------------------------------------
Q46 = """select
  c_last_name,
  c_first_name,
  ca_city,
  bought_city,
  ss_ticket_number,
  amt,
  profit
from
  (select
    ss_ticket_number,
    ss_customer_sk,
    ca_city bought_city,
    sum(ss_coupon_amt) amt,
    sum(ss_net_profit) profit
  from
    store_sales,
    date_dim,
    store,
    household_demographics,
    customer_address
  where
    store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and store_sales.ss_addr_sk = customer_address.ca_address_sk
    and (household_demographics.hd_dep_count = 5
      or household_demographics.hd_vehicle_count = 3)
    and date_dim.d_dow in (6, 0)
    and date_dim.d_year in (1999, 1999 + 1, 1999 + 2)
    and store.s_city in ('Midway', 'Concord', 'Spring Hill', 'Brownsville', 'Greenville')
    and ss_sold_date_sk between 2451180 and 2452275
  group by
    ss_ticket_number,
    ss_customer_sk,
    ss_addr_sk,
    ca_city
  ) dn,
  customer,
  customer_address current_addr
where
  ss_customer_sk = c_customer_sk
  and customer.c_current_addr_sk = current_addr.ca_address_sk
  and current_addr.ca_city <> bought_city
order by
  c_last_name,
  c_first_name,
  ca_city,
  bought_city,
  ss_ticket_number
limit 100"""
block("tpcds-q46.test",
      "TPCDS-Q46. adapted: the reference's explicit weekend-day "
      "partition-key IN list is collapsed to the covering range (the "
      "d_dow in (6,0) predicate already selects the weekend days).",
      Q46, duck(Q46))

# --- q68 -------------------------------------------------------------------
Q68 = """select
  c_last_name,
  c_first_name,
  ca_city,
  bought_city,
  ss_ticket_number,
  extended_price,
  extended_tax,
  list_price
from
  (select
    ss_ticket_number,
    ss_customer_sk,
    ca_city bought_city,
    sum(ss_ext_sales_price) extended_price,
    sum(ss_ext_list_price) list_price,
    sum(ss_ext_tax) extended_tax
  from
    store_sales,
    date_dim,
    store,
    household_demographics,
    customer_address
  where
    store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and store_sales.ss_addr_sk = customer_address.ca_address_sk
    and (household_demographics.hd_dep_count = 5
      or household_demographics.hd_vehicle_count = 3)
    and store.s_city in ('Midway', 'Fairview')
    and ss_sold_date_sk between 2451180 and 2451269
    and d_date between '1999-01-01' and '1999-03-31'
  group by
    ss_ticket_number,
    ss_customer_sk,
    ss_addr_sk,
    ca_city
  ) dn,
  customer,
  customer_address current_addr
where
  ss_customer_sk = c_customer_sk
  and customer.c_current_addr_sk = current_addr.ca_address_sk
  and current_addr.ca_city <> bought_city
order by
  c_last_name,
  ss_ticket_number
limit 100"""
block("tpcds-q68.test", "TPCDS-Q68.", Q68, duck(Q68))

# --- q73 -------------------------------------------------------------------
Q73 = """select
  c_last_name,
  c_first_name,
  c_salutation,
  c_preferred_cust_flag,
  ss_ticket_number,
  cnt
from
  (select
    ss_ticket_number,
    ss_customer_sk,
    count(*) cnt
  from
    store_sales,
    date_dim,
    store,
    household_demographics
  where
    store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (household_demographics.hd_buy_potential = '>10000'
      or household_demographics.hd_buy_potential = 'unknown')
    and household_demographics.hd_vehicle_count > 0
    and case when household_demographics.hd_vehicle_count > 0 then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count else null end > 1
    and store.s_county in ('Saginaw County', 'Sumner County', 'Appanoose County', 'Daviess County')
    and ss_sold_date_sk between 2451180 and 2451544
  group by
    ss_ticket_number,
    ss_customer_sk
  ) dj,
  customer
where
  ss_customer_sk = c_customer_sk
  and cnt between 1 and 5
order by
  cnt desc, c_last_name, c_first_name, ss_ticket_number
limit 1000"""
block("tpcds-q73.test",
      "TPCDS-Q73. adapted: order by cnt desc alone is not a total order "
      "under LIMIT; the reference relies on its fixed dataset — appended "
      "name/ticket tiebreakers. Partition-key range widened to the full "
      "1999 year (the 1/1000-scale derivation has too few qualifying "
      "tickets in one quarter).",
      Q73, duck(Q73))

# --- q79 -------------------------------------------------------------------
Q79 = """select
  c_last_name,
  c_first_name,
  substr(s_city, 1, 30),
  ss_ticket_number,
  amt,
  profit
from
  (select
    ss_ticket_number,
    ss_customer_sk,
    store.s_city,
    sum(ss_coupon_amt) amt,
    sum(ss_net_profit) profit
  from
    store_sales,
    date_dim,
    store,
    household_demographics
  where
    store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (household_demographics.hd_dep_count = 8
      or household_demographics.hd_vehicle_count > 0)
    and store.s_number_employees between 200 and 295
    and d_date between '1999-01-01' and '1999-03-31'
    and ss_sold_date_sk between 2451180 and 2451269
  group by
    ss_ticket_number,
    ss_customer_sk,
    ss_addr_sk,
    store.s_city
  ) ms,
  customer
where
  ss_customer_sk = c_customer_sk
order by
  c_last_name,
  c_first_name,
  substr(s_city, 1, 30),
  profit,
  ss_ticket_number
limit 100"""
block("tpcds-q79.test",
      "TPCDS-Q79. adapted: appended ss_ticket_number to the order by "
      "(profit ties under LIMIT would be dataset-dependent otherwise).",
      Q79, duck(Q79))

# --- q88 -------------------------------------------------------------------
def _q88_sub(alias, hour_pred):
    return f"""(select count(*) {alias}
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and {hour_pred}
     and ((household_demographics.hd_dep_count = 1 and household_demographics.hd_vehicle_count<=1+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2))
     and store.s_store_name = 'ese')"""


Q88 = ("select  *\nfrom\n" + ",\n".join([
    _q88_sub("h8_30_to_9", "time_dim.t_hour = 8\n     and time_dim.t_minute >= 30") + " s1",
    _q88_sub("h9_to_9_30", "time_dim.t_hour = 9\n     and time_dim.t_minute < 30") + " s2",
    _q88_sub("h9_30_to_10", "time_dim.t_hour = 9\n     and time_dim.t_minute >= 30") + " s3",
    _q88_sub("h10_to_10_30", "time_dim.t_hour = 10\n     and time_dim.t_minute < 30") + " s4",
    _q88_sub("h10_30_to_11", "time_dim.t_hour = 10\n     and time_dim.t_minute >= 30") + " s5",
    _q88_sub("h11_to_11_30", "time_dim.t_hour = 11\n     and time_dim.t_minute < 30") + " s6",
    _q88_sub("h11_30_to_12", "time_dim.t_hour = 11\n     and time_dim.t_minute >= 30") + " s7",
    _q88_sub("h12_to_12_30", "time_dim.t_hour = 12\n     and time_dim.t_minute < 30") + " s8",
]))
block("tpcds-q88.test", "TPCDS-Q88.", Q88, duck(Q88))

# --- q96 -------------------------------------------------------------------
Q96 = """SELECT
  COUNT(*) AS total
FROM store_sales ss
JOIN time_dim td
  ON (ss.ss_sold_time_sk = td.t_time_sk)
JOIN household_demographics hd
  ON (ss.ss_hdemo_sk = hd.hd_demo_sk)
JOIN store s
  ON (ss.ss_store_sk = s.s_store_sk)
WHERE
  td.t_hour = 8
  AND td.t_minute >= 30
  AND hd.hd_dep_count = 5
  AND s.s_store_name = 'ese'"""
block("tpcds-q96.test", "TPCDS-Q96.", Q96, duck(Q96))

# --- q53 -------------------------------------------------------------------
Q53 = """select
  *
from
  (select
    i_manufact_id,
    sum(ss_sales_price) sum_sales
  from
    item,
    store_sales,
    date_dim,
    store
  where
    ss_item_sk = i_item_sk
    and ss_sold_date_sk = d_date_sk
    and ss_store_sk = s_store_sk
    and d_month_seq in (1212, 1212 + 1, 1212 + 2, 1212 + 3, 1212 + 4, 1212 + 5, 1212 + 6, 1212 + 7, 1212 + 8, 1212 + 9, 1212 + 10, 1212 + 11)
    and ((i_category in ('Books', 'Children', 'Electronics')
      and i_class in ('personal', 'portable', 'reference', 'self-help')
      and i_brand in ('scholaramalgamalg #14', 'scholaramalgamalg #7', 'exportiunivamalg #9', 'scholaramalgamalg #9'))
    or (i_category in ('Women', 'Music', 'Men')
      and i_class in ('accessories', 'classical', 'fragrances', 'pants')
      and i_brand in ('amalgimporto #1', 'edu packscholar #1', 'exportiimporto #1', 'importoamalg #1')))
    and ss_sold_date_sk between 2451911 and 2452275
  group by
    i_manufact_id,
    d_qoy
  ) tmp1
order by
  sum_sales,
  i_manufact_id
limit 100"""
block("tpcds-q53.test", "TPCDS-Q53.", Q53, duck(Q53))

# --- q8 --------------------------------------------------------------------
# a-side: count per 5-digit zip among preferred customers; derive the
# threshold that keeps roughly half the zips (the reference's >10 assumes
# 50k addresses; the derivation has ccnt/8 per zip).
_zipcnt = con.sql("""select count(*) c from customer_address
  join customer on ca_address_sk = c_current_addr_sk
  where c_preferred_cust_flag = 'Y' group by ca_zip order by c""").fetchall()
_zthr = _zipcnt[len(_zipcnt) // 2][0] if _zipcnt else 1
Q8 = f"""select
  s_store_name,
  sum(ss_net_profit)
from
  store_sales
  join store on (store_sales.ss_store_sk = store.s_store_sk)
  join
  (select
    a.ca_zip
  from
    (select
      substr(ca_zip, 1, 5) ca_zip,
      count( *) cnt
    from
      customer_address
      join  customer on (customer_address.ca_address_sk = customer.c_current_addr_sk)
    where
      c_preferred_cust_flag = 'Y'
    group by
      ca_zip
    having
      count(*) > {_zthr}
    ) a
    left semi join
    (select
      substr(ca_zip, 1, 5) ca_zip
    from
      customer_address
    where
      substr(ca_zip, 1, 5) in ('89436', '30868', '65085', '22977', '83927', '77557', '58429', '40697', '80614', '10502', '32779',
      '91137', '61265', '98294', '17921', '18427', '21203', '59362', '87291', '84093', '21505', '17184', '10866', '67898', '25797',
      '28055', '18377', '80332', '74535', '21757', '29742', '90885', '29898', '17819', '40811', '25990', '47513', '89531', '91068',
      '10391', '18846', '99223', '82637', '41368', '83658', '86199', '81625', '26696', '89338', '88425', '32200', '81427', '19053',
      '77471', '36610', '99823', '43276', '41249', '48584', '83550', '82276', '18842', '78890', '14090', '38123', '40936', '34425',
      '19850', '43286', '80072', '79188', '54191', '11395', '50497', '84861', '90733', '21068', '57666', '37119', '25004', '57835',
      '70067', '62878', '95806', '19303', '18840', '19124', '29785', '16737', '16022', '49613', '89977', '68310', '60069', '98360',
      '48649', '39050', '41793', '25002', '27413', '39736', '47208', '16515', '94808', '57648', '15009', '80015', '42961', '63982',
      '21744', '71853', '81087', '67468', '34175', '64008', '20261', '11201', '51799', '48043', '45645', '61163', '48375', '36447',
      '57042', '21218', '41100', '89951', '22745', '35851', '83326', '61125', '78298', '80752', '49858', '52940', '96976', '63792',
      '11376', '53582', '18717', '90226', '50530', '94203', '99447', '27670', '96577', '57856', '56372', '16165', '23427', '54561',
      '28806', '44439', '22926', '30123', '61451', '92397', '56979', '92309', '70873', '13355', '21801', '46346', '37562', '56458',
      '28286', '47306', '99555', '69399', '26234', '47546', '49661', '88601', '35943', '39936', '25632', '24611', '44166', '56648',
      '30379', '59785', '11110', '14329', '93815', '52226', '71381', '13842', '25612', '63294', '14664', '21077', '82626', '18799',
      '60915', '81020', '56447', '76619', '11433', '13414', '42548', '92713', '70467', '30884', '47484', '16072', '38936', '13036',
      '88376', '45539', '35901', '19506', '65690', '73957', '71850', '49231', '14276', '20005', '18384', '76615', '11635', '38177',
      '55607', '41369', '95447', '58581', '58149', '91946', '33790', '76232', '75692', '95464', '22246', '51061', '56692', '53121',
      '77209', '15482', '10688', '14868', '45907', '73520', '72666', '25734', '17959', '24677', '66446', '94627', '53535', '15560',
      '41967', '69297', '11929', '59403', '33283', '52232', '57350', '43933', '40921', '36635', '10827', '71286', '19736', '80619',
      '25251', '95042', '15526', '36496', '55854', '49124', '81980', '35375', '49157', '63512', '28944', '14946', '36503', '54010',
      '18767', '23969', '43905', '66979', '33113', '21286', '58471', '59080', '13395', '79144', '70373', '67031', '38360', '26705',
      '50906', '52406', '26066', '73146', '15884', '31897', '30045', '61068', '45550', '92454', '13376', '14354', '19770', '22928',
      '97790', '50723', '46081', '30202', '14410', '20223', '88500', '67298', '13261', '14172', '81410', '93578', '83583', '46047',
      '94167', '82564', '21156', '15799', '86709', '37931', '74703', '83103', '23054', '70470', '72008', '49247', '91911', '69998',
      '20961', '70070', '63197', '54853', '88191', '91830', '49521', '19454', '81450', '89091', '62378', '25683', '61869', '51744',
      '36580', '85778', '36871', '48121', '28810', '83712', '45486', '67393', '26935', '42393', '20132', '55349', '86057', '21309',
      '80218', '10094', '11357', '48819', '39734', '40758', '30432', '21204', '29467', '30214', '61024', '55307', '74621', '11622',
      '68908', '33032', '52868', '99194', '99900', '84936', '69036', '99149', '45013', '32895', '59004', '32322', '14933', '32936',
      '33562', '72550', '27385', '58049', '58200', '16808', '21360', '32961', '18586', '79307', '15492')
    ) b
  on (a.ca_zip = b.ca_zip)
  ) v1 on (substr(store.s_zip, 1, 2) = substr(v1.ca_zip, 1, 2))
where
  ss_sold_date_sk between 2451276 and 2451366
group by
  s_store_name
order by
  s_store_name
limit 100"""
block("tpcds-q8.test",
      f"TPCDS-Q8. adapted: partition-key range shifted 2002 -> 1999 "
      f"(driver orders end 2001-08) and the HAVING threshold 10 -> "
      f"{_zthr} (the derivation has ~ccnt/8 preferred customers per "
      f"zip, not TPC-DS's 50k-address density).",
      Q8, duck(Q8
          .replace("left semi join\n    (select",
                   "join (select distinct")))

# --- q6: scalar subqueries + 1.2*avg(decimal) — Spark computes the avg as
# DECIMAL(11,6) HALF_UP while DuckDB returns DOUBLE, so the qualifying
# item set is derived here with exact python decimals and inlined.
_cat_avgs = {}
for cat, in con.sql("select distinct i_category from item").fetchall():
    vals = [r[0] for r in con.sql(
        f"select i_current_price from item where i_category = '{cat}'").fetchall()]
    _cat_avgs[cat] = spark_avg(vals, 2)
_q6_items = [
    sk for sk, cat, price in con.sql(
        "select i_item_sk, i_category, i_current_price from item").fetchall()
    if price is not None
    and Decimal(price) > Decimal("1.2") * _cat_avgs[cat]]
_q6_expected = duck(f"""
 select a.ca_state state, count(*) cnt
 from customer_address a, customer c, store_sales s, date_dim d
 where a.ca_address_sk = c.c_current_addr_sk
   and c.c_customer_sk = s.ss_customer_sk
   and s.ss_sold_date_sk = d.d_date_sk
   and d.d_month_seq = (select distinct (d_month_seq) from date_dim
                        where d_year = 1999 and d_moy = 1 limit 1)
   and s.ss_item_sk in ({','.join(map(str, sorted(_q6_items)))})
 group by a.ca_state
 having count(*) >= 2
 order by cnt, state limit 100""")
Q6 = """select * from (
 select  a.ca_state state, count(*) cnt
 from customer_address a
     ,customer c
     ,store_sales s
     ,date_dim d
     ,item i
 where
        a.ca_address_sk = c.c_current_addr_sk
        and c.c_customer_sk = s.ss_customer_sk
        and s.ss_sold_date_sk = d.d_date_sk
        and s.ss_item_sk = i.i_item_sk
        and d.d_month_seq =
             (select distinct (d_month_seq)
              from date_dim
               where d_year = 1999
                and d_moy = 1
               limit 1)
        and i.i_current_price > 1.2 *
             (select avg(j.i_current_price)
             from item j
             where j.i_category = i.i_category)
 group by a.ca_state
 having count(*) >= 2
 order by cnt, state limit 100) as t"""
block("tpcds-q6.test",
      "TPCDS-Q6. adapted: HAVING >= 10 -> >= 2 (1/1000-scale month "
      "volume) and cnt ties under LIMIT get the state as tiebreaker. "
      "Expected values use exact decimal arithmetic for the correlated "
      "1.2*avg(price) threshold (Spark evaluates it as DECIMAL, DuckDB "
      "as DOUBLE).",
      Q6, _q6_expected)


# --- q7 / q27: avg(int) + avg(decimal) columns — mirror Spark's
# avg(decimal(7,2)) -> decimal(11,6) HALF_UP; avg(int) -> double.
def _avg_mirror_rows(group_sql, keys):
    """group_sql returns key..., then per-column (sum, count) pairs for
    quantity(int), list_price, coupon_amt, sales_price."""
    out = []
    for row in con.sql(group_sql).fetchall():
        ks = list(row[:keys])
        qs, qc, ls, lc, cs, cc, ss, sc = row[keys:]
        agg1 = qs / qc if qc else None          # double in both engines
        agg2 = spark_avg([ls], 2) if lc == 0 else dec_q(Decimal(ls) / lc, 6)
        agg3 = dec_q(Decimal(cs) / cc, 6) if cc else None
        agg4 = dec_q(Decimal(ss) / sc, 6) if sc else None
        if lc == 0:
            agg2 = None
        out.append(ks + [agg1, agg2, agg3, agg4])
    return [",".join(render_val(v) for v in r) for r in out]


Q7 = """select
  i_item_id,
  avg(ss_quantity) agg1,
  avg(ss_list_price) agg2,
  avg(ss_coupon_amt) agg3,
  avg(ss_sales_price) agg4
from
  store_sales,
  customer_demographics,
  date_dim,
  item,
  promotion
where
  ss_sold_date_sk = d_date_sk
  and ss_item_sk = i_item_sk
  and ss_cdemo_sk = cd_demo_sk
  and ss_promo_sk = p_promo_sk
  and cd_gender = 'F'
  and cd_marital_status = 'W'
  and cd_education_status = 'Primary'
  and (p_channel_email = 'N'
    or p_channel_event = 'N')
  and d_year = 1998
  and ss_sold_date_sk between 2450815 and 2451179
group by
  i_item_id
order by
  i_item_id
limit 100"""
_q7_groups = """select i_item_id,
  sum(ss_quantity), count(ss_quantity),
  sum(ss_list_price), count(ss_list_price),
  sum(ss_coupon_amt), count(ss_coupon_amt),
  sum(ss_sales_price), count(ss_sales_price)
from store_sales, customer_demographics, date_dim, item, promotion
where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
  and ss_cdemo_sk = cd_demo_sk and ss_promo_sk = p_promo_sk
  and cd_gender = 'F' and cd_marital_status = 'W'
  and cd_education_status = 'Primary'
  and (p_channel_email = 'N' or p_channel_event = 'N')
  and d_year = 1998 and ss_sold_date_sk between 2450815 and 2451179
group by i_item_id order by i_item_id limit 100"""
block("tpcds-q7.test",
      "TPCDS-Q7. Expected avg(decimal) values mirror Spark's "
      "DECIMAL(11,6) HALF_UP result type exactly (DuckDB returns "
      "DOUBLE for avg(decimal)).",
      Q7, _avg_mirror_rows(_q7_groups, 1))

Q27 = """select
  i_item_id,
  s_state,
  avg(ss_quantity) agg1,
  avg(ss_list_price) agg2,
  avg(ss_coupon_amt) agg3,
  avg(ss_sales_price) agg4
from
  store_sales,
  customer_demographics,
  date_dim,
  store,
  item
where
  ss_sold_date_sk = d_date_sk
  and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk
  and ss_cdemo_sk = cd_demo_sk
  and cd_gender = 'F'
  and cd_marital_status = 'W'
  and cd_education_status = 'Primary'
  and d_year = 1998
  and s_state in ('WI', 'CA', 'TX', 'FL', 'WA', 'TN')
  and ss_sold_date_sk between 2450815 and 2451179
group by
  i_item_id,
  s_state
order by
  i_item_id,
  s_state
limit 100"""
_q27_groups = """select i_item_id, s_state,
  sum(ss_quantity), count(ss_quantity),
  sum(ss_list_price), count(ss_list_price),
  sum(ss_coupon_amt), count(ss_coupon_amt),
  sum(ss_sales_price), count(ss_sales_price)
from store_sales, customer_demographics, date_dim, store, item
where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk and ss_cdemo_sk = cd_demo_sk
  and cd_gender = 'F' and cd_marital_status = 'W'
  and cd_education_status = 'Primary' and d_year = 1998
  and s_state in ('WI', 'CA', 'TX', 'FL', 'WA', 'TN')
  and ss_sold_date_sk between 2450815 and 2451179
group by i_item_id, s_state order by i_item_id, s_state limit 100"""
block("tpcds-q27.test",
      "TPCDS-Q27. Rollup/grouping() stay commented out exactly as in the "
      "reference's own port. Expected avg(decimal) values mirror Spark's "
      "DECIMAL(11,6) HALF_UP result type.",
      Q27, _avg_mirror_rows(_q27_groups, 2))


# --- helpers for window/division mirroring ---------------------------------
def sub_t(ta, tb):
    """Spark Subtract(decimal,decimal) result type."""
    (p1, s1), (p2, s2) = ta, tb
    s = max(s1, s2)
    p = max(p1 - s1, p2 - s2) + s + 1
    return spark_adjust(p, s)


D17_2 = (17, 2)
D19_2 = (19, 2)
D21_6 = (21, 6)


def rows_to_lines(rows):
    return [",".join(render_val(v) for v in r) for r in rows]


# --- q63 -------------------------------------------------------------------
Q63 = """select
  *
from
  (select
    i_manager_id,
    sum(ss_sales_price) sum_sales,
    avg(sum(ss_sales_price)) over (partition by i_manager_id) avg_monthly_sales
  from
    item,
    store_sales,
    date_dim,
    store
  where
    ss_item_sk = i_item_sk
    and ss_sold_date_sk = d_date_sk
    and ss_store_sk = s_store_sk
    and d_month_seq in (1212, 1212 + 1, 1212 + 2, 1212 + 3, 1212 + 4, 1212 + 5, 1212 + 6, 1212 + 7, 1212 + 8, 1212 + 9, 1212 + 10, 1212 + 11)
    and ((i_category in ('Books', 'Children', 'Electronics')
      and i_class in ('personal', 'portable', 'refernece', 'self-help')
      and i_brand in ('scholaramalgamalg #14', 'scholaramalgamalg #7', 'exportiunivamalg #9', 'scholaramalgamalg #9'))
    or (i_category in ('Women', 'Music', 'Men')
      and i_class in ('accessories', 'classical', 'fragrances', 'pants')
      and i_brand in ('amalgimporto #1', 'edu packscholar #1', 'exportiimporto #1', 'importoamalg #1')))
    and ss_sold_date_sk between 2451911 and 2452275
  group by
    i_manager_id,
    d_moy
  ) tmp1
where
case when avg_monthly_sales > 0 then abs (sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
order by
  i_manager_id,
  avg_monthly_sales,
  sum_sales
limit 100"""


def _q63_expected():
    groups = con.sql("""select i_manager_id, d_moy, sum(ss_sales_price)
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
  and ss_store_sk = s_store_sk
  and d_month_seq between 1212 and 1223
  and ((i_category in ('Books', 'Children', 'Electronics')
    and i_class in ('personal', 'portable', 'refernece', 'self-help')
    and i_brand in ('scholaramalgamalg #14', 'scholaramalgamalg #7', 'exportiunivamalg #9', 'scholaramalgamalg #9'))
  or (i_category in ('Women', 'Music', 'Men')
    and i_class in ('accessories', 'classical', 'fragrances', 'pants')
    and i_brand in ('amalgimporto #1', 'edu packscholar #1', 'exportiimporto #1', 'importoamalg #1')))
  and ss_sold_date_sk between 2451911 and 2452275
group by 1, 2""").fetchall()
    from collections import defaultdict
    per_mgr = defaultdict(list)
    for mgr, moy, s in groups:
        per_mgr[mgr].append(Decimal(s))
    out = []
    for mgr, moy, s in groups:
        s = Decimal(s)
        av = spark_avg(per_mgr[mgr], 2)
        if av is None or not av > 0:
            continue
        diff = abs(s - av)
        ratio, _ = spark_div(diff, sub_t(D17_2, D21_6), av, D21_6)
        if ratio is not None and ratio > Decimal("0.1"):
            out.append([mgr, dec_q(s, 2), av])
    out.sort(key=lambda r: (r[0], r[2], r[1]))
    return rows_to_lines(out[:100])


block("tpcds-q63.test",
      "TPCDS-Q63 (the reference's own 'refernece' typo kept). Expected "
      "values mirror Spark's decimal window-avg and division types "
      "(DECIMAL(21,6) avg, DECIMAL(38,16) ratio, HALF_UP).",
      Q63, _q63_expected())

# --- q89 -------------------------------------------------------------------
Q89 = """select * from (select  *
from (
select i_category, i_class, i_brand,
       s_store_name, s_company_name,
       d_moy,
       sum(ss_sales_price) sum_sales,
       avg(sum(ss_sales_price)) over
         (partition by i_category, i_brand, s_store_name, s_company_name)
         avg_monthly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
      ss_sold_date_sk = d_date_sk and
      ss_store_sk = s_store_sk and
      d_year in (2000) and
        ((i_category in ('Children','Music','Home') and
          i_class in ('toddlers','pop','lighting')
         )
      or (i_category in ('Jewelry','Books','Sports') and
          i_class in ('costume','travel','football')
        ))
      and ss_sold_date_sk between 2451545 and 2451910
group by i_category, i_class, i_brand,
         s_store_name, s_company_name, d_moy) tmp1
where case when (avg_monthly_sales <> 0) then (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales) else null end > 0.1
order by sum_sales - avg_monthly_sales, s_store_name, d_moy, i_class,
  i_category, i_brand, s_company_name
limit 100) tmp2"""


def _q89_expected():
    groups = con.sql("""select i_category, i_class, i_brand, s_store_name,
  s_company_name, d_moy, sum(ss_sales_price)
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
  and ss_store_sk = s_store_sk and d_year = 2000
  and ((i_category in ('Children','Music','Home')
        and i_class in ('toddlers','pop','lighting'))
    or (i_category in ('Jewelry','Books','Sports')
        and i_class in ('costume','travel','football')))
  and ss_sold_date_sk between 2451545 and 2451910
group by 1,2,3,4,5,6""").fetchall()
    from collections import defaultdict
    part = defaultdict(list)
    for cat, cls, br, sn, cn, moy, s in groups:
        part[(cat, br, sn, cn)].append(Decimal(s))
    out = []
    for cat, cls, br, sn, cn, moy, s in groups:
        s = Decimal(s)
        av = spark_avg(part[(cat, br, sn, cn)], 2)
        if av is None or av == 0:
            continue
        ratio, _ = spark_div(abs(s - av), sub_t(D17_2, D21_6), av, D21_6)
        if ratio is not None and ratio > Decimal("0.1"):
            out.append([cat, cls, br, sn, cn, moy, dec_q(s, 2), av])
    out.sort(key=lambda r: (r[6] - r[7], r[3], r[5], r[1],
                            r[0], r[2], r[4]))
    return rows_to_lines(out[:100])


block("tpcds-q89.test",
      "TPCDS-Q89. adapted: appended d_moy, i_class to the order by (the "
      "sum-minus-avg sort key ties across months under LIMIT). Expected "
      "values mirror Spark's decimal window-avg/division types.",
      Q89, _q89_expected())

# --- q47 -------------------------------------------------------------------
Q47 = """with v1 as (
 select i_category, i_brand,
        s_store_name, s_company_name,
        d_year, d_moy,
        sum(ss_sales_price) sum_sales,
        avg(sum(ss_sales_price)) over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name, d_year)
          avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name
           order by d_year, d_moy) rn
 from item, store_sales, date_dim, store
 where ss_item_sk = i_item_sk and
       ss_sold_date_sk = d_date_sk and
       ss_store_sk = s_store_sk and
       (
         d_year = 2000 or
         ( d_year = 2000-1 and d_moy =12) or
         ( d_year = 2000+1 and d_moy =1)
       )
 group by i_category, i_brand,
          s_store_name, s_company_name,
          d_year, d_moy),
 v2 as(
 select v1.i_category, v1.i_brand
        ,v1.d_year
        ,v1.avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1.s_store_name = v1_lag.s_store_name and
       v1.s_store_name = v1_lead.s_store_name and
       v1.s_company_name = v1_lag.s_company_name and
       v1.s_company_name = v1_lead.s_company_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1)
 select * from ( select  *
 from v2
 where  d_year = 2000 and
        avg_monthly_sales > 0 and
        case when avg_monthly_sales > 0 then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
 order by sum_sales - avg_monthly_sales, d_year, i_category, i_brand,
   sum_sales, avg_monthly_sales, psum, nsum
 limit 100
 ) as v3"""


def _q47_expected():
    groups = con.sql("""select i_category, i_brand, s_store_name,
  s_company_name, d_year, d_moy, sum(ss_sales_price)
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
  and ss_store_sk = s_store_sk
  and (d_year = 2000 or (d_year = 1999 and d_moy = 12)
       or (d_year = 2001 and d_moy = 1))
group by 1,2,3,4,5,6""").fetchall()
    from collections import defaultdict
    yearpart = defaultdict(list)
    seqpart = defaultdict(list)
    for cat, br, sn, cn, y, m, s in groups:
        yearpart[(cat, br, sn, cn, y)].append(Decimal(s))
        seqpart[(cat, br, sn, cn)].append((y, m, Decimal(s)))
    v1 = {}
    for key, rows in seqpart.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        for rn, (y, m, s) in enumerate(rows, start=1):
            av = spark_avg(yearpart[key + (y,)], 2)
            v1[key + (rn,)] = (y, m, s, av)
    out = []
    for (cat, br, sn, cn, rn), (y, m, s, av) in v1.items():
        prev = v1.get((cat, br, sn, cn, rn - 1))
        nxt = v1.get((cat, br, sn, cn, rn + 1))
        if prev is None or nxt is None or y != 2000:
            continue
        if av is None or not av > 0:
            continue
        ratio, _ = spark_div(abs(s - av), sub_t(D17_2, D21_6), av, D21_6)
        if ratio is not None and ratio > Decimal("0.1"):
            out.append([cat, br, y, av, s, prev[2], nxt[2]])
    out.sort(key=lambda r: (r[4] - r[3], r[2], r[0], r[1], r[4],
                            r[3], r[5], r[6]))
    return rows_to_lines(out[:100])


block("tpcds-q47.test",
      "TPCDS-Q47. adapted: appended i_category, i_brand, sum_sales "
      "tiebreakers to the order by. Expected values mirror Spark's "
      "decimal window-avg/division types.",
      Q47, _q47_expected())

# --- q59 -------------------------------------------------------------------
Q59 = """with
  wss as
  (select
    d_week_seq,
    ss_store_sk,
    sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
    sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
    sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
    sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
    sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
    sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
    sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
  from
    store_sales,
    date_dim
  where
    d_date_sk = ss_sold_date_sk
  group by
    d_week_seq,
    ss_store_sk
  )
select
  s_store_name1,
  s_store_id1,
  d_week_seq1,
  sun_sales1 / sun_sales2,
  mon_sales1 / mon_sales2,
  tue_sales1 / tue_sales2,
  wed_sales1 / wed_sales2,
  thu_sales1 / thu_sales2,
  fri_sales1 / fri_sales2,
  sat_sales1 / sat_sales2
from
  (select
    s_store_name s_store_name1,
    wss.d_week_seq d_week_seq1,
    s_store_id s_store_id1,
    sun_sales sun_sales1,
    mon_sales mon_sales1,
    tue_sales tue_sales1,
    wed_sales wed_sales1,
    thu_sales thu_sales1,
    fri_sales fri_sales1,
    sat_sales sat_sales1
  from
    wss,
    store,
    date_dim d
  where
    d.d_week_seq = wss.d_week_seq
    and ss_store_sk = s_store_sk
    and d_month_seq between 1185 and 1185 + 11
  ) y,
  (select
    s_store_name s_store_name2,
    wss.d_week_seq d_week_seq2,
    s_store_id s_store_id2,
    sun_sales sun_sales2,
    mon_sales mon_sales2,
    tue_sales tue_sales2,
    wed_sales wed_sales2,
    thu_sales thu_sales2,
    fri_sales fri_sales2,
    sat_sales sat_sales2
  from
    wss,
    store,
    date_dim d
  where
    d.d_week_seq = wss.d_week_seq
    and ss_store_sk = s_store_sk
    and d_month_seq between 1185 + 12 and 1185 + 23
  ) x
where
  s_store_id1 = s_store_id2
  and d_week_seq1 = d_week_seq2 - 52
order by
  s_store_name1,
  s_store_id1,
  d_week_seq1
limit 100"""


def _q59_expected():
    wss = {}
    for row in con.sql("""select d_week_seq, ss_store_sk,
      sum(case when d_day_name = 'Sunday' then ss_sales_price end),
      sum(case when d_day_name = 'Monday' then ss_sales_price end),
      sum(case when d_day_name = 'Tuesday' then ss_sales_price end),
      sum(case when d_day_name = 'Wednesday' then ss_sales_price end),
      sum(case when d_day_name = 'Thursday' then ss_sales_price end),
      sum(case when d_day_name = 'Friday' then ss_sales_price end),
      sum(case when d_day_name = 'Saturday' then ss_sales_price end)
    from store_sales, date_dim where d_date_sk = ss_sold_date_sk
    group by 1, 2""").fetchall():
        wss[(row[0], row[1])] = [
            None if v is None else Decimal(v) for v in row[2:]]
    stores = {r[0]: (r[1], r[2]) for r in con.sql(
        "select s_store_sk, s_store_name, s_store_id from store").fetchall()}
    ydays = {r[0]: r[1] for r in con.sql(
        """select d_week_seq, count(*) from date_dim
           where d_month_seq between 1185 and 1196 group by 1""").fetchall()}
    xdays = {r[0]: r[1] for r in con.sql(
        """select d_week_seq, count(*) from date_dim
           where d_month_seq between 1197 and 1208 group by 1""").fetchall()}
    out = []
    for (w, sk), sales1 in wss.items():
        if w not in ydays or sk not in stores:
            continue
        sales2 = wss.get((w + 52, sk))
        if sales2 is None or (w + 52) not in xdays:
            continue
        name, sid = stores[sk]
        ratios = [spark_div(a, D17_2, b, D17_2)[0]
                  for a, b in zip(sales1, sales2)]
        mult = ydays[w] * xdays[w + 52]
        out.extend([[name, sid, w] + ratios] * mult)
    out.sort(key=lambda r: (r[0], r[1], r[2]))
    return rows_to_lines(out[:100])


block("tpcds-q59.test",
      "TPCDS-Q59. Expected division values mirror Spark's "
      "DECIMAL(37,20) HALF_UP quotient type.",
      Q59, _q59_expected())

# --- q61 -------------------------------------------------------------------
Q61 = """select promotions,total,cast(promotions as decimal(15,4))/cast(total as decimal(15,4))*100
from
  (select sum(ss_ext_sales_price) promotions
   from  store_sales
        ,store
        ,promotion
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_promo_sk = p_promo_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -5
   and   i_category = 'Books'
   and   (p_channel_dmail = 'Y' or p_channel_email = 'Y' or p_channel_tv = 'Y')
   and   s_gmt_offset = -5
   and   d_year = 2000
   and   d_moy  = 11) promotional_sales,
  (select sum(ss_ext_sales_price) total
   from  store_sales
        ,store
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -5
   and   i_category = 'Books'
   and   s_gmt_offset = -5
   and   d_year = 2000
   and   d_moy  = 11) all_sales
order by promotions, total"""


def _q61_expected():
    promos = con.sql("""select sum(ss_ext_sales_price) from store_sales,
      store, promotion, date_dim, customer, customer_address, item
      where ss_sold_date_sk = d_date_sk and ss_store_sk = s_store_sk
      and ss_promo_sk = p_promo_sk and ss_customer_sk = c_customer_sk
      and ca_address_sk = c_current_addr_sk and ss_item_sk = i_item_sk
      and ca_gmt_offset = -5 and i_category = 'Books'
      and (p_channel_dmail = 'Y' or p_channel_email = 'Y'
           or p_channel_tv = 'Y')
      and s_gmt_offset = -5 and d_year = 2000 and d_moy = 11""").fetchone()[0]
    total = con.sql("""select sum(ss_ext_sales_price) from store_sales,
      store, date_dim, customer, customer_address, item
      where ss_sold_date_sk = d_date_sk and ss_store_sk = s_store_sk
      and ss_customer_sk = c_customer_sk
      and ca_address_sk = c_current_addr_sk and ss_item_sk = i_item_sk
      and ca_gmt_offset = -5 and i_category = 'Books'
      and s_gmt_offset = -5 and d_year = 2000 and d_moy = 11""").fetchone()[0]
    p = None if promos is None else Decimal(promos)
    t = None if total is None else Decimal(total)
    q, qt = spark_div(p, (15, 4), t, (15, 4))
    # integer literals are typed by their own precision: 100 -> DECIMAL(3,0)
    ratio, _ = spark_mul(q, qt, Decimal(100), (3, 0))
    return rows_to_lines([[p, t, ratio]])


block("tpcds-q61.test",
      "TPCDS-Q61. Expected ratio mirrors Spark's decimal "
      "division/multiplication result types (DECIMAL(38,12)).",
      Q61, _q61_expected())

# --- q65 -------------------------------------------------------------------
Q65 = """select
  s_store_name,
  i_item_desc,
  sc.revenue,
  i_current_price,
  i_wholesale_cost,
  i_brand
from
  store,
  item,
  (select
    ss_store_sk,
    avg(revenue) as ave
  from
    (select
      ss_store_sk,
      ss_item_sk,
      sum(ss_sales_price) as revenue
    from
      store_sales,
      date_dim
    where
      ss_sold_date_sk = d_date_sk
      and d_month_seq between 1212 and 1212 + 11
      and ss_sold_date_sk between 2451911 and 2452275
    group by
      ss_store_sk,
      ss_item_sk
    ) sa
  group by
    ss_store_sk
  ) sb,
  (select
    ss_store_sk,
    ss_item_sk,
    sum(ss_sales_price) as revenue
  from
    store_sales,
    date_dim
  where
    ss_sold_date_sk = d_date_sk
    and d_month_seq between 1212 and 1212 + 11
    and ss_sold_date_sk between 2451911 and 2452275
  group by
    ss_store_sk,
    ss_item_sk
  ) sc
where
  sb.ss_store_sk = sc.ss_store_sk
  and sc.revenue <= 0.1 * sb.ave
  and s_store_sk = sc.ss_store_sk
  and i_item_sk = sc.ss_item_sk
order by
  s_store_name,
  i_item_desc,
  sc.revenue
limit 100"""


def _q65_expected():
    groups = con.sql("""select ss_store_sk, ss_item_sk, sum(ss_sales_price)
from store_sales, date_dim
where ss_sold_date_sk = d_date_sk and d_month_seq between 1212 and 1223
  and ss_sold_date_sk between 2451911 and 2452275
group by 1, 2""").fetchall()
    from collections import defaultdict
    per_store = defaultdict(list)
    for st, it, rev in groups:
        per_store[st].append(Decimal(rev))
    stores = {r[0]: r[1] for r in con.sql(
        "select s_store_sk, s_store_name from store").fetchall()}
    items = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.sql(
        """select i_item_sk, i_item_desc, i_current_price,
           i_wholesale_cost, i_brand from item""").fetchall()}
    out = []
    for st, it, rev in groups:
        rev = Decimal(rev)
        ave = spark_avg(per_store[st], 2)
        thr, _ = spark_mul(Decimal("0.1"), (1, 1), ave, D21_6)
        if thr is None or rev > thr or st not in stores or it not in items:
            continue
        desc, price, cost, brand = items[it]
        out.append([stores[st], desc, dec_q(rev, 2),
                    None if price is None else Decimal(price),
                    None if cost is None else Decimal(cost), brand])
    out.sort(key=lambda r: (r[0], r[1], r[2]))
    return rows_to_lines(out[:100])


block("tpcds-q65.test",
      "TPCDS-Q65. adapted: appended sc.revenue tiebreaker to the order "
      "by. Expected threshold mirrors Spark's exact decimal "
      "avg/multiplication (DuckDB computes avg(decimal) as DOUBLE).",
      Q65, _q65_expected())

# --- q98 -------------------------------------------------------------------
Q98 = """select
  i_item_desc,
  i_category,
  i_class,
  i_current_price,
  sum(ss_ext_sales_price) as itemrevenue,
  sum(ss_ext_sales_price)*100/sum(sum(ss_ext_sales_price)) over (partition by i_class) as revenueratio
from
  store_sales,
  item,
  date_dim
where
  ss_item_sk = i_item_sk
  and i_category in ('Jewelry', 'Sports', 'Books')
  and ss_sold_date_sk = d_date_sk
  and ss_sold_date_sk between 2451911 and 2451941
  and d_date between '2001-01-01' and '2001-01-31'
group by
  i_item_id,
  i_item_desc,
  i_category,
  i_class,
  i_current_price
order by
  i_category,
  i_class,
  i_item_id,
  i_item_desc,
  revenueratio
limit 1000"""


def _q98_expected():
    groups = con.sql("""select i_item_id, i_item_desc, i_category, i_class,
  i_current_price, sum(ss_ext_sales_price)
from store_sales, item, date_dim
where ss_item_sk = i_item_sk
  and i_category in ('Jewelry', 'Sports', 'Books')
  and ss_sold_date_sk = d_date_sk
  and ss_sold_date_sk between 2451911 and 2451941
  and d_date between '2001-01-01' and '2001-01-31'
group by 1,2,3,4,5""").fetchall()
    from collections import defaultdict
    per_class = defaultdict(Decimal)
    for iid, desc, cat, cls, price, s in groups:
        per_class[cls] += Decimal(s)
    out = []
    for iid, desc, cat, cls, price, s in groups:
        num, nt = spark_mul(Decimal(s), D19_2, Decimal(100), (3, 0))
        ratio, _ = spark_div(num, nt, per_class[cls], (29, 2))
        out.append([iid, desc, cat, cls,
                    None if price is None else Decimal(price),
                    dec_q(Decimal(s), 2), ratio])
    out.sort(key=lambda r: (r[2], r[3], r[0], r[1], r[6]))
    return [",".join(render_val(v) for v in r[1:]) for r in out[:1000]]


block("tpcds-q98.test",
      "TPCDS-Q98. Expected revenueratio mirrors Spark's DECIMAL(38,8) "
      "quotient type.",
      Q98, _q98_expected())


# ---------------------------------------------------------------------------
# Emit the golden file (engine-side view DDL + query blocks)
# ---------------------------------------------------------------------------

HEADER = f"""====
---- QUERY
# PROVENANCE: queries lifted from the reference's TPC-DS corpus
# (testdata/workloads/tpcds/queries/tpcds-q*.test and count.test, per-block
# "# ref:" tags), run against a TPC-DS dimensional schema derived from the
# driver testdata (the reference's own TPC-DS load does not exist here).
# Expected RESULTS are REGENERATED with DuckDB over the same derivation by
# tools/gen_tpcds_golden.py — an independent oracle, re-runnable at any
# time — with exact python-decimal mirroring of Spark's decimal
# avg/division result types where the two engines' SQL type systems
# diverge. Adapted constants are flagged per block with "adapted:" notes.
# This file is generated — edit the generator.
select 1 as provenance_header
---- RESULTS
1
"""


def emit():
    parts = [HEADER.rstrip()]
    for name, fn in VIEWS:
        parts.append(f"""====
---- QUERY
# duck:skip — fixture DDL (tpcds derived schema; see file header).
# NOTE: this intentionally shadows the TPC-H `customer` mount for the
# rest of this file; the final block restores it.
create or replace temporary view {name} as
{fn('spark')}
---- RESULTS""")
    for name in ["store_sales", "date_dim", "time_dim",
                 "household_demographics"]:
        parts.append(f"""====
---- QUERY
# duck:skip — engine-side cache (each query re-derives the fact table
# otherwise; DuckDB materializes its views per statement anyway)
cache table {name}
---- RESULTS""")
    import textwrap
    for ref, comment, sql, expected, ordered in BLOCKS:
        lines = ["====", "---- QUERY", f"# ref:{ref}"]
        for cl in textwrap.wrap(comment, 68):
            lines.append("# " + cl)
        lines.append("# duck:skip — expected below IS the DuckDB result "
                     "(regenerated by tools/gen_tpcds_golden.py)")
        lines.append(sql)
        if ordered:
            lines.append("---- OPTIONS")
            lines.append("order_sensitive")
        lines.append("---- RESULTS")
        lines.extend(expected)
        parts.append("\n".join(lines))
    for name in ["store_sales", "date_dim", "time_dim",
                 "household_demographics"]:
        parts.append(f"""====
---- QUERY
# duck:skip — cleanup
uncache table {name}
---- RESULTS""")
    parts.append(f"""====
---- QUERY
# duck:skip — restore the TPC-H customer mount shadowed by the tpcds
# fixture (Engine.register's per-dir cache will not re-mount it)
create or replace temporary view customer as
select * from {parq('customer', 'spark')}
---- RESULTS""")
    with open(OUT, "w") as f:
        f.write("\n".join(parts) + "\n====\n")
    print(f"wrote {OUT}: {len(BLOCKS)} query blocks")


# ---------------------------------------------------------------------------
# analytic-fns-tpcds.test (functional-query/queries/QueryTest): window
# functions over the TPC-DS item table. All frames are the default RANGE
# UNBOUNDED PRECEDING..CURRENT ROW, so peer rows (order-by ties) aggregate
# together identically in both engines; sums are exact decimals.
# ---------------------------------------------------------------------------

AF = "analytic-fns-tpcds.test"

AF1 = """select i_item_sk, i_current_price,
   SUM (i_current_price)
  OVER (ORDER BY i_item_sk) running_total
from item
order by
  i_brand,
  i_item_sk
limit 10"""
block(AF, "Analytic function with no partition.", AF1, duck(AF1))

AF2 = """select i_item_sk, i_brand, i_current_price,
   SUM (i_current_price)
  OVER (partition by i_brand ORDER BY i_item_sk) running_total
from item
order by
  i_brand,
  i_item_sk
limit 10"""
block(AF, "Same as above, but with partition.", AF2, duck(AF2))

AF3 = """select i_item_sk, i_brand, i_current_price,
   SUM (i_current_price)
  OVER (partition by i_brand ORDER BY i_current_price) running_total
from item
order by
  i_brand,
  i_item_sk
limit 10"""
block(AF, "Same as above, but the order by column in the analytic "
      "function has repeating values.", AF3, duck(AF3))

AF4 = """select i_item_sk, i_brand, running_total,
   SUM (running_total)
  OVER (partition by i_manufact_id ORDER BY running_total) running_total2
from (
  select i_item_sk, i_brand, i_current_price, i_manufact_id,
     SUM (i_current_price)
    OVER (partition by i_brand ORDER BY i_current_price) running_total
  from item
  order by
    i_brand,
    i_item_sk
) sub
order by
  i_item_sk,
  i_brand desc
limit 10"""
block(AF, "Nested analytic functions.", AF4, duck(AF4))

AF5 = """select i_item_sk, i_brand, i_current_price, i_manufact_id,
   SUM (i_current_price)
  OVER (partition by i_brand ORDER BY i_current_price) running_total,
   MAX (i_current_price)
  OVER (partition by i_manufact_id ORDER BY i_item_sk) running_max
from item
order by
  i_brand,
  i_item_sk
limit 10"""
block(AF, "2 analytic functions on different partition and order by "
      "columns.", AF5, duck(AF5))

AF6 = """select i_item_sk, i_brand, i_current_price,
   SUM (i_current_price)
  OVER (partition by i_brand ORDER BY i_item_sk) running_total
from (
  select * from item
  union all
  select * from item
) sub
order by
  i_brand,
  i_item_sk
limit 10"""
block(AF, "Union all in the FROM subquery.", AF6, duck(AF6))

AF7 = """select max(running_total)
from (
  select i_item_sk, i_current_price,
     SUM (i_current_price)
    OVER (partition by i_brand ORDER BY i_current_price) running_total
  from item
  order by
    i_brand,
    i_item_sk
) sub"""
block(AF, "Aggregate the column generated by the analytic function.",
      AF7, duck(AF7))

emit()

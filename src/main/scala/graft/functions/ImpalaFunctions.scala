package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, HyperLogLogPlusPlus, ListAgg}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Impala-dialect scalar/aggregate functions missing or renamed in Spark.
  *
  * The reference registers ~420 builtin signatures
  * (`fe/.../catalog/BuiltinsDb.java:45-58` via
  * `common/function-registry/impala_functions.py`); most map 1:1 onto
  * `org.apache.spark.sql.functions`. This registry covers the names Spark
  * lacks, built as Catalyst expression trees (codegen-friendly, null-safe)
  * rather than Scala UDFs — SURVEY.md section 2.5.
  *
  * Everything is registered as a temp function, so both the SQL front door
  * (`Engine.sql`) and the Column API (via `call_function`) see them.
  */
object ImpalaFunctions {

  /** Column-API front door for a registered dialect function. */
  def fn(name: String, cols: Column*): Column = call_function(name, cols: _*)

  /** All dialect (name -> expression builder) pairs — consumed by
    * `register` (temp functions on an existing session) and by
    * `graft.GraftExtensions` (SparkSessionExtensions injection via
    * `spark.sql.extensions=graft.GraftExtensions`).
    */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val out = Seq.newBuilder[(String, Seq[Expression] => Expression)]
    def temp(name: String)(builder: Seq[Expression] => Expression): Unit =
      out += (name -> builder)
    collect(temp)
    out.result()
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  private def collect(
      temp: String => (Seq[Expression] => Expression) => Unit): Unit = {

    // ---- string (string-functions.cc) -----------------------------------
    // strleft/strright: leftmost/rightmost n chars (string-functions.h:32).
    temp("strleft") { case Seq(s, n) => Substring(s, Literal(1), n) }
    temp("strright") { case Seq(s, n) =>
      // right(s, n): Spark's Right errors on negative n like Impala returns
      // empty; clamp via greatest(n, 0).
      new Right(s, Greatest(Seq(n, Literal(0))))
    }

    // ---- conditional (conditional-functions.h:31) -----------------------
    // TypeCoercion aligns the literal with e's numeric type.
    temp("zeroifnull") { case Seq(e) => Coalesce(Seq(e, Literal(0))) }
    temp("nullifzero") { case Seq(e) => new NullIf(e, Literal(0)) }
    temp("isfalse") { case Seq(e) => EqualNullSafe(e, Literal(false)) }
    temp("istrue") { case Seq(e) => EqualNullSafe(e, Literal(true)) }
    temp("isnotfalse") { case Seq(e) => Not(EqualNullSafe(e, Literal(false))) }
    temp("isnottrue") { case Seq(e) => Not(EqualNullSafe(e, Literal(true))) }
    temp("nonnullvalue") { case Seq(e) => IsNotNull(e) }
    temp("nullvalue") { case Seq(e) => IsNull(e) }
    // isnull(a, b): 2-arg alias of ifnull/nvl
    // (impala_functions.py:510-519). The 1-arg arity keeps Spark's
    // own isnull(e) meaning, so existing Spark SQL is unaffected.
    temp("isnull") {
      case Seq(e) => IsNull(e)
      case Seq(a, b) => Coalesce(Seq(a, b))
    }

    // ---- math (math-functions.h:32) -------------------------------------
    // quotient(a, b): integer division after casting both to BIGINT.
    temp("quotient") { case Seq(a, b) =>
      IntegralDivide(Cast(a, LongType), Cast(b, LongType), evalMode = EvalMode.LEGACY)
    }
    temp("is_inf") { case Seq(e) =>
      val d = Cast(e, DoubleType)
      EqualTo(Abs(d), Literal(Double.PositiveInfinity))
    }
    temp("is_nan") { case Seq(e) => IsNaN(Cast(e, DoubleType)) }
    // round(double) returns BIGINT in the dialect (math-functions.h Round
    // vs RoundUpTo); Spark's round keeps DOUBLE. The type dispatch lives
    // inside DialectRound (RuntimeReplaceable), so it resolves AFTER
    // analysis — the same SQL gets the same semantics regardless of
    // whether the argument was resolved when the builder ran.
    temp("round") {
      case Seq(e) => DialectRound(e)
      case Seq(e, d) => Round(e, d)
    }

    // ---- bit/byte (bit-byte-functions.h) --------------------------------
    // Rotations operate within the input's own width and keep its type
    // (bit-byte-functions.cc) — post-analysis dispatch via DialectRotate.
    temp("rotateleft") { case Seq(x, n) => DialectRotate(x, n, isLeft = true) }
    temp("rotateright") { case Seq(x, n) => DialectRotate(x, n, isLeft = false) }
    // bitand/bitor/bitxor/bitnot: named forms of the operators
    // (bit-byte-functions.h BitAnd/BitOr/BitXor/BitNot)
    temp("bitand") { case Seq(a, b) => BitwiseAnd(a, b) }
    temp("bitor") { case Seq(a, b) => BitwiseOr(a, b) }
    temp("bitxor") { case Seq(a, b) => BitwiseXor(a, b) }
    temp("bitnot") { case Seq(a) => BitwiseNot(a) }
    temp("getbit") { case Seq(x, pos) =>
      Cast(BitwiseAnd(ShiftRightUnsigned(Cast(x, LongType), Cast(pos, IntegerType)),
        Literal(1L)), ByteType)
    }
    temp("setbit") {
      case Seq(x, pos) =>
        BitwiseOr(Cast(x, LongType), ShiftLeft(Literal(1L), Cast(pos, IntegerType)))
      case Seq(x, pos, v) =>
        If(EqualTo(Cast(v, IntegerType), Literal(0)),
          BitwiseAnd(Cast(x, LongType),
            BitwiseNot(ShiftLeft(Literal(1L), Cast(pos, IntegerType)))),
          BitwiseOr(Cast(x, LongType), ShiftLeft(Literal(1L), Cast(pos, IntegerType))))
    }
    // countset counts within the input's width (8 for tinyint, ... 64
    // for bigint), matching the reference
    temp("countset") {
      case Seq(x) => DialectCountSet(x, Literal(1))
      case Seq(x, v) => DialectCountSet(x, v)
    }

    // ---- timestamp (timestamp-functions.h:40) ---------------------------
    temp("int_months_between") { case Seq(a, b) =>
      Cast(MonthsBetween(a, b, Literal(false)), IntegerType)
    }
    temp("dayname") { case Seq(e) => DateFormatClass(e, Literal("EEEE")) }
    temp("monthname") { case Seq(e) => DateFormatClass(e, Literal("MMMM")) }
    temp("timeofday") { case Seq() =>
      DateFormatClass(CurrentTimestamp(), Literal("EEE MMM dd HH:mm:ss yyyy z"))
    }

    // Interval arithmetic family (timestamp-functions.h:40: years_add ...
    // milliseconds_sub). Impala's nanoseconds_add/_sub have no Spark unit;
    // microsecond is the finest (documented gap).
    val units = Seq(
      "years" -> "YEAR", "months" -> "MONTH", "weeks" -> "WEEK",
      "days" -> "DAY", "hours" -> "HOUR", "minutes" -> "MINUTE",
      "seconds" -> "SECOND", "milliseconds" -> "MILLISECOND",
      "microseconds" -> "MICROSECOND")
    for ((name, unit) <- units) {
      temp(s"${name}_add") { case Seq(ts, n) =>
        TimestampAdd(unit, Cast(n, LongType), ts)
      }
      temp(s"${name}_sub") { case Seq(ts, n) =>
        TimestampAdd(unit, UnaryMinus(Cast(n, LongType)), ts)
      }
    }
    // add_months: Impala's alias of months_add keeps the time-of-day
    // (timestamp in, timestamp out) — Spark's builtin add_months returns
    // DATE, so the dialect form shadows it for the session.
    temp("add_months") { case Seq(ts, n) =>
      TimestampAdd("MONTH", Cast(n, LongType), ts)
    }
    // nanoseconds_add/_sub (timestamp-functions.h:40): the reference's
    // TimestampValue has nanosecond resolution; Spark's finest unit is
    // the microsecond. Rounding rule: the nanosecond delta is TRUNCATED
    // TOWARD ZERO to whole microseconds (999 ns adds nothing, 1500 ns
    // adds 1 us) — sub-microsecond residue is unrepresentable.
    temp("nanoseconds_add") { case Seq(ts, n) =>
      TimestampAdd("MICROSECOND",
        IntegralDivide(Cast(n, LongType), Literal(1000L),
          evalMode = EvalMode.LEGACY), ts)
    }
    temp("nanoseconds_sub") { case Seq(ts, n) =>
      TimestampAdd("MICROSECOND",
        UnaryMinus(IntegralDivide(Cast(n, LongType), Literal(1000L),
          evalMode = EvalMode.LEGACY)), ts)
    }
    // date_add/date_sub with integer days exist in Spark with DATE
    // semantics; Impala's operate on TIMESTAMP and also accept INTERVAL
    // expressions — shadow them (post-analysis type dispatch) and
    // provide adddate/subdate.
    temp("date_add") { case Seq(ts, n) => DialectDateAdd(ts, n, 1) }
    temp("date_sub") { case Seq(ts, n) => DialectDateAdd(ts, n, -1) }
    temp("adddate") { case Seq(ts, n) =>
      TimestampAdd("DAY", Cast(n, LongType), ts)
    }
    temp("subdate") { case Seq(ts, n) =>
      TimestampAdd("DAY", UnaryMinus(Cast(n, LongType)), ts)
    }

    // regexp_like(s, pattern[, options]) — the 3-arg form takes the same
    // i/c/n/m option letters as regexp_match_count
    // (string-functions.cc RegexpLike); 2-arg keeps Spark semantics.
    temp("regexp_like") {
      case Seq(s0, p) => RLike(s0, p)
      case Seq(s0, p, params) =>
        def flag(letter: String, java: String): Expression =
          If(GreaterThan(StringInstr(params, Literal(letter)), Literal(0)),
            Literal(java), Literal(""))
        RLike(s0, Concat(Seq(
          flag("i", "(?i)"), flag("n", "(?s)"), flag("m", "(?m)"), p)))
    }
    // to_timestamp: Impala's 1-arg numeric form converts epoch SECONDS
    // (timestamp-functions.h ToTimestamp); the 2-arg (string, fmt) form
    // keeps Spark's parse semantics. Timezone-less like the dialect's
    // TIMESTAMP, so the numeric form lands on TIMESTAMP_NTZ via UTC.
    temp("to_timestamp") {
      case Seq(e) =>
        Cast(SecondsToTimestamp(Cast(e, LongType)), TimestampNTZType)
      case Seq(s0, fmt) => new ParseToTimestamp(s0, fmt)
    }
    // from_timestamp(ts, fmt): render a timestamp with a format string
    // (timestamp-functions.h FromTimestamp) -> date_format.
    temp("from_timestamp") { case Seq(ts, fmt) => DateFormatClass(ts, fmt) }
    // to_date(ts) returns STRING in the reference (timestamp-functions.h
    // ToDate -> StringVal "yyyy-MM-dd"), not a DATE value.
    temp("to_date") { case Seq(ts) =>
      Cast(Cast(ts, DateType), StringType)
    }
    // log(base, x): the reference computes ln(x)/ln(base) with raw C math
    // (math-functions.cc), so log(1,2)=Infinity, log(0,0)=NaN instead of
    // Spark's guarded NULLs — see CMathLog.
    temp("log") {
      case Seq(b, v) => CMathLog(Cast(b, DoubleType), Cast(v, DoubleType))
      case Seq(v) => Log(Cast(v, DoubleType))
    }
    // decode(e, s1, r1, ..., [def]): Impala's DECODE matches NULL search
    // values (conditional-functions.h; CaseExpr with null-safe equality),
    // keeping the results' common type. Spark's own decode renders
    // results as strings; the 2-arg charset form stays native.
    temp("decode") {
      case Seq(bin, charset) => StringDecode(bin, charset)
      case args if args.size >= 3 =>
        val e = args.head
        val rest = args.tail
        val pairs = rest.grouped(2).filter(_.size == 2).toSeq
          .map { case Seq(s, r) => (EqualNullSafe(e, s), r) }
        val default = if (rest.size % 2 == 1) Some(rest.last) else None
        CaseWhen(pairs, default)
    }
    // trunc(ts, unit) with Impala's Oracle-style unit codes
    // (be/src/exprs/udf-builtins.cc:104-145 StrToTruncUnit). Shadows
    // Spark's trunc(date, fmt) for the session — Impala has no DATE type,
    // so the dialect form (TIMESTAMP in, TIMESTAMP out) is the one users
    // of the reference expect. Unit must be a literal (the reference's
    // TruncPrepare also only resolves constant units up front).
    temp("trunc") {
      case Seq(ts, lit) if isStringLit(lit) =>
        ImpalaDateTime.truncExpr(ts, litString(lit, "trunc unit"))
      // non-constant unit: per-row CASE dispatch; unknown units raise the
      // reference's "Invalid Truncate Unit: <u>" at runtime (IMPALA-1746)
      case Seq(ts, unit) => ImpalaDateTime.dynamicTrunc(ts, unit)
    }
    // extract(ts, 'field') / extract(field FROM ts) / date_part('field', ts)
    // — Impala returns INT for every field (udf-builtins.cc:336-424),
    // including MILLISECOND (millis within the second) and EPOCH (seconds
    // since 1970-01-01). Both argument orders are accepted: Impala's
    // extract takes (ts, unit), while the SQL-standard EXTRACT(f FROM ts)
    // and date_part take the field first.
    def extractBuilder(args: Seq[Expression]): Expression = args match {
      case Seq(a, b) if isStringLit(b) =>
        ImpalaDateTime.extractExpr(a, litString(b, "extract field"))
      case Seq(a, b) if isStringLit(a) =>
        ImpalaDateTime.extractExpr(b, litString(a, "extract field"))
      // non-constant field (the reference resolves it per row when
      // ExtractPrepare can't bind a constant): runtime CASE dispatch,
      // Impala argument order (ts, unit)
      case Seq(ts, unit) => ImpalaDateTime.dynamicExtract(ts, unit)
    }
    temp("extract")(extractBuilder)
    temp("date_part")(extractBuilder)

    // pid()/user()/effective_user() (utility-functions.h): session
    // identity utilities. version() exists in Spark natively.
    temp("pid") { case Seq() =>
      Literal(ProcessHandle.current().pid().toInt)
    }
    temp("user") { case Seq() => CurrentUser() }
    temp("effective_user") { case Seq() => CurrentUser() }
    // sleep(ms) -> true after ms milliseconds (utility-functions.cc
    // Sleep; used by the reference's timeout tests)
    temp("sleep") { case Seq(e) => DialectSleep(Cast(e, LongType)) }
    // from_unixtime with the reference's TimestampValue range guard:
    // epochs outside years [1400, 9999] return NULL
    // (timestamp-functions.cc IMPALA-2184 — Spark's native form wraps
    // the overflow into nonsense years instead)
    temp("from_unixtime") { args =>
      val ts = Cast(args.head, LongType)
      val guarded = org.apache.spark.sql.catalyst.expressions.If(
        And(GreaterThanOrEqual(ts, Literal(-17987443200L)),
          LessThanOrEqual(ts, Literal(253402300799L))),
        ts, Literal(null, LongType))
      args match {
        case Seq(_) => FromUnixTime(guarded, Literal("yyyy-MM-dd HH:mm:ss"))
        case Seq(_, f) => FromUnixTime(guarded, f)
      }
    }

    // ---- double-math aliases (impala_functions.py:265-298: every
    // math builtin carries a d*/f* alias from the pre-decimal era) ----
    // the d-prefixed forms are the DOUBLE overloads specifically
    // (impala_functions.py:265-267) — BIGINT results via the double path
    temp("dceil") { case Seq(e) => Ceil(Cast(e, DoubleType)) }
    temp("dfloor") { case Seq(e) => Floor(Cast(e, DoubleType)) }
    temp("dexp") { case Seq(e) => Exp(Cast(e, DoubleType)) }
    temp("dlog1") { case Seq(e) => Log(Cast(e, DoubleType)) }
    temp("dlog10") { case Seq(e) => Log10(Cast(e, DoubleType)) }
    temp("dsqrt") { case Seq(e) => Sqrt(Cast(e, DoubleType)) }
    val powBuilder: Seq[Expression] => Expression = {
      case Seq(a, b) => Pow(Cast(a, DoubleType), Cast(b, DoubleType))
    }
    temp("dpow")(powBuilder)
    temp("fpow")(powBuilder)
    temp("fmod") { case Seq(a, b) =>
      Remainder(Cast(a, DoubleType), Cast(b, DoubleType), EvalMode.LEGACY)
    }
    temp("dround") {
      case Seq(e) => DialectRound(Cast(e, DoubleType))
      case Seq(e, d) => Round(Cast(e, DoubleType), d)
    }
    // truncate/dtrunc (numeric): toward-zero truncation, BIGINT for
    // doubles, DECIMAL(p-s+d, d) for decimals (math-functions.cc
    // Truncate, decimal-functions.cc TruncateTo)
    val truncateBuilder: Seq[Expression] => Expression = {
      case Seq(e) => DialectTruncate(e, Literal(0), explicitScale = false)
      case Seq(e, d) => DialectTruncate(e, d)
    }
    temp("truncate")(truncateBuilder)
    temp("dtrunc")(truncateBuilder)

    // ---- decimal type metadata (decimal-functions.cc:27-33) ----
    temp("precision") { case Seq(e) => DialectTypeMeta(e, isPrecision = true) }
    temp("scale") { case Seq(e) => DialectTypeMeta(e, isPrecision = false) }

    // ---- type extrema constants (udf-builtins.h MaxInt...MinBigInt) ----
    temp("max_tinyint") { case Seq() => Literal(Byte.MaxValue) }
    temp("min_tinyint") { case Seq() => Literal(Byte.MinValue) }
    temp("max_smallint") { case Seq() => Literal(Short.MaxValue) }
    temp("min_smallint") { case Seq() => Literal(Short.MinValue) }
    temp("max_int") { case Seq() => Literal(Int.MaxValue) }
    temp("min_int") { case Seq() => Literal(Int.MinValue) }
    temp("max_bigint") { case Seq() => Literal(Long.MaxValue) }
    temp("min_bigint") { case Seq() => Literal(Long.MinValue) }

    // ---- operator function-forms (impala_functions.py:668-690) ----
    temp("distinctfrom") { case Seq(a, b) => Not(EqualNullSafe(a, b)) }
    temp("notdistinct") { case Seq(a, b) => EqualNullSafe(a, b) }

    // timestamp_cmp(t1, t2) -> -1/0/1, NULL if either side is NULL
    // (timestamp-functions.h TimestampCmp; expr-test.cc:3577-3584)
    temp("timestamp_cmp") { case Seq(a, b) =>
      val ta = Cast(a, TimestampNTZType)
      val tb = Cast(b, TimestampNTZType)
      CaseWhen(Seq(
        (LessThan(ta, tb), Literal(-1)),
        (GreaterThan(ta, tb), Literal(1)),
        (EqualTo(ta, tb), Literal(0))))
    }

    // ---- UdfBuiltins test aliases (udf-builtins.h Pi/Abs/Lower) ----
    temp("udf_pi") { case Seq() => Pi() }
    temp("udf_abs") { case Seq(e) => Abs(Cast(e, DoubleType)) }
    temp("udf_lower") { case Seq(e) => Lower(e) }

    // ---- MADlib vector interop (udf-builtins.cc:466-560) ----
    temp("madlib_vector") { es =>
      MadlibVectorPack(es.map(e => Cast(e, DoubleType)))
    }
    temp("madlib_vector_get") { case Seq(i, v) =>
      MadlibVectorGet(Cast(i, LongType), v)
    }
    temp("madlib_encode_vector") { case Seq(v) => MadlibEncodeVector(v) }
    temp("madlib_decode_vector") { case Seq(v) => MadlibDecodeVector(v) }
    temp("madlib_print_vector") { case Seq(v) => MadlibPrintVector(v) }
    // ---- utility (utility-functions.h:29) -------------------------------
    // fnv_hash hashes native fixed-width bytes for numeric/boolean input
    // (matching the reference's raw-slot-byte hashing) and raw bytes for
    // string/binary; remaining types (decimal/timestamp) fall back to a
    // string render — a documented divergence (the reference hashes their
    // 16-byte slots, which have no Spark-side equivalent layout). The
    // fallback dispatch lives inside FnvHashDialect (RuntimeReplaceable)
    // so it fires after analysis, independent of builder-time resolution.
    temp("fnv_hash") { case Seq(e) => FnvHashDialect(e) }
    // ---- engine extensions ----------------------------------------------
    // simhash(array<bigint>) — dedup signature (see SimHash64).
    temp("graft_simhash") { case Seq(e) => SimHash64(e) }
    temp("simhash") { case Seq(e) => SimHash64(e) }
    // Codegen'd signature kernels for dedup (see TextSignatures).
    temp("token_hashes") { case Seq(e) => TokenHashes(e) }
    temp("shingle_hashes") {
      case Seq(e, Literal(n: Int, IntegerType)) => ShingleHashes(e, n)
    }
    temp("minhash64") { case Seq(e) => MinHash64(e) }
    // native sequential-fold dot product (see DotVec) — embedding kernel
    temp("dot_vec") { case Seq(a, b) => DotVec(a, b) }
    // packed hyperplane-sign signature (see SignBits) — LSH kernel
    temp("sign_bits") { case Seq(v, p) => SignBits(v, p) }
    // substring-dedup kernels (see SubstrFingerprints)
    temp("winnow_grams") {
      case Seq(e, Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
        WinnowGrams(e, k, w)
    }
    temp("extend_spans") { case Seq(a, b, an) => ExtendSpans(a, b, an) }
    // per-doc Gram/moment rows of the linear probe (see GramKernel)
    temp("gram_rows") { case Seq(f, y) => GramRows(f, y) }
    temp("cut_spans") { case Seq(txt, iv) => CutSpans(txt, iv) }
    // BPE trainer/encoder kernels (see BpeKernels)
    temp("bpe_pairs") { case Seq(e) => BpePairs(e) }
    temp("bpe_apply") { case Seq(sy, l, r) => BpeApply(sy, l, r) }
    temp("bpe_has_pair") { case Seq(sy, l, r) => BpeHasPair(sy, l, r) }
    temp("bpe_encode") { case Seq(wd, m) => BpeEncode(wd, m) }
    // MMR diversified re-rank kernel (see MmrKernel)
    temp("mmr_select") {
      case Seq(c, Literal(k: Int, IntegerType)) => MmrSelect(c, k)
    }
    // product-quantization kernels (see PqKernels) — IVF-PQ hot path
    temp("pq_encode") { case Seq(v, b) => PqEncode(v, b) }
    temp("pq_adc") { case Seq(q, c, b) => PqAdc(q, c, b) }
    temp("cell_dists") { case Seq(v, c) => CellDists(v, c) }
    temp("cell_assign_coarse") { case Seq(v, c, m) => CellAssignCoarse(v, c, m) }
    // Hilbert layout key (see HilbertKernel) — the ZOrder sibling
    temp("hilbert_key") {
      case Seq(x, y, Literal(b: Int, IntegerType)) => HilbertKey(x, y, b)
    }

    // ---- aggregates (aggregate-functions.h) -----------------------------
    // avg over TIMESTAMP (aggregate-functions.cc TimestampAvgUpdate);
    // non-timestamp children fall through to Spark's Average unchanged.
    temp("avg") { case Seq(e) => DialectAvg(e) }
    // ndv: Impala's HyperLogLog with 1024 buckets (aggregate-functions.h:170-184)
    // => relative sd ~= 1.04/sqrt(1024) = 0.0325 on Spark's HLL++.
    temp("ndv") { case Seq(e) =>
      HyperLogLogPlusPlus(e, relativeSD = 0.0325).toAggregateExpression()
    }
    // group_concat(expr[, sep]) — order is unspecified in the reference too
    // (BuiltinsDb.java:781-806). Returning the bare AggregateFunction lets
    // the analyzer apply DISTINCT / FILTER wrapping.
    temp("group_concat") {
      // with the accumulation cap lowered (graft.group_concat.max_bytes),
      // every form routes through the capped agg — the reference enforces
      // its 1 GB StringVal limit during accumulation on ALL group_concats
      // (QueryTest/large_strings.test), and only the imperative agg can
      // fail fast mid-accumulation
      case args if GroupConcatSep.confMaxBytes < GroupConcatSep.MaxBytesDefault =>
        val cap = GroupConcatSep.confMaxBytes
        args match {
          case Seq(e) =>
            GroupConcatSep(Cast(e, StringType), Literal(", "), cap)
          case Seq(e, sep) =>
            GroupConcatSep(Cast(e, StringType),
              Coalesce(Seq(Cast(sep, StringType), Literal(", "))), cap)
        }
      case Seq(e) => ListAgg(e, Literal(", "))
      // a NULL separator falls back to the default ", "
      // (aggregate-functions.cc StringConcatUpdate's default separator)
      case Seq(e, sep: Literal) =>
        ListAgg(e, Coalesce(Seq(sep, Literal(", "))))
      // per-row separator (StringConcatUpdate appends sep_i + value_i) —
      // ListAgg needs a foldable delimiter, so this takes its own agg
      case Seq(e, sep) =>
        GroupConcatSep(Cast(e, StringType), Cast(sep, StringType))
    }
    // variance_pop / variance_samp: reference aliases of var_pop/var_samp
    // (impala_functions.py aggregate section); Spark has the short names.
    temp("variance_pop") { case Seq(e) =>
      aggregate.VariancePop(Cast(e, DoubleType)).toAggregateExpression()
    }
    // Sample variance/stddev of a SINGLE value is 0 in the reference
    // (KnuthVar with count==1, aggregate-functions.cc), NULL in Spark —
    // wrap with a count guard so n=1 groups match.
    def sampleAgg(name: String,
        mk: Expression => aggregate.AggregateFunction)(e: Expression): Expression =
      If(EqualTo(aggregate.Count(Seq(e)).toAggregateExpression(), Literal(1L)),
        Literal(0.0),
        mk(Cast(e, DoubleType)).toAggregateExpression())
    for (name <- Seq("variance", "variance_samp", "var_samp"))
      temp(name) { case Seq(e) => sampleAgg(name, aggregate.VarianceSamp(_))(e) }
    for (name <- Seq("stddev", "stddev_samp"))
      temp(name) { case Seq(e) => sampleAgg(name, aggregate.StddevSamp(_))(e) }
    // appx_median: reservoir-sampled median, reference-exact rank
    // (aggregate-functions.cc:1119 AppxMedianFinalize takes
    // samples[num_samples/2]; exact below the 20k reservoir cap —
    // Spark's ApproximatePercentile uses a different rank convention
    // and returns the element one rank lower).
    // post-analysis dispatch: string inputs use the string reservoir,
    // numerics the double one with a finalize cast back — see
    // DialectAppxMedian in DialectDispatch.scala
    temp("appx_median") { case Seq(e) => DialectAppxMedian(e) }
    // distinctpc / distinctpcsa: the reference's Flajolet-Martin PC
    // estimators (BuiltinsDb.java:625-645, aggregate-functions.cc:695-884)
    // as faithful 64x32 bitmap sketches — see PcSketch.
    temp("distinctpc") { case Seq(e) => PcAgg(e).toAggregateExpression() }
    temp("distinctpcsa") { case Seq(e) => PcsaAgg(e).toAggregateExpression() }
    // regexp_match_count(s, pattern[, start_pos[, params]]) — the 4-arg
    // form (string-functions.cc RegexpMatchCount) takes a 1-based start
    // position and option letters: i=case-insensitive, c=case-sensitive
    // (default), n=newline-matches-dot, m=multi-line. Implemented as a
    // substring from start_pos plus an inline (?i)(?s)(?m) flag prefix.
    // start_pos < 1 and unknown option letters raise the reference's
    // runtime errors verbatim (string-functions.cc RegexpMatchCount
    // "Illegal starting position" / "Illegal match parameter")
    def checkedPos(pos: Expression): Expression =
      If(LessThan(Cast(pos, IntegerType), Literal(1)),
        Cast(RaiseError(Concat(Seq(
          Literal("Illegal starting position "), Cast(pos, StringType)))),
          IntegerType),
        Cast(pos, IntegerType))
    temp("regexp_match_count") {
      case Seq(s0, p) => RegExpCount(s0, p)
      case Seq(s0, p, pos) =>
        RegExpCount(Substring(s0, checkedPos(pos), Literal(Int.MaxValue)), p)
      case Seq(s0, p, pos, params) =>
        // per-row flag letters -> inline (?i)(?s)(?m) prefix, built as an
        // expression so non-constant params work
        def flag(letter: String, java: String): Expression =
          If(GreaterThan(StringInstr(params, Literal(letter)), Literal(0)),
            Literal(java), Literal(""))
        val checkedParams =
          If(RLike(params, Literal("^[icnm]*$")), Literal(""),
            Cast(RaiseError(Concat(Seq(Literal("Illegal match parameter "),
              RegExpExtract(params, Literal("[^icnm]"), Literal(0))))),
              StringType))
        val flagged = Concat(Seq(checkedParams,
          flag("i", "(?i)"), flag("n", "(?s)"), flag("m", "(?m)"), p))
        RegExpCount(Substring(s0, checkedPos(pos), Literal(Int.MaxValue)), flagged)
    }
    // ndv_hll: the Impala-formula HLL-1024 sketch itself (FNV value hash,
    // harmonic estimator) as a TypedImperativeAggregate — see NdvHll.
    temp("ndv_hll") { case Seq(e) => NdvHll(e).toAggregateExpression() }
    // ndv_no_finalize (BuiltinsDb.java): same HLL update/merge, but the
    // raw intermediate sketch comes back instead of the estimate — the
    // per-partition form incremental stats stores and re-merges
    temp("ndv_no_finalize") { case Seq(e) =>
      NdvHll(e, finalizeEstimate = false).toAggregateExpression()
    }
    // histogram / appx_median_rs: the reference's 20k-reservoir aggregates
    // (aggregate-functions.h:126-167) — see ReservoirAgg.
    // kmv_sketch(hash_long[, k]): bottom-k distinct-hash sketch for
    // set-operation estimates between corpus slices — see KmvSketch.
    temp("kmv_sketch") {
      case Seq(e) => KmvAgg(e).toAggregateExpression()
      case Seq(e, Literal(k: Int, IntegerType)) =>
        KmvAgg(e, k).toAggregateExpression()
    }
    temp("histogram") { case Seq(e) => DialectHistogram(e) }
    temp("appx_median_rs") { case Seq(e) =>
      AppxMedianAgg(Cast(e, DoubleType)).toAggregateExpression()
    }
    // sample: the reference's reservoir string aggregate
    // (aggregate-functions.cc ReservoirSampleUpdate/Finalize) — comma-
    // joined kept samples; type-generic like the reference (strings,
    // timestamps, dates sampled verbatim — no lossy numeric cast);
    // nondeterministic output by design.
    temp("sample") { case Seq(e) => SampleAgg(e).toAggregateExpression() }
    // bloom_build / bloom_find: the reference's runtime-filter split
    // block Bloom filter (be/src/util/bloom-filter.h) as a user-callable
    // build-aggregate + probe pair — see BlockBloom.
    temp("bloom_build") { case Seq(e, Literal(logSpace: Int, IntegerType)) =>
      BloomBuildAgg(e, logSpace).toAggregateExpression()
    }
    temp("bloom_find") { case Seq(bloom, h) => BloomFind(bloom, h) }
  }

  private def isStringLit(e: Expression): Boolean = e match {
    case Literal(_, StringType) => true
    case _ => false
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }
}

/** Impala TRUNC/EXTRACT timestamp semantics as Catalyst expression trees
  * (`be/src/exprs/udf-builtins.cc:104-424`).
  */
object ImpalaDateTime {

  /** Oracle-style trunc unit codes -> timestamp truncation. Results are
    * TIMESTAMP_NTZ: Impala's TIMESTAMP is timezone-less
    * (`be/src/runtime/timestamp-value.h:40-64`), and NTZ is its exact
    * Spark twin.
    */
  def truncExpr(ts: Expression, unit: String): Expression = {
    def dt(fmt: String) =
      Cast(TruncTimestamp(Literal(fmt), ts), TimestampNTZType)
    // Same day of the week as the anchor (first day of year for WW, first
    // day of month for W): go back (dow(ts) - dow(anchor)) mod 7 days
    // (udf-builtins.cc GoBackToWeekday), time zeroed.
    def backToWeekday(anchorFmt: String): Expression = {
      val d = Cast(ts, DateType)
      val anchor = Cast(TruncTimestamp(Literal(anchorFmt), ts), DateType)
      val back = Pmod(Subtract(DayOfWeek(d), DayOfWeek(anchor)), Literal(7))
      Cast(DateSub(d, back), TimestampNTZType)
    }
    unit.toLowerCase match {
      case "syyyy" | "yyyy" | "year" | "syear" | "yyy" | "yy" | "y" => dt("year")
      case "q" => dt("quarter")
      case "month" | "mon" | "mm" | "rm" => dt("month")
      case "ww" => backToWeekday("year")
      case "w" => backToWeekday("month")
      case "ddd" | "dd" | "j" => dt("day")
      // Spark's week trunc = previous Monday = the reference's
      // TruncDayOfWeek (GoBackToWeekday(date, 1))
      case "day" | "dy" | "d" => dt("week")
      case "hh" | "hh12" | "hh24" => dt("hour")
      case "mi" => dt("minute")
      case other =>
        throw new IllegalArgumentException(s"Invalid Truncate Unit: $other")
    }
  }

  /** Extract fields — all INT like the reference's IntVal returns. */
  def extractExpr(ts: Expression, field: String): Expression = {
    val e = field.toLowerCase match {
      case "year" => Year(Cast(ts, DateType))
      case "month" => Month(Cast(ts, DateType))
      case "day" => DayOfMonth(Cast(ts, DateType))
      case "hour" => Hour(ts)
      case "minute" => Minute(ts)
      case "second" => Second(ts)
      // millis within the current second (total_milliseconds - seconds*1000)
      case "millisecond" => DateFormatClass(ts, Literal("SSS"))
      // whole seconds since the epoch (IntVal in the reference too);
      // NTZ inputs route via TIMESTAMP (session tz is UTC) since
      // NTZ->numeric casts are disallowed
      case "epoch" => Cast(Cast(ts, TimestampType), LongType)
      case other =>
        throw new IllegalArgumentException(s"invalid extract field: $other")
    }
    Cast(e, IntegerType)
  }

  val ExtractFields: Seq[String] = Seq("year", "month", "day", "hour",
    "minute", "second", "millisecond", "epoch")

  /** extract with a per-row field name: CASE over the 8 fields (invalid
    * fields yield NULL rather than the reference's runtime error).
    */
  def dynamicExtract(ts: Expression, field: Expression): Expression =
    CaseWhen(
      ExtractFields.map(f =>
        (EqualTo(Lower(field), Literal(f)), extractExpr(ts, f))),
      None)

  val TruncUnits: Seq[String] = Seq(
    "syyyy", "yyyy", "year", "syear", "yyy", "yy", "y", "q",
    "month", "mon", "mm", "rm", "ww", "w", "ddd", "dd", "j",
    "day", "dy", "d", "hh", "hh12", "hh24", "mi")

  /** trunc with a per-row unit: CASE over the unit codes; an unknown unit
    * raises the reference's runtime error text ("Invalid Truncate Unit:
    * <unit>", udf-builtins.cc TruncImpl) via raise_error.
    */
  def dynamicTrunc(ts: Expression, unit: Expression): Expression =
    CaseWhen(
      TruncUnits.map(u =>
        (EqualTo(Lower(unit), Literal(u)), truncExpr(ts, u))),
      Some(Cast(RaiseError(
        Concat(Seq(Literal("Invalid Truncate Unit: "), Cast(unit, StringType)))),
        TimestampNTZType)))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Max}
import org.apache.spark.sql.types._

/** Flink-named scalar functions Spark lacks, so Flink SQL text runs
  * unmodified ([U] flink-table-planner FlinkSqlOperatorTable /
  * BuiltInFunctionDefinitions; SURVEY.md §2.8). Each is COMPOSED from
  * Spark's own codegen'd Catalyst expressions — no UDFs, no interpreted
  * eval — so they inline into whole-stage codegen like any built-in:
  *
  *  - SPLIT_INDEX(str, sep, idx)  — 0-based element of a literal-string
  *    split, NULL when idx is negative or out of bounds (Flink returns
  *    NULL where Spark's split_part returns '' / is 1-based).
  *  - FROM_BASE64(s) / TO_BASE64(s) — Flink's names for Spark's
  *    unbase64/base64, with Flink's STRING-in/STRING-out typing.
  *  - JSON_VALUE(json, path) — SQL/JSON scalar access; the lax-mode
  *    2-arg form maps onto get_json_object. RETURNING / ON EMPTY /
  *    ON ERROR clauses are parser-level syntax and not supported.
  *  - JSON_EXISTS(json, path) — NULL json → NULL, else whether the path
  *    hits. Delta: a JSON null at the path reads as absent (mapping
  *    through get_json_object), where Flink's strict mode sees the key.
  *  - TRUNCATE(x[, n]) — truncate toward zero to n decimals
  *    (floor for x ≥ 0, ceil below). Like Spark's own floor/ceil-with-
  *    scale it widens to DECIMAL; cast if the input type must persist.
  *  - TO_TIMESTAMP_LTZ(epoch, p) — numeric epoch at precision p ∈
  *    {0 s, 3 ms, 6 µs}; any other argument shape falls through to
  *    Spark's native string-parsing to_timestamp_ltz, so registering
  *    the name loses nothing.
  *  - IS_ALPHA / IS_DIGIT / IS_DECIMAL — the legacy scalar predicates.
  *  - CONVERT_TZ(ts, tzFrom, tzTo) — wall-clock rebase between zones
  *    (STRING in/out, like the reference).
  *  - SHA224/SHA256/SHA384/SHA512(s) — fixed-width names over sha2.
  *  - RAND_INTEGER(bound) / RAND_INTEGER(seed, bound) — uniform int in
  *    [0, bound); the two-arg form leads with the seed, matching the
  *    reference's RAND_INTEGER(INT seed, INT bound) signature.
  *  - SINGLE_VALUE(x) — the group's sole value, error on >1-row groups.
  *  - CURRENT_ROW_TIMESTAMP() — per-row time in Flink; query-start
  *    constant here (same documented coarsening as PROCTIME).
  *  - IS_JSON / JSON_STRING / JSON_ARRAY — SQL/JSON predicates and
  *    constructors composed from the JSON built-ins; JSON_OBJECT's
  *    KEY/VALUE clause is a dialect rewrite
  *    ([[graft.plans.JsonObjectRewrite]] → to_json(named_struct)).
  *  - ELEMENT(arr) — sole element of a 1-element array, NULL when
  *    empty, error on more.
  *
  * The `ARRAY[...]` / `MAP[...]` bracket constructors are a dialect
  * rewrite ([[graft.plans.BracketConstructors]]), not functions.
  */
object FlinkFunctions {

  private def nArgs(name: String, e: Seq[Expression], n: Int*): Unit =
    if (!n.contains(e.length))
      throw new IllegalArgumentException(
        s"$name takes ${n.mkString(" or ")} argument(s), got ${e.length}")

  private val nullString = Literal.create(null, StringType)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "split_index" -> { e =>
      nArgs("split_index", e, 3)
      // ElementAt(failOnError=false) yields NULL out of bounds; a
      // negative Flink index would become a valid from-the-end Spark
      // index after +1, so it is nulled explicitly first
      CaseWhen(
        Seq((LessThan(e(2), Literal(0)), nullString)),
        Some(ElementAt(StringSplitSQL(e(0), e(1)), Add(e(2), Literal(1)),
          failOnError = false)))
    },
    "from_base64" -> { e =>
      nArgs("from_base64", e, 1)
      Cast(UnBase64(e(0)), StringType)
    },
    "to_base64" -> { e =>
      nArgs("to_base64", e, 1)
      Base64(Cast(e(0), BinaryType))
    },
    "json_value" -> { e =>
      nArgs("json_value", e, 2)
      GetJsonObject(e(0), e(1))
    },
    // JSON_QUERY returns the JSON TEXT at the path (objects/arrays);
    // get_json_object already yields raw fragments for non-scalars, so
    // the lax 2-arg forms coincide (WITHOUT ARRAY wrapper behavior)
    "json_query" -> { e =>
      nArgs("json_query", e, 2)
      GetJsonObject(e(0), e(1))
    },
    "json_exists" -> { e =>
      nArgs("json_exists", e, 2)
      If(IsNull(e(0)), Literal.create(null, BooleanType),
        IsNotNull(GetJsonObject(e(0), e(1))))
    },
    "truncate" -> { e =>
      nArgs("truncate", e, 1, 2)
      val n = if (e.length > 1) e(1) else Literal(0)
      If(GreaterThanOrEqual(e(0), Literal(0)),
        RoundFloor(e(0), n), RoundCeil(e(0), n))
    },
    // the legacy scalar predicates (still in the reference's function
    // catalog): all-letters / all-digits / parses-as-number. Empty or
    // NULL strings are false/NULL respectively, per the reference.
    "is_alpha" -> { e =>
      nArgs("is_alpha", e, 1)
      RLike(e(0), Literal("^[A-Za-z]+$"))
    },
    "is_digit" -> { e =>
      nArgs("is_digit", e, 1)
      RLike(e(0), Literal("^[0-9]+$"))
    },
    "is_decimal" -> { e =>
      nArgs("is_decimal", e, 1)
      If(IsNull(e(0)), Literal.create(null, BooleanType),
        IsNotNull(Cast(e(0), DoubleType, None, EvalMode.TRY)))
    },
    // RAND_INTEGER(bound) / RAND_INTEGER(seed, bound): uniform int in
    // [0, bound). Flink's two-arg form is (seed, bound) — seed FIRST —
    // and the seeded draw is deterministic per partition seed.
    "rand_integer" -> { e =>
      nArgs("rand_integer", e, 1, 2)
      val (r, bound) =
        if (e.length > 1) (new Rand(e(0)), e(1)) else (new Rand(), e(0))
      Cast(Multiply(r, Cast(bound, DoubleType)), IntegerType)
    },
    // SINGLE_VALUE(x): the group's sole value, error on >1 row — Flink's
    // scalar-subquery enforcement aggregate. Composed as
    // if(count(1) > 1, <raise>, max(x)): two partial-merge aggregates in
    // one buffer row, still map-side combinable; AssertTrue's NullType
    // coerces to max(x)'s type in the If branches.
    "single_value" -> { e =>
      nArgs("single_value", e, 1)
      val rows = Count(Seq(Literal(1))).toAggregateExpression()
      If(GreaterThan(rows, Literal(1L)),
        new AssertTrue(Literal(false),
          Literal("SINGLE_VALUE: more than one row in group")),
        Max(e(0)).toAggregateExpression())
    },
    // CONVERT_TZ(ts, tzFrom, tzTo): reinterpret a wall-clock timestamp
    // string from one zone into another — composed from Spark's UTC
    // shift pair, both codegen'd
    "convert_tz" -> { e =>
      nArgs("convert_tz", e, 3)
      Cast(FromUTCTimestamp(ToUTCTimestamp(Cast(e(0), TimestampType), e(1)), e(2)),
        StringType)
    },
    // the reference's fixed-width SHA names over Spark's sha2(x, bits)
    "sha224" -> { e => nArgs("sha224", e, 1); Sha2(Cast(e(0), BinaryType), Literal(224)) },
    "sha256" -> { e => nArgs("sha256", e, 1); Sha2(Cast(e(0), BinaryType), Literal(256)) },
    "sha384" -> { e => nArgs("sha384", e, 1); Sha2(Cast(e(0), BinaryType), Literal(384)) },
    "sha512" -> { e => nArgs("sha512", e, 1); Sha2(Cast(e(0), BinaryType), Literal(512)) },
    // PROCTIME(): the processing-time attribute. Documented delta: here
    // processing time is micro-batch/query time (CurrentTimestamp —
    // query-start constant in batch, batch-start in streaming), not
    // per-operator wall clock; the reference's own docs allow this
    // coarsening for time attributes on bounded sources.
    "proctime" -> { e =>
      nArgs("proctime", e, 0)
      CurrentTimestamp()
    },
    // CURRENT_ROW_TIMESTAMP(): Flink evaluates per row; here it is the
    // query-start constant (same documented coarsening as PROCTIME)
    "current_row_timestamp" -> { e =>
      nArgs("current_row_timestamp", e, 0)
      CurrentTimestamp()
    },
    // IS_JSON(s): valid JSON text. Mapped through get_json_object('$'):
    // non-null result ⇔ parseable; the JSON literal null (which the
    // mapping reads as absent) is special-cased true.
    "is_json" -> { e =>
      nArgs("is_json", e, 1)
      If(IsNull(e(0)), Literal.create(null, BooleanType),
        Or(IsNotNull(GetJsonObject(e(0), Literal("$"))),
          EqualTo(StringTrim(e(0)), Literal("null"))))
    },
    // JSON_STRING(x): the value serialized as JSON text (strings get
    // quoted, structs/arrays/maps render structurally). Composed as
    // to_json(struct(v AS v)) with the {"v": … } wrapper sliced off.
    "json_string" -> { e =>
      nArgs("json_string", e, 1)
      val wrapped = StructsToJson(Map.empty,
        CreateNamedStruct(Seq(Literal("v"), e(0))))
      If(IsNull(e(0)), nullString,
        Substring(wrapped, Literal(6), Subtract(Length(wrapped), Literal(6))))
    },
    // JSON_ARRAY(v1, v2, ...): common-type elements serialized as a JSON
    // array (Flink's ON NULL clauses are parser-level; ABSENT ON NULL —
    // the default — is approximated by to_json null omission)
    "json_array" -> { e =>
      StructsToJson(Map.empty, CreateArray(e))
    },
    // ELEMENT(arr): the sole element of a 1-element array, NULL for an
    // empty array, error on more (Flink semantics)
    "element" -> { e =>
      nArgs("element", e, 1)
      If(GreaterThan(Size(e(0)), Literal(1)),
        new AssertTrue(Literal(false),
          Literal("ELEMENT(): array has more than one element")),
        ElementAt(e(0), Literal(1), failOnError = false))
    },
    // MULTISET convention bridge (SURVEY §1.2: Flink MULTISET<T> maps to
    // MAP<T, INT> — element → multiplicity, Flink's own internal
    // representation). Flink's CARDINALITY counts elements INCLUDING
    // duplicates (Σ multiplicities), unlike Spark's cardinality(map) =
    // #entries; `x MEMBER OF ms` is multiset_contains.
    "multiset_cardinality" -> { e =>
      nArgs("multiset_cardinality", e, 1)
      val summed = ArrayAggregate(
        MapValues(e(0)), Literal(0L),
        LambdaFunction(Add(UnresolvedNamedLambdaVariable(Seq("acc")),
          Cast(UnresolvedNamedLambdaVariable(Seq("x")), LongType)),
          Seq(UnresolvedNamedLambdaVariable(Seq("acc")),
            UnresolvedNamedLambdaVariable(Seq("x")))),
        LambdaFunction.identity)
      If(IsNull(e(0)), Literal.create(null, LongType), summed)
    },
    "multiset_contains" -> { e =>
      nArgs("multiset_contains", e, 2)
      val cnt = ElementAt(e(0), e(1), failOnError = false)
      If(IsNull(e(0)), Literal.create(null, BooleanType),
        Coalesce(Seq(GreaterThan(cnt, Literal(0)), Literal(false))))
    },
    // TIME(p) convention bridge (SURVEY §1.2: Flink TIME maps to INT
    // millis-of-day in connector DDL). TO_TIME parses 'HH:mm:ss[.SSS]'
    // timezone-free; TIME_TO_STRING renders the INT back. Both are
    // arithmetic/format compositions — codegen'd, no tz dependence.
    "to_time" -> { e =>
      nArgs("to_time", e, 1)
      val parts = StringSplit(e(0), Literal(":"), Literal(-1))
      val h = Cast(GetArrayItem(parts, Literal(0)), IntegerType)
      val m = Cast(GetArrayItem(parts, Literal(1)), IntegerType)
      val msec = Cast(Round(Multiply(
        Cast(GetArrayItem(parts, Literal(2)), DoubleType), Literal(1000.0)),
        Literal(0)), IntegerType)
      Add(Add(Multiply(h, Literal(3600000)), Multiply(m, Literal(60000))), msec)
    },
    "time_to_string" -> { e =>
      nArgs("time_to_string", e, 1)
      val t = Cast(e(0), LongType)
      def part(div: Long, mod: Long) =
        Cast(Pmod(IntegralDivide(t, Literal(div)), Literal(mod)), IntegerType)
      FormatString(Literal("%02d:%02d:%02d.%03d"),
        part(3600000L, 24L), part(60000L, 60L), part(1000L, 60L),
        Cast(Pmod(t, Literal(1000L)), IntegerType))
    },
    "to_timestamp_ltz" -> { e =>
      (e.lift(1), e.length) match {
        case (Some(Literal(0, IntegerType)), 2) => SecondsToTimestamp(e(0))
        case (Some(Literal(3, IntegerType)), 2) => MillisToTimestamp(e(0))
        case (Some(Literal(6, IntegerType)), 2) => MicrosToTimestamp(e(0))
        case (_, 1) => ParseToTimestamp(e(0), None, TimestampType)
        case (Some(fmt), 2) => ParseToTimestamp(e(0), Some(fmt), TimestampType)
        case _ => throw new IllegalArgumentException(
          "to_timestamp_ltz takes (epoch, 0|3|6) or (str[, fmt])")
      }
    },
  )
}
